"""Query registry: every operator the engine claims is registered here as a
(spark_fn, oracle_sql) pair consumed by ``__spark_entry__`` and the tests.

``oracle_sql`` is ANSI SQL runnable by DuckDB over the same parquet tables;
``None`` marks operators whose semantics are not SQL-expressible (the driver
then records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str
    bench: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", bench: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


# The driver's correctness gate verifies the FIRST 50 registry entries in
# insertion order.  This round-6 window front-loads (a) every round-3-
# vintage green — 3 rounds old now, the stalest hash-checked rows in the
# registry (all 35 oracle-eligible ones; q06_approx_distinct stays out:
# its driver row is rows-only by design and q06b hash-pins the estimate)
# — then (b) the three queries whose implementation changed this round
# (q124's hot-cell sharding, q128's DECIMAL moment sums, q99's persisted
# quota input), and (c) round-4-vintage greens whose surrounding code
# changed since r4 (the m33 family over the rewritten wholetext guard;
# formats/sinks/jdbc round-trips; exact dedup next to this round's dedup
# docstring edits) plus the stalest warehouse row.
#
# Rotation discipline for future rounds: replace the window with whichever
# queries still lack a fresh driver row, backfilling with the stalest
# previously-proven greens; registry (134) > 2x window, so the cycle is
# ~2.7 rounds — report vintage honestly, keep the local oracle gate (all
# queries, every round) green regardless.  Round 7 must lead with the
# round-4-vintage greens this window could not fit (they turn 3 rounds
# old at r7 — the 36 original ones plus q75_orc/q76_json, displaced below
# by the q137/q138 debuts), then backfill with the stalest r5 rows.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) round-3-vintage greens: windows/sort/set-ops/scalar funcs...
    "q22_lead_lag",
    "q23_ntile_first_last",
    "q24_range_frame_window",
    "q30_topk_orders",
    "q31_set_ops",
    "q32_distribute_cluster_by",
    "q33_set_ops_all",
    "q40_string_funcs",
    "q41_split_array_cast",
    "q42_conditional",
    "q43_math_funcs",
    "q44_date_funcs",
    "q45_field_function",
    "q46_array_map_funcs",
    "q47_json_tuple",
    "q48_date_arithmetic",
    "q49_string_padding",
    "q50_explode_tokens",
    "q51_scalar_subquery",
    "q52_correlated_exists",
    "q53_in_subquery",
    # ...ANN/similarity (q84/q86 also sit on this round's N_CELLS knob)...
    "q84_embedding_neardup_cells",
    "q85_ann_bruteforce_topk",
    "q86_ivf_ann_topk",
    "q87_neardup_components",
    "q89_embedding_quantize",
    "q97_ann_pandas_topk",
    "q98_simhash_banded_neardup",
    # ...and text analysis
    "q88_tfidf_top_terms",
    "q90_language_id",
    "q91_quality_score",
    "q92_token_count",
    "q93_fingerprint",
    "q95_multimodal_features",
    "q100_bigram_topk",
    # (b) implementation changed this round
    "q124_semdedup_prune",
    "q128_stats_aggregates",
    "q99_curation_pipeline",
    # (c) r4-vintage greens whose surrounding code changed since
    "q71_m33_schem_agg",
    "q73_m33_ctas_roundtrip",
    "q74_m33_jdbc_export_roundtrip",
    "q110_range_layout_scan",
    # (d) late-round debuts: every new operator takes a window slot
    # immediately. q136 took q101_merge_upsert's (unchanged since r4);
    # q137/q138 took q75_orc/q76_json's — the sink/format family keeps
    # fresh coverage via q73 (text CTAS), q77 (CSV nulls) and q110 (range
    # layout), while ORC/JSON round-trips are untouched-since-r4 paths —
    # and q139 took q78_bucketed_join's (join family refreshed r5 via
    # q13-q18; q78's no-shuffle shape stays locally pinned by
    # test_bucketed_join_no_shuffle). q140 took q72_m33_limit_fetch's —
    # the m33 family keeps four fresher slots (q70/q71/q73/q74) over the
    # same rewritten wholetext guard, and the LIMIT-fetch path is also
    # exercised by q72's local oracle row. q141 took q80_exact_dedup's:
    # q80 is r5-green with code unchanged since, and bench.py re-runs it
    # (rows + timing) every round anyway. q142 took q77_csv_roundtrip's:
    # sinks code is unchanged in r6 and the CSV empty-string/null
    # round-trip stays pinned by tests/test_m33_pipeline.py. q143 took
    # q70_m33_schem_view's: q71 exercises the same schema-view path plus
    # its aggregation, so the view family keeps a fresh slot.
    # q70/q72/q75/q76/q77/q78/q80/q101 lead r7's rotation.
    "q136_segment_dedup_rewrite",
    "q137_kmeans_refine",
    "q138_weighted_sample",
    "q139_leakage_safe_split",
    "q140_url_canonical_dedup",
    "q141_target_affinity_select",
    "q142_html_boilerplate_strip",
    "q143_crawl_front_pipeline",
)


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effects: each module registers its queries.
    from hdfs_hive_sql_playground_spark.queries import (  # noqa: F401
        advanced_sql,
        curation2,
        dedup,
        events,
        formats,
        m33_pipeline,
        multimodal,
        relational,
        similarity,
        sketches,
        text,
        udfs,
        warehouse,
    )

    ordered = {name: REGISTRY[name] for name in DRIVER_PRIORITY if name in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
