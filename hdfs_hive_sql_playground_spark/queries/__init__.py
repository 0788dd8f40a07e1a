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
# insertion order.  This round-11 window executes the rotation round 10
# committed to (computed by scripts/propose_window.py q144_quarantine_ingest,
# stalest-first): (a) all 48 r8-vintage greens — the oldest hash-checked
# rows left after the r10 rotation: the join/window refresh block
# (q13-q21 incl. both q18s, q24 rides as the stalest r9), the scalar-
# function tails (q48, q49, q125-q127, q129, q131, q133, q134), the
# events family (q59, q61-q68), the dedup/text tails (q87, q98, q117,
# q122, q123, q130, q132, q135, q136, q139, q140), and the curation
# block (q91, q94, q106, q112, q115, q118-q121) — then (b) the ONE
# query whose implementation changed this round: q144 (the quarantine
# split gained the managed-option refusal, the parsed-DDL corrupt-column
# guard, and NULL-raw-to-still_bad replay routing, per round-10 ADVICE).
#
# Rotation discipline (standing): lead each round with the queries whose
# last driver row is oldest, plus every query whose code changed that
# round; backfill to 50 with the stalest remaining greens; registry (143)
# ~ 3x window, so the full cycle is ~3 rounds — report vintage honestly,
# and keep the local oracle gate (ALL queries, every round,
# tests/test_queries_oracle.py) green regardless.  After this window the
# stalest rows are the r9 greens (q22-q33, q40-q47, q50-q53, q55-q56,
# and the curation/sketch families refreshed in r9), which must lead
# round 12 — run scripts/propose_window.py to compute the exact list and
# scripts/preflight_window.py before every end-of-round snapshot.
# Round 12 also owes the trim-class oracle alignment (DuckDB trim(x) ->
# trim(x, ' ') in the ~25 text/dedup oracles, per the boundary pinned in
# tests/test_adversarial_strings.py::test_content_hash_trim_boundary_*):
# those changed queries then lead the r12 window alongside the stale r9
# block — deferred from r11 deliberately, because 25 changed slots would
# have evicted 23 r8-vintage greens and broken the freshness criterion.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) the 48 r8-vintage stale greens + q24 (stalest r9), per
    # propose_window.py
    "q18_top_volume_orders",
    "q48_hash_funcs",
    "q49_map_bitwise",
    "q59_values_inline",
    "q135_recursive_hierarchy",
    "q87_neardup_components",
    "q98_simhash_banded_neardup",
    "q117_ngram_novelty",
    "q123_source_overlap",
    "q136_segment_dedup_rewrite",
    "q139_leakage_safe_split",
    "q140_url_canonical_dedup",
    "q61_tumbling_window",
    "q62_sessionize",
    "q63_pivot",
    "q64_session_window",
    "q65_asof_join",
    "q66_range_join_bucketed",
    "q67_multires_rollup",
    "q68_keep_latest_per_key",
    "q13_semi_join",
    "q14_anti_join",
    "q15_outer_join_coalesce",
    "q16_theta_self_join",
    "q20_window_rank",
    "q21_window_running_sum",
    "q17_full_outer_join",
    "q18_join_hints",
    "q125_url_funcs",
    "q126_fuzzy_string_funcs",
    "q127_xpath_funcs",
    "q129_bit_bool_aggs",
    "q131_width_bucket_histogram",
    "q133_array_hof_funcs",
    "q134_explode_outer_map_hofs",
    "q91_quality_score",
    "q94_stratified_quota",
    "q106_repetition_signals",
    "q112_sequence_packing",
    "q115_domain_mix_sample",
    "q118_length_trim",
    "q119_hash_split",
    "q120_budget_select",
    "q121_pack_stats",
    "q122_unigram_surprisal",
    "q130_bpe_pair_counts",
    "q132_gopher_rules",
    "q19_pandas_udaf_weighted",
    "q24_percent_rank_cume_dist",
    # (b) implementation changed this round (round-10 ADVICE fixes in
    # sources/quarantine.py: managed-option refusal, parsed-DDL corrupt-
    # column guard, NULL-raw replay routing)
    "q144_quarantine_ingest",
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
