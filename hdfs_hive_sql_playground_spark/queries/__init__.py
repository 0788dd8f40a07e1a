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
# insertion order.  This round-10 window executes the rotation round 9
# committed to (computed by scripts/propose_window.py, stalest-first):
# (a) the 41 r7-vintage greens — 3 rounds stale at r10, the oldest
# hash-checked rows left in the registry: the unpivot/CTE/script-
# transform/lateral family (q34, q54, q57, q58), sampling/collect/null-
# ordering (q35, q36, q39), the join block (q10-q12, q37, q78), window
# tails (q38), the dedup family (q80-q83, q105, q108, q109, q116), the
# format roundtrips (q75-q77), the m33 view/limit legs (q70, q72), the
# aggregation block (q01-q05, q06b, q07, q08), heavy hitters (q104),
# collapse-repeats/PII (q113, q114), the composed crawl-front pipeline
# (q143), the pandas-UDF pair (q09, q111), and MERGE upsert (q101) —
# then (b) the FOUR queries whose implementation or oracle changed this
# round: q60 (the oracle's whitespace-strip class widened from SQL
# trim()'s space-only to Spark try_cast's full [\x00-\x20] trim class —
# the tab/newline/control-padded JSON-string divergence found by round-9
# ADVICE, pinned by new adversarial-events fixture rows) and the
# multimodal trio q95/q96/q107 (empty payloads now report
# last_frame_len=0 instead of the formula's +FRAME_BYTES artifact, on
# both the numpy side and the q95 oracle) — then (c) backfill with the
# five stalest r8 greens (q17, q18, q48_hash_funcs, q49_map_bitwise,
# q59).  q96/q107 share q95's payload convention and gate, so they ride
# along per round-9 ADVICE even though only q95's formula changed.
#
# Rotation discipline (standing): lead each round with the queries whose
# last driver row is oldest, plus every query whose code changed that
# round; backfill to 50 with the stalest remaining greens; registry (142)
# > 2x window, so the full cycle is ~3 rounds — report vintage honestly,
# and keep the local oracle gate (ALL queries, every round,
# tests/test_queries_oracle.py) green regardless.  After this window the
# stalest rows are the 50 r8-vintage greens (the join/agg/window refresh
# block q13-q21, q125-q135, the events family q59-q68, and the curation
# block q94/q112/q115/q118-q121), which must lead round 11 — run
# scripts/propose_window.py to compute the exact list and
# scripts/preflight_window.py before every end-of-round snapshot.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) the 41 r7-vintage stale greens, per propose_window.py
    "q34_unpivot_stack",
    "q54_cte_multi_ref",
    "q57_script_transform",
    "q58_posexplode_lateral",
    "q35_hash_sample",
    "q36_collect_agg",
    "q37_global_sales_opportunity",
    "q38_nth_value_window",
    "q39_null_ordering",
    "q80_exact_dedup",
    "q81_minhash_lsh_neardup",
    "q82_ngram_jaccard_pairs",
    "q83_simhash",
    "q116_canonical_per_cluster",
    "q105_dup_ngram_spans",
    "q108_decontaminate",
    "q109_incremental_dedup",
    "q75_orc_roundtrip",
    "q76_json_roundtrip",
    "q77_csv_roundtrip",
    "q78_bucketed_join",
    "q70_m33_schem_view",
    "q72_m33_limit_fetch",
    "q01_pricing_summary",
    "q02_distinct_agg",
    "q03_rollup",
    "q04_cube",
    "q05_grouping_sets",
    "q10_join_chain_revenue",
    "q11_broadcast_dim_join",
    "q12_region_revenue",
    "q06b_hll_exact_check",
    "q07_exact_percentiles",
    "q08_salted_agg",
    "q104_heavy_hitters",
    "q113_collapse_repeats",
    "q114_pii_redact",
    "q143_crawl_front_pipeline",
    "q09_pandas_udf_scalar",
    "q111_grouped_map_demean",
    "q101_merge_upsert",
    # (b) oracle/implementation changed this round (round-9 ADVICE +
    # round-10 gate findings): q60's whitespace-trim class; the
    # multimodal empty-payload last_frame_len=0 convention (q95 formula
    # + oracle; q96/q107 ride along as the gated trio); the m33 family's
    # wholetext scan path now matches Hadoop's CR/LF/CRLF line-terminator
    # contract (real trailing-\r bug on CRLF files, found by the round-10
    # adversarial text-source gate — q70/q72 are already in block (a),
    # q71/q73/q74 complete the family)
    "q60_json_extract",
    "q95_multimodal_features",
    "q96_multimodal_meta_agg",
    "q107_frame_sample",
    "q71_m33_schem_agg",
    "q73_m33_ctas_roundtrip",
    "q74_m33_jdbc_export_roundtrip",
    # new this round: the quarantine-split ingest contract, promoted from
    # the adversarial formats gate to a registered driver-checked query
    "q144_quarantine_ingest",
    # (c) backfill: the stalest r8 green
    "q17_custdist",
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
