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
# insertion order.  Rounds 1-3 cumulatively proved 96 of 111 queries; this
# round-4 window front-loads the 14 oracle-eligible queries that have never
# had a driver row (the 13 late-round-3 additions q101-q113 plus
# q81_minhash_lsh_neardup, whose only driver row predates the md5-nibble
# re-hash), then backfills the remaining 36 slots with the queries whose
# green rows are oldest (round-2 vintage) so every entry periodically
# re-earns its green.  The backfill deliberately includes q70/q73/q74
# (read_text_files blank-line semantics changed in round 3) and q96
# (consumes the rewritten fake_features), per the round-3 advice.
#
# Rotation discipline for future rounds: replace the window with whichever
# queries still lack a fresh driver row, backfilling with the stalest
# previously-proven greens.
DRIVER_PRIORITY: tuple[str, ...] = (
    # never driver-proven (late-r3 additions + re-hashed q81)
    "q101_merge_upsert",
    "q102_scd2_build",
    "q103_srp_lsh_neardup",
    "q104_heavy_hitters",
    "q105_dup_ngram_spans",
    "q106_repetition_signals",
    "q107_frame_sample",
    "q108_decontaminate",
    "q109_incremental_dedup",
    "q110_range_layout_scan",
    "q111_grouped_map_demean",
    "q112_sequence_packing",
    "q113_collapse_repeats",
    "q114_pii_redact",
    "q115_domain_mix_sample",
    "q116_canonical_per_cluster",
    "q81_minhash_lsh_neardup",
    # backfill: round-2-vintage greens on changed code paths first
    "q70_m33_schem_view",
    "q71_m33_schem_agg",
    "q72_m33_limit_fetch",
    "q73_m33_ctas_roundtrip",
    "q74_m33_jdbc_export_roundtrip",
    "q96_multimodal_meta_agg",
    # backfill: remaining round-2-vintage greens, oldest first
    "q75_orc_roundtrip",
    "q76_json_roundtrip",
    "q77_csv_roundtrip",
    "q78_bucketed_join",
    "q80_exact_dedup",
    "q82_ngram_jaccard_pairs",
    "q83_simhash",
    "q01_pricing_summary",
    "q02_distinct_agg",
    "q03_rollup",
    "q04_cube",
    "q05_grouping_sets",
    "q10_join_chain_revenue",
    "q11_broadcast_dim_join",
    "q12_region_revenue",
    "q33_pivot_status",
    "q36_collect_agg",
    "q24_percent_rank_cume_dist",
    "q25_ignore_nulls_window",
    "q38_nth_value_window",
    "q39_null_ordering",
    "q34_unpivot_stack",
    "q35_hash_sample",
    "q37_global_sales_opportunity",
    "q54_cte_multi_ref",
    "q57_script_transform",
    "q58_posexplode_lateral",
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
