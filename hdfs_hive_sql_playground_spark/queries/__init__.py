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
# insertion order.  After round 4 every registry query has a cumulative
# driver-green row except q06 (rows-only by design).  This round-5 window
# front-loads (a) the 14 queries whose only green is round-2 vintage —
# code paths around them (session defaults, tables.load) changed since —
# (b) the four queries whose implementation changed this round (the
# bucketed-prefix-scan rewrite of the stratum windows), and (c) the new
# q06b companion, then backfills with the stalest round-3-vintage greens.
#
# Rotation discipline for future rounds: replace the window with whichever
# queries still lack a fresh driver row, backfilling with the stalest
# previously-proven greens; no green should be older than 2 rounds.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) round-2-vintage greens, last proven 2 rounds ago
    "q17_custdist",
    "q18_top_volume_orders",
    "q48_hash_funcs",
    "q49_map_bitwise",
    "q59_values_inline",
    "q60_json_extract",
    "q61_tumbling_window",
    "q62_sessionize",
    "q63_pivot",
    "q64_session_window",
    "q65_asof_join",
    "q66_range_join_bucketed",
    "q67_multires_rollup",
    "q68_keep_latest_per_key",
    # (b) implementation changed this round: bucketed prefix scans
    "q94_stratified_quota",
    "q99_curation_pipeline",
    "q112_sequence_packing",
    "q115_domain_mix_sample",
    # (c) new this round: hash-checkable HLL companion (q117-q119 at tail)
    "q06b_hll_exact_check",
    # backfill: stalest round-3-vintage greens
    "q07_exact_percentiles",
    "q08_salted_agg",
    "q09_pandas_udf_scalar",
    "q13_semi_join",
    "q14_anti_join",
    "q15_outer_join_coalesce",
    "q16_theta_self_join",
    "q17_full_outer_join",
    "q18_join_hints",
    "q19_pandas_udaf_weighted",
    "q20_window_rank",
    "q21_window_running_sum",
    # new this round (never driver-checked): the q117-q135 additions all
    # debut with a driver row; the r3-vintage greens displaced by them
    # (q22_lead_lag, q23_ntile_first_last, q24_range_frame_window, q30-q33, q40-q47, q48_date_arithmetic, q49-q51) are exactly
    # 2 rounds old and lead round 6's rotation
    "q117_ngram_novelty",
    "q118_length_trim",
    "q119_hash_split",
    "q120_budget_select",
    "q121_pack_stats",
    "q122_unigram_surprisal",
    "q123_source_overlap",
    "q124_semdedup_prune",
    "q125_url_funcs",
    "q126_fuzzy_string_funcs",
    "q127_xpath_funcs",
    "q128_stats_aggregates",
    "q129_bit_bool_aggs",
    "q130_bpe_pair_counts",
    "q131_width_bucket_histogram",
    "q132_gopher_rules",
    "q133_array_hof_funcs",
    "q134_explode_outer_map_hofs",
    "q135_recursive_hierarchy",
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
