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
# insertion order.  Rounds 1-2 proved the first 50 alphabetical-module slots
# (advanced_sql/dedup/events/formats/m33/multimodal + 8 relational); this list
# front-loads the 45 queries that have never had a driver row (similarity,
# text-analysis, pandas UDFs, and the relational tail) plus the 5 queries whose
# implementation changed this round (q87/q95/q70/q73/q74) so the hard signal
# re-proves them.  Queries not listed keep registration order after these.
#
# Rotation discipline for future rounds: once this window is driver-proven,
# replace it with whichever queries still lack a fresh driver row (next up:
# q101-q112 and the re-hashed q81), backfilling with previously-proven
# queries so every entry periodically re-earns its green row.
DRIVER_PRIORITY: tuple[str, ...] = (
    # similarity / ANN family (never driver-checked)
    "q84_embedding_neardup_cells",
    "q85_ann_bruteforce_topk",
    "q86_ivf_ann_topk",
    "q89_embedding_quantize",
    "q97_ann_pandas_topk",
    # text-analysis family (never driver-checked)
    "q88_tfidf_top_terms",
    "q90_language_id",
    "q91_quality_score",
    "q92_token_count",
    "q93_fingerprint",
    "q94_stratified_quota",
    # pandas UDF / UDAF (never driver-checked)
    "q09_pandas_udf_scalar",
    "q19_pandas_udaf_weighted",
    # relational tail (never driver-checked)
    "q06_approx_distinct",
    "q07_exact_percentiles",
    "q08_salted_agg",
    "q13_semi_join",
    "q14_anti_join",
    "q15_outer_join_coalesce",
    "q16_theta_self_join",
    "q17_full_outer_join",
    "q18_join_hints",
    "q20_window_rank",
    "q21_window_running_sum",
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
    # changed-this-round queries: force a fresh driver row
    "q87_neardup_components",
    "q95_multimodal_features",
    # new-this-round queries (never driver-checked)
    "q98_simhash_banded_neardup",
    "q99_curation_pipeline",
    "q100_bigram_topk",
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
