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
# insertion order.  This round-9 window executes the rotation round 8
# committed to (computed by scripts/propose_window.py, stalest-first):
# (a) the 39 stalest greens (36 r6-vintage — 3 rounds stale at r9 — plus
# the 3 next-stalest r7 rows), the oldest
# hash-checked rows left in the registry (the m33 roundtrips q71/q73/q74,
# range-layout scan, the window/set-op/sampling
# family q22-q24/q30-q33, the scalar-function tail q40-q53, stats
# aggregates, quantization, LID/token/fingerprint/TF-IDF, the composed
# q99 pipeline, bigrams, weighted sample, target-affinity select, and
# boilerplate strip) — then (b) the ELEVEN queries whose implementation changed this
# round: the whole embeddings-cosine family (q84, q85, q86, q97, q103,
# q124, q137) moved from raw `/` to F.try_divide (and q97's numpy path
# to a NaN-guarded normalize + lexsort top-k) so a zero-norm embedding
# yields NULL that ranks LAST, matching the oracle, instead of an ANSI
# DIVIDE_BY_ZERO crash — the r8 strict-xfail now a hard 7-query contract
# test (tests/test_adversarial_corpus.py::test_adversarial_embeddings_
# cross_engine) — plus the multimodal trio (q95, q96, q107) whose
# payload convention changed (NULL payload = zero-length asset; the
# round-9 multimodal gate found a real None-crash in the Arrow UDFs)
# — plus q102, whose SCD2 window now pins NULLS FIRST explicitly on
# both sides (the adversarial warehouse gate caught a NULL change date
# becoming the CURRENT row under DuckDB's nulls-last default).
# try_divide equals `/` bit-for-bit on every nonzero norm and the
# driver fixture has no zero-norm embedding or NULL payload, so prior
# vintages for the unchanged-result queries remain valid attestations;
# the window re-proves all ten anyway.
#
# Rotation discipline (standing): lead each round with the queries whose
# last driver row is oldest, plus every query whose code changed that
# round; backfill to 50 with the stalest remaining greens; registry (142)
# > 2x window, so the full cycle is ~3 rounds — report vintage honestly,
# and keep the local oracle gate (ALL queries, every round,
# tests/test_queries_oracle.py) green regardless.  After this window the
# stalest rows are the r7-vintage greens (the big r7 block: joins
# q10-q12/q78, aggregation q01-q09, the lateral/subquery family, script
# transform, formats q75-q77, MERGE/SCD2 q101-q102, curation q108-q109,
# q111, q116, q143), which must lead round 10 — run
# scripts/propose_window.py to compute the exact list and
# scripts/preflight_window.py before every end-of-round snapshot.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) 39 stalest greens (36 r6 + 3 r7), per propose_window.py
    "q110_range_layout_scan",
    "q71_m33_schem_agg",
    "q73_m33_ctas_roundtrip",
    "q74_m33_jdbc_export_roundtrip",
    "q22_lead_lag",
    "q23_ntile_first_last",
    "q30_topk_orders",
    "q31_set_ops",
    "q40_string_funcs",
    "q41_split_array_cast",
    "q42_conditional",
    "q43_math_funcs",
    "q44_date_funcs",
    "q45_field_function",
    "q50_explode_tokens",
    "q51_scalar_subquery",
    "q52_correlated_exists",
    "q53_in_subquery",
    "q46_array_map_funcs",
    "q47_json_tuple",
    "q32_distribute_cluster_by",
    "q24_range_frame_window",
    "q48_date_arithmetic",
    "q49_string_padding",
    "q33_set_ops_all",
    "q128_stats_aggregates",
    "q89_embedding_quantize",
    "q90_language_id",
    "q92_token_count",
    "q93_fingerprint",
    "q88_tfidf_top_terms",
    "q99_curation_pipeline",
    "q100_bigram_topk",
    "q138_weighted_sample",
    "q141_target_affinity_select",
    "q142_html_boilerplate_strip",
    "q24_percent_rank_cume_dist",
    "q25_ignore_nulls_window",
    "q33_pivot_status",
    # (b) implementation changed this round: the embeddings-cosine
    # family's zero-norm fix (try_divide / NaN-guarded numpy)
    "q84_embedding_neardup_cells",
    "q85_ann_bruteforce_topk",
    "q86_ivf_ann_topk",
    "q97_ann_pandas_topk",
    "q103_srp_lsh_neardup",
    "q124_semdedup_prune",
    "q137_kmeans_refine",
    # (b cont.) the multimodal payload-convention fix: NULL payload ->
    # zero-length asset (coalesce at assets(), fillna in the Arrow UDFs,
    # COALESCE in the oracles; empty-prefix checksum pinned to 0)
    "q95_multimodal_features",
    "q96_multimodal_meta_agg",
    "q107_frame_sample",
    # (b cont.) q102: SCD2 NULL-change-date ordering pinned NULLS FIRST
    # on both sides (the engines' ASC null-order defaults differ; found
    # by the round-9 adversarial warehouse gate)
    "q102_scd2_build",
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
