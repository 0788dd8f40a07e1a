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
# insertion order.  This round-12 window executes the rotation round 11
# committed to (computed by scripts/propose_window.py with the seven
# forced-changed names below): (a) all 43 r9-vintage oracle-bearing
# greens — the stalest rows left after the r11 rotation: the window/sort/
# set-op refresh block (q22-q25, q30-q33 incl. both q33s), the scalar
# tails (q40-q49 incl. both q48/q49 names, q128), the subquery family
# (q50-q53), the embedding/ANN family (q84-q86, q89, q97, q103, q124,
# q137), the r9 text/curation refreshes (q88, q90, q92, q93, q99, q100,
# q138, q141, q142), q102 and q110 — then (b) seven queries whose ORACLE
# changed this round in the trim-class alignment (bare DuckDB trim(x) ->
# trim(x, ' ') = ASCII-space-only = Spark trim, per the boundary pinned
# in tests/test_adversarial_strings.py): the five m33 queries (q70-q74,
# whose shared _ORACLE_VIEW changed) plus the two flagship content-hash
# pipelines (q80, q143).
#
# The alignment touched ~36 oracles total; the other ~29 changed queries
# do NOT claim window slots, per the round-8 no-op-alignment policy:
# tests/test_adversarial_corpus.py::test_fixture_trim_classes_agree
# proves bare and aligned trim agree on every fixture document (the
# fixture is ASCII-padded), so pre-alignment driver greens remain valid
# attestations, while the unicode-space-padded adversarial corpus docs
# 14/15 exercise the divergence cross-engine for all of them and
# test_no_oracle_uses_bare_one_arg_trim lints the recipe forever.
#
# Round 12 later also fixed a live extraction bug the new corpus row
# exposed (doc 16): Java's bare dot excludes ALL line terminators (NEL
# included) where RE2's excludes only \n, so q142/q143's '<p>(.*)</p>'
# extracted '' in Spark on NEL-bearing content. Both sides now scope
# the dot with inline (?s:...) — an IMPLEMENTATION change for q142 and
# q143, and both already sit in this window (q143 in the changed head,
# q142 in the stale-r9 block), so the rotation stands unchanged.
# Round 12 also aligned the tokenizer class in 24 oracles (RE2
# '\s+' -> the explicit '[ \t\n\x0b\f\r]+' = Java \s exactly, after
# the random-unicode sweep caught vertical tab: RE2's \s has no \x0b)
# and q92's negated '[^...\s]' class, under the same no-op policy:
# tests/test_adversarial_corpus.py::test_fixture_has_no_vertical_tab
# proves the driver fixture contains no VT, so these changed oracles
# keep their vintages; the sweep + corpus gate exercise the divergence
# and test_no_oracle_uses_regex_whitespace_class lints it forever.
#
# Rotation discipline (standing): lead each round with the queries whose
# last driver row is oldest, plus every query whose semantics changed
# that round; backfill to 50 with the stalest remaining greens; registry
# (143) ~ 3x window, so the full cycle is ~3 rounds — report vintage
# honestly, and keep the local oracle gate (ALL queries, every round,
# tests/test_queries_oracle.py) green regardless.  After this window no
# query's latest driver green is older than r10; the r13 window leads
# with the 49 r10-vintage greens (run scripts/propose_window.py for the
# exact list and scripts/preflight_window.py before every end-of-round
# snapshot).
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) the 43 r9-vintage stale greens, per propose_window.py
    "q25_ignore_nulls_window",
    "q33_pivot_status",
    "q110_range_layout_scan",
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
    "q84_embedding_neardup_cells",
    "q85_ann_bruteforce_topk",
    "q86_ivf_ann_topk",
    "q89_embedding_quantize",
    "q97_ann_pandas_topk",
    "q103_srp_lsh_neardup",
    "q124_semdedup_prune",
    "q137_kmeans_refine",
    "q90_language_id",
    "q92_token_count",
    "q93_fingerprint",
    "q88_tfidf_top_terms",
    "q99_curation_pipeline",
    "q100_bigram_topk",
    "q138_weighted_sample",
    "q141_target_affinity_select",
    "q142_html_boilerplate_strip",
    "q102_scd2_build",
    # (b) oracle changed this round (trim-class alignment)
    "q70_m33_schem_view",
    "q71_m33_schem_agg",
    "q72_m33_limit_fetch",
    "q73_m33_ctas_roundtrip",
    "q74_m33_jdbc_export_roundtrip",
    "q80_exact_dedup",
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
