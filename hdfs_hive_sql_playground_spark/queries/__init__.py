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
# insertion order.  This round-8 window executes the rotation round 7
# committed to (computed by scripts/propose_window.py, stalest-first):
# (a) ALL 43 round-5-vintage greens — 3 rounds stale at r8, the oldest
# hash-checked rows in the registry (the events/time-series family
# q59-q68, the join family q13-q18 + custdist/top-volume, the r5
# function/HOF tail q125-q134, recursive CTE, novelty/overlap, the
# curation/mixing family q94/q112/q115/q118-q122, Gopher/BPE, and the
# pandas UDAF) — then (b) the one query whose implementation changed this
# round (q136: the rewrite-join strategy probe is now a cached
# parquet-footer metadata count instead of an eager d.count()), then
# (c) backfill with the four stalest r6 rows. Late-round-8 amendment:
# the adversarial-corpus suite (tests/test_adversarial_corpus.py) found
# three REAL code bugs fixed this round — q91 (ANSI divide-by-zero on an
# empty document), q106 (descending-sequence element_at crash on a
# sub-n-token document), and q60 (ANSI cast crash on a non-numeric JSON
# value; q60 already sits in the r5 lead block, so it claims no extra
# slot) — q91 and q106 enter the window as changed, evicting the two
# newest r6 backfills (q110, q71). The same suite drove a
# tokenizer alignment in 20 oracles (string_split ' ' ->
# string_split_regex '\s+', matching the Spark side's _words): that
# change is PROVABLY a no-op on the driver fixture
# (test_adversarial_corpus.py::test_fixture_tokenizers_agree machine-
# checks that both tokenizations agree on every fixture document), so
# prior driver-green vintages remain valid attestations and those 20
# queries do not claim window slots.
#
# Rotation discipline (standing): lead each round with the queries whose
# last driver row is oldest, plus every query whose code changed that
# round; backfill to 50 with the stalest remaining greens; registry (142)
# > 2x window, so the full cycle is ~3 rounds — report vintage honestly,
# and keep the local oracle gate (ALL queries, every round,
# tests/test_queries_oracle.py) green regardless.  After this window the
# stalest rows are the r6/r7-vintage greens that debuted earliest (the
# remaining r6 formats/curation rows, then the big r7 block), which must
# lead round 9 — run scripts/propose_window.py to compute the exact list
# and scripts/preflight_window.py before every end-of-round snapshot.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) all 43 r5-vintage greens, stalest-first per propose_window.py
    "q17_custdist",
    "q18_top_volume_orders",
    "q48_hash_funcs",
    "q49_map_bitwise",
    "q59_values_inline",
    "q135_recursive_hierarchy",
    "q117_ngram_novelty",
    "q123_source_overlap",
    "q60_json_extract",
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
    "q94_stratified_quota",
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
    # (c) backfill: the four stalest r6 rows
    "q87_neardup_components",
    "q98_simhash_banded_neardup",
    "q139_leakage_safe_split",
    "q140_url_canonical_dedup",
    # (b) implementation changed this round: q136's strategy probe is now
    # a cached parquet-footer metadata count (no per-build Spark job);
    # q91 and q106 got adversarial-input crash fixes (see above).
    "q136_segment_dedup_rewrite",
    "q91_quality_score",
    "q106_repetition_signals",
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
