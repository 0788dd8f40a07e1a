"""Per-stage wall attribution for q99 (the composed curation pipeline).

Reproduces the cumulative stage profile quoted in q99's docstring
(queries/text.py) with a stated protocol instead of an ad-hoc one: each
stage prefix of the pipeline is noop-written N times (min reported) in ONE
fresh JVM, stages in pipeline order, full GC between draws. Run on a quiet
box::

    python scripts/diag_q99_stages.py [sf_dir] [n_draws]

The stage definitions mirror queries/text.py::q99_curation_pipeline
line-for-line — if the pipeline changes, change them here too (the final
stage is asserted row-identical to the registry function so drift fails
loudly instead of silently attributing a different plan).

``--trajectory`` runs the RECONCILIATION experiment instead: only the
full pipeline, 12 sequential noop-write draws in a fresh JVM after the
bench child's exact warm-up (one sf0.001 pass), printing every draw.
This is the measured explanation of why the bench headline exceeds the
stage profile's final row: the SAME plan's wall is a function of how
many times its generated code has executed (JIT tiering depth), not of
any cost the per-stage sum misses — the stage profile's final row IS
the whole pipeline, just sampled ~20 executions deeper because the
prefix stages re-execute its shared subplans. Round-9 numbers at sf0.1
(quiet box): draws 3-5 (what the bench child's min-of-3-after-2-full-
warms samples) min 1.45 s; draws 8-12 plateau 1.21 s; the stage
profile's final row (depth ~21-25, inter-draw System.gc) 0.87 s.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stages(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hdfs_hive_sql_playground_spark.queries.text import (
        CURATION_QUOTA,
        LEXICON,
        STOPWORDS,
        _bucketed_hash_order_rank,
        _words,
    )
    from hdfs_hive_sql_playground_spark.tables import load

    d = load(spark, sf_dir, "documents")
    t = F.lower(F.trim(F.col("text")))
    n_tokens = F.size(F.split(t, " "))
    n_stop = F.size(F.filter(F.split(t, " "), lambda w: w.isin(list(STOPWORDS))))
    quality = d.select("doc_id", t.alias("t")).filter(
        (n_tokens >= 20) & (n_tokens <= 1000) & (n_stop / n_tokens >= 0.01)
    )
    w_dedup = Window.partitionBy(F.md5(F.col("t"))).orderBy("doc_id")
    canon = (
        quality.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )
    toks = d.select("doc_id", F.explode(_words(F.col("text"))).alias("tok"))
    lex = F.broadcast(
        spark.createDataFrame(
            [(lang, w) for lang, ws in sorted(LEXICON.items()) for w in ws],
            "lang string, word string",
        )
    )
    hits = (
        toks.join(lex, toks.tok == lex.word)
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("lang"))
    best = (
        hits.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
    )
    langed = canon.join(best, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("lang"), F.lit("und")).alias("pred_lang")
    )
    ranked = _bucketed_hash_order_rank(
        langed, "pred_lang", "doc_id", "rn", keep_at_most=CURATION_QUOTA
    )
    full = ranked.filter(F.col("rn") <= CURATION_QUOTA).select(
        "pred_lang", "doc_id", "rn"
    )
    return [
        ("quality_gate", quality),
        ("plus_dedup_window", canon),
        ("lid_branch_alone", best),
        ("plus_canon_best_join", langed),
        ("full_with_quota_rank", full),
    ]


def trajectory(sf_dir: str) -> int:
    """Fresh-JVM draw-depth curve for the FULL pipeline only (see module
    docstring): replicates the bench child's warm-up, then 12 timed
    draws so the JIT-tiering decline and its plateau are both visible."""
    import time

    from hdfs_hive_sql_playground_spark.caching import release_tracked_caches
    from hdfs_hive_sql_playground_spark.queries import all_queries
    from hdfs_hive_sql_playground_spark.session import get_spark

    spark = get_spark(app_name="diag-q99-trajectory")
    fn = all_queries()["q99_curation_pipeline"].fn
    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_sf):
        fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
        release_tracked_caches()
    walls = []
    for _ in range(12):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        release_tracked_caches()
    print(f"draws={walls}")
    print(f"bench_protocol_depth_3_5_min={min(walls[2:5]):.3f}")
    print(f"plateau_depth_8_12_min={min(walls[7:]):.3f}")
    spark.stop()
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--trajectory"]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_draws = int(args[1]) if len(args) > 1 else 5

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    if "--trajectory" in sys.argv:
        return trajectory(sf_dir)
    from hdfs_hive_sql_playground_spark.caching import release_tracked_caches
    from hdfs_hive_sql_playground_spark.queries import all_queries
    from hdfs_hive_sql_playground_spark.session import get_spark

    spark = get_spark(app_name="diag-q99-stages")

    # Drift guard: the final stage here must BE the registry q99.
    reg = all_queries()["q99_curation_pipeline"].fn(spark, sf_dir)
    mine = stages(spark, sf_dir)[-1][1]
    assert sorted(map(tuple, reg.collect())) == sorted(map(tuple, mine.collect())), (
        "diag stages have drifted from queries/text.py::q99_curation_pipeline"
    )

    # Warm codegen at the tiny SF (same as bench.py's protocol).
    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_sf):
        for _, df in stages(spark, warm_sf):
            df.write.format("noop").mode("overwrite").save()
        release_tracked_caches()

    for name, df in stages(spark, sf_dir):
        walls = []
        for _ in range(n_draws):
            try:
                spark._jvm.System.gc()
                time.sleep(0.3)
            except Exception:  # noqa: BLE001 — GC nudge is best-effort
                pass
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            release_tracked_caches()
        print(f"{name:24s} min={min(walls):6.3f}  draws={walls}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
