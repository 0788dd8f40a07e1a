"""Diagnose the trend_m33_ctas_x10 session-state regression (round-6
verdict item #3: 9.27 s -> 28.0 s driver, reproducible in-session but not
in a fresh session).

Runs the x10 CTAS leg under a controlled amount of prior session work and
reports wall times plus JVM memory-pool occupancy (code-cache segments,
old gen) right before the timed runs, so the regressing state is named
with numbers, not guessed::

    python scripts/diag_ctas_x10.py fresh   [code_cache] [draws]
    python scripts/diag_ctas_x10.py history [code_cache] [draws]

``fresh``   = new JVM, warm count pass, then timed draws (the engine).
``history`` = replicate what the bench session does before the trend leg:
the x1 m33 headline section, the registry-wide sf0.001 warm pass, and the
doc/skew trend legs' fixture reads — then the same timed draws.

One JSON line on stdout: {"mode":..., "cc":..., "walls":[...],
"pools_before":{...}, "pools_after":{...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _pools(spark) -> dict[str, str]:
    out = {}
    mf = spark._jvm.java.lang.management.ManagementFactory
    for p in mf.getMemoryPoolMXBeans():
        name = p.getName()
        if "CodeHeap" in name or "Old Gen" in name or "CodeCache" in name:
            u = p.getUsage()
            out[name] = f"{u.getUsed() // (1 << 20)}/{u.getMax() // (1 << 20)}MB"
    return out


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "fresh"
    cc = sys.argv[2] if len(sys.argv) > 2 else "480m"
    draws = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.environ["SPARK_GRAFT_CODE_CACHE"] = cc
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

    import bench
    from hdfs_hive_sql_playground_spark.m33 import m33_schem
    from hdfs_hive_sql_playground_spark.session import get_spark
    from hdfs_hive_sql_playground_spark.sinks import ctas_text

    spark = get_spark(app_name=f"diag-ctas-{mode}-{cc}")
    ctas_dir = bench._ensure_m33_at(bench.CTAS_TREND_SCALE)

    if mode == "history":
        from hdfs_hive_sql_playground_spark.caching import release_tracked_caches
        from hdfs_hive_sql_playground_spark.queries import all_queries

        specs = {n: s for n, s in all_queries().items() if s.bench}
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        next(iter(specs.values())).fn(spark, sf_dir).count()
        spark.range(32).mapInPandas(lambda it: it, schema="id long").count()
        t: dict[str, float] = {}
        bench._bench_m33(spark, t)
        warm_sf = "/root/testdata/sf0.001"
        for spec in specs.values():
            spec.fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
        release_tracked_caches()
        for name, spec in sorted(specs.items()):
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            release_tracked_caches()
        bench._bench_doc_trend(spark, sf_dir, t)
        bench._bench_doc_skew_trend(spark, sf_dir, t)

    # Warm pass (the trend leg's own protocol), then timed draws.
    m33_schem(spark, ctas_dir).count()
    before = _pools(spark)
    walls = []
    for _ in range(draws):
        bench._quiesce(spark)
        t0 = time.perf_counter()
        ctas_text(m33_schem(spark, ctas_dir), "m33_diag_trend")
        walls.append(round(time.perf_counter() - t0, 2))
    after = _pools(spark)
    print(
        json.dumps(
            {
                "mode": mode,
                "cc": cc,
                "walls": walls,
                "pools_before": before,
                "pools_after": after,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
