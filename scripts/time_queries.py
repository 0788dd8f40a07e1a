"""Warm min-of-N noop-sink walls for named registry queries at a SF dir.

Usage: python scripts/time_queries.py q81_minhash_lsh_neardup [more...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), DRAWS (default 3).
Protocol matches bench.py's registry legs: one sf0.001 warm pass
(codegen), two untimed target-SF passes (JIT plateau), then min-of-N
timed draws with tracked caches released between draws.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from hdfs_hive_sql_playground_spark.caching import release_tracked_caches
    from hdfs_hive_sql_playground_spark.queries import all_queries
    from hdfs_hive_sql_playground_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    draws = int(os.environ.get("DRAWS", "3"))
    spark = get_spark(app_name="time-queries")
    specs = all_queries()
    for name in sys.argv[1:]:
        fn = specs[name].fn
        spark.sparkContext.setJobDescription(f"time: {name}")
        if os.path.isdir(warm_sf):
            fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
            release_tracked_caches()
        for _ in range(2):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            release_tracked_caches()
        walls = []
        for _ in range(draws):
            spark._jvm.System.gc()
            time.sleep(0.3)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            release_tracked_caches()
        print(f"{name}: min={min(walls)} draws={walls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
