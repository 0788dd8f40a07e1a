"""Benchmark harness: runs the bench-flagged queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing is per-query wall time of a full execution (count-style action that
materializes every row of the result, via a noop-write to avoid driver
collection costs dominating).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from hdfs_hive_sql_playground_spark.queries import all_queries
    from hdfs_hive_sql_playground_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = {n: s for n, s in all_queries().items() if s.bench}

    # Warm the JVM + file listing once so per-query numbers measure the
    # query, not session startup.
    next(iter(specs.values())).fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
