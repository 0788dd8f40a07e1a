"""Dump `.explain("formatted")` for named registry queries to files.

Usage: python scripts/dump_plan.py OUTDIR SUFFIX QUERY [QUERY...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, evaluated against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01) on local[4].
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from hdfs_hive_sql_playground_spark.queries import all_queries
    from hdfs_hive_sql_playground_spark.session import get_spark

    spark = get_spark(
        app_name="plan-dump",
        master="local[4]",
        shuffle_partitions=8,
        conf={"spark.driver.memory": "4g"},
    )
    registry = all_queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
