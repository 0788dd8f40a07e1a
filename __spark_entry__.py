"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``hdfs_hive_sql_playground_spark.queries`` — this
module only adapts that registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from hdfs_hive_sql_playground_spark.queries import all_queries

    spec = all_queries()["q01_pricing_summary"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hdfs_hive_sql_playground_spark.queries import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; queries
    without an entry here get the driver's weaker rows-only check."""
    from hdfs_hive_sql_playground_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
