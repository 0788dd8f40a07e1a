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


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effects: each module registers its queries.
    from hdfs_hive_sql_playground_spark.queries import (  # noqa: F401
        advanced_sql,
        dedup,
        events,
        formats,
        m33_pipeline,
        multimodal,
        relational,
        similarity,
        text,
        udfs,
    )

    return REGISTRY
