"""Loaders for the driver-provided test tables (TESTDATA.md).

At 100 TB these would be partitioned/bucketed external tables on a
distributed store; the access pattern is identical — ``spark.read.parquet``
on a directory — so nothing here changes with scale. Column pruning and
predicate pushdown reach the parquet scan because every consumer expresses
its query declaratively on the returned DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so plain SQL can reference it."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
