"""Focused tests for q111's bucketed grouped-map (round 13 #19).

The applyInPandas key is a hash bucket of o_custkey, with the per-customer
demean computed by a pandas groupby-transform INSIDE each bucket. These
tests pin the two properties the optimization must preserve:

1. NULL customer keys form their own group (dropna=False in the body) —
   exactly what Spark's per-customer grouped-map and the window-function
   oracle both do. Without it, pandas silently drops NULL-keyed rows from
   the transform output.
2. The plan keeps the single-hash-exchange + FlatMapGroupsInPandas shape
   (the operator being demonstrated); the key change must not add an
   exchange or fall back to a row-at-a-time path.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_hive_sql_playground_spark import plans
from hdfs_hive_sql_playground_spark.queries import all_queries

SPECS = all_queries()


def test_q111_null_custkey_forms_its_own_group(spark, tmp_path):
    rows = [
        (1, 10, 100.0),
        (2, 10, 200.0),
        (3, None, 50.0),
        (4, None, 70.0),
        (5, 20, 30.0),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    )
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "orders.parquet"))

    got = sorted(
        (r.o_orderkey, r.o_custkey, r.dev_scaled_c, r.n_orders)
        for r in SPECS["q111_grouped_map_demean"].fn(spark, sf_dir).collect()
    )
    o = df.select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("price_c"),
    )
    w = Window.partitionBy("o_custkey")
    want = sorted(
        (r.o_orderkey, r.o_custkey, r.dev_scaled_c, r.n_orders)
        for r in o.select(
            "o_orderkey",
            "o_custkey",
            (F.col("price_c") * F.count("*").over(w) - F.sum("price_c").over(w))
            .cast("long")
            .alias("dev_scaled_c"),
            F.count("*").over(w).cast("long").alias("n_orders"),
        ).collect()
    )
    assert len(got) == len(rows), "a NULL-keyed row was dropped"
    assert got == want


def test_q111_plan_single_exchange_grouped_map(spark, sf_dir):
    df = SPECS["q111_grouped_map_demean"].fn(spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_exchanges(df) == 1, p
    assert "FlatMapGroupsInPandas" in p, p
    assert "BatchEvalPython" not in p, p
