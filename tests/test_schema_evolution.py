"""Schema evolution on the parquet source path: batches written over time
gain columns; readers must merge footers and null-fill missing columns —
the standard 100 TB data-lake situation (file formats, SURVEY §2 Tier B)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_parquet_merge_schema_across_batches(spark, tmp_path):
    base = str(tmp_path / "evo")
    spark.range(10).selectExpr("id", "id * 2 AS v1").write.parquet(f"{base}/day=1")
    spark.range(10).selectExpr("id", "id * 3 AS v1", "id * 5 AS v2").write.parquet(
        f"{base}/day=2"
    )
    df = spark.read.option("mergeSchema", True).parquet(base)
    assert set(df.columns) == {"id", "v1", "v2", "day"}
    # old batch null-fills the new column; new batch carries it
    assert df.filter((F.col("day") == 1) & F.col("v2").isNotNull()).count() == 0
    assert df.filter((F.col("day") == 2) & F.col("v2").isNull()).count() == 0
    assert df.count() == 20
    # partition-column filter still prunes to one directory
    pruned = df.filter(F.col("day") == 2)
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    assert all("day=2" in f for f in files)
