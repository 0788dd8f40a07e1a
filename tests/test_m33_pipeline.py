"""m33 pipeline invariants (FIXTURES.md §1.5) + partition-pruning plan check."""

from __future__ import annotations

import pyspark.sql.functions as F

from hdfs_hive_sql_playground_spark.m33 import m33_raw, m33_schem

ROWS_PER_FILE = 1000
N_FILES = 4


def test_ctas_text_hive_serde_null_roundtrip(spark, tmp_path):
    """ctas_text serializes like Hive's LazySimpleSerDe: unquoted cells,
    NULL as \\N — and read_text_table round-trips it exactly, nulls
    included."""
    from hdfs_hive_sql_playground_spark.sinks import ctas_text, read_text_table

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, None, None), (3, "g mma", 0.25)],
        "id bigint, name string, score double",
    )
    ctas_text(df, "null_rt", warehouse_dir=str(tmp_path))
    back = read_text_table(
        spark, "null_rt", "id bigint, name string, score double", str(tmp_path)
    )
    got = sorted((r.id, r.name, r.score) for r in back.collect())
    assert got == [(1, "alpha", 1.5), (2, None, None), (3, "g mma", 0.25)]
    # On-disk format check: raw line, no quoting, \N for NULL.
    raw = {
        r.value
        for r in spark.read.text(str(tmp_path / "null_rt")).collect()
    }
    assert "2,\\N,\\N" in raw, raw


def test_ctas_text_empty_string_reads_back_null(spark, tmp_path):
    """Documented LazySimpleSerDe divergence: an empty-string cell is
    written as a bare empty field and READS BACK AS NULL (Spark's CSV
    reader nulls unquoted empties, SPARK-25241); only the \\N token is
    Hive-exact. This test pins the behavior so a writer/reader change
    that silently alters it is caught."""
    from hdfs_hive_sql_playground_spark.sinks import ctas_text, read_text_table

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x")], "id bigint, name string"
    )
    ctas_text(df, "empty_rt", warehouse_dir=str(tmp_path))
    back = read_text_table(spark, "empty_rt", "id bigint, name string", str(tmp_path))
    assert sorted((r.id, r.name) for r in back.collect()) == [
        (1, None),  # '' became NULL — the documented divergence
        (2, None),
        (3, "x"),
    ]
    raw = {r.value for r in spark.read.text(str(tmp_path / "empty_rt")).collect()}
    assert "1," in raw and "2,\\N" in raw


def test_m33_raw_header_skip_and_counts(spark):
    raw = m33_raw(spark)
    assert raw.count() == ROWS_PER_FILE * N_FILES  # 3 header lines/file dropped
    # No header junk leaks through.
    assert raw.filter(F.col("row_str").startswith("#")).count() == 0


def test_m33_schem_invariants(spark):
    v = m33_schem(spark)
    rows = (
        v.groupBy("age_mil", "is_peculiar")
        .agg(F.count(F.lit(1)).alias("n"), F.min("wavelength").alias("lo"), F.max("wavelength").alias("hi"))
        .collect()
    )
    assert len(rows) == 4
    for r in rows:
        assert r.age_mil in (11, 12)
        assert r.is_peculiar in (0, 1)
        assert r.n == ROWS_PER_FILE
        assert r.lo == 3000.0
        assert r.hi == 3000.0 + (ROWS_PER_FILE - 1) * 0.01


def test_m33_partition_pruning_in_plan(spark):
    """A filter on the partition column must constant-fold the other
    partition's scan branch out of the optimized plan entirely — the
    no-metastore analog of Hive static partition pruning (A4)."""
    unfiltered = m33_raw(spark)._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in unfiltered  # both partition branches present

    df = m33_raw(spark).filter(F.col("peculiarity") == "cp")
    assert "Union" not in df._jdf.queryExecution().optimizedPlan().toString()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "/nocp" not in executed and "/cp" in executed
    assert df.count() == 2 * ROWS_PER_FILE


def test_m33_limit_no_global_materialization(spark):
    assert m33_schem(spark).limit(100).count() == 100
