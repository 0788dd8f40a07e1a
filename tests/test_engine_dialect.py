"""Engine facade, dialect rewrites, CTAS/JDBC sinks, CLI."""

from __future__ import annotations

import pyspark.sql.functions as F

from hdfs_hive_sql_playground_spark import dialect
from hdfs_hive_sql_playground_spark.engine import Engine


def test_field_rewrite_basic():
    assert (
        dialect.rewrite_field("SELECT field(peculiarity,'nocp','cp') - 1 FROM t")
        == "SELECT coalesce(array_position(array('nocp', 'cp'), peculiarity), 0) - 1 FROM t"
    )


def test_field_rewrite_ignores_literals_and_nests():
    sql = "SELECT 'field(a,b)' AS s, field(x, field(y, 'a', 'b'), 2) FROM t"
    out = dialect.rewrite_field(sql)
    assert out.startswith("SELECT 'field(a,b)' AS s, coalesce(array_position(")
    assert "coalesce(array_position(array('a', 'b'), y), 0)" in out


def test_top_rewrite():
    assert dialect.rewrite("SELECT TOP 100 * FROM m33;") == "SELECT * FROM m33 LIMIT 100"
    assert dialect.rewrite("SELECT t FROM x") == "SELECT t FROM x"


def test_engine_exec_sql_field_matches_hive_semantics(spark, sf_dir):
    eng = Engine()
    eng._spark = spark  # reuse the test session
    eng.register_testdata(sf_dir)
    rows = eng.exec_sql(
        "SELECT field(o_orderstatus, 'F', 'O', 'P') AS f, field(NULL, 'a') AS z "
        "FROM orders LIMIT 5"
    ).collect()
    assert all(r.f in (1, 2, 3) and r.z == 0 for r in rows)


def test_engine_health_and_m33_pipeline(spark):
    eng = Engine()
    eng._spark = spark
    h = eng.health()
    assert h["healthy"] and h["session"] == "alive" and h["warehouse_writable"]

    eng.m33_create_views()
    top = eng.exec_sql("SELECT TOP 7 * FROM m33_schem").collect()
    assert len(top) == 7

    eng.m33_ctas(table="m33_test")
    assert eng.spark.table("m33_test").count() == 4000

    n = eng.m33_export(
        "jdbc:derby:memory:enginetest;create=true",
        table="m33_test",
        num_partitions=2,
        batchsize=500,
    )
    assert n == 4000


def test_jdbc_ddl_side_channel(spark):
    from hdfs_hive_sql_playground_spark.sources.jdbc import jdbc_ddl, read_jdbc

    url = "jdbc:derby:memory:ddltest;create=true"
    jdbc_ddl(
        spark,
        url,
        "CREATE TABLE t_ddl (a BIGINT, b DOUBLE)",
        "INSERT INTO t_ddl VALUES (1, 2.5), (2, 3.5)",
    )
    df = read_jdbc(spark, url, "t_ddl")
    assert df.count() == 2
    assert df.agg(F.sum("b")).collect()[0][0] == 6.0


def test_engine_ingest(spark, tmp_path):
    eng = Engine()
    eng._spark = spark
    src = tmp_path / "src" / "part=a"
    src.mkdir(parents=True)
    (src / "f1.txt").write_text("hello\n")
    (tmp_path / "src" / "f0.txt").write_text("root\n")
    n = eng.ingest(str(tmp_path / "src"), str(tmp_path / "dst"))
    assert n == 2
    assert (tmp_path / "dst" / "part=a" / "f1.txt").read_text() == "hello\n"
    got = spark.read.option("recursiveFileLookup", "true").text(str(tmp_path / "dst")).count()
    assert got == 2


def test_input_file_name_rewrite():
    out = dialect.rewrite("SELECT regexp_extract(INPUT__FILE__NAME, '(a)(b)', 2) FROM t")
    assert "input_file_name()" in out and "INPUT__FILE__NAME" not in out
    # untouched inside string literals
    assert dialect.rewrite("SELECT 'INPUT__FILE__NAME' FROM t") == "SELECT 'INPUT__FILE__NAME' FROM t"


def test_ctas_parquet_roundtrip(spark):
    from hdfs_hive_sql_playground_spark.m33 import m33_schem
    from hdfs_hive_sql_playground_spark.sinks import ctas_parquet

    path = ctas_parquet(m33_schem(spark), "m33_parquet_test")
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert dict(back.dtypes)["wavelength"] == "double"
