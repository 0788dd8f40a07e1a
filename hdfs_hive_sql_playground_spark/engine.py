"""Engine facade: session lifecycle, health introspection, SQL pass-through
with dialect shims, and the m33 example pipeline as one-call verbs.

Replaces the reference's cluster orchestration layer (``playground.py``):
there are no Docker nodes or daemons — a SparkSession is the cluster
handle — so setup/start/stop collapse to session management (A27-A29) and
the JMX health polling (``playground.py:339-431,576-588``) collapses to
session/executor introspection. The CLI verbs that still make sense are
kept name-compatible (see :mod:`hdfs_hive_sql_playground_spark.cli`).
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from hdfs_hive_sql_playground_spark import dialect
from hdfs_hive_sql_playground_spark.session import get_spark
from hdfs_hive_sql_playground_spark.sinks import DEFAULT_WAREHOUSE, ctas_text, read_text_table
from hdfs_hive_sql_playground_spark.sources.jdbc import export_jdbc, jdbc_ddl, read_jdbc
from hdfs_hive_sql_playground_spark.tables import TABLES, load


@dataclass
class Engine:
    """A running engine = one SparkSession + a warehouse directory."""

    app_name: str = "hdfs-hive-sql-playground-spark"
    master: str | None = None
    warehouse_dir: str = DEFAULT_WAREHOUSE
    conf: dict[str, str] = dc_field(default_factory=dict)
    _spark: SparkSession | None = None

    # -- lifecycle (A27-A29) -------------------------------------------------

    def start(self) -> "Engine":
        self._spark = get_spark(
            app_name=self.app_name,
            master=self.master,
            warehouse_dir=self.warehouse_dir,
            conf=self.conf,
        )
        return self

    def stop(self) -> None:
        if self._spark is not None:
            self._spark.stop()
            self._spark = None

    @property
    def spark(self) -> SparkSession:
        if self._spark is None:
            raise RuntimeError("engine not started; call start()")
        return self._spark

    def health(self) -> dict[str, Any]:
        """Degenerate-but-API-compatible health report (the Spark analog of
        ``print-health-report``, ``playground.py:465-497``): session alive,
        warehouse writable, parallelism available."""
        report: dict[str, Any] = {"healthy": False}
        if self._spark is None:
            report["session"] = "stopped"
            return report
        sc = self._spark.sparkContext
        report["session"] = "alive"
        report["app_id"] = sc.applicationId
        report["master"] = sc.master
        report["spark_version"] = self._spark.version
        report["default_parallelism"] = sc.defaultParallelism
        try:
            os.makedirs(self.warehouse_dir, exist_ok=True)
            with tempfile.NamedTemporaryFile(dir=self.warehouse_dir):
                pass
            report["warehouse_writable"] = True
        except OSError:
            report["warehouse_writable"] = False
        report["healthy"] = report["warehouse_writable"] and sc.defaultParallelism > 0
        return report

    # -- SQL pass-through with dialect shims (Tier B; A13, A26) --------------

    def exec_sql(self, sql: str) -> DataFrame:
        """``exec-hive-query`` analog: arbitrary SQL, with ``field()`` and
        ``TOP n`` rewritten to Spark SQL (``playground.py:745-750``)."""
        return self.spark.sql(dialect.rewrite(sql))

    def exec_file(self, path: str) -> list[DataFrame]:
        """``exec-hive-file`` analog: run each ;-terminated statement
        (``playground.py:738-743``)."""
        with open(path) as f:
            text = f.read()
        results = []
        for stmt in [s.strip() for s in text.split(";") if s.strip()]:
            results.append(self.exec_sql(stmt))
        return results

    def register_testdata(self, sf_dir: str) -> None:
        for name in TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                load(self.spark, sf_dir, name).createOrReplaceTempView(name)

    # -- m33 pipeline verbs (the runall.py sequence) -------------------------

    def m33_create_views(self, base_dir: str | None = None) -> None:
        """Register ``m33_raw`` and ``m33_schem`` (runall steps 3-4)."""
        from hdfs_hive_sql_playground_spark.m33 import m33_raw, m33_schem

        m33_raw(self.spark, base_dir).createOrReplaceTempView("m33_raw")
        m33_schem(self.spark, base_dir).createOrReplaceTempView("m33_schem")

    def m33_ctas(self, table: str = "m33") -> str:
        """CTAS the typed view to comma-delimited text (runall step 6, A17)
        and register the read-back table."""
        path = ctas_text(self.spark.table("m33_schem"), table, self.warehouse_dir)
        read_text_table(
            self.spark,
            table,
            "age_mil bigint, wavelength double, flam double, is_peculiar int",
            self.warehouse_dir,
        ).createOrReplaceTempView(table)
        return path

    def m33_export(
        self,
        url: str,
        table: str = "m33",
        num_partitions: int = 4,
        batchsize: int = 1000,
        create_ddl: str | None = None,
    ) -> int:
        """JDBC export + verification count (runall steps 7-10, A18-A26)."""
        if create_ddl:
            jdbc_ddl(self.spark, url, create_ddl)
        df = self.spark.table(table)
        export_jdbc(df, url, table, num_partitions=num_partitions, batchsize=batchsize)
        return read_jdbc(self.spark, url, table).count()
