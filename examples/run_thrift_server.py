"""Serve the engine over the HiveServer2 wire protocol and query it back
as a JDBC client — the reference's hs-node + beeline topology
(``playground.py:672-677``, ``bin/helper-scripts/bee.sh:2``) in one
process.

Usage::

    python examples/run_thrift_server.py [sf_dir]

Runs a self-check (wire results must equal in-process results) and prints
THRIFT_OK markers; with ``SPARK_GRAFT_THRIFT_HOLD=1`` it then stays up so
an external beeline can connect to the printed URL.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hdfs_hive_sql_playground_spark.engine import Engine  # noqa: E402
from hdfs_hive_sql_playground_spark.thrift import wire_sql, wire_tables  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    engine = Engine(app_name="thrift-serve").start()
    try:
        engine.register_testdata(sf_dir)
        server = engine.serve_thrift()
        print(f"thrift server listening: {server.url}")

        # Wire query vs in-process query: identical results required.
        sql = (
            "SELECT r_name, COUNT(*) AS n FROM nation n "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r_name ORDER BY r_name"
        )
        over_wire = [(r[0], int(r[1])) for r in wire_sql(engine.spark, server.url, sql)]
        in_proc = [(r.r_name, r.n) for r in engine.exec_sql(sql).collect()]
        assert over_wire == in_proc, (over_wire, in_proc)
        print(f"THRIFT_OK wire==inprocess rows={len(over_wire)}")

        # Wire-side DDL lands in the shared (singleSession) session.
        wire_sql(
            engine.spark,
            server.url,
            "CREATE OR REPLACE TEMPORARY VIEW wire_made AS "
            "SELECT n_nationkey FROM nation WHERE n_nationkey < 5",
        )
        assert engine.spark.table("wire_made").count() == 5
        print("THRIFT_OK wire-ddl-visible-to-engine")

        # Metadata surface (beeline's !tables).
        tables = wire_tables(engine.spark, server.url)
        assert "nation" in tables and "wire_made" in tables, tables
        print(f"THRIFT_OK metadata tables={len(tables)}")

        if os.environ.get("SPARK_GRAFT_THRIFT_HOLD") == "1":
            print("holding (Ctrl-C to exit)...")
            import time

            while True:
                time.sleep(60)
        server.stop()
        return 0
    finally:
        engine.stop()


if __name__ == "__main__":
    sys.exit(main())
