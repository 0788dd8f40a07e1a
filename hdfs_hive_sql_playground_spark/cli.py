"""CLI mirroring the reference's ``playground.py`` verbs where they still
make sense on Spark (``playground.py:1050-1225`` argparse surface).

Dropped verbs are the Docker/daemon plumbing that has no Spark analog
(format-hdfs, per-node log cat, container lifecycle); kept verbs map:

| reference verb              | here            |
|-----------------------------|-----------------|
| setup / start-*             | (implicit — a session starts per command) |
| print-health-report         | health          |
| exec-hive-query SQL         | exec-sql SQL    |
| exec-hive-file FILE         | exec-file FILE  |
| sqoop-export                | m33-export      |
| sql-exec-query (TOP n read) | exec-sql with TOP rewrite |
| (runall.py pipeline)        | m33-pipeline    |
| start-* (hiveserver2 on hs) | serve-thrift    |

Usage: python -m hdfs_hive_sql_playground_spark.cli <verb> [args]
"""

from __future__ import annotations

import argparse
import json
import sys

from hdfs_hive_sql_playground_spark.engine import Engine


def _show(df, n: int = 20) -> None:
    df.show(n, truncate=False)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hhsp-spark", description=__doc__)
    p.add_argument("--master", default=None, help="Spark master (default local[cpus])")
    sub = p.add_subparsers(dest="verb", required=True)

    sub.add_parser("health", help="session + warehouse health report")
    sub.add_parser("logs", help="execution history + effective config (print-hadoop-logs analog)")

    q = sub.add_parser("exec-sql", help="run SQL (field()/TOP dialect shims applied)")
    q.add_argument("sql")
    q.add_argument("--testdata", default=None, help="sf dir to register as views")
    q.add_argument("--m33", action="store_true", help="register m33_raw/m33_schem views")
    q.add_argument("-n", type=int, default=20, help="rows to show")

    f = sub.add_parser("exec-file", help="run ;-separated SQL file")
    f.add_argument("path")
    f.add_argument("--testdata", default=None)
    f.add_argument("--m33", action="store_true")

    pipe = sub.add_parser("m33-pipeline", help="run the full runall.py-equivalent sequence")
    pipe.add_argument("--jdbc-url", default="jdbc:derby:memory:m33db;create=true")

    exp = sub.add_parser("m33-export", help="CTAS + JDBC export + verification count")
    exp.add_argument("--jdbc-url", default="jdbc:derby:memory:m33db;create=true")
    exp.add_argument("--num-partitions", type=int, default=4)
    exp.add_argument("--batchsize", type=int, default=1000)

    srv = sub.add_parser(
        "serve-thrift",
        help="serve the session over the HiveServer2 wire protocol "
        "(start-hiveserver2 analog; connect with any hive2 JDBC client)",
    )
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=None, help="default: a free port")
    srv.add_argument("--testdata", default=None, help="sf dir to register as views")
    srv.add_argument("--m33", action="store_true", help="register m33_raw/m33_schem views")

    args = p.parse_args(argv)
    eng = Engine(master=args.master).start()
    try:
        if args.verb == "health":
            print(json.dumps(eng.health(), indent=2))
        elif args.verb == "logs":
            print(json.dumps(eng.logs(), indent=2))
        elif args.verb in ("exec-sql", "exec-file"):
            if args.testdata:
                eng.register_testdata(args.testdata)
            if args.m33:
                eng.m33_create_views()
            if args.verb == "exec-sql":
                _show(eng.exec_sql(args.sql), args.n)
            else:
                for df in eng.exec_file(args.path):
                    _show(df)
        elif args.verb == "m33-pipeline":
            eng.m33_create_views()
            _show(eng.exec_sql("SELECT * FROM m33_schem ORDER BY wavelength, age_mil, is_peculiar LIMIT 5"))
            path = eng.m33_ctas()
            print(f"CTAS -> {path}")
            n = eng.m33_export(args.jdbc_url)
            print(f"exported + verified rows: {n}")
        elif args.verb == "m33-export":
            eng.m33_create_views()
            eng.m33_ctas()
            n = eng.m33_export(args.jdbc_url, num_partitions=args.num_partitions, batchsize=args.batchsize)
            print(f"exported + verified rows: {n}")
        elif args.verb == "serve-thrift":
            if args.testdata:
                eng.register_testdata(args.testdata)
            if args.m33:
                eng.m33_create_views()
            server = eng.serve_thrift(host=args.host, port=args.port)
            print(f"listening: {server.url}", flush=True)
            try:
                import time

                while True:
                    time.sleep(60)
            except KeyboardInterrupt:
                server.stop()
    finally:
        eng.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
