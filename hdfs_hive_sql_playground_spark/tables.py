"""Loaders for the driver-provided test tables (TESTDATA.md).

At 100 TB these would be partitioned/bucketed external tables on a
distributed store; the access pattern is identical — ``spark.read.parquet``
on a directory — so nothing here changes with scale. Column pruning and
predicate pushdown reach the parquet scan because every consumer expresses
its query declaratively on the returned DataFrame.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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
    # Runtime-set so foreign sessions (e.g. the verification driver's, built
    # without our session defaults) scan timestamps the same way we do:
    # TIMESTAMP(NANOS) as nanosecond longs (converted below) instead of
    # PARQUET_TYPE_ILLEGAL, and naive timestamp[us] (the current testdata
    # vintage for events.ts / o_orderdate / l_shipdate) as TIMESTAMP rather
    # than TIMESTAMP_NTZ — with the UTC session timezone the values match
    # the oracle's naive reading, and reader-level handling (vs a cast)
    # keeps min/max pushdown on timestamp columns intact.
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # The naive-timestamp contract above depends on the session timezone
    # being UTC; our own sessions pin it, but a foreign driver session
    # inherits the host JVM zone — set it here so correctness never rides
    # on the host being UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    # (PARQUET_TYPE_ILLEGAL). The session sets
    # spark.sql.legacy.parquet.nanosAsLong=true so it scans as a raw
    # nanosecond long; convert to a microsecond timestamp with integer
    # `div` (never float division — epoch-nanos exceed 2^53). Truncation
    # toward zero matches DuckDB's TIMESTAMP_NS → TIMESTAMP cast, so the
    # oracle sees identical values.
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def parquet_row_count(path: str) -> int:
    """Total row count of a parquet file or directory from FOOTER METADATA
    only — no data pages read, no Spark job scheduled.

    Driver-side strategy probes (q136's rewrite-join pick) call this at
    plan-BUILD time, so it must never run a Spark action: an eager
    ``df.count()`` there would make merely constructing the DataFrame
    (explain-only paths, plan tests, repeated ``spec.fn`` calls) pay a scan
    job each time, breaking the build-is-lazy contract every other registry
    query keeps. A parquet footer is a few KB per file regardless of data
    size, so this stays O(#files) metadata reads at 100 TB (and on a real
    cluster the same number would come from catalog stats / manifest
    files). Cached per (path, file-list fingerprint): the fingerprint
    (sorted names + sizes + mtime_ns, pure os.stat — no footer reads)
    invalidates the entry when a path is rewritten in-process (e.g. a
    regenerated .bench_data trend fixture after a partial prior run), so a
    stale count can never silently flip q136's broadcast-vs-shuffle pick.
    """
    if os.path.isdir(path):
        files = sorted(
            os.path.join(root, fn)
            for root, _dirs, fns in os.walk(path)
            for fn in fns
            if fn.endswith(".parquet") and not fn.startswith(("_", "."))
        )
    else:
        files = [path]
    stats = tuple(
        (f, st.st_size, st.st_mtime_ns) for f in files for st in (os.stat(f),)
    )
    return _footer_row_count(stats)


@functools.lru_cache(maxsize=None)
def _footer_row_count(stats: tuple[tuple[str, int, int], ...]) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f, _size, _mtime in stats)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so plain SQL can reference it."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
