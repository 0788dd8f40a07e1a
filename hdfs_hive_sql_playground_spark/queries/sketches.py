"""Mergeable-sketch operators for corpus statistics at 100 TB.

First entry: two-pass Misra-Gries heavy hitters. The naive "what are the
frequent tokens" query is a full groupBy over every token occurrence —
at 100 TB that shuffle carries the whole tokenized corpus. The sketch
pass instead keeps a bounded O(capacity) summary per partition (no
shuffle at all: candidates are a few hundred rows collected from a
``mapInPandas`` pass), then an exact second pass recounts ONLY the
candidate tokens behind a broadcast semi-join, so the one real shuffle
is bounded by |candidates| groups.

Determinism: the candidate SET depends on partition layout (Misra-Gries
is stream-order sensitive), but the FINAL output does not — MG with
capacity c guarantees every token with global frequency > N/c survives
in at least one partition's summary (pigeonhole over partitions), and
the exact recount + ``cnt * c > N`` filter removes every false
positive. The result is exactly the set of tokens with frequency
strictly above N/capacity, independent of partitioning — which is what
makes the operator oracle-checkable against a plain GROUP BY / HAVING.

Reference capability: corpus-level token statistics of the kind the
reference's aggregation surface (SURVEY §2 Tier B, GROUP BY/HAVING over
exploded tokens) expresses — re-shaped here so the 100 TB plan is a
bounded-state sketch instead of an unbounded shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_hive_sql_playground_spark.queries import register
from hdfs_hive_sql_playground_spark.queries.dedup import _words
from hdfs_hive_sql_playground_spark.tables import load

# Sketch capacity c: the guarantee is "every token with freq > N/c is
# found". 64 keeps the per-partition state trivially small while making
# the threshold meaningful on the synthetic corpus vocabulary.
MG_CAPACITY = 64


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Weighted Misra-Gries over one partition's documents.

    Per Arrow batch the token counts are computed vectorized
    (``str.split`` + ``explode`` + ``value_counts``); the sequential MG
    merge then runs over DISTINCT tokens of the batch (vocabulary-sized,
    not corpus-sized). Weighted update: add the batch count, and when
    the summary exceeds capacity subtract the minimum counter from all
    entries and drop the zeros — the standard weighted MG step, same
    error bound (≤ N_partition / capacity) as the unit-update variant.
    """
    counters: dict[str, int] = {}
    for pdf in batches:
        toks = pdf["text"].str.lower().str.strip().str.split().explode()
        for tok, cnt in toks.value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > MG_CAPACITY:
                dec = min(counters.values())
                counters = {t: c - dec for t, c in counters.items() if c > dec}
    yield pd.DataFrame({"tok": list(counters.keys())})


@register(
    "q104_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT UNNEST(string_split_regex(lower(trim(text, ' ')), '[ \\t\\n\\x0b\\f\\r]+')) AS tok FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM toks)
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(COUNT(*) * 1.0 / MAX(tot.n_total), 6) AS freq
    FROM toks, tot
    GROUP BY tok
    HAVING COUNT(*) * {MG_CAPACITY} > MAX(tot.n_total)
    """,
    doc="Two-pass Misra-Gries heavy hitters: bounded per-partition sketch "
    "emits candidates (no shuffle), exact recount behind a broadcast "
    "semi-join confirms them. Output = exactly the tokens with frequency "
    f"> N/{MG_CAPACITY}, independent of partition layout.",
    bench=True,
)
def q104_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("text")
    candidates = (
        docs.mapInPandas(_mg_candidates, schema="tok string").distinct()
    )
    toks = docs.select(F.explode(_words(F.col("text"))).alias("tok"))
    # N = sum of per-doc word counts: an array-size aggregate over the scan,
    # cheaper than counting the exploded stream a second time.
    total = docs.agg(
        F.sum(F.size(_words(F.col("text")))).cast("bigint").alias("n_total")
    )
    counts = (
        toks.join(F.broadcast(candidates), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * MG_CAPACITY > F.col("n_total"))
        .select(
            "tok",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(F.col("cnt") / F.col("n_total"), 6).alias("freq"),
        )
    )
