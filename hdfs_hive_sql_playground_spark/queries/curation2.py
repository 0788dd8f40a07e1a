"""Second curation batch: benchmark decontamination and incremental
(batch-vs-corpus) dedup — the two operators a training-data pipeline runs
on every ingest, beyond the whole-corpus passes in ``dedup.py``.

Both are expressed so the expensive side scales: the probe set / corpus
hash set is the SMALL relation and is broadcast; the 100 TB side is
touched in one map pass plus one bounded join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_hive_sql_playground_spark.queries import register
from hdfs_hive_sql_playground_spark.queries.dedup import (
    _words,
    default_content_key,
)
from hdfs_hive_sql_playground_spark.tables import load

# Deterministic stand-in for a benchmark suite's n-gram probe index
# (the real pipeline builds these from eval-set documents; 3-gram probes
# at this corpus' scale behave like the 8-13-gram probes used on web
# corpora). Word triples drawn from the synthetic vocabulary.
PROBE_N = 3
PROBES: tuple[str, ...] = (
    "the fast key",
    "group query row",
    "window small hash",
    "customer line the",
    "slow small filter",
    "stream customer data",
)


def _probe_values_sql() -> str:
    rows = ", ".join(f"('{p}')" for p in PROBES)
    return f"(VALUES {rows}) AS probes(gram)"


def _doc_ngrams(n: int):
    """n-grams of the ``__w`` words column — call sites materialize
    ``_words(text)`` as ``__w`` first (a captured split EXPRESSION would
    re-tokenize per gram under the interpreted HOF path — see
    dedup._ngrams_of, which this delegates to)."""
    from hdfs_hive_sql_playground_spark.queries.dedup import _ngrams_of

    return _ngrams_of(F.col("__w"), n)


@register(
    "q108_decontaminate",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(trim(text, ' ')), ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(ws[t.i : t.i + {PROBE_N - 1}], ' ') AS gram
      FROM w, UNNEST(range(1, len(ws) - {PROBE_N} + 2)) AS t(i)
      WHERE len(ws) >= {PROBE_N}
    ),
    hits AS (
      SELECT g.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_hits,
             CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_probes_hit
      FROM g JOIN {_probe_values_sql()} ON g.gram = probes.gram
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_probes_hit, 0) AS n_probes_hit,
           CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END AS clean_flag
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    doc="Benchmark decontamination: flag documents containing any probe "
    f"n-gram from an eval-set index ({PROBE_N}-grams here). Doc n-grams "
    "explode map-side and hit a BROADCAST probe index — the corpus is "
    "never shuffled; the only exchange aggregates the (rare) hits. The "
    "standard eval-leakage guard run on every training-data ingest.",
)
def q108_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    probes = spark.createDataFrame([(p,) for p in PROBES], "gram string")
    g = d.select("doc_id", _words(F.col("text")).alias("__w")).select(
        "doc_id", F.explode(_doc_ngrams(PROBE_N)).alias("gram")
    )
    hits = (
        g.join(F.broadcast(probes), "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_hits"),
            F.countDistinct("gram").cast("bigint").alias("n_probes_hit"),
        )
    )
    return d.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        F.coalesce("n_probes_hit", F.lit(0)).cast("bigint").alias("n_probes_hit"),
        F.when(F.col("n_hits").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("clean_flag"),
    )


@register(
    "q109_incremental_dedup",
    oracle="""
    WITH corpus AS (
      SELECT md5(lower(trim(text, ' '))) AS h FROM documents WHERE doc_id % 10 <> 0
    ),
    batch AS (
      SELECT doc_id, md5(lower(trim(text, ' '))) AS h FROM documents WHERE doc_id % 10 = 0
    ),
    fresh AS (
      SELECT b.doc_id, b.h FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
    )
    SELECT doc_id, h AS content_hash
    FROM (
      SELECT doc_id, h,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM fresh
    ) WHERE rn = 1
    """,
    doc="Incremental ingest dedup: a new batch (doc_id % 10 = 0 here) is "
    "deduplicated against the existing corpus by normalized-content hash "
    "(LEFT ANTI join), then within itself (keep lowest doc_id per hash). "
    "Only 128-bit hashes ever shuffle — never document text; at 100 TB the "
    "corpus hash set is a bucketed table so the anti-join is shuffle-free.",
)
def q109_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = default_content_key(F.col("text")).alias("content_hash")
    corpus = d.filter(F.col("doc_id") % 10 != 0).select(h)
    batch = d.filter(F.col("doc_id") % 10 == 0).select("doc_id", h)
    fresh = batch.join(corpus, "content_hash", "left_anti")
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("content_hash").orderBy("doc_id")
    )
    return (
        fresh.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_hash")
    )
