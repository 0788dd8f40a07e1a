"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` pipelines.

The container has no image/audio codecs, so the DECODE step is stubbed
(``decode_media`` raises ``NotImplementedError``; the registered queries
use ``fake_features``, a deterministic byte-level extractor) — but every
piece of Spark plumbing a real decoder needs is in place and tested:

- the asset table schema (``doc_id, blob BINARY, meta STRUCT``),
- Arrow batch transfer into pandas (``mapInPandas`` with an explicit
  output schema),
- per-batch vectorized processing (numpy over byte arrays, never
  per-row Python in the driver),
- frame segmentation (fixed-size chunking of the payload — the shape of
  video frame-sampling / audio windowing).

Swapping ``fake_features`` for a PIL/libav decoder changes ONE function;
the plan, schema, and batch flow stay identical. At 100 TB the pipeline
is a single map pass: no shuffle, no driver collection, batch size
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

The test corpus is ASCII text re-encoded as bytes, which makes even the
byte-level features oracle-checkable in DuckDB (byte == char there).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_hive_sql_playground_spark.queries import register
from hdfs_hive_sql_playground_spark.tables import load

FRAME_BYTES = 32
CHECKSUM_PREFIX = 64


def decode_media(blob: bytes, media_type: str):
    """Real decoder hook — intentionally unimplemented in this container
    (no PIL/libav). Production: decode to ndarray here; everything
    downstream (batching, schema, frame logic) is already wired."""
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; "
        "use fake_features for the deterministic byte-level path"
    )


def assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal asset table: binary payload + typed metadata struct
    (media_type, n_bytes) — the schema a mixed image/audio/text corpus
    shares at rest.

    Payload convention (pinned by the adversarial multimodal gate): a
    MISSING payload (NULL text / NULL blob) is a ZERO-LENGTH asset —
    coalesced to empty bytes here at the table boundary, so n_bytes is 0
    (never NULL), downstream frame math yields 0 frames, and the Arrow
    UDFs never see None in a bytes column (a raw None crashed the
    b''.join packing — found by the round-9 gate). The oracles apply the
    same COALESCE(text, '')."""
    d = load(spark, sf_dir, "documents")
    blob = F.coalesce(F.encode(F.col("text"), "utf-8"), F.lit(b""))
    return d.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.length(blob).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, first_byte int, last_byte int, "
    "checksum_prefix bigint, n_frames bigint, last_frame_len bigint"
)


def fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level 'decode': per-batch vectorized feature
    extraction standing in for a codec. Pure function of the payload.

    The whole batch's payloads are packed into ONE uint8 buffer with an
    offset vector; every feature is then a numpy gather/prefix-sum over
    that buffer — no per-row Python inside the batch loop."""
    import numpy as np

    for pdf in batches:
        # None -> b"": assets() already coalesces, but direct callers may
        # not — the zero-length-asset convention holds at both layers.
        blobs = pdf["blob"].fillna(b"")
        nb = blobs.str.len().to_numpy(dtype="int64")
        buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        ends = nb.cumsum()
        starts = ends - nb
        if len(buf):
            first = np.where(nb > 0, buf[np.minimum(starts, len(buf) - 1)], -1)
            last = np.where(nb > 0, buf[np.maximum(ends - 1, 0)], -1)
            # prefix-sum trick: sum of bytes [start, start+min(nb, PREFIX))
            csum = np.concatenate(([0], buf.astype(np.int64).cumsum()))
            pref_end = starts + np.minimum(nb, CHECKSUM_PREFIX)
            checksum = csum[pref_end] - csum[starts]
        else:
            first = np.full(len(nb), -1, dtype=np.int64)
            last = np.full(len(nb), -1, dtype=np.int64)
            checksum = np.zeros(len(nb), dtype=np.int64)
        n_frames = -(-nb // FRAME_BYTES)
        # A 0-frame (empty) asset has no last frame: pin last_frame_len=0
        # rather than the nb-(n_frames-1)*FRAME_BYTES formula's +FRAME_BYTES
        # artifact, so the convention stays semantically consistent.
        last_len = np.where(nb == 0, 0, nb - (n_frames - 1) * FRAME_BYTES)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": nb,
                "first_byte": first.astype("int32"),
                "last_byte": last.astype("int32"),
                "checksum_prefix": checksum.astype("int64"),
                "n_frames": n_frames,
                "last_frame_len": last_len,
            }
        )


@register(
    "q95_multimodal_features",
    bench=True,
    oracle=f"""
    WITH a AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents)
    SELECT
      doc_id,
      CAST(length(t) AS BIGINT) AS n_bytes,
      CAST(CASE WHEN length(t) > 0 THEN ascii(substr(t, 1, 1)) ELSE -1 END AS INTEGER) AS first_byte,
      CAST(CASE WHEN length(t) > 0 THEN ascii(substr(t, length(t), 1)) ELSE -1 END AS INTEGER) AS last_byte,
      CAST(COALESCE(list_sum(list_transform(range(1, least(length(t), {CHECKSUM_PREFIX}) + 1),
                                            i -> ascii(substr(t, CAST(i AS INTEGER), 1)))), 0)
           AS BIGINT) AS checksum_prefix,
      CAST(ceil(length(t) * 1.0 / {FRAME_BYTES}) AS BIGINT) AS n_frames,
      CAST(CASE WHEN length(t) = 0 THEN 0
                ELSE length(t) - (ceil(length(t) * 1.0 / {FRAME_BYTES}) - 1) * {FRAME_BYTES}
           END AS BIGINT) AS last_frame_len
    FROM a
    """,
    doc="Multimodal feature extraction through the real Arrow/mapInPandas "
    "plumbing (binary payload + metadata struct -> per-batch vectorized "
    "features + frame segmentation); decoder stubbed, byte-level features "
    "oracle-checked because the corpus is ASCII.",
)
def q95_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assets(spark, sf_dir).select("doc_id", "blob").mapInPandas(
        fake_features, schema=FEATURE_SCHEMA
    )


@register(
    "q96_multimodal_meta_agg",
    oracle=f"""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_assets,
      CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_bytes,
      CAST(MAX(length(COALESCE(text, ''))) AS BIGINT) AS max_bytes,
      CAST(SUM(ceil(length(COALESCE(text, '')) * 1.0 / {FRAME_BYTES})) AS BIGINT) AS total_frames
    FROM documents
    """,
    doc="Metadata-only rollup over the asset table: storage/frame budgeting "
    "reads the struct column, never the payload (column pruning keeps blobs "
    "out of the scan — verified in tests).",
)
def q96_multimodal_meta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = assets(spark, sf_dir)
    n_frames = F.ceil(F.col("meta.n_bytes") / FRAME_BYTES)
    return a.agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
        F.sum(n_frames).cast("bigint").alias("total_frames"),
    )


# Every SAMPLE_EVERY-th frame is kept — the video-frame-sampling /
# audio-windowing access pattern (decode only a strided subset of a
# payload's frames, never the whole asset).
SAMPLE_EVERY = 3
FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_len int, frame_sum bigint"


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Strided frame extraction, fully vectorized per Arrow batch: the
    batch's payloads are packed into one uint8 buffer, every frame's
    (start, length) is derived with ``repeat``/``cumsum`` index algebra,
    and the per-frame byte sum is a prefix-sum gather. No per-row or
    per-frame Python — the loop is the Arrow batch iterator itself."""
    import numpy as np

    for pdf in batches:
        blobs = pdf["blob"].fillna(b"")  # zero-length-asset convention
        nb = blobs.str.len().to_numpy(dtype="int64")
        n_frames = -(-nb // FRAME_BYTES)
        doc_ids = np.repeat(pdf["doc_id"].to_numpy(dtype="int64"), n_frames)
        starts = np.repeat(nb.cumsum() - nb, n_frames)
        # frame index within each doc: global arange minus each doc's base
        base = np.repeat(n_frames.cumsum() - n_frames, n_frames)
        fidx = np.arange(int(n_frames.sum()), dtype="int64") - base
        flen = np.minimum(FRAME_BYTES, np.repeat(nb, n_frames) - fidx * FRAME_BYTES)
        fstart = starts + fidx * FRAME_BYTES
        buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        csum = np.concatenate(([0], buf.astype(np.int64).cumsum()))
        fsum = csum[fstart + flen] - csum[fstart]
        keep = fidx % SAMPLE_EVERY == 0
        yield pd.DataFrame(
            {
                "doc_id": doc_ids[keep],
                "frame_idx": fidx[keep],
                "frame_len": flen[keep].astype("int32"),
                "frame_sum": fsum[keep],
            }
        )


@register(
    "q107_frame_sample",
    oracle=f"""
    WITH a AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
    f AS (
      SELECT doc_id, text, length(text) AS nb,
             UNNEST(range(0, CAST(ceil(length(text) * 1.0 / {FRAME_BYTES}) AS BIGINT)))
               AS fi
      FROM a
    )
    SELECT doc_id,
           fi AS frame_idx,
           CAST(LEAST({FRAME_BYTES}, nb - fi * {FRAME_BYTES}) AS INT) AS frame_len,
           CAST(list_sum(list_transform(
                 range(1, CAST(LEAST({FRAME_BYTES}, nb - fi * {FRAME_BYTES}) AS BIGINT) + 1),
                 i -> ord(substr(text, CAST(fi * {FRAME_BYTES} + i AS BIGINT), 1))))
             AS BIGINT) AS frame_sum
    FROM f
    WHERE fi % {SAMPLE_EVERY} = 0
    """,
    doc=f"Strided frame sampling: explode each asset's payload into "
    f"{FRAME_BYTES}-byte frames and keep every {SAMPLE_EVERY}rd one, with a "
    "deterministic per-frame byte-sum standing in for the decode. One "
    "mapInPandas pass, no shuffle, output bounded to 1/3 of the frame count "
    "— the plumbing (binary column in, per-frame rows out) is exactly a "
    "video frame-sampler's; only the checksum swaps for a real codec.",
)
def q107_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = assets(spark, sf_dir).select("doc_id", "blob")
    return a.mapInPandas(sample_frames, schema=FRAME_SCHEMA)
