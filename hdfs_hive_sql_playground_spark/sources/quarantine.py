"""Quarantine-split readers: malformed-tolerant schema-on-read that
routes clean rows forward and corrupt RAW records to a replayable side
channel — the standard 100 TB ingest pattern whose parser contracts the
adversarial formats gate (tests/test_adversarial_formats.py) pins.

Reference basis: the reference's text-table ingest surface (SURVEY §2
A2/A21 — LazySimpleSerDe text tables and the Sqoop record parser) has no
recovery story beyond Hive's null-fill; at 100 TB a malformed-row RATE is
normal (interrupted writers, encoding drift, upstream schema skew), so
the engine must (a) never lose a byte silently and (b) never fail a whole
ingest for one bad record.

Design — TWO pruned scans, not one:

- The CLEAN side is a DROPMALFORMED read behind a parse-forcing filter
  (below): an ordinary DataFrame — count/agg/cache all work and are
  CORRECT.
- The QUARANTINE side is a PERMISSIVE read filtered to
  ``_corrupt_record IS NOT NULL``: the raw record for replay plus the
  parseable prefix.

Two Spark traps shape this design, both pinned in the gate:

- A one-pass split cannot work: Spark refuses any query whose scan would
  reference ONLY the internal corrupt column
  ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN] — PERMISSIVE
  cannot populate it without also parsing data columns, so it raises
  instead of answering wrong), and a one-pass clean side
  (filter corrupt IS NULL → count) hits exactly that shape. So would a
  bare ``quarantine.count()`` — column pruning strips even an explicit
  data-column select down to the corrupt column — which is why the
  quarantine side ALSO carries the parse-forcing filter: both sides of
  the split answer every query shape correctly.
- A bare DROPMALFORMED count() is SILENTLY WRONG: a zero-column
  aggregation skips row conversion entirely, so malformed rows are never
  detected and count() returns the raw record count (measured: 9 vs the
  true 4 on the gate's CSV fixture). The clean side therefore carries an
  always-true filter referencing every data column
  (``hash(cols) % 1 == 0`` — non-foldable, one hash per row) so EVERY
  query against it forces the parse and gets DROPMALFORMED semantics.

The gate pins that the two parsers' survivor sets are identical, so the
split is exact: every physical record lands on exactly one side.

CSV multiLine stays False unless a column genuinely contains newlines:
the gate pins that ONE unterminated quote under multiLine=true swallows
the whole file tail into a single corrupt record.

The STREAMING dual (``stream_csv_quarantined``) applies the identical
two-parser design over ``readStream``: at scale the pair runs as two
independent queries with separate checkpoints (clean → warehouse table,
quarantine → replay sink), each with the file source's own exactly-once
file tracking; an availableNow drain of both covers every record of
every file exactly once, pinned against the batch split in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"

# Reader/parse options the split manages itself. A caller-supplied
# 'mode' would silently override the DROPMALFORMED/PERMISSIVE pair
# (applied after it in option order) and break the exact-partition
# invariant — corrupt rows would null-fill into the clean side — so the
# entry points refuse them loudly, matching the _corrupt_record schema
# guard. Spark option keys resolve case-insensitively; so does this.
_MANAGED_OPTS = ("mode", "columnnameofcorruptrecord")


def _check_caller_options(options: dict) -> None:
    clash = [k for k in options if k.lower() in _MANAGED_OPTS]
    if clash:
        raise ValueError(
            f"option(s) {clash!r} are managed by the quarantine split and "
            "cannot be overridden — the DROPMALFORMED/PERMISSIVE parser "
            "pair IS the contract (a caller 'mode' would null-fill corrupt "
            "rows into the clean side)"
        )


def _check_schema(schema: str) -> None:
    """Refuse a data schema that declares the managed corrupt column.

    Parses the DDL (not a substring test): a legitimate column like
    ``pre_corrupt_record`` must pass, while a case-variant
    ``_CORRUPT_RECORD`` must be refused because Spark's default
    case-insensitive resolution would still collide with the managed
    column."""
    from pyspark.sql.types import StructType

    try:
        fields = [f.name for f in StructType.fromDDL(schema).fields]
    except Exception:
        # Not parseable by fromDDL. The reader will usually raise its own
        # error, but if it accepts a dialect fromDDL doesn't, the guard
        # must not silently vanish — fall back to a whole-identifier scan
        # of the schema text (round-12 ADVICE: the earlier raw substring
        # test refused legitimate identifiers like 'pre_corrupt_record',
        # contradicting this docstring's own contract). Tokenizing on
        # identifier characters keeps the check conservative for case
        # variants and for the column appearing anywhere in the DDL,
        # without false-positives on longer identifiers.
        import re

        idents = re.findall(r"[A-Za-z_][A-Za-z0-9_]*", schema.lower())
        if any(tok == CORRUPT_COL for tok in idents):
            raise ValueError(
                f"the data schema must not mention {CORRUPT_COL!r} (any "
                "case) — the quarantine readers manage that column "
                "themselves (schema was not fromDDL-parseable, so this is "
                "the conservative whole-identifier check)"
            )
        return
    if any(name.lower() == CORRUPT_COL for name in fields):
        raise ValueError(
            f"the data schema must not declare {CORRUPT_COL!r} (any case) — "
            "the quarantine readers manage that column themselves (pass only "
            "the data columns; the raw record arrives on the quarantine "
            f"side as {CORRUPT_COL!r})"
        )


def _force_parse(df: DataFrame) -> DataFrame:
    """Always-true filter referencing every data column, so zero-column
    aggregations (count()) cannot skip row conversion — without this a
    DROPMALFORMED count() silently includes malformed rows (module
    docstring). hash()%1==0 is true for every row and Catalyst does not
    constant-fold it, so the parse is forced at ~one hash per row."""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in df.columns if c != CORRUPT_COL]
    return df.filter((F.hash(*cols) % 1) == 0)


def _split(make_reader, fmt: str, path: str, schema: str, opts: dict):
    """Build the (clean, quarantine) pair from one reader factory — shared
    by the batch and streaming entry points so the two duals cannot
    drift. ``make_reader()`` returns a fresh ``spark.read`` /
    ``spark.readStream``; ``fmt`` is the source method name."""

    _check_schema(schema)
    _check_caller_options(opts)

    def one(mode: str, with_corrupt: bool):
        full = f"{schema}, {CORRUPT_COL} string" if with_corrupt else schema
        r = make_reader().schema(full).option("mode", mode)
        if with_corrupt:
            r = r.option("columnNameOfCorruptRecord", CORRUPT_COL)
        for k, v in opts.items():
            r = r.option(k, v)
        return getattr(r, fmt)(path)

    clean = _force_parse(one("DROPMALFORMED", with_corrupt=False))
    quarantine = _force_parse(
        one("PERMISSIVE", with_corrupt=True).filter(f"{CORRUPT_COL} IS NOT NULL")
    )
    return clean, quarantine


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    header: bool = False,
    multiline: bool = False,
    options: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Malformed-tolerant CSV read split into (clean, quarantine).

    ``schema`` is the DATA schema (DDL string) — the corrupt-record
    column is managed here, never the caller's concern. Clean rows have
    exactly the declared columns; quarantine rows carry the parseable
    prefix plus the raw line in ``_corrupt_record`` for replay after an
    upstream fix."""
    opts = {"sep": sep, "header": header, "multiLine": multiline, **(options or {})}
    return _split(lambda: spark.read, "csv", path, schema, opts)


def read_json_quarantined(
    spark: SparkSession,
    path: str,
    schema: str,
    options: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Malformed-tolerant JSON-lines read split into (clean, quarantine).

    Quarantine rows are records that failed to parse (syntax) or carried
    a type-mismatched field (partial parse: the fields that DID convert
    are kept alongside the raw record). A MISSING field is clean-side
    null, per the gate's pinned contract."""
    return _split(lambda: spark.read, "json", path, schema, dict(options or {}))


def stream_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    header: bool = False,
    options: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming dual of ``read_csv_quarantined``: the same two-parser
    split over the file-source stream, so a continuously-ingesting
    directory gets per-micro-batch clean/quarantine routing with no
    record lost or double-counted across the pair.

    No ``multiline`` parameter: the streaming source reads line-split,
    which is the only recovery-safe mode (module docstring) — a column
    that genuinely contains newlines belongs in a batch backfill, not a
    tailing ingest."""
    opts = {"sep": sep, "header": header, **(options or {})}
    return _split(lambda: spark.readStream, "csv", path, schema, opts)


def stream_json_quarantined(
    spark: SparkSession,
    path: str,
    schema: str,
    options: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming dual of ``read_json_quarantined`` — same contract as
    ``stream_csv_quarantined``, for a JSON-lines landing directory."""
    return _split(lambda: spark.readStream, "json", path, schema, dict(options or {}))


def _replay(quarantine: DataFrame, parse_fn, schema: str, opts: dict):
    from pyspark.sql import functions as F

    _check_schema(schema)
    full = f"{schema}, {CORRUPT_COL} string"
    parsed = quarantine.select(F.col(CORRUPT_COL).alias("_raw")).withColumn(
        "_p", parse_fn(F.col("_raw"), full, opts)
    )
    # A NULL raw record (possible when the input is a persisted sink, not
    # the quarantine side itself) must NOT be classified clean:
    # from_csv/from_json of NULL yields a NULL struct, so its corrupt
    # field is NULL too and it would otherwise rejoin the table as an
    # all-NULL row. Route it to still_bad so clean + still_bad keeps the
    # input record count and replay still composes with itself.
    is_clean = F.col(f"_p.{CORRUPT_COL}").isNull() & F.col("_raw").isNotNull()
    clean = parsed.filter(is_clean).select("_p.*").drop(CORRUPT_COL)
    still_bad = parsed.filter(~is_clean).select(F.col("_raw").alias(CORRUPT_COL))
    return clean, still_bad


def replay_csv_quarantine(
    quarantine: DataFrame,
    schema: str,
    sep: str = ",",
    options: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Re-parse a quarantine side's raw records under a CORRECTED schema —
    the second half of the quarantine contract: the raw line was kept so
    that, once the schema skew is fixed (a column was really wider /
    optional / a string), the stranded records can rejoin the table
    without re-reading the source.

    Takes any DataFrame carrying raw lines in ``_corrupt_record`` (the
    quarantine side itself, or its persisted sink) and returns
    ``(clean, still_bad)``: rows that parse under the new schema, with
    exactly its columns, and the rest — raw again, so replay composes
    with itself across successive fixes. Uses ``from_csv`` with the same
    Univocity grammar as the source reader, so a record is clean here
    iff the fixed reader would have accepted it."""
    from pyspark.sql import functions as F

    _check_caller_options(options or {})
    opts = {
        "sep": sep,
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **(options or {}),
    }
    return _replay(quarantine, F.from_csv, schema, opts)


def replay_json_quarantine(
    quarantine: DataFrame,
    schema: str,
    options: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """JSON dual of ``replay_csv_quarantine`` (``from_json`` grammar)."""
    from pyspark.sql import functions as F

    _check_caller_options(options or {})
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **(options or {}),
    }
    return _replay(quarantine, F.from_json, schema, opts)
