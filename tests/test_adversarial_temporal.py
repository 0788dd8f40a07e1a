"""Adversarial temporal gate (round 11, companion to
test_adversarial_relational.py): calendar/timestamp edge semantics —
the second untested cross-engine divergence class after float keys.

Every assertion below is a MEASURED contract (Spark 4.1.2, session tz
Etc/UTC / DuckDB), either an agreement pin (an upgrade that breaks it
fails here first) or a divergence pin with the oracle-alignment recipe
an oracle author must use:

- Day-of-week NUMBERING diverges: Spark ``dayofweek`` is Sunday=1..7 and
  ``weekday`` Monday=0..6; DuckDB ``dayofweek`` is Sunday=0..6 and
  ``isodow`` Monday=1..7. Recipes: spark.dayofweek = duck.dayofweek + 1;
  spark.weekday + 1 = duck.isodow.
- ``date_trunc('week', ...)`` AGREES on the Monday week start but the
  result TYPE diverges (Spark TIMESTAMP vs DuckDB DATE) — and the oracle
  harness renders dates as '2024-01-01' but timestamps as ISO with a
  time part, so an un-cast oracle hash-mismatches on equal instants.
  Recipe: cast to DATE on BOTH sides.
- Month arithmetic saturates identically (Jan 31 + 1 month = Feb 29,
  Feb 29 + 1 year = Feb 28); weekofyear is ISO in both (2021-01-01 is
  week 53).
- Invalid calendar dates: Spark under ANSI refuses CAST ('2023-02-30' →
  CAST_INVALID_INPUT), DuckDB refuses too (Conversion Error), and
  try_cast null-fills in BOTH — same loud-by-default / try_* escape
  pattern the relational gate pinned for overflow.
- Ancient dates are PROLEPTIC GREGORIAN end-to-end: Spark 4 writes
  1500-01-01 and even in-gap 1582-10-05 to parquet without rebase
  complaint and DuckDB reads the identical day — no silent ±10-day
  Julian shift (the Spark 2.x legacy trap the rebase machinery exists
  for).
- Microsecond precision survives a parquet round-trip bit-exactly in
  both engines; the max timestamp (9999-12-31 23:59:59.999999) collects
  intact.
- THE PYTHON-BOUNDARY TRAP: a session-tz TIMESTAMP at year 1 computes
  fine JVM-side (cast to string works) but ``collect()``/``toPandas()``
  raise ValueError('year 0 is out of range') converting UTC→driver
  datetime. TIMESTAMP_NTZ collects fine. Recipe: extreme historical
  instants cross the driver boundary as TIMESTAMP_NTZ or strings.

Reference surface: SURVEY §2 Tier B scalar date functions and the
events/time-series family (`queries/events.py` tumbling/sessionize
windows all do timestamp arithmetic).
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

WEEK = [datetime.date(2024, 1, 7 + i) for i in range(7)]  # Sun..Sat


def test_dayofweek_numbering_diverges_with_alignment_recipe(spark):
    sdf = spark.createDataFrame([(d,) for d in WEEK], "d date").select(
        "d",
        F.dayofweek("d").alias("dow"),
        F.weekday("d").alias("wd"),
    )
    got = {r.d.isoformat(): (r.dow, r.wd) for r in sdf.collect()}

    con = duckdb.connect()
    days = ", ".join(f"(date '{d}')" for d in WEEK)
    duck = {
        d.isoformat(): (dow, iso)
        for d, dow, iso in con.execute(
            f"SELECT d, dayofweek(d), isodow(d) FROM (VALUES {days}) t(d)"
        ).fetchall()
    }
    for k in got:
        s_dow, s_wd = got[k]
        d_dow, d_iso = duck[k]
        assert s_dow == d_dow + 1, k  # Spark Sun=1 vs DuckDB Sun=0
        assert s_wd + 1 == d_iso, k  # Spark Mon=0 vs DuckDB Mon=1
    # absolute anchors so BOTH conventions are pinned, not just the delta
    assert got["2024-01-07"] == (1, 6)  # Sunday
    assert duck["2024-01-07"] == (0, 7)
    assert got["2024-01-08"] == (2, 0)  # Monday
    assert duck["2024-01-08"] == (1, 1)


def test_date_trunc_week_value_agrees_type_diverges(spark):
    """Both engines start weeks on MONDAY; Spark returns TIMESTAMP where
    DuckDB returns DATE for a date input — equal instants that the oracle
    harness would render differently ('2024-01-01' vs
    '2024-01-01T00:00:00'). The recipe (cast to DATE on both sides) is
    what every registered events-family oracle already does."""
    rows = spark.createDataFrame([(d,) for d in WEEK], "d date").select(
        F.date_trunc("week", "d").alias("w")
    )
    assert dict(rows.dtypes)["w"] == "timestamp"
    got = sorted({r.w.date() for r in rows.collect()})

    con = duckdb.connect()
    days = ", ".join(f"(date '{d}')" for d in WEEK)
    duck_rows = con.execute(
        f"SELECT DISTINCT date_trunc('week', d) FROM (VALUES {days}) t(d)"
    ).fetchall()
    assert all(isinstance(v, datetime.date) for (v,) in duck_rows)
    assert sorted(v for (v,) in duck_rows) == got
    # Monday start: the Sunday fixture day truncates BACKWARD to Jan 1
    assert got == [datetime.date(2024, 1, 1), datetime.date(2024, 1, 8)]


def test_calendar_month_arithmetic_agrees(spark):
    cases = [
        ("add_months(date'2024-01-31', 1)", "date '2024-01-31' + interval 1 month",
         datetime.date(2024, 2, 29)),  # end-of-month saturation
        ("date'2024-02-29' + interval 1 year", "date '2024-02-29' + interval 1 year",
         datetime.date(2025, 2, 28)),  # leap day + 1y saturates
        ("date_add(date'2024-01-31', 30)", "date '2024-01-31' + 30",
         datetime.date(2024, 3, 1)),  # day arithmetic never saturates
    ]
    con = duckdb.connect()
    for ssql, dsql, want in cases:
        sv = spark.sql(f"SELECT {ssql} AS v").collect()[0].v
        sv = sv.date() if isinstance(sv, datetime.datetime) else sv
        dv = con.execute(f"SELECT ({dsql})::date").fetchone()[0]
        assert sv == dv == want, ssql
    # ISO week numbering in both: Jan 1 2021 (a Friday) is week 53 of 2020
    assert spark.sql("SELECT weekofyear(date'2021-01-01') AS w").collect()[0].w == 53
    assert con.execute("SELECT weekofyear(date '2021-01-01')").fetchone()[0] == 53


def test_invalid_date_refused_try_cast_nullfills_both(spark):
    """'2023-02-30' is not a day that exists: both engines REFUSE the
    plain cast (Spark ANSI: CAST_INVALID_INPUT; DuckDB: Conversion
    Error) and both null-fill under try_cast — the same loud-by-default
    pattern the relational gate pinned for numeric overflow. A pipeline
    that wants Hive's silent-NULL legacy must opt in via try_cast, on
    both sides, identically."""
    with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        spark.sql("SELECT cast('2023-02-30' AS date) AS v").collect()
    assert (
        spark.sql("SELECT try_cast('2023-02-30' AS date) AS v").collect()[0].v is None
    )

    con = duckdb.connect()
    with pytest.raises(duckdb.ConversionException):
        con.execute("SELECT '2023-02-30'::date").fetchone()
    assert con.execute("SELECT try_cast('2023-02-30' AS date)").fetchone()[0] is None


def test_ancient_dates_proleptic_parquet_round_trip(spark, tmp_path):
    """Pre-Gregorian dates — including 1582-10-05, a day that never
    existed in the hybrid Julian/Gregorian calendar — round-trip through
    Spark-written parquet as PROLEPTIC GREGORIAN and DuckDB reads the
    identical days: no rebase exception on write (Spark 4 default) and
    no silent ±10-day Julian shift on either side."""
    days = [datetime.date(1500, 1, 1), datetime.date(1582, 10, 5)]
    p = str(tmp_path / "ancient.parquet")
    spark.createDataFrame([(d,) for d in days], "d date").coalesce(1).write.parquet(p)

    got = sorted(r.d for r in spark.read.parquet(p).collect())
    assert got == days

    con = duckdb.connect()
    duck = sorted(
        v for (v,) in con.execute(
            f"SELECT d FROM read_parquet('{p}/*.parquet')"
        ).fetchall()
    )
    assert duck == days
    assert con.execute(
        f"SELECT min(d)::varchar FROM read_parquet('{p}/*.parquet')"
    ).fetchone()[0] == "1500-01-01"


def test_timestamp_microsecond_precision_cross_engine(spark, tmp_path):
    """Full 6-digit microsecond precision survives a parquet round-trip
    bit-exactly in both engines, and the maximum representable instant
    collects intact — the precision floor every as-of/range-join oracle
    depends on."""
    ts = datetime.datetime(2024, 5, 5, 1, 2, 3, 123456)
    p = str(tmp_path / "micro.parquet")
    spark.createDataFrame([(ts,)], "t timestamp_ntz").coalesce(1).write.parquet(p)
    assert spark.read.parquet(p).collect()[0].t == ts
    con = duckdb.connect()
    assert con.execute(
        f"SELECT t FROM read_parquet('{p}/*.parquet')"
    ).fetchone()[0] == ts

    mx = spark.sql(
        "SELECT timestamp_ntz'9999-12-31 23:59:59.999999' AS t"
    ).collect()[0].t
    assert mx == datetime.datetime(9999, 12, 31, 23, 59, 59, 999999)
    assert con.execute(
        "SELECT timestamp '9999-12-31 23:59:59.999999'"
    ).fetchone()[0] == mx


def test_year1_timestamp_python_boundary_trap(spark):
    """The measured pyspark driver-boundary trap: a session-tz TIMESTAMP
    at year 1 is fine JVM-side (casting to string works) but collect()
    raises ValueError('year 0 is out of range') converting the UTC
    instant to a driver datetime. TIMESTAMP_NTZ collects cleanly, and
    DuckDB handles the same instant natively — so extreme historical
    instants must cross the Python boundary as NTZ or strings. Pinned so
    a pyspark fix (or a worsening) is noticed."""
    assert spark.sql(
        "SELECT cast(timestamp'0001-01-01 00:00:00' AS string) AS s"
    ).collect()[0].s == "0001-01-01 00:00:00"

    with pytest.raises(Exception, match="year 0 is out of range"):
        spark.sql("SELECT timestamp'0001-01-01 00:00:00' AS t").collect()

    ntz = spark.sql("SELECT timestamp_ntz'0001-01-01 00:00:00' AS t").collect()[0].t
    assert ntz == datetime.datetime(1, 1, 1, 0, 0)

    assert duckdb.connect().execute(
        "SELECT timestamp '0001-01-01 00:00:00'"
    ).fetchone()[0] == datetime.datetime(1, 1, 1, 0, 0)


def test_date_string_accept_set_diverges(spark):
    """CAST(varchar AS DATE) accept-sets, round-12 addition (the date
    twin of the q60 string->BIGINT pin): DuckDB accepts the
    slash-separated '2024/01/05' where Spark's cast yields NULL (via
    try_cast; plain CAST raises under ANSI) — a silent row-dropper in
    any ingest that parses dates. The shared subset is pinned: ISO
    dashes with or without zero-padding and with surrounding spaces
    parse in BOTH engines, and the out-of-calendar '2024-02-30' is NULL
    (try_) in both — neither engine rolls it over to March 1."""
    import datetime

    d5 = datetime.date(2024, 1, 5)
    s = spark.sql(
        "SELECT try_cast('2024-1-5' AS DATE) AS a,"
        "       try_cast(' 2024-01-05 ' AS DATE) AS b,"
        "       try_cast('2024/01/05' AS DATE) AS c,"
        "       try_cast('2024-02-30' AS DATE) AS d"
    ).collect()[0]
    assert (s.a, s.b, s.c, s.d) == (d5, d5, None, None)
    con = duckdb.connect()
    d = con.execute(
        "SELECT TRY_CAST('2024-1-5' AS DATE), TRY_CAST(' 2024-01-05 ' AS DATE),"
        "       TRY_CAST('2024/01/05' AS DATE), TRY_CAST('2024-02-30' AS DATE)"
    ).fetchone()
    assert d == (d5, d5, d5, None)  # the slash format is the divergence


def test_named_zone_conversion_forward_agrees_reverse_ambiguity_diverges(spark):
    """Named-timezone conversion (round 13 — the one temporal surface no
    gate had touched). MEASURED:

    - FORWARD (utc-instant -> zone wall time): Spark's
      ``from_utc_timestamp(ts, zone)`` equals DuckDB's
      ``timezone(zone, TIMESTAMPTZ)`` on every edge — both sides of the
      US spring-forward gap, both halves of the fall-back double hour,
      plain EST/EDT, and a 45-minute-offset zone. This direction is
      oracle-safe.
    - REVERSE (zone wall time -> utc) on an AMBIGUOUS fall-back wall
      time diverges by one hour SILENTLY: Spark's ``to_utc_timestamp``
      resolves '2026-11-01 01:30' America/New_York to the EARLIER
      offset (EDT, 05:30Z) while DuckDB's ``AT TIME ZONE`` picks the
      LATER (EST, 06:30Z). The NONEXISTENT spring-forward wall time
      agrees (both shift via the pre-transition offset). Recipe: shared
      oracles must never reverse-convert wall-clock strings that can be
      ambiguous — store instants (epoch/UTC) and convert FORWARD only;
      if a reverse conversion is unavoidable, gate out the two
      ambiguous hours per zone-year explicitly."""
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")

    forward = [
        ("2026-03-08 06:59:59", "America/New_York"),  # pre-gap edge
        ("2026-03-08 07:00:00", "America/New_York"),  # gap edge
        ("2026-11-01 05:30:00", "America/New_York"),  # fall-back 1st pass
        ("2026-11-01 06:30:00", "America/New_York"),  # fall-back 2nd pass
        ("2026-06-15 12:00:00", "America/New_York"),  # plain EDT
        ("2026-01-15 12:00:00", "America/New_York"),  # plain EST
        ("2026-06-15 12:00:00", "Asia/Kathmandu"),    # +05:45 offset
        ("2026-06-15 12:00:00", "Asia/Tokyo"),        # DST-less zone
    ]
    for ts, zone in forward:
        s = spark.sql(
            f"SELECT CAST(from_utc_timestamp(timestamp'{ts}', '{zone}') "
            "AS STRING) AS v"
        ).collect()[0].v
        d = con.execute(
            f"SELECT CAST(timezone('{zone}', TIMESTAMPTZ '{ts}+00') AS VARCHAR)"
        ).fetchone()[0]
        assert str(s) == str(d), (ts, zone, s, d)

    # reverse, NONEXISTENT wall time (spring-forward gap): agrees
    s = spark.sql(
        "SELECT CAST(to_utc_timestamp(timestamp'2026-03-08 02:30:00', "
        "'America/New_York') AS STRING) AS v"
    ).collect()[0].v
    d = con.execute(
        "SELECT CAST((TIMESTAMP '2026-03-08 02:30:00' "
        "AT TIME ZONE 'America/New_York') AT TIME ZONE 'UTC' AS VARCHAR)"
    ).fetchone()[0]
    assert str(s) == str(d) == "2026-03-08 07:30:00", (s, d)

    # reverse, AMBIGUOUS wall time: the pinned one-hour divergence
    s = spark.sql(
        "SELECT CAST(to_utc_timestamp(timestamp'2026-11-01 01:30:00', "
        "'America/New_York') AS STRING) AS v"
    ).collect()[0].v
    d = con.execute(
        "SELECT CAST((TIMESTAMP '2026-11-01 01:30:00' "
        "AT TIME ZONE 'America/New_York') AT TIME ZONE 'UTC' AS VARCHAR)"
    ).fetchone()[0]
    assert str(s) == "2026-11-01 05:30:00", s  # Spark: earlier offset (EDT)
    assert str(d) == "2026-11-01 06:30:00", d  # DuckDB: later offset (EST)
