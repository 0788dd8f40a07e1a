"""Cross-engine adversarial gate: integer/math edge semantics.

Round-12 family (found while sweeping the remaining scalar surface after
decimal and indexing): bit shifts, math domain errors, and the zero-
divisor postures outside DECIMAL. Measured on Spark 4.1.2 (ANSI ON) vs
DuckDB, same discipline as the other gates — silent divergences pinned
with recipes, agreements pinned so upgrades fail loudly.

Measured divergence summary:
- Bit shifts: Spark shiftleft/shiftright use Java semantics — the shift
  amount silently wraps mod the operand width (shiftleft(1, 65) = 2,
  shiftleft(1, 40) on INT = 256) and VALUE overflow wraps two's-
  complement (shiftleft(1, 31) = INT_MIN). DuckDB raises on both a
  shift amount >= width AND value overflow (1 << 31 on INT32 errors).
  Recipe: cast to BIGINT and keep 0 <= shift < 64 AND the result in
  range — that subset agrees exactly.
- Math domain: ln(0)/ln(-1)/log10(0) are silently NULL in Spark and
  sqrt(-1) is silently NaN; DuckDB RAISES Out of Range for all four.
  Recipe: guard the domain (CASE WHEN x > 0 THEN ln(x) END) on both
  sides — DuckDB's guarded form returns NULL, matching Spark's silent
  posture.
- Zero divisors beyond DECIMAL: integer % 0 and double/0.0 RAISE under
  ANSI Spark but are silently NULL in DuckDB (including 1.0/0.0, which
  DuckDB NULLs rather than returning IEEE inf); Spark try_mod /
  try_divide return NULL and align exactly.
Agreements pinned: SQL `/` on integers is true division -> DOUBLE 0.5
in BOTH engines (no C-style integer division anywhere); % takes the
dividend's sign; greatest/least SKIP NULLs (both diverge from the
NULL-poisoning the SQL standard suggests, in the same direction);
listagg WITHIN GROUP == string_agg ORDER BY; power(0, -1) = +inf (not
an error) in both; mod on decimals agrees.
"""

from __future__ import annotations

import math

import duckdb
import pytest


def test_bit_shift_wrap_vs_raise(spark):
    """Spark wraps the shift amount mod the operand width and lets value
    overflow wrap two's-complement; DuckDB raises for both. The BIGINT
    in-range subset agrees exactly."""
    s = spark.sql(
        "SELECT shiftleft(1, 40) AS a, shiftleft(1, 65) AS b,"
        "       shiftleft(1, 31) AS c, shiftleft(1L, 40) AS d,"
        "       shiftright(-8L, 1) AS e"
    ).collect()[0]
    assert s.a == 256          # 40 mod 32 = 8 on INT — silent wrap
    assert s.b == 2            # 65 mod 32 = 1 on the INT operand
    assert s.c == -2147483648  # value overflow wraps to INT_MIN silently
    assert (s.d, s.e) == (1099511627776, -4)

    con = duckdb.connect()
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute("SELECT 1 << 40")      # shift amount >= width
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute("SELECT 1 << 31")      # value overflow on INT32
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute("SELECT 1::BIGINT << 65")
    # the recipe subset: BIGINT operand, 0 <= shift < 64, result in range
    d = con.execute("SELECT 1::BIGINT << 40, (-8)::BIGINT >> 1").fetchone()
    assert d == (1099511627776, -4)


def test_math_domain_silent_vs_raise(spark):
    """ln(0)/ln(-1)/log10(0) -> NULL and sqrt(-1) -> NaN, all SILENT in
    Spark; DuckDB raises Out of Range for every one. The guarded form
    (CASE WHEN in-domain) is NULL on both sides — the portable recipe."""
    s = spark.sql(
        "SELECT ln(0) AS a, ln(-1) AS b, log10(0) AS c, sqrt(-1) AS d"
    ).collect()[0]
    assert (s.a, s.b, s.c) == (None, None, None)
    assert math.isnan(s.d)
    con = duckdb.connect()
    for expr in ("ln(0.0)", "ln(-1.0)", "log10(0.0)", "sqrt(-1.0)"):
        with pytest.raises(duckdb.OutOfRangeException):
            con.execute(f"SELECT {expr}")
    s2 = spark.sql(
        "SELECT CASE WHEN 0.0 > 0 THEN ln(0.0) END AS g"
    ).collect()[0].g
    d2 = con.execute("SELECT CASE WHEN 0.0 > 0 THEN ln(0.0) END").fetchone()[0]
    assert s2 is None and d2 is None


def test_zero_divisor_postures_beyond_decimal(spark):
    """Integer %0 and double/0.0: ANSI Spark raises (REMAINDER_BY_ZERO /
    DIVIDE_BY_ZERO — note DuckDB does NOT return IEEE inf for 1.0/0.0,
    it NULLs); DuckDB is silently NULL. try_mod/try_divide align."""
    with pytest.raises(Exception, match="REMAINDER_BY_ZERO"):
        spark.sql("SELECT 7 % 0 AS v").collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql("SELECT CAST(1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE) AS v").collect()
    con = duckdb.connect()
    assert con.execute("SELECT 7 % 0").fetchone()[0] is None
    assert con.execute("SELECT 1.0::DOUBLE / 0.0::DOUBLE").fetchone()[0] is None
    assert con.execute("SELECT 0.0::DOUBLE / 0.0::DOUBLE").fetchone()[0] is None
    s = spark.sql(
        "SELECT try_mod(7, 0) AS a,"
        "       try_divide(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS b,"
        "       try_divide(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS c"
    ).collect()[0]
    assert (s.a, s.b, s.c) == (None, None, None)


def test_arithmetic_agreement_pins(spark):
    """The shared ground the registered oracles stand on: `/` on
    integers is true division (DOUBLE 0.5 — neither engine does C-style
    integer division); % takes the dividend's sign; greatest/least SKIP
    NULLs in both engines (same deviation from NULL-poisoning, same
    direction — all-NULL input is NULL); power(0, -1) is +inf in both
    (not a domain error); ordered string aggregation agrees
    (Spark listagg WITHIN GROUP == DuckDB string_agg ORDER BY)."""
    s = spark.sql(
        "SELECT 1/2 AS a, -7/2 AS b, 7%2 AS c, -7%2 AS d,"
        "       greatest(1, NULL, 3) AS e, least(CAST(NULL AS INT), NULL) AS f,"
        "       power(0, -1) AS g"
    ).collect()[0]
    assert (s.a, s.b, s.c, s.d, s.e, s.f) == (0.5, -3.5, 1, -1, 3, None)
    assert math.isinf(s.g) and s.g > 0
    con = duckdb.connect()
    d = con.execute(
        "SELECT 1/2, -7/2, 7%2, -7%2, greatest(1, NULL, 3),"
        "       least(NULL::INT, NULL::INT), power(0, -1)"
    ).fetchone()
    assert d[:6] == (0.5, -3.5, 1, -1, 3, None)
    assert math.isinf(d[6]) and d[6] > 0

    s_agg = spark.sql(
        "SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) AS v"
        " FROM VALUES ('b'), ('a'), ('c') t(x)"
    ).collect()[0].v
    d_agg = con.execute(
        "SELECT string_agg(x, ',' ORDER BY x)"
        " FROM (VALUES ('b'), ('a'), ('c')) t(x)"
    ).fetchone()[0]
    assert s_agg == d_agg == "a,b,c"


def test_bool_and_double_cast_accept_sets_diverge(spark):
    """String->BOOLEAN and string->DOUBLE accept sets, round-13 addition
    completing the accept-set series (string->BIGINT lives in the events
    gate, date strings in the temporal gate). Every cell measured with
    try_cast/TRY_CAST — all divergences are SILENT value-vs-NULL flips,
    the row-dropper class.

    BOOLEAN: Spark accepts the Postgres-ish extended set (y/n/yes/no)
    and TRIMS whitespace first; DuckDB accepts only t/f/true/false/1/0
    and does NOT trim — so ' true ' is TRUE in Spark, NULL in DuckDB.
    Agreement: t/f/true/false/1/0 case-insensitive, '2' and on/off
    are NULL in both. Portable recipe: a CASE over lower(trim(x)) IN
    ('true','t','1') / ('false','f','0') — explicit, engine-blind.

    DOUBLE: Spark inherits Java parsing — HEX FLOATS ('0x1p3' = 8.0)
    and type SUFFIXES ('1d' = 1.0, '1.5f' = 1.5) cast silently;
    DuckDB NULLs all three but accepts UNDERSCORE separators
    ('1_000' = 1000.0) that Spark NULLs. Both engines trim doubles
    (note the asymmetry: DuckDB trims doubles but not booleans) and
    agree on inf/infinity/+Inf/nan spellings, exponents, and bare
    leading/trailing dots. Portable recipe: gate behind the strict
    decimal regexp (same pattern bytes both engines) before casting —
    the q60 integral-regexp recipe generalized to doubles."""
    import duckdb as _duck

    con = _duck.connect()

    # BOOLEAN: the divergent cells (Spark value, DuckDB NULL)
    s = spark.sql(
        "SELECT try_cast('y' AS BOOLEAN) AS y, try_cast('no' AS BOOLEAN) AS no,"
        "       try_cast(' true ' AS BOOLEAN) AS pad"
    ).collect()[0]
    assert (s.y, s.no, s.pad) == (True, False, True)
    for v in ("y", "no", " true "):
        assert con.execute(f"SELECT TRY_CAST('{v}' AS BOOLEAN)").fetchone()[0] is None
    # the agreeing core set
    for v, want in [("t", True), ("F", False), ("TRUE", True), ("false", False),
                    ("1", True), ("0", False), ("2", None), ("on", None)]:
        got_s = spark.sql(f"SELECT try_cast('{v}' AS BOOLEAN) AS v").collect()[0].v
        got_d = con.execute(f"SELECT TRY_CAST('{v}' AS BOOLEAN)").fetchone()[0]
        assert got_s == got_d == want or (got_s is None and got_d is None and want is None), v
    # the portable CASE recipe agrees on every probed cell
    probe = ("y", "no", " true ", "t", "F", "TRUE", "false", "1", "0", "2", "on")
    case = ("CASE WHEN lower(trim({x})) IN ('true','t','1') THEN true "
            "WHEN lower(trim({x})) IN ('false','f','0') THEN false END")
    for v in probe:
        got_s = spark.sql(
            f"SELECT {case.format(x=repr(v))} AS v"
        ).collect()[0].v
        got_d = con.execute(f"SELECT {case.format(x=repr(v))}").fetchone()[0]
        assert got_s == got_d, v

    # DOUBLE: Spark's Java-isms are silent values, DuckDB NULLs them
    s = spark.sql(
        "SELECT try_cast('0x1p3' AS DOUBLE) AS hx, try_cast('1d' AS DOUBLE) AS sd,"
        "       try_cast('1.5f' AS DOUBLE) AS sf, try_cast('1_000' AS DOUBLE) AS us"
    ).collect()[0]
    assert (s.hx, s.sd, s.sf) == (8.0, 1.0, 1.5)  # ! Java hex float + suffixes
    assert s.us is None
    d = con.execute(
        "SELECT TRY_CAST('0x1p3' AS DOUBLE), TRY_CAST('1d' AS DOUBLE),"
        "       TRY_CAST('1.5f' AS DOUBLE), TRY_CAST('1_000' AS DOUBLE)"
    ).fetchone()
    assert d[:3] == (None, None, None)
    assert d[3] == 1000.0  # ! underscore separators, DuckDB-only
    # agreeing cells: inf/nan spellings, exponent, bare dots, trimmed pad
    agree = [("inf", math.inf), ("infinity", math.inf), ("+Inf", math.inf),
             ("1e3", 1000.0), (".5", 0.5), ("5.", 5.0), (" 2.5 ", 2.5)]
    for v, want in agree:
        got_s = spark.sql(f"SELECT try_cast('{v}' AS DOUBLE) AS v").collect()[0].v
        got_d = con.execute(f"SELECT TRY_CAST('{v}' AS DOUBLE)").fetchone()[0]
        assert got_s == got_d == want, v
    assert math.isnan(
        spark.sql("SELECT try_cast('NaN' AS DOUBLE) AS v").collect()[0].v
    ) and math.isnan(con.execute("SELECT TRY_CAST('NaN' AS DOUBLE)").fetchone()[0])
    # the strict-regexp guard (same pattern bytes both engines) keeps
    # every Java-ism and separator out; inf/nan handled explicitly
    pat = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"
    for v in ("0x1p3", "1d", "1.5f", "1_000", "1.5", "1e3", ".5", "5."):
        s_ok = spark.sql(
            f"SELECT '{v}' rlike '{pat.replace(chr(92), chr(92)*2)}' AS v"
        ).collect()[0].v
        d_ok = con.execute(
            "SELECT regexp_matches(?, ?)", [v, pat]
        ).fetchone()[0]
        assert s_ok == d_ok == (v in ("1.5", "1e3", ".5", "5.")), v
