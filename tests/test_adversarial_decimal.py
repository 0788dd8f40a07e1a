"""Cross-engine adversarial gate: DECIMAL arithmetic scale and rounding.

Round-12 family (the last untouched divergence class named by the r11
verdict): the float-edge relational gate covers integer/decimal OVERFLOW
only; this gate pins how the two engines derive division result types,
round at scale boundaries, and cast doubles into decimals — the places a
money/metrics pipeline silently drifts. Everything here is MEASURED on
Spark 4.1.2 (ANSI mode ON — the engine's deliberate posture, see
session.py) vs DuckDB, same discipline as the float/temporal/string/
complex/regex gates: divergences are pinned with an alignment recipe the
registered oracles (integer-cents columns, README 'Aggregate outputs')
already follow; agreements are pinned so an engine upgrade that moves
either side fails loudly.

Measured divergence summary:
- DECIMAL / DECIMAL: Spark derives a DECIMAL result type
  ((10,2)/(10,2) -> (23,13); precision-loss path caps scale at 6),
  DuckDB silently promotes to DOUBLE — different VALUES (0.3333333333333
  vs 0.3333333333333333) and types from identical SQL.
- DECIMAL downscale CAST: Spark rounds HALF_UP ((10,3) 2.675 -> 2.68),
  DuckDB TRUNCATES toward zero (-> 2.67). Silent value drift.
- DECIMAL / 0: ANSI Spark raises DIVIDE_BY_ZERO; DuckDB returns NULL
  silently (its posture is Spark's NON-ANSI one).
- NaN -> DECIMAL: ANSI Spark silently yields NULL (while overflow
  RAISES — an internal asymmetry worth knowing); DuckDB raises even
  under TRY_CAST (while TRY_CAST of Infinity -> NULL works — ITS own
  asymmetry).
Agreements pinned: CAST(double AS DECIMAL) rounds the SHORTEST-STRING
repr in both engines (2.675d -> 2.68 despite the binary value being
2.67499999...); round() is half-away-from-zero on both; Spark bround ==
DuckDB round_even; multiplication scale s1+s2; SUM value at input scale.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest


def test_decimal_division_result_type_diverges(spark):
    """Spark decimal/decimal stays DECIMAL with a derived scale; DuckDB
    silently promotes to DOUBLE. Same SQL, different type AND value.
    Recipe (used by every registered ratio oracle): divide in DOUBLE on
    both sides — CAST(a AS DOUBLE) / CAST(b AS DOUBLE) — or keep ratios
    in integer cents/e4 fixed-point as the registry does."""
    df = spark.sql("SELECT CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2)) AS v")
    assert df.schema["v"].dataType.simpleString() == "decimal(23,13)"
    assert df.collect()[0].v == Decimal("0.3333333333333")
    # precision-loss path: scale collapses to 6 when the derived type
    # would exceed DECIMAL(38,_)
    df2 = spark.sql(
        "SELECT CAST(7 AS DECIMAL(38,10)) / CAST(3 AS DECIMAL(38,10)) AS v"
    )
    assert df2.schema["v"].dataType.simpleString() == "decimal(38,6)"
    assert df2.collect()[0].v == Decimal("2.333333")

    con = duckdb.connect()
    r = con.execute("SELECT CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2))")
    v = r.fetchone()[0]
    assert isinstance(v, float) and v == 0.3333333333333333  # DOUBLE, not DECIMAL

    # the alignment recipe agrees bit-for-bit
    s = spark.sql(
        "SELECT CAST(CAST(1 AS DECIMAL(10,2)) AS DOUBLE)"
        " / CAST(CAST(3 AS DECIMAL(10,2)) AS DOUBLE) AS v"
    ).collect()[0].v
    d = con.execute(
        "SELECT CAST(CAST(1 AS DECIMAL(10,2)) AS DOUBLE)"
        " / CAST(CAST(3 AS DECIMAL(10,2)) AS DOUBLE)"
    ).fetchone()[0]
    assert s == d == 0.3333333333333333


def test_decimal_downscale_cast_round_vs_truncate(spark):
    """CAST(DECIMAL(10,3) AS DECIMAL(10,2)): Spark rounds HALF_UP
    (2.675 -> 2.68, -2.675 -> -2.68), DuckDB truncates toward zero
    (-> 2.67 / -2.67). A silent one-cent drift on exactly-half values.
    Recipe: make the rounding explicit in the oracle —
    CAST(round(x, 2) AS DECIMAL(10,2)) matches Spark's HALF_UP, because
    DuckDB round() is half-away-from-zero (asserted below)."""
    rows = spark.sql(
        "SELECT CAST(CAST(2.675 AS DECIMAL(10,3)) AS DECIMAL(10,2)) AS a,"
        "       CAST(CAST(2.665 AS DECIMAL(10,3)) AS DECIMAL(10,2)) AS b,"
        "       CAST(CAST(-2.675 AS DECIMAL(10,3)) AS DECIMAL(10,2)) AS c"
    ).collect()[0]
    assert (rows.a, rows.b, rows.c) == (
        Decimal("2.68"), Decimal("2.67"), Decimal("-2.68"),
    )
    con = duckdb.connect()
    d = con.execute(
        "SELECT CAST(CAST(2.675 AS DECIMAL(10,3)) AS DECIMAL(10,2)),"
        "       CAST(CAST(2.665 AS DECIMAL(10,3)) AS DECIMAL(10,2)),"
        "       CAST(CAST(-2.675 AS DECIMAL(10,3)) AS DECIMAL(10,2))"
    ).fetchone()
    assert d == (Decimal("2.67"), Decimal("2.66"), Decimal("-2.67"))  # truncation
    # recipe: explicit round() before the downscale cast aligns to Spark
    d2 = con.execute(
        "SELECT CAST(round(CAST(2.675 AS DECIMAL(10,3)), 2) AS DECIMAL(10,2)),"
        "       CAST(round(CAST(-2.675 AS DECIMAL(10,3)), 2) AS DECIMAL(10,2))"
    ).fetchone()
    assert d2 == (Decimal("2.68"), Decimal("-2.68"))


def test_decimal_divide_by_zero_posture(spark):
    """ANSI Spark raises DIVIDE_BY_ZERO on decimal/0; DuckDB silently
    returns NULL (the posture of NON-ANSI Spark). An oracle that divides
    must either guard the denominator or use Spark try_divide — whose
    NULL matches DuckDB exactly (asserted)."""
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql(
            "SELECT CAST(1 AS DECIMAL(10,2)) / CAST(0 AS DECIMAL(10,2)) AS v"
        ).collect()
    con = duckdb.connect()
    assert con.execute(
        "SELECT CAST(1 AS DECIMAL(10,2)) / CAST(0 AS DECIMAL(10,2))"
    ).fetchone()[0] is None
    assert spark.sql(
        "SELECT try_divide(CAST(1 AS DECIMAL(10,2)), CAST(0 AS DECIMAL(10,2))) AS v"
    ).collect()[0].v is None


def test_double_to_decimal_cast_rounds_shortest_repr(spark):
    """AGREEMENT pin, and a surprising one: CAST(2.675d AS DECIMAL(10,2))
    -> 2.68 in BOTH engines, even though the binary double is
    2.67499999... (value-rounding would give 2.67). Both round the
    SHORTEST decimal string repr of the double (Spark via
    Double.toString -> BigDecimal HALF_UP; DuckDB likewise), so
    double->decimal casts are oracle-safe as-is. If either engine moves
    to value-rounding, this fails loudly."""
    s = spark.sql(
        "SELECT CAST(CAST(2.675 AS DOUBLE) AS DECIMAL(10,2)) AS a,"
        "       CAST(CAST(0.125 AS DOUBLE) AS DECIMAL(10,2)) AS b"
    ).collect()[0]
    assert (s.a, s.b) == (Decimal("2.68"), Decimal("0.13"))
    d = duckdb.connect().execute(
        "SELECT CAST(2.675::DOUBLE AS DECIMAL(10,2)),"
        "       CAST(0.125::DOUBLE AS DECIMAL(10,2))"
    ).fetchone()
    assert d == (Decimal("2.68"), Decimal("0.13"))


def test_nan_infinity_to_decimal_asymmetries(spark):
    """Non-finite doubles into DECIMAL, the full measured matrix. Spark
    (ANSI ON): overflow RAISES but NaN silently -> NULL — an internal
    asymmetry (ANSI promises errors over silent NULLs; NaN gets the
    non-ANSI treatment). DuckDB: CAST raises for both, TRY_CAST(inf) ->
    NULL but TRY_CAST(NaN) STILL raises — its own asymmetry. Recipe:
    filter non-finites (isnan/isinf) before any decimal cast that must
    agree cross-engine."""
    # Spark ANSI: overflow raises...
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        spark.sql(
            "SELECT CAST(CAST(1e30 AS DOUBLE) AS DECIMAL(10,2)) AS v"
        ).collect()
    # ...but NaN silently NULLs (same for Infinity)
    row = spark.sql(
        "SELECT CAST(CAST('nan' AS DOUBLE) AS DECIMAL(10,2)) AS a,"
        "       CAST(CAST('inf' AS DOUBLE) AS DECIMAL(10,2)) AS b,"
        "       TRY_CAST(CAST(1e30 AS DOUBLE) AS DECIMAL(10,2)) AS c"
    ).collect()[0]
    assert (row.a, row.b, row.c) == (None, None, None)

    con = duckdb.connect()
    with pytest.raises(duckdb.ConversionException):
        con.execute("SELECT CAST(1e30::DOUBLE AS DECIMAL(10,2))")
    assert con.execute(
        "SELECT TRY_CAST(1e30::DOUBLE AS DECIMAL(10,2))"
    ).fetchone()[0] is None
    assert con.execute(
        "SELECT TRY_CAST('inf'::DOUBLE AS DECIMAL(10,2))"
    ).fetchone()[0] is None
    # DuckDB's asymmetry: TRY_CAST does NOT catch NaN
    with pytest.raises(duckdb.InvalidInputException):
        con.execute("SELECT TRY_CAST('nan'::DOUBLE AS DECIMAL(10,2))")


def test_round_half_up_and_banker_equivalents_agree(spark):
    """AGREEMENT pins for the two rounding modes: round() is
    half-away-from-zero on decimals AND doubles in both engines
    (2.5 -> 3, -2.5 -> -3, 0.125 -> 0.13); Spark bround (HALF_EVEN) ==
    DuckDB round_even (0.125 -> 0.12, 2.5 -> 2). An oracle may use
    either mode as long as it names the same one on both sides."""
    s = spark.sql(
        "SELECT round(CAST(2.5 AS DECIMAL(5,1)), 0) AS a,"
        "       round(CAST(-2.5 AS DECIMAL(5,1)), 0) AS b,"
        "       round(CAST(0.125 AS DECIMAL(5,3)), 2) AS c,"
        "       round(CAST(0.125 AS DOUBLE), 2) AS d,"
        "       bround(CAST(0.125 AS DECIMAL(5,3)), 2) AS e,"
        "       bround(CAST(2.5 AS DECIMAL(5,1)), 0) AS f"
    ).collect()[0]
    assert (s.a, s.b, s.c, s.d) == (
        Decimal("3"), Decimal("-3"), Decimal("0.13"), 0.13,
    )
    assert (s.e, s.f) == (Decimal("0.12"), Decimal("2"))
    con = duckdb.connect()
    d = con.execute(
        "SELECT round(CAST(2.5 AS DECIMAL(5,1)), 0),"
        "       round(CAST(-2.5 AS DECIMAL(5,1)), 0),"
        "       round(CAST(0.125 AS DECIMAL(5,3)), 2),"
        "       round(0.125::DOUBLE, 2),"
        "       round_even(CAST(0.125 AS DECIMAL(5,3)), 2),"
        "       round_even(CAST(2.5 AS DECIMAL(5,1)), 0)"
    ).fetchone()
    assert d[:4] == (Decimal("3"), Decimal("-3"), Decimal("0.13"), 0.13)
    # round_even returns DOUBLE in DuckDB vs DECIMAL in Spark — values
    # agree, the TYPE needs a cast in a hash-compared oracle
    assert (float(d[4]), float(d[5])) == (0.12, 2.0)


def test_multiplication_scale_and_aggregate_types(spark):
    """Multiplication scale s1+s2 agrees ((5,2)*(5,2) -> x.xxxx both
    sides); SUM keeps the input scale and agrees by value; AVG diverges
    in TYPE — Spark derives DECIMAL(p+4, s+4) (1.300000), DuckDB returns
    DOUBLE (1.3). Recipe: CAST(AVG(x) AS DOUBLE) on the Spark side (or
    keep integer-cents and divide in DOUBLE) — the registry's
    integer-cents columns (README 'Aggregate outputs') exist exactly to
    stay out of this class."""
    s = spark.sql(
        "SELECT CAST(1 AS DECIMAL(5,2)) * CAST(1 AS DECIMAL(5,2)) AS m"
    )
    assert s.schema["m"].dataType.simpleString() == "decimal(11,4)"
    assert s.collect()[0].m == Decimal("1.0000")
    con = duckdb.connect()
    assert con.execute(
        "SELECT CAST(1 AS DECIMAL(5,2)) * CAST(1 AS DECIMAL(5,2))"
    ).fetchone()[0] == Decimal("1.0000")

    agg = spark.sql(
        "SELECT SUM(v) AS s, AVG(v) AS a FROM VALUES"
        " (CAST(1.25 AS DECIMAL(5,2))), (CAST(1.35 AS DECIMAL(5,2))) t(v)"
    )
    assert agg.schema["a"].dataType.simpleString() == "decimal(9,6)"
    row = agg.collect()[0]
    assert (row.s, row.a) == (Decimal("2.60"), Decimal("1.300000"))
    d = con.execute(
        "SELECT SUM(v), AVG(v) FROM (VALUES"
        " (CAST(1.25 AS DECIMAL(5,2))), (CAST(1.35 AS DECIMAL(5,2)))) t(v)"
    ).fetchone()
    assert d[0] == Decimal("2.60")
    assert isinstance(d[1], float) and d[1] == 1.3  # DOUBLE, not DECIMAL
    # recipe: CAST AVG to DOUBLE on the Spark side — exact agreement
    assert spark.sql(
        "SELECT CAST(AVG(v) AS DOUBLE) AS a FROM VALUES"
        " (CAST(1.25 AS DECIMAL(5,2))), (CAST(1.35 AS DECIMAL(5,2))) t(v)"
    ).collect()[0].a == 1.3
