"""Cross-engine adversarial gate: array indexing and string slicing.

Round-12 family: every registered oracle silently relies on the indexing
contract — Spark SQL's ``arr[i]`` is ZERO-based while DuckDB's ``arr[i]``
is ONE-based (the m33 view's ``data[0]/data[1]`` pairs with the oracle's
``[1]/[2]`` precisely because of this) — but the contract itself was
never pinned, and its edges (out-of-bounds, negative indices, position-0
and negative-length substrings, negative-n left/right) hide SILENT
divergences an oracle could only hit with hostile data. Measured on
Spark 4.1.2 (ANSI ON) vs DuckDB, same discipline as the other gates.

Measured divergence summary:
- Bracket indexing BASE: spark arr[1]='b' (0-based) vs duck arr[1]='a'
  (1-based); duck arr[0] is silently NULL, spark arr[0] is the first
  element — same SQL, different element, no error anywhere.
- Out-of-bounds/negative brackets: ANSI Spark RAISES
  (INVALID_ARRAY_INDEX) for arr[5] and arr[-1]; DuckDB returns NULL for
  OOB and wraps -1 to the LAST element.
- element_at(0): Spark raises INVALID_INDEX_OF_ZERO; duck arr[0] is
  silently NULL.
- substring(s, 0, n): Spark clamps start 0 to 1 and returns n chars
  ('abc'); DuckDB uses position-line semantics and the 0th position
  consumes one count ('ab'). substring(s, 2, -1): Spark '' (negative
  length = empty), DuckDB 'a' (negative length extends LEFT).
- left/right with negative n: Spark returns '' for both; DuckDB
  left('abc',-1)='ab' (all but last), right('abc',-1)='bc' (all but
  first).
Alignment recipes (asserted): Spark element_at/try_element_at are
1-based like DuckDB brackets — element_at(k)==duck[k] for k>=1,
element_at(-1)==duck[-1], try_element_at OOB == duck OOB (both NULL);
Spark get() is 0-based-NULL-tolerant — get(arr,i)==duck arr[i+1]
including OOB; slice(arr,a,n)==duck arr[a:a+n-1]; keep substring start
>= 1 and length >= 0 (agreement pinned, incl. negative START which both
engines count from the end).
"""

from __future__ import annotations

import duckdb
import pytest


def test_bracket_indexing_base_diverges(spark):
    """spark arr[i] is 0-based, duck arr[i] is 1-based: identical SQL
    reads a DIFFERENT element with no error. duck arr[0] is silently
    NULL where spark arr[0] is the first element."""
    s = spark.sql(
        "SELECT split('a b c', ' ')[0] AS z, split('a b c', ' ')[1] AS o"
    ).collect()[0]
    assert (s.z, s.o) == ("a", "b")
    d = duckdb.connect().execute(
        "SELECT (string_split('a b c', ' '))[0], (string_split('a b c', ' '))[1]"
    ).fetchone()
    assert d == (None, "a")  # [0] silently NULL; [1] is the FIRST element


def test_out_of_bounds_and_negative_brackets(spark):
    """ANSI Spark raises on any bracket index outside [0, n); DuckDB
    returns NULL for OOB and wraps negatives to count from the end."""
    with pytest.raises(Exception, match="INVALID_ARRAY_INDEX"):
        spark.sql("SELECT array(1,2,3)[5] AS v").collect()
    with pytest.raises(Exception, match="INVALID_ARRAY_INDEX"):
        spark.sql("SELECT array(1,2,3)[-1] AS v").collect()
    d = duckdb.connect().execute(
        "SELECT ([1,2,3])[5], ([1,2,3])[-1], ([1,2,3])[-5]"
    ).fetchone()
    assert d == (None, 3, None)


def test_element_at_get_slice_recipes_agree(spark):
    """The portable recipes. element_at/try_element_at are 1-based like
    DuckDB brackets (incl. -1 = last, OOB -> NULL via the try_ variant);
    get() is the 0-based NULL-tolerant accessor matching duck arr[i+1]
    even out of bounds; slice(a, start, len) == duck a[start:start+len-1].
    element_at(0) raises in Spark where duck [0] silently NULLs — the
    one edge with no aligned spelling, keep indexes nonzero."""
    s = spark.sql(
        "SELECT element_at(array(10,20,30), 1) AS a,"
        "       element_at(array(10,20,30), -1) AS b,"
        "       try_element_at(array(10,20,30), 5) AS c,"
        "       try_element_at(array(10,20,30), -5) AS d,"
        "       get(array(10,20,30), 0) AS e,"
        "       get(array(10,20,30), 5) AS f,"
        "       slice(array(1,2,3), 2, 2) AS g"
    ).collect()[0]
    assert (s.a, s.b, s.c, s.d, s.e, s.f, s.g) == (
        10, 30, None, None, 10, None, [2, 3],
    )
    d = duckdb.connect().execute(
        "SELECT ([10,20,30])[1], ([10,20,30])[-1], ([10,20,30])[5],"
        "       ([10,20,30])[-5], ([10,20,30])[0+1], ([10,20,30])[5+1],"
        "       ([1,2,3])[2:3]"
    ).fetchone()
    assert d == (10, 30, None, None, 10, None, [2, 3])
    with pytest.raises(Exception, match="INVALID_INDEX_OF_ZERO"):
        spark.sql("SELECT element_at(array(1,2,3), 0) AS v").collect()
    assert duckdb.connect().execute("SELECT ([1,2,3])[0]").fetchone()[0] is None


def test_substring_position_zero_and_negative_length_diverge(spark):
    """substring(s, 0, n): Spark clamps start to 1 (full n chars);
    DuckDB's position-line start 0 consumes one count (n-1 chars).
    substring(s, 2, -1): Spark '' vs DuckDB extending LEFT ('a'). Both
    silent. Recipe: keep start >= 1 and length >= 0 — pinned to agree
    below (incl. negative START, which both count from the end)."""
    s = spark.sql(
        "SELECT substring('abcdef', 0, 3) AS a, substring('abcdef', 2, -1) AS b"
    ).collect()[0]
    assert (s.a, s.b) == ("abc", "")
    d = duckdb.connect().execute(
        "SELECT substring('abcdef', 0, 3), substring('abcdef', 2, -1)"
    ).fetchone()
    assert d == ("ab", "a")
    # the portable subset agrees exactly
    s2 = spark.sql(
        "SELECT substring('abcdef', 2, 3) AS a, substr('abcdef', -2) AS b,"
        "       substr('abcdef', -2, 2) AS c, substring('abcdef', -1, 3) AS d,"
        "       substring('abcdef', 2, 0) AS e"
    ).collect()[0]
    d2 = duckdb.connect().execute(
        "SELECT substring('abcdef', 2, 3), substr('abcdef', -2),"
        "       substr('abcdef', -2, 2), substring('abcdef', -1, 3),"
        "       substring('abcdef', 2, 0)"
    ).fetchone()
    assert tuple(s2) == d2 == ("bcd", "ef", "ef", "f", "")


def test_left_right_negative_n_diverges(spark):
    """left/right with negative n: Spark returns '' for both; DuckDB
    interprets -n as 'all but n from the other end' (left('abc',-1) =
    'ab', right('abc',-1) = 'bc'). Recipe: keep n >= 0 (agreement
    pinned), or spell the drop-n intent as substring."""
    s = spark.sql(
        "SELECT left('abc', -1) AS a, right('abc', -1) AS b,"
        "       left('abc', 2) AS c, right('abc', 2) AS d"
    ).collect()[0]
    assert (s.a, s.b, s.c, s.d) == ("", "", "ab", "bc")
    d = duckdb.connect().execute(
        "SELECT left('abc', -1), right('abc', -1), left('abc', 2), right('abc', 2)"
    ).fetchone()
    assert d == ("ab", "bc", "ab", "bc")


def test_split_edge_inputs_agree(spark):
    """Agreement pins for the tokenizer edges every text oracle stands
    on: splitting '' yields [''] (one empty token, NOT an empty list) in
    both engines, and instr/position with an empty needle is 1 in both."""
    s = spark.sql(
        "SELECT split('', ' ') AS a, split('a', '') AS b,"
        "       instr('abcabc', '') AS c, position('' IN 'abc') AS d"
    ).collect()[0]
    assert (s.a, s.b, s.c, s.d) == ([""], ["a"], 1, 1)
    d = duckdb.connect().execute(
        "SELECT string_split('', ' '), string_split('a', ''),"
        "       instr('abcabc', ''), position('' IN 'abc')"
    ).fetchone()
    assert d == ([""], ["a"], 1, 1)


def test_m33_view_pairing_is_the_base_recipe():
    """The m33 typed view is the registry's live instance of the base
    divergence: the Spark side reads data[0]/data[1] (0-based getItem)
    while its DuckDB oracle reads [1]/[2] — one offset apart BY DESIGN.
    Guard the pairing so neither side is ever 'fixed' to match the other
    textually (which would silently shift every m33 column)."""
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "hdfs_hive_sql_playground_spark",
    )
    m33 = open(os.path.join(pkg, "m33.py")).read()
    oracle = open(os.path.join(pkg, "queries", "m33_pipeline.py")).read()
    spark_idx = re.findall(r"data\.getItem\((\d)\)|data\[(\d)\]", m33)
    spark_nums = sorted({int(a or b) for a, b in spark_idx})
    duck_nums = sorted(
        int(m) for m in re.findall(r"string_split\([^)]*\)[^\[]*\[(\d)\]", oracle)
    )
    assert spark_nums and duck_nums
    assert [n + 1 for n in spark_nums] == duck_nums, (
        f"m33 index pairing broke: spark(0-based)={spark_nums} "
        f"duck(1-based)={duck_nums}"
    )
