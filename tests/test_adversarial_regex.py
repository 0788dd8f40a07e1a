"""Adversarial regex-dialect gate (round 11, fifth relational-core edge
family): Spark compiles patterns with java.util.regex, DuckDB with RE2 —
two different pattern LANGUAGES behind identically-named functions.
Measured (Spark 4.1.2 / DuckDB) and pinned.

The dangerous part is that the divergences are SILENT — RE2 does not
error on constructs it lacks when they arrive via regexp_extract (it
returns the empty string), and Java does not error on POSIX classes it
misparses:

- LOOKAHEAD: 'foo(?=bar)' matches 'foo' in Spark, silently extracts ''
  in DuckDB.
- BACKREFERENCES: '(ab)\\1' matches 'abab' in Spark, silently '' in
  DuckDB (RE2 has no backreferences by design).
- POSIX CLASSES: '[[:digit:]]+' extracts '12' in DuckDB, silently '' in
  Spark (Java misparses the POSIX bracket as a nested character class).
- REPLACE SCOPE: Spark regexp_replace replaces ALL matches; DuckDB's
  default replaces the FIRST only — the 'g' flag aligns them (audited:
  every registered oracle's regexp_replace either passes 'g' or uses an
  end-anchored pattern with at most one possible match,
  e.g. queries/dedup.py `'/$'`).

Portable-subset agreement pins (the dialect both engines share, which
is all the registered queries use): character classes and quantifiers
(incl. lazy), alternation, anchors, ASCII-only \\d and \\w (neither
engine matches Arabic-Indic digits or accented letters — unicode
awareness must be spelled as explicit classes), word boundary \\b,
dot-excludes-newline, and the (?i)/(?m)/(?s) inline flags.

Reference surface: SURVEY §2 Tier A8 (regexp_extract in the m33 view)
and the Tier B scalar-regex family (`queries/relational.py`,
PII redaction and HTML stripping in `queries/text.py`).
"""

from __future__ import annotations

import duckdb


def _spark_re(spark, text: str, pat: str) -> str:
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame([(text,)], "t string")
        .select(F.regexp_extract("t", pat, 0).alias("v"))
        .collect()[0]
        .v
    )


def _duck_re(con, text: str, pat: str) -> str:
    return con.execute(
        "SELECT regexp_extract(?, ?, 0)", [text, pat]
    ).fetchone()[0]


def test_lookahead_and_backrefs_silently_unsupported_in_duckdb(spark):
    con = duckdb.connect()
    assert _spark_re(spark, "foobar", r"foo(?=bar)") == "foo"
    assert _duck_re(con, "foobar", r"foo(?=bar)") == ""  # RE2: silent miss
    assert _spark_re(spark, "abab", r"(ab)\1") == "abab"
    assert _duck_re(con, "abab", r"(ab)\1") == ""  # RE2: no backrefs


def test_posix_class_silently_unsupported_in_spark(spark):
    con = duckdb.connect()
    assert _duck_re(con, "ab12", "[[:digit:]]+") == "12"
    assert _spark_re(spark, "ab12", "[[:digit:]]+") == ""  # Java misparse
    # the portable spelling agrees
    assert _spark_re(spark, "ab12", "[0-9]+") == "12"
    assert _duck_re(con, "ab12", "[0-9]+") == "12"


def test_replace_scope_diverges_g_flag_aligns(spark):
    from pyspark.sql import functions as F

    con = duckdb.connect()
    s = (
        spark.createDataFrame([("a1b2",)], "t string")
        .select(F.regexp_replace("t", r"\d", "#").alias("v"))
        .collect()[0]
        .v
    )
    assert s == "a#b#"  # Spark: ALL matches, no flag exists to limit it
    assert con.execute(
        r"SELECT regexp_replace('a1b2', '\d', '#')"
    ).fetchone()[0] == "a#b2"  # DuckDB default: FIRST match only
    assert con.execute(
        r"SELECT regexp_replace('a1b2', '\d', '#', 'g')"
    ).fetchone()[0] == "a#b#"  # the alignment flag every oracle uses


def test_portable_subset_agrees(spark):
    con = duckdb.connect()
    cases = [
        # (text, pattern, expected in BOTH engines)
        ("a cat.", r"\bcat\b", "cat"),  # word boundary
        ("x١٢٣9", r"\d+", "9"),  # \d is ASCII-only in both
        ("héllo", r"\w+", "h"),  # \w is ASCII-only in both
        ("a\nb", r"a.b", ""),  # dot excludes newline in both
        ("a\nb", r"(?s)a.b", "a\nb"),  # DOTALL flag in both
        ("x\nabc", r"(?m)^abc$", "abc"),  # MULTILINE flag in both
        ("ABC", r"(?i)abc", "ABC"),  # case-insensitive flag in both
        ("aaa", r"a+?", "a"),  # lazy quantifier in both
        ("a1b22c", r"[0-9]+", "1"),  # first match of a class
    ]
    for text, pat, want in cases:
        assert _spark_re(spark, text, pat) == want, (text, pat)
        assert _duck_re(con, text, pat) == want, (text, pat)

    # split-on-regex agrees through the registered queries' idiom
    from pyspark.sql import functions as F

    n_s = (
        spark.createDataFrame([("a1b22c",)], "t string")
        .select(F.size(F.split("t", "[0-9]+")).alias("v"))
        .collect()[0]
        .v
    )
    n_d = con.execute(
        "SELECT len(string_split_regex('a1b22c', '[0-9]+'))"
    ).fetchone()[0]
    assert n_s == n_d == 3


def test_whitespace_class_membership_diverges_on_vertical_tab(spark):
    """Round-12 sweep find: \\s itself diverges. Java's \\s is
    [ \\t\\n\\x0b\\f\\r]; RE2's is [\\t\\n\\f\\r ] — NO vertical tab — so
    split-on-\\s tokenization disagrees on any VT-bearing text (Spark
    treats 'a\\x0bb' as two tokens, DuckDB as one). This broke the
    standardized tokenizer recipe in 24 oracles until they were aligned
    to the explicit class [ \\t\\n\\x0b\\f\\r]+ (= Java \\s exactly),
    which both dialects accept — asserted. NEL (\\x85) is in NEITHER
    engine's \\s (agreement pinned)."""
    vt_text = "a\x0bb c"
    s = spark.createDataFrame([(vt_text,)], "t string").selectExpr(
        r"size(split(t, '\\s+')) AS n",
        r"size(split(t, '[ \\t\\n\\x0b\\f\\r]+')) AS m",
    ).collect()[0]
    assert s.n == 3  # Java \s splits on VT
    assert s.m == 3
    con = duckdb.connect()
    d = con.execute(
        r"SELECT len(string_split_regex(?, '\s+')),"
        r"       len(string_split_regex(?, '[ \t\n\x0b\f\r]+'))",
        [vt_text, vt_text],
    ).fetchone()
    assert d[0] == 2  # RE2 \s does NOT split on VT — the divergence
    assert d[1] == 3  # the explicit class aligns

    # NEL is outside both dialects' \s
    nel_text = "a\x85b"
    s2 = spark.createDataFrame([(nel_text,)], "t string").selectExpr(
        r"size(split(t, '\\s+')) AS n"
    ).collect()[0].n
    d2 = con.execute(
        r"SELECT len(string_split_regex(?, '\s+'))", [nel_text]
    ).fetchone()[0]
    assert s2 == d2 == 1


def test_dot_line_terminator_set_diverges(spark):
    """Round-12 corpus find (doc 16 broke q143 before the fix): the
    bare dot's exclusion set differs — Java excludes ALL line
    terminators (\\n, \\r, NEL \\x85, \\u2028, \\u2029) where RE2
    excludes only \\n — so '<p>(.*)</p>' over NEL-bearing content
    extracts '' in Spark and the full text in DuckDB. The q142/q143
    extraction patterns now scope their dots with inline (?s:...),
    which BOTH dialects support and which makes the two engines
    identical (asserted); \\n agreement for the bare dot stays pinned
    (neither crosses it)."""
    for ch, name in (("\x85", "NEL"), ("\r", "CR"), ("\u2028", "LS")):
        body = f"a{ch}b"
        s = spark.createDataFrame([(f"<p>{body}</p>",)], "h string").selectExpr(
            "regexp_extract(h, '<p>(.*)</p>', 1) AS v"
        ).collect()[0].v
        assert s == "", name  # Java dot stops at every line terminator
        d = duckdb.connect().execute(
            "SELECT regexp_extract('<p>' || ? || '</p>', '<p>(.*)</p>', 1)", [body]
        ).fetchone()[0]
        assert d == ("" if ch == "\n" else body), name  # RE2: only \n excluded

    # the (?s:) recipe aligns both engines on every terminator
    for ch in ("\x85", "\r", "\n", "\u2028"):
        body = f"a{ch}b"
        s = spark.createDataFrame([(f"<p>{body}</p>",)], "h string").selectExpr(
            "regexp_extract(h, '<p>((?s:.*))</p>', 1) AS v"
        ).collect()[0].v
        d = duckdb.connect().execute(
            "SELECT regexp_extract('<p>' || ? || '</p>', '<p>((?s:.*))</p>', 1)",
            [body],
        ).fetchone()[0]
        assert s == d == body, hex(ord(ch))
