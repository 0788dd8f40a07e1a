"""Adversarial string-edge gate (round 11, third of the relational-core
edge families after floats and temporals): unicode case mapping, the
trim whitespace class, NULL-concat semantics, and code-point string
semantics — measured cross-engine (Spark 4.1.2 / DuckDB) and pinned.

The round-8 corpus gate already proves the REGISTERED operators agree on
unicode corpora; this gate pins the raw function contracts underneath,
including three divergences a future oracle author would hit silently:

- CASE-MAPPING EXPANSION diverges: Java's full case mapping expands
  sharp-s 'strasse'-style ('straße' -> 'STRASSE') and the 'fi'
  ligature ('ﬁle' -> 'FILE'), growing the string, while DuckDB maps
  one-to-one ('STRAẞE' with capital sharp S, ligature untouched).
  Consequence pinned: COUNT(DISTINCT upper(c)) over {'straße',
  'STRASSE'} is 1 in Spark and 2 in DuckDB — a case-fold dedup key on
  non-ASCII text is ENGINE-SPECIFIC and cannot be oracle-compared as-is.
  (lower() does not merge that pair in either engine, so ASCII-scoped
  lower-folding — what the registered dedup/text queries use — stays
  safe.)
- TRIM's whitespace class diverges: Spark trim() strips ASCII space
  only (U+00A0 NBSP survives), DuckDB trim() strips NBSP too. Same
  lesson as the round-10 q60 try_cast pin ([\\x00-\\x20]): never let an
  implicit whitespace class near an oracle compare — spell the class
  with trim(chars)/regexp_replace on both sides (recipe asserted).
- concat(NULL) diverges: Spark concat() is NULL-propagating, DuckDB
  concat() SKIPS NULLs. The `||` operator propagates NULL in BOTH
  engines (the alignment recipe), and concat_ws skips NULLs in both —
  so oracles use || or concat_ws, never bare concat, on nullable
  columns.
- Spark initcap() has no DuckDB builtin (CatalogException) — pinned so
  the constraint on oracle SQL is explicit.

Where the engines AGREE the pins keep them honest: code-point (not
UTF-16, not grapheme) semantics for length/substring/instr/lpad/rpad/
ascii/translate including astral-plane emoji and ZWJ sequences; binary
(codepoint-order) collation for comparisons; NFC vs NFD never merging
in keys (both engines are normalization-blind); root-locale case
mapping (no Turkish-i surprise).

Round 13 mapped the UNIT AXIS function-by-function, because it turned
out unit semantics cannot be assumed even within one engine's library:
levenshtein edits code points in Spark but UTF-8 BYTES in DuckDB
(silent distance split beyond ASCII), string reverse moves code points
in Spark but GRAPHEME CLUSTERS in DuckDB (a single astral char is a
degenerate cluster, which is why the agreement pin above still holds —
combining marks and ZWJ sequences are where they part), while
lpad/rpad/ascii/translate measure code points in BOTH (translate's
agreement is what makes q146's width-fold key portable).

All non-ASCII fixture strings are built from explicit escapes so the
test file itself cannot be corrupted by editor/tooling normalization.

Reference surface: SURVEY §2 Tier B string scalar functions
(`queries/relational.py` string block) and the text/dedup family whose
fold keys these contracts protect.
"""

from __future__ import annotations

import duckdb
import pytest

NBSP = "\u00a0"
SHARP_S = "stra\u00dfe"  # strasse with sharp s
LIGATURE = "\ufb01le"  # fi-ligature + "le"
NFC = "\u00e9"  # e-acute, precomposed
NFD = "e\u0301"  # e + combining acute: 2 code points
EMOJI = "\U0001f642"  # slightly smiling face (astral plane)
ZWJ_FAMILY = "\U0001f468\u200d\U0001f469\u200d\U0001f467"  # 5 code points


def test_case_mapping_expansion_diverges_with_grouping_consequence(spark):
    con = duckdb.connect()
    assert spark.sql(f"SELECT upper('{SHARP_S}') AS v").collect()[0].v == "STRASSE"
    assert con.execute(f"SELECT upper('{SHARP_S}')").fetchone()[0] == "STRA\u1e9eE"
    assert spark.sql(f"SELECT upper('{LIGATURE}') AS v").collect()[0].v == "FILE"
    assert con.execute(f"SELECT upper('{LIGATURE}')").fetchone()[0] == "\ufb01LE"

    # the silent-wrong consequence: a case-folded distinct over non-ASCII
    n_spark = spark.sql(
        f"SELECT count(DISTINCT upper(c)) AS v FROM VALUES ('{SHARP_S}'), ('STRASSE') t(c)"
    ).collect()[0].v
    n_duck = con.execute(
        f"SELECT count(DISTINCT upper(c)) FROM (VALUES ('{SHARP_S}'), ('STRASSE')) t(c)"
    ).fetchone()[0]
    assert (n_spark, n_duck) == (1, 2)

    # lower() merges in NEITHER engine (sharp-s has no one-char
    # round-trip), so ASCII-scoped lower-folding is the portable subset
    for n in (
        spark.sql(
            f"SELECT count(DISTINCT lower(c)) AS v FROM VALUES ('{SHARP_S}'), ('STRASSE') t(c)"
        ).collect()[0].v,
        con.execute(
            f"SELECT count(DISTINCT lower(c)) FROM (VALUES ('{SHARP_S}'), ('STRASSE')) t(c)"
        ).fetchone()[0],
    ):
        assert n == 2

    # no locale surprise: both engines case-map in the root locale
    assert spark.sql("SELECT upper('istanbul') AS v").collect()[0].v == "ISTANBUL"
    assert con.execute("SELECT upper('istanbul')").fetchone()[0] == "ISTANBUL"


def test_trim_whitespace_class_diverges(spark):
    """Spark trim() strips ASCII space only; DuckDB trim() also strips
    NBSP. Oracles must spell the class explicitly — both engines agree
    once the character set is explicit (second half)."""
    padded = f"{NBSP}x{NBSP}"
    assert spark.sql(f"SELECT length(trim('{padded}')) AS v").collect()[0].v == 3
    con = duckdb.connect()
    assert con.execute(f"SELECT length(trim('{padded}'))").fetchone()[0] == 1

    # explicit-class recipe agrees exactly
    s = spark.sql(f"SELECT trim(BOTH '{NBSP} ' FROM '{padded}') AS v").collect()[0].v
    d = con.execute(f"SELECT trim('{padded}', '{NBSP} ')").fetchone()[0]
    assert s == d == "x"


def test_concat_null_semantics_diverge_pipe_operator_aligns(spark):
    con = duckdb.connect()
    assert spark.sql(
        "SELECT concat('a', cast(NULL AS string)) AS v"
    ).collect()[0].v is None
    assert con.execute("SELECT concat('a', NULL::varchar)").fetchone()[0] == "a"

    # the alignment recipes: || propagates NULL in both; concat_ws skips
    # NULLs in both
    assert spark.sql("SELECT 'a' || cast(NULL AS string) AS v").collect()[0].v is None
    assert con.execute("SELECT 'a' || NULL::varchar").fetchone()[0] is None
    assert spark.sql(
        "SELECT concat_ws('-', 'a', cast(NULL AS string), 'b') AS v"
    ).collect()[0].v == "a-b"
    assert con.execute(
        "SELECT concat_ws('-', 'a', NULL::varchar, 'b')"
    ).fetchone()[0] == "a-b"


def test_codepoint_semantics_and_binary_collation_agree(spark):
    """length/substring/instr/reverse/lpad/ascii are CODE-POINT based in
    both engines (not UTF-16 units, not graphemes): the astral-plane
    emoji counts 1, the ZWJ family sequence counts its 5 code points,
    and comparisons are binary code-point order in both."""
    con = duckdb.connect()
    cases = [
        (f"length('{EMOJI}')", 1),
        (f"length('{ZWJ_FAMILY}')", 5),  # 3 people + 2 zero-width joiners
        (f"length('{NFC}')", 1),
        (f"length('{NFD}')", 2),
        (f"substring('{EMOJI}x', 1, 1)", EMOJI),
        (f"substring('{EMOJI}x', 2, 1)", "x"),
        (f"instr('{EMOJI}abc', 'a')", 2),
        (f"reverse('a{EMOJI}b')", f"b{EMOJI}a"),
        (f"lpad('{EMOJI}', 3, '*')", f"**{EMOJI}"),
        (f"ascii('{EMOJI}')", 128578),
    ]
    for expr, want in cases:
        assert spark.sql(f"SELECT {expr} AS v").collect()[0].v == want, expr
        assert con.execute(f"SELECT {expr}").fetchone()[0] == want, expr

    # binary collation: uppercase-before-lowercase, accented after ASCII
    for expr, want in [("'a' < 'B'", False), (f"'{NFC}' < 'z'", False)]:
        assert spark.sql(f"SELECT {expr} AS v").collect()[0].v is want, expr
        assert con.execute(f"SELECT {expr}").fetchone()[0] is want, expr

    # normalization-blind keys in both: NFC and NFD of the same rendered
    # character never merge under DISTINCT (binary keys, no normalization)
    n_s = spark.sql(
        f"SELECT count(DISTINCT c) AS v FROM VALUES ('{NFC}'), ('{NFD}') t(c)"
    ).collect()[0].v
    n_d = con.execute(
        f"SELECT count(DISTINCT c) FROM (VALUES ('{NFC}'), ('{NFD}')) t(c)"
    ).fetchone()[0]
    assert n_s == n_d == 2


def test_content_hash_trim_boundary_on_unicode_spaces(spark):
    """The registered dedup family's content-hash recipe is
    md5(lower(trim(text))) on BOTH engines (e.g. q80, queries/dedup.py).
    On every real fixture the corpus is ASCII-padded and the pair agrees
    — but on a text padded with UNICODE spaces the bare trims diverge
    (Spark leaves NBSP, DuckDB strips it), so the oracle compare would
    fail LOUDLY (hash mismatch), not silently. Pinned here with the
    exact recipe, plus the explicit-class alignment (DuckDB
    trim(x, ' ') = ASCII-space-only = Spark trim) that round 12 folded
    into every affected oracle string (~36 text/dedup oracles + the m33
    view; deferred from r11 deliberately, since changing them then would
    have evicted 23 r8-vintage queries from the 50-slot driver window).
    The alignment is enforced by test_adversarial_corpus.py::
    test_no_oracle_uses_bare_one_arg_trim and exercised cross-engine by
    the unicode-space-padded corpus docs 14/15 there."""
    padded = f"{NBSP}hello world{NBSP}"
    s = spark.createDataFrame([(padded,)], "text string").selectExpr(
        "md5(lower(trim(text))) AS h"
    ).collect()[0].h
    con = duckdb.connect()
    d_bare = con.execute(
        "SELECT md5(lower(trim(?)))", [padded]
    ).fetchone()[0]
    assert s != d_bare  # the latent divergence, loud by construction
    d_ascii = con.execute(
        "SELECT md5(lower(trim(?, ' ')))", [padded]
    ).fetchone()[0]
    assert s == d_ascii  # the alignment recipe for the r12 oracle pass


def test_initcap_has_no_duckdb_builtin(spark):
    assert spark.sql(
        f"SELECT initcap('{NFC}ole {NFC}COLE') AS v"
    ).collect()[0].v == "\u00c9ole \u00c9cole"
    with pytest.raises(duckdb.CatalogException):
        duckdb.connect().execute("SELECT initcap('x')")


def test_like_default_escape_diverges(spark):
    """LIKE's default escape, round-12 addition: Spark treats backslash
    as the built-in escape ('a_c' LIKE 'a\\_c' is TRUE — the underscore
    is literal) while DuckDB has NO default escape ('\\' is an ordinary
    character, so the same pattern is FALSE) — a silent TRUE/FALSE flip
    on any pattern that escapes _ or %. Worse, a stray escape mid-
    pattern ('a\\c') RAISES in Spark (INVALID_FORMAT.ESC_IN_THE_MIDDLE)
    where DuckDB silently matches it literally. No registered oracle
    uses LIKE at all (audited; matching goes through the regex family,
    whose dialect gate is test_adversarial_regex.py) — the recipe if
    one ever does: spell ESCAPE explicitly, which agrees exactly, as do
    ILIKE and the case-sensitive default."""
    s = spark.sql(
        r"SELECT 'a_c' LIKE 'a\\_c' AS a, '10%' LIKE '10\\%' AS b,"
        r"       'abc' LIKE 'ABC' AS c, 'abc' ILIKE 'ABC' AS d,"
        r"       'a_c' LIKE 'a!_c' ESCAPE '!' AS e, 'axc' LIKE 'a_c' AS f"
    ).collect()[0]
    assert (s.a, s.b, s.c, s.d, s.e, s.f) == (
        True, True, False, True, True, True,
    )
    with pytest.raises(Exception, match="ESC_IN_THE_MIDDLE"):
        spark.sql(r"SELECT 'a\\c' LIKE 'a\\c' AS v").collect()
    con = duckdb.connect()
    d = con.execute(
        r"SELECT 'a_c' LIKE 'a\_c', '10%' LIKE '10\%', 'abc' LIKE 'ABC',"
        r"       'abc' ILIKE 'ABC', 'a_c' LIKE 'a!_c' ESCAPE '!',"
        r"       'axc' LIKE 'a_c', 'a\c' LIKE 'a\c'"
    ).fetchone()
    assert d == (False, False, False, True, True, True, True)


def test_lower_fold_dotted_capital_i_boundary(spark):
    """The one code point where lower() itself diverges (round-12 sweep
    find — the lowercase twin of the upper() expansion pin above):
    U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE. Spark (Java full
    lowering) gives 'i' + U+0307 combining dot (TWO code points);
    DuckDB (simple one-to-one) gives bare 'i'. Every other case-edge
    char is portable under lower() — sharp-s, capital sharp-S (both
    engines map it to ß), fi-ligature, dotless-i all agree — so
    lower-folding is oracle-safe on ALL of unicode EXCEPT U+0130,
    and the registered content-hash recipe md5(lower(trim(x)))
    diverges exactly on texts containing it (shown below, loud by
    construction). Alignment recipe if a corpus needs it: pre-expand
    in DuckDB with replace(x, U+0130, 'i'+U+0307) before lower —
    asserted. The random-unicode sweep in test_adversarial_corpus.py
    excludes U+0130 from its pools and points here."""
    I_DOT = "İ"
    s = spark.createDataFrame([(I_DOT,)], "c string").selectExpr(
        "lower(c) AS l"
    ).collect()[0].l
    assert [hex(ord(x)) for x in s] == ["0x69", "0x307"]
    con = duckdb.connect()
    assert con.execute("SELECT lower(?)", [I_DOT]).fetchone()[0] == "i"

    # portable case edges: lower() agrees on every one of these
    for ch in ("ß", "ẞ", "ﬁ", "ı"):
        s_l = spark.createDataFrame([(ch,)], "c string").selectExpr(
            "lower(c) AS l"
        ).collect()[0].l
        d_l = con.execute("SELECT lower(?)", [ch]).fetchone()[0]
        assert s_l == d_l, hex(ord(ch))

    # the content-hash consequence and its recipe
    text = f"t{I_DOT}tle case"
    s_h = spark.createDataFrame([(text,)], "text string").selectExpr(
        "md5(lower(trim(text))) AS h"
    ).collect()[0].h
    d_bare = con.execute(
        "SELECT md5(lower(trim(?, ' ')))", [text]
    ).fetchone()[0]
    assert s_h != d_bare  # loud, not silent
    d_recipe = con.execute(
        "SELECT md5(lower(trim(replace(?, ?, ?), ' ')))",
        [text, I_DOT, "i̇"],
    ).fetchone()[0]
    assert s_h == d_recipe


def test_string_order_is_codepoint_order_across_astral_boundary(spark):
    """Agreement pin (round 13): every top-k tie-break and min/max in the
    registry stands on cross-engine STRING ORDER (q30's order keys,
    q100's bigram tie-break, keep-longest canonical picks). The one
    place binary orders can diverge is the U+FFFF/astral boundary:
    Java's String.compareTo is UTF-16 code-unit order, which sorts
    U+FFFF ABOVE every astral code point, while UTF-8 byte order (=
    code-point order) sorts it below. MEASURED: Spark compares strings
    with UTF8String's byte-wise comparator, NOT Java String order, so
    ORDER BY, <, and min/max all agree with DuckDB byte-for-byte across
    the boundary (astral emoji, U+10FFFD, fullwidth, private-use) — a
    non-ASCII tie-break is oracle-safe."""
    import pandas as pd

    con = duckdb.connect()
    vals = [
        "￿",
        "\U00010000",
        "\U0001f642",
        "z",
        "é",
        "",
        "\U0010fffd",
        "Ａ",
    ]
    pdf = pd.DataFrame({"s": vals})
    sdf = spark.createDataFrame(pdf)
    got = [r.s for r in sdf.orderBy("s").collect()]
    con.register("astral_t", pdf)
    want = [r[0] for r in con.execute("SELECT s FROM astral_t ORDER BY s").fetchall()]
    assert got == want, (got, want)
    # the boundary itself: U+FFFF < U+10000 in BOTH (code-point order —
    # Java UTF-16 code-unit order would say the opposite)
    assert got.index("￿") < got.index("\U00010000")
    from pyspark.sql import functions as F

    s_lt = sdf.limit(1).select(
        (F.lit("￿") < F.lit("\U00010000")).alias("v")
    ).collect()[0].v
    d_lt = con.execute("SELECT ? < ?", ["￿", "\U00010000"]).fetchone()[0]
    assert s_lt is True and d_lt is True
    assert (
        sdf.agg(F.max("s")).collect()[0][0]
        == con.execute("SELECT max(s) FROM astral_t").fetchone()[0]
        == "\U0010fffd"
    )


def test_string_indexing_is_codepoint_based_across_astral_chars(spark):
    """Agreement pin (round 13, companion to the astral ORDER pin):
    every positional string function the oracles stand on counts CODE
    POINTS, not UTF-16 units, on both engines — an astral char (2 Java
    chars, 4 UTF-8 bytes) is ONE position for length / substring
    (positive and negative start) / left / instr / reverse. A Java
    String.length()-based implementation would count it as two and
    shift every index after it; MEASURED: Spark's UTF8String paths do
    not."""
    import pandas as pd

    con = duckdb.connect()
    s = "a\U0001f642b汉é"
    pdf = pd.DataFrame({"t": [s]})
    sdf = spark.createDataFrame(pdf)
    con.register("astral_idx_t", pdf)
    exprs = [
        "length(t)",
        "substring(t, 2, 2)",
        "substring(t, -2, 2)",
        "upper(t)",
        "reverse(t)",
        "left(t, 2)",
        "instr(t, '汉')",
    ]
    for e in exprs:
        sv = sdf.selectExpr(f"{e} AS v").collect()[0].v
        dv = con.execute(f"SELECT {e} FROM astral_idx_t").fetchone()[0]
        assert sv == dv, (e, sv, dv)
    assert sdf.selectExpr("length(t) AS v").collect()[0].v == 5  # 5 code points


def test_levenshtein_unit_diverges_beyond_ascii(spark):
    """levenshtein, round-13 pin behind the q126 pairing: both engines
    run the classic Wagner-Fischer recurrence but over DIFFERENT
    alphabets — Spark edits CODE POINTS, DuckDB edits UTF-8 BYTES — so
    distances agree exactly on ASCII (q126's c_name/c_mktsegment
    domain) and silently diverge on any non-ASCII text: one accented
    char costs 2 in DuckDB, an astral emoji 4, a CJK substitution up
    to 3. There is no spelling-level alignment recipe in DuckDB 1.0.0
    (no code-point distance function); the recipe is the domain
    restriction q126 documents, or computing the distance engine-side
    only."""
    import duckdb as _duck

    cases = [
        ("kitten", "sitting", 3, 3),   # ASCII: agreement
        ("café", "cafe", 1, 2),        # é = 2 UTF-8 bytes
        ("a\U0001F600b", "ab", 1, 4),  # astral emoji = 4 bytes
        ("你好", "你号", 1, 2),          # CJK substitution, shared bytes
    ]
    con = _duck.connect()
    for a, b, want_s, want_d in cases:
        got_s = (
            spark.createDataFrame([(a, b)], "a string, b string")
            .selectExpr("levenshtein(a, b) AS v")
            .collect()[0]
            .v
        )
        got_d = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got_s == want_s, (a, b, got_s)
        assert got_d == want_d, (a, b, got_d)


def test_pad_and_ascii_units_agree_in_code_points(spark):
    """The counter-pin to the levenshtein byte split above: lpad/rpad
    measure their target length in CODE POINTS in both engines (a CJK
    or astral pad char counts 1, q125's padding family is unit-safe on
    any text), truncation to a shorter target agrees, mixed multi-byte
    pad strings cycle identically, and ascii() returns the first CODE
    POINT (233 for 'é', 0 for '') in both. After the levenshtein find,
    no string function's unit is assumed — each is measured."""
    import duckdb as _duck

    s = spark.sql(
        "SELECT lpad('你', 3, '好') a, lpad('x', 3, '😀') b,"
        "       lpad('abc', 2, '0') c, rpad('x', 4, 'éz') d,"
        "       ascii('é') e, ascii('') f"
    ).collect()[0]
    d = _duck.connect().execute(
        "SELECT lpad('你', 3, '好'), lpad('x', 3, '😀'), lpad('abc', 2, '0'),"
        "       rpad('x', 4, 'éz'), ascii('é'), ascii('')"
    ).fetchone()
    assert tuple(s) == d == ("好好你", "😀😀x", "ab", "xézé", 233, 0)


def test_string_reverse_unit_diverges_beyond_ascii(spark):
    """String reverse, the third entry on the unit axis: Spark reverses
    CODE POINTS (astral chars survive as units — no surrogate split —
    but a combining mark detaches from its base and lands on the
    preceding character, and a ZWJ emoji sequence shatters into its
    components in reverse order) while DuckDB reverses GRAPHEME
    CLUSTERS (the composed sequence moves as one unit). Exact
    agreement on ASCII only — q09's oracle uses reverse(p_name) on
    exactly that domain. No DuckDB code-point-reversal spelling exists;
    the recipe is the domain restriction."""
    import duckdb as _duck

    combining = "aéb"            # a, e+combining acute, b
    zwj = "a\U0001F469‍\U0001F4BB"  # a + woman-technologist
    row = (
        spark.createDataFrame([(combining, zwj, "abc")], "x string, y string, z string")
        .selectExpr("reverse(x) rx", "reverse(y) ry", "reverse(z) rz")
        .collect()[0]
    )
    # code-point reversal: the combining mark now precedes 'e' (it
    # visually attaches to 'b'), the ZWJ sequence is shattered
    assert list(row.rx) == ["b", "́", "e", "a"]
    assert list(row.ry) == ["\U0001F4BB", "‍", "\U0001F469", "a"]
    assert row.rz == "cba"

    con = _duck.connect()
    d = con.execute(
        "SELECT reverse('ae' || chr(769) || 'b'),"
        "       reverse('a' || chr(128105) || chr(8205) || chr(128187)),"
        "       reverse('abc')"
    ).fetchone()
    # grapheme-cluster reversal: composed units move intact
    assert d[0] == "béa"
    assert d[1] == "\U0001F469‍\U0001F4BBa"
    assert d[2] == "cba"


def test_translate_units_agree_in_code_points(spark):
    """translate — the function q146's width-fold dedup key is BUILT on
    — maps CODE POINTS in both engines on every probed edge: an astral
    from-char replaces as one unit, a base letter under a combining
    mark replaces leaving the mark in place (identical code-point
    sequences), the delete form (to shorter than from) drops unmatched
    chars identically, and CJK maps agree. This is the measured
    agreement that makes the width-fold recipe (fullwidth -> ASCII, a
    94-char astral-free map) portable; with levenshtein and reverse
    both unit-divergent, it is measured, not assumed."""
    import duckdb as _duck

    # the combining case must be DECOMPOSED (a, e, U+0301, b) so the
    # bare base letter 'e' exists to be mapped — a precomposed é is a
    # different code point and correctly passes through untouched
    s = spark.createDataFrame(
        [("a\U0001F600b", "aéb", "abc", "你好")],
        "w string, x string, y string, z string",
    ).selectExpr(
        "translate(w, '\U0001F600', 'X') a",
        "translate(x, 'e', 'X') b",
        "translate(y, 'b', '') c",
        "translate(z, '好', '号') d",
    ).collect()[0]
    con = _duck.connect()
    d = con.execute(
        "SELECT translate('a' || chr(128512) || 'b', chr(128512), 'X'),"
        "       translate('ae' || chr(769) || 'b', 'e', 'X'),"
        "       translate('abc', 'b', ''),"
        "       translate('你好', '好', '号')"
    ).fetchone()
    assert (s.a, s.b, s.c, s.d) == d == ("aXb", "aX\u0301b", "ac", "你号")
