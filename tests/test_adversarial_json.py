"""Adversarial JSON-path gate (round 13): the dialect behind every
``get_json_object``/``json_tuple`` oracle (q47, q60) — Spark's Jackson
parser + Hive JsonPath vs DuckDB's yyjson + its JSONPath.

Every assertion is a MEASURED contract (Spark 4.1.2 / DuckDB), either an
agreement pin (an upgrade that breaks it fails here first) or a
divergence pin with the recipe an oracle author must use. The headline
finds:

- **Asymmetric leniency, both directions, and ``json_valid`` cannot
  align it.** Spark's Jackson ACCEPTS single-quoted JSON (``{'a':1}``
  extracts ``1``) that DuckDB refuses (``json_valid`` false, extract
  raises); DuckDB's yyjson ACCEPTS trailing commas (``{"a":1,}``
  extracts ``1``, ``json_valid`` TRUE) and non-standard ``NaN`` /
  ``Infinity`` literals that Spark rejects to NULL. The q60-style
  ``CASE WHEN json_valid(x) THEN json_extract_string(x, p) END`` guard
  aligns only the SYMMETRIC rejection classes (truncated docs, empty
  strings, unquoted keys); a corpus carrying single-quoted or
  trailing-comma pseudo-JSON diverges SILENTLY under it. Recipe: the
  conservative portable-strict guard below (exclude docs containing a
  single-quote char, a NaN/Infinity token, or a comma-before-closer,
  IDENTICALLY spelled on both engines), or pre-validate the corpus.
- Extraction on the strict-JSON subset agrees byte-for-byte: unicode
  escapes incl. surrogate pairs, control escapes, duplicate keys
  (FIRST wins in both), compact object re-rendering, number rendering
  (``1e2`` -> ``'100.0'`` in both), 64-bit integers and 17-digit
  doubles preserved exactly, deep nesting, whitespace docs.
- Path dialect differs in spelling and reach: dotted keys are
  ``$['a.b']`` in Spark but ``$."a.b"`` in DuckDB (same result);
  negative array indices work in DuckDB only (Spark NULL); ``[*]``
  wildcards return a compact JSON STRING in Spark but a LIST in
  DuckDB; a root extract of the document ``null`` is the STRING
  ``'null'`` in Spark but SQL NULL in DuckDB.

Cross-engine measurement here binds documents through DataFrames
(``createDataFrame`` + duckdb ``register``), never SQL literals: Spark's
single-quoted SQL literals process backslash escapes while DuckDB's are
standard-SQL verbatim, so a literal-built ``'{"x":"\\u00e9"}'`` is a
DIFFERENT document on each engine — a harness trap this file's first
draft hit, worth its own pin (test_sql_literal_escaping_is_the_trap).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

DOCS = {
    # name -> (json document bytes, path)
    "uescape": ('{"x":"\\u00e9"}', "$.x"),
    "surrogate": ('{"x":"\\ud83d\\ude42"}', "$.x"),
    "ctl_escape": ('{"x":"a\\tb\\nc"}', "$.x"),
    "dup_keys": ('{"a":1,"a":2}', "$.a"),
    "dup_obj": ('{"a":{"k":1},"a":{"k":2}}', "$.a"),
    "ws_doc": ('{ "a" :  [ 1 , 2 ] }', "$.a[1]"),
    "obj_rerender": ('{"a": {"b" : 1, "c":[1, 2]}}', "$.a"),
    "float_render": ('{"x":1.0}', "$.x"),
    "exp_render": ('{"x":1e2}', "$.x"),
    "int64_precision": ('{"x":9007199254740993}', "$.x"),
    "double_17digit": ('{"x":0.30000000000000004}', "$.x"),
    "bool": ('{"x":true}', "$.x"),
    "null_value": ('{"a":null}', "$.a"),
    "missing_key": ('{"a":1}', "$.b"),
    "arr_oob": ("[10]", "$[5]"),
    "deep": ('{"a":{"a":{"a":{"a":{"a":1}}}}}', "$.a.a.a.a.a"),
    "scalar_doc": ("42", "$"),
    "root_obj": ('{"a":1}', "$"),
    # divergent classes
    "single_quotes": ("{'a':1}", "$.a"),
    "unquoted_key": ("{a:1}", "$.a"),
    "trailing_comma": ('{"a":1,}', "$.a"),
    "nan_doc": ('{"x":NaN}', "$.x"),
    "inf_doc": ('{"x":Infinity}', "$.x"),
    "malformed": ('{"a":', "$.a"),
    "empty_doc": ("", "$.a"),
    "null_root_doc": ("null", "$"),
    "neg_idx": ("[10,20]", "$[-1]"),
}

AGREE_STRICT = {
    "uescape": "é",
    "surrogate": "🙂",
    "ctl_escape": "a\tb\nc",
    "dup_keys": "1",  # FIRST key wins in BOTH engines
    "dup_obj": '{"k":1}',
    "ws_doc": "2",
    "obj_rerender": '{"b":1,"c":[1,2]}',  # compact re-render, both
    "float_render": "1.0",
    "exp_render": "100.0",  # 1e2 normalized identically
    "int64_precision": "9007199254740993",  # no double round-trip
    "double_17digit": "0.30000000000000004",
    "bool": "true",
    "null_value": None,  # JSON null -> SQL NULL in both
    "missing_key": None,
    "arr_oob": None,
    "deep": "1",
    "scalar_doc": "42",
    "root_obj": '{"a":1}',
}


@pytest.fixture(scope="module")
def jdocs(spark):
    pdf = pd.DataFrame(
        {
            "name": list(DOCS),
            "doc": [d for d, _ in DOCS.values()],
            "path": [p for _, p in DOCS.values()],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("jdocs")
    con = duckdb.connect()
    con.register("jdocs", pdf)
    return spark, con


def _spark_extract(spark) -> dict[str, str | None]:
    return {
        r["name"]: r["v"]
        for r in spark.sql(
            "SELECT name, get_json_object(doc, path) AS v FROM jdocs"
        ).collect()
    }


def _duck_extract(con, name: str) -> str | None:
    """Raw extract (no guard) — raises on invalid docs like a real
    oracle without json_valid would."""
    return con.execute(
        "SELECT json_extract_string(doc, path) FROM jdocs WHERE name = ?",
        [name],
    ).fetchone()[0]


def _duck_guarded(con, name: str) -> str | None:
    return con.execute(
        "SELECT CASE WHEN json_valid(doc) THEN json_extract_string(doc, path) "
        "END FROM jdocs WHERE name = ?",
        [name],
    ).fetchone()[0]


def test_strict_json_subset_agrees_byte_for_byte(jdocs):
    spark, con = jdocs
    got = _spark_extract(spark)
    for name, want in AGREE_STRICT.items():
        assert got[name] == want, f"spark {name}: {got[name]!r}"
        assert _duck_extract(con, name) == want, f"duck {name}"


def test_asymmetric_leniency_and_json_valid_gap(jdocs):
    """The headline divergence: each parser is lenient where the other is
    strict, and the standard json_valid oracle guard aligns only the
    symmetric rejections."""
    spark, con = jdocs
    got = _spark_extract(spark)

    # Spark-lenient-only: Jackson parses single-quoted JSON
    assert got["single_quotes"] == "1"
    assert not con.execute(
        "SELECT json_valid(doc) FROM jdocs WHERE name='single_quotes'"
    ).fetchone()[0]
    assert _duck_guarded(con, "single_quotes") is None  # guard != Spark

    # DuckDB-lenient-only: yyjson parses trailing commas and NaN/Infinity
    # — and calls them VALID, so the guard does NOT restore alignment
    for name, duck_val in (
        ("trailing_comma", "1"),
        ("nan_doc", "NaN"),
        ("inf_doc", "Infinity"),
    ):
        assert got[name] is None, name  # Spark rejects to NULL
        assert _duck_extract(con, name) == duck_val, name
        assert con.execute(
            f"SELECT json_valid(doc) FROM jdocs WHERE name='{name}'"
        ).fetchone()[0], name
        assert _duck_guarded(con, name) == duck_val, name  # still diverges

    # Symmetric rejections — the classes json_valid DOES align: Spark
    # NULL, DuckDB raises unguarded, NULL guarded
    for name in ("unquoted_key", "malformed", "empty_doc"):
        assert got[name] is None, name
        with pytest.raises(Exception, match="Malformed JSON"):
            _duck_extract(con, name)
        assert _duck_guarded(con, name) is None, name


def test_path_dialect_spelling_and_reach(jdocs):
    """Same capability, different spelling — or one-sided capability."""
    spark, con = jdocs
    # dotted key: Spark bracket-quote vs DuckDB quoted-dot spelling
    assert (
        spark.sql(
            """SELECT get_json_object('{"a.b":1}', "$['a.b']") AS v"""
        ).collect()[0].v
        == "1"
    )
    assert (
        con.execute("""SELECT json_extract_string('{"a.b":1}', '$."a.b"')""")
        .fetchone()[0]
        == "1"
    )
    # negative array index: DuckDB-only (Spark NULL) — never use in a
    # shared oracle; index from the front or explode
    assert _spark_extract(spark)["neg_idx"] is None
    assert _duck_extract(con, "neg_idx") == "20"
    # [*] wildcard: Spark renders ONE compact JSON string, DuckDB returns
    # a LIST — avoid wildcards in shared oracles, or to_json the list
    assert (
        spark.sql(
            "SELECT get_json_object('{\"a\":[{\"b\":1},{\"b\":2}]}', "
            "'$.a[*].b') AS v"
        ).collect()[0].v
        == "[1,2]"
    )
    assert con.execute(
        "SELECT json_extract_string('{\"a\":[{\"b\":1},{\"b\":2}]}', '$.a[*].b')"
    ).fetchone()[0] == ["1", "2"]
    # root of the document 'null': Spark gives the STRING 'null', DuckDB
    # SQL NULL — don't root-extract untyped docs in shared oracles
    assert _spark_extract(spark)["null_root_doc"] == "null"
    assert _duck_extract(con, "null_root_doc") is None


# The asymmetric-leniency triggers, ONE pattern string handed to both
# engines as bound data (alternation + char class — a construct the
# regex-dialect gate pins as Java/RE2-portable). Conservative BY
# DESIGN: a doc whose string VALUES legitimately contain an apostrophe
# or a comma-before-bracket is excluded on BOTH engines equally
# (consistent recall cost, never divergence).
PORTABLE_STRICT_GUARD_PATTERN = "'|NaN|Infinity|,[ \t\n\r]*[}\\]]"


def test_portable_strict_guard_recipe(jdocs):
    """The alignment recipe for corpora that may carry pseudo-JSON: a
    doc-level regexp excluding every ASYMMETRIC-leniency trigger
    (single-quote char, NaN/Infinity token, comma-before-closer),
    the IDENTICAL pattern bytes on both engines (bound as data, so no
    SQL-literal escape dialect can skew it). For every doc that passes
    the guard, own-parser acceptance AGREES (Spark non-NULL root
    extract <=> DuckDB json_valid), so guard + json_valid gives
    byte-identical results on the survivors."""
    from pyspark.sql import functions as F

    spark, con = jdocs
    s_rows = {
        r["name"]: (r["passes"], r["root"])
        for r in spark.table("jdocs")
        .select(
            "name",
            (~F.col("doc").rlike(PORTABLE_STRICT_GUARD_PATTERN)).alias("passes"),
            F.get_json_object("doc", "$").alias("root"),
        )
        .collect()
    }
    d_rows = {
        name: (passes, valid)
        for name, passes, valid in con.execute(
            "SELECT name, NOT regexp_matches(doc, ?) AS passes, "
            "json_valid(doc) AS valid FROM jdocs",
            [PORTABLE_STRICT_GUARD_PATTERN],
        ).fetchall()
    }
    for name in DOCS:
        s_pass, s_root = s_rows[name]
        d_pass, d_valid = d_rows[name]
        assert s_pass == d_pass, f"guard itself diverges on {name}"
        if s_pass:
            # acceptance agreement on the survivors — the property the
            # asymmetric classes break without the guard. The document
            # 'null' is the one survivor where Spark's root extract
            # ('null') is non-NULL but carries no structure; exclude it
            # from the acceptance probe like the recipe docstring says.
            if name == "null_root_doc":
                continue
            assert (s_root is not None) == bool(d_valid), name
    # the guard excludes exactly the asymmetric troublemakers
    excluded = {n for n in DOCS if not s_rows[n][0]}
    assert {"single_quotes", "trailing_comma", "nan_doc", "inf_doc"} <= excluded


def test_json_tuple_shares_get_json_object_leniency(jdocs):
    """q47's json_tuple rides the same Jackson parser: single-quote
    leniency and trailing-comma rejection match get_json_object, so one
    guard recipe covers both entry points."""
    spark, _ = jdocs
    row = spark.sql(
        "SELECT json_tuple(doc, 'a') AS (v) FROM jdocs WHERE name='single_quotes'"
    ).collect()[0]
    assert row.v == "1"
    row = spark.sql(
        "SELECT json_tuple(doc, 'a') AS (v) FROM jdocs WHERE name='trailing_comma'"
    ).collect()[0]
    assert row.v is None


def test_from_json_strictness_knob_exists_but_is_partial(jdocs):
    """from_json exposes Jackson's leniency as options —
    allowSingleQuotes (default TRUE, matching get_json_object) can be
    turned OFF for a strict Spark side; but there is no knob to make
    Spark ACCEPT trailing commas, so the DuckDB-lenient direction still
    needs the doc-level guard."""
    spark, _ = jdocs
    lenient = spark.sql(
        "SELECT from_json(doc, 'a int').a AS v FROM jdocs "
        "WHERE name='single_quotes'"
    ).collect()[0].v
    assert lenient == 1
    strict = spark.sql(
        "SELECT from_json(doc, 'a int', map('allowSingleQuotes','false')).a "
        "AS v FROM jdocs WHERE name='single_quotes'"
    ).collect()[0].v
    assert strict is None
    trailing = spark.sql(
        "SELECT from_json(doc, 'a int').a AS v FROM jdocs "
        "WHERE name='trailing_comma'"
    ).collect()[0].v
    assert trailing is None  # no leniency knob in this direction


def test_sql_literal_escaping_is_the_trap(jdocs):
    """The harness pin: Spark's single-quoted SQL literals process
    backslash escapes, DuckDB's are standard-SQL verbatim — the SAME
    literal text denotes DIFFERENT strings, which fakes an unescaping
    divergence that does not exist (extraction of a real '\\u00e9'
    escape agrees, asserted in the strict-subset test). Any cross-engine
    JSON comparison must bind documents as DATA, not SQL literals."""
    spark, con = jdocs
    bs_u = chr(92) + "u00e9"  # the six characters \ u 0 0 e 9
    sql = "SELECT '" + bs_u + "' AS v"
    assert spark.sql(sql).collect()[0].v == "é"  # Spark unescapes \uXXXX
    assert con.execute(sql).fetchone()[0] == bs_u  # DuckDB verbatim
