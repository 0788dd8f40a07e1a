"""Adversarial complex-type gate (round 11, fourth relational-core edge
family after floats, temporals, strings): ARRAY/MAP/STRUCT values as
keys and in comparisons — measured cross-engine (Spark 4.1.2 / DuckDB)
and pinned.

The headline finds:

- ARRAY EQUALITY with NULL elements diverges: Spark's `=` treats NULL
  elements as equal-to-each-other (array(1,NULL) = array(1,NULL) is
  TRUE), DuckDB follows three-valued logic (NULL) — so a WHERE a = b
  filter KEEPS the row in Spark and DROPS it in DuckDB: silent-wrong
  class. The alignment recipe: DuckDB `IS NOT DISTINCT FROM` has
  exactly Spark's `=` semantics on arrays (measured both directions).
  As GROUP BY keys the engines AGREE ([NULL]-arrays merge) — grouping
  uses null-safe key equality everywhere, comparison does not.
- MAP keys: the engines diverge AND Spark disagrees with itself.
  Spark GROUP BY normalizes insertion order (map('a',1,'b',2) and
  map('b',2,'a',1) form ONE group) while DuckDB is order-sensitive
  (TWO groups, and = across insertion orders is FALSE). Inside Spark:
  SELECT DISTINCT on a map is REFUSED
  (UNSUPPORTED_FEATURE.SET_OPERATION_ON_MAP_TYPE), map = map is REFUSED
  (INVALID_ORDERING_TYPE), yet COUNT(DISTINCT m) is ACCEPTED and
  returns 2 on the data GROUP BY calls one group — a measured internal
  inconsistency (binary distinct-buffer comparison vs normalized
  grouping). Pinned exactly so an upstream fix is noticed; the engine
  recipe is: never COUNT(DISTINCT) a map — canonicalize
  (array_sort(map_entries(m))) or two-step GROUP BY, which is what the
  registered map-handling queries do.

Agreement pins keeping the rest honest: array grouping (duplicates
merge, [] and NULL are distinct keys), lexicographic array ordering
(prefix < longer), struct keys with NULL fields, and explode/unnest of
empty/NULL arrays yielding zero rows.

Reference surface: SURVEY §2 Tier B lateral views/HOFs and the map/
bitwise function family (`queries/relational.py` q49, q133-q134).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

ARRAY_ROWS = "(1,[1,2]),(2,[1,2]),(3,[]),(4,NULL),(5,[NULL]),(6,[NULL]),(7,[1,NULL])"


def test_array_group_keys_cross_engine(spark):
    """GROUP BY on an array column: duplicate arrays merge, arrays whose
    only difference is a NULL element still merge (null-safe key
    equality), and [] vs NULL stay DISTINCT keys — identically in both
    engines."""
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [1, 2]), (3, []), (4, None), (5, [None]), (6, [None]),
         (7, [1, None])],
        "id int, a array<int>",
    )
    got = {
        (tuple(r.a) if r.a is not None else None): r.n
        for r in df.groupBy("a").agg(F.count("*").alias("n")).collect()
    }
    assert got == {(1, 2): 2, (): 1, None: 1, (None,): 2, (1, None): 1}

    con = duckdb.connect()
    duck = {
        (tuple(a) if a is not None else None): n
        for a, n in con.execute(
            f"SELECT a, count(*) FROM (VALUES {ARRAY_ROWS}) t(id, a) GROUP BY a"
        ).fetchall()
    }
    assert duck == got


def test_array_equality_null_element_diverges(spark):
    """Spark = on arrays treats NULL elements as mutually equal (TRUE);
    DuckDB propagates NULL — a WHERE a = b filter diverges silently.
    DuckDB IS NOT DISTINCT FROM is the alignment recipe: it matches
    Spark's = on every probed shape."""
    con = duckdb.connect()
    assert spark.sql(
        "SELECT array(1, NULL) = array(1, NULL) AS v"
    ).collect()[0].v is True
    assert con.execute("SELECT [1, NULL] = [1, NULL]").fetchone()[0] is None

    # the WHERE consequence: Spark keeps the row, DuckDB drops it
    assert spark.sql(
        "SELECT count(*) AS n FROM (SELECT array(1, NULL) a, array(1, NULL) b) "
        "WHERE a = b"
    ).collect()[0].n == 1
    assert con.execute(
        "SELECT count(*) FROM (SELECT [1, NULL] a, [1, NULL] b) WHERE a = b"
    ).fetchone()[0] == 0

    # alignment recipe, both directions
    assert con.execute(
        "SELECT [1, NULL] IS NOT DISTINCT FROM [1, NULL]"
    ).fetchone()[0] is True
    assert con.execute(
        "SELECT [1] IS NOT DISTINCT FROM [1, NULL]"
    ).fetchone()[0] is False
    assert spark.sql("SELECT array(1) = array(1, NULL) AS v").collect()[0].v is False
    assert spark.sql("SELECT array() = array() AS v").collect()[0].v is True
    assert con.execute("SELECT [] = []").fetchone()[0] is True


def test_array_lexicographic_ordering_agrees(spark):
    con = duckdb.connect()
    for s_expr, d_expr, want in [
        ("array(1,2) < array(1,3)", "[1,2] < [1,3]", True),
        ("array(1) < array(1,0)", "[1] < [1,0]", True),  # prefix sorts first
        ("array(2) > array(1,9)", "[2] > [1,9]", True),  # element-first order
    ]:
        assert spark.sql(f"SELECT {s_expr} AS v").collect()[0].v is want, s_expr
        assert con.execute(f"SELECT {d_expr}").fetchone()[0] is want, d_expr


def test_map_key_semantics_diverge_and_spark_self_inconsistency(spark):
    """The full measured map contract. Cross-engine: Spark GROUP BY
    normalizes map insertion order (ONE group), DuckDB is
    order-sensitive (TWO groups; = across orders is FALSE). Inside
    Spark: DISTINCT and = on maps are refused, COUNT(DISTINCT m) is
    accepted but counts 2 where GROUP BY forms one group — binary
    distinct-buffer comparison disagreeing with normalized grouping.
    Pinned exactly; recipe: canonicalize with array_sort(map_entries())
    before any key use, never COUNT(DISTINCT) a raw map.

    Upstream-reportable (minimal repro + expected-vs-actual in
    docs/VERIFICATION.md 'Spark internal inconsistency'): on Spark 4.1.2
    the same two-row relation gives GROUP BY m -> ONE group but
    count(DISTINCT m) -> 2 — two answers to 'how many distinct maps'.
    The BEHAVIOR is pinned unconditionally below — an upgrade that fixes
    (or widens) the contradiction fails those asserts loudly, on any
    version — and the failure message carries the measured version so
    the re-measurer knows what changed (round-12 ADVICE: the earlier
    hard __version__ == '4.1.2' pin also broke unrelated CI on every
    trivial patch bump, which the behavior pin does not)."""
    import pyspark

    _ctx = (
        f"Spark {pyspark.__version__} (contradiction measured on 4.1.2): "
        "re-measure the map-distinct inconsistency and update "
        "docs/VERIFICATION.md + docs/UPSTREAM_SPARK_MAP_DISTINCT.md"
    )
    base = "SELECT map('a',1,'b',2) m UNION ALL SELECT map('b',2,'a',1) m"
    n_groups = spark.sql(
        f"SELECT count(*) FROM (SELECT m, count(*) FROM ({base}) t GROUP BY m)"
    ).collect()[0][0]
    assert n_groups == 1, _ctx  # insertion-order-normalized grouping
    assert spark.sql(
        f"SELECT count(DISTINCT m) AS v FROM ({base}) t"
    ).collect()[0].v == 2, _ctx  # the internal inconsistency, pinned
    with pytest.raises(Exception, match="SET_OPERATION_ON_MAP_TYPE"):
        spark.sql(f"SELECT DISTINCT m FROM ({base}) t").collect()
    with pytest.raises(Exception, match="INVALID_ORDERING_TYPE"):
        spark.sql("SELECT map('a',1) = map('a',1) AS v").collect()

    con = duckdb.connect()
    dvals = "(MAP(['a','b'],[1,2])),(MAP(['b','a'],[2,1]))"
    assert con.execute(
        f"SELECT count(*) FROM (SELECT m FROM (VALUES {dvals}) t(m) GROUP BY m)"
    ).fetchone()[0] == 2  # order-sensitive grouping
    assert con.execute(
        "SELECT MAP(['a','b'],[1,2]) = MAP(['b','a'],[2,1])"
    ).fetchone()[0] is False
    assert con.execute(
        f"SELECT count(DISTINCT m) FROM (VALUES {dvals}) t(m)"
    ).fetchone()[0] == 2

    # the canonicalization recipe agrees cross-engine: sorted entry
    # lists collapse both insertion orders to ONE key in BOTH engines
    s_canon = spark.sql(
        "SELECT count(*) FROM (SELECT k, count(*) FROM (SELECT "
        f"array_sort(map_entries(m)) AS k FROM ({base}) t) GROUP BY k)"
    ).collect()[0][0]
    d_canon = con.execute(
        "SELECT count(*) FROM (SELECT k, count(*) FROM (SELECT "
        f"list_sort(map_entries(m)) AS k FROM (VALUES {dvals}) t(m)) GROUP BY k)"
    ).fetchone()[0]
    assert s_canon == d_canon == 1


def test_no_registry_query_count_distincts_a_map():
    """No registered query may depend on the COUNT(DISTINCT map)
    inconsistency pinned above. Enforced as a closed whitelist: every
    distinct-count argument in the package — SQL oracles and
    F.countDistinct calls alike — must be one of the known SCALAR
    columns. Adding a new distinct-count lands here for review; a map
    argument can never slip in silently."""
    import glob
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "hdfs_hive_sql_playground_spark",
    )
    args = set()
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        src = open(path).read()
        args.update(
            a.strip() for a in re.findall(r"(?i)COUNT\(DISTINCT\s+([^)]+)\)", src)
        )
        args.update(re.findall(r"countDistinct\(\"([^\"]+)\"\)", src))
    # drop prose hits (docstrings talk ABOUT the pattern)
    args = {a for a in args if re.fullmatch(r"[A-Za-z_][A-Za-z_.0-9]*", a)}
    scalar_whitelist = {
        "user_id", "gram", "doc_id", "o_orderstatus", "o_custkey",
        "o_orderkey", "o.o_orderkey", "g.gram",
    }
    assert args <= scalar_whitelist, (
        f"new distinct-count argument(s) {sorted(args - scalar_whitelist)}: "
        "verify none is map-typed (COUNT(DISTINCT map) is internally "
        "inconsistent on Spark 4.1.2, see the pin above), then extend "
        "the whitelist"
    )


def test_struct_null_field_keys_and_empty_explode_agree(spark):
    """Struct keys with a NULL field stay distinct from the non-NULL
    variant in both engines; exploding/unnesting an empty or NULL array
    yields zero rows in both — the lateral-view family's base case."""
    n_s = spark.createDataFrame([(1,), (2,)], "id int").selectExpr(
        "named_struct('x', CASE WHEN id = 1 THEN 1 END, 'y', 2) AS s"
    ).distinct().count()
    con = duckdb.connect()
    n_d = con.execute(
        "SELECT count(DISTINCT s) FROM (VALUES ({'x': 1, 'y': 2}), "
        "({'x': NULL, 'y': 2})) t(s)"
    ).fetchone()[0]
    assert n_s == n_d == 2

    assert spark.sql("SELECT explode(array())").count() == 0
    assert spark.sql("SELECT explode(cast(NULL AS array<int>))").count() == 0
    assert con.execute("SELECT unnest([])").fetchall() == []
    assert con.execute("SELECT unnest(NULL::int[])").fetchall() == []


def test_array_sort_null_placement(spark):
    """NULL placement in array sorts, round-12 addition. Spark's own two
    functions disagree with each other: array_sort() puts NULLs LAST in
    ascending order while sort_array(..., true) puts them FIRST (and
    both put them last descending). DuckDB's list_sort defaults to
    NULLS LAST both directions — so array_sort <-> list_sort agree
    as-is (pinned), while a sort_array-ascending oracle needs an
    explicit 'NULLS FIRST' third argument in DuckDB. Same lesson as the
    dow-numbering pin: never let a default near an oracle compare."""
    s = spark.sql(
        "SELECT array_sort(array(3,NULL,1)) AS a,"
        "       sort_array(array(3,NULL,1), true) AS b,"
        "       sort_array(array(3,NULL,1), false) AS c"
    ).collect()[0]
    assert s.a == [1, 3, None]      # array_sort: NULLS LAST
    assert s.b == [None, 1, 3]      # sort_array asc: NULLS FIRST
    assert s.c == [3, 1, None]      # sort_array desc: NULLS LAST
    con = duckdb.connect()
    d = con.execute(
        "SELECT list_sort([3,NULL,1]), list_sort([3,NULL,1], 'DESC'),"
        "       list_sort([3,NULL,1], 'ASC', 'NULLS FIRST')"
    ).fetchone()
    assert d[0] == [1, 3, None]     # default matches Spark array_sort
    assert d[1] == [3, 1, None]     # matches sort_array desc
    assert d[2] == [None, 1, 3]     # the sort_array-asc recipe


def test_map_construction_duplicate_and_null_key_postures(spark):
    """Map CONSTRUCTION postures, round-13 addition (measured while
    building the HOF gate). Duplicate keys in a single constructor are
    LOUD in both engines — Spark map()/map_from_entries raise
    DUPLICATED_MAP_KEY (default mapKeyDedupPolicy=EXCEPTION), DuckDB
    MAP()/map_from_entries raise Invalid Input — and NULL keys are loud
    in both too. The one SILENT split is merging: Spark map_concat on
    overlapping keys RAISES where DuckDB map_concat silently LAST-WINS
    ({'a': 2}); and under Spark's LAST_WIN opt-in the split flips ends —
    map_concat now agrees with DuckDB but Spark's map('a',1,'a',2)
    constructor goes silent last-win where DuckDB's MAP still raises.
    No alignment config exists that is loud/silent-consistent across
    both constructors and merges, so the recipe is structural: never
    map_concat overlapping keyspaces in an oracle-paired query (none
    does — q134's maps use disjoint literal keys), and keep the engine
    on the default EXCEPTION policy so a 100 TB corpus with colliding
    keys fails the job instead of silently dropping values. Spark-only
    pins: a transform_keys lambda that COLLAPSES keys raises rather
    than silently merging; map_zip_with unions keys with NULL fill (the
    coalesce recipe sums overlaps exactly)."""
    with pytest.raises(Exception, match="DUPLICATED_MAP_KEY"):
        spark.sql("SELECT map('a', 1, 'a', 2)").collect()
    with pytest.raises(Exception, match="DUPLICATED_MAP_KEY"):
        spark.sql(
            "SELECT map_from_entries(array(struct('a', 1), struct('a', 2)))"
        ).collect()
    with pytest.raises(Exception, match="NULL_MAP_KEY"):
        spark.sql("SELECT map(CAST(NULL AS STRING), 1)").collect()
    with pytest.raises(Exception, match="DUPLICATED_MAP_KEY"):
        spark.sql("SELECT map_concat(map('a', 1), map('a', 2))").collect()
    with pytest.raises(Exception, match="DUPLICATED_MAP_KEY"):
        spark.sql(
            "SELECT transform_keys(map('a', 1, 'b', 2), (k, v) -> 'x')"
        ).collect()
    assert spark.sql(
        "SELECT map_zip_with(map('a', 1), map('a', 10, 'b', 20),"
        " (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0)) AS v"
    ).collect()[0].v == {"a": 11, "b": 20}

    con = duckdb.connect()
    with pytest.raises(duckdb.InvalidInputException, match="unique"):
        con.execute("SELECT MAP(['a', 'a'], [1, 2])")
    with pytest.raises(duckdb.InvalidInputException, match="unique"):
        con.execute("SELECT map_from_entries([('a', 1), ('a', 2)])")
    with pytest.raises(duckdb.InvalidInputException, match="NULL"):
        con.execute("SELECT MAP([NULL], [1])")
    # the silent end of the split: DuckDB merge last-wins, no error
    got = con.execute(
        "SELECT map_concat(MAP(['a'], [1]), MAP(['a'], [2]))"
    ).fetchone()[0]
    assert got == {"key": ["a"], "value": [2]}  # ! silent last-win

    # Spark's LAST_WIN opt-in aligns the merge but silences the
    # constructor — measured, then restored (the engine default is
    # EXCEPTION and the registered queries depend on it staying loud)
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    try:
        r = spark.sql(
            "SELECT map_concat(map('a', 1), map('a', 2)) AS c,"
            "       map('a', 1, 'a', 2) AS m"
        ).collect()[0]
        assert r.c == {"a": 2} and r.m == {"a": 2}
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")

    # structural recipe lint: no registry oracle merges maps at all
    from hdfs_hive_sql_playground_spark.queries import all_queries

    for name, spec in all_queries().items():
        assert "map_concat" not in (spec.oracle or ""), name
