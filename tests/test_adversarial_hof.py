"""Cross-engine adversarial gate: higher-order-function (lambda) semantics.

Round-13 family: the HOF surface every array-shaped oracle silently
stands on. The shipping recipes pair Spark ``transform/filter/exists/
forall/aggregate/zip_with`` with DuckDB ``list_transform/list_filter/
list_sum`` spellings (q133 `queries/relational.py:1682-1691`, the ANN
dot product `queries/similarity.py:81` vs its oracle
`queries/similarity.py:176`, the q136 rewrite's index lambda
`queries/dedup.py:1114`, q134's map HOFs `queries/relational.py:1740`).
Measured on Spark 4.1.2 (ANSI ON) vs DuckDB 1.0.0, same discipline as
the other gates: silent divergences pinned with alignment recipes,
agreements pinned so upgrades fail loudly.

Measured divergence summary:
- Index lambdas: Spark's two-arg ``(x, i) ->`` lambda is 0-BASED;
  DuckDB's is 1-BASED — the bracket-base split (indexing gate) leaks
  into lambda land, and a mirrored predicate silently selects the
  NEIGHBORING element. Recipe: spell ``i - 1`` on the DuckDB side
  (or ``i + 1`` on Spark's); q136's oracle avoids index lambdas
  entirely (it recomputes removals relationally).
- exists/forall are THREE-valued in Spark (NULL when no witness
  decides and some element is NULL); the oracle spelling
  ``len(list_filter(..)) > 0`` / ``= 0`` is TWO-valued (a NULL
  predicate row just drops). On a NULL-bearing array the pair silently
  flips NULL<->false (exists) / NULL<->true (forall). Recipes:
  ``coalesce(exists(..), false)`` / ``coalesce(forall(..), true)``
  align Spark to the 2VL oracle; the 3VL-faithful DuckDB spelling is a
  CASE that re-checks for NULL elements. q133's domain (split() output,
  never-NULL elements) keeps the shipping pair exact.
- Folds: Spark ``aggregate(arr, 0.0, (s,v) -> s+v)`` NULL-POISONS
  (one NULL element nulls the whole sum) and returns the INIT on an
  empty array; DuckDB ``list_sum`` SKIPS NULLs (SQL SUM semantics) and
  is NULL on an empty list; ``list_reduce`` RAISES on empty input and
  takes no init in 1.0.0. The shipping dot-product pair is exact only
  on its guaranteed domain (fixed EMB_DIM, non-null doubles); off the
  domain a short vector is NULL in Spark but a PARTIAL SUM in DuckDB
  (bracket-OOB -> NULL product -> skipped by list_sum).
Agreements pinned: lambda bodies pass NULL elements through
identically (transform keeps them, filter/map_filter drop a NULL
predicate); NULL array -> NULL result; zip_with pads the shorter side
with NULL exactly like list_zip / bracket-OOB; empty-array
exists=false / forall=true; both engines sum doubles strictly
left-to-right (the 1e16 cancellation probe agrees bit-for-bit);
Spark's ``reduce`` is a true alias of ``aggregate``. Spark's
array_sort comparator lambda has no DuckDB counterpart (list_sort
binds no lambda) AND silently no-ops when the comparator returns NULL
(a NULL-blind CASE comparator leaves the array unsorted) — oracle-
paired queries use natural-order sorts only. array_max/min <->
list_aggregate('max'/'min') agree on every NULL/empty edge (they SKIP
null elements, unlike the + fold). A 200-pair randomized sweep over
shared parquet bytes (hostile magnitude regimes: 1e+/-16 spreads,
denormals, exact cancellations, negative zeros) proves the shipping
dot-product pair bit-identical beyond the fixture's distribution.
Plus a dialect lint: no oracle may use the implicit (1-based) two-arg
index lambda — the explicit range(1, len+1) spelling names its base.
"""

from __future__ import annotations

import duckdb
import pytest


def _s1(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def _d1(con, expr):
    return con.execute(f"SELECT {expr}").fetchone()[0]


def test_lambda_null_element_passthrough_agrees(spark):
    """transform keeps NULL elements, a NULL array maps to NULL, and a
    NULL predicate row is DROPPED by filter — identically in both
    engines, in both the scalar and map-entry spellings (q134's
    map_filter serialization stands on the drop)."""
    assert _s1(spark, "transform(array(1, NULL, 3), x -> x + 1)") == [2, None, 4]
    assert _s1(spark, "transform(CAST(NULL AS array<int>), x -> x + 1)") is None
    assert _s1(spark, "filter(array(1, NULL, 3), x -> x > 0)") == [1, 3]
    assert _s1(
        spark, "map_filter(map('a', 1, 'b', CAST(NULL AS INT)), (k, v) -> v > 0)"
    ) == {"a": 1}

    con = duckdb.connect()
    assert _d1(con, "list_transform([1, NULL, 3], x -> x + 1)") == [2, None, 4]
    assert _d1(con, "list_transform(NULL::INT[], x -> x + 1)") is None
    assert _d1(con, "list_filter([1, NULL, 3], x -> x > 0)") == [1, 3]
    got = _d1(
        con,
        "map_from_entries(list_filter(map_entries(MAP(['a','b'], [1, NULL])),"
        " e -> e.value > 0))",
    )
    # duckdb's Python layer renders MAP as a dict of key/value lists
    assert got == {"key": ["a"], "value": [1]}


def test_index_lambda_base_diverges_with_alignment_recipe(spark):
    """Spark's (x, i) lambda index is 0-based, DuckDB's is 1-based: the
    SAME predicate `i = 1` selects element #2 in Spark and element #1
    in DuckDB. Alignment recipe: spell `i - 1` on the DuckDB side.
    q136 (`queries/dedup.py:1114`) relies on the Spark 0-base to match
    posexplode's 0-based `pos`; its oracle never uses an index lambda."""
    assert _s1(spark, "filter(array(10, 20, 30), (x, i) -> i = 1)") == [20]
    assert _s1(spark, "transform(array(10, 20, 30), (x, i) -> i)") == [0, 1, 2]

    con = duckdb.connect()
    assert _d1(con, "list_filter([10, 20, 30], (x, i) -> i = 1)") == [10]  # !
    assert _d1(con, "list_transform([10, 20, 30], (x, i) -> i)") == [1, 2, 3]
    # the alignment recipe restores agreement
    assert _d1(con, "list_filter([10, 20, 30], (x, i) -> i - 1 = 1)") == [20]
    assert _d1(con, "list_transform([10, 20, 30], (x, i) -> i - 1)") == [0, 1, 2]


def test_exists_forall_ternary_vs_filter_count_recipe(spark):
    """Spark exists/forall follow SQL three-valued logic: when no
    element decides and some predicate row is NULL, the answer is NULL.
    The q133 oracle spelling (len(list_filter) > 0 / = 0) is two-valued
    — the NULL row drops, so the same array answers false/true. The
    pair agrees exactly on never-NULL elements (q133's split() domain)
    and on the empty array; coalesce() aligns the nullable case."""
    # Spark 3VL: NULL when undecided-with-a-NULL, decided answers win
    assert _s1(spark, "exists(array(NULL, 1), x -> x > 5)") is None
    assert _s1(spark, "exists(array(NULL, 10), x -> x > 5)") is True
    assert _s1(spark, "exists(array(), x -> x > 5)") is False
    assert _s1(spark, "forall(array(NULL, 10), x -> x > 5)") is None
    assert _s1(spark, "forall(array(NULL, 1), x -> x > 5)") is False
    assert _s1(spark, "forall(array(), x -> x > 5)") is True

    con = duckdb.connect()
    # the oracle's 2VL spelling: NULL rows drop, answers are never NULL
    assert _d1(con, "len(list_filter([NULL, 1], x -> x > 5)) > 0") is False  # !
    assert _d1(con, "len(list_filter([NULL, 10], x -> NOT (x > 5))) = 0") is True  # !
    assert _d1(con, "len(list_filter([]::INT[], x -> x > 5)) > 0") is False
    assert _d1(con, "len(list_filter([]::INT[], x -> NOT (x > 5))) = 0") is True

    # alignment recipes: Spark -> 2VL via coalesce (exists defaults
    # false, forall defaults true) ...
    assert _s1(spark, "coalesce(exists(array(NULL, 1), x -> x > 5), false)") is False
    assert _s1(spark, "coalesce(forall(array(NULL, 10), x -> x > 5), true)") is True
    # ... or DuckDB -> 3VL via an explicit NULL-element re-check
    assert (
        _d1(
            con,
            "CASE WHEN len(list_filter([NULL, 1], x -> x > 5)) > 0 THEN true"
            "     WHEN len(list_filter([NULL, 1], x -> x IS NULL)) > 0 THEN NULL"
            "     ELSE false END",
        )
        is None
    )


def test_fold_null_poisoning_vs_list_sum_skipping_diverges(spark):
    """Spark's aggregate fold with `s + v` NULL-poisons — one NULL
    element nulls the entire sum — while DuckDB's list_sum SKIPS NULLs
    like the SUM aggregate. Silent value split on any nullable array.
    Recipes: coalesce the ELEMENT on the Spark side (null-skip
    semantics), or CASE-guard + coalesce on the DuckDB side
    (null-poison semantics)."""
    poison = "aggregate(array(1.0D, NULL, 3.0D), 0.0D, (s, v) -> s + v)"
    assert _s1(spark, poison) is None  # !

    con = duckdb.connect()
    assert _d1(con, "list_sum([1.0, NULL, 3.0]::DOUBLE[])") == 4.0  # !

    # null-skip alignment: coalesce the element in Spark == coalesced
    # list_sum in DuckDB (all-NULL list: 0.0 on both)
    skip_s = "aggregate(array(1.0D, NULL, 3.0D), 0.0D, (s, v) -> s + coalesce(v, 0.0D))"
    assert _s1(spark, skip_s) == 4.0
    assert _d1(con, "coalesce(list_sum([1.0, NULL, 3.0]::DOUBLE[]), 0.0)") == 4.0
    assert (
        _d1(con, "coalesce(list_sum([NULL, NULL]::DOUBLE[]), 0.0)")
        == _s1(
            spark,
            "aggregate(array(CAST(NULL AS DOUBLE), NULL), 0.0D,"
            " (s, v) -> s + coalesce(v, 0.0D))",
        )
        == 0.0
    )
    # null-poison alignment: explicit NULL-element guard in DuckDB
    assert (
        _d1(
            con,
            "CASE WHEN len(list_filter([1.0, NULL, 3.0]::DOUBLE[],"
            " x -> x IS NULL)) > 0 THEN NULL"
            " ELSE coalesce(list_sum([1.0, NULL, 3.0]::DOUBLE[]), 0.0) END",
        )
        is None
    )
    # Spark's `reduce` is a true alias of `aggregate`
    assert _s1(spark, "reduce(array(1.0D, 2.0D), 0.0D, (s, v) -> s + v)") == 3.0


def test_fold_empty_array_init_vs_reduce_raise_vs_sum_null(spark):
    """Empty input splits three ways: Spark aggregate returns the INIT
    value, DuckDB list_sum returns NULL, DuckDB list_reduce RAISES
    (and binds no init argument in 1.0.0). The oracle recipe is
    coalesce(list_sum(..), <init>) — never list_reduce — which q84-q97's
    dot products satisfy vacuously (EMB_DIM-wide, never empty)."""
    assert _s1(
        spark, "aggregate(CAST(array() AS array<double>), 0.0D, (s, v) -> s + v)"
    ) == 0.0
    con = duckdb.connect()
    assert _d1(con, "list_sum([]::DOUBLE[])") is None  # !
    with pytest.raises(duckdb.Error, match="empty input list"):
        con.execute("SELECT list_reduce([]::DOUBLE[], (a, b) -> a + b)")
    with pytest.raises(duckdb.Error):
        con.execute("SELECT list_reduce([1.0, 2.0]::DOUBLE[], (a, b) -> a + b, 10.0)")
    assert _d1(con, "coalesce(list_sum([]::DOUBLE[]), 0.0)") == 0.0


def test_dot_product_pair_exact_on_domain_diverges_off_it(spark):
    """The shipping ANN dot product (`queries/similarity.py:81` fold vs
    the `:176` range-indexed list_sum oracle) is exact on its
    guaranteed domain — equal-length, non-null double vectors — because
    BOTH engines sum strictly left-to-right (the 1e16 cancellation
    probe agrees bit-for-bit, no pairwise/Kahan reassociation). Off the
    domain it splits silently: zip_with pads the short side with NULL,
    the NULL product poisons Spark's fold to NULL, while the oracle's
    bracket-OOB NULL products are SKIPPED by list_sum — a PARTIAL dot
    product. The embeddings fixture (fixed EMB_DIM, non-null) plus the
    q89 int8 path's explicit casts keep every registered query on the
    exact domain."""
    con = duckdb.connect()
    a_s, b_s = "array(1.0D, 2.0D, 3.0D)", "array(4.0D, 5.0D, 6.0D)"
    a_d, b_d = "[1.0, 2.0, 3.0]::DOUBLE[]", "[4.0, 5.0, 6.0]::DOUBLE[]"
    fold = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (s, v) -> s + v)"
    )
    oracle = "list_sum(list_transform(range(1, len({a}) + 1), i -> ({a})[i] * ({b})[i]))"
    assert _s1(spark, fold.format(a=a_s, b=b_s)) == 32.0
    assert _d1(con, oracle.format(a=a_d, b=b_d)) == 32.0

    # summation ORDER agrees: left-to-right loses the +1.0s to rounding
    probe_s = "array(1.0D, 1e16D, 1.0D, -1e16D)"
    probe_d = "[1.0, 1e16, 1.0, -1e16]::DOUBLE[]"
    assert (
        _s1(spark, f"aggregate({probe_s}, 0.0D, (s, v) -> s + v)")
        == _d1(con, f"list_sum({probe_d})")
        == (1.0 + 1e16 + 1.0 - 1e16)  # = 0.0 left-to-right, 2.0 exact
        == 0.0
    )

    # off-domain: a short b-vector is NULL in Spark, a partial sum in
    # DuckDB — the padding semantics agree (NULL), the FOLDS differ
    assert _s1(
        spark, "zip_with(array(1, 2, 3), array(9), (x, y) -> x + y)"
    ) == [10, None, None]
    # duckdb's Python layer renders the zip structs as tuples
    assert _d1(con, "list_zip([1, 2, 3], [9])") == [(1, 9), (2, None), (3, None)]
    b_short = "[4.0]::DOUBLE[]"
    assert _s1(
        spark,
        "aggregate(zip_with(array(1.0D, 2.0D, 3.0D), array(4.0D), (x, y) -> x * y),"
        " 0.0D, (s, v) -> s + v)",
    ) is None  # !
    assert _d1(con, oracle.format(a=a_d, b=b_short)) == 4.0  # ! partial


def test_array_sort_comparator_spark_only_and_null_blind_footgun(spark):
    """Spark's array_sort accepts a comparator lambda; DuckDB's
    list_sort binds no lambda at all (documented-won't in oracle pairs:
    natural-order sorts only, null placement pinned in the complex
    gate). The Spark-only path has its own trap: a comparator built
    from plain comparisons returns NULL on NULL operands, and a NULL
    comparator verdict is treated as 'no decision' — the array comes
    back UNSORTED, silently."""
    got = _s1(
        spark,
        "array_sort(array(3, NULL, 1), (a, b) ->"
        " CASE WHEN a < b THEN -1 WHEN a > b THEN 1 ELSE 0 END)",
    )
    assert got == [3, None, 1]  # ! unsorted passthrough, no error
    # the same data under the natural-order sort behaves (nulls last)
    assert _s1(spark, "array_sort(array(3, NULL, 1))") == [1, 3, None]

    con = duckdb.connect()
    with pytest.raises(duckdb.BinderException, match="lambda"):
        con.execute("SELECT list_sort([3, 1], (a, b) -> 1)")


def test_no_oracle_uses_implicit_index_lambda():
    """Dialect lint, enforcing the index-base pin forever: no registry
    oracle may use DuckDB's two-arg index lambda `(x, i) ->`, whose `i`
    is 1-BASED where the mirrored Spark lambda's is 0-based — the one
    HOF spelling whose silent off-by-one this gate measured. The
    aligned house spelling is an explicit `list_transform(range(1,
    len(a) + 1), i -> a[i] ...)`, which names its base in the code
    (every current use: `queries/similarity.py:176,576`,
    `queries/relational.py:1657`, `queries/text.py:683,1324`)."""
    import re

    from hdfs_hive_sql_playground_spark.queries import all_queries

    # a lambda arrow whose parameter list has >1 name: `(x, i) ->`
    implicit = re.compile(r"\(\s*\w+\s*,\s*\w+\s*\)\s*->")
    for name, spec in all_queries().items():
        if not spec.oracle:
            continue
        code = "\n".join(l.split("--", 1)[0] for l in spec.oracle.splitlines())
        for m in implicit.finditer(code):
            # in DuckDB's list functions a second lambda parameter ALWAYS
            # binds the 1-based element index — there is no two-arg
            # struct-pair form (map-entry logic is spelled single-arg
            # over map_entries, as q134's oracle does) — so every match
            # here is the indexing form and unconditionally flagged
            raise AssertionError(
                f"{name} oracle uses a two-arg (1-based index) lambda at: "
                f"...{code[m.start():m.end() + 60]}... — spell the index "
                "with an explicit range(1, len(..) + 1) instead"
            )


def test_array_min_max_edges_agree(spark):
    """q133's max_word pairing (Spark array_max <-> DuckDB
    list_aggregate('max')): both engines SKIP NULL elements (unlike the
    + fold above), return NULL on an empty array, and propagate a NULL
    array — agreement pinned on every edge, min dual included."""
    s = spark.sql(
        "SELECT array_max(array('a', NULL)) AS a,"
        "       array_max(CAST(array() AS array<string>)) AS b,"
        "       array_max(CAST(NULL AS array<string>)) AS c,"
        "       array_min(array('a', NULL)) AS d"
    ).collect()[0]
    assert (s.a, s.b, s.c, s.d) == ("a", None, None, "a")
    con = duckdb.connect()
    d = con.execute(
        "SELECT list_aggregate(['a', NULL], 'max'),"
        "       list_aggregate([]::VARCHAR[], 'max'),"
        "       list_aggregate(NULL::VARCHAR[], 'max'),"
        "       list_aggregate(['a', NULL], 'min')"
    ).fetchone()
    assert d == ("a", None, None, "a")


def test_dot_product_pair_bit_agrees_on_random_vector_sweep(
    spark, tmp_path_factory
):
    """Randomized underwrite of the ANN oracle family's exactness claim
    (same discipline as the corpus gate's random-unicode sweeps): 200
    random double-vector pairs over HOSTILE magnitude regimes — mixed
    1e±16 spreads that round away small addends (summation-order
    sensitive), denormal-scale components, negative zeros, exact
    cancellations — written ONCE as parquet and read by both engines,
    so the compare is over identical stored bits, not two literal
    parsers. The Spark fold (`similarity.py:81`) and the DuckDB
    range-indexed list_sum oracle (`similarity.py:176`) must agree
    BIT-FOR-BIT on every pair: any reassociation, compensation, or
    NULL-handling difference in either engine's fold surfaces as a
    payload mismatch here long before a fixture could expose it."""
    import random
    import struct

    rng = random.Random(13)
    dim = 16

    def vec(regime):
        if regime == 0:  # plain
            return [rng.uniform(-1, 1) for _ in range(dim)]
        if regime == 1:  # magnitude spread: big terms swallow small ones
            return [
                rng.choice([1.0, -1.0]) * (10.0 ** rng.randint(-16, 16))
                for _ in range(dim)
            ]
        if regime == 2:  # denormal-scale components
            return [rng.uniform(-1, 1) * 5e-324 * rng.randint(1, 1 << 30)
                    for _ in range(dim)]
        # exact-cancellation pairs + negative zeros
        half = [rng.uniform(-1e8, 1e8) for _ in range(dim // 2)]
        v = half + [-h for h in half]
        v[rng.randrange(dim)] = -0.0
        return v

    rows = [
        (i, vec(i % 4), vec((i + 1) % 4)) for i in range(200)
    ]
    p = str(tmp_path_factory.mktemp("hofdot") / "vecs.parquet")
    spark.createDataFrame(
        rows, "id int, a array<double>, b array<double>"
    ).coalesce(1).write.parquet(p)

    s_rows = spark.sql(
        "SELECT id, aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D,"
        " (s, v) -> s + v) AS dot"
        f" FROM parquet.`{p}` ORDER BY id"
    ).collect()
    con = duckdb.connect()
    d_rows = con.execute(
        "SELECT id, list_sum(list_transform(range(1, len(a) + 1),"
        " i -> a[i] * b[i]))::DOUBLE AS dot"
        f" FROM read_parquet('{p}/*.parquet') ORDER BY id"
    ).fetchall()
    assert len(s_rows) == len(d_rows) == 200
    mism = []
    for srow, (did, ddot) in zip(s_rows, d_rows):
        assert srow.id == did
        sb = struct.pack("<d", srow.dot)
        db = struct.pack("<d", ddot)
        if sb != db:
            mism.append((srow.id, srow.dot, ddot))
    assert not mism, f"{len(mism)} bit mismatches, first: {mism[:3]}"


def test_array_serialization_empty_vs_null_diverges(spark):
    """The serialization layer every array-valued oracle compares
    through (Spark array_join <-> DuckDB array_to_string): NULL
    ELEMENTS are skipped identically — the agreement the q133/q134
    string-hash compares stand on — but an EMPTY or all-NULL array
    serializes to '' in Spark and NULL in DuckDB, a silent
    value-vs-NULL flip. Recipe: COALESCE(array_to_string(..), '') on
    any possibly-empty column — exactly what q133's primary_colors
    (the one intersect column that CAN be empty) already spells; every
    other registry site is domain-guarded (split() output is [''] on
    an empty string, never [], in BOTH engines — also pinned here).
    Spark's 3-arg null-replacement form has no DuckDB counterpart."""
    s = spark.sql(
        "SELECT array_join(array('a', NULL, 'b'), ',') AS a,"
        "       array_join(CAST(array() AS array<string>), ',') AS b,"
        "       array_join(array(CAST(NULL AS STRING), NULL), ',') AS c,"
        "       array_join(CAST(NULL AS array<string>), ',') AS d,"
        "       array_join(array('a', NULL), ',', '?') AS e,"
        "       split('', ' ') AS f"
    ).collect()[0]
    assert (s.a, s.b, s.c, s.d, s.e) == ("a,b", "", "", None, "a,?")
    assert s.f == [""]  # split of empty string: [''], never []

    con = duckdb.connect()
    d = con.execute(
        "SELECT array_to_string(['a', NULL, 'b'], ','),"
        "       array_to_string([]::VARCHAR[], ','),"
        "       array_to_string([NULL, NULL]::VARCHAR[], ','),"
        "       array_to_string(NULL::VARCHAR[], ','),"
        "       coalesce(array_to_string([]::VARCHAR[], ','), ''),"
        "       string_split('', ' ')"
    ).fetchone()
    assert d[0] == "a,b"            # null elements skip: agreement
    assert d[1] is None             # ! empty -> NULL (Spark: '')
    assert d[2] is None             # ! all-NULL -> NULL (Spark: '')
    assert d[3] is None
    assert d[4] == ""               # the coalesce recipe
    assert d[5] == [""]


def test_oracle_function_vocabulary_is_audited():
    """Meta-lint institutionalizing the adversarial program: every
    function name appearing in ANY registry oracle must be on the
    audited list below — the vocabulary the cross-engine gates have
    measured (or whose agreement a fixture-green query pins). Adding
    new oracle vocabulary fails this test until the name is added HERE,
    which is the reviewer's cue to ask: is its cross-engine contract
    (NULL posture, unit semantics, accept set, rounding mode) measured
    by a gate, domain-guarded, or silently assumed? The round-13 unit
    axis (levenshtein bytes, reverse graphemes) shows 'same name, same
    fixture answer' is not evidence of 'same function'."""
    import re

    from hdfs_hive_sql_playground_spark.queries import all_queries

    audited = {
        # aggregates / windows
        "count", "sum", "min", "max", "avg", "string_agg", "list",
        "bit_and", "bit_or", "bit_xor", "bool_and", "bool_or",
        "quantile_cont", "row_number", "rank", "dense_rank", "ntile",
        "percent_rank", "cume_dist", "lag", "lead", "first_value",
        "last_value", "nth_value", "grouping", "rollup", "cube", "sets",
        # math
        "abs", "ceil", "floor", "round", "sqrt", "ln", "pow", "xor",
        "bit_count", "greatest", "least", "nullif",
        # strings (unit axis mapped round 13)
        "length", "len", "lower", "upper", "trim", "substr", "strpos",
        "concat", "concat_ws", "replace", "repeat", "reverse", "lpad",
        "rpad", "ascii", "ord", "translate", "levenshtein", "format",
        "string_split", "string_split_regex", "str_split", "split_part",
        # regex (dialect gate)
        "regexp_extract", "regexp_extract_all", "regexp_matches",
        "regexp_replace",
        # hashes
        "md5", "sha256",
        # temporal (temporal gate)
        "date_diff", "date_trunc", "dayofweek", "extract", "epoch_us",
        "year", "month",
        # lists / maps (HOF + complex gates)
        "array_to_string", "flatten", "list_aggregate", "list_contains",
        "list_distinct", "list_filter", "list_intersect", "list_max",
        "list_min", "list_reverse", "list_sort", "list_sum",
        "list_transform", "unnest",
        # json (json gate)
        "json_extract_string", "json_valid",
        # casts / misc
        "cast", "try_cast", "decimal", "coalesce", "nfc_normalize",
        "read_csv",
    }
    # SQL keywords / aliases / table functions that look like calls
    not_functions = {
        "values", "over", "filter", "select", "exists", "case", "when",
        "then", "else", "end", "and", "or", "not", "from", "where",
        "group", "order", "by", "row", "rows", "range", "interval",
        "partition", "on", "in", "as", "using", "join", "int", "integer",
        "bigint", "varchar", "double", "boolean", "date", "timestamp",
        # one-letter/local aliases used as `alias(...)` in FROM clauses
        "t", "d", "b", "w", "u", "v", "lex", "probes", "seeds", "reach",
        "walk",
    }
    unknown = set()
    for name, spec in all_queries().items():
        if not spec.oracle:
            continue
        code = "\n".join(
            l.split("--", 1)[0] for l in spec.oracle.splitlines()
        )
        for m in re.finditer(r"\b([a-z_][a-z0-9_]*)\s*\(", code.lower()):
            tok = m.group(1)
            if tok not in audited and tok not in not_functions:
                unknown.add((name, tok))
    assert not unknown, (
        f"unaudited oracle vocabulary (measure its cross-engine contract "
        f"and add it to the audited list): {sorted(unknown)[:10]}"
    )
