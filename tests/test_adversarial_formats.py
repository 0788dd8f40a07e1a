"""Adversarial formats gate (round 10): pathological inputs for the
file-format surface (SURVEY §2 Tier B 'File formats'; reference
pass-through `playground.py:738-750`) — malformed CSV (unterminated
quotes, embedded delimiters/newlines, wrong arity), corrupt JSON records
(PERMISSIVE `_corrupt_record` vs DROPMALFORMED vs FAILFAST), and
schema-evolution reads (added AND dropped columns across parquet/ORC
batches in one table).

Like the round-8/9 adversarial gates, every test either finds a real bug
or PINS the exact recovery contract so a later Spark/DuckDB upgrade that
changes it fails loudly. Where both engines can read the same bytes the
pin is cross-engine (DuckDB `ignore_errors`); where recovery semantics
genuinely diverge (documented inline) the pin is Spark-only.

The operational headline for 100 TB ingest: ONE unterminated quote under
multiLine=true swallows every subsequent row of the file into a single
corrupt record — silently, in PERMISSIVE mode. The pin
(test_csv_multiline_unterminated_quote_swallows_file_tail) is why the
repo's CSV readers default to multiLine=false line-split recovery unless
a column genuinely contains newlines.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

CSV_SCHEMA = "id int, name string, val int, _corrupt string"
CSV_TEXT = (
    "id|name|val\n"
    "1|alice|10\n"
    '2|bo"b|20\n'  # stray quote mid-unquoted-field
    '3|"embedded|delim"|30\n'  # quoted embedded delimiter
    '4|"multi\nline"|40\n'  # quoted embedded newline
    "5|toofew\n"  # wrong arity: 2 tokens
    "6|extra|50|surplus\n"  # wrong arity: 4 tokens
    '7|"unterminated|60\n'  # quote never closed
    "8|ok|80\n"
)

JSON_SCHEMA = "id int, name string, val int, _corrupt string"
JSON_TEXT = (
    '{"id": 1, "name": "alice", "val": 10}\n'
    '{"id": 2, "name": "bob", "val": }\n'  # syntax error
    "not json at all\n"
    '{"id": 3, "name": "carol"}\n'  # missing field
    '{"id": "x4", "name": "dave", "val": 40}\n'  # type mismatch on id
    '{"id": 5, "name": "eve", "val": 50, "extra": true}\n'  # extra field
    "\n"  # blank line
    '{"id": 6, "name": "frank", "val": 60}\n'
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("advformats") / "bad.csv"
    p.write_text(CSV_TEXT)
    return str(p)


@pytest.fixture(scope="module")
def json_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("advformats") / "bad.json"
    p.write_text(JSON_TEXT)
    return str(p)


def _read_csv(spark, path, mode, multiline):
    return (
        spark.read.schema(CSV_SCHEMA)
        .option("sep", "|")
        .option("header", True)
        .option("mode", mode)
        .option("multiLine", multiline)
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


# --- CSV -------------------------------------------------------------------


def test_csv_permissive_linesplit_recovery(spark, csv_path):
    """PERMISSIVE + multiLine=false: recovery is per-LINE. Good rows parse
    exactly; each bad line becomes one row with _corrupt carrying the raw
    text (so a quarantine sink can replay it); arity-wrong rows still
    yield their parseable prefix."""
    rows = {r["id"]: r for r in _read_csv(spark, csv_path, "PERMISSIVE", False).collect()}
    good = {i for i, r in rows.items() if r["_corrupt"] is None}
    assert good == {1, 2, 3, 8}
    assert rows[2]["name"] == 'bo"b'  # stray quote kept literally
    assert rows[3]["name"] == "embedded|delim"  # quoted delimiter kept
    # arity too few: trailing columns null-filled, row still flagged
    assert rows[5]["name"] == "toofew" and rows[5]["val"] is None
    assert rows[5]["_corrupt"] == "5|toofew"
    # arity too many: prefix parsed, surplus flagged
    assert rows[6]["val"] == 50 and rows[6]["_corrupt"] == "6|extra|50|surplus"
    # the embedded-newline row splits into TWO corrupt half-rows — the
    # price of line-split mode; use multiLine=true when a column really
    # contains newlines (next test pins that trade-off's other edge)
    corrupt_raw = {
        r["_corrupt"]
        for r in rows.values()
        if r["_corrupt"] is not None
    }
    assert '4|"multi' in corrupt_raw and 'line"|40' in corrupt_raw
    assert '7|"unterminated|60' in corrupt_raw
    assert len(corrupt_raw) == 5


def test_csv_multiline_unterminated_quote_swallows_file_tail(spark, csv_path):
    """PERMISSIVE + multiLine=true parses the quoted-newline row correctly
    — but ONE unterminated quote then swallows every later row of the
    file into a single corrupt record. Pinned because it is the silent
    data-loss mode of multiLine CSV at 100 TB: row 8 is well-formed and
    simply vanishes from the good set."""
    rows = _read_csv(spark, csv_path, "PERMISSIVE", True).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id[4]["name"] == "multi\nline" and by_id[4]["val"] == 40
    assert 8 not in by_id  # swallowed
    (tail,) = [r for r in rows if r["id"] == 7]
    assert "8|ok|80" in tail["_corrupt"]  # the whole file tail, one record


def test_csv_dropmalformed_and_failfast(spark, csv_path):
    survivors = {
        r["id"] for r in _read_csv(spark, csv_path, "DROPMALFORMED", False).collect()
    }
    assert survivors == {1, 2, 3, 8}
    survivors_ml = {
        r["id"] for r in _read_csv(spark, csv_path, "DROPMALFORMED", True).collect()
    }
    assert survivors_ml == {1, 2, 3, 4}
    with pytest.raises(Exception, match="MALFORMED"):
        (
            spark.read.schema("id int, name string, val int")
            .option("sep", "|")
            .option("header", True)
            .option("mode", "FAILFAST")
            .csv(csv_path)
            .collect()
        )


def test_csv_cross_engine_agreed_subset(spark, csv_path):
    """Both engines' recovery modes agree on the strictly-well-formed
    single-line rows {1,2,3}: identical values. Divergence beyond that is
    real and documented: DuckDB ignore_errors drops BOTH the quoted-
    newline row (4) and the post-unterminated-quote tail (8), while Spark
    line-split DROPMALFORMED recovers 8 — so only the intersection is
    hash-comparable."""
    spark_rows = {
        r["id"]: (r["name"], r["val"])
        for r in _read_csv(spark, csv_path, "DROPMALFORMED", False).collect()
    }
    duck = duckdb.connect()
    duck_rows = {
        i: (n, v)
        for i, n, v in duck.execute(
            "SELECT id, name, val FROM read_csv(?, delim='|', header=true, "
            "columns={'id':'INT','name':'VARCHAR','val':'INT'}, "
            "ignore_errors=true)",
            [csv_path],
        ).fetchall()
    }
    assert set(duck_rows) == {1, 2, 3}
    for i in (1, 2, 3):
        assert spark_rows[i] == duck_rows[i]


# --- JSON ------------------------------------------------------------------


def test_json_permissive_corrupt_record_contract(spark, json_path):
    """PERMISSIVE JSON: syntax errors and type mismatches populate
    _corrupt_record (type mismatch still yields the fields that DID
    parse); a missing field is NOT corrupt (plain null); extra fields are
    ignored; blank lines are skipped entirely."""
    rows = (
        spark.read.schema(JSON_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(json_path)
        .collect()
    )
    assert len(rows) == 7  # 8 lines - 1 blank
    corrupt = [r for r in rows if r["_corrupt"] is not None]
    assert len(corrupt) == 3
    # partial parse on type mismatch: id failed, name/val survived
    (mismatch,) = [r for r in corrupt if r["name"] == "dave"]
    assert mismatch["id"] is None and mismatch["val"] == 40
    # missing field is null, not corrupt
    (carol,) = [r for r in rows if r["name"] == "carol"]
    assert carol["val"] is None and carol["_corrupt"] is None
    # extra field ignored
    (eve,) = [r for r in rows if r["name"] == "eve"]
    assert eve["val"] == 50 and eve["_corrupt"] is None


def test_json_dropmalformed_failfast_and_cross_engine(spark, json_path):
    """DROPMALFORMED keeps exactly the fully-parseable records; the same
    set falls out of DuckDB read_json(ignore_errors=true) restricted to
    rows whose id parsed (DuckDB keeps all-null placeholder rows for
    corrupt lines instead of dropping them — divergence documented here,
    values compared on the agreed subset). FAILFAST raises on the first
    corrupt record."""
    spark_rows = {
        r["id"]: (r["name"], r["val"])
        for r in (
            spark.read.schema("id int, name string, val int")
            .option("mode", "DROPMALFORMED")
            .json(json_path)
            .collect()
        )
    }
    assert set(spark_rows) == {1, 3, 5, 6}
    duck = duckdb.connect()
    duck_rows = {
        i: (n, v)
        for i, n, v in duck.execute(
            "SELECT id, name, val FROM read_json(?, "
            "format='newline_delimited', ignore_errors=true, "
            "columns={'id':'INT','name':'VARCHAR','val':'INT'}) "
            "WHERE id IS NOT NULL",
            [json_path],
        ).fetchall()
    }
    assert duck_rows == spark_rows
    with pytest.raises(Exception, match="MALFORMED|FAILED_READ_FILE"):
        (
            spark.read.schema("id int, name string, val int")
            .option("mode", "FAILFAST")
            .json(json_path)
            .collect()
        )


# --- schema evolution ------------------------------------------------------


def test_parquet_schema_evolution_added_and_dropped_cross_engine(spark, tmp_path):
    """One logical table, three parquet batches written over time: batch 2
    DROPS a column, batch 3 ADDS one. mergeSchema must union the footers
    and null-fill both directions — cross-checked value-for-value against
    DuckDB read_parquet(union_by_name=true)."""
    base = str(tmp_path / "evo")
    spark.range(0, 5).selectExpr("id", "id * 2 AS v1", "id * 3 AS v2").write.parquet(
        f"{base}/b=1"
    )
    spark.range(5, 10).selectExpr("id", "id * 2 AS v1").write.parquet(f"{base}/b=2")
    spark.range(10, 15).selectExpr(
        "id", "id * 2 AS v1", "id * 7 AS v3"
    ).write.parquet(f"{base}/b=3")

    df = spark.read.option("mergeSchema", True).parquet(base)
    assert set(df.columns) == {"id", "v1", "v2", "v3", "b"}
    got = df.groupBy("b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v1").alias("s1"),
        F.sum("v2").alias("s2"),
        F.sum("v3").alias("s3"),
        F.count("v2").alias("nn2"),
        F.count("v3").alias("nn3"),
    )
    spark_rows = {r["b"]: tuple(r)[1:] for r in got.collect()}

    duck = duckdb.connect()
    duck_rows = {
        b: rest
        for b, *rest in (
            duck.execute(
                "SELECT CAST(regexp_extract(filename, 'b=(\\d+)', 1) AS INT) AS b, "
                "COUNT(*), SUM(v1), SUM(v2), SUM(v3), COUNT(v2), COUNT(v3) "
                "FROM read_parquet(?, union_by_name=true, filename=true) "
                "GROUP BY 1",
                [f"{base}/*/*.parquet"],
            ).fetchall()
        )
    }
    assert set(spark_rows) == {1, 2, 3}
    for b in (1, 2, 3):
        assert tuple(spark_rows[b]) == tuple(duck_rows[b]), b
    # dropped column null-fills forward, added column null-fills backward
    assert spark_rows[2][4] == 0 and spark_rows[2][1] is not None
    assert spark_rows[1][5] == 0 and spark_rows[3][5] == 5


def test_orc_schema_evolution_merge(spark, tmp_path):
    """Same evolution on ORC (DuckDB can't read ORC — Spark-only pin):
    spark.sql.orc.mergeSchema=true unions footers exactly like parquet."""
    base = str(tmp_path / "evo_orc")
    spark.range(0, 5).selectExpr("id", "id * 2 AS v1", "id * 3 AS v2").write.orc(
        f"{base}/b=1"
    )
    spark.range(5, 10).selectExpr("id", "id * 2 AS v1", "id * 7 AS v3").write.orc(
        f"{base}/b=2"
    )
    df = spark.read.option("mergeSchema", True).orc(base)
    assert set(df.columns) == {"id", "v1", "v2", "v3", "b"}
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v2").alias("s2"),
        F.sum("v3").alias("s3"),
        F.count("v2").alias("nn2"),
        F.count("v3").alias("nn3"),
    ).collect()[0]
    assert tuple(agg) == (10, sum(i * 3 for i in range(5)), sum(i * 7 for i in range(5, 10)), 5, 5)


def test_parquet_corrupt_file_contract(spark, tmp_path):
    """Corrupt parquet members of a multi-file table (truncated footer,
    zero-byte file — the 100 TB reality of interrupted writers): the
    default contract FAILS the read loudly (FAILED_READ_FILE, no silent
    row loss); `spark.sql.files.ignoreCorruptFiles=true` is the explicit
    opt-in that skips corrupt members and returns the intact files'
    rows. Pinned so an upgrade flipping either default fails here."""
    import glob
    import shutil

    base = str(tmp_path / "corrupt_pq")
    spark.range(0, 100).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(base)
    (intact,) = glob.glob(f"{base}/part-*.parquet")
    data = open(intact, "rb").read()
    with open(f"{base}/part-zzz-truncated.parquet", "wb") as fh:
        fh.write(data[: len(data) // 3])
    open(f"{base}/part-zzz2-empty.parquet", "wb").close()

    with pytest.raises(Exception, match="FAILED_READ_FILE|Could not read footer"):
        spark.read.parquet(base).count()

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", True)
    try:
        assert spark.read.parquet(base).count() == 100
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", False)


# --- quarantine-split readers ------------------------------------------------


def test_csv_quarantine_split_partitions_the_input(spark, csv_path):
    """read_csv_quarantined: clean ∪ quarantine covers every physical
    record exactly once; clean rows carry no corrupt column; quarantine
    rows carry the raw line for replay."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
    )

    clean, quar = read_csv_quarantined(
        spark, csv_path, "id int, name string, val int", sep="|", header=True
    )
    assert "_corrupt_record" not in clean.columns
    assert {r["id"] for r in clean.collect()} == {1, 2, 3, 8}
    quar_rows = quar.collect()
    raws = {r["_corrupt_record"] for r in quar_rows}
    assert raws == {
        '4|"multi',
        'line"|40',
        "5|toofew",
        "6|extra|50|surplus",
        '7|"unterminated|60',
    }
    # replayability: the parseable prefix rides along (id 5/6 kept theirs)
    by_raw = {r["_corrupt_record"]: r for r in quar_rows}
    assert by_raw["5|toofew"]["id"] == 5
    assert by_raw["6|extra|50|surplus"]["val"] == 50
    # clean ∪ quarantine covers every physical record exactly once
    # (8 data lines + 1 extra from the embedded-newline split); the
    # clean side's count() is CORRECT (the helper's parse-forcing filter)
    assert clean.count() == 4
    assert clean.count() + len(quar_rows) == 9
    # ...and the upstream trap it guards against, pinned: a bare
    # DROPMALFORMED count() skips row conversion and silently counts
    # malformed rows too
    bare = (
        spark.read.schema("id int, name string, val int")
        .option("sep", "|")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(csv_path)
    )
    assert bare.count() == 9  # silently wrong: true clean count is 4
    assert len(bare.collect()) == 4
    # ...and the quarantine side counts correctly too (its parse-forcing
    # filter keeps the scan off the corrupt-column-only shape)
    assert quar.count() == 5
    # Spark's corrupt-column guard, pinned on the BARE idiom the helper
    # neutralizes: an aggregation whose scan would reference ONLY the
    # corrupt column raises rather than return wrong answers (PERMISSIVE
    # can't populate it without parsing data columns). Column pruning
    # strips even an explicit data-column select down to the corrupt
    # column, so the select idiom raises as well.
    bare_quar = (
        spark.read.schema("id int, name string, val int, _corrupt_record string")
        .option("sep", "|")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(csv_path)
        .filter("_corrupt_record IS NOT NULL")
    )
    with pytest.raises(Exception, match="QUERY_ONLY_CORRUPT_RECORD_COLUMN"):
        bare_quar.count()
    with pytest.raises(Exception, match="QUERY_ONLY_CORRUPT_RECORD_COLUMN"):
        bare_quar.select("id", "_corrupt_record").count()


def test_json_quarantine_split(spark, json_path):
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_json_quarantined,
    )

    clean, quar = read_json_quarantined(
        spark, json_path, "id int, name string, val int"
    )
    # missing field is CLEAN-side null; type mismatch is quarantined with
    # its partial parse
    assert {(r["id"], r["name"]) for r in clean.collect()} == {
        (1, "alice"),
        (3, "carol"),
        (5, "eve"),
        (6, "frank"),
    }
    quar_rows = {r["_corrupt_record"]: r for r in quar.collect()}
    assert len(quar_rows) == 3
    (mismatch,) = [r for r in quar_rows.values() if r["name"] == "dave"]
    assert mismatch["id"] is None and mismatch["val"] == 40


def test_quarantine_split_is_single_scan_no_shuffle(spark, csv_path):
    """Plan contract: each side of the split is a scan + filter — no
    Exchange, no join, no second source."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
    )

    clean, quar = read_csv_quarantined(
        spark, csv_path, "id int, name string, val int", sep="|", header=True
    )
    for df in (clean, quar):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Join" not in plan, plan


def test_csv_quarantine_split_streaming_dual_matches_batch(spark, csv_path, tmp_path):
    """stream_csv_quarantined drains a directory (one file per micro-batch)
    to the same exact record partition as the batch split: clean ∪
    quarantine covers every physical record of every file exactly once,
    with identical values on both sides of both duals — the tailing-ingest
    contract for a continuously-written landing directory."""
    import shutil

    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
        stream_csv_quarantined,
    )

    src = str(tmp_path / "landing")
    (tmp_path / "landing").mkdir()
    shutil.copy(csv_path, f"{src}/a.csv")
    with open(f"{src}/b.csv", "w") as fh:
        fh.write("id|name|val\n9|late|90\n10|bad|ninety\n")  # good + type-corrupt

    schema = "id int, name string, val int"
    n_batches = {}
    for sdf, name in zip(
        stream_csv_quarantined(
            spark, src, schema, sep="|", header=True,
            options={"maxFilesPerTrigger": 1},
        ),
        ("qsplit_clean", "qsplit_quar"),
    ):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_batches[name] = len(q.recentProgress)

    # maxFilesPerTrigger=1 really produced one micro-batch per file
    assert n_batches["qsplit_clean"] >= 2 and n_batches["qsplit_quar"] >= 2

    # Multiset (Counter) compare, not set: a double-delivered record must
    # FAIL this gate — a set compare would silently collapse duplicates
    # and pass despite breaking the exactly-once contract.
    from collections import Counter

    bclean, bquar = read_csv_quarantined(spark, src, schema, sep="|", header=True)
    got_clean = Counter(tuple(r) for r in spark.table("qsplit_clean").collect())
    want_clean = Counter(tuple(r) for r in bclean.collect())
    assert got_clean == want_clean
    assert {r[0] for r in got_clean} == {1, 2, 3, 8, 9}
    got_quar = Counter(tuple(r) for r in spark.table("qsplit_quar").collect())
    want_quar = Counter(tuple(r) for r in bquar.collect())
    assert got_quar == want_quar
    # the b.csv type-corrupt row kept its parseable prefix for replay
    assert ("10|bad|ninety") in {r[-1] for r in got_quar}
    # exactly-once across the pair: every physical data line of both
    # files lands on exactly one side (9 lines in a.csv incl. the
    # newline-split extra, 2 in b.csv)
    assert sum(got_clean.values()) + sum(got_quar.values()) == 11


def test_json_quarantine_split_streaming_dual_matches_batch(spark, json_path, tmp_path):
    """Same exactly-once pair contract for the JSON-lines streaming dual."""
    import shutil

    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_json_quarantined,
        stream_json_quarantined,
    )

    src = str(tmp_path / "landing_json")
    (tmp_path / "landing_json").mkdir()
    shutil.copy(json_path, f"{src}/a.json")

    schema = "id int, name string, val int"
    for sdf, name in zip(
        stream_json_quarantined(spark, src, schema),
        ("jsplit_clean", "jsplit_quar"),
    ):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Counter, not set: double delivery must fail (same rationale as the
    # CSV dual above).
    from collections import Counter

    bclean, bquar = read_json_quarantined(spark, src, schema)
    assert Counter(tuple(r) for r in spark.table("jsplit_clean").collect()) == Counter(
        tuple(r) for r in bclean.collect()
    )
    assert Counter(tuple(r) for r in spark.table("jsplit_quar").collect()) == Counter(
        tuple(r) for r in bquar.collect()
    )


def test_csv_quarantine_split_exact_on_randomized_corruption(spark, tmp_path):
    """Seeded-random split-exactness: 200 lines mixing clean rows with
    every corruption mode the gate pins (wrong arity both directions,
    non-numeric tokens in INT columns, unterminated quotes) — clean ∪
    quarantine must cover every physical line exactly
    once, the two parsers' survivor sets must be identical (the split's
    defining invariant), and the clean side must carry exactly the rows
    a pure-Python reference parser accepts."""
    import random

    rng = random.Random(0xC0FFEE)
    lines, want_clean = [], set()
    for i in range(200):
        mode = rng.randrange(8)
        name = f"n{rng.randrange(1000):03d}"
        val = rng.randrange(10_000)
        if mode <= 3:  # clean
            lines.append(f"{i}|{name}|{val}")
            want_clean.add((i, name, val))
        elif mode == 4:  # arity too few
            lines.append(f"{i}|{name}")
        elif mode == 5:  # arity too many
            lines.append(f"{i}|{name}|{val}|surplus{i}")
        elif mode == 6:  # type corruption in an INT column
            lines.append(f"{i}|{name}|x{val}")
        else:  # unterminated quote
            lines.append(f'{i}|"{name}|{val}')
    path = str(tmp_path / "rand.csv")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
    )

    clean, quar = read_csv_quarantined(
        spark, path, "id int, name string, val int", sep="|"
    )
    got_clean = {(r.id, r.name, r.val) for r in clean.collect()}
    quar_rows = quar.collect()
    assert got_clean == want_clean
    assert len(got_clean) + len(quar_rows) == len(lines)
    # every quarantined raw line is one of the injected corrupt lines,
    # byte-identical (replayability)
    corrupt_lines = set(lines) - {f"{i}|{n}|{v}" for i, n, v in want_clean}
    assert {r["_corrupt_record"] for r in quar_rows} == corrupt_lines

    # replay composition on the random quarantine: a val-as-string fix
    # explains EXACTLY the type-corruption rows (mode 6); everything
    # else (arity, quotes) stays raw for the next fix
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        replay_csv_quarantine,
    )

    fixed, still = replay_csv_quarantine(
        quar, "id int, name string, val string", sep="|"
    )
    want_fixed = {
        tuple(ln.split("|")) for ln in corrupt_lines
        if len(ln.split("|")) == 3 and ln.split("|")[2].startswith("x")
    }
    assert {(str(r.id), r.name, r.val) for r in fixed.collect()} == want_fixed
    assert {r["_corrupt_record"] for r in still.collect()} == corrupt_lines - {
        "|".join(t) for t in want_fixed
    }


def test_csv_quarantine_replay_under_corrected_schema(spark, csv_path):
    """replay_csv_quarantine closes the loop: after a schema fix, the
    stranded raw records that the fix explains rejoin the table (with
    exactly the new schema's columns), the rest stay quarantined AS RAW
    — so replay composes with itself across successive fixes."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
        replay_csv_quarantine,
    )

    _clean, quar = read_csv_quarantined(
        spark, csv_path, "id int, name string, val int", sep="|", header=True
    )
    # fix: the 4th column was real all along
    fixed, still = replay_csv_quarantine(
        quar, "id int, name string, val int, extra string", sep="|"
    )
    assert fixed.columns == ["id", "name", "val", "extra"]
    assert [tuple(r) for r in fixed.collect()] == [(6, "extra", 50, "surplus")]
    still_raws = {r["_corrupt_record"] for r in still.collect()}
    assert still_raws == {
        '4|"multi',
        'line"|40',
        "5|toofew",
        '7|"unterminated|60',
    }
    # second fix on the remainder: nothing else is explained by a wider
    # schema — replay of still-bad raws is a clean no-op, not a crash
    fixed2, still2 = replay_csv_quarantine(
        still, "id int, name string, val int, extra string", sep="|"
    )
    assert fixed2.count() == 0
    assert {r["_corrupt_record"] for r in still2.collect()} == still_raws


def test_json_quarantine_replay_under_corrected_schema(spark, json_path):
    """JSON replay: a type fix (id was really a string) recovers exactly
    the type-mismatched record; syntax errors stay quarantined."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_json_quarantined,
        replay_json_quarantine,
    )

    _clean, quar = read_json_quarantined(
        spark, json_path, "id int, name string, val int"
    )
    fixed, still = replay_json_quarantine(quar, "id string, name string, val int")
    assert [tuple(r) for r in fixed.collect()] == [("x4", "dave", 40)]
    assert fixed.columns == ["id", "name", "val"]
    # the two syntax errors are unexplainable by any schema: still raw
    assert still.count() == 2


def test_parquet_stream_schema_locked_across_file_evolution(spark, tmp_path):
    """Schema evolution under a file STREAM: unlike batch mergeSchema,
    a streaming query's schema is DECLARED once and locked — the pin is
    that evolution in either direction degrades gracefully against the
    declared schema, never corrupts: a file missing a declared column
    null-fills it; a file carrying an extra column has it pruned; rows
    from every vintage keep their values. This is the contract an
    evolving landing zone needs before the declared schema catches up
    (at which point replay/backfill reads the old files with
    mergeSchema — previous test)."""
    import os

    src = str(tmp_path / "evo_stream")
    os.makedirs(src)
    spark.range(0, 3).selectExpr("id", "id * 2 AS v1").write.parquet(f"{src}/f1")
    spark.range(3, 6).selectExpr("id", "id * 2 AS v1", "id * 3 AS v2").write.parquet(
        f"{src}/f2"
    )
    spark.range(6, 9).selectExpr(
        "id", "id * 2 AS v1", "id * 3 AS v2", "id * 7 AS v3"
    ).write.parquet(f"{src}/f3")

    q = (
        spark.readStream.schema("id bigint, v1 bigint, v2 bigint")
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{src}/*")
        .writeStream.format("memory")
        .queryName("evo_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.id: (r.v1, r.v2) for r in spark.table("evo_stream_sink").collect()}
    assert set(rows) == set(range(9))
    for i in range(9):
        want_v2 = i * 3 if i >= 3 else None  # pre-evolution files null-fill
        assert rows[i] == (i * 2, want_v2), i


def test_from_csv_matches_datasource_csv_grammar(spark, tmp_path):
    """Grammar-equality pin the replay operators rely on: from_csv (the
    replay path) and the CSV datasource (the ingest path) must agree
    line-for-line — same accept/reject decision, same parsed values,
    same corrupt-record payload — on seeded-random lines mixing quote
    chars, embedded separators, backslashes, unicode, and numeric noise.
    If a Spark upgrade ever forks the two parsers, replay's 'clean here
    iff the fixed reader accepts it' contract breaks, and this fails."""
    import random

    rng = random.Random(0xBADC0DE)
    pool = list("abcXYZ0123456789") + ['"', "'", "\\", "|", " ", ",", "汉", "🙂"]
    lines = []
    for i in range(300):
        body = "".join(rng.choice(pool) for _ in range(rng.randrange(1, 18)))
        lines.append(f"{i}|{body}|{rng.choice(['7', 'x7', '', ' 7 '])}")
    path = str(tmp_path / "grammar.csv")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    schema = "id int, a string, b int"
    full = schema + ", _corrupt_record string"
    ds = (
        spark.read.schema(full)
        .option("sep", "|")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    fc = (
        spark.read.text(path)
        .select(
            F.from_csv(
                "value",
                full,
                {
                    "sep": "|",
                    "mode": "PERMISSIVE",
                    "columnNameOfCorruptRecord": "_corrupt_record",
                },
            ).alias("p")
        )
        .select("p.*")
    )
    ds_rows = sorted((tuple(r) for r in ds.collect()), key=repr)
    fc_rows = sorted((tuple(r) for r in fc.collect()), key=repr)
    assert len(ds_rows) == len(fc_rows) == 300
    assert ds_rows == fc_rows


def test_from_json_matches_datasource_json_grammar(spark, tmp_path):
    """JSON twin of the grammar-equality pin (replay_json_quarantine's
    soundness assumption): from_json and the JSON datasource must agree
    record-for-record on seeded-random lines mixing valid records, type
    mismatches, truncated/garbage syntax, unicode values, and extra
    fields. (Blank lines excluded: the datasource skips them while
    from_json sees an empty string — a documented reader-level, not
    grammar-level, difference.)"""
    import random

    rng = random.Random(0x5EED)
    lines = []
    for i in range(300):
        kind = rng.randrange(6)
        val = rng.randrange(100)
        if kind <= 2:
            lines.append('{"id": %d, "a": "s%d", "b": %d}' % (i, val, val))
        elif kind == 3:  # type mismatch on b
            lines.append('{"id": %d, "a": "s%d", "b": "x%d"}' % (i, val, val))
        elif kind == 4:  # syntax: truncated
            lines.append('{"id": %d, "a": "s%d", "b":' % (i, val))
        else:  # unicode value + extra field
            lines.append('{"id": %d, "a": "汉🙂%d", "b": %d, "extra": true}' % (i, val, val))
    path = str(tmp_path / "grammar.json")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    full = "id int, a string, b int, _corrupt_record string"
    ds = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    fj = (
        spark.read.text(path)
        .select(
            F.from_json(
                "value",
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
            ).alias("p")
        )
        .select("p.*")
    )
    ds_rows = sorted((tuple(r) for r in ds.collect()), key=repr)
    fj_rows = sorted((tuple(r) for r in fj.collect()), key=repr)
    assert len(ds_rows) == len(fj_rows) == 300
    assert ds_rows == fj_rows


def test_quarantine_rejects_corrupt_column_in_data_schema(spark, csv_path):
    """A data schema that declares _corrupt_record itself would collide
    with the managed corrupt column inside the split builder (duplicate
    schema field on the PERMISSIVE side) — refused loudly at the API
    boundary instead."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
    )

    with pytest.raises(ValueError, match="_corrupt_record"):
        read_csv_quarantined(
            spark, csv_path, "id int, _corrupt_record string", sep="|"
        )
    # same boundary on replay's corrected schema
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        replay_csv_quarantine,
    )

    _clean, quar = read_csv_quarantined(
        spark, csv_path, "id int, name string, val int", sep="|", header=True
    )
    with pytest.raises(ValueError, match="_corrupt_record"):
        replay_csv_quarantine(quar, "id int, _corrupt_record string", sep="|")


def test_quarantine_schema_guard_parses_ddl_not_substring(spark, tmp_path):
    """The corrupt-column guard is a parsed-field-name check, not a
    substring test: a legitimate column NAMED LIKE the managed column
    (pre_corrupt_record) must pass, while a case-variant _CORRUPT_RECORD
    must be refused — Spark's default case-insensitive resolution would
    still collide it with the managed column."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
    )

    p = tmp_path / "guard.csv"
    p.write_text("1|x\n2|notint|extra\n")
    clean, quar = read_csv_quarantined(
        spark, str(p), "id int, pre_corrupt_record string", sep="|"
    )
    assert clean.columns == ["id", "pre_corrupt_record"]
    assert [tuple(r) for r in clean.collect()] == [(1, "x")]
    assert quar.count() == 1

    with pytest.raises(ValueError, match="_corrupt_record"):
        read_csv_quarantined(spark, str(p), "id int, _CORRUPT_RECORD string", sep="|")


def test_quarantine_schema_guard_survives_unparseable_ddl(spark, tmp_path):
    """If fromDDL cannot parse the schema string, the guard must not
    silently vanish (round-11 ADVICE): a reader dialect fromDDL rejects
    could still accept the string, so an unparseable schema mentioning
    the managed column falls back to a conservative whole-identifier
    refusal, while an unparseable schema NOT mentioning it still flows
    through to the reader's own error. The fallback compares whole
    identifiers, not substrings (round-12 ADVICE): an unparseable schema
    carrying a legitimate 'pre_corrupt_record' column must NOT be
    refused by the guard — the docstring contract that such columns pass
    holds on the fallback path too."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
    )

    p = tmp_path / "guard2.csv"
    p.write_text("1|x\n")
    # unparseable by fromDDL (trailing comma) AND mentions the managed
    # column -> the fallback whole-identifier guard refuses it loudly
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_csv_quarantined(
            spark, str(p), "id int, _corrupt_record string,", sep="|"
        )
    # unparseable, mentions only a LONGER identifier containing the
    # managed name -> the guard must let it through to the reader's own
    # parse error, not refuse it (whole-identifier, not substring)
    with pytest.raises(Exception) as exc_info:
        clean, _quar = read_csv_quarantined(
            spark, str(p), "id int, pre_corrupt_record string,", sep="|"
        )
        clean.collect()
    assert not isinstance(exc_info.value, ValueError) or "_corrupt_record" not in str(
        exc_info.value
    ), "guard false-positived on pre_corrupt_record in unparseable DDL"
    # unparseable, no mention -> reaches the reader, which raises its own
    # parse error (the guard stays out of the way)
    with pytest.raises(Exception, match="(?i)parse|syntax|schema"):
        clean, _quar = read_csv_quarantined(
            spark, str(p), "id int,, name string", sep="|"
        )
        clean.collect()


def test_quarantine_refuses_managed_option_override(spark, csv_path):
    """Caller options were applied AFTER the managed mode/
    columnNameOfCorruptRecord pair, so options={'mode': 'PERMISSIVE'}
    would silently replace the clean side's DROPMALFORMED and null-fill
    corrupt rows into it (round-10 ADVICE). Pinned: every entry point —
    batch, streaming, replay — refuses the managed keys loudly,
    case-insensitively (Spark option keys resolve case-insensitively)."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
        read_json_quarantined,
        replay_csv_quarantine,
        stream_csv_quarantined,
    )

    schema = "id int, name string, val int"
    for bad in ({"mode": "PERMISSIVE"}, {"MODE": "FAILFAST"},
                {"columnNameOfCorruptRecord": "_x"}):
        with pytest.raises(ValueError, match="managed"):
            read_csv_quarantined(spark, csv_path, schema, sep="|", options=bad)
        with pytest.raises(ValueError, match="managed"):
            read_json_quarantined(spark, csv_path, schema, options=bad)
        with pytest.raises(ValueError, match="managed"):
            stream_csv_quarantined(spark, csv_path, schema, sep="|", options=bad)

    _clean, quar = read_csv_quarantined(
        spark, csv_path, schema, sep="|", header=True
    )
    with pytest.raises(ValueError, match="managed"):
        replay_csv_quarantine(quar, schema, sep="|", options={"mode": "FAILFAST"})


def test_quarantine_replay_null_raw_routes_to_still_bad(spark):
    """A NULL raw record must NOT be classified clean by replay:
    from_csv(NULL) yields a NULL struct whose corrupt field is NULL, so
    the old corrupt-IS-NULL test routed it to the clean side as an
    all-NULL row (round-10 ADVICE). The docstring invites replaying 'any
    DataFrame carrying raw lines' — e.g. a persisted sink, where NULLs
    are possible. Pinned: NULL raws land in still_bad, preserving
    clean + still_bad == input record count, and replay still composes."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        replay_csv_quarantine,
        replay_json_quarantine,
    )

    sink = spark.createDataFrame(
        [("1|ok|10",), (None,), ("2|bad",)], "_corrupt_record string"
    )
    fixed, still = replay_csv_quarantine(sink, "id int, name string, val int", sep="|")
    assert [tuple(r) for r in fixed.collect()] == [(1, "ok", 10)]
    still_rows = still.collect()
    assert sorted((r[0] for r in still_rows), key=lambda x: (x is None, x)) == [
        "2|bad",
        None,
    ]
    assert fixed.count() + len(still_rows) == 3
    # composes: a second replay of still_bad keeps the NULL in still_bad
    fixed2, still2 = replay_csv_quarantine(
        still, "id int, name string, val int", sep="|"
    )
    assert fixed2.count() == 0 and still2.count() == 2

    jsink = spark.createDataFrame(
        [('{"id": 1}',), (None,)], "_corrupt_record string"
    )
    jfixed, jstill = replay_json_quarantine(jsink, "id int")
    assert [tuple(r) for r in jfixed.collect()] == [(1,)]
    assert jstill.count() == 1


def test_csv_quarantine_multiline_quoted_newline_green_path(spark, tmp_path):
    """The multiLine=true GREEN path (round-10 verdict item 5): the gate
    already pins the trap (one unterminated quote swallows the file
    tail), but the batch-backfill mode stream_csv_quarantined's docstring
    points users to — well-QUOTED newlines in a real column — must keep
    the split exact: the quoted-newline records parse intact on the
    clean side, a malformed sibling RECORD lands alone in quarantine,
    and clean + quarantine covers every logical record exactly once."""
    from hdfs_hive_sql_playground_spark.sources.quarantine import (
        read_csv_quarantined,
    )

    p = tmp_path / "quoted_ml.csv"
    p.write_text(
        '1|"line one\nline two"|10\n'
        "2|plain|20\n"
        "3|bad|notanint\n"
        '4|"a|b\nc"|40\n'
    )
    clean, quar = read_csv_quarantined(
        spark, str(p), "id int, name string, val int", sep="|", multiline=True
    )
    got = {r.id: (r.name, r.val) for r in clean.collect()}
    assert got == {
        1: ("line one\nline two", 10),
        2: ("plain", 20),
        4: ("a|b\nc", 40),
    }
    quar_rows = quar.collect()
    assert len(quar_rows) == 1  # exactly the malformed sibling, alone
    assert quar_rows[0]["_corrupt_record"].startswith("3|bad|notanint")
    # 4 logical records, each on exactly one side
    assert clean.count() + len(quar_rows) == 4
