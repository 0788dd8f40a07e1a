"""Structured Streaming operators must agree with their batch duals on a
static directory drained with an availableNow trigger."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from hdfs_hive_sql_playground_spark import streaming
from hdfs_hive_sql_playground_spark.tables import load


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as µs-timestamp parquet (the stream source can't
    apply the nanos conversion that tables.load does)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return d


def test_windowed_counts_matches_batch(spark, sf_dir, events_dir):
    sink = streaming.run_to_memory(
        streaming.windowed_counts(streaming.stream_events(spark, events_dir)),
        "t_win_counts",
    )
    got = {
        (r.window_start, r.event_type): r.n
        for r in sink.collect()
    }
    want = {
        (r.window_start, r.event_type): r.n
        for r in load(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_session_counts_matches_batch_session_window(spark, sf_dir, events_dir):
    sink = streaming.run_to_memory(
        streaming.session_counts(streaming.stream_events(spark, events_dir)),
        "t_sessions",
    )
    got = sorted((r.user_id, r.session_start, r.n_events) for r in sink.collect())
    want = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in load(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sess.start").alias("session_start"), "n_events")
        .collect()
    )
    assert got == want


def test_stateful_running_totals(spark, sf_dir, events_dir):
    sink = streaming.run_to_memory(
        streaming.running_user_totals(streaming.stream_events(spark, events_dir)),
        "t_totals",
        output_mode="update",
    )
    # Update mode may emit one row per user per microbatch; the LAST emit
    # per user is the running total, which after draining equals the batch
    # count. (Memory sink appends in batch order; take max = last.)
    got = {
        r.user_id: r.n_events
        for r in sink.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    }
    want = {
        r.user_id: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_transform_with_state_running_stats(spark, sf_dir, events_dir):
    """transformWithStateInPandas (Spark 4 arbitrary state): after a full
    availableNow drain, each user's LAST emitted running stats must equal
    the batch ground truth. Needs the RocksDB state store provider, and —
    environmentally — the protobuf package its state-server protocol uses;
    when that's absent the operator is probed and skipped with the exact
    reason (same policy as the native-avro probe)."""
    if not hasattr(spark.read.parquet(events_dir).groupBy("user_id"),
                   "transformWithStateInPandas"):
        pytest.skip("transformWithStateInPandas not in this Spark")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        pytest.skip(
            "transformWithStateInPandas requires google.protobuf "
            f"(not installed in this container): {e}"
        )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sink = streaming.run_to_memory(
            streaming.user_stats_tws(streaming.stream_events(spark, events_dir)),
            "t_tws",
            output_mode="update",
        )
        got = {
            r.user_id: (r.n_events, round(r.total_value, 6))
            for r in sink.groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_value").alias("total_value"),
            )
            .collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(want)
    assert all(got[u][0] == want[u][0] for u in want)
    # float totals: running-sum order differs from batch reduce order, so
    # compare within tolerance rather than bit-exact
    assert all(abs(got[u][1] - want[u][1]) < 1e-6 for u in want)


def test_streaming_dedup_within_watermark(spark, sf_dir, events_dir, tmp_path):
    # Source with every event duplicated: two copies of the same files.
    dup_dir = str(tmp_path / "events_dup")
    ev = spark.read.parquet(events_dir)
    ev.union(ev).repartition(4).write.mode("overwrite").parquet(dup_dir)
    sink = streaming.run_to_memory(
        streaming.dedup_events(streaming.stream_events(spark, dup_dir), "event_id"),
        "t_dedup",
        output_mode="append",
    )
    assert sink.count() == ev.select("event_id").distinct().count()


def test_streaming_jdbc_export_foreachbatch(spark, sf_dir, events_dir, tmp_path):
    from hdfs_hive_sql_playground_spark.sources.jdbc import jdbc_ddl, read_jdbc

    url = "jdbc:derby:memory:streamexp;create=true"
    jdbc_ddl(
        spark,
        url,
        "CREATE TABLE win_counts (window_start TIMESTAMP, event_type VARCHAR(32), "
        "n BIGINT, batch_stamp BIGINT)",
    )
    q = streaming.export_stream_jdbc(
        streaming.windowed_counts(streaming.stream_events(spark, events_dir)),
        url,
        "win_counts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    exported = read_jdbc(spark, url, "win_counts")
    # Append-mode aggregation only emits FINALIZED windows: those whose end
    # is at or before the final watermark (max event ts - 1 h). The last
    # windows stay open when a bounded drain ends — correct exactly-once
    # semantics for an INSERT-only sink, not data loss.
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    want = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .count()
        .filter(F.col("ws") + F.expr("INTERVAL 1 HOUR") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR"))
        .count()
    )
    assert exported.count() == want


def test_streaming_checkpoint_restart_exports_only_new_data(
    spark, sf_dir, events_dir, tmp_path
):
    """Restart semantics: a second run of the export stream from the SAME
    checkpoint must pick up exactly the files added since the first run —
    no re-export of already-committed batches, no gaps. This is the
    production restart path (availableNow drain → process exits → new data
    lands → next drain resumes from the checkpoint)."""
    from hdfs_hive_sql_playground_spark.sources.jdbc import jdbc_ddl, read_jdbc

    src = str(tmp_path / "src")
    ev = spark.read.parquet(events_dir)
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    half1.write.mode("overwrite").parquet(src)

    url = "jdbc:derby:memory:streamrestart;create=true"
    jdbc_ddl(
        spark, url,
        "CREATE TABLE restarts (event_id BIGINT, user_id BIGINT, batch_stamp BIGINT)",
    )
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = streaming.export_stream_jdbc(
            streaming.stream_events(spark, src).select("event_id", "user_id"),
            url,
            "restarts",
            checkpoint_dir=ckpt,
        )
        q.awaitTermination()

    drain()
    assert read_jdbc(spark, url, "restarts").count() == half1.count()

    half2.write.mode("append").parquet(src)
    drain()  # restart from the same checkpoint
    out = read_jdbc(spark, url, "restarts")
    assert out.count() == ev.count()  # nothing re-exported, nothing missed
    assert out.select("event_id").distinct().count() == ev.count()


def test_streaming_jdbc_sink_idempotent_on_batch_replay(spark, sf_dir):
    """A microbatch replayed with the same checkpointed batch_id (the
    foreachBatch at-least-once failure mode) must not duplicate target
    rows: the sink deletes its own batch before appending."""
    from hdfs_hive_sql_playground_spark.sources.jdbc import jdbc_ddl, read_jdbc

    url = "jdbc:derby:memory:streamidem;create=true"
    jdbc_ddl(
        spark, url,
        "CREATE TABLE idem (user_id BIGINT, n_events BIGINT, batch_stamp BIGINT)",
    )
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .limit(20)
    )
    sink = streaming.make_jdbc_batch_sink(url, "idem")
    sink(batch, 7)
    n1 = read_jdbc(spark, url, "idem").count()
    assert n1 > 0
    sink(batch, 7)  # simulated retry of the SAME batch
    assert read_jdbc(spark, url, "idem").count() == n1
    sink(batch, 8)  # a genuinely new batch still appends
    assert read_jdbc(spark, url, "idem").count() == 2 * n1


def test_streaming_jdbc_sink_delete_failure_propagates(spark, sf_dir):
    """Only a not-yet-created table may skip the replay DELETE. Any other
    DELETE failure (here: the target exists but lacks the batch_stamp
    column, standing in for lock timeouts / permission errors) must fail
    the microbatch — a swallowed DELETE followed by a successful append
    would duplicate replayed rows."""
    import pytest

    from hdfs_hive_sql_playground_spark.sources.jdbc import (
        jdbc_ddl,
        jdbc_table_exists,
        read_jdbc,
    )

    url = "jdbc:derby:memory:streamdelfail;create=true"
    jdbc_ddl(spark, url, "CREATE TABLE nostamp (user_id BIGINT, n_events BIGINT)")
    assert jdbc_table_exists(spark, url, "nostamp")
    assert not jdbc_table_exists(spark, url, "never_created")
    # A probe failure that is NOT "missing object" (here: SQL syntax error,
    # standing in for lock timeouts / dropped connections) must RAISE, not
    # report "missing" — else the sink would skip the replay DELETE.
    with pytest.raises(Exception):
        jdbc_table_exists(spark, url, "nostamp WHERE")
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .limit(5)
    )
    sink = streaming.make_jdbc_batch_sink(url, "nostamp")
    with pytest.raises(Exception, match="(?i)batch_stamp"):
        sink(batch, 1)
    # Nothing was appended after the failed DELETE.
    assert read_jdbc(spark, url, "nostamp").count() == 0


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_dir):
    sink = streaming.run_to_memory(
        streaming.stream_stream_join(streaming.stream_events(spark, events_dir)),
        "t_ss_join",
        output_mode="append",
    )
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value",
    )
    want = (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("p_ts") <= F.col("c_ts")),
        )
        .count()
    )
    assert sink.count() == want
    assert want > 0  # non-vacuous: the corpus must actually produce matches


def test_streaming_crawl_frontier_url_dedup(spark, tmp_path):
    """Fetches of the same logical page under URL noise (host case,
    trailing slash, utm placement, fragment) inside the watermark must
    collapse to one row per canonical page — the streaming dual of q140
    over the shared canonicalizer."""
    import datetime

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for page in range(10):
        for i, (host, slash, q, frag) in enumerate(
            [
                ("www.example.com", "", f"id={page}", ""),
                ("WWW.Example.COM", "/", f"utm_source=x&id={page}", "#top"),
                ("www.EXAMPLE.com", "", f"id={page}&utm_campaign=y", ""),
            ]
        ):
            rows.append(
                (
                    f"https://{host}/p/{page}{slash}?{q}{frag}",
                    t0 + datetime.timedelta(seconds=60 * page + i),
                )
            )
    src = str(tmp_path / "fetches")
    spark.createDataFrame(rows, "url string, ts timestamp").repartition(2).write.mode(
        "overwrite"
    ).parquet(src)
    fetches = (
        spark.readStream.schema("url string, ts timestamp").parquet(src)
    )
    sink = streaming.run_to_memory(
        streaming.dedup_crawl_frontier(fetches), "t_frontier", output_mode="append"
    )
    got = sink.select("canonical_url").collect()
    assert len(got) == 10, got
    assert {r.canonical_url for r in got} == {
        f"https://www.example.com/p/{p}?id={p}" for p in range(10)
    }


def test_streaming_crawl_frontier_ts_col_and_param_whitelist(spark, tmp_path):
    """The frontier parameterizes the watermark column and the kept-params
    whitelist: a fetch stream with a differently-named timestamp works
    unrenamed, and whitelisting a meaningful param ("page") keeps
    same-listing pages 1..3 as DISTINCT frontier entries while still
    collapsing tracking noise."""
    import datetime

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for page in (1, 2, 3):
        # each listing page fetched twice under different tracking noise
        rows.append(
            (
                f"https://www.example.com/list?id=9&page={page}&utm_source=x",
                t0 + datetime.timedelta(seconds=10 * page),
            )
        )
        rows.append(
            (
                f"https://WWW.Example.COM/list/?utm_campaign=y&id=9&page={page}",
                t0 + datetime.timedelta(seconds=10 * page + 1),
            )
        )
    src = str(tmp_path / "fetches_paged")
    spark.createDataFrame(
        rows, "url string, fetched_at timestamp"
    ).repartition(2).write.mode("overwrite").parquet(src)
    fetches = spark.readStream.schema("url string, fetched_at timestamp").parquet(
        src
    )
    sink = streaming.run_to_memory(
        streaming.dedup_crawl_frontier(
            fetches, ts_col="fetched_at", keep_params=("id", "page")
        ),
        "t_frontier_paged",
        output_mode="append",
    )
    got = {r.canonical_url for r in sink.select("canonical_url").collect()}
    assert got == {
        f"https://www.example.com/list?id=9&page={p}" for p in (1, 2, 3)
    }, got


def test_streaming_crawl_front_half_composed(spark, tmp_path):
    """The q143 streaming dual end-to-end on one microbatch: URL-noise
    re-fetches collapse first (canonical key), content re-posts under a
    DIFFERENT url collapse second (md5 state), and too-short survivors are
    gated out — exactly one emitted row per logical page that passes
    quality, carrying its signals."""
    import datetime

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    good = " ".join(f"word{i}" for i in range(30))  # 30 words, mw >= 4
    other = " ".join(f"token{i}" for i in range(40))
    rows = [
        # page 1: fetched twice under URL noise -> one survivor
        (f"https://www.example.com/a?id=1&utm_source=x", good, t0),
        (f"https://WWW.Example.COM/a/?id=1#frag", good, t0 + datetime.timedelta(seconds=1)),
        # same content re-posted at a DIFFERENT url -> content dedup drops it
        (f"https://mirror.example.org/copy?id=9", good, t0 + datetime.timedelta(seconds=2)),
        # page 2: unique content, passes quality
        (f"https://www.example.com/b?id=2", other, t0 + datetime.timedelta(seconds=3)),
        # page 3: unique but too short -> quality gate drops it
        (f"https://www.example.com/c?id=3", "tiny page", t0 + datetime.timedelta(seconds=4)),
    ]
    src = str(tmp_path / "front_fetches")
    spark.createDataFrame(rows, "url string, text string, ts timestamp").repartition(
        2
    ).write.mode("overwrite").parquet(src)
    fetches = spark.readStream.schema("url string, text string, ts timestamp").parquet(
        src
    )
    sink = streaming.run_to_memory(
        streaming.crawl_front_stream(fetches), "t_front_half", output_mode="append"
    )
    got = {r.canonical_url: r for r in sink.collect()}
    assert set(got) == {
        "https://www.example.com/a?id=1",
        "https://www.example.com/b?id=2",
    }, got
    assert got["https://www.example.com/a?id=1"].n_words == 30
    assert got["https://www.example.com/b?id=2"].n_words == 40


def test_streaming_crawl_front_plan_has_two_bounded_states(spark, tmp_path):
    """Plan contract for the composed front half: exactly TWO
    DeduplicateWithinWatermark state operators (canonical_url first, then
    the content hash), both downstream of one EventTimeWatermark — so the
    state stores are watermark-bounded by construction, and the quality
    gate adds no state."""
    src = str(tmp_path / "plan_src")
    spark.createDataFrame(
        [("u", "t", None)], "url string, text string, ts timestamp"
    ).write.mode("overwrite").parquet(src)
    fetches = spark.readStream.schema("url string, text string, ts timestamp").parquet(
        src
    )
    plan = (
        streaming.crawl_front_stream(fetches)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert plan.count("DeduplicateWithinWatermark") == 2, plan
    assert "EventTimeWatermark" in plan, plan
    # URL dedup runs BEFORE content dedup (cheapest byte-shedder first):
    # the plan prints top-down, so the hash state wraps the url state
    assert plan.index("DeduplicateWithinWatermark [h#") < plan.index(
        "DeduplicateWithinWatermark [canonical_url#"
    ), plan


def test_streaming_crawl_front_consistent_with_q143_batch(spark, tmp_path):
    """Stream-vs-batch consistency on a SHARED fixture: the streaming front
    half's survivors must be exactly q143's 'kept' set when fetches arrive
    in doc_id order (one file per microbatch, so the stream's keep-first
    state resolves each dup group to the same min-doc_id keeper the batch
    audit picks), and each survivor must carry identical quality signals.
    The fixture exercises all three drop stages: a URL-noise re-fetch
    (doc 7 collides with doc 0's canonical key), a content re-post under a
    different URL (doc 1 repeats doc 0's text), a combined case (doc 9
    repeats doc 2's text at doc 2's URL key), and a too-short page (doc 3).
    The stream input is built from the SAME documents rows via the SAME
    url/html builders q143 composes, extraction included."""
    import glob
    import shutil

    from hdfs_hive_sql_playground_spark.queries import all_queries
    from hdfs_hive_sql_playground_spark.queries.dedup import _synth_url
    from hdfs_hive_sql_playground_spark.queries.text import _synth_html

    long_a = " ".join(f"alpha{i:02d}" for i in range(30))
    long_b = " ".join(f"bravo{i:02d}" for i in range(40))
    long_c = " ".join(f"charlie{i:02d}" for i in range(28))
    long_x = " ".join(f"xray{i:03d}" for i in range(33))
    rows = [
        (0, "src", long_a),   # kept (url key 0)
        (1, "src", long_a),   # exact_dup of doc 0 at a different url
        (2, "src", long_b),   # kept (url key 2)
        (3, "src", "tiny page"),  # low_quality
        (4, "src", long_c),   # kept
        (7, "src", long_x),   # url_dup of doc 0 (7 % 7 == 0, case-noised host)
        (9, "src", long_b),   # url_dup of doc 2 (9 % 7 == 2) AND content dup
    ]
    mini = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sf_mini = tmp_path / "sf_mini"
    mini.write.mode("overwrite").parquet(str(sf_mini / "documents.parquet"))

    batch = all_queries()["q143_crawl_front_pipeline"].fn(spark, str(sf_mini))
    by_stage: dict = {}
    signals = {}
    for r in batch.collect():
        by_stage.setdefault(r.stage, set()).add(r.doc_id)
        signals[r.doc_id] = (r.n_words, r.mw_chars)
    assert by_stage["kept"] == {0, 2, 4}, by_stage
    assert by_stage["url_dup"] == {7, 9}, by_stage
    assert by_stage["exact_dup"] == {1}, by_stage
    assert by_stage["low_quality"] == {3}, by_stage

    # Shared-construction stream input: same builders, extraction included;
    # ts inside one watermark window, one FILE per doc in doc_id order so
    # arrival order == doc_id order.
    fetch = mini.select(
        "doc_id",
        _synth_url().alias("url"),
        F.regexp_extract(_synth_html(), "<p>(.*)</p>", 1).alias("text"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")).alias("ts"),
    )
    src = tmp_path / "fetch_stream"
    src.mkdir()
    for i, (did, _, _) in enumerate(rows):
        stage_dir = str(tmp_path / f"stage_{did}")
        fetch.filter(F.col("doc_id") == did).drop("doc_id").coalesce(
            1
        ).write.mode("overwrite").parquet(stage_dir)
        part = glob.glob(stage_dir + "/part-*.parquet")[0]
        shutil.move(part, str(src / f"{i:03d}.parquet"))
    fetches = (
        spark.readStream.schema("url string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sink = streaming.run_to_memory(
        streaming.crawl_front_stream(fetches), "t_front_consist", output_mode="append"
    )
    got = sink.collect()
    # survivors == batch 'kept' (set equality, the strongest form of the
    # survivors-are-a-subset contract, available because arrival is ordered)
    stream_docs = {}
    for r in got:
        # recover doc_id from the canonical url's ?id= (synth: doc_id % 7 is
        # unique per keeper here: 0, 2, 4)
        key = int(r.canonical_url.rsplit("id=", 1)[1])
        stream_docs[key] = (r.n_words, r.mw_chars)
    assert set(stream_docs) == {d % 7 for d in by_stage["kept"]}, got
    for did in by_stage["kept"]:
        assert stream_docs[did % 7] == signals[did], did


def test_streaming_crawl_front_state_survives_restart(spark, tmp_path):
    """Restart semantics for the crawl front half: the two
    dropDuplicatesWithinWatermark state stores must persist through a
    checkpointed restart — a page kept in drain 1 must still block its URL
    re-fetch AND its content re-post arriving in drain 2 (if the state were
    lost, both would re-emit), while genuinely new pages in drain 2 emit
    normally. This is the production path: availableNow drain → process
    exits → new crawl files land → next drain resumes from the checkpoint."""
    import datetime

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    good = " ".join(f"word{i:02d}" for i in range(30))
    fresh = " ".join(f"fresh{i:02d}" for i in range(35))
    src = str(tmp_path / "restart_fetches")
    ckpt = str(tmp_path / "restart_ckpt")
    sink_dir = str(tmp_path / "restart_out")

    def drain(rows, mode):
        spark.createDataFrame(
            rows, "url string, text string, ts timestamp"
        ).coalesce(1).write.mode(mode).parquet(src)
        fetches = spark.readStream.schema(
            "url string, text string, ts timestamp"
        ).parquet(src)
        q = (
            streaming.crawl_front_stream(fetches)
            .select("canonical_url", "n_words")
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.canonical_url, r.n_words)
            for r in spark.read.parquet(sink_dir).collect()
        }

    out1 = drain(
        [("https://www.example.com/a?id=1&utm_source=x", good, t0)], "overwrite"
    )
    assert out1 == {("https://www.example.com/a?id=1", 30)}

    out2 = drain(
        [
            # URL re-fetch of the drain-1 page (case/fragment noise): the
            # restored canonical_url state must drop it
            ("https://WWW.Example.COM/a/?id=1#frag", good, t0 + datetime.timedelta(minutes=1)),
            # same content re-posted at a new url: restored hash state drops it
            ("https://mirror.example.org/copy?id=9", good, t0 + datetime.timedelta(minutes=2)),
            # genuinely new page: must emit
            ("https://www.example.com/b?id=2", fresh, t0 + datetime.timedelta(minutes=3)),
        ],
        "append",
    )
    assert out2 == {
        ("https://www.example.com/a?id=1", 30),
        ("https://www.example.com/b?id=2", 35),
    }, out2


def test_streaming_incremental_ingest_composed(spark, tmp_path):
    """The q109+q108 streaming dual end-to-end on one drain: a document
    whose content already exists in the historical corpus is anti-joined
    away, an in-stream re-post collapses to its first arrival, a document
    containing a benchmark probe n-gram is gated out, and clean novel
    documents survive carrying content_hash and n_probes_hit = 0."""
    import datetime

    from hdfs_hive_sql_playground_spark.queries.curation2 import PROBES

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    known = "row filter join the window group"  # already in the corpus
    novel_a = "fresh tokens alpha beta gamma delta"
    novel_b = "other fresh content entirely here now"
    contaminated = f"prefix words {PROBES[0]} suffix words"  # carries a probe
    corpus = spark.createDataFrame(
        [(known,), ("some other historical page",)], "text string"
    ).select(F.md5(F.lower(F.trim("text"))).alias("content_hash"))

    rows = [
        (10, known, t0),                                  # history dup -> dropped
        (11, novel_a, t0 + datetime.timedelta(seconds=1)),  # kept
        (12, novel_a, t0 + datetime.timedelta(seconds=2)),  # in-stream dup -> dropped
        (13, contaminated, t0 + datetime.timedelta(seconds=3)),  # probe hit -> gated
        (14, novel_b, t0 + datetime.timedelta(seconds=4)),  # kept
    ]
    src = str(tmp_path / "ingest_docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    docs = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    sink = streaming.run_to_memory(
        streaming.incremental_ingest_stream(docs, corpus),
        "t_ingest",
        output_mode="append",
    )
    got = {r.doc_id: r for r in sink.collect()}
    assert set(got) == {11, 14}, got
    for r in got.values():
        assert r.n_probes_hit == 0
        assert len(r.content_hash) == 32
    # and the contaminated doc is gated by the SAME probe count q108 emits:
    # recompute statelessly on the batch side for the one contaminated row
    from hdfs_hive_sql_playground_spark.queries.curation2 import PROBE_N

    assert PROBE_N == 3  # the probe gram above is a 3-gram by construction


def test_streaming_incremental_ingest_width_fold_key(spark, tmp_path):
    """The content_key knob (round 13): keyed with the q146 width fold,
    the ingest stream catches fullwidth respellings the byte-exact
    default misses — a fullwidth twin of a corpus page is history-
    dropped, a fullwidth twin of an in-stream page collapses to its
    first arrival, and the ASCII novel page survives. The corpus hash
    table is built with the SAME recipe (the caller-owned consistency
    contract in the docstring)."""
    import datetime

    from hdfs_hive_sql_playground_spark.queries.dedup import (
        width_fold_key as fold_key,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    known = "row filter join the window group"
    known_fw = "ｒｏｗ　ｆｉｌｔｅｒ　ｊｏｉｎ　ｔｈｅ　ｗｉｎｄｏｗ　ｇｒｏｕｐ"
    novel = "fresh tokens alpha beta gamma delta"
    novel_fw = "ｆｒｅｓｈ　ｔｏｋｅｎｓ　ａｌｐｈａ　ｂｅｔａ　ｇａｍｍａ　ｄｅｌｔａ"
    corpus = spark.createDataFrame([(known,)], "text string").select(
        fold_key(F.col("text")).alias("content_hash")
    )
    rows = [
        (20, known_fw, t0),                                   # history dup (folded)
        (21, novel, t0 + datetime.timedelta(seconds=1)),      # kept
        (22, novel_fw, t0 + datetime.timedelta(seconds=2)),   # in-stream dup (folded)
    ]
    src = str(tmp_path / "ingest_fold_docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    docs = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    sink = streaming.run_to_memory(
        streaming.incremental_ingest_stream(
            docs, corpus, content_key=fold_key(F.col("text"))
        ),
        "t_ingest_fold",
        output_mode="append",
    )
    got = {r.doc_id for r in sink.collect()}
    assert got == {21}, got


def test_streaming_incremental_ingest_plan_shape(spark, tmp_path):
    """Plan contract for the ingest back half: exactly ONE
    DeduplicateWithinWatermark state operator (the in-stream dedup), a
    stream-static LEFT ANTI join on content_hash (stateless — no
    stream-stream join machinery), the decontamination gate as a pure
    projection (no second state, no join for the probe set), and no
    cartesian product anywhere."""
    src = str(tmp_path / "ingest_plan_src")
    spark.createDataFrame(
        [(1, "t", None)], "doc_id long, text string, ts timestamp"
    ).write.mode("overwrite").parquet(src)
    docs = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    corpus = spark.createDataFrame([("h",)], "content_hash string")
    plan = (
        streaming.incremental_ingest_stream(docs, corpus)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert plan.count("DeduplicateWithinWatermark") == 1, plan
    assert "EventTimeWatermark" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # probe gate is a projection over array_intersect, not a join: the only
    # join in the whole plan is the single anti-join
    assert plan.count("Join") == 1, plan


def test_streaming_incremental_ingest_rejects_foreign_watermark(spark, tmp_path):
    """An input already watermarked on a DIFFERENT column than ts_col must
    raise, not silently inherit: dropDuplicatesWithinWatermark would bound
    its dedup state by the wrong event-time clock (the round-8 substring
    check accepted any EventTimeWatermark anywhere in the plan)."""
    import pytest

    src = str(tmp_path / "foreign_wm_src")
    spark.createDataFrame(
        [(1, "t", None, None)],
        "doc_id long, text string, ts timestamp, other_ts timestamp",
    ).write.mode("overwrite").parquet(src)
    docs = (
        spark.readStream.schema(
            "doc_id long, text string, ts timestamp, other_ts timestamp"
        )
        .parquet(src)
        .withWatermark("other_ts", "10 minutes")
    )
    corpus = spark.createDataFrame([("h",)], "content_hash string")
    with pytest.raises(ValueError, match="other_ts"):
        streaming.incremental_ingest_stream(docs, corpus)
    # and the matching-column case still chains without redefinition
    docs_ok = (
        spark.readStream.schema(
            "doc_id long, text string, ts timestamp, other_ts timestamp"
        )
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    ok = streaming.incremental_ingest_stream(docs_ok, corpus)
    plan = ok._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 1, plan


def test_streaming_full_live_pipeline_chains_both_halves(spark, tmp_path):
    """The full live pipeline = crawl_front_stream → incremental_ingest_
    stream chained into ONE streaming plan, exactly as DEPLOYMENT_100TB §8
    describes: three watermark-bounded dedup states (canonical URL, front
    content hash, back in-stream hash) plus one stateless history
    anti-join. A quality page whose content already sits in the historical
    corpus must be dropped by the BACK half after surviving the front; a
    novel quality page flows through both."""
    import datetime

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    known = " ".join(f"known{i:02d}" for i in range(30))
    fresh = " ".join(f"fresh{i:02d}" for i in range(35))
    corpus = spark.createDataFrame([(known,)], "text string").select(
        F.md5(F.lower(F.trim("text"))).alias("content_hash")
    )
    rows = [
        ("https://www.example.com/a?id=1", known, t0),   # front-kept, back-dropped (history)
        ("https://www.example.com/b?id=2", fresh, t0 + datetime.timedelta(seconds=1)),  # kept
        ("https://www.example.com/c?id=3", "tiny", t0 + datetime.timedelta(seconds=2)),  # front quality gate
    ]
    src = str(tmp_path / "live_fetches")
    spark.createDataFrame(
        rows, "url string, text string, ts timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    fetches = spark.readStream.schema(
        "url string, text string, ts timestamp"
    ).parquet(src)
    live = streaming.incremental_ingest_stream(
        streaming.crawl_front_stream(fetches), corpus
    )
    plan = live._jdf.queryExecution().analyzed().toString()
    assert plan.count("DeduplicateWithinWatermark") == 3, plan
    assert "LeftAnti" in plan and "CartesianProduct" not in plan, plan
    sink = streaming.run_to_memory(live, "t_live_pipeline", output_mode="append")
    got = {r.canonical_url for r in sink.collect()}
    assert got == {"https://www.example.com/b?id=2"}, got


# ---------------------------------------------------------------------------
# Adversarial arrival-order gate (round 9): late / duplicate / out-of-order
# events fed as THREE deterministic microbatches (maxFilesPerTrigger=1,
# file mtimes ordered) against the batch duals. Pins the watermark
# contract precisely instead of assuming it:
#   - COMPLETE-mode aggregations retain ALL input (late rows are NOT
#     dropped — state is never finalized), so complete == batch-on-all.
#   - APPEND-mode windowed aggregation: the watermark is a RETENTION
#     bound, not an input filter — a late row whose window state is
#     still live (its finalizing batch hasn't ended) merges in; only a
#     row arriving AFTER its window was finalized-and-evicted is
#     dropped. So append == batch over rows-that-arrived-before-their-
#     window-closed, restricted to finalized windows. (Measured on
#     Spark 4.1: a 10:10 row in the same batch where wm=11:30
#     finalizes [10,11) still counts; arriving one batch later it
#     does not.)
#   - dropDuplicatesWithinWatermark: an in-watermark duplicate key is
#     collapsed; after the watermark passes key_ts + delay the state is
#     EVICTED and the key re-admits (the documented bounded-state
#     tradeoff); a NON-duplicate below the effective watermark is
#     dropped by the operator's late filter.
#   - session_window merges in-watermark out-of-order fragments across
#     microbatches, but drops below-watermark input EVEN IN COMPLETE
#     MODE (unlike the tumbling agg — session merge depends on
#     eviction).
# All "effective watermark" filters apply with a one-batch lag: the
# filter in batch N uses the eviction watermark of batch N-1 (measured;
# this is why a late row in the same batch that finalizes its window
# still merges, while the identical row one batch later is dropped).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def adversarial_stream_dir(spark, tmp_path_factory):
    import datetime
    import glob
    import os
    import shutil
    import time

    T = lambda h, m: datetime.datetime(2026, 3, 1, h, m)  # noqa: E731
    batches = {
        # batch A: on-time events; an IN-BATCH duplicate pair (id 100);
        # max ts 12:30 -> watermark for batch B is 11:30
        "a": [
            (1, T(10, 0), 1, "click", 1.0, None),
            (2, T(10, 20), 1, "click", 1.0, None),
            (100, T(10, 30), 2, "view", 1.0, None),
            (100, T(10, 30), 2, "view", 1.0, None),
            (3, T(12, 30), 3, "buy", 1.0, None),
        ],
        # batch B: out-of-order-but-in-watermark (11:50 >= 11:30), a
        # cross-batch duplicate (id 100, state still live), and a
        # watermark push to 13:00 (ts 14:00). Batch B's end finalizes
        # the [10,11) and [11,12) windows under wm 11:30.
        "b": [
            (4, T(11, 50), 1, "click", 1.0, None),
            (100, T(11, 45), 2, "view", 1.0, None),
            (6, T(14, 0), 3, "buy", 1.0, None),
        ],
        # batch C: a TOO-LATE row (10:10, its [10,11) window was
        # finalized and evicted at batch B's end) -> dropped by the
        # append-mode agg; id 100 re-appears AFTER its dedup state was
        # evicted (watermark 13:00 > 10:30 + 1 h) -> re-admitted
        "c": [
            (5, T(10, 10), 4, "click", 1.0, None),
            (100, T(13, 30), 2, "view", 1.0, None),
            (7, T(13, 40), 5, "click", 1.0, None),
        ],
    }
    d = str(tmp_path_factory.mktemp("adversarial_stream"))
    now = time.time()
    for i, (name, rows) in enumerate(batches.items()):
        staging = os.path.join(d, "_staging")
        spark.createDataFrame(rows, streaming.EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        dst = os.path.join(d, f"{name}.parquet")
        shutil.move(glob.glob(os.path.join(staging, "part-*.parquet"))[0], dst)
        shutil.rmtree(staging)
        # file-source batch order = modification time: one file per trigger
        os.utime(dst, (now - 300 + i * 100, now - 300 + i * 100))
    return d


def _one_file_per_batch(spark, d):
    return (
        spark.readStream.schema(streaming.EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def _batch_events(spark, d):
    return spark.read.schema(streaming.EVENT_SCHEMA).parquet(d)


def test_adversarial_stream_complete_mode_keeps_late_rows(
    spark, adversarial_stream_dir
):
    sink = streaming.run_to_memory(
        streaming.windowed_counts(_one_file_per_batch(spark, adversarial_stream_dir)),
        "t_adv_win_complete",
    )
    got = sorted((r.window_start, r.event_type, r.n) for r in sink.collect())
    want = sorted(
        (r.window_start, r.event_type, r.n)
        for r in _batch_events(spark, adversarial_stream_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == want  # complete mode == batch dual over ALL rows
    # ...including the too-late row: 10:00 click counts 1, 2 AND 5
    import datetime

    assert (datetime.datetime(2026, 3, 1, 10, 0), "click", 3) in got


def test_adversarial_stream_append_mode_drops_late_row(
    spark, adversarial_stream_dir
):
    sink = streaming.run_to_memory(
        streaming.windowed_counts(_one_file_per_batch(spark, adversarial_stream_dir)),
        "t_adv_win_append",
        output_mode="append",
    )
    got = sorted((r.window_start, r.event_type, r.n) for r in sink.collect())
    # batch dual over rows that arrived before their window closed
    # (event 5's [10,11) window was finalized a batch earlier),
    # restricted to windows finalized by the final 13:00 watermark
    # (window end <= 13:00)
    import datetime

    final_wm = datetime.datetime(2026, 3, 1, 13, 0)
    want = sorted(
        (r.window_start, r.event_type, r.n)
        for r in _batch_events(spark, adversarial_stream_dir)
        .filter(F.col("event_id") != 5)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r.window_start + datetime.timedelta(hours=1) <= final_wm
    )
    assert got == want, (got, want)
    # the drop is observable: the 10:00 click window finalized at 2, not 3
    assert (datetime.datetime(2026, 3, 1, 10, 0), "click", 2) in got


def test_adversarial_stream_dedup_eviction_and_readmission(
    spark, adversarial_stream_dir
):
    sink = streaming.run_to_memory(
        streaming.dedup_events(_one_file_per_batch(spark, adversarial_stream_dir)),
        "t_adv_dedup",
        output_mode="append",
    )
    import datetime

    got = sorted((r.event_id, r.ts) for r in sink.collect())
    T = lambda h, m: datetime.datetime(2026, 3, 1, h, m)  # noqa: E731
    assert got == [
        (1, T(10, 0)),
        (2, T(10, 20)),
        (3, T(12, 30)),
        (4, T(11, 50)),
        # NO (5, 10:10): a non-duplicate row arriving after the watermark
        # passed it is dropped by the dedup operator's late filter
        # (measured: the filter uses the PREVIOUS batch's eviction
        # watermark, 11:30 here — the same row arriving one batch
        # earlier, before that watermark was effective, passes through)
        (6, T(14, 0)),
        (7, T(13, 40)),
        (100, T(10, 30)),  # first arrival wins (in-batch dup collapsed,
        # 11:45 cross-batch dup collapsed)
        (100, T(13, 30)),  # re-admitted after state eviction at wm 13:00
    ], got


def test_adversarial_stream_sessions_merge_out_of_order(
    spark, adversarial_stream_dir
):
    sink = streaming.run_to_memory(
        streaming.session_counts(_one_file_per_batch(spark, adversarial_stream_dir)),
        "t_adv_sessions",
    )
    got = sorted((r.user_id, r.session_start, r.n_events) for r in sink.collect())
    # UNLIKE the tumbling-window aggregation, the session operator drops
    # below-watermark input even in COMPLETE mode (session merging
    # depends on eviction): event 5 (10:10, arriving under the 11:30
    # effective watermark) is excluded. In-watermark out-of-order
    # fragments still merge across microbatches.
    want = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in _batch_events(spark, adversarial_stream_dir)
        .filter(F.col("event_id") != 5)
        .groupBy(F.session_window("ts", "30 minutes").alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sess.start").alias("session_start"), "n_events")
        .collect()
    )
    assert got == want


# Update-mode gate (round 10): the third output mode — and the one an
# incremental 100 TB ingest would actually run (emit only what changed,
# downstream upsert sink). Pins per-microbatch re-emission exactly, via
# foreachBatch capture on a dedicated three-batch fixture:
#   - a batch emits ONLY the windows its surviving rows touched, each
#     with the UPDATED CUMULATIVE aggregate (not a delta);
#   - a window spanning batches RE-emits once per touching batch;
#   - untouched live windows are NOT re-emitted (unlike complete mode);
#   - the same one-batch-lag watermark filter as append mode applies: a
#     too-late row is dropped and CANNOT resurrect an evicted window —
#     so an upsert sink keyed on (window_start, event_type) converges to
#     the append-mode answer for finalized windows while also surfacing
#     still-live windows early.


@pytest.fixture(scope="module")
def update_mode_stream_dir(spark, tmp_path_factory):
    import datetime
    import glob
    import os
    import shutil
    import time

    T = lambda h, m: datetime.datetime(2026, 3, 1, h, m)  # noqa: E731
    batches = {
        # batch A: two clicks in [10,11), one view in [12,13);
        # end-of-batch watermark = 12:30 - 1h = 11:30 (evicts [10,11))
        "a": [
            (1, T(10, 15), 1, "click", 1.0, None),
            (2, T(10, 45), 1, "click", 1.0, None),
            (3, T(12, 30), 2, "view", 1.0, None),
        ],
        # batch B: second view lands in the still-live [12,13) window
        # (the RE-emission case); a 14:00 click pushes watermark to 13:00
        "b": [
            (4, T(12, 40), 2, "view", 1.0, None),
            (5, T(14, 0), 3, "click", 1.0, None),
        ],
        # batch C: a too-late 10:20 click (its window was evicted at
        # batch A's end watermark) + an in-watermark 13:30 view
        "c": [
            (6, T(10, 20), 4, "click", 1.0, None),
            (7, T(13, 30), 2, "view", 1.0, None),
        ],
    }
    d = str(tmp_path_factory.mktemp("update_mode_stream"))
    now = time.time()
    for i, (name, rows) in enumerate(batches.items()):
        staging = os.path.join(d, "_staging")
        spark.createDataFrame(rows, streaming.EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        dst = os.path.join(d, f"{name}.parquet")
        shutil.move(glob.glob(os.path.join(staging, "part-*.parquet"))[0], dst)
        shutil.rmtree(staging)
        os.utime(dst, (now - 300 + i * 100, now - 300 + i * 100))
    return d


def test_adversarial_stream_update_mode_reemission_contract(
    spark, update_mode_stream_dir
):
    import datetime

    emissions = []

    def capture(df, batch_id):
        emissions.append(
            (
                batch_id,
                sorted(
                    (r.window_start, r.event_type, r.n) for r in df.collect()
                ),
            )
        )

    q = (
        streaming.windowed_counts(
            _one_file_per_batch(spark, update_mode_stream_dir)
        )
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    T = lambda h: datetime.datetime(2026, 3, 1, h, 0)  # noqa: E731
    assert emissions == [
        (0, [(T(10), "click", 2), (T(12), "view", 1)]),
        # [12,13) view RE-emits with the updated cumulative count (2, not
        # a +1 delta); the untouched [10,11) click window does NOT re-emit
        (1, [(T(12), "view", 2), (T(14), "click", 1)]),
        # the too-late 10:20 click is dropped (no resurrection of the
        # evicted [10,11) window); only the fresh [13,14) view emits
        (2, [(T(13), "view", 1)]),
    ]

    # An upsert sink keyed on (window_start, event_type), replaying the
    # emissions in order, converges to the batch dual minus the dropped
    # late row — the operational contract for incremental ingest.
    upserted = {}
    for _bid, rows in emissions:
        for w, t, n in rows:
            upserted[(w, t)] = n
    want = {
        (r.window_start, r.event_type): r.n
        for r in _batch_events(spark, update_mode_stream_dir)
        .filter(F.col("event_id") != 6)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert upserted == want


def test_streaming_incremental_ingest_state_survives_restart(spark, tmp_path):
    """Restart semantics for the incremental-ingest dual (the crawl-front
    restart test's sibling): the dropDuplicatesWithinWatermark hash state
    must persist through a checkpointed availableNow restart — a document
    kept in drain 1 and re-posted in drain 2 must be dropped by the
    RESTORED state (if the state were lost it would re-emit); the
    stream-static corpus anti-join keeps working after restart; genuinely
    new documents emit. This is the production shape: drain → process
    exits → new files land → next drain resumes from the checkpoint."""
    import datetime

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    known = "row filter join the window group"
    novel_a = "fresh tokens alpha beta gamma delta"
    novel_b = "other fresh content entirely here now"
    corpus = spark.createDataFrame([(known,)], "text string").select(
        F.md5(F.lower(F.trim("text"))).alias("content_hash")
    )
    src = str(tmp_path / "ingest_restart_src")
    ckpt = str(tmp_path / "ingest_restart_ckpt")
    sink_dir = str(tmp_path / "ingest_restart_out")

    def drain(rows, mode):
        spark.createDataFrame(
            rows, "doc_id long, text string, ts timestamp"
        ).coalesce(1).write.mode(mode).parquet(src)
        docs = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).parquet(src)
        q = (
            streaming.incremental_ingest_stream(docs, corpus)
            .select("doc_id")
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.doc_id for r in spark.read.parquet(sink_dir).collect()}

    out1 = drain([(1, novel_a, t0)], "overwrite")
    assert out1 == {1}

    out2 = drain(
        [
            # re-post of drain-1 content: the RESTORED hash state drops it
            (2, novel_a, t0 + datetime.timedelta(minutes=1)),
            # historical-corpus content: the stream-static anti-join drops it
            (3, known, t0 + datetime.timedelta(minutes=2)),
            # genuinely new: emits
            (4, novel_b, t0 + datetime.timedelta(minutes=3)),
        ],
        "append",
    )
    assert out2 == {1, 4}, out2


def test_session_window_rejects_update_mode(spark, tmp_path):
    """Output-mode boundary pin: session-window aggregation supports
    append/complete (both gated above) but NOT update mode — a merged
    session can change its own key (the window), so per-key upserts are
    unsound and Spark refuses the plan (STREAMING_OUTPUT_MODE.
    UNSUPPORTED_OPERATION) rather than emitting un-upsertable rows. An
    incremental-ingest sink that wants early session results must use
    complete mode or applyInPandasWithState, not update."""
    import datetime

    import pytest

    d = str(tmp_path / "sess_upd_src")
    spark.createDataFrame(
        [(1, datetime.datetime(2026, 3, 1, 10, 0), 1, "click", 1.0, None)],
        streaming.EVENT_SCHEMA,
    ).write.parquet(f"{d}/a")
    src = spark.readStream.schema(streaming.EVENT_SCHEMA).parquet(f"{d}/*")
    with pytest.raises(Exception, match="STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION"):
        (
            streaming.session_counts(src)
            .writeStream.format("memory")
            .queryName("sess_upd_reject")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
