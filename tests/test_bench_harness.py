"""Unit tests for bench.py's measurement harness plumbing (no Spark, no
timing): the child-JVM runner must fall back gracefully on every failure
mode (timeout, nonzero exit, no JSON line) — a hung or broken child must
never block the bench or silently drop a headline."""

from __future__ import annotations

import json
import subprocess
import sys
import types

import bench


def _fake_run(stdout="", returncode=0, raises=None):
    def run(argv, **kw):
        if raises is not None:
            raise raises
        return types.SimpleNamespace(
            stdout=stdout, stderr="boom", returncode=returncode
        )

    return run


def test_run_bench_child_parses_last_json_line(monkeypatch):
    payload = {"leg_a": 1.5, "leg_b": 2.5}
    monkeypatch.setattr(
        subprocess,
        "run",
        _fake_run(stdout="noise\n[Stage 1]\n" + json.dumps(payload) + "\n"),
    )
    out = bench._run_bench_child(["--x"], {}, timeout=5)
    assert out == payload


def test_run_bench_child_none_on_timeout(monkeypatch, capsys):
    monkeypatch.setattr(
        subprocess,
        "run",
        _fake_run(raises=subprocess.TimeoutExpired(cmd="x", timeout=5)),
    )
    assert bench._run_bench_child(["--x"], {}, timeout=5) is None
    assert "exceeded" in capsys.readouterr().err


def test_run_bench_child_none_on_bad_exit_or_no_json(monkeypatch, capsys):
    monkeypatch.setattr(subprocess, "run", _fake_run(stdout="{}", returncode=3))
    assert bench._run_bench_child(["--x"], {}, timeout=5) is None
    monkeypatch.setattr(subprocess, "run", _fake_run(stdout="no json here"))
    assert bench._run_bench_child(["--x"], {}, timeout=5) is None
    err = capsys.readouterr().err
    assert "failed" in err


def test_run_bench_child_passes_export_base_env(monkeypatch):
    seen = {}

    def run(argv, **kw):
        seen["env"] = kw.get("env", {})
        seen["timeout"] = kw.get("timeout")
        return types.SimpleNamespace(stdout="{}", stderr="", returncode=0)

    monkeypatch.setattr(subprocess, "run", run)
    bench._run_bench_child(["--x"], {"m33_jdbc_export_2800k": 35.9}, timeout=7)
    assert seen["env"]["SPARK_GRAFT_EXPORT_TREND_BASE"] == "35.9"
    assert seen["timeout"] == 7


def test_registry_legs_subprocess_reports_measured_set(monkeypatch):
    monkeypatch.setattr(
        bench, "_run_bench_child", lambda argv, t, timeout: {"q99_curation_pipeline": 1.2}
    )
    timings = {}
    got = bench._bench_registry_legs_subprocess("/sf", timings)
    assert got == {"q99_curation_pipeline"}
    assert timings == {"q99_curation_pipeline": 1.2}


def test_registry_legs_subprocess_empty_set_on_child_failure(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_run_bench_child", lambda argv, t, timeout: None)
    timings = {}
    got = bench._bench_registry_legs_subprocess("/sf", timings)
    # empty set -> the caller measures every leg in-session; no dropped headline
    assert got == set()
    assert timings == {}
    assert "falling back" in capsys.readouterr().err


def test_subprocess_registry_legs_default():
    assert "q99_curation_pipeline" in bench.SUBPROCESS_REGISTRY_LEGS


def test_q124_trend_subprocess_merges_child_dict(monkeypatch):
    child = {
        "trend_q124_semdedup_prune_x1": 1.5,
        "trend_q124_semdedup_prune_x8": 6.0,
        "trend_q124_semdedup_prune_x8_over_x1_ratio": 4.0,
        "trend_q124_cells_scaled_x8": 3.0,
        "trend_q124_cells_scaled_x8_over_x1_ratio": 2.0,
    }
    monkeypatch.setattr(bench, "_run_bench_child", lambda argv, t, timeout: dict(child))
    timings = {}
    assert bench._bench_q124_trend_subprocess(timings) is False
    assert timings == child


def test_q124_trend_subprocess_defers_fallback_on_dead_child(monkeypatch, capsys):
    """A dead child must not silently drop the q124 watch — but the
    in-session re-measure is DEFERRED to main()'s post-headline trend
    slot (round-12 ADVICE: running it here, before _bench_m33, would
    load the heap the BASELINE-comparable headlines are timed in). The
    function only signals; it never runs the legs itself."""
    monkeypatch.setattr(bench, "_run_bench_child", lambda argv, t, timeout: None)
    monkeypatch.setattr(
        bench,
        "_bench_q124_trend",
        lambda spark, sf_dir, t: (_ for _ in ()).throw(
            AssertionError("fallback must be deferred to the caller")
        ),
    )
    timings = {}
    assert bench._bench_q124_trend_subprocess(timings) is True
    assert timings == {}
    assert "deferring" in capsys.readouterr().err


def test_q124_trend_subprocess_honors_skip_subprocess_legs(monkeypatch):
    """SPARK_GRAFT_SKIP_SUBPROCESS_LEGS=1 exists to cap the run at ONE
    JVM (the documented ~32 GB two-JVM peak); the q124 child must honor
    it (round-12 ADVICE) by signaling the deferred in-session path
    without spawning anything."""
    monkeypatch.setenv("SPARK_GRAFT_SKIP_SUBPROCESS_LEGS", "1")
    monkeypatch.setattr(
        bench,
        "_run_bench_child",
        lambda argv, t, timeout: (_ for _ in ()).throw(
            AssertionError("no child may be spawned under SKIP_SUBPROCESS_LEGS")
        ),
    )
    timings = {}
    assert bench._bench_q124_trend_subprocess(timings) is True
    assert timings == {}


def test_m33_trend_subprocess_defers_like_q124(monkeypatch, capsys):
    """The m33 trend child follows the same round-13 contract as q124:
    SKIP_SUBPROCESS_LEGS=1 suppresses the spawn entirely (it is the
    LARGEST child, so the one-JVM cap must cover it), and a dead child
    signals the deferred in-session path instead of running the legs
    pre-headline."""
    monkeypatch.setenv("SPARK_GRAFT_SKIP_SUBPROCESS_LEGS", "1")
    monkeypatch.setattr(
        bench,
        "_run_bench_child",
        lambda argv, t, timeout: (_ for _ in ()).throw(
            AssertionError("no child may be spawned under SKIP_SUBPROCESS_LEGS")
        ),
    )
    assert bench._bench_m33_trend_subprocess({}) is True

    monkeypatch.delenv("SPARK_GRAFT_SKIP_SUBPROCESS_LEGS")
    monkeypatch.setattr(bench, "_run_bench_child", lambda argv, t, timeout: None)
    assert bench._bench_m33_trend_subprocess({}) is True
    assert "deferring" in capsys.readouterr().err

    child = {"trend_m33_ctas_x1": 3.2}
    monkeypatch.setattr(
        bench, "_run_bench_child", lambda argv, t, timeout: dict(child)
    )
    timings = {}
    assert bench._bench_m33_trend_subprocess(timings) is False
    assert timings == child


def test_emit_records_two_lines_headlines_last_and_watches():
    """The stdout contract: full record FIRST, compact headline record
    LAST (with any trend-norm records between); the full record keys the
    m33 headlines LAST; the compact headline record carries the
    headlines, the watched trend bands, and the calibration metrics — so
    the driver's 2000-char tail always recovers them whole."""
    timings = {
        "calibration_x1_first": 0.50,
        "q01_pricing_summary": 1.0,
        "m33_ctas_2800k": 3.8,
        "trend_m33_ctas_x1": 0.32,
        "trend_m33_ctas_x10": 3.0,
        "trend_ctas_x10_over_x1_ratio": 3.0,
        "m33_rows_x1": 2800000.0,
        "m33_jdbc_export_2800k": 39.0,
        "m33_limit100_raw_view": 1.2,
        "m33_limit100_warehouse": 0.07,
        "calibration_x1_last": 0.43,
        "calibration_io_x1_first": 0.9,
        "calibration_io_x1_last": 0.6,
        "trend_m33_export_x2_scan_control": 0.8,
        "trend_export_x2_over_x1_ratio": 2.2,
    }
    lines = bench._emit_records(timings, "0.1")
    full, headline = json.loads(lines[0]), json.loads(lines[-1])
    for mid in lines[1:-1]:
        assert json.loads(mid)["metric"] == "bench_trend_norms"
    assert full["metric"] == "bench_queries_total_wall"
    # headlines are the last four keys of the full record's queries dict
    assert list(full["queries"])[-4:] == [
        "m33_ctas_2800k",
        "m33_jdbc_export_2800k",
        "m33_limit100_raw_view",
        "m33_limit100_warehouse",
    ]
    # rows/trend/calibration markers excluded from the wall-clock total
    assert full["value"] == round(1.0 + 3.8 + 39.0 + 1.2 + 0.07, 4)
    assert headline["metric"] == "bench_m33_headlines"
    # Round 14 (driver-visibility fix): the headline record's queries dict
    # carries the registry bench legs ADDITIVELY after the four m33 keys —
    # the m33 keys keep their exact values and leading order, so prior
    # parsers and the round-over-round comparison are unbroken.
    assert set(headline["queries"]) == {
        "m33_ctas_2800k",
        "m33_jdbc_export_2800k",
        "m33_limit100_raw_view",
        "m33_limit100_warehouse",
        "q01_pricing_summary",
    }
    assert list(headline["queries"])[:4] == [
        "m33_ctas_2800k",
        "m33_jdbc_export_2800k",
        "m33_limit100_raw_view",
        "m33_limit100_warehouse",
    ]
    assert headline["queries"]["m33_ctas_2800k"] == 3.8
    assert headline["queries"]["q01_pricing_summary"] == 1.0
    # calibration: min of first/last, factor vs the pinned reference
    assert headline["watches"]["calibration_x1"] == 0.43
    factor = round(0.43 / bench.CALIBRATION_REF_SEC, 3)
    assert headline["watches"]["calibration_factor"] == factor
    assert headline["calibration_ref"] == bench.CALIBRATION_REF_SEC
    # watched CTAS x10 band rides in the headline record, raw AND
    # calibration-normalized; ratios get no _norm twin (scale-invariant)
    assert headline["watches"]["trend_m33_ctas_x10"] == 3.0
    # round-12 addition: the x1 ratio base ships as a watch key — it is
    # the primary plan-vs-host evidence for the bimodal x10 leg (README
    # 'Measured scaling'), so out-of-band draws adjudicate from the
    # artifact alone
    assert headline["watches"]["trend_m33_ctas_x1"] == 0.32
    assert headline["watches"]["trend_m33_ctas_x10_norm"] == round(3.0 / factor, 4)
    assert full["queries"]["trend_m33_ctas_x10_norm"] == round(3.0 / factor, 4)
    assert "trend_ctas_x10_over_x1_ratio_norm" not in full["queries"]
    # round-11 additions to the watch record: the export scan-only control
    # wall (rides next to the x2 ratio for artifact-only adjudication) and
    # the I/O-shaped calibration pair (min of first/last, factor vs the
    # pinned I/O reference; no _norm machinery — it adjudicates, it
    # doesn't normalize)
    assert headline["watches"]["trend_m33_export_x2_scan_control"] == 0.8
    assert headline["watches"]["trend_export_x2_over_x1_ratio"] == 2.2
    assert headline["watches"]["calibration_io_x1"] == 0.6
    assert headline["watches"]["calibration_io_factor"] == round(
        0.6 / bench.CALIBRATION_IO_REF_SEC, 3
    )
    assert "calibration_io_x1_norm" not in full["queries"]
    # excluded from the wall-clock total like every calibration_/trend_ key
    assert full["value"] == round(1.0 + 3.8 + 39.0 + 1.2 + 0.07, 4)


def test_emit_records_without_calibration_is_graceful():
    """SKIP paths that never time the calibration leg must still emit
    valid records (no calibration keys, no _norm twins)."""
    full, headline = (
        json.loads(s) for s in bench._emit_records({"q01_pricing_summary": 1.0}, "0.01")
    )
    assert full["value"] == 1.0
    assert "calibration_x1" not in full["queries"]
    assert headline["watches"] == {}


def test_emit_records_tail_priority_ordering():
    """The full record's key order is tail-priority: registry legs, raw
    trend walls, calibration markers, normalized walls, ratios, m33
    headlines — so the driver's 2000-char stdout tail always carries the
    ratios (primary slope evidence) and headlines even when the front of
    the line truncates away."""
    timings = {
        "m33_ctas_2800k": 3.8,
        "trend_m33_ctas_x10": 3.0,
        "trend_ctas_x10_over_x1_ratio": 3.0,
        "q01_pricing_summary": 1.0,
        "calibration_x1_first": 0.43,
        "calibration_x1_last": 0.43,
    }
    full = json.loads(bench._emit_records(timings, "0.1")[0])
    keys = list(full["queries"])
    order = {k: i for i, k in enumerate(keys)}
    assert order["q01_pricing_summary"] < order["trend_m33_ctas_x10"]
    assert order["trend_m33_ctas_x10"] < order["calibration_x1"]
    assert order["calibration_x1"] < order["trend_m33_ctas_x10_norm"]
    assert order["trend_m33_ctas_x10_norm"] < order["trend_ctas_x10_over_x1_ratio"]
    assert keys[-1] == "m33_ctas_2800k"


def test_emit_records_tail_budget():
    """Artifact-durability contract, restated round 14 (VERDICT r13 item
    1): EVERY adjudication key — the 21 registry bench walls (NEW: inside
    the headline record's queries dict, so the driver's PERF/scaling
    per-query surface finally covers parallelizable legs), every banded
    ratio (doc-trend x8/x1, q124 fixed-cells, skew-over-balanced — now
    explicit in the compact records instead of derivable from norm
    twins), the watches, and the m33 headlines — must ride in complete
    JSONL lines that together fit the driver's 2000-char stdout tail.
    Per-leg _norm twins stay in the FULL record (line 1) only; the tail
    cannot hold them AND the registry walls, and the banded evidence is
    the ratios. Built with the FULL current inventory (all 21 bench legs,
    every doc-trend query x1/x8, skew legs, m33 legs, q124 legs) so
    adding a leg that overflows the budget fails HERE, not in the
    round's clipped artifact."""
    registry_legs = [
        "q01_pricing_summary", "q10_join_chain_revenue", "q12_region_revenue",
        "q20_window_rank", "q61_tumbling_window", "q62_sessionize",
        "q80_exact_dedup", "q82_ngram_jaccard_pairs", "q85_ann_bruteforce_topk",
        "q86_ivf_ann_topk", "q91_quality_score", "q95_multimodal_features",
        "q97_ann_pandas_topk", "q99_curation_pipeline", "q104_heavy_hitters",
        "q124_semdedup_prune", "q136_segment_dedup_rewrite",
        "q137_kmeans_refine", "q138_weighted_sample",
        "q141_target_affinity_select", "q143_crawl_front_pipeline",
    ]
    timings = {
        "calibration_x1_first": 0.46,
        "calibration_x1_last": 0.47,
        "calibration_io_x1_first": 0.55,
        "calibration_io_x1_last": 0.56,
        "m33_ctas_2800k": 3.333,
        "m33_jdbc_export_2800k": 37.056,
        "m33_limit100_raw_view": 1.089,
        "m33_limit100_warehouse": 0.047,
        "m33_rows_x1": 2800000.0,
        "trend_m33_ctas_x1": 4.2294,
        f"trend_m33_ctas_x{bench.CTAS_TREND_SCALE}": 12.8585,
        f"trend_ctas_x{bench.CTAS_TREND_SCALE}_over_x1_ratio": 3.04,
        f"trend_ctas_x{bench.CTAS_TREND_SCALE}_redraws": 0,
        f"trend_m33_export_x{bench.EXPORT_TREND_SCALE}": 82.5684,
        f"trend_m33_export_x{bench.EXPORT_TREND_SCALE}_scan_control": 0.5696,
        f"trend_export_x{bench.EXPORT_TREND_SCALE}_over_x1_ratio": 2.228,
        "trend_q124_semdedup_prune_x1": 2.1234,
        f"trend_q124_semdedup_prune_x{bench.DOC_TREND_SCALE}": 8.5678,
        # unrounded on purpose: the compact record must re-round, not
        # trust the producer (round-13 review finding)
        f"trend_q124_semdedup_prune_x{bench.DOC_TREND_SCALE}_over_x1_ratio": 4.0351234567890123,
        f"trend_q124_cells_scaled_x{bench.DOC_TREND_SCALE}": 4.2501,
        f"trend_q124_cells_scaled_x{bench.DOC_TREND_SCALE}_over_x1_ratio": 2.002,
    }
    for name in registry_legs:
        timings[name] = 12.3456  # 2-decimal rounding asserted below
    for name in bench.DOC_TREND_QUERIES:
        timings[f"trend_{name}_x1"] = 1.2345
        timings[f"trend_{name}_x{bench.DOC_TREND_SCALE}"] = 12.3456
        timings[f"trend_{name}_x{bench.DOC_TREND_SCALE}_over_x1_ratio"] = 10.001
    for name in bench.SKEW_TREND_QUERIES:
        timings[f"trend_{name}_x{bench.DOC_TREND_SCALE}_skew"] = 12.3456
        timings[f"trend_{name}_skew_over_balanced_ratio"] = 1.0123456789012345
    lines = bench._emit_records(timings, "0.1")
    norm_lines, headline_line = lines[1:-1], lines[-1]
    assert norm_lines, "full inventory must produce trend-ratio records"
    merged: dict[str, float] = {}
    for s in norm_lines:
        rec = json.loads(s)
        assert rec["metric"] == "bench_trend_norms"
        assert len(s) <= bench.TREND_NORM_CHUNK_CHARS + 120  # one key overshoot max
        merged.update(rec["queries"])
    full = json.loads(lines[0])
    # norm twins stay in the full record (recoverable when stdout is kept)
    assert any(k.endswith("_norm") for k in full["queries"])
    # every registry wall rides in the headline queries dict, 2-decimal
    headline = json.loads(headline_line)
    for name in registry_legs:
        assert headline["queries"][name] == 12.35, name
    # m33 keys first and unrounded — byte-compatible prefix
    assert list(headline["queries"])[:4] == [
        "m33_ctas_2800k", "m33_jdbc_export_2800k",
        "m33_limit100_raw_view", "m33_limit100_warehouse",
    ]
    assert headline["queries"]["m33_jdbc_export_2800k"] == 37.056
    # every banded ratio NOT in the watches rides in the compact records
    # under the tail-budget key encoding (_x8r / _skewr)
    for name in bench.DOC_TREND_QUERIES:
        assert merged[f"{name}_x{bench.DOC_TREND_SCALE}r"] == 10.001
    assert (
        merged[f"q124_semdedup_prune_x{bench.DOC_TREND_SCALE}r"] == 4.035
    )
    for name in bench.SKEW_TREND_QUERIES:
        assert merged[f"{name}_skewr"] == 1.012
    # ratios already inside the headline watches are NOT duplicated here
    assert f"ctas_x{bench.CTAS_TREND_SCALE}r" not in merged
    assert f"q124_cells_scaled_x{bench.DOC_TREND_SCALE}r" not in merged
    # the combined tail (all ratio records + headline, newline-joined) must
    # fit the driver's 2000-char capture with headroom for line breaks
    tail = "\n".join([*norm_lines, headline_line])
    assert len(tail) < 1900, f"tail budget exceeded: {len(tail)} chars"


def test_derby_table_lock_export_roundtrips_exactly(spark):
    """The round-13 export-sink tuning (derby.storage.rowLocking=false —
    table-level locks for the bulk append) must not change WHAT the export
    writes: 16 concurrent writers appending to one fresh table under
    table-level locking round-trip every row and every value exactly.
    Runs in the shared test JVM, so the property is set the same way the
    bench sets it (System property before this database's first boot)."""
    from pyspark.sql import functions as F

    from hdfs_hive_sql_playground_spark.sources.jdbc import (
        export_jdbc,
        read_jdbc,
    )

    bench._tune_derby_sink(spark)
    df = spark.range(100_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 3 % 997).alias("v"),
    )
    url = "jdbc:derby:memory:tablelock_rt;create=true"
    export_jdbc(df, url, "t", mode="overwrite", num_partitions=16, batchsize=10_000)
    back = read_jdbc(spark, url, "t")
    assert back.count() == 100_000
    got = back.agg(
        F.sum("k").alias("sk"), F.sum("v").alias("sv"), F.count(F.lit(1))
    ).first()
    want = df.agg(
        F.sum("k").alias("sk"), F.sum("v").alias("sv"), F.count(F.lit(1))
    ).first()
    assert tuple(got) == tuple(want)
    bench._drop_derby_memory(spark, "tablelock_rt")
