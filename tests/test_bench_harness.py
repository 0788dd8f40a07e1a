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
    bench._bench_q124_trend_subprocess(object(), "/sf", timings)
    assert timings == child


def test_q124_trend_subprocess_falls_back_in_session(monkeypatch, capsys):
    """A dead child must not silently drop the q124 watch — the caller
    re-measures in-session (the pre-round-12 protocol) instead."""
    monkeypatch.setattr(bench, "_run_bench_child", lambda argv, t, timeout: None)
    called = {}
    monkeypatch.setattr(
        bench,
        "_bench_q124_trend",
        lambda spark, sf_dir, t: called.setdefault("args", (spark, sf_dir)),
    )
    sentinel = object()
    bench._bench_q124_trend_subprocess(sentinel, "/sf", {})
    assert called["args"] == (sentinel, "/sf")
    assert "falling back" in capsys.readouterr().err


def test_emit_records_two_lines_headlines_last_and_watches():
    """The stdout contract: TWO JSON lines; the full record keys the m33
    headlines LAST; the compact headline record carries the headlines,
    the watched trend bands, and the calibration metrics — so the
    driver's 2000-char tail always recovers them whole."""
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
    full, headline = (json.loads(s) for s in bench._emit_records(timings, "0.1"))
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
    assert set(headline["queries"]) == {
        "m33_ctas_2800k",
        "m33_jdbc_export_2800k",
        "m33_limit100_raw_view",
        "m33_limit100_warehouse",
    }
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
    full, _ = (json.loads(s) for s in bench._emit_records(timings, "0.1"))
    keys = list(full["queries"])
    order = {k: i for i, k in enumerate(keys)}
    assert order["q01_pricing_summary"] < order["trend_m33_ctas_x10"]
    assert order["trend_m33_ctas_x10"] < order["calibration_x1"]
    assert order["calibration_x1"] < order["trend_m33_ctas_x10_norm"]
    assert order["trend_m33_ctas_x10_norm"] < order["trend_ctas_x10_over_x1_ratio"]
    assert keys[-1] == "m33_ctas_2800k"
