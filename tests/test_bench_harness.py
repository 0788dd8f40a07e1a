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
