"""The CLI integration path (the runall.py analog) pinned end-to-end.

``cli.main`` starts and STOPS its own Engine/session, so the pipeline verb
runs in a subprocess — the in-process route would tear down the shared
test session. This is the library-vs-integration distinction: every step
of the pipeline is already unit-tested; this test pins the wiring
(argparse → Engine verbs → stdout contract) the way runall.py pinned the
reference's (``examples/runall.py:32-77``).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_m33_pipeline_end_to_end():
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "hdfs_hive_sql_playground_spark.cli",
            "m33-pipeline",
            "--jdbc-url",
            "jdbc:derby:memory:clipipe;create=true",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "CTAS ->" in r.stdout
    m = re.search(r"exported \+ verified rows: (\d+)", r.stdout)
    assert m, r.stdout[-2000:]
    # data/m33_mini: 4 files x 1000 rows.
    assert int(m.group(1)) == 4000


def test_cli_sql_shell_piped_statements():
    """The sql-cli shell (beeline-cli / sql-cli analog): piped ;-terminated
    statements execute in order with the dialect shims applied, a failing
    statement reports ERROR and the shell SURVIVES it, and a trailing
    statement without ';' runs at EOF."""
    script = (
        "SELECT 1 AS a;\n"
        "SELECT field('b', 'a', 'b') AS pos;\n"
        "SELECT broken FROM nowhere;\n"
        "-- a full-line comment;\n"
        "SELECT 'tail' AS t"
    )
    r = subprocess.run(
        [sys.executable, "-m", "hdfs_hive_sql_playground_spark.cli", "sql-cli"],
        input=script,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = r.stdout
    # all four statements reached execution, in order
    ia, ipos, ierr, itail = (
        out.index("|a  |"),
        out.index("|pos|"),
        out.index("ERROR AnalysisException"),
        out.index("|tail|"),
    )
    assert ia < ipos < ierr < itail, out
    assert "|2  |" in out  # field('b','a','b') == 2: the shim ran
