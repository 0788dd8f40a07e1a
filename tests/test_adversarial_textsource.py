"""Adversarial text-source gate (round 10): pathological text files
through BOTH scan paths of `sources/text.py` — the line-mode scan and the
wholetext header-skip path (the reference's `skip.header.line.count`
semantics, `create_m33_raw_ext_tbl.hql:1-6`).

The two paths must agree with Hadoop's LineRecordReader contract (Hive
TEXTFILE, the reference engine): lines terminate on CR, LF, or CRLF; the
terminator is never part of the record; a trailing final terminator emits
no phantom empty record; interior blank lines ARE records.

This gate FOUND A REAL BUG: the wholetext path split on '\\n' alone, so
every row of a CRLF file silently carried a trailing '\\r' that the
line-mode path (and Hive) strips — poisoning downstream regexp/cast logic
only for header-skipped CRLF files. Fixed by the ordered-alternation
split ('\\r\\n|\\r|\\n') and terminator-aware trailing trim in
`read_text_files`.
"""

from __future__ import annotations

import os

from hdfs_hive_sql_playground_spark.sources.text import read_text_files


def _write(path, data: bytes):
    with open(path, "wb") as f:
        f.write(data)


def _rows(df):
    return sorted(
        (os.path.basename(r["input_file"]), r["row_str"]) for r in df.collect()
    )


def test_crlf_file_identical_on_both_paths(spark, tmp_path):
    d = str(tmp_path / "crlf")
    os.makedirs(d)
    _write(d + "/a.txt", b"h1\r\nh2\r\ndata1\r\ndata2\r\n")
    line_mode = [r["row_str"] for r in read_text_files(spark, d).collect()]
    assert line_mode == ["h1", "h2", "data1", "data2"]  # no \r anywhere
    skipped = [
        r["row_str"] for r in read_text_files(spark, d, skip_header_lines=2).collect()
    ]
    assert skipped == ["data1", "data2"]  # the bug: these were 'data1\r'


def test_lone_cr_and_mixed_terminators(spark, tmp_path):
    """Hadoop's LineRecordReader terminates on CR, LF, or CRLF — a mixed
    file must yield the same records on both paths (pinned empirically:
    b'x\\ry\\nz\\r\\nw' -> ['x','y','z','w'] in line mode)."""
    d = str(tmp_path / "cr")
    os.makedirs(d)
    _write(d + "/a.txt", b"x\ry\nz\r\nw")
    line_mode = [r["row_str"] for r in read_text_files(spark, d).collect()]
    assert line_mode == ["x", "y", "z", "w"]
    skipped = [
        r["row_str"] for r in read_text_files(spark, d, skip_header_lines=1).collect()
    ]
    assert skipped == ["y", "z", "w"]


def test_degenerate_files_under_header_skip(spark, tmp_path):
    """Empty file, header-only file, and fewer-lines-than-skip file all
    contribute ZERO rows (never a negative slice or phantom record); a
    file with no trailing newline keeps its last line; interior blank
    lines are data rows on both paths."""
    d = str(tmp_path / "mixed")
    os.makedirs(d)
    _write(d + "/empty.txt", b"")
    _write(d + "/hdronly.txt", b"h1\nh2\n")
    _write(d + "/short.txt", b"h1\n")
    _write(d + "/noeol.txt", b"h1\nh2\nlast")
    _write(d + "/blanks.txt", b"h1\nh2\n\nmid\n\n")
    got = _rows(read_text_files(spark, d, skip_header_lines=2))
    assert got == [
        ("blanks.txt", ""),
        ("blanks.txt", ""),
        ("blanks.txt", "mid"),
        ("noeol.txt", "last"),
    ]
    # line-mode dual over the same directory: headers included, same
    # blank-line and no-trailing-newline treatment
    line_mode = _rows(read_text_files(spark, d))
    assert ("blanks.txt", "") in line_mode
    assert ("noeol.txt", "last") in line_mode
    assert len([1 for f, _ in line_mode if f == "hdronly.txt"]) == 2


def test_bom_contract(spark, tmp_path):
    """Hadoop's text reader STRIPS a UTF-8 BOM from the first line
    (measured; pinned so an upgrade flipping it surfaces here). The
    wholetext path never exposes a BOM divergence through this module's
    contract: it only runs with skip_header_lines >= 1, and the BOM sits
    on header line 1, which is dropped."""
    d = str(tmp_path / "bom")
    os.makedirs(d)
    _write(d + "/a.txt", "﻿h1\ndata\n".encode("utf-8"))
    line_mode = [r["row_str"] for r in read_text_files(spark, d).collect()]
    assert line_mode == ["h1", "data"]  # BOM stripped in line mode
    skipped = [
        r["row_str"] for r in read_text_files(spark, d, skip_header_lines=1).collect()
    ]
    assert skipped == ["data"]  # BOM line is the skipped header


def test_per_file_cols_on_degenerate_files(spark, tmp_path):
    """The hoisted per-file derived columns evaluate even for files whose
    body is empty after the header skip — those files contribute no rows
    (explode of an empty array), never a null-column row."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "pfc")
    os.makedirs(d)
    _write(d + "/k1_x.txt", b"h\nv1\n")
    _write(d + "/k2_y.txt", b"h\n")
    df = read_text_files(
        spark,
        d,
        skip_header_lines=1,
        per_file_cols={"key": lambda c: F.regexp_extract(c, r"(k\d)_", 1)},
    )
    assert [(r["key"], r["row_str"]) for r in df.collect()] == [("k1", "v1")]


def test_randomized_corpus_both_paths_match_naive_reference(spark, tmp_path):
    """Seeded randomized corpus (mixed CR/LF/CRLF terminators, blank
    lines, unicode, missing trailing terminators, degenerate files)
    checked against a pure-Python naive reference of the Hadoop line
    contract — the same third-implementation pattern the hash/fold
    operators use (docs/VERIFICATION.md layer 3). Both scan paths must
    agree with it: line mode on all lines, the wholetext path on the
    header-skipped suffix of each file."""
    import random
    import re

    rng = random.Random(20260815)
    terms = ["\n", "\r\n", "\r"]
    alphabet = ["data", "x,y", "点击", "v u", "", "0", "tail"]
    d = str(tmp_path / "rand")
    os.makedirs(d)
    expected = {}  # file -> list of logical lines
    for i in range(30):
        n_lines = rng.randint(0, 6)
        lines = [rng.choice(alphabet) for _ in range(n_lines)]
        body = "".join(line + rng.choice(terms) for line in lines)
        if lines and rng.random() < 0.3:
            # no trailing terminator on the last line
            body = (
                "".join(line + rng.choice(terms) for line in lines[:-1])
                + lines[-1]
            )
        name = f"f{i:02d}.txt"
        _write(os.path.join(d, name), body.encode("utf-8"))
        # naive reference: split on CRLF/CR/LF (ordered), drop the phantom
        # empty record a trailing terminator produces
        ref = re.split("\r\n|\r|\n", body)
        if ref and ref[-1] == "":
            ref = ref[:-1]
        expected[name] = ref

    got_lines = _rows(read_text_files(spark, d))
    want_lines = sorted(
        (name, line) for name, ref in expected.items() for line in ref
    )
    assert got_lines == want_lines

    for skip in (1, 3):
        got_skip = _rows(read_text_files(spark, d, skip_header_lines=skip))
        want_skip = sorted(
            (name, line)
            for name, ref in expected.items()
            for line in ref[skip:]
        )
        assert got_skip == want_skip, f"skip={skip}"
