"""Generate the committed m33-shaped text fixture (FIXTURES.md §1).

Reproduces the reference's data layout (`examples/data/m33_0.01/{cp,nocp}/
hmix.a<AGE>z<METALLICITY>`): plain text, 3 junk header lines per file, then
one record per line — leading space, `<wavelength>` + exactly two spaces +
`<flam>`. All values derive from integer arithmetic so regeneration is
byte-identical on any platform (no float formatting involved).

Run from the repo root: python scripts/gen_m33_fixture.py [rows_per_file]
"""

from __future__ import annotations

import os
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "m33_mini")

AGES = (11, 12)
PARTS = ("cp", "nocp")
HEADER = [
    "# m33 synthetic spectral fixture (see FIXTURES.md)",
    "# columns: wavelength(angstrom)  flam",
    "# first three lines are header junk skipped by skip.header.line.count=3",
]


def fmt_cents(c: int) -> str:
    return f"{c // 100}.{c % 100:02d}"


def gen_file(path: str, age: int, peculiar: bool, rows: int) -> None:
    lines = list(HEADER)
    for i in range(rows):
        wl_c = 300000 + i  # 3000.00 .. in 0.01 steps
        flam_c = (age * 7_919 + wl_c * 31 + (104_729 if peculiar else 0)) % 100_000_000 + 100
        lines.append(f" {fmt_cents(wl_c)}  {fmt_cents(flam_c)}")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def gen_tree(out_dir: str, rows: int, n_files: int = 1) -> int:
    """Write the fixture tree; returns total data rows.

    ``n_files`` > 1 scales the dataset by ADDING files per (partition, age)
    leaf instead of growing one file — the reference's own layout (~18 MB
    per file, many files), and the layout the wholetext header-skip path
    requires: per-file memory stays constant while parallelism grows."""
    for part in PARTS:
        for age in AGES:
            for r in range(n_files):
                # The age regexp keys on the 'hmix.a<AGE>' prefix; replica
                # suffixes after the z-block don't disturb it.
                name = f"hmix.a{age:06d}z0790" + (f"_f{r}" if r else "")
                gen_file(os.path.join(out_dir, part, name), age, part == "cp", rows)
    return len(PARTS) * len(AGES) * n_files * rows


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = sys.argv[2] if len(sys.argv) > 2 else OUT
    total = gen_tree(out, rows)
    print(f"wrote {total} rows under {out}")


if __name__ == "__main__":
    main()
