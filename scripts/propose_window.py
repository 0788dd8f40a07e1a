"""Propose the next round's 50-query driver window mechanically.

The driver hash-checks the FIRST 50 registry entries each round, so the
window must rotate: stalest-vintage greens first, plus every query whose
implementation changed this round, backfilled with the next-stalest rows.
This script computes each query's latest driver-green round from the
CORRECTNESS_r*.json history and prints the stalest-first ordering, plus a
diff against the current DRIVER_PRIORITY::

    python scripts/propose_window.py [changed_query ...]

Queries named on the command line are treated as changed-this-round and
forced into the window (after the stalest block, mirroring the r7 layout).
Exit code 1 if the current DRIVER_PRIORITY leaves any query outside the
window whose vintage is strictly older than some query inside it (a
staleness inversion), ignoring the forced-changed names.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def latest_vintage() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            # 'no_oracle' rows (rows-only by design, e.g. q06's HLL
            # estimate) still count as a driver visit — the weaker check
            # is the strongest one that query can ever get.
            if row.get("err") in (None, "no_oracle"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    changed = list(sys.argv[1:])
    from hdfs_hive_sql_playground_spark.queries import DRIVER_PRIORITY, all_queries

    specs = all_queries()
    # Validate forced-changed names: a typo would silently occupy window
    # slots, and an oracle-less name would propose a window that fails
    # test_window_queries_are_oracle_checked.
    unknown = [q for q in changed if q not in specs]
    if unknown:
        print(f"ERROR: unknown changed query name(s): {unknown}", file=sys.stderr)
        return 2
    oracleless = [q for q in changed if specs[q].oracle is None]
    if oracleless:
        print(
            f"ERROR: changed name(s) have no oracle (rows-only by design, "
            f"never window-eligible): {oracleless}",
            file=sys.stderr,
        )
        return 2
    if len(changed) > WINDOW:
        print(
            f"ERROR: {len(changed)} changed names exceed the {WINDOW}-slot window",
            file=sys.stderr,
        )
        return 2
    vintage = latest_vintage()
    never = [q for q in specs if q not in vintage]

    # Stalest first; ties broken by registry order for stability. Changed
    # queries are pulled out and re-inserted after the stalest block.
    # Oracle-less (rows-only) queries don't compete for slots — see the
    # inversion exemption below.
    rest = [q for q in specs if q not in changed and specs[q].oracle is not None]
    stalest = sorted(rest, key=lambda q: (vintage.get(q, 0), list(specs).index(q)))
    proposal = []
    n_lead = WINDOW - len(changed)
    proposal.extend(stalest[:n_lead])
    proposal.extend(changed)

    print(f"# proposed window ({WINDOW}); vintages:", flush=True)
    for q in proposal:
        v = vintage.get(q, "never")
        mark = " (changed)" if q in changed else ""
        print(f"    \"{q}\",  # r{v}{mark}")
    if never:
        print(f"# never driver-checked (should be in window!): {never}")

    current = list(DRIVER_PRIORITY)[:WINDOW]
    inside = {q for q in current if q not in changed}
    outside = [q for q in specs if q not in current]
    worst_in = max((vintage.get(q, 0) for q in inside), default=0)
    # Oracle-less queries (rows-only by design, e.g. q06: q06b hash-pins
    # its estimate) are exempt — a window slot buys them nothing a fresh
    # hash row buys everyone else, the standing policy since r6.
    inversions = [
        (q, vintage.get(q, 0))
        for q in outside
        if vintage.get(q, 0) < worst_in
        and q in vintage
        and specs[q].oracle is not None
    ]
    newest_inside = [q for q in inside if vintage.get(q, 0) > min(v for _, v in inversions)] if inversions else []
    if inversions:
        print(
            f"# STALENESS INVERSION: {len(inversions)} queries outside the "
            f"window are older than the newest non-changed row inside it:"
        )
        for q, v in sorted(inversions, key=lambda x: x[1])[:10]:
            print(f"#   {q} r{v}")
        print(f"# (newest inside: up to r{worst_in}, e.g. {newest_inside[:3]})")
        return 1
    print("# current DRIVER_PRIORITY has no staleness inversion")
    return 0


if __name__ == "__main__":
    sys.exit(main())
