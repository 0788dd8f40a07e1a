"""Invariants of the driver's correctness window (DRIVER_PRIORITY).

The per-round driver hash-checks the FIRST 50 registry entries in
insertion order; the window is hand-rotated each round (stalest greens
first, plus changed queries — see queries/__init__.py and
scripts/propose_window.py). These guards catch rotation typos the moment
they're made instead of in the round's CORRECTNESS file.
"""

from __future__ import annotations

from hdfs_hive_sql_playground_spark.queries import DRIVER_PRIORITY, all_queries


def test_window_is_50_unique_registered_names():
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50, "duplicate name in the window"
    specs = all_queries()
    missing = [q for q in DRIVER_PRIORITY if q not in specs]
    assert not missing, f"window names not in registry: {missing}"


def test_window_leads_registry_insertion_order():
    """The driver takes the first 50 of all_queries() — the window is only
    effective if DRIVER_PRIORITY actually leads the iteration order."""
    first_50 = list(all_queries())[:50]
    assert first_50 == list(DRIVER_PRIORITY)


def test_window_queries_are_oracle_checked():
    """Every window slot should buy a HASH row: an oracle-less query in
    the window wastes a slot on a rows-only check (the q06 policy —
    rows-only queries are covered by their hash-checked companions and
    bench instead)."""
    specs = all_queries()
    oracle_less = [q for q in DRIVER_PRIORITY if specs[q].oracle is None]
    assert not oracle_less, oracle_less
