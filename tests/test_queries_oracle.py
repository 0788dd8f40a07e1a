"""Every registered query with an oracle must match DuckDB exactly —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from hdfs_hive_sql_playground_spark.oracle import compare
from hdfs_hive_sql_playground_spark.queries import all_queries

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    from hdfs_hive_sql_playground_spark.caching import release_tracked_caches

    spec = SPECS[name]
    try:
        df = spec.fn(spark, sf_dir)
        assert df is not None
        if spec.oracle is None:
            # Rows-only check (non-SQL-expressible operator): must run and
            # produce a stable schema.
            n = df.count()
            assert n >= 0
            return
        result = compare(name, df, spec.oracle, sf_dir)
        assert result.ok, result.report()
    finally:
        # multi-consumer queries persist intermediates; don't let 134
        # parametrized runs accumulate them in one session
        release_tracked_caches()


def test_driver_window_composition():
    """The driver gate consumes the first 50 registry entries: the window
    must be exactly 50 unique registered names (a typo here silently
    shrinks the gate to whatever subset resolves)."""
    from hdfs_hive_sql_playground_spark.queries import DRIVER_PRIORITY

    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    unknown = [n for n in DRIVER_PRIORITY if n not in SPECS]
    assert unknown == [], unknown


def test_compare_rejects_wrong_results(spark, sf_dir):
    """The gate must be able to FAIL: value, column-name and row-count
    mismatches each produce ok=False (a comparator that cannot reject is
    indistinguishable from one that isn't checking)."""
    df = spark.sql("SELECT CAST(1 AS BIGINT) AS x")
    assert compare("meta_ok", df, "SELECT CAST(1 AS BIGINT) AS x", sf_dir).ok
    assert not compare("meta_value", df, "SELECT CAST(2 AS BIGINT) AS x", sf_dir).ok
    assert not compare("meta_schema", df, "SELECT CAST(1 AS BIGINT) AS y", sf_dir).ok
    assert not compare(
        "meta_rows",
        df,
        "SELECT CAST(1 AS BIGINT) AS x UNION ALL SELECT CAST(1 AS BIGINT)",
        sf_dir,
    ).ok
