"""Every registered query with an oracle must match DuckDB exactly —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from hdfs_hive_sql_playground_spark.oracle import compare
from hdfs_hive_sql_playground_spark.queries import all_queries

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
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
