"""Skew-mitigation helpers: salted two-phase aggregation.

AQE's skew-join splitting (on by default in :mod:`session`) handles skewed
JOINs at runtime, but a skewed GROUP BY key still funnels every row of the
hot key through one reducer at the final stage. Salting splits the hot key
across ``n_salts`` partial groups, then merges — two shuffles, each
balanced, instead of one unbalanced shuffle:

    groupBy(key, salt) partial-agg  →  groupBy(key) final-agg

Only algebraic aggregates (sum/count/min/max) compose this way; use it for
the 100 TB hot-key cases (null-heavy join keys, power-law user ids). For
uniform keys the plain single groupBy is strictly better — Catalyst already
does map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name → (merge_fn_name, partial_agg_column),
    e.g. ``{"n": ("sum", F.count(F.lit(1))), "mx": ("max", F.max("x"))}``.
    The salt is per-row and content-independent (row position mod n_salts):
    fully identical rows — the common hot-key case of repeated null-key /
    constant-payload rows — still spread across all n_salts partial groups,
    which a content-hash salt cannot do. The salt never reaches the output,
    so the merged result is reproducible regardless of salt assignment.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[col.alias(f"_p_{name}") for name, (_, col) in aggs.items()])
    )
    merged = partial.groupBy(*keys).agg(
        *[
            getattr(F, merge)(f"_p_{name}").alias(name)
            for name, (merge, _) in aggs.items()
        ]
    )
    return merged
