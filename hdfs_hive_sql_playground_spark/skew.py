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
    The salt is deterministic (hash of all columns mod n_salts) so results
    are reproducible; any uniform-ish salt works.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("_salt")
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
