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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join salting: salt the BIG side per-row and replicate
    the small side once per salt value, so a single hot join key becomes
    ``n_salts`` balanced shuffle keys.

    Reach for this when the small side is too large to broadcast AND the
    skew is concentrated enough that AQE's skew-split (which only splits
    oversized partitions of the ALREADY-shuffled big side) still leaves a
    straggler — the classic power-law user_id ⋈ profile case. The salt is
    row-position based (content-independent), never reaches the output,
    and the join result is row-for-row identical to the unsalted join.

    Only ``inner`` and ``left`` are supported: a right/full join would
    emit the small side's unmatched rows once per replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [*on, "_salt"], how).drop("_salt")
