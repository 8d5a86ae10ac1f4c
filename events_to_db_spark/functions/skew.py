"""Skew-aware join salting (SURVEY.md §4, 100 TB posture).

A shuffled equi-join sends every row of a hot key to one reducer; at
scale one pathological key (the null user, the default tenant, the
bot account) serializes the whole stage.  AQE's skew-join split
handles *sort-merge* skew automatically, but when the hot side must be
hash-joined (or AQE is unavailable) the classic fix is salting:

* the BIG side gets a deterministic salt in ``[0, k)`` derived from a
  high-cardinality column — splitting each hot key into k sub-keys;
* the SMALL side is replicated k times, once per salt value;
* the join runs on ``(key, salt)`` and is followed by the normal
  aggregation/projection (no de-dup needed — each big-side row matches
  exactly one replica).

The salt is ``pmod(hash(salt_col), k)`` — deterministic, so retries
and re-runs shuffle identically (no ``rand()``; §7.5.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_left(big: DataFrame, salt_from: str | Column, k: int) -> DataFrame:
    """Add a deterministic salt column to the big (skewed) side."""
    return big.withColumn(SALT_COL, F.pmod(F.hash(salt_from), F.lit(k)))


def replicate_right(small: DataFrame, k: int) -> DataFrame:
    """Replicate the small side once per salt value."""
    return small.crossJoin(
        F.broadcast(
            small.sparkSession.range(k).select(F.col("id").cast("int").alias(SALT_COL))
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: str | Column,
    k: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle split k ways.

    ``salt_from`` should be high-cardinality and uncorrelated with the
    join key (a row id, an event id) so each hot key spreads evenly
    over its k sub-partitions.

    Only ``how`` in {inner, left, left_outer, left_semi, left_anti} is
    equivalence-preserving: each big-side row matches exactly one
    replica, so the result equals ``big.join(small, on, how)`` with
    the salt dropped (tests assert this).  Right/full-outer joins are
    REJECTED — the small side is replicated k times, so every
    unmatched small-side row would surface k times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not equivalence-preserving under "
            f"small-side replication; use one of {sorted(allowed)}"
        )
    left = salt_left(big, salt_from, k)
    right = replicate_right(small, k)
    return left.join(right, on + [SALT_COL], how).drop(SALT_COL)
