"""Distributed global prefix sums — the scale-safe replacement for
``Window.orderBy(...)`` with no partition key.

An unpartitioned window forces every row through ONE task (Spark logs
``WindowExec: No Partition Defined``); fine for a grand total of a few
thousand aggregated rows, fatal when the input grows with users or
sessions.  The classic two-level parallel-scan shape fixes it:

1. bucket rows by a coarse, *order-aligned* key (ascending bucket ⇔
   ascending global order), e.g. the day for a timeline sweep or a
   value range for a rank;
2. run the running sum INSIDE each bucket with a partitioned window;
3. compute per-bucket totals (one small aggregate) and each bucket's
   carry-in — the sum over strictly-smaller buckets — with a broadcast
   θ-join (buckets² pairs, buckets ≪ rows);
4. global prefix = within-bucket prefix + carry-in.

All shuffles are keyed; nothing is single-partition; the θ-join side is
|buckets| rows (bounded by the bucketing width chosen by the caller).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bucketed_running_sum", "bucketed_running_max"]


def bucketed_running_sum(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    sums: dict[str, Column],
) -> DataFrame:
    """Append global running sums over a total order, without a global
    window.

    ``bucket`` must ascend with the global order defined by
    ``order_cols`` (rows in a smaller bucket sort strictly before rows
    in a larger one).  ``sums`` maps output column name -> summed value
    expression; each output holds the inclusive running sum of its
    value in global ``order_cols`` order.  Pass ``F.lit(1)`` as a value
    to get a global row number (when the order is unique).
    """
    names = list(sums)
    d = df.withColumn("_pb", bucket)
    w_in = (
        Window.partitionBy("_pb")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for name in names:
        d = d.withColumn(f"_in_{name}", F.sum(sums[name]).over(w_in))

    totals = d.groupBy("_pb").agg(
        *[F.sum(sums[name]).alias(f"_tot_{name}") for name in names]
    )
    rhs = totals.select(
        F.col("_pb").alias("_pb2"),
        *[F.col(f"_tot_{name}").alias(f"_tot2_{name}") for name in names],
    )
    carry = (
        totals.select("_pb")
        .join(F.broadcast(rhs), F.col("_pb2") < F.col("_pb"), "left")
        .groupBy("_pb")
        .agg(
            *[
                F.coalesce(F.sum(f"_tot2_{name}"), F.lit(0)).alias(f"_carry_{name}")
                for name in names
            ]
        )
    )
    d = d.join(F.broadcast(carry), "_pb")
    for name in names:
        d = d.withColumn(name, F.col(f"_in_{name}") + F.col(f"_carry_{name}"))
    drop = ["_pb"] + [f"_in_{n}" for n in names] + [f"_carry_{n}" for n in names]
    return d.drop(*drop)


def bucketed_running_max(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    value: Column,
    out: str,
) -> DataFrame:
    """Append the inclusive global running MAX of ``value`` over a total
    order, without a global window — same two-level shape as
    :func:`bucketed_running_sum` (max is associative, so the carry-in is
    the max over strictly-smaller buckets)."""
    d = df.withColumn("_pb", bucket)
    w_in = (
        Window.partitionBy("_pb")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_in_max", F.max(value).over(w_in))

    totals = d.groupBy("_pb").agg(F.max(value).alias("_tot_max"))
    rhs = totals.select(
        F.col("_pb").alias("_pb2"), F.col("_tot_max").alias("_tot2_max")
    )
    carry = (
        totals.select("_pb")
        .join(F.broadcast(rhs), F.col("_pb2") < F.col("_pb"), "left")
        .groupBy("_pb")
        .agg(F.max("_tot2_max").alias("_carry_max"))
    )
    d = d.join(F.broadcast(carry), "_pb")
    d = d.withColumn(out, F.greatest(F.col("_in_max"), F.col("_carry_max")))
    # greatest(x, NULL) = x in Spark (null-skipping), matching "no
    # smaller bucket" for the first bucket.
    return d.drop("_pb", "_in_max", "_carry_max")


def ntile_from_rank(rank: Column, n_total: Column, k: int) -> Column:
    """Exact ``ntile(k)`` from a unique 1-based global rank: the first
    ``n mod k`` tiles get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` —
    the same fill rule Spark and DuckDB implement."""
    q = F.floor(n_total / k)
    rem = n_total % k
    big = rem * (q + 1)
    return F.when(rank <= big, F.ceil(rank / (q + 1))).otherwise(
        rem + F.ceil((rank - big) / q)
    )
