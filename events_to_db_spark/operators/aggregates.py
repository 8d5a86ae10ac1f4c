"""Aggregation operators — SURVEY.md §2.4.

Covers the full hash-aggregate family the AQL ``AGGREGATE`` stage and
any downstream SQL consumer of an events-to-db copy would run: grouped
sums/averages, distinct counts, statistical moments, HAVING,
conditional aggregation, ROLLUP / CUBE / GROUPING SETS, ordered array
collection, and pivot.

Scale notes (SURVEY.md §7.4): every query here is a pure
``groupBy().agg()`` plan — Catalyst plans it as partial (map-side)
HashAggregate → shuffle on the group keys → final HashAggregate, so the
shuffle carries only per-partition partial states, not rows.  Distinct
aggregates expand to the standard two-phase plan; approx variants use
HyperLogLog++ sketches that merge associatively (cluster-safe).  Float
outputs are rounded to 4 decimals for oracle hash-parity (SURVEY §7.5.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


def _r(col, alias):
    """round-4 + alias — the §7.5.1 hash-parity idiom."""
    return F.round(col, 4).alias(alias)


@query(
    "q_agg_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (flagship query).

    Grouped full-scan aggregation over the fact table: the canonical
    partial+final HashAggregate plan.  Only 4 of 11 lineitem columns are
    read (column pruning) and the shipdate predicate is pushed to the
    Parquet row-group stats.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity"), "sum_qty"),
            _r(F.sum("l_extendedprice"), "sum_base_price"),
            _r(F.sum(disc_price), "sum_disc_price"),
            _r(F.sum(disc_price * (1 + F.col("l_tax"))), "sum_charge"),
            _r(F.avg("l_quantity"), "avg_qty"),
            _r(F.avg("l_extendedprice"), "avg_price"),
            _r(F.avg("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
