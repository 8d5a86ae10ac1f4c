"""Scan / source operators — SURVEY.md §2.1.

The AQL ``FROM`` stage and the events-to-db source read: full scans,
predicate-pushdown scans, and schema-on-read JSON projection of the
dynamic event payload.

Scale notes: these queries are the pushdown showcase —
``q_scan_pushdown``'s physical plan must show ``PushedFilters`` at the
Parquet scan and a 2-column ``ReadSchema`` (verified in
tests/test_plans.py).  At 100 TB the same plan prunes row groups via
Parquet min/max stats and never deserializes untouched columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@query(
    "q_scan_project",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of ``region``, all columns (AQL ``FROM allEvents``
    analogue on the smallest table)."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "q_scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity > 45
    """,
)
def q_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + 2-column projection; predicate and projection both reach
    the Parquet reader (BASELINE.md B1)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_extendedprice")
    )


@query(
    "q_scan_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the dynamic JSON payload: project ``props.k``
    as a typed INT column (the Actyx free-form-payload pattern,
    SURVEY.md §1.1)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "q_sql_text",
    oracle="""
    SELECT o.o_orderpriority,
           count(DISTINCT o.o_orderkey) AS n_orders,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate
    GROUP BY o.o_orderpriority
    """,
)
def q_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point (SURVEY §3.2 lifecycle path 2): the same
    ANSI text the oracle runs, executed through ``spark.sql`` over temp
    views — proving a user can drive this engine with SQL strings, not
    just the DataFrame API, and land in the identical Catalyst plan
    space (the parser is the only difference; analyzer, optimizer, and
    physical planning are shared).  Semantics: TPC-H Q4-flavored late-
    shipment revenue by order priority over one order year."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_v"
    )
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               count(DISTINCT o.o_orderkey) AS n_orders,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                   AS revenue
        FROM orders_v o JOIN lineitem_v l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate > o.o_orderdate
        GROUP BY o.o_orderpriority
        """
    )
