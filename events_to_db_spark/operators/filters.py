"""Projection / filter / predicate operators — SURVEY.md §2.2.

The AQL ``FILTER`` + ``SELECT`` stages: boolean algebra over
predicates, arithmetic projection, null semantics (missing JSON fields
surface as NULL in AQL), CASE bucketing, and the cast/coercion matrix.

All predicates here are pure Catalyst expressions — whole-stage
codegen'd, pushdown-eligible, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@query(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue,
           round(l_quantity + l_tax, 4)                 AS qty_plus_tax
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection (AQL SELECT expressions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.round(F.col("l_quantity") + F.col("l_tax"), 4).alias("qty_plus_tax"),
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_orderpriority LIKE '%MEDIUM%')
      AND o_totalprice BETWEEN 50000 AND 150000
      AND NOT o_orderstatus = 'P'
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate algebra: AND / OR / NOT / IN / BETWEEN / LIKE."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            | F.col("o_orderpriority").like("%MEDIUM%")
        )
        & F.col("o_totalprice").between(50000, 150000)
        & ~(F.col("o_orderstatus") == "P")
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q_filter_null",
    oracle="""
    SELECT c_mktsegment,
           count(*)                                                  AS n_all,
           count(nullif(least(c_acctbal, 0), 0))                     AS n_neg,
           count(CASE WHEN c_acctbal >= 0 THEN c_acctbal END)        AS n_nonneg,
           round(coalesce(avg(CASE WHEN c_acctbal >= 0 THEN c_acctbal END), -1), 4)
                                                                     AS avg_nonneg
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: IS NULL / count-skips-nulls / coalesce / nullif
    over a projected nullable expression (negative balances → NULL),
    mirroring AQL's missing-JSON-field-is-null behavior."""
    c = load_table(spark, sf_dir, "customer")
    nonneg = F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal"))  # else NULL
    neg_marker = F.nullif(F.least(F.col("c_acctbal"), F.lit(0.0)), F.lit(0.0))
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_all"),
        F.count(neg_marker).alias("n_neg"),
        F.count(nonneg).alias("n_nonneg"),
        F.round(F.coalesce(F.avg(nonneg), F.lit(-1.0)), 4).alias("avg_nonneg"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 200 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*)            AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-arm CASE bucketing (AQL ``CASE … ENDCASE``)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return ev.groupBy(bucket).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "q_cast_coercion",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CAST(trunc(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_int_price,
           min(CAST(o_orderkey AS VARCHAR))                         AS min_key_str,
           strftime(min(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE)), '%Y-%m-%d')
                                                                    AS min_date,
           CAST(sum(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)) AS BIGINT)
                                                                    AS sum_prio_digit,
           count(TRY_CAST(o_orderpriority AS INTEGER))              AS n_numeric
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_cast_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast/coercion matrix: DOUBLE→INT (truncating — DuckDB's CAST
    rounds, so the oracle goes through trunc() for parity), LONG→STRING,
    STRING→DATE round-trip, and try_cast of non-numeric text → NULL."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("long")).alias("sum_int_price"),
        F.min(F.col("o_orderkey").cast("string")).alias("min_key_str"),
        # DATE output would hash-mismatch (DuckDB→pandas yields midnight
        # timestamps, Spark yields datetime.date) — emit ISO string.
        F.date_format(
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd").cast("date")), "yyyy-MM-dd"
        ).alias("min_date"),
        F.sum(F.expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)")).alias(
            "sum_prio_digit"
        ),
        F.count(F.expr("try_cast(o_orderpriority AS INT)")).alias("n_numeric"),
    )
