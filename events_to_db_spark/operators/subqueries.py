"""Subquery surface — scalar and correlated subqueries (SURVEY.md §4:
Catalyst decorrelates; our DataFrame formulations are the decorrelated
shapes, the oracles keep the subquery syntax so DuckDB exercises its
own decorrelation and the results must still agree).

Complements §2.3's EXISTS/NOT EXISTS (semi/anti joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above the global average
    price.  DataFrame shape: the scalar aggregate broadcast-crossed
    onto the scan — one extra tiny stage, no per-row re-evaluation."""
    o = load_table(spark, sf_dir, "orders")
    global_avg = o.agg(F.avg("o_totalprice").alias("g_avg"))
    return (
        o.crossJoin(F.broadcast(global_avg))
        .filter(F.col("o_totalprice") > F.col("g_avg"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@query(
    "q_subquery_correlated",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_above
    FROM customer c
    WHERE c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2
        WHERE c2.c_mktsegment = c.c_mktsegment
    )
    GROUP BY c_mktsegment
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their own segment's
    average balance.  The decorrelated plan — aggregate once per
    segment, broadcast back — is what Catalyst produces for the
    subquery form; written directly here so the join is explicit and
    auditable."""
    c = load_table(spark, sf_dir, "customer")
    seg_avg = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.avg("c_acctbal").alias("seg_avg")
    )
    return (
        c.join(F.broadcast(seg_avg), c.c_mktsegment == seg_avg.seg)
        .filter(F.col("c_acctbal") > F.col("seg_avg"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_above"))
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT p_type, count(*) AS n
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
    )
    GROUP BY p_type
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery: parts that ever shipped in near-max quantity.
    Compiles to a left-semi join on the deduplicated subquery side."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.filter(F.col("l_quantity") >= 49).select(
        F.col("l_partkey").alias("p_partkey")
    )
    return (
        p.join(keys, "p_partkey", "left_semi")
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_cte_reuse",
    oracle="""
    WITH stats AS (
        SELECT o_custkey, count(*) AS n_orders,
               sum(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
    ),
    thr AS (SELECT avg(spend) AS cut FROM stats)
    SELECT c.c_mktsegment,
           CASE WHEN s.spend > t.cut THEN 'high' ELSE 'low' END AS tier,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(s.n_orders), 4) AS avg_orders,
           round(sum(s.spend), 4) AS total_spend
    FROM stats s
    CROSS JOIN thr t
    JOIN customer c ON c.c_custkey = s.o_custkey
    GROUP BY 1, 2
    """,
)
def q_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-table-expression reuse: one per-customer aggregate feeds
    both its own global mean (the high/low spend threshold) and the
    per-segment rollup — the WITH-clause factoring every analyst
    writes.  In the DataFrame API the shared subplan is a Python
    variable used twice; Catalyst plans both consumers and AQE's
    exchange reuse shares the aggregate's shuffle output, so the fact
    table is scanned once per consumer but never re-shuffled.  The
    threshold side is a 1-row aggregate crossed in broadcast-style
    (same shape as q_subquery_scalar); the customer join broadcasts
    the dimension."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    stats = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_totalprice").alias("spend"),
    )
    thr = stats.agg(F.avg("spend").alias("cut"))
    tier = F.when(F.col("spend") > F.col("cut"), "high").otherwise("low")
    return (
        stats.crossJoin(F.broadcast(thr))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment", tier.alias("tier"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("n_orders"), 4).alias("avg_orders"),
            F.round(F.sum("spend"), 4).alias("total_spend"),
        )
    )


@query(
    "q_subquery_notin",
    oracle="""
    WITH probe AS (
        SELECT c_mktsegment, nullif(c_nationkey, 3) AS nk FROM customer
    )
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
    FROM probe
    WHERE nk NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
    GROUP BY c_mktsegment
    """,
)
def q_subquery_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with NULLs — the classic three-valued-logic trap a naive
    anti-join gets wrong: a NULL probe value makes ``x NOT IN (…)``
    UNKNOWN, so rows with nationkey 3 (nulled via ``nullif``) must be
    EXCLUDED even though 3 is absent from the subquery list.  A plain
    left-anti join would keep them; the differential hash-match proves
    this engine implements the null-aware semantics.

    Expressed through ``spark.sql`` so Catalyst plans its null-aware
    anti join (single-key NOT IN compiles to NullAwareAntiJoin —
    broadcast-based, no cartesian fallback for the one-column case);
    the subquery side here is nation-sized, so the broadcast is free.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    return spark.sql(
        """
        WITH probe AS (
            SELECT c_mktsegment, nullif(c_nationkey, 3) AS nk
            FROM customer_v
        )
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
        FROM probe
        WHERE nk NOT IN (SELECT n_nationkey FROM nation_v
                         WHERE n_regionkey = 0)
        GROUP BY c_mktsegment
        """
    )


@query(
    "q_subquery_exists",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN EXISTS (
                        SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_urgent
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a projected boolean (the optimizer's "mark join"):
    each customer carries a did-they-ever-place-an-urgent-order flag
    that feeds an aggregate, rather than filtering rows — the shape
    reporting queries use constantly ("how many of each segment have
    X").  The oracle keeps the correlated EXISTS-in-SELECT form; the
    Spark plan is its decorrelation — distinct urgent custkeys, left
    join, null-test — and the hash-match proves the rewrite.

    Scale: the flag side is DISTINCT custkeys of urgent orders (bounded
    by |customers|), joined on the natural key; no per-row subquery
    execution anywhere.
    """
    c = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_urgent", F.lit(1))
    )
    return (
        c.join(urgent, "c_custkey", "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.coalesce(F.col("has_urgent"), F.lit(0))).alias(
                "n_with_urgent"
            ),
        )
    )
