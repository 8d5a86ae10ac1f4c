"""Classic TPC-H-shaped analytics queries (SURVEY.md §2.12, round 2).

The decision-support suite every warehouse engine is judged on,
adapted to this corpus's column subset (no partsupp / commitdate /
shipmode — adaptations are noted per query).  Q1 and Q5 shapes already
exist as ``q_agg_q1`` / ``q_join_multiway``; this module adds the rest
of the canonical join/agg/subquery shapes: Q3, Q7, Q8, Q9, Q10, Q13,
Q14, Q17, Q18, Q22.

Determinism (SURVEY §7.5): every revenue figure is assembled on exact
BIGINT "e4 dollars" — ``cents(l_extendedprice) × (100 − discount_pct)``
— so sums, ratios, and top-k orderings never depend on float summation
order.  Floats appear only in one final division of identical integers,
rounded to 2–6 places.  Top-k orderings always order on the exact
integer with a unique key tie-break.

Overflow posture: per-row rev_e4 ≤ ~1e9; a 1e12-row fact sum stays
inside BIGINT up to ~9e18 — at that scale move the sum to
DECIMAL(38,0) (one-line change, noted inline).

Scale notes (100 TB posture): every query keeps the lineitem fact
pipeline shuffle-free until the final small aggregate — selective
dimension sides (filtered customer⋈orders, brand-filtered parts,
two-nation supplier/customer slices) are built first and broadcast
onto the fact scan.  Each broadcast degrades gracefully to AQE's
shuffled join if the filtered side outgrows the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


def _cents(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def _rev_e4() -> F.Column:
    """Exact revenue in $1e-4 units: cents(extendedprice) × (100 − disc%)."""
    return _cents("l_extendedprice") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )


_REV_E4_SQL = (
    "CAST(round(l_extendedprice*100) AS BIGINT)"
    " * (100 - CAST(round(l_discount*100) AS BIGINT))"
)


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           round(CAST(sum({_REV_E4_SQL}) AS DOUBLE) / 10000.0, 4) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY sum({_REV_E4_SQL}) DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: top-10 unshipped orders by revenue
    for one market segment (o_shippriority column absent — dropped).

    Plan: BUILDING customers ⋈ date-filtered orders is a bounded slice
    of the order book — built once, broadcast onto the lineitem scan;
    the fact is never shuffled before the per-order aggregate.  Top-k
    via TakeOrderedAndProject on the exact rev_e4 integer.
    """
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    co = F.broadcast(o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey")))
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
        .orderBy(F.col("rev_e4").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("rev_e4").cast("double") / 10000.0, 4).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           round(CAST(sum({_REV_E4_SQL}) AS DOUBLE) / 10000.0, 4) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two trading nations, by
    direction and ship year.

    Plan: customer and supplier are first restricted to the two
    nations (a 2/25 slice), the customer slice ⋈ orders builds the
    broadcast side, and the date filter on l_shipdate is pushed to the
    fact scan — lineitem flows through two broadcast hash joins and
    one 6-row aggregate with no fact shuffle.
    """
    nations = ("NATION_3", "NATION_8")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load_table(spark, sf_dir, "orders")
    co = F.broadcast(
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey")).select(
            "o_orderkey", "cust_nation"
        )
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round(F.col("rev_e4").cast("double") / 10000.0, 4).alias("revenue"),
        )
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum(CASE WHEN n1.n_name = 'NATION_5'
                               THEN {_REV_E4_SQL} ELSE 0 END) AS DOUBLE)
                 / sum({_REV_E4_SQL}), 6) AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region   ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_5 suppliers' share of
    PROMO-part revenue sold to ASIA customers, by order year.

    The share is a ratio of two exact BIGINT sums computed in one
    conditional aggregate — no float-sum-dependent numerator.  PROMO
    parts (1/6 of parts) broadcast onto the fact first so the most
    selective filter prunes before the orders join.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    co = F.broadcast(
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey")).select(
            "o_orderkey", "o_orderdate"
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = _rev_e4()
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0))).alias(
                "num_e4"
            ),
            F.sum(rev).alias("den_e4"),
        )
        .select(
            "o_year",
            F.round(F.col("num_e4").cast("double") / F.col("den_e4"), 6).alias(
                "mkt_share"
            ),
        )
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum({_REV_E4_SQL}
                 - CAST(round(p_retailprice*100) AS BIGINT)
                   * CAST(l_quantity AS BIGINT) * 100) AS DOUBLE)
                 / 10000.0, 4) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (adapted: no partsupp table, so
    unit cost is p_retailprice instead of ps_supplycost).

    profit = revenue − retail_cost·qty, all in exact $1e-4 BIGINTs.
    The %gear% LIKE prunes parts before broadcast; orders joins on the
    fact's orderkey without a date filter, so at 100 TB this is the one
    query here whose orders side is big — AQE will pick a shuffled
    hash join for it while the part/supplier/nation sides stay
    broadcast (the code leaves orders unhinted for exactly that).
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = F.broadcast(
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    amount = _rev_e4() - _cents("p_retailprice") * F.col("l_quantity").cast(
        "bigint"
    ) * F.lit(100)
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(amount).alias("profit_e4"))
        .select(
            "nation",
            "o_year",
            F.round(F.col("profit_e4").cast("double") / 10000.0, 4).alias("profit"),
        )
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           round(CAST(sum({_REV_E4_SQL}) AS DOUBLE) / 10000.0, 4) AS revenue,
           round(c_acctbal, 2) AS acctbal,
           n_name AS nation
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum({_REV_E4_SQL}) DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by revenue
    lost to returns in one quarter.

    One-quarter orders ⋈ customer⋈nation broadcasts onto the
    returnflag-filtered fact scan; top-k on the exact integer with
    custkey tie-break (§7.5 — float revenue never orders anything).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")).select(
        "c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation")
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    co = F.broadcast(
        o.join(F.broadcast(cn), F.col("c_custkey") == F.col("o_custkey")).select(
            "o_orderkey", "c_custkey", "c_name", "c_acctbal", "nation"
        )
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
        .orderBy(F.col("rev_e4").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("rev_e4").cast("double") / 10000.0, 4).alias("revenue"),
            F.round("c_acctbal", 2).alias("acctbal"),
            "nation",
        )
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders
          ON c_custkey = o_custkey
         AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution (adapted: the
    o_comment NOT LIKE filter becomes "priority is specified").

    Two hash aggregates: orders pre-aggregates per custkey FIRST (the
    count survives the join), then a left join from customer fills the
    zero bucket, then a tiny histogram agg.  Pre-aggregating before
    the join is the scale move — the join carries one row per
    customer, not one per order.
    """
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    return (
        c.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
           round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                       THEN {_REV_E4_SQL} ELSE 0 END) AS DOUBLE)
                 / sum({_REV_E4_SQL}), 6) AS promo_share,
           round(CAST(sum({_REV_E4_SQL}) AS DOUBLE) / 10000.0, 4) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion-revenue share, widened to a per-month
    series over one year.

    part is a pure broadcast dim (only p_type rides along); the share
    is a conditional-sum ratio on exact integers rounded once.
    """
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = _rev_e4()
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
                "promo_e4"
            ),
            F.sum(rev).alias("total_e4"),
        )
        .select(
            "ship_month",
            F.round(
                F.lit(100.0) * F.col("promo_e4").cast("double") / F.col("total_e4"), 6
            ).alias("promo_share"),
            F.round(F.col("total_e4").cast("double") / 10000.0, 4).alias("revenue"),
        )
    )


@query(
    "q_tpch_q17",
    oracle="""
    WITH pq AS (
        SELECT l_partkey,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n_li
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_small,
           round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
                 / 100.0 / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq   ON pq.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#1'
      AND 5 * pq.n_li * CAST(l_quantity AS BIGINT) < pq.sum_qty
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: lineitems of one brand
    whose quantity is below 20% of that part's average order quantity.

    The correlated avg becomes a per-part pre-aggregate joined back to
    the fact; the float threshold ``qty < 0.2·avg`` is carried as the
    exact integer cross-product ``5·n·qty < Σqty`` so both engines
    make identical keep/drop decisions.  Per-part agg and the join
    both hash on l_partkey — one shuffle, reused (co-partitioned) by
    the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        F.count("*").cast("bigint").alias("n_li"),
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(pq, F.col("l_partkey") == F.col("pq_partkey"))
        .where(
            F.lit(5) * F.col("n_li") * F.col("l_quantity").cast("bigint")
            < F.col("sum_qty")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_small"),
            F.round(
                F.sum(_cents("l_extendedprice")).cast("double") / 100.0 / 7.0, 4
            ).alias("avg_yearly"),
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey AS bok, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY 1
        HAVING sum(l_quantity) > 300
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           total_qty
    FROM big
    JOIN orders   ON o_orderkey = bok
    JOIN customer ON c_custkey = o_custkey
    ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds 300, top-100 by order value.

    The HAVING pre-aggregate shrinks the fact to a handful of
    orderkeys BEFORE any join (the classic agg-then-join inversion);
    ordering is on exact price cents with orderkey tie-break.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bok"))
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("bok"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(_cents("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


@query(
    "q_tpch_q22",
    oracle="""
    WITH pos AS (
        SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM customer WHERE c_acctbal > 0
    ),
    recent AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-06-01'
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           round(CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS totacctbal
    FROM customer CROSS JOIN pos
    WHERE CAST(round(c_acctbal*100) AS BIGINT) * pos.n > pos.s
      AND c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (adapted: "no orders at
    all" is empty on this corpus — the lapse window is "no orders
    since 2000-06-01"; the phone-prefix filter has no phone column).

    Rich customers (balance above the positive-balance average, an
    exact integer comparison via acctbal·n > Σ) with no recent
    orders, per nation.  Shapes: scalar-aggregate cross join + anti
    join + group.  The anti join's right side (recent custkeys) is
    date-pruned at the orders scan.
    """
    c = load_table(spark, sf_dir, "customer")
    pos = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            F.sum(_cents("c_acctbal")).alias("s"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .where(_cents("c_acctbal") * F.col("n") > F.col("s"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.round(F.sum(_cents("c_acctbal")).cast("double") / 100.0, 2).alias(
                "totacctbal"
            ),
        )
        .orderBy("c_nationkey")
    )
