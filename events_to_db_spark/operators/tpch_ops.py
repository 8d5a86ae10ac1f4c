"""Classic TPC-H-shaped analytics queries (SURVEY.md §2.12, round 2).

The decision-support suite every warehouse engine is judged on,
adapted to this corpus's column subset (no partsupp / commitdate /
shipmode — adaptations are noted per query).  Q1 and Q5 shapes already
exist as ``q_agg_q1`` / ``q_join_multiway``; this module adds the rest
of the canonical join/agg/subquery shapes: Q2, Q3, Q4, Q6, Q7, Q8, Q9,
Q10, Q11, Q13, Q14, Q15, Q16, Q17, Q18, Q19, Q20, Q22, plus adapted
Q12/Q21 (their shipmode/commit-receipt-date columns do not exist in
this corpus, so Q12 dimensions on ``l_returnflag`` and Q21's
"kept the order waiting" predicate is re-expressed on ``l_shipdate`` —
the join/correlation shapes are preserved exactly).

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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.plans.prefix import bucketed_running_sum
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


@query(
    "q_tpch_q2",
    oracle="""
    WITH shipped AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ranked AS (
        SELECT p_partkey, p_name, s_name,
               round(s_acctbal, 2) AS acctbal,
               n_name AS nation,
               row_number() OVER (
                   PARTITION BY p_partkey
                   ORDER BY CAST(round(s_acctbal*100) AS BIGINT), s_suppkey
               ) AS rn
        FROM part
        JOIN shipped  ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_type = 'LARGE' AND p_size BETWEEN 20 AND 30
          AND r_name = 'EUROPE'
    )
    SELECT p_partkey, p_name, s_name, acctbal, nation
    FROM ranked WHERE rn = 1
    ORDER BY p_partkey
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (adapted: no partsupp, so
    "supplies the part" = shipped it per lineitem, and cost =
    s_acctbal as the ranking measure).

    Per-part argmin over a join: distinct (part, supp) pairs from the
    fact (one partkey-hashed aggregate), part/supplier/nation/region
    dims broadcast, then a window ranked on exact balance cents with
    suppkey tie-break (§7.5).  The window partitions by p_partkey —
    bounded group size (suppliers per part), no global sort.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    shipped = li.select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(20, 30)
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    w = Window.partitionBy("p_partkey").orderBy(_cents("s_acctbal"), "s_suppkey")
    return (
        shipped.join(
            F.broadcast(p.select("p_partkey", "p_name")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            "nation",
        )
        .orderBy("p_partkey")
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: no commitdate /
    receiptdate, so "late" = some lineitem shipped more than 60 days
    after the order date).

    The EXISTS becomes a left-semi join with a mixed equi + non-equi
    condition — the equi key (orderkey) still hashes, the date
    comparison rides along as a join residual, so this stays a hash
    semi join, not a theta join.  Quarter filter prunes the orders
    scan first.
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_li,
           round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                          * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)
                 / 10000.0, 4) AS revenue_gain
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue change: what discounts in the
    5–7% band cost over one year.

    Pure scan-filter-aggregate — the whole predicate (dates, discount
    band on exact percent ints, quantity) sits in one WholeStageCodegen
    span over the parquet scan; the date range prunes row groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & disc_pct.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").cast("bigint").alias("n_li"),
            F.round(
                F.sum(_cents("l_extendedprice") * disc_pct).cast("double") / 10000.0,
                4,
            ).alias("revenue_gain"),
        )
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(p_retailprice*100) AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_c
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(value_c) AS BIGINT) AS total_c,
                   CAST(count(*) AS BIGINT) AS n_parts
            FROM per_part)
    SELECT l_partkey AS p_partkey,
           round(CAST(value_c AS DOUBLE) / 100.0, 2) AS part_value
    FROM per_part CROSS JOIN tot
    WHERE value_c * n_parts * 4 > 5 * total_c
    ORDER BY value_c DESC, l_partkey
    LIMIT 50
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock (adapted: no partsupp — "inventory
    value" is shipped quantity × retail price from the fact).

    Parts whose value exceeds 1.25× the mean part value — a
    scale-free threshold (the classic 0.0001/SF fraction empties as SF
    grows; 1.25× keeps a non-trivial frontier at every tested SF),
    carried as the exact integer cross-product
    ``value·n·4 > 5·total``.  The
    per-part aggregate is computed ONCE and reused for both the total
    (a second tiny agg over it) and the filter — at scale this is one
    fact shuffle, one 1-row broadcast, zero recomputation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    per_part = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(_cents("p_retailprice") * F.col("l_quantity").cast("bigint")).alias(
                "value_c"
            )
        )
    )
    tot = per_part.agg(
        F.sum("value_c").alias("total_c"),
        F.count("*").cast("bigint").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .where(F.col("value_c") * F.col("n_parts") * 4 > 5 * F.col("total_c"))
        .orderBy(F.col("value_c").desc(), "l_partkey")
        .limit(50)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_c").cast("double") / 100.0, 2).alias("part_value"),
        )
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, CAST(sum({_REV_E4_SQL}) AS BIGINT) AS rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY 1
    ),
    mx AS (SELECT CAST(max(rev_e4) AS BIGINT) AS max_e4 FROM rev)
    SELECT s_suppkey, s_name,
           round(CAST(rev_e4 AS DOUBLE) / 10000.0, 4) AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    CROSS JOIN mx
    WHERE rev_e4 = max_e4
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: supplier(s) achieving the maximum
    quarterly revenue.

    The view becomes a per-supplier aggregate reused twice (revenue +
    its max) — equality against the max is exact on the e4 integer, so
    "ties both appear" deterministically, the float never decides.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_e4()).alias("rev_e4"))
    mx = rev.agg(F.max("rev_e4").alias("max_e4"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_e4") == F.col("max_e4"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .orderBy("s_suppkey")
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_e4").cast("double") / 10000.0, 4).alias(
                "total_revenue"
            ),
        )
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size BETWEEN 1 AND 15
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 200
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 part/supplier relationship count (adapted: supplier
    set per part comes from lineitem, no partsupp or comment filter).

    COUNT(DISTINCT) over a broadcast-dim join; Spark plans the
    distinct as a two-phase partial/final expand — no row explosion
    crosses the wire beyond (brand,type,size,suppkey) pairs.
    """
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").between(1, 15)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(200)
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_li,
           round(CAST(sum({_REV_E4_SQL}) AS DOUBLE) / 10000.0, 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1  AND 15
           AND l_quantity BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 40
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue under a disjunction of brand ×
    size × quantity bands (adapted: no container/shipmode legs).

    The OR-of-ANDs is the classic disjunctive-pushdown test: the
    part-side legs (brand, size) filter the broadcast build side down
    to three slivers before the probe, and the quantity legs evaluate
    as join residuals inside codegen — no double scan, no union.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 25))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(20, 40))
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & q.between(1, 10))
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 40)
            & q.between(20, 30)
        )
    )
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .where(cond)
        .agg(
            F.count("*").cast("bigint").alias("n_li"),
            F.round(F.sum(_rev_e4()).cast("double") / 10000.0, 4).alias("revenue"),
        )
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH gear AS (
        SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'
    ),
    per_supp AS (
        SELECT l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
        FROM lineitem JOIN gear ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
    ),
    avg_s AS (
        SELECT CAST(sum(qty) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        FROM per_supp
    )
    SELECT s_suppkey, s_name, qty AS gear_qty
    FROM per_supp
    JOIN supplier ON s_suppkey = l_suppkey
    CROSS JOIN avg_s
    WHERE qty * n > s
    ORDER BY qty DESC, s_suppkey
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (adapted: no partsupp
    availqty — "excess supplier" = shipped more gear-part quantity in
    1997 than the average supplier of gear parts).

    Nested-subquery chain flattened to: LIKE-pruned part broadcast →
    per-supplier integer aggregate → 1-row scalar broadcast → exact
    ``qty·n > Σ`` threshold — the same decorrelation Catalyst would
    have to find, written directly.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    per_supp = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
    )
    avg_s = per_supp.agg(
        F.sum("qty").alias("s"), F.count("*").cast("bigint").alias("n")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.crossJoin(F.broadcast(avg_s))
        .where(F.col("qty") * F.col("n") > F.col("s"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .orderBy(F.col("qty").desc(), "s_suppkey")
        .select("s_suppkey", "s_name", F.col("qty").alias("gear_qty"))
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('R', 'A')
      AND l_linestatus = 'F'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority audit (adapted: no l_shipmode
    column — the reporting dimension is ``l_returnflag`` and the
    receipt-date window becomes a ship-date window; the
    orders⋈lineitem shape and the priority-bucket conditional counts
    are the canonical Q12 ones).

    Plan: the ship-date + flag predicates prune the fact scan
    (PushedFilters), then one shuffle on l_orderkey joins the order
    priorities in; at 100 TB both sides are fact-scale, so a shuffled
    hash join on the natural key is the right physical choice (no
    broadcast attempt) and the final 2-row aggregate is map-side
    partial.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_linestatus") == "F")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s_suppkey, s_name,
           CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_suppkey
    LIMIT 10
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers-who-kept-orders-waiting (adapted: no
    commit/receipt dates — "waiting on supplier s" becomes "s shipped
    the latest line of a multi-supplier finalized order and nobody
    else shipped later").  The oracle keeps the canonical
    double-correlated EXISTS / NOT-EXISTS form; the Spark plan is its
    decorrelation, and the differential hash-match proves the rewrite:

        s qualifies on order o
            ⟺ ∃ line l1 of (o,s):  no other-supplier line ships later
            ⟺ max_ship(o,s) ≥ max over other suppliers
            ⟺ max_ship(o,s) = max_ship(o)   and  n_suppliers(o) > 1

    Plan: ONE lineitem scan, one shuffle on l_orderkey shared by the
    F-status orders semi-join, the per-(order,supplier) aggregate, and
    the per-order roll-up — the roll-up runs as a WINDOW over the
    l_orderkey partition rather than a groupBy + self-join, which
    would rescan and re-shuffle the fact (the first draft did; the
    plan test pins the single scan).  Qualifying pairs then aggregate
    per supplier (one small shuffle) and TakeOrdered yields the
    top-10.  Both correlated subqueries collapse into that single
    fact-key partitioning — the decorrelation a 100 TB run needs,
    since the EXISTS form would otherwise rescan lineitem twice.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_so = (
        li.join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_max"))
    )
    w = Window.partitionBy("l_orderkey")
    qual = (
        per_so.withColumn("o_max", F.max("s_max").over(w))
        .withColumn("n_supp", F.count("*").over(w))
        .where((F.col("n_supp") > 1) & (F.col("s_max") == F.col("o_max")))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qual.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(10)
        .select("s_suppkey", "s_name", "numwait")
    )


@query(
    "q_ord_pvm",
    oracle="""
    WITH y AS (
        SELECT o_orderpriority AS pri,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS r,
               CAST(count(*) AS BIGINT) AS q
        FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        GROUP BY 1, 2
    ),
    w AS (
        SELECT a.pri, a.r AS r0, a.q AS q0, b.r AS r1, b.q AS q1
        FROM y a JOIN y b ON a.pri = b.pri
        WHERE a.yr = 1996 AND b.yr = 1997
    ),
    eff AS (
        SELECT pri, r0, q0, r1, q1,
               r1 - r0 AS delta_r,
               r1 - CASE WHEN q1 * r0 < 0
                         THEN -(abs(q1 * r0) // q0)
                         ELSE abs(q1 * r0) // q0 END AS price_eff,
               CASE WHEN (q1 - q0) * r0 < 0
                    THEN -(abs((q1 - q0) * r0) // q0)
                    ELSE abs((q1 - q0) * r0) // q0 END AS vol_eff
        FROM w
    )
    SELECT pri AS o_orderpriority, r0, q0, r1, q1,
           CAST(delta_r AS BIGINT) AS delta_r,
           CAST(price_eff AS BIGINT) AS price_eff_cents,
           CAST(vol_eff AS BIGINT) AS vol_eff_cents,
           CAST(delta_r - price_eff - vol_eff AS BIGINT)
               AS residual_cents
    FROM eff
    """,
)
def q_ord_pvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge: decompose each priority class's
    1996→1997 revenue change into a price effect (average order value
    moved) and a volume effect (order count moved), with the floor-
    truncation residual reported rather than hidden — the classic
    finance variance-analysis walk.

    price = r1 − q1·r0/q0 and volume = (q1−q0)·r0/q0, both taken with
    the sign-safe floor division (sign·(|x|//q0)) so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree on negative
    numerators; everything else is exact cents.  One year-filtered
    keyed aggregate + a |priorities|-row self-join — scan-bound at any
    scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    y = (
        orders.where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint)")
            ).alias("r"),
            F.count("*").alias("q"),
        )
    )
    a = y.where(F.col("yr") == 1996).select(
        "pri", F.col("r").alias("r0"), F.col("q").alias("q0")
    )
    b = y.where(F.col("yr") == 1997).select(
        "pri", F.col("r").alias("r1"), F.col("q").alias("q1")
    )
    w = a.join(b, "pri")
    pe_num = F.col("q1") * F.col("r0")
    ve_num = (F.col("q1") - F.col("q0")) * F.col("r0")
    price_eff = F.col("r1") - F.when(
        pe_num < 0, -F.expr("abs(q1 * r0) div q0")
    ).otherwise(F.expr("abs(q1 * r0) div q0"))
    vol_eff = F.when(
        ve_num < 0, -F.expr("abs((q1 - q0) * r0) div q0")
    ).otherwise(F.expr("abs((q1 - q0) * r0) div q0"))
    delta = F.col("r1") - F.col("r0")
    return w.select(
        F.col("pri").alias("o_orderpriority"),
        "r0",
        "q0",
        "r1",
        "q1",
        delta.cast("long").alias("delta_r"),
        price_eff.cast("long").alias("price_eff_cents"),
        vol_eff.cast("long").alias("vol_eff_cents"),
        (delta - price_eff - vol_eff).cast("long").alias("residual_cents"),
    )


@query(
    "q_ord_abcxyz",
    oracle="""
    WITH m AS (
        SELECT CAST(count(DISTINCT date_trunc('month', l_shipdate))
                    AS BIGINT) AS mm
        FROM lineitem
    ),
    per AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem GROUP BY 1
    ),
    mon AS (
        SELECT l_partkey, date_trunc('month', l_shipdate) AS mo,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
        SELECT l_partkey,
               CAST(sum(q) AS BIGINT) AS s,
               CAST(sum(q * q) AS BIGINT) AS s2
        FROM mon GROUP BY 1
    ),
    cum AS (
        SELECT p.l_partkey, p.r,
               sum(p.r) OVER (ORDER BY p.r DESC, p.l_partkey) AS cum_r,
               sum(p.r) OVER () AS tot_r
        FROM per p
    ),
    cls AS (
        SELECT c.l_partkey, c.r,
               CASE WHEN 5 * c.cum_r <= 4 * c.tot_r THEN 'A'
                    WHEN 20 * c.cum_r <= 19 * c.tot_r THEN 'B'
                    ELSE 'C' END AS abc,
               CASE WHEN 4 * (m.mm * x.s2 - x.s * x.s) <= x.s * x.s
                        THEN 'X'
                    WHEN m.mm * x.s2 - x.s * x.s <= x.s * x.s THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM cum c
        JOIN xyz x ON x.l_partkey = c.l_partkey
        CROSS JOIN m
    )
    SELECT abc, xyz,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(r) AS BIGINT) AS revenue_cents
    FROM cls
    GROUP BY 1, 2
    """,
)
def q_ord_abcxyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC–XYZ inventory segmentation: parts classed A/B/C by revenue
    Pareto position (cum share ≤80% / ≤95% / rest) and X/Y/Z by demand
    variability (CV of monthly quantity ≤0.5 / ≤1 / rest) — the 9-cell
    matrix purchasing teams plan stock policy from.

    Both classifications are pure integer predicates: the Pareto cut
    is 5·cum ≤ 4·tot (no percentage float), and CV thresholds
    cross-multiply to 4·(M·Σq²−S²) ≤ S² — months with zero demand
    included via the global month count M.  The revenue cumulative
    runs through the two-level bucketed scan keyed by descending
    revenue (negated-bucket trick keeps the bucket ascending with the
    order; no unpartitioned window).  Everything after the two keyed
    lineitem aggregates is |parts|-sized.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.countDistinct(F.date_trunc("month", "l_shipdate"))
        .cast("long")
        .alias("mm")
    )
    per = li.groupBy("l_partkey").agg(
        F.sum(F.expr("cast(round(l_extendedprice * 100) as bigint)")).alias(
            "r"
        )
    )
    mon = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("mo")
    ).agg(F.sum(F.expr("cast(round(l_quantity) as bigint)")).alias("q"))
    xyz = mon.groupBy("l_partkey").agg(
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("s2"),
    )
    cum = bucketed_running_sum(
        per,
        -F.expr("r div 10000000"),
        [F.col("r").desc(), F.col("l_partkey")],
        {"cum_r": F.col("r")},
    )
    tot = per.agg(F.sum("r").cast("long").alias("tot_r"))
    cls = (
        cum.crossJoin(F.broadcast(tot))
        .join(xyz, "l_partkey")
        .crossJoin(F.broadcast(m))
        .select(
            "r",
            F.when(
                5 * F.col("cum_r") <= 4 * F.col("tot_r"), "A"
            )
            .when(20 * F.col("cum_r") <= 19 * F.col("tot_r"), "B")
            .otherwise("C")
            .alias("abc"),
            F.when(
                4
                * (
                    F.col("mm") * F.col("s2") - F.col("s") * F.col("s")
                )
                <= F.col("s") * F.col("s"),
                "X",
            )
            .when(
                F.col("mm") * F.col("s2") - F.col("s") * F.col("s")
                <= F.col("s") * F.col("s"),
                "Y",
            )
            .otherwise("Z")
            .alias("xyz"),
        )
    )
    return cls.groupBy("abc", "xyz").agg(
        F.count("*").alias("n_parts"),
        F.sum("r").cast("long").alias("revenue_cents"),
    )


@query(
    "q_ord_vintage",
    oracle="""
    WITH l AS (
        SELECT date_trunc('month', o.o_orderdate) AS vintage,
               (year(l.l_shipdate) - year(o.o_orderdate)) * 12
                   + (month(l.l_shipdate) - month(o.o_orderdate))
                   AS age_months,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT CAST(vintage AS VARCHAR) AS vintage_month,
           CAST(age_months AS BIGINT) AS age_months,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(ret) AS BIGINT) AS n_returned,
           round(CAST(sum(ret) AS DOUBLE) / count(*), 6) AS return_rate
    FROM l
    WHERE age_months >= 0
    GROUP BY vintage, age_months
    """,
)
def q_ord_vintage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vintage (development-triangle) analysis: for each order-month
    cohort, the return rate of its lines by shipping-age month — the
    loss-triangle shape credit, insurance, and returns forecasting all
    read (a vintage whose curve runs above its elders is the early
    warning).

    Age is exact integer month arithmetic (year·12+month deltas — no
    day-count ambiguity); rates are exact counts.  One fact join on
    the order key + one (vintage, age) aggregate — triangle cells are
    calendar-bounded regardless of fact size.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    l = orders.join(li, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.date_trunc("month", "o_orderdate").alias("vintage"),
        (
            (F.year("l_shipdate") - F.year("o_orderdate")) * 12
            + (F.month("l_shipdate") - F.month("o_orderdate"))
        ).alias("age_months"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    return (
        l.where(F.col("age_months") >= 0)
        .groupBy(
            F.col("vintage").cast("date").cast("string").alias(
                "vintage_month"
            ),
            F.col("age_months").cast("long").alias("age_months"),
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("ret").cast("long").alias("n_returned"),
            F.round(
                F.sum("ret").cast("double") / F.count("*"), 6
            ).alias("return_rate"),
        )
    )


@query(
    "q_ord_migration",
    oracle="""
    WITH y AS (
        SELECT o_custkey, year(o_orderdate) AS yr,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS spend
        FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        GROUP BY 1, 2
    ),
    r AS (
        SELECT o_custkey, yr, spend,
               row_number() OVER (PARTITION BY yr
                                  ORDER BY spend, o_custkey) AS rk,
               count(*) OVER (PARTITION BY yr) AS n
        FROM y
    ),
    seg AS (
        SELECT o_custkey, yr,
               CASE WHEN 3 * rk <= n THEN 'low'
                    WHEN 3 * rk <= 2 * n THEN 'mid'
                    ELSE 'high' END AS tier
        FROM r
    ),
    m AS (
        SELECT coalesce(a.tier, '<absent>') AS tier_1996,
               coalesce(b.tier, '<absent>') AS tier_1997,
               a.o_custkey AS ca, b.o_custkey AS cb
        FROM (SELECT * FROM seg WHERE yr = 1996) a
        FULL OUTER JOIN (SELECT * FROM seg WHERE yr = 1997) b
          ON a.o_custkey = b.o_custkey
    )
    SELECT tier_1996, tier_1997, CAST(count(*) AS BIGINT) AS n_customers
    FROM m
    GROUP BY 1, 2
    """,
)
def q_ord_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-tier migration matrix: each customer's spend
    tercile in 1996 vs 1997 (including entries and exits via the full
    outer join) — the CRM up/down-migration table account teams plan
    against.

    Terciles are exact integer rank cutoffs (3·rk ≤ n / ≤ 2n) over the
    unique (spend, custkey) order — no percentile float, no tie
    ambiguity; the matrix is the full-outer join of the two year
    segmentations with '<absent>' for churn/acquisition.  Both rank
    windows partition by year; everything after the orders aggregate
    is |customers|-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    y = (
        orders.where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy("o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint)")
            ).alias("spend")
        )
    )
    w = Window.partitionBy("yr").orderBy("spend", "o_custkey")
    wn = Window.partitionBy("yr")
    seg = y.select(
        "o_custkey",
        "yr",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    ).select(
        "o_custkey",
        "yr",
        F.when(3 * F.col("rk") <= F.col("n"), "low")
        .when(3 * F.col("rk") <= 2 * F.col("n"), "mid")
        .otherwise("high")
        .alias("tier"),
    )
    a = seg.where(F.col("yr") == 1996).select(
        F.col("o_custkey").alias("ca"), F.col("tier").alias("ta")
    )
    b = seg.where(F.col("yr") == 1997).select(
        F.col("o_custkey").alias("cb"), F.col("tier").alias("tb")
    )
    m = a.join(b, F.col("ca") == F.col("cb"), "full_outer")
    return m.groupBy(
        F.coalesce(F.col("ta"), F.lit("<absent>")).alias("tier_1996"),
        F.coalesce(F.col("tb"), F.lit("<absent>")).alias("tier_1997"),
    ).agg(F.count("*").alias("n_customers"))


@query(
    "q_ord_eoq",
    oracle="""
    WITH d AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS annual_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem WHERE year(l_shipdate) = 1997
        GROUP BY 1
    )
    SELECT l_partkey, annual_qty, rev_cents,
           round(CAST(rev_cents AS DOUBLE) / annual_qty / 100, 4)
               AS unit_price,
           round(sqrt(2.0 * annual_qty * 5000
                      / (0.2 * CAST(rev_cents AS DOUBLE) / annual_qty)),
                 2) AS eoq_units,
           CAST(CASE WHEN sqrt(2.0 * annual_qty * 5000
                               / (0.2 * CAST(rev_cents AS DOUBLE)
                                  / annual_qty)) > 0
                     THEN ceil(annual_qty
                               / sqrt(2.0 * annual_qty * 5000
                                      / (0.2 * CAST(rev_cents AS DOUBLE)
                                         / annual_qty)))
                     ELSE 0 END AS BIGINT) AS orders_per_year
    FROM d
    ORDER BY annual_qty DESC, l_partkey
    LIMIT 25
    """,
)
def q_ord_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity: Wilson's √(2DS/H) for the 25 highest-
    demand parts of 1997 (S = 5000¢ fixed order cost, H = 20% of the
    observed unit price per year) — the replenishment-planning formula
    purchasing runs off exactly this kind of demand aggregate.

    Demand and revenue are exact integers; unit price, EOQ, and the
    implied orders/year are single double expressions over those
    integers (identical in both engines), rounded.  One keyed fact
    aggregate + TakeOrdered 25 — planning output is top-k-bounded
    however large the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = (
        li.where(F.year("l_shipdate") == 1997)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.expr("cast(round(l_quantity) as bigint)")).alias(
                "annual_qty"
            ),
            F.sum(
                F.expr("cast(round(l_extendedprice * 100) as bigint)")
            ).alias("rev_cents"),
        )
    )
    unit_price = F.col("rev_cents").cast("double") / F.col("annual_qty")
    eoq = F.sqrt(
        2.0 * F.col("annual_qty") * 5000 / (0.2 * unit_price)
    )
    return (
        d.select(
            "l_partkey",
            "annual_qty",
            "rev_cents",
            F.round(unit_price / 100, 4).alias("unit_price"),
            F.round(eoq, 2).alias("eoq_units"),
            F.when(eoq > 0, F.ceil(F.col("annual_qty") / eoq))
            .otherwise(0)
            .cast("long")
            .alias("orders_per_year"),
        )
        .orderBy(F.desc("annual_qty"), "l_partkey")
        .limit(25)
    )


@query(
    "q_ord_cr4",
    oracle="""
    WITH s AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS spend
        FROM orders GROUP BY 1
    ),
    top4 AS (
        SELECT CAST(sum(spend) AS BIGINT) AS top4_cents
        FROM (SELECT spend FROM s
              ORDER BY spend DESC, o_custkey LIMIT 4)
    ),
    tot AS (
        SELECT CAST(sum(spend) AS BIGINT) AS total_cents,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM s
    )
    SELECT n_customers, total_cents, top4_cents,
           CAST(10000 * top4_cents // total_cents AS BIGINT) AS cr4_bps,
           round(CAST(top4_cents AS DOUBLE) / total_cents, 6) AS cr4
    FROM top4 CROSS JOIN tot
    """,
)
def q_ord_cr4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-firm concentration ratio: the revenue share of the top
    four customers — the antitrust-style concentration sibling of
    q_agg_hhi (CR4 reads the head, HHI the whole curve; regulators
    quote both).

    Top-4 is a TakeOrdered on exact cents with a unique tie-break;
    the share is carried as exact integer basis points (floor) plus
    the rounded display ratio.  One keyed aggregate + two scalars —
    never a global sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    s = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)")).alias(
            "spend"
        )
    ).cache()
    top4 = (
        s.orderBy(F.desc("spend"), "o_custkey")
        .limit(4)
        .agg(F.sum("spend").cast("long").alias("top4_cents"))
    )
    tot = s.agg(
        F.sum("spend").cast("long").alias("total_cents"),
        F.count("*").alias("n_customers"),
    )
    return top4.crossJoin(F.broadcast(tot)).select(
        "n_customers",
        "total_cents",
        "top4_cents",
        F.expr("cast(10000 * top4_cents div total_cents as bigint)").alias(
            "cr4_bps"
        ),
        F.round(
            F.col("top4_cents").cast("double") / F.col("total_cents"), 6
        ).alias("cr4"),
    )


@query(
    "q_ord_movers",
    oracle="""
    WITH y AS (
        SELECT year(l_shipdate) AS yr, l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem WHERE year(l_shipdate) IN (1999, 2000)
        GROUP BY 1, 2
    ),
    r AS (
        SELECT yr, l_partkey, rev,
               row_number() OVER (PARTITION BY yr
                                  ORDER BY rev DESC, l_partkey) AS rk
        FROM y
    ),
    t0 AS (SELECT l_partkey, rk, rev FROM r WHERE yr = 1999 AND rk <= 20),
    t1 AS (SELECT l_partkey, rk, rev FROM r WHERE yr = 2000 AND rk <= 20)
    SELECT coalesce(t0.l_partkey, t1.l_partkey) AS l_partkey,
           CAST(t0.rk AS BIGINT) AS rank_1999,
           CAST(t1.rk AS BIGINT) AS rank_2000,
           CAST(t0.rev AS BIGINT) AS rev_1999,
           CAST(t1.rev AS BIGINT) AS rev_2000,
           CASE WHEN t0.l_partkey IS NULL THEN 'entered'
                WHEN t1.l_partkey IS NULL THEN 'dropped'
                WHEN t1.rk < t0.rk THEN 'up'
                WHEN t1.rk > t0.rk THEN 'down'
                ELSE 'held' END AS movement
    FROM t0 FULL OUTER JOIN t1 ON t0.l_partkey = t1.l_partkey
    """,
)
def q_ord_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-movers report: the top-20 revenue parts of 1999 vs 2000 —
    who entered, dropped, climbed, fell — the leaderboard-delta table
    every weekly business review opens with.

    Ranks are per-year partitioned row_numbers over exact cents with
    the partkey tie-break; the movement classification is a full
    outer join of the two top-20 slices, so entries and exits surface
    explicitly rather than silently truncating.  Everything after the
    year aggregate is |parts|-sized, and the join sides are 20 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    y = (
        li.where(F.year("l_shipdate").isin(1999, 2000))
        .groupBy(F.year("l_shipdate").alias("yr"), "l_partkey")
        .agg(
            F.sum(
                F.expr("cast(round(l_extendedprice * 100) as bigint)")
            ).alias("rev")
        )
    )
    w = Window.partitionBy("yr").orderBy(F.desc("rev"), "l_partkey")
    r = y.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 20)
    t0 = r.where(F.col("yr") == 1999).select(
        F.col("l_partkey").alias("k0"),
        F.col("rk").alias("rank_1999"),
        F.col("rev").alias("rev_1999"),
    )
    t1 = r.where(F.col("yr") == 2000).select(
        F.col("l_partkey").alias("k1"),
        F.col("rk").alias("rank_2000"),
        F.col("rev").alias("rev_2000"),
    )
    j = t0.join(t1, F.col("k0") == F.col("k1"), "full_outer")
    return j.select(
        F.coalesce(F.col("k0"), F.col("k1")).alias("l_partkey"),
        F.col("rank_1999").cast("long").alias("rank_1999"),
        F.col("rank_2000").cast("long").alias("rank_2000"),
        F.col("rev_1999").cast("long").alias("rev_1999"),
        F.col("rev_2000").cast("long").alias("rev_2000"),
        F.when(F.col("k0").isNull(), "entered")
        .when(F.col("k1").isNull(), "dropped")
        .when(F.col("rank_2000") < F.col("rank_1999"), "up")
        .when(F.col("rank_2000") > F.col("rank_1999"), "down")
        .otherwise("held")
        .alias("movement"),
    )


@query(
    "q_ord_basket_curve",
    oracle="""
    WITH b AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
               CAST(count(l.l_orderkey) AS BIGINT) AS n_lines
        FROM orders o
        LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    )
    SELECT CAST(least(n_lines, 7) AS BIGINT) AS basket_size,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           round(CAST(sum(cents) AS DOUBLE) / count(*) / 100, 2)
               AS avg_order_value
    FROM b
    GROUP BY 1
    """,
)
def q_ord_basket_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size economics: average order value by line count
    (0-line orders included explicitly — the audit finding from
    q_ord_reconcile — and 7+ capped) — the cross-sell curve merchants
    read before bundling.

    Line counts come from a LEFT join so empty orders stay visible;
    all sums exact cents; AOV is the one display float.  One keyed
    count + one bucket aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    b = (
        orders.join(
            li, F.col("l_orderkey") == F.col("o_orderkey"), "left"
        )
        .groupBy(
            "o_orderkey",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
                "cents"
            ),
        )
        .agg(F.count("l_orderkey").cast("long").alias("n_lines"))
    )
    return b.groupBy(
        F.least(F.col("n_lines"), F.lit(7)).cast("long").alias(
            "basket_size"
        )
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.round(
            F.sum("cents").cast("double") / F.count("*") / 100, 2
        ).alias("avg_order_value"),
    )


@query(
    "q_ord_seasonal_decomp",
    oracle="""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mo,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT mo, rev,
               row_number() OVER (ORDER BY mo) AS rn,
               count(*) OVER () AS n
        FROM m
    ),
    ma AS (
        SELECT a.mo, a.rev,
               CAST(sum(b.rev) AS BIGINT) AS win_rev,
               CAST(count(*) AS BIGINT) AS win_n
        FROM r a JOIN r b ON b.rn BETWEEN a.rn - 6 AND a.rn + 6
        WHERE a.rn > 6 AND a.rn <= a.n - 6
        GROUP BY a.mo, a.rev
    )
    SELECT CAST(month(mo) AS INT) AS month_of_year,
           CAST(count(*) AS BIGINT) AS n_months,
           CAST(sum(rev) AS BIGINT) AS rev_cents,
           CAST(sum(win_rev) AS BIGINT) AS ma_num_cents,
           CAST(sum(win_n) AS BIGINT) AS ma_den,
           round(CAST(sum(rev) AS DOUBLE)
                 / (CAST(sum(win_rev) AS DOUBLE) / sum(win_n)), 6)
               AS seasonal_index
    FROM ma
    GROUP BY 1
    """,
)
def q_ord_seasonal_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of monthly order revenue: each
    interior month's 13-month centered moving average is the trend,
    and the month-of-year seasonal index is actual/trend pooled across
    years — the ratio-to-moving-average method every X-11-style
    adjuster starts from.

    The MA window is a rank-band θ-join on the |months|-row aggregate
    (calendar-bounded — no per-event window), its numerator and
    denominator stay exact integers through the pooling, and the
    index divides once at display.  Edge months without a full window
    are excluded, as the method prescribes.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mo")
    ).agg(
        F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)")).alias(
            "rev"
        )
    )
    ranked = bucketed_running_sum(
        m,
        F.year("mo").cast("long"),
        [F.col("mo")],
        {"rn": F.lit(1)},
    )
    nn = m.agg(F.count("*").alias("n"))
    r = ranked.crossJoin(F.broadcast(nn)).select("mo", "rev", "rn", "n")
    a = r.alias("a")
    b = r.alias("b")
    ma = (
        a.join(
            F.broadcast(b),
            (F.col("b.rn") >= F.col("a.rn") - 6)
            & (F.col("b.rn") <= F.col("a.rn") + 6),
        )
        .where(
            (F.col("a.rn") > 6) & (F.col("a.rn") <= F.col("a.n") - 6)
        )
        .groupBy(F.col("a.mo").alias("mo"), F.col("a.rev").alias("rev"))
        .agg(
            F.sum(F.col("b.rev")).cast("long").alias("win_rev"),
            F.count("*").alias("win_n"),
        )
    )
    return ma.groupBy(
        F.month("mo").cast("int").alias("month_of_year")
    ).agg(
        F.count("*").alias("n_months"),
        F.sum("rev").cast("long").alias("rev_cents"),
        F.sum("win_rev").cast("long").alias("ma_num_cents"),
        F.sum("win_n").cast("long").alias("ma_den"),
        F.round(
            F.sum("rev").cast("double")
            / (F.sum("win_rev").cast("double") / F.sum("win_n")),
            6,
        ).alias("seasonal_index"),
    )


@query(
    "q_ord_overdue",
    oracle="""
    WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS today FROM orders),
    g AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(CAST(o_orderdate AS DATE)) OVER w,
                         CAST(o_orderdate AS DATE)) AS gap_d,
               CAST(o_orderdate AS DATE) AS d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    med AS (
        SELECT o_custkey,
               CAST(min(gap_d) FILTER (WHERE 2 * cum >= n) AS BIGINT)
                   AS med_gap
        FROM (
            SELECT o_custkey, gap_d,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY gap_d) AS cum,
                   count(*) OVER (PARTITION BY o_custkey) AS n
            FROM g WHERE gap_d IS NOT NULL
        )
        GROUP BY 1
    ),
    lastd AS (
        SELECT o_custkey, max(d) AS last_d,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM g GROUP BY 1
    ),
    j AS (
        SELECT l.o_custkey, l.n_orders, m.med_gap,
               date_diff('day', l.last_d, mx.today) AS since_d
        FROM lastd l JOIN med m ON m.o_custkey = l.o_custkey
        CROSS JOIN mx
        WHERE l.n_orders >= 5
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN since_d > 2 * med_gap THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overdue,
           round(CAST(sum(CASE WHEN since_d > 2 * med_gap
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
               AS overdue_rate,
           CAST(max(CASE WHEN since_d > 2 * med_gap THEN since_d END)
                AS BIGINT) AS max_overdue_days
    FROM j
    """,
)
def q_ord_overdue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-overdue churn risk: customers (≥ 5 orders) whose days
    since last order exceed TWICE their own median reorder gap — the
    personalized-cadence alarm that beats any global inactivity
    threshold because heavy and occasional buyers get different
    clocks.

    The per-customer median gap is the exact lower order statistic
    (2·rank ≥ n over whole-day DATE gaps); "today" anchors to the
    corpus's last order date so the query is regeneration-proof.  All
    flags integer comparisons; windows partition by customer.
    """
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("today")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    g = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_d"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    gaps = g.where(F.col("gap_d").isNotNull())
    wr = Window.partitionBy("o_custkey").orderBy("gap_d")
    wn = Window.partitionBy("o_custkey")
    med = (
        gaps.select(
            "o_custkey",
            "gap_d",
            F.row_number().over(wr).alias("cum"),
            F.count("*").over(wn).alias("n"),
        )
        .where(2 * F.col("cum") >= F.col("n"))
        .groupBy("o_custkey")
        .agg(F.min("gap_d").cast("long").alias("med_gap"))
    )
    lastd = g.groupBy("o_custkey").agg(
        F.max("d").alias("last_d"), F.count("*").alias("n_orders")
    )
    j = (
        lastd.join(med, "o_custkey")
        .crossJoin(F.broadcast(mx))
        .where(F.col("n_orders") >= 5)
        .select(
            F.datediff(F.col("today"), F.col("last_d")).alias("since_d"),
            "med_gap",
        )
    )
    overdue = F.when(
        F.col("since_d") > 2 * F.col("med_gap"), 1
    ).otherwise(0)
    return j.agg(
        F.count("*").alias("n_customers"),
        F.sum(overdue).cast("long").alias("n_overdue"),
        F.round(
            F.sum(overdue).cast("double") / F.count("*"), 6
        ).alias("overdue_rate"),
        F.max(
            F.when(
                F.col("since_d") > 2 * F.col("med_gap"),
                F.col("since_d"),
            )
        )
        .cast("long")
        .alias("max_overdue_days"),
    )


@query(
    "q_ord_price_curve",
    oracle="""
    SELECT CAST(least(CAST(round(l_quantity) AS BIGINT) // 10, 4)
                AS BIGINT) AS qty_band,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
               AS disc_pct_sum,
           round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT))
                      AS DOUBLE) / count(*), 4) AS avg_disc_pct,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM lineitem
    GROUP BY 1
    """,
)
def q_ord_price_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-discount curve: average discount by quantity band
    (10-unit bands, 40+ capped) — does bigger volume actually buy a
    deeper discount, the first sanity check of any pricing-policy
    audit.

    Discounts are exact integer percent, bands exact integer floors;
    only the per-band mean divides at display.  A single
    map-side-combinable aggregate over the fact scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.least(
            F.expr("cast(round(l_quantity) as bigint) div 10"), F.lit(4)
        )
        .cast("long")
        .alias("qty_band")
    ).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.expr("cast(round(l_discount * 100) as bigint)")).alias(
            "disc_pct_sum"
        ),
        F.round(
            F.sum(
                F.expr("cast(round(l_discount * 100) as bigint)")
            ).cast("double")
            / F.count("*"),
            4,
        ).alias("avg_disc_pct"),
        F.sum(
            F.expr("cast(round(l_extendedprice * 100) as bigint)")
        ).alias("rev_cents"),
    )


@query(
    "q_ord_aging",
    oracle="""
    WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS asof FROM orders),
    a AS (
        SELECT date_diff('day', CAST(o_orderdate AS DATE), mx.asof)
                   AS age_d,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders CROSS JOIN mx
        WHERE o_orderstatus <> 'F'
    )
    SELECT CASE WHEN age_d <= 30 THEN '0-30'
                WHEN age_d <= 60 THEN '31-60'
                WHEN age_d <= 90 THEN '61-90'
                ELSE '90+' END AS aging_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS exposure_cents,
           CAST(max(age_d) AS BIGINT) AS oldest_days
    FROM a
    GROUP BY 1
    """,
)
def q_ord_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Receivables aging: non-finalized orders bucketed by whole-day
    age against the corpus's as-of date (0-30 / 31-60 / 61-90 / 90+),
    with the exposure in exact cents — the collections report every
    finance close produces, anchored data-derived so regeneration
    can't rot it.

    Whole-day DATE arithmetic, integer bucket predicates, exact sums;
    one scalar anchor + one bucket aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("asof")
    )
    a = (
        orders.where(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff(
                F.col("asof"), F.col("o_orderdate").cast("date")
            ).alias("age_d"),
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
                "cents"
            ),
        )
    )
    return a.groupBy(
        F.when(F.col("age_d") <= 30, "0-30")
        .when(F.col("age_d") <= 60, "31-60")
        .when(F.col("age_d") <= 90, "61-90")
        .otherwise("90+")
        .alias("aging_bucket")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").cast("long").alias("exposure_cents"),
        F.max("age_d").cast("long").alias("oldest_days"),
    )


@query(
    "q_ord_trade_balance",
    oracle="""
    WITH rev AS (
        SELECT cu.c_nationkey AS cust_nation,
               su.s_nationkey AS supp_nation,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer cu ON cu.c_custkey = o.o_custkey
        JOIN supplier su ON su.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    outb AS (
        SELECT supp_nation AS nation, CAST(sum(cents) AS BIGINT) AS exports
        FROM rev GROUP BY 1
    ),
    inb AS (
        SELECT cust_nation AS nation, CAST(sum(cents) AS BIGINT) AS imports
        FROM rev GROUP BY 1
    )
    SELECT coalesce(o.nation, i.nation) AS nationkey,
           CAST(coalesce(o.exports, 0) AS BIGINT) AS exports_cents,
           CAST(coalesce(i.imports, 0) AS BIGINT) AS imports_cents,
           CAST(coalesce(o.exports, 0) - coalesce(i.imports, 0) AS BIGINT)
               AS net_balance_cents
    FROM outb o FULL OUTER JOIN inb i ON o.nation = i.nation
    """,
)
def q_ord_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-nation trade balance: each nation's exports (revenue its
    suppliers shipped) vs imports (revenue its customers bought), and
    the net — the bilateral flow matrix of TPC-H Q7 rolled up into the
    balance sheet every trade dashboard leads with.

    One fact aggregate to the 25×25 nation-pair grid, then two tiny
    re-aggregates full-outer-joined so a nation that only buys or only
    sells still appears.  Exact cents end-to-end; dimension joins
    broadcast onto the fact scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust.select("c_custkey", "c_nationkey")),
                    F.col("c_custkey") == F.col("o_custkey"),
                ).select("o_orderkey", "c_nationkey")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("cust_nation"),
            F.col("s_nationkey").alias("supp_nation"),
        )
        .agg(
            F.sum(
                F.expr("cast(round(l_extendedprice * 100) as bigint)")
            ).alias("cents")
        )
    ).cache()
    outb = rev.groupBy(F.col("supp_nation").alias("nation")).agg(
        F.sum("cents").cast("long").alias("exports")
    )
    inb = rev.groupBy(F.col("cust_nation").alias("nation")).agg(
        F.sum("cents").cast("long").alias("imports")
    )
    o = outb.withColumnRenamed("nation", "no")
    i = inb.withColumnRenamed("nation", "ni")
    return o.join(i, F.col("no") == F.col("ni"), "full_outer").select(
        F.coalesce(F.col("no"), F.col("ni")).alias("nationkey"),
        F.coalesce(F.col("exports"), F.lit(0))
        .cast("long")
        .alias("exports_cents"),
        F.coalesce(F.col("imports"), F.lit(0))
        .cast("long")
        .alias("imports_cents"),
        (
            F.coalesce(F.col("exports"), F.lit(0))
            - F.coalesce(F.col("imports"), F.lit(0))
        )
        .cast("long")
        .alias("net_balance_cents"),
    )


@query(
    "q_ord_single_source",
    oracle="""
    WITH ps AS (
        SELECT l_partkey,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(least(n_suppliers, 4) AS BIGINT) AS supplier_count_band,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_cents) AS BIGINT) AS revenue_cents,
           round(CAST(sum(rev_cents) AS DOUBLE)
                 / (SELECT sum(rev_cents) FROM ps), 6) AS revenue_share
    FROM ps
    GROUP BY 1
    """,
)
def q_ord_single_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply risk: parts banded by how many distinct
    suppliers ever shipped them (4+ capped), with the revenue share
    concentrated in each band — the procurement-resilience table
    whose 1-supplier row is the firm's supply-chain exposure.

    One count-distinct fact aggregate per part, one band rollup;
    shares divide once against the scalar total.  Exact cents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.sum(
            F.expr("cast(round(l_extendedprice * 100) as bigint)")
        ).alias("rev_cents"),
    ).cache()
    tot = ps.agg(F.sum("rev_cents").cast("long").alias("tot"))
    return (
        ps.groupBy(
            F.least(F.col("n_suppliers"), F.lit(4))
            .cast("long")
            .alias("supplier_count_band")
        )
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "supplier_count_band",
            "n_parts",
            "revenue_cents",
            F.round(
                F.col("revenue_cents").cast("double") / F.col("tot"), 6
            ).alias("revenue_share"),
        )
    )


@query(
    "q_ord_discount_leakage",
    oracle="""
    WITH s AS (
        SELECT least(CAST(round(l_quantity) AS BIGINT) // 10, 4) AS band,
               CAST(round(l_discount * 100) AS BIGINT) AS disc,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    r AS (
        SELECT band, disc, cents,
               row_number() OVER (PARTITION BY band
                                  ORDER BY disc, l_orderkey,
                                           l_linenumber) AS rk,
               count(*) OVER (PARTITION BY band) AS n
        FROM s
    ),
    p90 AS (
        SELECT band, CAST(min(disc) AS BIGINT) AS p90_disc
        FROM r WHERE 10 * rk >= 9 * n GROUP BY band
    )
    SELECT CAST(s.band AS BIGINT) AS qty_band, p.p90_disc,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN s.disc > p.p90_disc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations,
           CAST(sum(CASE WHEN s.disc > p.p90_disc
                         THEN (s.cents * (s.disc - p.p90_disc)) // 100
                         ELSE 0 END) AS BIGINT) AS leakage_cents
    FROM s JOIN p90 p ON p.band = s.band
    GROUP BY s.band, p.p90_disc
    """,
)
def q_ord_discount_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-leakage audit: lines discounted beyond their quantity
    band's exact 90th-percentile norm, and the cents leaked above that
    norm (price × excess points // 100) — the pricing-governance
    report that catches reps discounting outside policy.

    The p90 norm is the exact order statistic (10·rk ≥ 9·n over the
    unique per-band ordering), the excess valuation pure integer
    arithmetic.  One partitioned rank + a broadcast norm join back
    onto the lines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.least(
            F.expr("cast(round(l_quantity) as bigint) div 10"), F.lit(4)
        ).alias("band"),
        F.expr("cast(round(l_discount * 100) as bigint)").alias("disc"),
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias(
            "cents"
        ),
        "l_orderkey",
        "l_linenumber",
    )
    wr = Window.partitionBy("band").orderBy(
        "disc", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("band")
    r = s.select(
        "band",
        "disc",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    p90 = (
        r.where(10 * F.col("rk") >= 9 * F.col("n"))
        .groupBy("band")
        .agg(F.min("disc").cast("long").alias("p90_disc"))
    )
    j = s.join(F.broadcast(p90), "band")
    excess = F.when(
        F.col("disc") > F.col("p90_disc"),
        F.expr("(cents * (disc - p90_disc)) div 100"),
    ).otherwise(0)
    return j.groupBy(
        F.col("band").cast("long").alias("qty_band"),
        "p90_disc",
    ).agg(
        F.count("*").alias("n_lines"),
        F.sum(
            F.when(F.col("disc") > F.col("p90_disc"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
        F.sum(excess).cast("long").alias("leakage_cents"),
    )


@query(
    "q_ord_order_count_dist",
    oracle="""
    WITH c AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT CAST(length(printf('%b', n_orders)) - 1 AS BIGINT)
               AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(n_orders) AS BIGINT) AS total_orders,
           CAST(min(n_orders) AS BIGINT) AS min_in_bucket,
           CAST(max(n_orders) AS BIGINT) AS max_in_bucket
    FROM c
    GROUP BY 1
    """,
)
def q_ord_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-frequency distribution on a log₂ grid: customers bucketed
    by ⌊log₂(order count)⌋ — the heavy-tail fingerprint (straight line
    on this grid = power law) that q_ev_powerlaw reads for events,
    here for the order book.

    The bucket uses the exact binary-length identity (float log2 is
    wrong at powers of two — the documented trap); all counts exact.
    Two keyed aggregates.
    """
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return c.groupBy(
        F.expr("cast(length(conv(n_orders, 10, 2)) - 1 as bigint)").alias(
            "log2_bucket"
        )
    ).agg(
        F.count("*").alias("n_customers"),
        F.sum("n_orders").cast("long").alias("total_orders"),
        F.min("n_orders").cast("long").alias("min_in_bucket"),
        F.max("n_orders").cast("long").alias("max_in_bucket"),
    )


@query(
    "q_ord_waterfall",
    oracle="""
    WITH l AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS gross_c,
               CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
               CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
        FROM lineitem
    ),
    w AS (
        SELECT CAST(sum(gross_c) AS BIGINT) AS gross,
               CAST(sum(gross_c * disc_pct) AS BIGINT) AS disc_e2,
               CAST(sum((gross_c * (100 - disc_pct)) * tax_pct)
                    AS BIGINT) AS tax_e4
        FROM l
    )
    SELECT gross AS gross_cents,
           CAST(disc_e2 // 100 AS BIGINT) AS discount_cents,
           CAST(gross - disc_e2 // 100 AS BIGINT) AS net_cents,
           CAST(tax_e4 // 10000 AS BIGINT) AS tax_cents,
           CAST(gross - disc_e2 // 100 + tax_e4 // 10000 AS BIGINT)
               AS invoiced_cents,
           round(CAST(disc_e2 AS DOUBLE) / 100 / gross, 6)
               AS discount_rate,
           round(CAST(tax_e4 AS DOUBLE) / 10000
                 / (gross - disc_e2 / 100.0), 6) AS effective_tax_rate
    FROM w
    """,
)
def q_ord_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gross-to-net revenue waterfall: list price → discount give-up →
    net → tax → invoiced, the finance bridge behind every earnings
    slide — computed on integer fixed-point all the way (discount
    mass in 1e-2-cent units, tax mass in 1e-4-cent units, floored to
    cents ONCE at the end of each step, not per line, so the walk
    reconciles exactly).

    One map-side-combinable aggregate; the two display rates divide
    identical integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    l = li.select(
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias(
            "gross_c"
        ),
        F.expr("cast(round(l_discount * 100) as bigint)").alias(
            "disc_pct"
        ),
        F.expr("cast(round(l_tax * 100) as bigint)").alias("tax_pct"),
    )
    w = l.agg(
        F.sum("gross_c").cast("long").alias("gross"),
        F.sum(F.col("gross_c") * F.col("disc_pct"))
        .cast("long")
        .alias("disc_e2"),
        F.sum(
            (F.col("gross_c") * (100 - F.col("disc_pct")))
            * F.col("tax_pct")
        )
        .cast("long")
        .alias("tax_e4"),
    )
    return w.select(
        F.col("gross").alias("gross_cents"),
        F.expr("disc_e2 div 100").cast("long").alias("discount_cents"),
        F.expr("gross - disc_e2 div 100")
        .cast("long")
        .alias("net_cents"),
        F.expr("tax_e4 div 10000").cast("long").alias("tax_cents"),
        F.expr("gross - disc_e2 div 100 + tax_e4 div 10000")
        .cast("long")
        .alias("invoiced_cents"),
        F.round(
            F.col("disc_e2").cast("double") / 100 / F.col("gross"), 6
        ).alias("discount_rate"),
        F.round(
            F.col("tax_e4").cast("double")
            / 10000
            / (F.col("gross") - F.col("disc_e2") / 100.0),
            6,
        ).alias("effective_tax_rate"),
    )


@query(
    "q_ord_hockey_stick",
    oracle="""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mo,
               CAST(o_orderdate AS DATE) AS d,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    x AS (
        SELECT mo, cents,
               CASE WHEN date_diff('day', d,
                        (mo + INTERVAL 1 MONTH - INTERVAL 1 DAY)::DATE)
                        < 5 THEN 1 ELSE 0 END AS last5
        FROM m
    )
    SELECT CAST(CAST(mo AS DATE) AS VARCHAR) AS month,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN last5 = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS last5_cents,
           round(CAST(sum(CASE WHEN last5 = 1 THEN cents ELSE 0 END)
                      AS DOUBLE) / sum(cents), 6) AS last5_share,
           CAST(CASE WHEN 3 * sum(CASE WHEN last5 = 1 THEN cents
                                  ELSE 0 END) > sum(cents)
                     THEN 1 ELSE 0 END AS INT) AS hockey_stick_flag
    FROM x
    GROUP BY mo
    """,
)
def q_ord_hockey_stick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-end hockey stick audit: the share of each month's
    revenue booked in its final five days, flagged when it exceeds a
    third — the sales-linearity pathology (quota-driven pull-ins)
    every rev-ops review hunts for.

    "Last five days" is exact whole-day arithmetic against the
    month's last day; the flag is the integer cross-multiplication
    3·last5 > total.  One month aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        F.date_trunc("month", "o_orderdate").alias("mo"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
            "cents"
        ),
    )
    last5 = F.when(
        F.datediff(F.expr("last_day(mo)"), F.col("d")) < 5, 1
    ).otherwise(0)
    x = m.select("mo", "cents", last5.alias("last5"))
    l5 = F.sum(F.when(F.col("last5") == 1, F.col("cents")).otherwise(0))
    return x.groupBy(
        F.col("mo").cast("date").cast("string").alias("month")
    ).agg(
        F.sum("cents").cast("long").alias("total_cents"),
        l5.cast("long").alias("last5_cents"),
        F.round(l5.cast("double") / F.sum("cents"), 6).alias(
            "last5_share"
        ),
        F.when(3 * l5 > F.sum("cents"), 1)
        .otherwise(0)
        .cast("int")
        .alias("hockey_stick_flag"),
    )


@query(
    "q_ord_also_bought",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
        SELECT a.l_partkey AS p, b.l_partkey AS q,
               CAST(count(*) AS BIGINT) AS together
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    best AS (
        SELECT p, q, together FROM (
            SELECT p, q, together,
                   row_number() OVER (PARTITION BY p
                                      ORDER BY together DESC, q) AS rk
            FROM pairs) WHERE rk = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_parts_with_rec,
           CAST(max(together) AS BIGINT) AS max_cooccurrence,
           CAST(sum(together) AS BIGINT) AS sum_top1_cooccurrence,
           CAST(count(DISTINCT q) AS BIGINT) AS n_distinct_recs
    FROM best
    """,
)
def q_ord_also_bought(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Customers who bought X also bought…": the top co-purchased
    part for every part (ties → lower partkey), summarized — the
    item-item collaborative filter in its exact-count form, the
    recommender every commerce site starts with.

    Co-occurrence pairs come from a same-order self-join of the
    DISTINCT (order, part) set — the quadratic term is lines-per-
    order (≤ ~7), never catalog² — and the per-part argmax is a
    partitioned top-1.  Summary output keeps the contract row small;
    the `best` table itself is the servable artifact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p"),
            F.col("b.l_partkey").alias("q"),
        )
        .agg(F.count("*").alias("together"))
    )
    w = Window.partitionBy("p").orderBy(F.desc("together"), "q")
    best = (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("p", "q", "together")
    )
    return best.agg(
        F.count("*").alias("n_parts_with_rec"),
        F.max("together").cast("long").alias("max_cooccurrence"),
        F.sum("together").cast("long").alias("sum_top1_cooccurrence"),
        F.countDistinct("q").cast("long").alias("n_distinct_recs"),
    )


@query(
    "q_ord_kraljic",
    oracle="""
    WITH ps AS (
        SELECT l_partkey,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_sup,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS spend
        FROM lineitem GROUP BY 1
    ),
    med AS (
        SELECT CAST(min(CASE WHEN 2 * rk >= n THEN spend END) AS BIGINT)
                   AS med_spend
        FROM (
            SELECT spend,
                   row_number() OVER (ORDER BY spend, l_partkey) AS rk,
                   count(*) OVER () AS n
            FROM ps
        )
    )
    SELECT CASE WHEN p.spend > m.med_spend THEN 'high_spend'
                ELSE 'low_spend' END AS spend_axis,
           CASE WHEN p.n_sup <= 2 THEN 'high_risk'
                ELSE 'low_risk' END AS risk_axis,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(p.spend) AS BIGINT) AS spend_cents
    FROM ps p CROSS JOIN med m
    GROUP BY 1, 2
    """,
)
def q_ord_kraljic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kraljic portfolio matrix: parts classed on the two procurement
    axes — spend above/below the exact median, supply risk by
    supplier redundancy (≤ 2 sources = high risk) — yielding the
    strategic/leverage/bottleneck/routine quadrants purchasing
    strategy is organized around.

    The spend median is the exact lower order statistic (rank window
    over the |parts| aggregate); both axis predicates are integers.
    One fact aggregate + a broadcast scalar + a 4-row rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_sup"),
        F.sum(
            F.expr("cast(round(l_extendedprice * 100) as bigint)")
        ).alias("spend"),
    ).cache()
    ranked = bucketed_running_sum(
        ps,
        F.expr("spend div 10000000"),
        [F.col("spend"), F.col("l_partkey")],
        {"rk": F.lit(1)},
    )
    nn = ps.agg(F.count("*").alias("n"))
    med = (
        ranked.crossJoin(F.broadcast(nn))
        .where(2 * F.col("rk") >= F.col("n"))
        .agg(F.min("spend").cast("long").alias("med_spend"))
    )
    j = ps.crossJoin(F.broadcast(med))
    return j.groupBy(
        F.when(F.col("spend") > F.col("med_spend"), "high_spend")
        .otherwise("low_spend")
        .alias("spend_axis"),
        F.when(F.col("n_sup") <= 2, "high_risk")
        .otherwise("low_risk")
        .alias("risk_axis"),
    ).agg(
        F.count("*").alias("n_parts"),
        F.sum("spend").cast("long").alias("spend_cents"),
    )


@query(
    "q_ord_otif",
    oracle="""
    WITH l AS (
        SELECT o.o_orderpriority,
               CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                   CAST(l.l_shipdate AS DATE)) <= 30
                    THEN 1 ELSE 0 END AS on_time
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(on_time) AS BIGINT) AS n_on_time,
           round(CAST(sum(on_time) AS DOUBLE) / count(*), 6)
               AS otif_rate,
           CAST(CASE WHEN 20 * sum(on_time) >= 19 * count(*)
                     THEN 1 ELSE 0 END AS INT) AS meets_95_sla
    FROM l
    GROUP BY o_orderpriority
    """,
)
def q_ord_otif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time service level: the share of lines shipped within 30
    days of order, per priority class, with the 95%-SLA verdict as
    the exact cross-multiplication 20·on_time ≥ 19·total — the OTIF
    KPI every fulfillment contract is scored on.

    Whole-day DATE arithmetic for the lateness test; one fact join +
    one priority aggregate; the SLA flag never touches a float.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    l = orders.join(
        li, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "o_orderpriority",
        F.when(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            <= 30,
            1,
        )
        .otherwise(0)
        .alias("on_time"),
    )
    return l.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.sum("on_time").cast("long").alias("n_on_time"),
        F.round(
            F.sum("on_time").cast("double") / F.count("*"), 6
        ).alias("otif_rate"),
        F.when(20 * F.sum("on_time") >= 19 * F.count("*"), 1)
        .otherwise(0)
        .cast("int")
        .alias("meets_95_sla"),
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT)                              AS revenue_scaled,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                 / 10000.0, 4)                          AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue_scaled DESC, n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation for ASIA
    customers served by same-nation suppliers in 1996 — completing the
    22-query TPC-H sweep (Q1 lives as `q_agg_q1`).

    Plan: region→nation prunes to 5 nations broadcast onto supplier;
    the c_nationkey = s_nationkey local-supplier constraint rides the
    lineitem⋈supplier join; the date filter pushes to the orders scan.
    Revenue is the exact-cents scaled BIGINT (price-cents ×
    discount-percent, scale 1e4) so the sum and the DESC ordering are
    integer-exact; the float `revenue` column is one division at the
    end."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (
            F.expr("cast(round(l_extendedprice * 100) as bigint)")
            * (100 - F.expr("cast(round(l_discount * 100) as bigint)"))
        ).alias("rev"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    asia_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(asia_nations), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("rev").cast("long").alias("revenue_scaled"))
        .select(
            "n_name",
            "revenue_scaled",
            F.round(F.col("revenue_scaled") / 10000.0, 4).alias("revenue"),
        )
        .orderBy(F.col("revenue_scaled").desc(), "n_name")
    )


@query(
    "q_ord_nrr",
    oracle="""
    WITH rev AS (
        SELECT o_custkey AS cust,
               strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS r
        FROM orders GROUP BY 1, 2
    ),
    nxt AS (
        SELECT o_custkey AS cust,
               strftime(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH,
                        '%Y-%m') AS m,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS r_prev
        FROM orders GROUP BY 1, 2
    ),
    j AS (
        SELECT coalesce(rev.m, nxt.m) AS m,
               coalesce(rev.cust, nxt.cust) AS cust,
               coalesce(rev.r, 0) AS r,
               coalesce(nxt.r_prev, 0) AS r_prev
        FROM rev FULL JOIN nxt
          ON rev.cust = nxt.cust AND rev.m = nxt.m
    )
    SELECT m,
           CAST(sum(r_prev) AS BIGINT) AS starting_rev,
           CAST(sum(CASE WHEN r_prev > 0 AND r > 0
                         THEN least(r, r_prev) ELSE 0 END) AS BIGINT)
               AS retained,
           CAST(sum(CASE WHEN r_prev > 0 AND r > r_prev
                         THEN r - r_prev ELSE 0 END) AS BIGINT)
               AS expansion,
           CAST(sum(CASE WHEN r_prev > 0 AND r > 0 AND r < r_prev
                         THEN r_prev - r ELSE 0 END) AS BIGINT)
               AS contraction,
           CAST(sum(CASE WHEN r_prev > 0 AND r = 0
                         THEN r_prev ELSE 0 END) AS BIGINT)
               AS churned,
           CAST(sum(CASE WHEN r_prev = 0 THEN r ELSE 0 END) AS BIGINT)
               AS new_rev,
           round(CAST(sum(CASE WHEN r_prev > 0 THEN r ELSE 0 END) AS DOUBLE)
                 / nullif(sum(r_prev), 0), 4) AS nrr
    FROM j
    WHERE m >= '1995-02' AND m <= '2001-08'
    GROUP BY m ORDER BY m
    """,
)
def q_ord_nrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net revenue retention — the SaaS revenue bridge: for each month,
    last month's revenue base split into retained / expansion /
    contraction / churned, plus revenue from brand-new customers, and
    NRR = (existing-customer revenue this month) / (their revenue last
    month).  The month-over-month customer alignment is a FULL join of
    (customer, month) revenue against itself shifted one month — one
    shuffle on (cust, month), no window over customers.

    All components are exact cents (BIGINT); NRR is one division.
    The month label is a string in both engines (date-output parity
    rule)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("cast(round(o_totalprice * 100) as bigint)")
    rev = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "m"
        ),
    ).agg(F.sum(cents).cast("long").alias("r"))
    nxt = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.date_format(
            F.add_months(F.date_trunc("month", "o_orderdate"), 1), "yyyy-MM"
        ).alias("m"),
    ).agg(F.sum(cents).cast("long").alias("r_prev"))
    # The month-over-month alignment as UNION + one hash-aggregate
    # instead of a FULL join: full-outer can't broadcast-hash-join in
    # Spark, so the join planned sort-merge (measured 10.4 s at
    # sf0.1); the union re-keys both sides onto (cust, m) in a single
    # shuffle and sums into the two legs (1.0 s, same result exactly).
    j = (
        rev.select("cust", "m", F.col("r"), F.lit(0).cast("long").alias("r_prev"))
        .unionByName(
            nxt.select(
                "cust", "m", F.lit(0).cast("long").alias("r"), F.col("r_prev")
            )
        )
        .groupBy("cust", "m")
        .agg(F.sum("r").alias("r"), F.sum("r_prev").alias("r_prev"))
    )
    rp, r = F.col("r_prev"), F.col("r")
    return (
        j.filter((F.col("m") >= "1995-02") & (F.col("m") <= "2001-08"))
        .groupBy("m")
        .agg(
            F.sum(rp).cast("long").alias("starting_rev"),
            F.sum(
                F.when((rp > 0) & (r > 0), F.least(r, rp)).otherwise(0)
            )
            .cast("long")
            .alias("retained"),
            F.sum(F.when((rp > 0) & (r > rp), r - rp).otherwise(0))
            .cast("long")
            .alias("expansion"),
            F.sum(
                F.when((rp > 0) & (r > 0) & (r < rp), rp - r).otherwise(0)
            )
            .cast("long")
            .alias("contraction"),
            F.sum(F.when((rp > 0) & (r == 0), rp).otherwise(0))
            .cast("long")
            .alias("churned"),
            F.sum(F.when(rp == 0, r).otherwise(0))
            .cast("long")
            .alias("new_rev"),
            F.round(
                F.sum(F.when(rp > 0, r).otherwise(0)).cast("double")
                / F.nullif(F.sum(rp), F.lit(0)),
                4,
            ).alias("nrr"),
        )
        .orderBy("m")
    )


@query(
    "q_ord_bullwhip",
    oracle="""
    WITH om AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m,
               CAST(count(*) AS BIGINT) AS a
        FROM orders GROUP BY 1
    ),
    sm AS (
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS m,
               CAST(count(*) AS BIGINT) AS b
        FROM lineitem GROUP BY 1
    ),
    j AS (
        SELECT om.m, om.a, sm.b FROM om JOIN sm USING (m)
        WHERE om.m >= '1995-03' AND om.m <= '2001-06'
    ),
    mo AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a) AS BIGINT) AS sa,
               CAST(sum(a * a) AS BIGINT) AS qa,
               CAST(sum(b) AS BIGINT) AS sb,
               CAST(sum(b * b) AS BIGINT) AS qb
        FROM j
    )
    SELECT n,
           n * qa - sa * sa AS var_orders_nsq,
           n * qb - sb * sb AS var_ships_nsq,
           round(CAST(n * qa - sa * sa AS DOUBLE)
                 / (n * qb - sb * sb), 6) AS bullwhip_ratio,
           round(CAST(sa AS DOUBLE) / n, 4) AS mean_orders,
           round(CAST(sb AS DOUBLE) / n, 4) AS mean_ships
    FROM mo
    """,
)
def q_ord_bullwhip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip effect — demand-variance amplification up the supply
    chain: the ratio of monthly ORDER-count variance to monthly
    SHIPMENT-count variance over the common month span (interior
    months only, so partial edge months don't fake variance).  Ratio
    > 1 means order volatility exceeds fulfillment volatility — the
    signal that batching/forecasting is amplifying noise upstream.

    Both variances are carried as the exact integer n·Σx² − (Σx)²
    (never a float mean subtraction), and because both series share
    the same n, the bullwhip ratio is one division of two exact
    BIGINTs.  Two calendar-bounded aggregates + a 76-row join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    om = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "m"
        )
    ).agg(F.count("*").cast("long").alias("a"))
    sm = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
            "m"
        )
    ).agg(F.count("*").cast("long").alias("b"))
    j = om.join(sm, "m").filter(
        (F.col("m") >= "1995-03") & (F.col("m") <= "2001-06")
    )
    mo = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("qa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("qb"),
    )
    va = F.col("n") * F.col("qa") - F.col("sa") * F.col("sa")
    vb = F.col("n") * F.col("qb") - F.col("sb") * F.col("sb")
    return mo.select(
        "n",
        va.alias("var_orders_nsq"),
        vb.alias("var_ships_nsq"),
        F.round(va.cast("double") / vb, 6).alias("bullwhip_ratio"),
        F.round(F.col("sa").cast("double") / F.col("n"), 4).alias(
            "mean_orders"
        ),
        F.round(F.col("sb").cast("double") / F.col("n"), 4).alias(
            "mean_ships"
        ),
    )


@query(
    "q_ord_vwap",
    oracle="""
    SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS VARCHAR)
               AS ship_month,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS pv_cents,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS volume,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 / sum(CAST(l_quantity AS BIGINT)) / 100, 4) AS vwap
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_ord_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per ship month: Σ(price·qty)/Σqty
    — the quantity-weighted price signal a procurement/markets team
    reads instead of the unweighted mean (which a few tiny expensive
    lines distort).

    Exactness: price converts to exact cents, quantities are exact
    integers, so the price-volume numerator and the volume denominator
    are both exact BIGINT sums (map-side combinable); the VWAP is ONE
    final division per month.  One scan, one month-keyed hash
    aggregate — the minimal plan for the question."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = F.sum(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
        * F.col("l_quantity").cast("long")
    )
    vol = F.sum(F.col("l_quantity").cast("long"))
    return (
        li.groupBy(
            F.date_trunc("month", F.col("l_shipdate"))
            .cast("date")
            .cast("string")
            .alias("ship_month")
        )
        .agg(
            pv.cast("long").alias("pv_cents"),
            vol.cast("long").alias("volume"),
            F.round(pv.cast("double") / vol / 100, 4).alias("vwap"),
        )
        .orderBy("ship_month")
    )


@query(
    "q_ord_elasticity",
    oracle="""
    WITH obs AS (
        SELECT CAST(floor(10000e0
                   * ln(CAST(round(l_extendedprice * 100) AS BIGINT)
                        / CAST(l_quantity AS DOUBLE))) AS BIGINT) AS u,
               CAST(floor(10000e0
                   * ln(CAST(l_quantity AS DOUBLE))) AS BIGINT) AS v
        FROM lineitem WHERE l_quantity >= 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(u) AS BIGINT) AS su,
               CAST(sum(v) AS BIGINT) AS sv,
               CAST(sum(u * u) AS BIGINT) AS suu,
               CAST(sum(u * v) AS BIGINT) AS suv,
               CAST(sum(v * v) AS BIGINT) AS svv
        FROM obs
    )
    SELECT n AS n_lines,
           round((CAST(n AS DOUBLE) * suv - CAST(su AS DOUBLE) * sv)
                 / (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su),
                 4) AS elasticity,
           round((CAST(n AS DOUBLE) * suv - CAST(su AS DOUBLE) * sv)
                 * (CAST(n AS DOUBLE) * suv - CAST(su AS DOUBLE) * sv)
                 / ((CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su)
                    * (CAST(n AS DOUBLE) * svv
                       - CAST(sv AS DOUBLE) * sv)), 4) AS r2
    FROM m
    """,
)
def q_ord_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand across lineitem
    observations: the OLS slope of ln(quantity) on ln(unit price) —
    the constant-elasticity estimate a pricing team reads first
    (slope −1.3 means a 1% price rise loses 1.3% volume), with the
    fit's R².

    Determinism: each observation's ln(unit price) and ln(quantity)
    are FLOORED at 10⁴ fixed-point into BIGINTs (the ln-floor trick —
    the unit price enters ln() as ONE shared division of exact
    integers), so ALL six co-moments are exact integer sums —
    order-free, no prefix machinery — and the 10⁴ scales cancel in
    the slope ratio; slope and R² are single shared DOUBLE
    expressions (quadratic co-moment products — overflow rule;
    Σ(u·v) ~ 2.6e10/row stays in BIGINT to ~3e8 rows, then
    DECIMAL(38,0)).  The 1e-4 ln granularity bounds the slope bias
    far below the 4-decimal rounding.

    Scale: one scan, one 1-row aggregate — fully map-side
    combinable."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.where(F.col("l_quantity") >= 1).select(
        F.floor(
            F.lit(10000.0)
            * F.log(
                F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
                / F.col("l_quantity").cast("double")
            )
        )
        .cast("long")
        .alias("u"),
        F.floor(
            F.lit(10000.0) * F.log(F.col("l_quantity").cast("double"))
        )
        .cast("long")
        .alias("v"),
    )
    m = obs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("u").cast("long").alias("su"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("u") * F.col("u")).cast("long").alias("suu"),
        F.sum(F.col("u") * F.col("v")).cast("long").alias("suv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    num = (
        F.col("n").cast("double") * F.col("suv")
        - F.col("su").cast("double") * F.col("sv")
    )
    denu = (
        F.col("n").cast("double") * F.col("suu")
        - F.col("su").cast("double") * F.col("su")
    )
    denv = (
        F.col("n").cast("double") * F.col("svv")
        - F.col("sv").cast("double") * F.col("sv")
    )
    return m.select(
        F.col("n").alias("n_lines"),
        F.round(num / denu, 4).alias("elasticity"),
        F.round(num * num / (denu * denv), 4).alias("r2"),
    )
