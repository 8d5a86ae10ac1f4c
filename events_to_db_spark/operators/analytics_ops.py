"""Decision-analytics operators (SURVEY.md §2.12, round 2).

The experiment / basket / backtest layer a product team runs directly
on the copied event log: a two-proportion experiment read-out, the
market-basket co-occurrence sweep, and a forecasting backtest.  All
three follow the determinism discipline of SURVEY §7.5 — test
statistics assembled from exact BIGINT counts with one identical final
float expression, rankings on exact integers, and per-row error
metrics floored to integer basis points so their averages are exact
rationals rather than order-dependent float sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@query(
    "q_ev_abtest",
    oracle="""
    WITH pc AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS variant,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS n_purch
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT count(*) AS n_users_all, sum(n_purch) AS total_purch FROM pc
    ),
    assign AS (
        SELECT variant,
               CASE WHEN n_purch * tot.n_users_all > tot.total_purch
                    THEN 1 ELSE 0 END AS converted
        FROM pc CROSS JOIN tot
    ),
    arms AS (
        SELECT variant,
               count(*) AS n_users,
               sum(converted) AS n_converted
        FROM assign GROUP BY variant
    ),
    wide AS (
        SELECT
            max(CASE WHEN variant = 0 THEN n_users END) AS na,
            max(CASE WHEN variant = 0 THEN n_converted END) AS ca,
            max(CASE WHEN variant = 1 THEN n_users END) AS nb,
            max(CASE WHEN variant = 1 THEN n_converted END) AS cb
        FROM arms
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
           round(CAST(ca AS DOUBLE) / na, 4) AS rate_a,
           round(CAST(cb AS DOUBLE) / nb, 4) AS rate_b,
           round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                 / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                        * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
                        * (1e0 / na + 1e0 / nb)), 4) AS z_score
    FROM wide
    """,
)
def q_ev_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test read-out of a (simulated) A/B experiment:
    users split by parity of user_id, success = an above-average
    purchase count; the pooled-variance z-score decides whether the
    conversion delta is noise — the experiment-analysis query every
    product team runs against the copied event log.

    "Above average" is the exact integer comparison n_purch·N >
    Σn_purch (no float mean), which keeps the success rate interior at
    any scale factor — a constant predicate like "ever purchased"
    saturates to p=1 on a dense log and zeroes the pooled variance.
    The statistic is assembled from four BIGINT counts (exact keyed
    aggregates, pivoted to one row) with a single identical float
    expression — no engine-private variance estimator.  Plan: two
    keyed aggregates, a broadcast scalar, one pivot row.
    """
    ev = load_table(spark, sf_dir, "events")
    pc = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purch")
    ).select(
        (F.col("user_id") % 2).cast("long").alias("variant"), "n_purch"
    )
    tot = pc.agg(
        F.count("*").alias("n_users_all"),
        F.sum("n_purch").alias("total_purch"),
    )
    assign = pc.crossJoin(F.broadcast(tot)).select(
        "variant",
        F.when(
            F.col("n_purch") * F.col("n_users_all") > F.col("total_purch"), 1
        )
        .otherwise(0)
        .alias("converted"),
    )
    arms = assign.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias(
            "ca"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias(
            "cb"
        ),
    )
    return wide.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("conv_b"),
        F.round(F.expr("cast(ca as double) / na"), 4).alias("rate_a"),
        F.round(F.expr("cast(cb as double) / nb"), 4).alias("rate_b"),
        F.round(
            F.expr(
                "(cast(ca as double) / na - cast(cb as double) / nb)"
                " / sqrt((cast(ca + cb as double) / (na + nb))"
                " * (1 - cast(ca + cb as double) / (na + nb))"
                " * (1e0 / na + 1e0 / nb))"
            ),
            4,
        ).alias("z_score"),
    )


@query(
    "q_basket_lift",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    part_n AS (SELECT l_partkey, count(*) AS c FROM baskets GROUP BY 1),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_together
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT p.part_a, p.part_b, p.n_together,
               ca.c AS n_a, cb.c AS n_b
        FROM pairs p
        JOIN part_n ca ON ca.l_partkey = p.part_a
        JOIN part_n cb ON cb.l_partkey = p.part_b
        ORDER BY p.n_together DESC, p.part_a, p.part_b
        LIMIT 20
    )
    SELECT part_a, part_b,
           CAST(n_together AS BIGINT) AS n_together,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(CAST(n_together AS DOUBLE) * no.n / (n_a * n_b), 4)
               AS lift
    FROM ranked CROSS JOIN n_orders no
    """,
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: the part pairs most
    often bought in the same order, scored by lift = P(a,b)/(P(a)P(b))
    — the association-rule primitive (recommenders, cross-sell,
    co-retrieval for training data) run on the copied fact table.

    The pair generation is a *self-equi-join on the basket key* — per
    order the blow-up is (basket size choose 2), bounded by TPC-H's
    ≤7 lineitems per order, never all-pairs across orders; at 100 TB
    this is one orderkey-partitioned shuffle, the standard scalable
    basket sweep.  The top-20 is orderBy+limit (TakeOrderedAndProject —
    per-partition heaps, no global window) on the exact integer
    co-occurrence count with a pair-key tie-break; lift itself is integer-assembled with one
    identical float division (counts² · orders < 2^53, so exact).
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    part_n = baskets.groupBy("l_partkey").agg(F.count("*").alias("c"))
    n_orders = li.agg(F.count_distinct("l_orderkey").alias("n"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_together"))
    )
    ranked = (
        pairs.join(
            part_n.select(
                F.col("l_partkey").alias("part_a"), F.col("c").alias("n_a")
            ),
            "part_a",
        )
        .join(
            part_n.select(
                F.col("l_partkey").alias("part_b"), F.col("c").alias("n_b")
            ),
            "part_b",
        )
        .orderBy(F.col("n_together").desc(), "part_a", "part_b")
        .limit(20)
    )
    return ranked.crossJoin(F.broadcast(n_orders)).select(
        "part_a",
        "part_b",
        F.col("n_together").cast("long").alias("n_together"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(
            F.expr("cast(n_together as double) * n / (n_a * n_b)"), 4
        ).alias("lift"),
    )


@query(
    "q_ev_forecast_sma",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    pred AS (
        SELECT event_type, day, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                   AS s7,
               count(*) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                   AS k7
        FROM daily
    ),
    scored AS (
        SELECT event_type, c, s7, k7,
               CAST(floor((abs(c * k7 - s7) * 10000e0) / (c * k7))
                    AS BIGINT) AS ape_bp
        FROM pred WHERE k7 = 7
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(sum(ape_bp) / (count(*) * 100e0), 4) AS mape_pct,
           CAST(max(ape_bp) AS BIGINT) AS worst_ape_bp
    FROM scored GROUP BY event_type
    """,
)
def q_ev_forecast_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest: predict each day's event count per type with
    the trailing 7-day simple moving average and score the prediction
    with MAPE — the naive-baseline backtest every forecasting effort
    must beat, computed directly on the copied log.

    Float-sum discipline: averaging per-row float APEs across engines
    is banned (unordered float sum), so each day's absolute percentage
    error is *floored to integer basis points* first —
    ⌊10⁴·|c·k − s|/(c·k)⌋ compares the count against the un-divided
    window sum, all inputs exact integers, one identical float op —
    and the final MAPE is a sum of BIGINTs divided once.  Windows run
    over the per-(type, day) aggregate; only fully-windowed days
    (k=7) are scored.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    pred = daily.select(
        "event_type",
        "c",
        F.sum("c").over(w).alias("s7"),
        F.count("*").over(w).alias("k7"),
    )
    scored = pred.where(F.col("k7") == 7).select(
        "event_type",
        "c",
        F.expr(
            "cast(floor((abs(c * k7 - s7) * 10000e0) / (c * k7)) as bigint)"
        ).alias("ape_bp"),
    )
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_scored"),
        F.round(F.expr("sum(ape_bp) / (count(*) * 100e0)"), 4).alias(
            "mape_pct"
        ),
        F.max("ape_bp").cast("long").alias("worst_ape_bp"),
    )
