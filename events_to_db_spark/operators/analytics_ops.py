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

from events_to_db_spark.operators.graphkernel import (
    collect_edges,
    local_cluster_topk,
    triangle_stats,
)
from events_to_db_spark.plans.checkpoints import truncate_lineage
from events_to_db_spark.plans.prefix import bucketed_running_sum
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


@query(
    "q_skyline",
    oracle="""
    SELECT p.p_partkey,
           round(p.p_retailprice, 4) AS price,
           CAST(p.p_size AS BIGINT) AS size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: parts not dominated on
    (minimize retail price, maximize size) — the multi-criteria
    shortlist operator (cheapest-per-capability sweeps, model-selection
    frontiers) classic OLAP engines ship as SKYLINE OF.

    The oracle is the O(n²) NOT EXISTS definition; the Spark plan is
    the O(n log n) sort-based 2-D skyline, de-single-partitioned: a row
    is dominated iff the max size among *strictly cheaper* rows reaches
    it, or a same-price row is strictly larger.  The strict-prefix max
    over price order runs on the per-price aggregate with the same
    two-level shape as :mod:`events_to_db_spark.plans.prefix` — a
    price-range bucket column, a partitioned window inside each bucket
    (frame ending at −1 row ⇒ strictly-cheaper within the bucket), and
    a broadcast θ-join carry-in of the max over strictly-smaller
    buckets.  No global window, all shuffles keyed; equal (price, size)
    twins stay on the frontier (strict dominance), matching the oracle.
    """
    part = load_table(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("mp")
    )
    d = per_price.withColumn(
        "_pb", F.floor(F.col("p_retailprice") / 500).cast("long")
    )
    w_in = (
        Window.partitionBy("_pb")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("_in_max", F.max("mp").over(w_in))
    totals = d.groupBy("_pb").agg(F.max("mp").alias("_tot"))
    carry = (
        totals.select("_pb")
        .join(
            F.broadcast(
                totals.select(
                    F.col("_pb").alias("_pb2"), F.col("_tot").alias("_t2")
                )
            ),
            F.col("_pb2") < F.col("_pb"),
            "left",
        )
        .groupBy("_pb")
        .agg(F.max("_t2").alias("_carry"))
    )
    d = (
        d.join(F.broadcast(carry), "_pb")
        .withColumn("m_strict", F.greatest("_in_max", "_carry"))
        .select("p_retailprice", "mp", "m_strict")
    )
    sky = part.join(d, "p_retailprice").where(
        (F.col("p_size") == F.col("mp"))
        & (F.col("m_strict").isNull() | (F.col("p_size") > F.col("m_strict")))
    )
    return sky.select(
        "p_partkey",
        F.round("p_retailprice", 4).alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )


@query(
    "q_ev_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           round(max(d.med), 4) AS med,
           round(max(m.mad), 4) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
)
def q_ev_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: per
    event type, the median, the MAD, and how many events sit more than
    3 scaled-MADs (×1.4826, the normal-consistency constant) from the
    median — the robust twin of ``q_ev_anomaly``'s z-score sweep, which
    a single fat-tailed burst can't poison.

    Both engines interpolate the exact median identically
    (Spark ``median`` ≡ DuckDB ``quantile_cont`` at 0.5 — parity
    proven by ``q_win_movmedian``), so the outlier predicate compares
    bitwise-identical doubles.  Plan: two keyed median aggregates over
    the type key (a bounded dimension), each joined back broadcast;
    no window, three shuffles on the same key.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("median(value)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(F.expr("median(adev)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 4).alias("med"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@query(
    "q_win_winsorize",
    oracle="""
    WITH b AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY 1
    )
    SELECT e.event_type,
           round(max(b.lo), 4) AS p05,
           round(max(b.hi), 4) AS p95,
           CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lo,
           CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hi,
           CAST(sum(CAST(floor(greatest(least(e.value, b.hi), b.lo)
                                * 10000e0) AS BIGINT))
                AS BIGINT) AS wsum_e4
    FROM events e JOIN b ON e.event_type = b.event_type
    GROUP BY e.event_type
    """,
)
def q_win_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each event's value to its type's exact
    [p05, p95] band and report the clip counts plus the winsorized
    total — the outlier-capping step a feature pipeline runs before
    fitting anything scale-sensitive (and a quality gate before
    training-data export).

    The cutpoints are exact interpolated percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``); the winsorized total is
    floored to integer 1e-4 units *per row* before summing, so the
    aggregate is a BIGINT sum (order-independent) rather than a float
    sum whose association order differs across engines.  Plan: one
    percentile aggregate on the bounded type key, broadcast back, one
    final keyed aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    return (
        ev.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("lo"), 4).alias("p05"),
            F.round(F.max("hi"), 4).alias("p95"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_lo"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_hi"),
            F.sum(
                F.expr(
                    "cast(floor(greatest(least(value, hi), lo) * 10000e0)"
                    " as bigint)"
                )
            )
            .cast("long")
            .alias("wsum_e4"),
        )
    )


@query(
    "q_ev_decay",
    oracle="""
    WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
    wk AS (
        SELECT user_id,
               CAST(floor(date_diff('day', CAST(ts AS DATE), a.mx) / 7)
                    AS BIGINT) AS w,
               count(*) AS c
        FROM events CROSS JOIN anchor a
        GROUP BY 1, 2
    ),
    score AS (
        SELECT user_id, sum(c * power(0.5e0, w)) AS s FROM wk GROUP BY 1
    )
    SELECT user_id, round(s, 4) AS decay_score
    FROM score ORDER BY s DESC, user_id LIMIT 20
    """,
)
def q_ev_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed engagement score: each event contributes
    2^(−age-in-weeks) with a one-week half-life, summed per user; top
    20 — the recency-weighted ranking behind "active user" scores and
    freshness-weighted sampling of training data.

    Exponential-decay sums are normally banned by the float-sum rule
    (addition order differs across engines), but a power-of-two decay
    on *integer* week ages makes every term a dyadic rational with at
    most 2^-13 in the low bit — sums of those are exact in IEEE
    doubles at any association order, so the cross-engine comparison
    and the top-20 cut are on bitwise-equal scores.  Plan: per
    (user, week) count aggregate, then a user-keyed sum; the anchor
    date is one broadcast scalar; top-20 is TakeOrderedAndProject.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.to_date("ts")).alias("mx"))
    wk = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy(
            "user_id",
            F.floor(F.datediff(F.col("mx"), F.to_date("ts")) / 7)
            .cast("long")
            .alias("w"),
        )
        .agg(F.count("*").alias("c"))
    )
    score = wk.groupBy("user_id").agg(
        F.sum(F.col("c") * F.pow(F.lit(0.5), F.col("w"))).alias("s")
    )
    return (
        score.orderBy(F.col("s").desc(), "user_id")
        .limit(20)
        .select("user_id", F.round("s", 4).alias("decay_score"))
    )


@query(
    "q_graph_triangles",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v AS node FROM edges)
        GROUP BY node
    ),
    tri AS (
        SELECT count(*) AS t
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    wedge AS (SELECT sum(d * (d - 1) / 2) AS w FROM deg)
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(t.t AS BIGINT) AS n_triangles,
           round(3e0 * t.t / w.w, 4) AS clustering
    FROM tri t CROSS JOIN wedge w
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    co-purchase graph (parts are nodes, an edge joins parts bought in
    the same order) — the graph-structure probe (community density,
    spam-ring detection, dedup-cluster sanity) run on a fact-table
    projection.

    The oracle counts triangles by the naive a<b<c edge³ join; the
    Spark plan uses *degree orientation*: each undirected edge points
    from its lower-(degree, id) endpoint to the higher one, so every
    wedge is enumerated exactly once at its lowest-order apex and the
    per-node fan-out is bounded by O(√E) even on power-law graphs —
    the standard distributed triangle sweep (MPS/Cohen), all keyed
    equi-joins, no global structure.  Edge derivation is the same
    orderkey-bounded basket self-join as ``q_basket_lift``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a = baskets.alias("a")
    b = baskets.alias("b")
    # The basket self-join + distinct is referenced by deg (twice),
    # oriented, the closing semi-join AND the summary count — Catalyst
    # replays the whole subtree per reference (8 recomputations showed
    # as 29 Exchanges).  Materialize the edge list once; downstream
    # consumers read the checkpointed blocks.
    edges = truncate_lineage(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct(),
        eager=False,
    )
    # r12 kernel (VERDICT r11 #7): driver-sized edge list + bounded
    # oriented-wedge budget → one numpy pass (graphkernel
    # .triangle_stats, the same degree orientation in array form);
    # the float clustering expression stays IN SPARK on the returned
    # exact ints so both branches share it verbatim.  Above either
    # gate the distributed sweep below is untouched.
    ku, kv, _n_edges = collect_edges(edges)
    if ku is not None:
        stats = triangle_stats(ku, kv)
        if stats is not None:
            nn, ne, tri_n, wsum = stats
            one = spark.createDataFrame(
                [(nn, ne, tri_n, wsum)],
                "n_nodes long, n_edges long, n_triangles long, w long",
            )
            return one.select(
                "n_nodes",
                "n_edges",
                "n_triangles",
                F.round(
                    F.lit(3.0) * F.col("n_triangles") / F.col("w"), 4
                ).alias("clustering"),
            )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # oriented feeds both sides of the wedge self-join: one more
    # truncation stops the deg joins replaying per side.
    oriented = truncate_lineage(
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.col("u"),
            )
            .otherwise(F.col("v"))
            .alias("src"),
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.col("v"),
            )
            .otherwise(F.col("u"))
            .alias("dst"),
        ),
        eager=False,
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (F.col("o1.dst") < F.col("o2.dst")),
    ).select(F.col("o1.dst").alias("u"), F.col("o2.dst").alias("v"))
    tri = wedges.join(edges, ["u", "v"], "left_semi").count()
    # tri is a scalar aggregate job (bounded result), not a row collect;
    # assembling the one-row summary from three scalar aggregates keeps
    # every heavy stage distributed.
    counts = edges.agg(F.count("*").alias("n_edges")).crossJoin(
        deg.agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"),
        )
    )
    return counts.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.lit(tri).cast("long").alias("n_triangles"),
        F.round(F.lit(3.0) * F.lit(tri) / F.col("w"), 4).alias("clustering"),
    )


@query(
    "q_win_volatility",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    ),
    frames AS (
        SELECT event_type, day, cents,
               count(*) OVER w AS n,
               CAST(sum(cents) OVER w AS BIGINT) AS sx,
               CAST(sum(cents * cents) OVER w AS BIGINT) AS sxx
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cents,
           CAST(n AS BIGINT) AS n_days,
           round(CASE WHEN n > 1 THEN
               sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    / (CAST(n AS DOUBLE) * (n - 1))) / 100
           END, 4) AS vol_7d
    FROM frames
    ORDER BY event_type, day
    """,
)
def q_win_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day volatility (sample stddev) of daily revenue per
    event type, computed on exact integer cents.

    ``value`` is 2-decimal by construction, so ``round(value·100)`` is
    an exact BIGINT and the frame's Σx/Σx² are exact — the only float
    is the final √ on identical integers (doubles enter *before* the
    n·Σxx product, which would pass 2⁶³ on a large corpus).  Contrast
    with a naive ``stddev() OVER w``: engine-private accumulation order
    makes that unhashable across engines.  Plan: one keyed daily agg,
    one calendar-bounded frame window per type.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    frames = daily.select(
        "event_type",
        "day",
        "cents",
        F.count("*").over(w).alias("n"),
        F.sum("cents").over(w).cast("long").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).over(w).cast("long").alias("sxx"),
    )
    return frames.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        F.col("n").cast("long").alias("n_days"),
        F.round(
            F.when(
                F.col("n") > 1,
                F.sqrt(
                    (
                        F.col("n").cast("double") * F.col("sxx")
                        - F.col("sx").cast("double") * F.col("sx")
                    )
                    / (F.col("n").cast("double") * (F.col("n") - 1))
                )
                / 100,
            ),
            4,
        ).alias("vol_7d"),
    ).orderBy("event_type", "day")


@query(
    "q_agg_covar",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS x,
               CAST(hour(ts) AS BIGINT) AS y
        FROM events
    ),
    s AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM m GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * (n - 1)) / 100, 6) AS covar_samp
    FROM s ORDER BY event_type
    """,
)
def q_agg_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance between event value (exact cents) and
    hour-of-day, per event type — assembled from exact BIGINT moment
    sums instead of the engine-private ``covar_samp`` accumulator, so
    the result value-hashes across engines.  Doubles enter only in the
    single final expression (the n·Σxy product stays BIGINT-safe per
    type up to ~10⁹ rows·type; beyond that promote to DECIMAL(38,0)).
    One two-phase hash aggregate, map-side partials, no window.
    """
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.hour("ts").cast("long").alias("y"),
    )
    s = m.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            (
                F.col("n").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / (F.col("n").cast("double") * (F.col("n") - 1))
            / 100,
            6,
        ).alias("covar_samp"),
    ).orderBy("event_type")


@query(
    "q_ev_ratelimit",
    oracle="""
    WITH per_min AS (
        SELECT user_id, date_trunc('minute', ts) AS minute,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    peak AS (
        SELECT user_id,
               max(n) AS peak_per_min,
               count(*) AS active_minutes,
               CAST(sum(n) AS BIGINT) AS total
        FROM per_min GROUP BY 1
    )
    SELECT user_id, CAST(peak_per_min AS BIGINT) AS peak_per_min,
           CAST(active_minutes AS BIGINT) AS active_minutes,
           total
    FROM peak
    WHERE peak_per_min >= 2
    ORDER BY peak_per_min DESC, user_id
    """,
)
def q_ev_ratelimit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit / abuse sweep: users whose peak per-minute event rate
    reaches the throttle threshold (≥2), with their activity profile —
    the fraud-ops query every ingest pipeline runs on the copied log.

    Two keyed aggregates (user×minute, then user) with map-side
    combine; the minute bucket is ``date_trunc``, identical in both
    engines under the UTC session timezone.  At 100 TB both shuffles
    are keyed and combine-heavy — no windows, no skew (user×minute
    keys are near-unique).
    """
    ev = load_table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count("*").alias("n"))
    peak = per_min.groupBy("user_id").agg(
        F.max("n").alias("peak_per_min"),
        F.count("*").alias("active_minutes"),
        F.sum("n").cast("long").alias("total"),
    )
    return (
        peak.where(F.col("peak_per_min") >= 2)
        .select(
            "user_id",
            F.col("peak_per_min").cast("long").alias("peak_per_min"),
            F.col("active_minutes").cast("long").alias("active_minutes"),
            "total",
        )
        .orderBy(F.col("peak_per_min").desc(), "user_id")
    )


@query(
    "q_ev_time_to_convert",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purch
        FROM events GROUP BY 1
    ),
    gaps AS (
        SELECT CAST((epoch_us(t_purch) - epoch_us(t_signup)) // 1000000
                    AS BIGINT) AS gap_s
        FROM firsts
        WHERE t_signup IS NOT NULL AND t_purch IS NOT NULL
          AND t_purch >= t_signup
    )
    SELECT count(*) AS n_converted,
           CAST(min(gap_s) AS BIGINT) AS min_s,
           round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
           round(quantile_cont(gap_s, 0.9), 4) AS p90_s,
           CAST(max(gap_s) AS BIGINT) AS max_s
    FROM gaps
    """,
)
def q_ev_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase conversion latency distribution: per-user
    first-event reduction (conditional min — one hash aggregate, the
    scalable alternative to a sorted window), then exact-integer second
    gaps summarized at min/p50/p90/max.

    ``percentile(gap, p)`` and DuckDB ``quantile_cont`` share the same
    linear-interpolation definition on exact BIGINT inputs, so the
    quantiles hash-match (precedent: q_agg_q1).  Both aggregates are
    two-phase; nothing is ordered globally.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("t_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purch"),
    )
    gaps = firsts.where(
        F.col("t_signup").isNotNull()
        & F.col("t_purch").isNotNull()
        & (F.col("t_purch") >= F.col("t_signup"))
    ).select(
        # integer div, not float: a double quotient of ~1e12 µs loses
        # the seconds digit and truncates off-by-one vs the oracle
        F.expr(
            "(unix_micros(t_purch) - unix_micros(t_signup)) div 1000000"
        ).alias("gap_s")
    )
    return gaps.agg(
        F.count("*").alias("n_converted"),
        F.min("gap_s").cast("long").alias("min_s"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 4).alias("p90_s"),
        F.max("gap_s").cast("long").alias("max_s"),
    )


@query(
    "q_ev_jaccard_types",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    sizes AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           round(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 4)
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.event_type = inter.type_a
    JOIN sizes sb ON sb.event_type = inter.type_b
    ORDER BY type_a, type_b
    """,
)
def q_ev_jaccard_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity between the user
    sets of every event-type pair — the segment-overlap question
    behind campaign planning and cohort design.

    Intersections come from a self-equi-join on ``user_id`` whose
    per-user fan-out is bounded by (types-per-user choose 2) ≤ 10 —
    never an all-pairs cross of users; unions are derived as
    |A|+|B|−|A∩B| from exact counts, so the only float is the final
    per-pair division.  One user-keyed shuffle + two broadcast joins.
    """
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ut.alias("a")
    b = ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_ev_stickiness",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    span AS (SELECT min(d) AS lo, max(d) AS hi FROM user_days),
    dau AS (SELECT d, count(*) AS dau FROM user_days GROUP BY 1),
    wau AS (
        SELECT w_end, count(DISTINCT user_id) AS wau
        FROM (
            SELECT user_id, d + CAST(g.x AS INTEGER) AS w_end
            FROM user_days,
                 (SELECT unnest(generate_series(0, 6)) AS x) g
        ), span
        WHERE w_end BETWEEN span.lo AND span.hi
        GROUP BY 1
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS d,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
    FROM dau JOIN wau ON wau.w_end = dau.d
    ORDER BY dau.d
    """,
)
def q_ev_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — how much of the weekly audience
    shows up daily.  Reuses the scalable WAU shape (user-day dedup →
    7× explode contribution → per-day distinct count; shuffle volume
    7·|user-days| regardless of event volume) joined back to the plain
    DAU aggregate; the ratio is the single final float.
    """
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    span = user_days.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    dau = user_days.groupBy("d").agg(F.count("*").alias("dau"))
    wau = (
        user_days.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("w_end"),
        )
        .crossJoin(F.broadcast(span))
        .filter(F.col("w_end").between(F.col("lo"), F.col("hi")))
        .groupBy("w_end")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.w_end)
        .select(
            F.col("d").cast("string").alias("d"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(
                F.col("dau").cast("double") / F.col("wau"), 4
            ).alias("stickiness"),
        )
        .orderBy("d")
    )


@query(
    "q_ev_trigrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type, 1) OVER w AS p1,
               lag(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2 AS e1, p1 AS e2, event_type AS e3, count(*) AS n
    FROM seq
    WHERE p2 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 15
    """,
)
def q_ev_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 three-event behavioral sequences (consecutive per user in
    (ts, event_id) order) — the sequence-mining primitive one level up
    from q_ev_transitions' bigrams; feeds funnel discovery and
    next-action models.

    One user-keyed window shuffle produces both lags; the trigram count
    is a combine-heavy hash aggregate over a ≤|types|³ keyspace and the
    top-k is TakeOrderedAndProject with a full lexicographic tie-break.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e3"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.lag("event_type", 2).over(w).alias("e1"),
    )
    return (
        seq.where(F.col("e1").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(15)
    )


@query(
    "q_ev_dwell",
    oracle="""
    WITH g AS (
        SELECT event_type,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id))
                - epoch_us(ts)) // 1000000 AS dwell_s
        FROM events
    )
    SELECT event_type,
           count(dwell_s) AS n_gaps,
           CAST(sum(dwell_s) AS BIGINT) AS total_dwell_s,
           round(quantile_cont(dwell_s, 0.5), 4) AS p50_s
    FROM g
    WHERE dwell_s IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def q_ev_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time attribution: the time until each user's next event,
    credited to the *current* event's type — the engagement metric
    behind "where do users spend time".  Gaps are exact integer
    seconds (µs integer division — float division truncates off-by-one
    at ~1e12 µs); the per-type summary interpolates p50 on exact ints
    (same definition both engines).  One user-keyed window shuffle,
    then a 5-key hash aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(lead(ts) over (partition by user_id"
            " order by ts, event_id)) - unix_micros(ts)) div 1000000"
        ).alias("dwell_s"),
    )
    return (
        g.where(F.col("dwell_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("dwell_s").alias("n_gaps"),
            F.sum("dwell_s").cast("long").alias("total_dwell_s"),
            F.round(F.expr("percentile(dwell_s, 0.5)"), 4).alias("p50_s"),
        )
        .orderBy("event_type")
    )


@query(
    "q_text_heaps",
    oracle="""
    WITH toks AS (
        SELECT source, t.term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    )
    SELECT source,
           count(*) AS n_tokens,
           count(DISTINCT term) AS vocab,
           round(CAST(count(DISTINCT term) AS DOUBLE) / count(*), 6)
               AS ttr
    FROM toks GROUP BY 1 ORDER BY 1
    """,
)
def q_text_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth profile per source: token mass, distinct
    vocabulary, and type-token ratio — the Heaps'-law health check a
    curation pipeline runs to spot template-generated or truncated
    sources (TTR collapses on boilerplate).  One explode feeding a
    single aggregate with a distinct-count (two-phase, map-side
    partials on (source, term)).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    )
    return (
        toks.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("term").alias("vocab"),
            F.round(
                F.countDistinct("term").cast("double") / F.count("*"), 6
            ).alias("ttr"),
        )
        .orderBy("source")
    )


@query(
    "q_ev_powerlaw",
    oracle="""
    WITH per_user AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY 1
    )
    SELECT length(printf('%b', n)) - 1 AS log2_bucket,
           count(*) AS n_users,
           CAST(min(n) AS BIGINT) AS min_events,
           CAST(max(n) AS BIGINT) AS max_events
    FROM per_user
    GROUP BY 1 ORDER BY 1
    """,
)
def q_ev_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity power-law histogram: users bucketed by
    ⌊log₂(events)⌋ — the heavy-tail diagnostic behind skew planning
    (which keys need salting).  The bucket is computed EXACTLY as
    binary-representation length − 1 (Spark ``conv(n,10,2)``, DuckDB
    ``printf('%%b')``) — ``floor(ln n / ln 2)`` is wrong at powers of
    two, where the float ratio lands at 2.9999… and floors down.  Two
    keyed aggregates, combine-heavy.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    return (
        per_user.groupBy(
            (F.length(F.conv(F.col("n"), 10, 2)) - 1)
            .cast("long")
            .alias("log2_bucket")
        )
        .agg(
            F.count("*").alias("n_users"),
            F.min("n").cast("long").alias("min_events"),
            F.max("n").cast("long").alias("max_events"),
        )
        .orderBy("log2_bucket")
    )


@query(
    "q_join_lateral",
    oracle="""
    SELECT n.n_name, t.c_name, round(t.c_acctbal, 4) AS acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """,
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL surface: top-2
    customers by balance per nation, expressed as the per-row
    dependent subquery a migrating user would paste in, not a manual
    window rewrite.  Catalyst decorrelates it into a
    join + per-key limit (no per-row re-execution); the unique
    (balance desc, name) tie-break keeps both engines' top-2 identical.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "lateral_nation_v"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lateral_customer_v"
    )
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, round(t.c_acctbal, 4) AS acctbal
        FROM lateral_nation_v n,
        LATERAL (SELECT c_name, c_acctbal FROM lateral_customer_v c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
        """
    )


@query(
    "q_ev_bounce",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id))
                        > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks
    ),
    per_sess AS (
        SELECT user_id, sid,
               CAST(min(ts) AS DATE) AS day,
               count(*) AS n_events
        FROM sess GROUP BY 1, 2
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS bounce_rate
    FROM per_sess GROUP BY 1 ORDER BY 1
    """,
)
def q_ev_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-min-gap sessions containing
    exactly one event, keyed to the session's start day — the
    engagement-quality metric next to q_ev_session's volume counts.

    Spark side uses the native ``session_window`` (streaming-capable,
    one user_id shuffle); the oracle expresses the identical gap>30min
    session semantics via the lag+running-sum rewrite.  The tie at a
    gap of exactly 30:00 follows session_window's merge (≤ boundary),
    mirrored in the oracle with a strict ``>`` split.
    """
    ev = load_table(spark, sf_dir, "events")
    per_sess = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count("*").alias("n_events"), F.min("ts").alias("s_start"))
    return (
        per_sess.groupBy(
            F.date_format(F.col("s_start").cast("date"), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounce"),
            F.round(
                F.sum(
                    F.when(F.col("n_events") == 1, 1).otherwise(0)
                ).cast("double")
                / F.count("*"),
                4,
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


@query(
    "q_ev_entry_exit",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id))
                        > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks
    ),
    ee AS (
        SELECT user_id, sid,
               first(event_type ORDER BY ts, event_id) AS entry,
               last(event_type ORDER BY ts, event_id) AS exit
        FROM sess GROUP BY 1, 2
    )
    SELECT entry, exit, count(*) AS n_sessions
    FROM ee GROUP BY 1, 2
    ORDER BY n_sessions DESC, entry, exit
    LIMIT 10
    """,
)
def q_ev_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 (entry → exit) event-type pairs across 30-min sessions —
    where journeys start and where they die, the landing/exit-page
    analysis on the event copy.

    First/last per session via ``min_by/max_by`` over the unique
    (ts, event_id) order (deterministic under ties by construction);
    one user_id shuffle for the session window, a session-keyed
    aggregate, then a tiny pair count + TakeOrderedAndProject.
    """
    ev = load_table(spark, sf_dir, "events")
    ee = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(
        F.expr("min_by(event_type, struct(ts, event_id))").alias("entry"),
        F.expr("max_by(event_type, struct(ts, event_id))").alias("exit"),
    )
    return (
        ee.groupBy("entry", "exit")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "entry", "exit")
        .limit(10)
    )


@query(
    "q_ev_cohort_ltv",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
    ),
    cohorts AS (
        SELECT user_id, date_trunc('week', d0) AS cohort_week
        FROM first_seen
    ),
    purch AS (
        SELECT e.user_id,
               CAST((epoch_us(CAST(date_trunc('week', CAST(e.ts AS DATE))
                                   AS TIMESTAMP))
                     - epoch_us(CAST(c.cohort_week AS TIMESTAMP)))
                    // 604800000000 AS BIGINT) AS week_idx,
               CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN cohorts c USING (user_id)
        WHERE e.event_type = 'purchase'
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           p.week_idx,
           count(DISTINCT p.user_id) AS n_buyers,
           CAST(sum(p.cents) AS BIGINT) AS revenue_cents
    FROM purch p
    JOIN cohorts c USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: purchase revenue (exact integer cents) by
    first-seen week cohort × weeks-since-cohort — the money companion
    to q_ev_cohort's retention counts; the cumulative row over
    ``week_idx`` is each cohort's LTV curve.

    Week index is an exact integer division of µs deltas between
    week-truncated dates (identical truncation rule both engines under
    UTC); revenue never touches floats.  Plan: first-seen reduction,
    one broadcast-joinable cohort map (|users| rows — at larger scale
    the join is a plain keyed shuffle), one hash aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min(F.col("ts").cast("date"))).alias(
            "cohort_week"
        )
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr(
                "(unix_micros(date_trunc('week', cast(ts as date)))"
                " - unix_micros(cohort_week)) div 604800000000"
            ).alias("week_idx"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return (
        purch.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_idx",
        )
        .agg(
            F.countDistinct("user_id").alias("n_buyers"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("cohort_week", "week_idx")
    )


@query(
    "q_ev_islands",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id,
               event_id - row_number() OVER (
                   PARTITION BY user_id ORDER BY event_id) AS grp
        FROM events
    ),
    islands AS (
        SELECT user_id, grp,
               count(*) AS len,
               min(event_id) AS first_id
        FROM seq GROUP BY 1, 2
    )
    SELECT user_id,
           count(*) AS n_islands,
           CAST(max(len) AS BIGINT) AS longest,
           CAST(min(first_id) AS BIGINT) AS first_event
    FROM islands
    GROUP BY 1
    HAVING max(len) >= 2
    ORDER BY longest DESC, user_id
    """,
)
def q_ev_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of *consecutive global event ids*
    per user (bursts where the user owned the stream), via the classic
    ``id − row_number()`` grouping key — constant within an island,
    distinct across islands.

    Users whose longest island ≥ 2 are reported.  One user-keyed
    window shuffle + two hash aggregates; the island key is pure
    integer arithmetic, so no sort beyond the windowed partition.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        (F.col("event_id") - F.row_number().over(w)).alias("grp"),
    )
    islands = seq.groupBy("user_id", "grp").agg(
        F.count("*").alias("len"), F.min("event_id").alias("first_id")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.max("len").cast("long").alias("longest"),
            F.min("first_id").cast("long").alias("first_event"),
        )
        .where(F.col("longest") >= 2)
        .orderBy(F.col("longest").desc(), "user_id")
    )


@query(
    "q_ev_attribution_linear",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, ts AS t_ts, event_type AS touch
        FROM events WHERE event_type <> 'purchase'
    ),
    pairs AS (
        SELECT p.p_id, t.touch
        FROM purchases p JOIN touches t
          ON t.user_id = p.user_id
         AND t.t_ts < p.p_ts
         AND t.t_ts >= p.p_ts - INTERVAL 1 DAY
    ),
    sized AS (
        SELECT p_id, touch, n_of_type,
               sum(n_of_type) OVER (PARTITION BY p_id) AS n_touches
        FROM (SELECT p_id, touch, count(*) AS n_of_type
              FROM pairs GROUP BY p_id, touch)
    )
    SELECT touch,
           CAST(sum((1000000 * n_of_type) // n_touches) AS BIGINT)
               AS credit_millionths,
           count(DISTINCT p_id) AS n_purchases_touched
    FROM sized
    GROUP BY 1 ORDER BY 1
    """,
)
def q_ev_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution: every purchase
    divides one unit of credit equally across its preceding 24 h of
    non-purchase touches — the fractional-credit counterpart of
    q_ev_attribution's last-touch rule.

    Credits are exact integer *millionths* (1e6 ``div`` touches —
    floor; the ≤1e-6 remainder per purchase is part of the spec and
    identical in both engines), so per-channel sums are exact BIGINTs.
    The touch join is a user-keyed band join (bounded 24 h window),
    then per-purchase sizing via one purchase-keyed window over the
    per-(purchase, type) aggregate — never over raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    touches = ev.where(F.col("event_type") != "purchase").select(
        "user_id", F.col("ts").alias("t_ts"), F.col("event_type").alias("touch")
    )
    pairs = purchases.join(
        touches,
        (purchases.user_id == touches.user_id)
        & (touches.t_ts < purchases.p_ts)
        & (touches.t_ts >= purchases.p_ts - F.expr("INTERVAL 1 DAY")),
    ).select("p_id", "touch")
    per_type = pairs.groupBy("p_id", "touch").agg(
        F.count("*").alias("n_of_type")
    )
    sized = per_type.withColumn(
        "n_touches",
        F.sum("n_of_type").over(Window.partitionBy("p_id")),
    )
    return (
        sized.groupBy("touch")
        .agg(
            F.sum(
                F.expr("(1000000 * n_of_type) div n_touches")
            )
            .cast("long")
            .alias("credit_millionths"),
            F.countDistinct("p_id").alias("n_purchases_touched"),
        )
        .orderBy("touch")
    )


@query(
    "q_rollup_geo",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 4) AS total_bal,
           CAST(grouping(r.r_name) AS INT) AS g_region,
           CAST(grouping(n.n_name) AS INT) AS g_nation
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY g_region, g_nation, r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def q_rollup_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geography-hierarchy ROLLUP over a joined dimension chain
    (region → nation → customer): per-nation, per-region subtotals and
    the grand total in one pass — the join+rollup combination the
    plain single-table rollup query doesn't exercise.

    Both dims broadcast onto the customer scan (two BroadcastHashJoins,
    zero pre-agg exchanges); the rollup itself is Catalyst's Expand +
    two-phase aggregate.  ``grouping()`` markers disambiguate real
    NULLs from subtotal rows, same contract as q_agg_rollup.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), n.n_nationkey == c.c_nationkey
    ).join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
        )
        .orderBy(
            "g_region",
            "g_nation",
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


@query(
    "q_ev_session_funnel",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id))
                        > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, event_type,
               sum(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks
    ),
    stages AS (
        SELECT user_id, sid,
               min(CASE WHEN event_type = 'view' THEN ts END) AS v,
               min(CASE WHEN event_type = 'click' THEN ts END) AS c,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
        FROM sess GROUP BY 1, 2
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS s1_view,
           CAST(sum(CASE WHEN v IS NOT NULL AND c > v
                         THEN 1 ELSE 0 END) AS BIGINT) AS s2_click,
           CAST(sum(CASE WHEN v IS NOT NULL AND c > v AND p > c
                         THEN 1 ELSE 0 END) AS BIGINT) AS s3_purchase
    FROM stages
    """,
)
def q_ev_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session funnel: sessions whose FIRST view precedes their
    first click precedes their first purchase — conversion measured
    inside one 30-min session, not across the whole timeline (the
    session-scoped twin of q_ev_funnel; first-occurrence ordering is
    the standard funnel simplification, stated in the spec).

    Per-session stage minima come out of the session_window aggregate
    (conditional min — no second pass over events); NULL-safe ``>``
    comparisons encode stage order.  One user shuffle + one session
    aggregate + a scalar row.
    """
    ev = load_table(spark, sf_dir, "events")
    stages = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("p"),
    )
    return stages.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("s1_view"),
        F.sum(
            F.when(F.col("v").isNotNull() & (F.col("c") > F.col("v")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s2_click"),
        F.sum(
            F.when(
                F.col("v").isNotNull()
                & (F.col("c") > F.col("v"))
                & (F.col("p") > F.col("c")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("s3_purchase"),
    )


@query(
    "q_ev_invalid_transitions",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS s,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS p,
               min(CASE WHEN event_type = 'click' THEN ts END) AS c
        FROM events GROUP BY 1
    )
    SELECT
        CASE
            WHEN p IS NOT NULL AND s IS NULL THEN 'purchase_no_signup'
            WHEN p IS NOT NULL AND p < s THEN 'purchase_before_signup'
            WHEN c IS NOT NULL AND s IS NULL THEN 'click_no_signup'
            WHEN c IS NOT NULL AND c < s THEN 'click_before_signup'
            ELSE 'ok'
        END AS violation,
        count(*) AS n_users
    FROM firsts
    GROUP BY 1 ORDER BY 1
    """,
)
def q_ev_invalid_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle-order audit: users whose first purchase/click precedes
    (or lacks) a signup — the referential-order integrity check an
    event-copy consumer runs to catch dropped or mis-ordered ingest
    (the behavioral analogue of q_quality_constraints' FK audit).

    First-occurrence reduction per user (conditional min, one hash
    aggregate), then a priority-ordered CASE classification — NULL
    comparisons fall through exactly the same way in both engines
    because every branch tests IS NULL explicitly first.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("p"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
    )
    v = (
        F.when(
            F.col("p").isNotNull() & F.col("s").isNull(),
            "purchase_no_signup",
        )
        .when(
            F.col("p").isNotNull() & (F.col("p") < F.col("s")),
            "purchase_before_signup",
        )
        .when(F.col("c").isNotNull() & F.col("s").isNull(), "click_no_signup")
        .when(
            F.col("c").isNotNull() & (F.col("c") < F.col("s")),
            "click_before_signup",
        )
        .otherwise("ok")
    )
    return (
        firsts.groupBy(v.alias("violation"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("violation")
    )


@query(
    "q_ord_monthly_mix",
    oracle="""
    WITH m AS (
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS mo,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM m)
    SELECT CAST(y AS INT) AS y, CAST(mo AS INT) AS mo, cents,
           CAST((10000 * cents) // tot.total AS BIGINT) AS share_bp
    FROM m CROSS JOIN tot
    ORDER BY y, mo
    """,
)
def q_ord_monthly_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue mix: each (year, month)'s share of lifetime
    order value in exact basis points — seasonality on the money axis
    (q_ev_seasonality covers the traffic axis).

    Revenue is exact integer cents (2-decimal source data), the share
    is a floor division against the broadcast grand total — no float
    enters at all, so the output hash-matches structurally.  One keyed
    aggregate + one scalar broadcast.
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tot = m.agg(F.sum("cents").cast("long").alias("total"))
    return (
        m.crossJoin(F.broadcast(tot))
        .select(
            F.col("y").cast("int").alias("y"),
            F.col("mo").cast("int").alias("mo"),
            "cents",
            F.expr("(10000 * cents) div total").cast("long").alias("share_bp"),
        )
        .orderBy("y", "mo")
    )


@query(
    "q_ev_interarrival",
    oracle="""
    WITH gaps AS (
        SELECT epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    SELECT length(printf('%b', gap_us)) - 1 AS log2_us,
           count(*) AS n_gaps
    FROM gaps
    WHERE gap_us IS NOT NULL AND gap_us > 0
    GROUP BY 1 ORDER BY 1
    """,
)
def q_ev_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time histogram on ⌊log₂(µs)⌋ buckets — the
    arrival-process fingerprint (Poisson-like vs bursty) that picks
    session thresholds and watermark horizons; exact binary-length
    bucketing as in q_ev_powerlaw (float log misbuckets at powers of
    two).  One user-keyed window shuffle + a ≤64-key hash aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us")
    )
    return (
        gaps.where(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
        .groupBy(
            (F.length(F.conv(F.col("gap_us"), 10, 2)) - 1)
            .cast("long")
            .alias("log2_us")
        )
        .agg(F.count("*").alias("n_gaps"))
        .orderBy("log2_us")
    )


@query(
    "q_ev_peaks",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    nbr AS (
        SELECT event_type, d, cnt,
               lag(cnt)  OVER (PARTITION BY event_type ORDER BY d) AS prv,
               lead(cnt) OVER (PARTITION BY event_type ORDER BY d) AS nxt
        FROM daily
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, cnt
    FROM nbr
    WHERE prv IS NOT NULL AND nxt IS NOT NULL
      AND cnt > prv AND cnt > nxt
    ORDER BY event_type, day
    """,
)
def q_ev_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection on the daily event-count series: days
    strictly above both calendar neighbours, per type (change-point /
    spike triage primitive).

    One keyed aggregate collapses the log to |types|×|days| rows, so
    the lag/lead window runs over a bounded per-type series — the
    window partition count is fixed (5 types), safe at any fact size.
    Strict > on exact BIGINT counts: no float, no tie ambiguity.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("d")
    return (
        daily.withColumn("prv", F.lag("cnt").over(w))
        .withColumn("nxt", F.lead("cnt").over(w))
        .where(
            F.col("prv").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("cnt") > F.col("prv"))
            & (F.col("cnt") > F.col("nxt"))
        )
        .select("event_type", F.date_format("d", "yyyy-MM-dd").alias("day"), "cnt")
        .orderBy("event_type", "day")
    )


@query(
    "q_ev_calendar",
    oracle="""
    SELECT CAST(isodow(ts) - 1 AS BIGINT) AS wd,
           CAST(hour(ts) AS BIGINT) AS hr,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_ev_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity calendar (0 = Monday): event count and
    distinct users per cell — the 168-cell heatmap behind every
    "when are users active" dashboard.

    Single hash aggregate to a fixed 7×24 keyspace; the distinct-user
    count is Spark's two-phase partial-distinct expand, no row list.
    Weekday parity: Spark ``weekday()`` is 0=Monday, DuckDB
    ``isodow−1`` likewise — both timezone-stable under the UTC
    session (load_table pins the LTZ reading).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.weekday("ts").cast("bigint").alias("wd"),
            F.hour("ts").cast("bigint").alias("hr"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("users"),
        )
        .orderBy("wd", "hr")
    )


@query(
    "q_ev_rolling_active",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT ud.user_id) AS BIGINT) AS active_7d
    FROM days JOIN ud
      ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    ORDER BY days.d
    """,
)
def q_ev_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the sliding sibling of
    the calendar-week WAU): for each active day, distinct users with
    any event in [d−6, d].

    Rolling distinct is not sum-decomposable, so the scalable shape is
    contribute-forward: dedup to (user, day) pairs first (the big
    shrink — one shuffle on the fact), then each pair explodes to the
    ≤7 target days it contributes to and one hash aggregate counts
    distinct users per target day.  Work is 7×|user-days|, never
    7×|events|, and no self-join of the fact — the oracle's
    BETWEEN-join restates it quadratically at oracle scale.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("td"),
    )
    return (
        contrib.join(F.broadcast(days), contrib.td == days.d)
        .groupBy("td")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_7d"))
        .select(F.date_format("td", "yyyy-MM-dd").alias("day"), "active_7d")
        .orderBy("day")
    )


@query(
    "q_ord_reorder_gap",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(CAST(o_orderdate AS DATE)) OVER w,
                         CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT CAST(gap_days // 7 AS BIGINT) AS gap_weeks,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(gap_days) AS BIGINT) AS min_days,
           CAST(max(gap_days) AS BIGINT) AS max_days
    FROM seq WHERE gap_days IS NOT NULL
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_ord_reorder_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-latency histogram: days between a customer's
    consecutive orders, bucketed by week.

    One custkey-partitioned window (bounded per-customer sequences,
    parallel across customers) with the §7.5 unique tie-break
    (orderdate, orderkey) so same-day orders sequence identically in
    both engines; exact integer day diffs on DATE values — DuckDB's
    date_diff counts midnight crossings, which equals the floored
    delta exactly because both sides are midnight-aligned dates.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
        ).alias("gap_days"),
    )
    return (
        seq.where(F.col("gap_days").isNotNull())
        .groupBy(F.floor(F.col("gap_days") / 7).cast("bigint").alias("gap_weeks"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("gap_days").cast("bigint").alias("min_days"),
            F.max("gap_days").cast("bigint").alias("max_days"),
        )
        .orderBy("gap_weeks")
    )


@query(
    "q_ev_attribution_decay",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts AS p_ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, ts AS t_ts, event_type AS touch
        FROM events WHERE event_type <> 'purchase'
    ),
    pairs AS (
        SELECT t.touch,
               p.cents * (1::BIGINT <<
                   (6 - CAST((epoch_us(p.p_ts) - epoch_us(t.t_ts))
                             // 86400000000 AS INTEGER))) AS credit
        FROM purchases p JOIN touches t
          ON t.user_id = p.user_id
         AND t.t_ts < p.p_ts
         AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
    ),
    per AS (
        SELECT touch, sum(credit) AS credit_units, count(*) AS n_pairs
        FROM pairs GROUP BY 1
    ),
    tot AS (SELECT sum(credit_units) AS total FROM per)
    SELECT touch,
           CAST(credit_units AS BIGINT)  AS credit_units,
           CAST((10000 * credit_units) // tot.total AS BIGINT) AS share_bp,
           CAST(n_pairs AS BIGINT)       AS n_pairs
    FROM per CROSS JOIN tot
    """,
)
def q_ev_attribution_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay multi-touch attribution — credit halves
    per day of distance from the conversion — computed with EXACT
    integer arithmetic: a touch ``d`` whole days before the purchase
    earns ``cents · 2^(6−d)`` credit units (d ∈ 0..6 inside the 7-day
    window), so the dyadic decay weights are integer SHIFTS, not float
    powers — per-channel sums are exact BIGINTs and the channel shares
    are integer basis points (the same no-float-sum discipline as
    q_ev_attribution_linear's millionths; day distance is the µs gap
    integer-divided, never a double quotient).

    The touch↔conversion pairing is the user-keyed 7-day band join
    (bounded per-user fan-out); everything after is two tiny hash
    aggregates and a broadcast scalar for the share denominator.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    t = ev.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch"),
    )
    pairs = p.join(
        t,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
    ).select(
        "touch",
        F.expr(
            "cents * shiftleft(cast(1 as bigint),"
            " 6 - cast((unix_micros(p_ts) - unix_micros(t_ts))"
            " div 86400000000 as int))"
        ).alias("credit"),
    )
    per = pairs.groupBy("touch").agg(
        F.sum("credit").alias("credit_units"),
        F.count("*").alias("n_pairs"),
    )
    tot = per.agg(F.sum("credit_units").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "touch",
        F.col("credit_units").cast("bigint").alias("credit_units"),
        F.expr("(10000 * credit_units) div total").cast("bigint").alias(
            "share_bp"
        ),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
    )


@query(
    "q_ev_pattern_match",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_id,
               CASE WHEN value > lag(value) OVER w THEN 'u'
                    WHEN value < lag(value) OVER w THEN 'd'
                    WHEN lag(value) OVER w IS NULL THEN ''
                    ELSE 'e' END AS sym
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seq AS (
        SELECT user_id,
               string_agg(sym, '' ORDER BY ts, event_id) AS path
        FROM s GROUP BY user_id
    ),
    pat AS (
        SELECT CAST(len(regexp_extract_all(path, 'd+u+')) AS BIGINT)
                   AS n_valley,
               CAST(len(regexp_extract_all(path, 'u+d+')) AS BIGINT)
                   AS n_peak
        FROM seq
    )
    SELECT n_valley, n_peak, CAST(count(*) AS BIGINT) AS n_users
    FROM pat GROUP BY n_valley, n_peak
    """,
)
def q_ev_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection — the SQL:2016
    row-pattern feature Spark lacks, re-expressed Spark-first: compress
    each user's value movements into a symbol string (u/d/e against the
    previous event, (ts, event_id) total order) and count valley
    (``d+u+``) and peak (``u+d+``) patterns with one regex per user.
    Output: the (valleys, peaks) grid with user counts.

    Exact comparisons produce the symbols, codegen ``regexp_extract_all``
    counts the matches — no floats anywhere.  Per-user strings are
    bounded by events-per-user (same per-entity compression contract as
    q_ev_sessionpath); everything is user-partitioned, one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("value") > F.lag("value").over(w), "u")
        .when(F.col("value") < F.lag("value").over(w), "d")
        .when(F.lag("value").over(w).isNull(), "")
        .otherwise("e")
        .alias("sym"),
    )
    seq = s.groupBy("user_id").agg(
        F.expr(
            "concat_ws('', transform(array_sort(collect_list("
            "struct(ts, event_id, sym))), x -> x.sym))"
        ).alias("path")
    )
    pat = seq.select(
        F.expr("CAST(size(regexp_extract_all(path, 'd+u+', 0)) AS BIGINT)")
        .alias("n_valley"),
        F.expr("CAST(size(regexp_extract_all(path, 'u+d+', 0)) AS BIGINT)")
        .alias("n_peak"),
    )
    return pat.groupBy("n_valley", "n_peak").agg(
        F.count("*").alias("n_users")
    )


@query(
    "q_ev_growth_accounting",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 604800000000 AS wk
        FROM events
    ),
    c AS (
        SELECT user_id, wk,
               lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
               lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
        FROM uw
    ),
    span AS (SELECT max(wk) AS max_wk FROM uw),
    act AS (
        SELECT wk,
               CAST(sum(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(sum(CASE WHEN prev_wk < wk - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_resurrected
        FROM c GROUP BY wk
    ),
    churn AS (
        SELECT wk + 1 AS wk, CAST(count(*) AS BIGINT) AS n_churned
        FROM c CROSS JOIN span
        WHERE (next_wk IS NULL OR next_wk > wk + 1) AND wk + 1 <= max_wk
        GROUP BY wk + 1
    )
    SELECT CAST(act.wk AS BIGINT) AS wk,
           n_new, n_retained, n_resurrected,
           CAST(coalesce(churn.n_churned, 0) AS BIGINT) AS n_churned
    FROM act LEFT JOIN churn ON churn.wk = act.wk
    """,
)
def q_ev_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: the weekly DAU decomposition every growth
    team runs — actives split into new / retained / resurrected, plus
    the churned count attributed to the week after last activity
    (within the observed span), satisfying the identity
    ``active_w = new + retained + resurrected`` and
    ``churned_{w+1} = active_w − retained_{w+1}``.

    Weeks are exact integer epoch-µs floor-divisions (no engine
    week-truncation semantics in play); classification is lag/lead over
    the per-user distinct week set — user-partitioned windows, two
    shuffles total (distinct + window share the user key)."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 604800000000").alias("wk"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    c = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    act = c.groupBy("wk").agg(
        F.sum(F.when(F.col("prev_wk").isNull(), 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(
            F.when(F.col("prev_wk") == F.col("wk") - 1, 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(F.col("prev_wk") < F.col("wk") - 1, 1).otherwise(0)
        ).alias("n_resurrected"),
    )
    max_wk = uw.agg(F.max("wk").alias("max_wk"))
    churn = (
        c.crossJoin(F.broadcast(max_wk))
        .where(
            (F.col("next_wk").isNull() | (F.col("next_wk") > F.col("wk") + 1))
            & (F.col("wk") + 1 <= F.col("max_wk"))
        )
        .groupBy((F.col("wk") + 1).alias("wk"))
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        act.join(churn, "wk", "left")
        .select(
            "wk",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


@query(
    "q_ev_did",
    oracle="""
    WITH span AS (
        SELECT min(epoch_us(ts)) AS t0 FROM events
    ),
    treated AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    ),
    cells AS (
        SELECT
            CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS treated,
            CASE WHEN epoch_us(e.ts) - s.t0 >= 1296000000000
                 THEN 1 ELSE 0 END AS post,
            CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e
        CROSS JOIN span s
        LEFT JOIN treated t ON t.user_id = e.user_id
        WHERE e.event_type = 'purchase'
    ),
    m AS (
        SELECT treated, post,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM cells GROUP BY treated, post
    )
    SELECT
        (SELECT n FROM m WHERE treated = 0 AND post = 0) AS n_c_pre,
        (SELECT n FROM m WHERE treated = 0 AND post = 1) AS n_c_post,
        (SELECT n FROM m WHERE treated = 1 AND post = 0) AS n_t_pre,
        (SELECT n FROM m WHERE treated = 1 AND post = 1) AS n_t_post,
        round((SELECT CAST(s AS DOUBLE) / n / 100
               FROM m WHERE treated = 1 AND post = 1)
            - (SELECT CAST(s AS DOUBLE) / n / 100
               FROM m WHERE treated = 1 AND post = 0)
            - ((SELECT CAST(s AS DOUBLE) / n / 100
                FROM m WHERE treated = 0 AND post = 1)
               - (SELECT CAST(s AS DOUBLE) / n / 100
                  FROM m WHERE treated = 0 AND post = 0)), 4) AS did
    """,
)
def q_ev_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the causal-inference workhorse.
    Treated = users who ever hit an 'error' event; the post period
    starts 15 days (exact 1 296 000 000 000 µs) after the log's first
    event.  DiD = (treated post − pre) − (control post − pre) on mean
    purchase value.

    The four cell means are exact (Σcents, n) pairs; DiD is ONE final
    float expression over the eight integers — no float subtraction
    chains whose order could differ.  Plan: broadcast the treated-user
    id set (distinct over a selective filter) onto the purchase scan,
    one 4-cell aggregate, no window."""
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min(F.expr("unix_micros(ts)")).alias("t0"))
    treated = (
        ev.where(F.col("event_type") == "error")
        .select("user_id")
        .distinct()
        .withColumn("is_treated", F.lit(1))
    )
    cells = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(t0))
        .join(F.broadcast(treated), "user_id", "left")
        .select(
            F.coalesce("is_treated", F.lit(0)).alias("treated"),
            F.when(
                F.expr("unix_micros(ts)") - F.col("t0") >= 1296000000000,
                1,
            )
            .otherwise(0)
            .alias("post"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    m = cells.groupBy("treated", "post").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    # pivot the 2x2 grid into one row, then the single final float
    g = m.agg(
        F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 0),
                     F.col("n"))).alias("n_c_pre"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 1),
                     F.col("n"))).alias("n_c_post"),
        F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 0),
                     F.col("n"))).alias("n_t_pre"),
        F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 1),
                     F.col("n"))).alias("n_t_post"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 0),
                     F.col("s"))).alias("s_c_pre"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 1),
                     F.col("s"))).alias("s_c_post"),
        F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 0),
                     F.col("s"))).alias("s_t_pre"),
        F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 1),
                     F.col("s"))).alias("s_t_post"),
    )
    dd = (
        F.col("s_t_post").cast("double") / F.col("n_t_post") / 100
        - F.col("s_t_pre").cast("double") / F.col("n_t_pre") / 100
        - (
            F.col("s_c_post").cast("double") / F.col("n_c_post") / 100
            - F.col("s_c_pre").cast("double") / F.col("n_c_pre") / 100
        )
    )
    return g.select(
        "n_c_pre", "n_c_post", "n_t_pre", "n_t_post",
        F.round(dd, 4).alias("did"),
    )


@query(
    "q_ml_calibration",
    oracle="""
    WITH f AS (
        SELECT user_id,
               CAST(least(sum(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END), 10) AS BIGINT)
                   AS score,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    )
    SELECT score,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(sum(converted) * 10000 // count(*) AS BIGINT)
               AS conv_bps
    FROM f GROUP BY score
    """,
)
def q_ml_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / lift curve for a feature-based propensity score:
    bucket users by click count (capped at 10), report the observed
    purchase-conversion rate per bucket — the monotonicity check that
    certifies "more clicks → more likely to buy" before the feature
    enters a model.  All-integer (counts + floor-division basis
    points); two keyed aggregates sharing the user shuffle."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.least(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            F.lit(10),
        )
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return f.groupBy("score").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.expr("sum(converted) * 10000 div count(*)").alias("conv_bps"),
    )


@query(
    "q_ml_isotonic",
    oracle="""
    WITH f AS (
        SELECT user_id,
               CAST(least(sum(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END), 10) AS BIGINT)
                   AS score,
               max(CASE WHEN event_type = 'purchase'
                         AND CAST(json_extract_string(props, '$.k')
                                  AS DOUBLE) >= 90
                        THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    b AS (
        SELECT score, CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(converted) AS BIGINT) AS s
        FROM f GROUP BY score
    ),
    p AS (
        SELECT score, cnt, s,
               sum(cnt) OVER (ORDER BY score
                              ROWS UNBOUNDED PRECEDING) AS ccum,
               sum(s) OVER (ORDER BY score
                            ROWS UNBOUNDED PRECEDING) AS scum
        FROM b
    ),
    spans AS (
        SELECT j.score AS js, k.score AS ks,
               CAST(k.scum - j.scum + j.s AS DOUBLE)
                   / (k.ccum - j.ccum + j.cnt) AS m
        FROM p j JOIN p k ON j.score <= k.score
    ),
    minx AS (
        SELECT s.js, i.score AS score, min(s.m) AS mn
        FROM spans s
        JOIN p i ON s.js <= i.score AND i.score <= s.ks
        GROUP BY 1, 2
    )
    SELECT m.score, b.cnt AS n_users,
           round(CAST(b.s AS DOUBLE) / b.cnt, 4) AS raw_rate,
           round(max(m.mn), 4) AS iso_rate
    FROM minx m JOIN b ON b.score = m.score
    GROUP BY m.score, b.cnt, b.s
    """,
)
def q_ml_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression (PAV) over q_ml_calibration's curve — the
    monotone recalibration every probability-emitting model gets
    before its scores are trusted (sklearn's IsotonicRegression /
    Zadrozny-Elkan calibration, as a relational plan).  The outcome is
    the SPARSE event (a high-value purchase, k >= 90) so the raw
    curve carries real violators for the fit to pool — the all-users-
    convert outcome is flat 1.0 on this corpus and would prove
    nothing.

    Instead of the sequential pool-adjacent-violators loop, the fit
    uses PAV's minimax closed form: fit_i = max_{j<=i} min_{k>=i}
    mean(y over buckets j..k) — pure joins over the BUCKET list (score
    is capped at 10, so spans are O(11²) rows regardless of corpus
    size; the only data-sized pass is the per-user aggregate it shares
    with q_ml_calibration).  Determinism: every span mean is ONE
    double division of two exact BIGINTs (identical IEEE result in
    both engines) and min/max compare those doubles — no float sums
    anywhere."""
    ev = load_table(spark, sf_dir, "events")
    high_k = (F.col("event_type") == "purchase") & (
        F.get_json_object("props", "$.k").try_cast("double") >= 90
    )
    f = ev.groupBy("user_id").agg(
        F.least(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            F.lit(10),
        )
        .cast("bigint")
        .alias("score"),
        F.max(F.when(high_k, 1).otherwise(0)).alias("converted"),
    )
    b = f.groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("converted").alias("s")
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = b.select(
        "score", "cnt", "s",
        F.sum("cnt").over(w).alias("ccum"),
        F.sum("s").over(w).alias("scum"),
    )
    j = p.select(
        F.col("score").alias("js"),
        F.col("cnt").alias("jcnt"),
        F.col("s").alias("jns"),
        F.col("ccum").alias("jccum"),
        F.col("scum").alias("jscum"),
    )
    k = p.select(
        F.col("score").alias("ks"),
        F.col("ccum").alias("kccum"),
        F.col("scum").alias("kscum"),
    )
    spans = j.join(k, F.col("js") <= F.col("ks")).select(
        "js",
        "ks",
        (
            (F.col("kscum") - F.col("jscum") + F.col("jns")).cast("double")
            / (F.col("kccum") - F.col("jccum") + F.col("jcnt"))
        ).alias("m"),
    )
    i = p.select(F.col("score").alias("iscore"))
    minx = (
        spans.join(
            i,
            (F.col("js") <= F.col("iscore")) & (F.col("iscore") <= F.col("ks")),
        )
        .groupBy("js", "iscore")
        .agg(F.min("m").alias("mn"))
    )
    iso = minx.groupBy("iscore").agg(F.max("mn").alias("fit"))
    return (
        iso.join(b, iso.iscore == b.score)
        .select(
            "score",
            F.col("cnt").alias("n_users"),
            F.round(F.col("s").cast("double") / F.col("cnt"), 4).alias(
                "raw_rate"
            ),
            F.round("fit", 4).alias("iso_rate"),
        )
    )


@query(
    "q_ev_cuped",
    oracle="""
    WITH b AS (
        SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                    AS BIGINT) AS mid
        FROM events
    ),
    u AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(sum(CASE WHEN event_type = 'view'
                             AND epoch_us(ts) < mid THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             AND epoch_us(ts) >= mid
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM events CROSS JOIN b
        GROUP BY 1, 2
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM u
    ),
    th AS (
        SELECT n, sx, sy,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) AS theta,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   * (n * sxy - sx * sy)
                   / (CAST(n * sxx - sx * sx AS DOUBLE)
                      * (n * syy - sy * sy)) AS rho2
        FROM g
    ),
    arm AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS sum_x,
               CAST(sum(y) AS BIGINT) AS sum_y
        FROM u GROUP BY 1
    )
    SELECT CAST(a.arm AS BIGINT) AS arm, a.n_users, a.sum_x, a.sum_y,
           round(CAST(a.sum_y AS DOUBLE) / a.n_users, 4) AS mean_y,
           round((a.sum_y - t.theta * a.sum_x) / a.n_users
                 + t.theta * CAST(t.sx AS DOUBLE) / t.n, 4)
               AS mean_y_cuped,
           round(t.theta, 6) AS theta,
           round(t.rho2, 6) AS rho2
    FROM arm a CROSS JOIN th t
    """,
)
def q_ev_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout: arms = user_id % 2,
    pre-period covariate X = views before the time-range midpoint,
    outcome Y = purchase cents after it; the adjusted arm mean is
    mean(Y) − θ·(mean(X) − X̄) with θ = cov(X,Y)/var(X) — the standard
    pre-experiment adjustment that tightens A/B confidence intervals.

    The midpoint split is data-derived exact integer µs (no hard-coded
    date to rot when the corpus regenerates); θ and ρ² come from the
    six exact BIGINT sufficient sums; and the adjusted mean is
    algebraically rearranged to (ΣY − θΣX)/n + θX̄ so NO per-user
    float is ever summed — the float enters once per arm, over exact
    integers.  Plan: one scalar bound agg, one per-user aggregate,
    one 2-row arm aggregate + broadcast θ.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.expr(
            "cast((min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
            " as bigint)"
        ).alias("mid")
    )
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id", (F.col("user_id") % 2).alias("arm"))
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "view")
                    & (F.expr("unix_micros(ts)") < F.col("mid")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.expr("unix_micros(ts)") >= F.col("mid")),
                    F.expr("cast(round(value * 100) as bigint)"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    ).cache()
    g = u.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    covn = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varxn = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    varyn = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    th = g.select(
        "n",
        "sx",
        (covn.cast("double") / varxn).alias("theta"),
        (
            covn.cast("double") * covn / (varxn.cast("double") * varyn)
        ).alias("rho2"),
    )
    arm = u.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    return arm.crossJoin(F.broadcast(th)).select(
        F.col("arm").cast("long").alias("arm"),
        "n_users",
        "sum_x",
        "sum_y",
        F.round(F.col("sum_y").cast("double") / F.col("n_users"), 4).alias(
            "mean_y"
        ),
        F.round(
            (F.col("sum_y") - F.col("theta") * F.col("sum_x"))
            / F.col("n_users")
            + F.col("theta") * F.col("sx").cast("double") / F.col("n"),
            4,
        ).alias("mean_y_cuped"),
        F.round("theta", 6).alias("theta"),
        F.round("rho2", 6).alias("rho2"),
    )


@query(
    "q_ev_fatigue",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, event_id,
               epoch_us(ts) AS us
        FROM events
    ),
    w AS (
        SELECT user_id, event_type, event_id, us,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER (
                   PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN CURRENT ROW AND 3600000000 FOLLOWING)
                   AS np_1h,
               row_number() OVER (
                   PARTITION BY user_id,
                                CASE WHEN event_type = 'view' THEN 1
                                     ELSE 0 END
                   ORDER BY us, event_id) AS vrank
        FROM e
    ),
    v AS (
        SELECT least(vrank, 10) AS exposure_rank,
               CASE WHEN np_1h > 0 THEN 1 ELSE 0 END AS converted
        FROM w WHERE event_type = 'view'
    )
    SELECT CAST(exposure_rank AS BIGINT) AS exposure_rank,
           CAST(count(*) AS BIGINT) AS n_views,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(CAST(sum(converted) AS DOUBLE) / count(*), 6)
               AS conversion_rate
    FROM v
    GROUP BY 1
    """,
)
def q_ev_fatigue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure-fatigue curve: conversion rate (a purchase within one
    hour at-or-after the view) by the view's per-user exposure rank,
    capped at 10+ — does the nth impression still convert?

    The one-hour lookahead is an integer-µs RANGE frame (CURRENT ROW ..
    3.6e9 FOLLOWING) over each user's full event sequence, counting
    purchases — both engines frame RANGE on the identical BIGINT sort
    key, so no µs/float ambiguity exists; exposure rank is a
    partitioned row_number over the user's views.  One user_id shuffle
    carries both windows; the fatigue table is ≤10 rows.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
    )
    wrange = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.currentRow, 3_600_000_000)
    )
    wrank = Window.partitionBy(
        "user_id",
        F.when(F.col("event_type") == "view", 1).otherwise(0),
    ).orderBy("us", "event_id")
    w = e.select(
        "event_type",
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .over(wrange)
        .alias("np_1h"),
        F.row_number().over(wrank).alias("vrank"),
    )
    v = w.where(F.col("event_type") == "view").select(
        F.least(F.col("vrank"), F.lit(10)).alias("exposure_rank"),
        F.when(F.col("np_1h") > 0, 1).otherwise(0).alias("converted"),
    )
    return v.groupBy(
        F.col("exposure_rank").cast("long").alias("exposure_rank")
    ).agg(
        F.count("*").alias("n_views"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count("*"), 6
        ).alias("conversion_rate"),
    )


@query(
    "q_ev_changepoint",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    cum AS (
        SELECT day, x,
               sum(x) OVER (ORDER BY day) AS cs,
               row_number() OVER (ORDER BY day) AS i
        FROM d
    ),
    tot AS (
        SELECT CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        FROM d
    ),
    cand AS (
        SELECT day, i, cs, s, n,
               (cs * cs) // i + ((s - cs) * (s - cs)) // (n - i)
                   AS score
        FROM cum CROSS JOIN tot
        WHERE i < n
    )
    SELECT CAST(day AS VARCHAR) AS split_day,
           CAST(i AS BIGINT) AS n_left,
           CAST(n - i AS BIGINT) AS n_right,
           CAST(cs AS BIGINT) AS left_cents,
           CAST(s - cs AS BIGINT) AS right_cents,
           CAST(score AS BIGINT) AS score,
           round(CAST(cs AS DOUBLE) / i / 100, 2) AS left_daily_mean,
           round(CAST(s - cs AS DOUBLE) / (n - i) / 100, 2)
               AS right_daily_mean
    FROM cand
    ORDER BY score DESC, day
    LIMIT 1
    """,
)
def q_ev_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint on daily purchase revenue: the
    split day maximizing the between-segment SSE reduction — for a
    single split, argmax of S_L²/n_L + S_R²/n_R, the first recursion
    of the classic changepoint detector.

    The score is the same fixed-point floor-division trick as
    q_ml_stump (here the numerators are exact cent sums squared, ≤
    (3e8)² ≈ 9e16 at sf0.1 — BIGINT-safe; DECIMAL switch noted past
    ~1e10 daily cents), tie-broken by the earlier day, so the argmax
    hash-matches.  The daily series is calendar-bounded; the candidate
    scan is |days| rows and the pick is a TakeOrdered top-1.
    """
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
        )
    )
    cum = bucketed_running_sum(
        d,
        F.expr("cast(unix_date(day) as long) div 7"),
        [F.col("day")],
        {"cs": F.col("x"), "i": F.lit(1)},
    )
    tot = d.agg(
        F.sum("x").cast("long").alias("s"),
        F.count("*").cast("long").alias("n"),
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("i") < F.col("n"))
        .withColumn(
            "score",
            F.expr(
                "(cs * cs) div i + ((s - cs) * (s - cs)) div (n - i)"
            ),
        )
    )
    return (
        cand.select(
            F.col("day").cast("string").alias("split_day"),
            F.col("i").cast("long").alias("n_left"),
            (F.col("n") - F.col("i")).cast("long").alias("n_right"),
            F.col("cs").cast("long").alias("left_cents"),
            (F.col("s") - F.col("cs")).cast("long").alias("right_cents"),
            F.col("score").cast("long").alias("score"),
            F.round(
                F.col("cs").cast("double") / F.col("i") / 100, 2
            ).alias("left_daily_mean"),
            F.round(
                (F.col("s") - F.col("cs")).cast("double")
                / (F.col("n") - F.col("i"))
                / 100,
                2,
            ).alias("right_daily_mean"),
        )
        .orderBy(F.desc("score"), "split_day")
        .limit(1)
    )


@query(
    "q_ev_burnrate",
    oracle="""
    WITH w AS (
        SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_us,
               CAST(count(*) AS BIGINT) AS total,
               CAST(count(CASE WHEN event_type = 'error' THEN 1 END)
                    AS BIGINT) AS errors
        FROM events
        GROUP BY 1
    )
    SELECT CAST(win_us AS BIGINT) AS window_start_us,
           total, errors,
           round(CAST(errors AS DOUBLE) / total, 6) AS error_rate,
           CAST(CASE WHEN 100 * errors > 2 * total THEN 1 ELSE 0 END
                AS INT) AS burn_2x,
           CAST(CASE WHEN 10 * errors > total THEN 1 ELSE 0 END
                AS INT) AS burn_10x
    FROM w
    """,
)
def q_ev_burnrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO burn-rate monitor: hourly error budget consumption against
    a 1% error-budget SLO, with the standard two alert tiers —
    burn ≥ 2× budget (slow burn, ticket) and ≥ 10× (fast burn, page).

    Both alert predicates are integer cross-multiplications
    (100·errors > 2·total ⟺ rate > 2%, 10·errors > total ⟺ rate >
    10%), so the flags hash-match without any rate float; the window
    key is exact integer µs flooring.  One keyed aggregate over the
    hour bucket — the monitor table is |hours| rows however large the
    event stream, which is why this exact query runs on the ops
    dashboard's hot path.
    """
    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        F.expr(
            "(unix_micros(ts) div 3600000000) * 3600000000"
        ).alias("win_us")
    ).agg(
        F.count("*").alias("total"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("errors"),
    )
    return w.select(
        F.col("win_us").cast("long").alias("window_start_us"),
        "total",
        "errors",
        F.round(
            F.col("errors").cast("double") / F.col("total"), 6
        ).alias("error_rate"),
        F.when(100 * F.col("errors") > 2 * F.col("total"), 1)
        .otherwise(0)
        .cast("int")
        .alias("burn_2x"),
        F.when(10 * F.col("errors") > F.col("total"), 1)
        .otherwise(0)
        .cast("int")
        .alias("burn_10x"),
    )


@query(
    "q_ev_srm",
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS arm FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0
        FROM u
    )
    SELECT n1, n0,
           CAST((n1 - n0) * (n1 - n0) AS BIGINT) AS chisq_num,
           CAST(n1 + n0 AS BIGINT) AS chisq_den,
           round(CAST((n1 - n0) * (n1 - n0) AS DOUBLE) / (n1 + n0), 6)
               AS chisq,
           CAST(CASE WHEN CAST((n1 - n0) * (n1 - n0) AS DOUBLE)
                          / (n1 + n0) > 3.841 THEN 1 ELSE 0 END AS INT)
               AS srm_flag
    FROM c
    """,
)
def q_ev_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: the 1-df chi-square of the two
    experiment arms against the designed 50/50 split — the first check
    any experimentation platform runs before trusting a readout
    (q_ev_abtest, q_ev_cuped), because a broken randomizer invalidates
    everything downstream.

    For equal expected counts the statistic collapses to (n1−n0)²/N —
    carried as an exact integer numerator/denominator pair so the flag
    (χ² > 3.841, the 5% critical value) hash-matches.  One per-user
    distinct + one 2-cell aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).distinct()
    c = u.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
    )
    num = (F.col("n1") - F.col("n0")) * (F.col("n1") - F.col("n0"))
    chisq = num.cast("double") / (F.col("n1") + F.col("n0"))
    return c.select(
        "n1",
        "n0",
        num.cast("long").alias("chisq_num"),
        (F.col("n1") + F.col("n0")).cast("long").alias("chisq_den"),
        F.round(chisq, 6).alias("chisq"),
        F.when(chisq > 3.841, 1).otherwise(0).cast("int").alias(
            "srm_flag"
        ),
    )


@query(
    "q_ev_layers",
    oracle="""
    WITH u AS (
        SELECT user_id,
               user_id % 2 AS arm1,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':L2'),
                                    1, 15)) AS BIGINT) % 2 AS arm2
        FROM events GROUP BY 1, 2, 3
    ),
    cells AS (
        SELECT arm1, arm2, CAST(count(*) AS BIGINT) AS o
        FROM u GROUP BY 1, 2
    ),
    m AS (
        SELECT c.arm1, c.arm2, c.o,
               CAST(sum(c.o) OVER (PARTITION BY c.arm1) AS BIGINT) AS r,
               CAST(sum(c.o) OVER (PARTITION BY c.arm2) AS BIGINT) AS cc,
               CAST(sum(c.o) OVER () AS BIGINT) AS n
        FROM cells c
    )
    SELECT CAST(arm1 AS BIGINT) AS arm1, CAST(arm2 AS BIGINT) AS arm2,
           o, r, cc, n,
           CAST((o * n - r * cc) * (o * n - r * cc) AS BIGINT)
               AS chisq_num,
           round(CAST((o * n - r * cc) * (o * n - r * cc) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * r * cc), 6) AS chisq_contrib
    FROM m
    """,
)
def q_ev_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layered-experimentation orthogonality audit: users sit in two
    overlapping assignment layers (layer 1 = id parity, layer 2 = a
    salted hash bit), and the 2×2 cell table's independence chi-square
    contributions certify the layers don't contaminate each other —
    the invariant an overlapping-experiments platform must hold for
    every layer pair.

    Each cell's (o·N − r·c)² numerator is an exact BIGINT (≤ (2e4·4e4)²
    … well inside range at sf0.1); the contribution is one rounded
    division.  The margin windows run over the 4-row cell table —
    constant-size state no matter the user count.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        "user_id",
        (F.col("user_id") % 2).alias("arm1"),
        (
            F.expr(
                "cast(conv(substr(md5(cast(user_id as string) || ':L2'),"
                " 1, 15), 16, 10) as bigint)"
            )
            % 2
        ).alias("arm2"),
    ).distinct()
    cells = u.groupBy("arm1", "arm2").agg(F.count("*").alias("o"))
    w1 = Window.partitionBy("arm1")
    w2 = Window.partitionBy("arm2")
    wn = Window.partitionBy()
    m = cells.select(
        "arm1",
        "arm2",
        "o",
        F.sum("o").over(w1).cast("long").alias("r"),
        F.sum("o").over(w2).cast("long").alias("cc"),
        F.sum("o").over(wn).cast("long").alias("n"),
    )
    num = (F.col("o") * F.col("n") - F.col("r") * F.col("cc")) * (
        F.col("o") * F.col("n") - F.col("r") * F.col("cc")
    )
    return m.select(
        F.col("arm1").cast("long").alias("arm1"),
        F.col("arm2").cast("long").alias("arm2"),
        "o",
        "r",
        "cc",
        "n",
        num.cast("long").alias("chisq_num"),
        F.round(
            num.cast("double")
            / (F.col("n").cast("double") * F.col("r") * F.col("cc")),
            6,
        ).alias("chisq_contrib"),
    )


def _haar_oracle() -> str:
    """One conditional-sum aggregate per level — unnormalized Haar
    detail coefficients over 2^k blocks of the zero-padded daily
    series, energies as exact integer Σcoeff²."""
    levels = []
    for k in (1, 2, 3, 4):
        half = 2 ** (k - 1)
        levels.append(f"""
    l{k} AS (
        SELECT CAST({k} AS BIGINT) AS level,
               CAST(count(*) AS BIGINT) AS n_coeffs,
               CAST(sum(c * c) AS BIGINT) AS energy,
               CAST(max(abs(c)) AS BIGINT) AS max_abs_coeff
        FROM (
            SELECT idx // {2 ** k} AS blk,
                   sum(CASE WHEN idx % {2 ** k} < {half} THEN x
                            ELSE -x END) AS c
            FROM s GROUP BY 1
        )
    )""")
    body = ",".join(levels)
    union = "\n    UNION ALL ".join(f"SELECT * FROM l{k}" for k in (1, 2, 3, 4))
    return f"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    s AS (
        SELECT row_number() OVER (ORDER BY day) - 1 AS idx, x FROM d
    ),{body}
    {union}
    """


@query("q_ev_haar", oracle=_haar_oracle())
def q_ev_haar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet multi-resolution decomposition of the daily
    purchase-revenue series: unnormalized detail coefficients at
    scales 2..16 days and their energies — which timescale carries
    the variance (day-to-day noise vs weekly structure), the
    signal-processing complement to q_ev_seasonality.

    Each level-k coefficient is Σ(first half) − Σ(second half) of a
    2^k-day block — a conditional integer sum, missing days implicitly
    zero — and each level's energy Σc² is an exact BIGINT (|c| ≤ 16·
    daily cents ≈ 5e9, c² ≤ 2.5e19… kept safe because daily revenue
    at sf0.1 is ~3e8 cents → c² ≤ 2.4e19 is within range only via the
    level cap; past that switch energy to DECIMAL(38,0) — noted).
    Four keyed aggregates over the calendar-bounded day series; the
    day index is a |days|-row rank, not a per-event window.
    """
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
        )
    )
    s = bucketed_running_sum(
        d,
        F.expr("cast(unix_date(day) as long) div 7"),
        [F.col("day")],
        {"rn": F.lit(1)},
    ).select((F.col("rn") - 1).alias("idx"), "x").cache()
    out = None
    for k in (1, 2, 3, 4):
        half = 2 ** (k - 1)
        coeffs = s.groupBy(
            F.expr(f"idx div {2 ** k}").alias("blk")
        ).agg(
            F.sum(
                F.when(F.expr(f"idx % {2 ** k}") < half, F.col("x"))
                .otherwise(-F.col("x"))
            ).alias("c")
        )
        lvl = coeffs.agg(
            F.lit(k).cast("long").alias("level"),
            F.count("*").alias("n_coeffs"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("energy"),
            F.max(F.abs(F.col("c"))).cast("long").alias("max_abs_coeff"),
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out


@query(
    "q_ev_ramp",
    oracle="""
    WITH d0 AS (
        SELECT min(CAST(ts AS DATE)) AS day0 FROM events
    ),
    ud AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                        || ':ramp'), 1, 15)) AS BIGINT)
                   % 100 AS hp
        FROM events GROUP BY 1, 2, 3
    ),
    ex AS (
        SELECT user_id,
               min(CASE WHEN hp < least(
                       10 + 10 * (date_diff('day', day0, day) // 7), 50)
                        THEN day END) AS exposure_day
        FROM ud CROSS JOIN d0
        GROUP BY 1
    ),
    wk AS (
        SELECT date_diff('day', d0.day0, e.exposure_day) // 7 AS week,
               CAST(count(*) AS BIGINT) AS n_new
        FROM ex e CROSS JOIN d0
        WHERE e.exposure_day IS NOT NULL
        GROUP BY 1
    )
    SELECT CAST(a.week AS BIGINT) AS week,
           a.n_new AS n_newly_exposed,
           CAST(sum(b.n_new) AS BIGINT) AS n_cumulative
    FROM wk a JOIN wk b ON b.week <= a.week
    GROUP BY a.week, a.n_new
    """,
)
def q_ev_ramp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradual-rollout exposure accounting: the feature ramps from 10%
    of users by +10 points per week (capped at 50%), gated on a salted
    hash percentile; each user's exposure day is the first day they
    appear while under the ramp — the enrollment curve a progressive-
    delivery platform must report before any treatment readout.

    Hash bucketing is the reproducible md5 percentile; week indexing
    is exact whole-day DATE arithmetic; the cumulative enrollment is a
    θ-join over the |weeks|-row aggregate (calendar-bounded, no global
    window).  Per-user state is one min() — the scan never re-visits.
    """
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.col("ts").cast("date")).alias("day0"))
    ud = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            (
                F.expr(
                    "cast(conv(substr(md5(cast(user_id as string)"
                    " || ':ramp'), 1, 15), 16, 10) as bigint)"
                )
                % 100
            ).alias("hp"),
        )
        .distinct()
        .crossJoin(F.broadcast(d0))
    )
    ramp = F.least(
        F.lit(10)
        + 10 * F.expr("datediff(day, day0) div 7"),
        F.lit(50),
    )
    ex = ud.groupBy("user_id").agg(
        F.min(F.when(F.col("hp") < ramp, F.col("day"))).alias(
            "exposure_day"
        )
    )
    wk = (
        ex.where(F.col("exposure_day").isNotNull())
        .crossJoin(F.broadcast(d0))
        .groupBy(
            F.expr("datediff(exposure_day, day0) div 7").alias("week")
        )
        .agg(F.count("*").alias("n_new"))
    )
    a = wk.alias("a")
    b = wk.alias("b")
    return (
        a.join(F.broadcast(b), F.col("b.week") <= F.col("a.week"))
        .groupBy(
            F.col("a.week").cast("long").alias("week"),
            F.col("a.n_new").alias("n_newly_exposed"),
        )
        .agg(F.sum(F.col("b.n_new")).cast("long").alias("n_cumulative"))
    )


@query(
    "q_ev_power",
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_control,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treat,
               CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS conv_control
        FROM u
    )
    SELECT n_control, n_treat, conv_control,
           round(CAST(conv_control AS DOUBLE) / n_control, 6)
               AS baseline_rate,
           round((1.959964 + 0.841621)
                 * sqrt(2.0 * (CAST(conv_control AS DOUBLE) / n_control)
                        * (1 - CAST(conv_control AS DOUBLE) / n_control)
                        / least(n_control, n_treat)), 6) AS mde_abs,
           round((1.959964 + 0.841621)
                 * sqrt(2.0 * (CAST(conv_control AS DOUBLE) / n_control)
                        * (1 - CAST(conv_control AS DOUBLE) / n_control)
                        / least(n_control, n_treat))
                 / (CAST(conv_control AS DOUBLE) / n_control), 6)
               AS mde_rel
    FROM c
    """,
)
def q_ev_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning: the minimum detectable effect of the
    current A/B configuration — (z_{0.975}+z_{0.8})·√(2p(1−p)/n) at
    80% power and 5% two-sided alpha, from the observed control
    conversion rate and arm sizes.  The readout that tells you whether
    q_ev_abtest's result CAN be significant before you wait a month.

    The sufficient statistics (arm sizes, control conversions) are
    exact integers; the z constants are the same literals in both
    engines, and the MDE is one final double expression over those
    identical inputs, rounded to 6.  One per-user aggregate + one
    3-cell scalar.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id", (F.col("user_id") % 2).alias("arm")).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("y")
    )
    c = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_treat"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("conv_control"),
    )
    p = F.col("conv_control").cast("double") / F.col("n_control")
    z = F.lit(1.959964) + F.lit(0.841621)
    mde = z * F.sqrt(
        2.0 * p * (1 - p) / F.least(F.col("n_control"), F.col("n_treat"))
    )
    return c.select(
        "n_control",
        "n_treat",
        "conv_control",
        F.round(p, 6).alias("baseline_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p, 6).alias("mde_rel"),
    )


@query(
    "q_ev_driver_tree",
    oracle="""
    WITH b AS (
        SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                    AS BIGINT) AS mid
        FROM events
    ),
    p AS (
        SELECT CASE WHEN epoch_us(ts) < mid THEN 0 ELSE 1 END AS period,
               user_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END
                   AS cents
        FROM events CROSS JOIN b
    ),
    agg AS (
        SELECT period,
               CAST(count(DISTINCT user_id) AS BIGINT) AS users,
               CAST(sum(is_p) AS BIGINT) AS purchases,
               CAST(sum(cents) AS BIGINT) AS revenue
        FROM p GROUP BY 1
    ),
    w AS (
        SELECT a0.users AS u0, a0.purchases AS p0, a0.revenue AS r0,
               a1.users AS u1, a1.purchases AS p1, a1.revenue AS r1,
               (a1.revenue - a0.revenue)
                   / ln(CAST(a1.revenue AS DOUBLE) / a0.revenue) AS lmean
        FROM (SELECT * FROM agg WHERE period = 0) a0
        CROSS JOIN (SELECT * FROM agg WHERE period = 1) a1
    )
    SELECT u0, p0, r0, u1, p1, r1,
           CAST(r1 - r0 AS BIGINT) AS delta_revenue_cents,
           round(lmean * ln(CAST(u1 AS DOUBLE) / u0), 2) AS contrib_users,
           round(lmean * ln((CAST(p1 AS DOUBLE) / u1)
                            / (CAST(p0 AS DOUBLE) / u0)), 2)
               AS contrib_frequency,
           round(lmean * ln((CAST(r1 AS DOUBLE) / p1)
                            / (CAST(r0 AS DOUBLE) / p0)), 2)
               AS contrib_aov
    FROM w
    """,
)
def q_ev_driver_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI driver-tree decomposition (LMDI / log-mean Divisia): the
    revenue change between the two halves of the time range split
    exactly into three multiplicative drivers — active users,
    purchases per user, and average order value — the growth-
    accounting bridge whose contributions sum to ΔR by construction
    (log-mean weights make the decomposition residual-free).

    The six sufficient statistics are exact integers from one pass
    (the µs midpoint split is the same data-derived anchor as
    q_ev_cuped); the log-mean and the three ln-ratio contributions
    are single double expressions over those identical integers,
    rounded to 2 cents.  Driver trees at 100 TB are exactly this:
    one aggregate, constant-size algebra.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.expr(
            "cast((min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
            " as bigint)"
        ).alias("mid")
    )
    p = ev.crossJoin(F.broadcast(b)).select(
        F.when(F.expr("unix_micros(ts)") < F.col("mid"), 0)
        .otherwise(1)
        .alias("period"),
        "user_id",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("is_p"),
        F.when(
            F.col("event_type") == "purchase",
            F.expr("cast(round(value * 100) as bigint)"),
        )
        .otherwise(0)
        .alias("cents"),
    )
    agg = p.groupBy("period").agg(
        F.countDistinct("user_id").cast("long").alias("users"),
        F.sum("is_p").cast("long").alias("purchases"),
        F.sum("cents").cast("long").alias("revenue"),
    )
    a0 = agg.where(F.col("period") == 0).select(
        F.col("users").alias("u0"),
        F.col("purchases").alias("p0"),
        F.col("revenue").alias("r0"),
    )
    a1 = agg.where(F.col("period") == 1).select(
        F.col("users").alias("u1"),
        F.col("purchases").alias("p1"),
        F.col("revenue").alias("r1"),
    )
    w = a0.crossJoin(F.broadcast(a1)).withColumn(
        "lmean",
        (F.col("r1") - F.col("r0"))
        / F.log(F.col("r1").cast("double") / F.col("r0")),
    )
    return w.select(
        "u0",
        "p0",
        "r0",
        "u1",
        "p1",
        "r1",
        (F.col("r1") - F.col("r0")).cast("long").alias(
            "delta_revenue_cents"
        ),
        F.round(
            F.col("lmean")
            * F.log(F.col("u1").cast("double") / F.col("u0")),
            2,
        ).alias("contrib_users"),
        F.round(
            F.col("lmean")
            * F.log(
                (F.col("p1").cast("double") / F.col("u1"))
                / (F.col("p0").cast("double") / F.col("u0"))
            ),
            2,
        ).alias("contrib_frequency"),
        F.round(
            F.col("lmean")
            * F.log(
                (F.col("r1").cast("double") / F.col("p1"))
                / (F.col("r0").cast("double") / F.col("p0"))
            ),
            2,
        ).alias("contrib_aov"),
    )


@query(
    "q_ev_mtbf",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS us, event_id
        FROM events WHERE event_type = 'error'
    ),
    g AS (
        SELECT (us - lag(us) OVER (
                    PARTITION BY user_id ORDER BY us, event_id))
                   // 1000000 AS gap_s
        FROM e
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(coalesce(sum(gap_s), 0) AS BIGINT) AS total_between_s,
           CAST(max(gap_s) AS BIGINT) AS max_between_s,
           CAST(min(gap_s) AS BIGINT) AS min_between_s,
           round(CAST(sum(gap_s) AS DOUBLE) / count(*), 4) AS mtbf_s
    FROM g WHERE gap_s IS NOT NULL
    """,
)
def q_ev_mtbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean time between failures: the per-user gaps between
    consecutive error events, pooled — the reliability twin of
    q_ev_mttr (together they give availability = MTBF/(MTBF+MTTR)).

    Gaps are exact integer µs floor-division seconds (§7.5); one lag
    window per user over the error slice, one global aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.where(F.col("event_type") == "error").select(
        "user_id", F.expr("unix_micros(ts)").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = e.select(
        F.expr(
            "(us - lag(us) over (partition by user_id"
            " order by us, event_id)) div 1000000"
        ).alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    return g.agg(
        F.count("*").alias("n_gaps"),
        F.coalesce(F.sum("gap_s"), F.lit(0)).cast("long").alias(
            "total_between_s"
        ),
        F.max("gap_s").cast("long").alias("max_between_s"),
        F.min("gap_s").cast("long").alias("min_between_s"),
        F.round(
            F.sum("gap_s").cast("double") / F.count("*"), 4
        ).alias("mtbf_s"),
    )


@query(
    "q_ev_blast_radius",
    oracle="""
    WITH m AS (
        SELECT epoch_us(ts) // 60000000 AS minute,
               CAST(count(DISTINCT user_id) AS BIGINT) AS affected,
               CAST(count(*) AS BIGINT) AS n_errors
        FROM events WHERE event_type = 'error'
        GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_error_minutes,
           CAST(sum(CASE WHEN affected >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_incident_minutes,
           CAST(max(affected) AS BIGINT) AS max_blast_radius,
           CAST(sum(n_errors) AS BIGINT) AS total_errors,
           CAST(sum(CASE WHEN affected >= 3 THEN n_errors ELSE 0 END)
                AS BIGINT) AS errors_in_incidents
    FROM m
    """,
)
def q_ev_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident blast radius: minutes where errors hit ≥ 3 distinct
    users are "incidents" (correlated failure, not user-local noise),
    and the report gives the incident-minute count, the worst blast
    radius, and how much of the error volume is incident-correlated —
    the triage split between systemic and idiosyncratic failure.

    Minute keys are exact integer µs flooring; the distinct-user
    count per minute is one keyed aggregate.  Constant-size output
    from a single pass over the error slice.
    """
    ev = load_table(spark, sf_dir, "events")
    m = (
        ev.where(F.col("event_type") == "error")
        .groupBy(
            F.expr("unix_micros(ts) div 60000000").alias("minute")
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("affected"),
            F.count("*").alias("n_errors"),
        )
    )
    return m.agg(
        F.count("*").alias("n_error_minutes"),
        F.sum(F.when(F.col("affected") >= 3, 1).otherwise(0))
        .cast("long")
        .alias("n_incident_minutes"),
        F.max("affected").cast("long").alias("max_blast_radius"),
        F.sum("n_errors").cast("long").alias("total_errors"),
        F.sum(
            F.when(F.col("affected") >= 3, F.col("n_errors")).otherwise(0)
        )
        .cast("long")
        .alias("errors_in_incidents"),
    )


@query(
    "q_ev_preferred_hour",
    oracle="""
    WITH h AS (
        SELECT user_id, CAST(hour(ts) AS INT) AS hr,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    pref AS (
        SELECT user_id, hr FROM (
            SELECT user_id, hr,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY c DESC, hr) AS rk
            FROM h) WHERE rk = 1
    )
    SELECT hr AS preferred_hour,
           CAST(count(*) AS BIGINT) AS n_users
    FROM pref
    GROUP BY hr
    """,
)
def q_ev_preferred_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-profile feature: each user's modal activity hour
    (ties → the earlier hour), histogrammed across the population —
    the send-time-optimization input every lifecycle-marketing system
    derives first.

    The per-user argmax is a partitioned top-1 over the (user, hour)
    aggregate (≤ 24 rows per user); counts exact throughout.  Two
    keyed aggregates + one 24-row histogram.
    """
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "user_id", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.desc("c"), "hr")
    pref = (
        h.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id", "hr")
    )
    return pref.groupBy(F.col("hr").alias("preferred_hour")).agg(
        F.count("*").alias("n_users")
    )


@query(
    "q_ev_lorenz",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS spend
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT spend,
               row_number() OVER (ORDER BY spend, user_id) AS rk,
               count(*) OVER () AS n,
               sum(spend) OVER () AS tot
        FROM u
    ),
    d AS (
        SELECT least(((rk - 1) * 10) // n + 1, 10) AS decile,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(spend) AS BIGINT) AS decile_cents,
               CAST(max(tot) AS BIGINT) AS tot
        FROM r GROUP BY 1
    )
    SELECT CAST(a.decile AS BIGINT) AS decile, a.n_users, a.decile_cents,
           CAST(sum(b.decile_cents) AS BIGINT) AS cum_cents,
           round(CAST(sum(b.decile_cents) AS DOUBLE) / a.tot, 6)
               AS lorenz_share
    FROM d a JOIN d b ON b.decile <= a.decile
    GROUP BY a.decile, a.n_users, a.decile_cents, a.tot
    """,
)
def q_ev_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve behind q_agg_gini: users ranked by total
    spend, bucketed into population deciles, with each decile's
    cumulative revenue share — the inequality curve itself ("the
    bottom 50% hold x%"), not just its area summary.

    Deciles come from exact integer rank arithmetic ((rk−1)·10//n+1 —
    never a percentile float), the cumulative share is a θ-join over
    the 10-row decile table, and the user ranking runs on the
    per-user aggregate.  The rank window is user-cardinality-bounded;
    at extreme scale swap it for the bucketed prefix scan exactly as
    q_ev_pareto did (same shape, documented there).
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("cast(round(value * 100) as bigint)"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("spend")
    )
    ranked = bucketed_running_sum(
        u,
        F.expr("spend div 100000"),
        [F.col("spend"), F.col("user_id")],
        {"rk": F.lit(1)},
    )
    tots = u.agg(
        F.count("*").alias("n"), F.sum("spend").cast("long").alias("tot")
    )
    r = ranked.crossJoin(F.broadcast(tots))
    d = r.groupBy(
        F.least(
            ((F.col("rk") - 1) * 10 / F.col("n")).cast("long") + 1,
            F.lit(10),
        ).alias("decile")
    ).agg(
        F.count("*").alias("n_users"),
        F.sum("spend").cast("long").alias("decile_cents"),
        F.max("tot").cast("long").alias("tot"),
    )
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(
            F.col("a.decile").cast("long").alias("decile"),
            F.col("a.n_users").alias("n_users"),
            F.col("a.decile_cents").alias("decile_cents"),
            F.col("a.tot").alias("tot"),
        )
        .agg(F.sum(F.col("b.decile_cents")).cast("long").alias("cum_cents"))
        .select(
            "decile",
            "n_users",
            "decile_cents",
            "cum_cents",
            F.round(
                F.col("cum_cents").cast("double") / F.col("tot"), 6
            ).alias("lorenz_share"),
        )
    )


@query(
    "q_ev_business_hours",
    oracle="""
    WITH m AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sid AS (
        SELECT user_id, us,
               sum(new_s) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS sid
        FROM m
    ),
    sess AS (
        SELECT user_id, sid,
               CAST(min(us) AS BIGINT) AS s0,
               CAST(max(us) AS BIGINT) AS s1
        FROM sid GROUP BY 1, 2
    ),
    ol AS (
        SELECT s0, s1,
               unnest(generate_series(s0 // 86400000000,
                                      s1 // 86400000000)) AS day
        FROM sess
    ),
    o2 AS (
        SELECT s1 - s0 AS dur_us,
               greatest(0, least(s1, day * 86400000000 + 61200000000)
                           - greatest(s0,
                                      day * 86400000000 + 32400000000))
                   AS biz_us,
               day
        FROM ol
    )
    SELECT CAST((SELECT count(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST((SELECT sum(s1 - s0) FROM sess) AS BIGINT)
               AS total_session_us,
           CAST(sum(biz_us) AS BIGINT) AS business_us,
           round(CAST(sum(biz_us) AS DOUBLE)
                 / (SELECT sum(s1 - s0) FROM sess), 6) AS business_share
    FROM o2
    """,
)
def q_ev_business_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-hours utilization: what fraction of total session time
    (30-minute-gap sessions) falls inside the 09:00-17:00 UTC window —
    the workforce/support-staffing split between business-hours and
    off-hours engagement.

    Sessions are the classic boundary-marker islands (all windows
    partitioned by user); each session explodes into the UTC days it
    spans (bounded by session length) and intersects the day's
    business window with exact integer µs clamps — no timezone float,
    no rounding until the final share.  One user shuffle + a small
    day fan-out.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    m = ev.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
        F.when(
            F.lag(F.expr("unix_micros(ts)")).over(w).isNull()
            | (
                F.expr("unix_micros(ts)")
                - F.lag(F.expr("unix_micros(ts)")).over(w)
                > 1_800_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sid = m.select(
        "user_id", "us", F.sum("new_s").over(w2).alias("sid")
    )
    sess = sid.groupBy("user_id", "sid").agg(
        F.min("us").cast("long").alias("s0"),
        F.max("us").cast("long").alias("s1"),
    ).cache()
    tot = sess.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.col("s1") - F.col("s0")).cast("long").alias(
            "total_session_us"
        ),
    )
    ol = sess.select(
        "s0",
        "s1",
        F.explode(
            F.expr(
                "sequence(s0 div 86400000000, s1 div 86400000000)"
            )
        ).alias("day"),
    )
    biz = ol.select(
        F.greatest(
            F.lit(0),
            F.least(
                F.col("s1"),
                F.col("day") * 86_400_000_000 + 61_200_000_000,
            )
            - F.greatest(
                F.col("s0"),
                F.col("day") * 86_400_000_000 + 32_400_000_000,
            ),
        ).alias("biz_us")
    ).agg(F.sum("biz_us").cast("long").alias("business_us"))
    return tot.crossJoin(F.broadcast(biz)).select(
        "n_sessions",
        "total_session_us",
        "business_us",
        F.round(
            F.col("business_us").cast("double")
            / F.col("total_session_us"),
            6,
        ).alias("business_share"),
    )


@query(
    "q_ev_adstock",
    oracle="""
    WITH RECURSIVE d AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        FROM events WHERE event_type = 'click'
        GROUP BY 1
    ),
    s AS (
        SELECT x, row_number() OVER (ORDER BY day) AS rn,
               CAST(day AS VARCHAR) AS day
        FROM d
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
    rec AS (
        SELECT rn, day, x, x AS adstock
        FROM s WHERE rn = 1
        UNION ALL
        SELECT s.rn, s.day, s.x,
               s.x + CAST(floor(r.adstock / 2.0) AS BIGINT)
        FROM rec r JOIN s ON s.rn = r.rn + 1
    ),
    pk AS (
        SELECT day AS peak_day, adstock AS peak_adstock
        FROM rec ORDER BY adstock DESC, rn LIMIT 1
    )
    SELECT nn.n AS n_days,
           CAST(r.adstock AS BIGINT) AS final_adstock,
           pk.peak_day, CAST(pk.peak_adstock AS BIGINT) AS peak_adstock
    FROM rec r CROSS JOIN nn CROSS JOIN pk
    WHERE r.rn = nn.n
    """,
)
def q_ev_adstock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advertising adstock: daily click impulse with geometric ½
    carryover (a_t = x_t + ⌊a_{t−1}/2⌋) — the media-mix-model
    transformation of raw exposure into lingering effect, plus where
    the accumulated pressure peaked.

    Same exact-halving discipline as q_ev_forecast_holt: halving is
    the one float division that is exact in binary, so the integer
    fold is bit-identical to the oracle's recursive-CTE replay; the
    peak argmax tie-breaks on the earlier day.  Order-dependent ⇒
    per-series applyInPandas fold (|days| rows per series).
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .withColumn("series", F.lit(1))
    )

    def adstock(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        a = 0
        best = (None, -1, -1)  # (day, adstock, idx)
        first = True
        for i, row in pdf.iterrows():
            x = int(row["x"])
            a = x if first else x + a // 2
            first = False
            if a > best[1]:
                best = (str(row["day"]), a, i)
        return pd.DataFrame(
            {
                "n_days": [len(pdf)],
                "final_adstock": [a],
                "peak_day": [best[0]],
                "peak_adstock": [best[1]],
            }
        )

    return d.groupBy("series").applyInPandas(
        adstock,
        schema="n_days long, final_adstock long,"
        " peak_day string, peak_adstock long",
    )


@query(
    "q_ev_hazard",
    oracle="""
    WITH g AS (
        SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                   // 60000000 AS gap_min
        FROM events
    ),
    b AS (
        SELECT least(gap_min // 10, 12) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM g WHERE gap_min IS NOT NULL
        GROUP BY 1
    ),
    c AS (
        SELECT bucket, n,
               CAST(sum(n) OVER (ORDER BY bucket DESC) AS BIGINT)
                   AS at_risk
        FROM b
    )
    SELECT CAST(bucket * 10 AS BIGINT) AS gap_bucket_min,
           n AS n_events, at_risk,
           round(CAST(n AS DOUBLE) / at_risk, 6) AS hazard
    FROM c
    """,
)
def q_ev_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete hazard function of return time: for each 10-minute
    inter-event gap bucket, the conditional probability the next
    event arrives in that bucket GIVEN it hasn't yet — h(t) =
    n(t)/at-risk(t), the re-engagement clock that tells you exactly
    when a nudge stops being redundant (rising hazard = they come
    back anyway; falling = intervene).

    The at-risk denominator is a suffix sum over the ≤13-bucket
    aggregate (descending window on a constant-size table); gaps are
    exact integer µs→minute floors; the hazard is the one display
    division.  One user-partitioned lag + one bucket aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) over"
            " (partition by user_id order by ts, event_id))"
            " div 60000000"
        ).alias("gap_min"),
    ).where(F.col("gap_min").isNotNull())
    b = g.groupBy(
        F.least(F.expr("gap_min div 10"), F.lit(12)).alias("bucket")
    ).agg(F.count("*").alias("n"))
    wd = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = b.select(
        "bucket", "n", F.sum("n").over(wd).cast("long").alias("at_risk")
    )
    return c.select(
        (F.col("bucket") * 10).cast("long").alias("gap_bucket_min"),
        F.col("n").alias("n_events"),
        "at_risk",
        F.round(
            F.col("n").cast("double") / F.col("at_risk"), 6
        ).alias("hazard"),
    )


@query(
    "q_ev_cadence",
    oracle="""
    WITH g AS (
        SELECT user_id,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                   // 1000000 AS gap_s
        FROM events
    ),
    b AS (
        SELECT user_id,
               CASE WHEN gap_s < 60 THEN 'burst'
                    WHEN gap_s < 3600 THEN 'minutes'
                    WHEN gap_s < 86400 THEN 'hours'
                    ELSE 'days' END AS cadence,
               CAST(count(*) AS BIGINT) AS c
        FROM g WHERE gap_s IS NOT NULL
        GROUP BY 1, 2
    ),
    pref AS (
        SELECT user_id, cadence FROM (
            SELECT user_id, cadence,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY c DESC, cadence) AS rk
            FROM b) WHERE rk = 1
    )
    SELECT cadence, CAST(count(*) AS BIGINT) AS n_users
    FROM pref GROUP BY cadence
    """,
)
def q_ev_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cadence segmentation: each user's dominant inter-event rhythm
    (burst < 1 min, minutes, hours, days — ties break alphabetically),
    histogrammed — the engagement-style split that decides push
    strategy (bursty users batch well; daily users want digests).

    Gaps are exact integer µs→second floors; the modal bucket is a
    partitioned top-1 over ≤ 4 rows per user.  One user shuffle +
    two small aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "user_id",
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) over"
            " (partition by user_id order by ts, event_id))"
            " div 1000000"
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    b = g.groupBy(
        "user_id",
        F.when(F.col("gap_s") < 60, "burst")
        .when(F.col("gap_s") < 3600, "minutes")
        .when(F.col("gap_s") < 86400, "hours")
        .otherwise("days")
        .alias("cadence"),
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.desc("c"), "cadence")
    pref = (
        b.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id", "cadence")
    )
    return pref.groupBy("cadence").agg(F.count("*").alias("n_users"))


@query(
    "q_ev_freq_cap",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        FROM events
    ),
    w AS (
        SELECT user_id, event_type, us,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER (
                   PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN CURRENT ROW AND 3600000000 FOLLOWING)
                   AS np_1h,
               row_number() OVER (
                   PARTITION BY user_id,
                                CASE WHEN event_type = 'view' THEN 1
                                     ELSE 0 END
                   ORDER BY us, event_id) AS vrank
        FROM e
    ),
    v AS (
        SELECT CASE WHEN vrank > 3 THEN 1 ELSE 0 END AS suppressed,
               CASE WHEN np_1h > 0 THEN 1 ELSE 0 END AS converted
        FROM w WHERE event_type = 'view'
    )
    SELECT CAST(count(*) AS BIGINT) AS n_views,
           CAST(sum(suppressed) AS BIGINT) AS n_suppressed,
           CAST(sum(CASE WHEN suppressed = 1 THEN converted ELSE 0 END)
                AS BIGINT) AS conversions_at_risk,
           CAST(sum(CASE WHEN suppressed = 0 THEN converted ELSE 0 END)
                AS BIGINT) AS conversions_kept,
           round(CAST(sum(CASE WHEN suppressed = 1 THEN converted
                          ELSE 0 END) AS DOUBLE)
                 / nullif(sum(CASE WHEN converted = 1 THEN 1 ELSE 0 END),
                          0), 6) AS at_risk_share
    FROM v
    """,
)
def q_ev_freq_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-cap counterfactual: if views were capped at 3 per
    user, how many impressions disappear and what upper bound of
    1-hour-attributed conversions rides on them — the reach-vs-
    annoyance trade every ad/notification platform sizes before
    flipping the cap.

    Reuses q_ev_fatigue's exact machinery (integer-µs RANGE lookahead,
    per-user view rank); the at-risk split is pure integer flags.  One
    user shuffle carries both windows; output is one audit row.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
    )
    wrange = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.currentRow, 3_600_000_000)
    )
    wrank = Window.partitionBy(
        "user_id",
        F.when(F.col("event_type") == "view", 1).otherwise(0),
    ).orderBy("us", "event_id")
    w = e.select(
        "event_type",
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .over(wrange)
        .alias("np_1h"),
        F.row_number().over(wrank).alias("vrank"),
    )
    v = w.where(F.col("event_type") == "view").select(
        F.when(F.col("vrank") > 3, 1).otherwise(0).alias("suppressed"),
        F.when(F.col("np_1h") > 0, 1).otherwise(0).alias("converted"),
    )
    at_risk = F.when(
        F.col("suppressed") == 1, F.col("converted")
    ).otherwise(0)
    return v.agg(
        F.count("*").alias("n_views"),
        F.sum("suppressed").cast("long").alias("n_suppressed"),
        F.sum(at_risk).cast("long").alias("conversions_at_risk"),
        F.sum(
            F.when(F.col("suppressed") == 0, F.col("converted")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("conversions_kept"),
        F.round(
            F.sum(at_risk).cast("double")
            / F.nullif(F.sum("converted"), F.lit(0)),
            6,
        ).alias("at_risk_share"),
    )


@query(
    "q_ev_adoption",
    oracle="""
    WITH f AS (
        SELECT user_id, event_type,
               min(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(first_day AS VARCHAR) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_first_time_users
    FROM f
    GROUP BY first_day, event_type
    """,
)
def q_ev_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-adoption curve: per day and event type, how many users
    performed that action for the FIRST time — the breadth-expansion
    view (are new behaviors still being discovered, or has adoption
    saturated?) that complements q_ev_newusers' account-creation
    curve.

    First-touch day is one keyed min; the curve is one (day, type)
    aggregate.  Exact whole-day DATEs cast to strings for the
    canonicalizer (the q_profile_table lesson).
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id", "event_type").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    return f.groupBy(
        F.col("first_day").cast("string").alias("day"), "event_type"
    ).agg(F.count("*").alias("n_first_time_users"))


@query(
    "q_ev_attr_window",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, 0 AS kind FROM events
        WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, ts, event_id, 1 AS kind FROM events
        WHERE event_type = 'purchase'
    ),
    w AS (
        SELECT user_id, ts, kind,
               last_value(CASE WHEN kind = 0 THEN epoch_us(ts) END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prior_view_us
        FROM u
    ),
    p AS (
        SELECT epoch_us(ts) - prior_view_us AS gap_us
        FROM w WHERE kind = 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_purchases FROM p),
    win AS (
        SELECT unnest([3600000000, 21600000000, 86400000000]) AS w_us
    )
    SELECT CAST(w.w_us // 3600000000 AS BIGINT) AS window_hours,
           t.n_purchases,
           CAST(count(CASE WHEN p.gap_us IS NOT NULL
                           AND p.gap_us <= w.w_us THEN 1 END) AS BIGINT)
               AS n_attributed,
           round(CAST(count(CASE WHEN p.gap_us IS NOT NULL
                                 AND p.gap_us <= w.w_us THEN 1 END)
                      AS DOUBLE) / t.n_purchases, 6) AS attributed_share
    FROM p CROSS JOIN win w CROSS JOIN tot t
    GROUP BY w.w_us, t.n_purchases
    """,
)
def q_ev_attr_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window sensitivity: the share of purchases with a
    prior view within 1, 6, and 24 hours — the measurement-design
    sweep run BEFORE fixing the window, because the chosen cutoff
    silently decides how much credit "views" get.

    The last-view gap is computed ONCE with the union+carry as-of
    shape (exact integer µs), then compared against the three window
    literals via a 3-row spine — no re-scan per window.  One user
    shuffle + a 3-row fan-out aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    ref = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = ref.unionByName(pur)
    p = (
        u.select(
            "kind",
            "ts",
            F.last(
                F.when(F.col("kind") == 0, F.expr("unix_micros(ts)")),
                ignorenulls=True,
            )
            .over(wb)
            .alias("prior_view_us"),
        )
        .where(F.col("kind") == 1)
        .select(
            (
                F.expr("unix_micros(ts)") - F.col("prior_view_us")
            ).alias("gap_us")
        )
    ).cache()
    tot = p.agg(F.count("*").alias("n_purchases"))
    win = spark.createDataFrame(
        [(3_600_000_000,), (21_600_000_000,), (86_400_000_000,)],
        "w_us long",
    )
    hit = F.when(
        F.col("gap_us").isNotNull() & (F.col("gap_us") <= F.col("w_us")),
        1,
    )
    return (
        p.crossJoin(F.broadcast(win))
        .crossJoin(F.broadcast(tot))
        .groupBy(
            F.expr("w_us div 3600000000").cast("long").alias(
                "window_hours"
            ),
            "n_purchases",
        )
        .agg(
            F.count(hit).cast("long").alias("n_attributed"),
            F.round(
                F.count(hit).cast("double") / F.max("n_purchases"), 6
            ).alias("attributed_share"),
        )
    )


@query(
    "q_ev_peak_load",
    oracle="""
    WITH m AS (
        SELECT epoch_us(ts) // 60000000 AS minute,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1
    )
    SELECT CAST(minute AS BIGINT) AS minute_epoch,
           n AS n_events, n_users
    FROM m
    ORDER BY n DESC, minute
    LIMIT 5
    """,
)
def q_ev_peak_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-load table: the five busiest minutes of the stream by
    event count (ties → earlier minute), with the distinct users
    behind each — the capacity-planning number ("size for the p100
    minute, not the average") every ingestion SLO is written against.

    Exact integer µs minute keys, one keyed aggregate, TakeOrdered
    top-5 — the peak query stays O(|minutes|) however large the
    stream.
    """
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        F.expr("unix_micros(ts) div 60000000").alias("minute")
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return (
        m.orderBy(F.desc("n"), "minute")
        .limit(5)
        .select(
            F.col("minute").cast("long").alias("minute_epoch"),
            F.col("n").alias("n_events"),
            "n_users",
        )
    )


@query(
    "q_ev_milestones",
    oracle="""
    WITH su AS (
        SELECT user_id, min(epoch_us(ts)) AS signup_us
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    fm AS (
        SELECT e.user_id, e.event_type,
               (min(epoch_us(e.ts)) - su.signup_us) // 1000000 AS lat_s
        FROM events e JOIN su ON su.user_id = e.user_id
        WHERE e.event_type <> 'signup'
          AND epoch_us(e.ts) >= su.signup_us
        GROUP BY e.user_id, e.event_type, su.signup_us
    ),
    r AS (
        SELECT event_type, lat_s,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY lat_s, user_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM fm
    )
    SELECT event_type AS milestone,
           CAST(max(n) AS BIGINT) AS n_users,
           CAST(min(CASE WHEN 2 * rk >= n THEN lat_s END) AS BIGINT)
               AS median_latency_s,
           CAST(min(CASE WHEN 10 * rk >= 9 * n THEN lat_s END) AS BIGINT)
               AS p90_latency_s
    FROM r
    GROUP BY event_type
    """,
)
def q_ev_milestones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onboarding-velocity table: for each milestone action, the exact
    median and p90 seconds from a user's first signup to their first
    occurrence of that action — the activation clock growth teams
    instrument first (q_ev_time_to_convert generalized to every
    milestone at once).

    Latencies are integer µs→second floors; both quantiles are exact
    lower order statistics over per-milestone partitioned ranks with
    unique (latency, user) tie-breaks.  One anchor aggregate + one
    first-touch aggregate + one rank window.
    """
    ev = load_table(spark, sf_dir, "events")
    su = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min(F.expr("unix_micros(ts)")).alias("signup_us")
    )
    fm = (
        ev.where(F.col("event_type") != "signup")
        .join(su, "user_id")
        .where(F.expr("unix_micros(ts)") >= F.col("signup_us"))
        .groupBy("user_id", "event_type", "signup_us")
        .agg(
            F.expr(
                "(min(unix_micros(ts)) - signup_us) div 1000000"
            ).alias("lat_s")
        )
    )
    wr = Window.partitionBy("event_type").orderBy("lat_s", "user_id")
    wn = Window.partitionBy("event_type")
    r = fm.select(
        "event_type",
        "lat_s",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    return r.groupBy(F.col("event_type").alias("milestone")).agg(
        F.max("n").cast("long").alias("n_users"),
        F.min(
            F.when(2 * F.col("rk") >= F.col("n"), F.col("lat_s"))
        )
        .cast("long")
        .alias("median_latency_s"),
        F.min(
            F.when(10 * F.col("rk") >= 9 * F.col("n"), F.col("lat_s"))
        )
        .cast("long")
        .alias("p90_latency_s"),
    )


@query(
    "q_ev_uptime_streak",
    oracle="""
    WITH m AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    ok AS (
        SELECT user_id, rn,
               rn - row_number() OVER (PARTITION BY user_id
                                       ORDER BY rn) AS grp
        FROM m WHERE is_err = 0
    ),
    runs AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS run_len
        FROM ok GROUP BY user_id, grp
    ),
    per AS (
        SELECT user_id, CAST(max(run_len) AS BIGINT) AS longest
        FROM runs GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(max(longest) AS BIGINT) AS max_streak,
           CAST(sum(longest) AS BIGINT) AS sum_longest,
           round(CAST(sum(longest) AS DOUBLE) / count(*), 4)
               AS avg_longest
    FROM per
    """,
)
def q_ev_uptime_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest error-free run per user (in consecutive events), with
    the population summary — the "how long does a clean experience
    last" reliability metric that complements MTBF's wall-clock view
    with an interaction-count view.

    Runs are the rank-difference islands trick on non-error rows; all
    windows partition by user; every statistic exact except the
    rounded mean.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    m = ev.select(
        "user_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
        F.row_number().over(w).alias("rn"),
    )
    wok = Window.partitionBy("user_id").orderBy("rn")
    ok = m.where(F.col("is_err") == 0).select(
        "user_id",
        "rn",
        (F.col("rn") - F.row_number().over(wok)).alias("grp"),
    )
    runs = ok.groupBy("user_id", "grp").agg(
        F.count("*").alias("run_len")
    )
    per = runs.groupBy("user_id").agg(
        F.max("run_len").cast("long").alias("longest")
    )
    return per.agg(
        F.count("*").alias("n_users"),
        F.max("longest").cast("long").alias("max_streak"),
        F.sum("longest").cast("long").alias("sum_longest"),
        F.round(
            F.sum("longest").cast("double") / F.count("*"), 4
        ).alias("avg_longest"),
    )


@query(
    "q_ev_dau",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM events GROUP BY 1
    )
    SELECT CAST(a.day AS VARCHAR) AS day, a.dau,
           CAST(b.dau AS BIGINT) AS prev_dau,
           CAST(a.dau - b.dau AS BIGINT) AS delta,
           round(CAST(a.dau - b.dau AS DOUBLE) / b.dau, 6) AS pct_change
    FROM d a JOIN d b ON b.day = a.day - INTERVAL 1 DAY
    """,
)
def q_ev_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DAU trend: daily active users with day-over-day delta and
    percent change — the first chart on every growth dashboard,
    expressed as a self-JOIN on the calendar key (day = prev + 1) so
    no global-order window exists at all; days without a predecessor
    (the first day, gaps) drop out naturally.

    Distinct-user counts exact; the percent change divides once.  One
    distinct-count aggregate + an equi-join on the day key.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    ).cache()
    a = d.alias("a")
    b = d.alias("b")
    return a.join(
        F.broadcast(b),
        F.col("b.day") == F.date_sub(F.col("a.day"), 1),
    ).select(
        F.col("a.day").cast("string").alias("day"),
        F.col("a.dau").alias("dau"),
        F.col("b.dau").alias("prev_dau"),
        (F.col("a.dau") - F.col("b.dau")).cast("long").alias("delta"),
        F.round(
            (F.col("a.dau") - F.col("b.dau")).cast("double")
            / F.col("b.dau"),
            6,
        ).alias("pct_change"),
    )


@query(
    "q_ev_traffic_mix",
    oracle="""
    WITH fd AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY 1
    )
    SELECT CAST(CAST(e.ts AS DATE) AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(CASE WHEN CAST(e.ts AS DATE) = f.first_day
                           THEN 1 END) AS BIGINT) AS new_user_events,
           round(CAST(count(CASE WHEN CAST(e.ts AS DATE) = f.first_day
                                 THEN 1 END) AS DOUBLE) / count(*), 6)
               AS new_share
    FROM events e JOIN fd f ON f.user_id = e.user_id
    GROUP BY CAST(e.ts AS DATE)
    """,
)
def q_ev_traffic_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning traffic mix: per day, the share of event
    volume produced by users on their FIRST-ever day — the
    acquisition-vs-retention split of raw traffic that tells you
    whether growth is new blood or deepening engagement.

    First-day anchors are one keyed min joined back (broadcast-sized
    per-user table); whole-day DATE equality, exact counts, one
    display division.
    """
    ev = load_table(spark, sf_dir, "events")
    fd = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    j = ev.join(fd, "user_id")
    is_new = F.when(
        F.col("ts").cast("date") == F.col("first_day"), 1
    )
    return j.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.count(is_new).cast("long").alias("new_user_events"),
        F.round(
            F.count(is_new).cast("double") / F.count("*"), 6
        ).alias("new_share"),
    )


@query(
    "q_ev_rolling_spend",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    w AS (
        SELECT user_id, event_id, cents,
               CAST(coalesce(sum(cents) OVER (
                   PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 2592000000000 PRECEDING
                             AND 1 PRECEDING), 0) AS BIGINT)
                   AS prior_30d_cents
        FROM p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN prior_30d_cents + cents > 100000
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_over_limit,
           CAST(max(prior_30d_cents + cents) AS BIGINT)
               AS max_30d_exposure_cents,
           round(CAST(sum(CASE WHEN prior_30d_cents + cents > 100000
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
               AS over_limit_share
    FROM w
    """,
)
def q_ev_rolling_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity-limit check: at each purchase, the user's trailing
    30-day spend including the purchase itself, flagged against a
    $1000 rolling limit — the credit/fraud control evaluated inline
    on the authorization path, here as the batch audit of how often
    it would have fired.

    The trailing window is an integer-µs RANGE frame ending at 1
    PRECEDING (strictly-before, so the limit check adds the current
    amount explicitly — no double count); both engines frame RANGE on
    the identical BIGINT key.  One user shuffle, one audit row.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-2_592_000_000_000, -1)
    )
    w = p.select(
        "cents",
        F.coalesce(F.sum("cents").over(wr), F.lit(0))
        .cast("long")
        .alias("prior_30d_cents"),
    )
    exposure = F.col("prior_30d_cents") + F.col("cents")
    over = F.when(exposure > 100_000, 1).otherwise(0)
    return w.agg(
        F.count("*").alias("n_purchases"),
        F.sum(over).cast("long").alias("n_over_limit"),
        F.max(exposure).cast("long").alias("max_30d_exposure_cents"),
        F.round(
            F.sum(over).cast("double") / F.count("*"), 6
        ).alias("over_limit_share"),
    )


@query(
    "q_ev_active_days",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS active_days
        FROM events GROUP BY 1
    )
    SELECT active_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM u
    GROUP BY active_days
    """,
)
def q_ev_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-depth histogram: users by their count of distinct
    active days — the L28-style distribution whose left mass is
    drive-by traffic and right mass is the habit core (the shape
    behind every "power-user curve" slide).

    One distinct-count per user + one histogram aggregate; exact
    whole-day DATEs.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.countDistinct(F.col("ts").cast("date"))
        .cast("long")
        .alias("active_days")
    )
    return u.groupBy("active_days").agg(F.count("*").alias("n_users"))


@query(
    "q_ev_mix_shift",
    oracle="""
    WITH b AS (
        SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                    AS BIGINT) AS mid
        FROM events
    ),
    s AS (
        SELECT CASE WHEN epoch_us(ts) < mid THEN 0 ELSE 1 END AS period,
               CASE WHEN event_type IN ('view', 'click') THEN event_type
                    ELSE 'other' END AS seg,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events CROSS JOIN b
    ),
    g AS (
        SELECT period, seg,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS k
        FROM s GROUP BY 1, 2
    ),
    t AS (
        SELECT period, CAST(sum(n) AS BIGINT) AS nt FROM g GROUP BY 1
    ),
    j AS (
        SELECT g0.seg,
               g0.n AS n0, g0.k AS k0, t0.nt AS nt0,
               g1.n AS n1, g1.k AS k1, t1.nt AS nt1
        FROM (SELECT * FROM g WHERE period = 0) g0
        JOIN (SELECT * FROM g WHERE period = 1) g1 ON g0.seg = g1.seg
        CROSS JOIN (SELECT nt FROM t WHERE period = 0) t0
        CROSS JOIN (SELECT nt FROM t WHERE period = 1) t1
    )
    SELECT seg, n0, k0, n1, k1,
           round(CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0, 6)
               AS rate_change,
           round((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0)
                 * n0 / nt0, 6) AS within_contrib,
           round((CAST(n1 AS DOUBLE) / nt1 - CAST(n0 AS DOUBLE) / nt0)
                 * k1 / n1, 6) AS mix_contrib
    FROM j
    """,
)
def q_ev_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kitagawa rate decomposition: per segment, how much of the
    overall purchase-rate change between the two time halves came
    from the segment's own rate moving (within effect, old weights)
    vs its share of traffic moving (mix effect, new rates) — the
    "did we get better or did the mix change" split every metric
    review needs before claiming improvement.

    The six sufficient counts per segment are exact integers from
    one pass (same µs-midpoint anchor as q_ev_cuped); the two
    contributions are single double expressions over those integers.
    One aggregate + a |segments|-row join.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.expr(
            "cast((min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
            " as bigint)"
        ).alias("mid")
    )
    s = ev.crossJoin(F.broadcast(b)).select(
        F.when(F.expr("unix_micros(ts)") < F.col("mid"), 0)
        .otherwise(1)
        .alias("period"),
        F.when(
            F.col("event_type").isin("view", "click"),
            F.col("event_type"),
        )
        .otherwise("other")
        .alias("seg"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    g = s.groupBy("period", "seg").agg(
        F.count("*").alias("n"), F.sum("y").cast("long").alias("k")
    ).cache()
    t = g.groupBy("period").agg(F.sum("n").cast("long").alias("nt"))
    g0 = g.where(F.col("period") == 0).select(
        "seg",
        F.col("n").alias("n0"),
        F.col("k").alias("k0"),
    )
    g1 = g.where(F.col("period") == 1).select(
        "seg",
        F.col("n").alias("n1"),
        F.col("k").alias("k1"),
    )
    t0 = t.where(F.col("period") == 0).select(F.col("nt").alias("nt0"))
    t1 = t.where(F.col("period") == 1).select(F.col("nt").alias("nt1"))
    j = (
        g0.join(g1, "seg")
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
    )
    r0 = F.col("k0").cast("double") / F.col("n0")
    r1 = F.col("k1").cast("double") / F.col("n1")
    return j.select(
        "seg",
        "n0",
        "k0",
        "n1",
        "k1",
        F.round(r1 - r0, 6).alias("rate_change"),
        F.round((r1 - r0) * F.col("n0") / F.col("nt0"), 6).alias(
            "within_contrib"
        ),
        F.round(
            (
                F.col("n1").cast("double") / F.col("nt1")
                - F.col("n0").cast("double") / F.col("nt0")
            )
            * r1,
            6,
        ).alias("mix_contrib"),
    )


@query(
    "q_ev_shapley_touch",
    oracle="""
    WITH fp AS (
        SELECT user_id, min(epoch_us(ts)) AS p_us
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    touch AS (
        SELECT f.user_id,
               CAST(max(CASE WHEN e.event_type = 'view'
                             AND epoch_us(e.ts) < f.p_us
                        THEN 1 ELSE 0 END) AS BIGINT) AS saw_view,
               CAST(max(CASE WHEN e.event_type = 'click'
                             AND epoch_us(e.ts) < f.p_us
                        THEN 1 ELSE 0 END) AS BIGINT) AS saw_click
        FROM fp f JOIN events e ON e.user_id = f.user_id
        GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(sum(CASE WHEN saw_view = 1 AND saw_click = 1 THEN 1
                         WHEN saw_view = 1 THEN 2 ELSE 0 END) AS BIGINT)
               AS view_credit_halves,
           CAST(sum(CASE WHEN saw_view = 1 AND saw_click = 1 THEN 1
                         WHEN saw_click = 1 THEN 2 ELSE 0 END) AS BIGINT)
               AS click_credit_halves,
           CAST(sum(CASE WHEN saw_view = 0 AND saw_click = 0 THEN 1
                         ELSE 0 END) AS BIGINT) AS organic_conversions
    FROM touch
    """,
)
def q_ev_shapley_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-channel Shapley attribution: each first purchase splits its
    credit by the Shapley closed form over the {view, click} touch
    coalition — ½ each when both preceded the purchase, full credit
    to a lone channel, organic when neither — carried as exact
    integer HALF-credits (the dyadic trick: ½ never becomes a float),
    the game-theoretic answer to q_ev_attribution's heuristics.

    One first-purchase anchor + one per-user coalition aggregate;
    strictly-before comparisons in exact µs.
    """
    ev = load_table(spark, sf_dir, "events")
    fp = ev.where(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min(F.expr("unix_micros(ts)")).alias("p_us"))
    touch = (
        fp.join(ev, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "view")
                    & (F.expr("unix_micros(ts)") < F.col("p_us")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("saw_view"),
            F.max(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.expr("unix_micros(ts)") < F.col("p_us")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("saw_click"),
        )
    )
    both = (F.col("saw_view") == 1) & (F.col("saw_click") == 1)
    return touch.agg(
        F.count("*").alias("n_conversions"),
        F.sum(
            F.when(both, 1)
            .when(F.col("saw_view") == 1, 2)
            .otherwise(0)
        )
        .cast("long")
        .alias("view_credit_halves"),
        F.sum(
            F.when(both, 1)
            .when(F.col("saw_click") == 1, 2)
            .otherwise(0)
        )
        .cast("long")
        .alias("click_credit_halves"),
        F.sum(
            F.when(
                (F.col("saw_view") == 0) & (F.col("saw_click") == 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("organic_conversions"),
    )


@query(
    "q_ev_gap_memory",
    oracle="""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS us, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    g AS (
        SELECT user_id,
               (us - lag(us) OVER w) // 1000000 AS gap_s,
               (lag(us) OVER w - lag(us, 2) OVER w) // 1000000
                   AS prev_gap_s
        FROM p
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    x AS (
        SELECT gap_s AS y, prev_gap_s AS x
        FROM g WHERE gap_s IS NOT NULL AND prev_gap_s IS NOT NULL
    ),
    s AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(x * y) AS HUGEINT) AS sxy,
               CAST(sum(x * x) AS HUGEINT) AS sxx,
               CAST(sum(y * y) AS HUGEINT) AS syy
        FROM x
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6)
               AS lag1_corr
    FROM s
    """,
)
def q_ev_gap_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Renewal-process memory test: the lag-1 Pearson correlation
    between consecutive purchase gaps pooled across users — r ≈ 0
    means purchase timing is memoryless (Poisson-like, so "time since
    last purchase" is a useless feature); r > 0 means cadence is
    personal and predictive.

    Gaps are exact integer µs→second floors (a double lag window per
    user), the five sufficient sums exact BIGINTs, the correlation
    one final double.  One user shuffle + one scalar row.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.expr("unix_micros(ts)").alias("us"), "event_id"
    )
    g = p.select(
        F.expr(
            "(us - lag(us, 1) over (partition by user_id"
            " order by us, event_id)) div 1000000"
        ).alias("y"),
        F.expr(
            "(lag(us, 1) over (partition by user_id order by us, event_id)"
            " - lag(us, 2) over (partition by user_id"
            " order by us, event_id)) div 1000000"
        ).alias("x"),
    ).where(F.col("y").isNotNull() & F.col("x").isNotNull())
    dec = "decimal(38,0)"
    s = g.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec).alias("syy"),
    )
    # cross products of second-scale gap sums exceed int64 at sf0.1
    # (n·Σxy ≈ 5e22) — the whole solve runs in DECIMAL(38,0)/HUGEINT,
    # the q_ml_linreg widening discipline.
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("sx"),
        F.col("sy").cast("long").alias("sy"),
        F.round(num / F.sqrt(dx) / F.sqrt(dy), 6).alias("lag1_corr"),
    )


@query(
    "q_ev_breadth_depth",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(count(DISTINCT event_type) AS BIGINT) AS breadth,
               CAST(count(*) AS BIGINT) AS depth
        FROM events GROUP BY 1
    )
    SELECT breadth,
           CAST(least(length(printf('%b', depth)) - 1, 6) AS BIGINT)
               AS depth_log2_band,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(depth) AS BIGINT) AS total_events
    FROM u
    GROUP BY 1, 2
    """,
)
def q_ev_breadth_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement breadth × depth matrix: users cross-classified by
    how many distinct action types they use (breadth, ≤ |types|) and
    the log₂ band of their event volume (depth, 2⁶+ capped) — the 2-D
    engagement segmentation behind "casual wide vs power narrow"
    product narratives.

    Depth bands use the exact binary-length identity; all counts
    exact.  Two keyed aggregates; the matrix is |types|×7 cells at
    any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").cast("long").alias("breadth"),
        F.count("*").alias("depth"),
    )
    return u.groupBy(
        "breadth",
        F.least(
            F.expr("cast(length(conv(depth, 10, 2)) - 1 as bigint)"),
            F.lit(6),
        ).alias("depth_log2_band"),
    ).agg(
        F.count("*").alias("n_users"),
        F.sum("depth").cast("long").alias("total_events"),
    )


@query(
    "q_ev_half_life",
    oracle="""
    WITH fd AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
    ),
    act AS (
        SELECT DISTINCT e.user_id,
               date_diff('day', f.d0, CAST(e.ts AS DATE)) AS k
        FROM events e JOIN fd f ON f.user_id = e.user_id
    ),
    coh AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM fd),
    ret AS (
        SELECT k, CAST(count(*) AS BIGINT) AS retained
        FROM act WHERE k > 0 GROUP BY 1
    )
    SELECT coh.n0 AS cohort_size,
           CAST(min(CASE WHEN 2 * r.retained < coh.n0 THEN r.k END)
                AS BIGINT) AS half_life_days,
           CAST(max(r.k) AS BIGINT) AS max_day_observed,
           CAST(max(CASE WHEN r.k = 1 THEN r.retained END) AS BIGINT)
               AS day1_retained
    FROM ret r CROSS JOIN coh
    GROUP BY coh.n0
    """,
)
def q_ev_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: the first day-offset where fewer than half
    the cohort is still active — the single scalar product reviews
    quote from q_ev_retention_curve's whole curve, extracted with the
    exact integer predicate 2·retained < cohort (never a 0.5 float).

    NULL half-life means retention never dipped below 50% in the
    observed window — reported as such, not clamped.  One first-day
    anchor + one distinct (user, day-offset) aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    fd = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    act = (
        ev.join(fd, "user_id")
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).alias("k"),
        )
        .distinct()
    )
    coh = fd.agg(F.count("*").cast("long").alias("n0"))
    ret = (
        act.where(F.col("k") > 0)
        .groupBy("k")
        .agg(F.count("*").alias("retained"))
    )
    j = ret.crossJoin(F.broadcast(coh))
    return j.groupBy(F.col("n0").alias("cohort_size")).agg(
        F.min(
            F.when(
                2 * F.col("retained") < F.col("n0"), F.col("k")
            )
        )
        .cast("long")
        .alias("half_life_days"),
        F.max("k").cast("long").alias("max_day_observed"),
        F.max(
            F.when(F.col("k") == 1, F.col("retained"))
        )
        .cast("long")
        .alias("day1_retained"),
    )


@query(
    "q_ev_weekend_mix",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                    THEN 1 ELSE 0 END AS is_we
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(is_we) AS BIGINT) AS n_weekend,
           round(CAST(sum(is_we) AS DOUBLE) / count(*), 6)
               AS weekend_share,
           CAST(CASE WHEN 7 * sum(is_we) > 2 * count(*) THEN 1 ELSE 0
                END AS INT) AS over_indexed
    FROM e
    GROUP BY event_type
    """,
)
def q_ev_weekend_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend mix per event type: the share of each behavior landing
    on Saturday/Sunday, with an over-index flag against the uniform
    2/7 baseline as the exact cross-multiplication 7·weekend > 2·n —
    the dayparting split campaign scheduling starts from.

    DuckDB's dayofweek is 0-based Sunday and Spark's dayofweek is
    1-based Sunday — the weekend predicate is written against each
    engine's own convention ({0,6} vs {1,7}), one of the calendar
    parity traps this repo pins per query.  One aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.when(
            F.dayofweek(F.col("ts").cast("date")).isin(1, 7), 1
        )
        .otherwise(0)
        .alias("is_we"),
    )
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("is_we").cast("long").alias("n_weekend"),
        F.round(
            F.sum("is_we").cast("double") / F.count("*"), 6
        ).alias("weekend_share"),
        F.when(7 * F.sum("is_we") > 2 * F.count("*"), 1)
        .otherwise(0)
        .cast("int")
        .alias("over_indexed"),
    )


@query(
    "q_ev_latency_percentiles",
    oracle="""
    WITH s AS (
        SELECT CAST(hour(ts) AS INT) AS h,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    pv AS (
        SELECT h, vc, CAST(count(*) AS BIGINT) AS ct
        FROM s GROUP BY 1, 2
    ),
    cum AS (
        SELECT h, vc,
               sum(ct) OVER (PARTITION BY h ORDER BY vc) AS c,
               sum(ct) OVER (PARTITION BY h) AS n
        FROM pv
    )
    SELECT h,
           CAST(min(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN 2 * c >= n THEN vc END) AS BIGINT)
               AS p50_cents,
           CAST(min(CASE WHEN 20 * c >= 19 * n THEN vc END) AS BIGINT)
               AS p95_cents,
           CAST(min(CASE WHEN 100 * c >= 99 * n THEN vc END) AS BIGINT)
               AS p99_cents
    FROM cum GROUP BY h ORDER BY h
    """,
)
def q_ev_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour exact p50/p95/p99 — the SRE latency-heatmap row: tail
    percentiles of the (exact-cents) value distribution for each hour
    of day, as exact LOWER ORDER STATISTICS, not interpolated floats:
    p is the smallest value whose cumulative count reaches ⌈p·n⌉,
    checked with integer cross-multiplication (2c ≥ n, 20c ≥ 19n,
    100c ≥ 99n).

    Plan: per-(hour, distinct-value) counts (one shuffle), a
    PARTITIONED cumulative window over the per-hour distinct values
    (never a global sort), one aggregate out — the shape that computes
    a million per-(service, hour) percentile cells at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.hour("ts").cast("int").alias("h"),
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
    )
    pv = s.groupBy("h", "vc").agg(F.count("*").cast("long").alias("ct"))
    wc = (
        Window.partitionBy("h")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("h")
    cum = pv.select(
        "h",
        "vc",
        F.sum("ct").over(wc).alias("c"),
        F.sum("ct").over(wn).alias("n"),
    )
    return (
        cum.groupBy("h")
        .agg(
            F.min("n").cast("long").alias("n"),
            F.min(F.when(2 * F.col("c") >= F.col("n"), F.col("vc")))
            .cast("long")
            .alias("p50_cents"),
            F.min(F.when(20 * F.col("c") >= 19 * F.col("n"), F.col("vc")))
            .cast("long")
            .alias("p95_cents"),
            F.min(F.when(100 * F.col("c") >= 99 * F.col("n"), F.col("vc")))
            .cast("long")
            .alias("p99_cents"),
        )
        .orderBy("h")
    )


@query(
    "q_ev_event_study",
    oracle="""
    WITH fe AS (
        SELECT user_id, min(ts) AS t0
        FROM events WHERE event_type = 'error'
        GROUP BY 1
    ),
    w AS (
        SELECT e.user_id,
               CASE WHEN e.ts < fe.t0 THEN 'pre' ELSE 'post' END AS phase,
               CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN fe ON e.user_id = fe.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts >= fe.t0 - INTERVAL 7 DAY
          AND e.ts <  fe.t0 + INTERVAL 7 DAY
          AND e.ts <> fe.t0
    ),
    per AS (
        SELECT user_id,
               CAST(sum(CASE WHEN phase = 'pre' THEN cents ELSE 0 END)
                    AS BIGINT) AS pre_cents,
               CAST(sum(CASE WHEN phase = 'pre' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pre_n,
               CAST(sum(CASE WHEN phase = 'post' THEN cents ELSE 0 END)
                    AS BIGINT) AS post_cents,
               CAST(sum(CASE WHEN phase = 'post' THEN 1 ELSE 0 END)
                    AS BIGINT) AS post_n
        FROM w GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT)            AS n_users,
           CAST(sum(pre_n) AS BIGINT)          AS pre_purchases,
           CAST(sum(post_n) AS BIGINT)         AS post_purchases,
           CAST(sum(pre_cents) AS BIGINT)      AS pre_cents,
           CAST(sum(post_cents) AS BIGINT)     AS post_cents,
           round(CAST(sum(post_cents) - sum(pre_cents) AS DOUBLE)
                 / nullif(sum(pre_cents), 0), 6) AS rel_change
    FROM per
    """,
)
def q_ev_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study around each user's FIRST error: purchase behavior in
    the ±7-day window (pre vs post), pooled across users — the
    before/after impact read every incident review wants, structured
    so selection effects are visible (same users, same window width on
    both sides).  Complements q_ev_did (two-group diff-in-diff) and
    q_ev_cuped (variance reduction) in the causal toolbox.

    One aggregate finds each user's anchor, a broadcast-joined window
    classifier splits purchases into pre/post, exact cents all the
    way; the single float is the relative change.  The anchor event
    itself is excluded (ts <> t0) so the window is symmetric."""
    ev = load_table(spark, sf_dir, "events")
    fe = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    w = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fe, "user_id")
        .filter(
            (F.col("ts") >= F.col("t0") - F.expr("INTERVAL 7 DAY"))
            & (F.col("ts") < F.col("t0") + F.expr("INTERVAL 7 DAY"))
            & (F.col("ts") != F.col("t0"))
        )
        .select(
            "user_id",
            F.when(F.col("ts") < F.col("t0"), "pre").otherwise("post").alias(
                "phase"
            ),
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    per = w.groupBy("user_id").agg(
        F.sum(F.when(F.col("phase") == "pre", F.col("cents")).otherwise(0))
        .cast("long")
        .alias("pre_cents"),
        F.sum(F.when(F.col("phase") == "pre", 1).otherwise(0))
        .cast("long")
        .alias("pre_n"),
        F.sum(F.when(F.col("phase") == "post", F.col("cents")).otherwise(0))
        .cast("long")
        .alias("post_cents"),
        F.sum(F.when(F.col("phase") == "post", 1).otherwise(0))
        .cast("long")
        .alias("post_n"),
    )
    return per.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("pre_n").cast("long").alias("pre_purchases"),
        F.sum("post_n").cast("long").alias("post_purchases"),
        F.sum("pre_cents").cast("long").alias("pre_cents"),
        F.sum("post_cents").cast("long").alias("post_cents"),
        F.round(
            (F.sum("post_cents") - F.sum("pre_cents")).cast("double")
            / F.nullif(F.sum("pre_cents"), F.lit(0)),
            6,
        ).alias("rel_change"),
    )


def _brier_piv(agg_fmt: str) -> str:
    """Eleven fixed score buckets (the least(...,10) cap) pivoted to
    literal columns — the fixed-order summation trick."""
    return ", ".join(agg_fmt.format(b=b) for b in range(11))


# The squared cross-products are built as DOUBLE differences of exact
# BIGINT products and squared in DOUBLE (ADVICE r06: squaring in
# BIGINT overflows at large user-count scale — (nn·s_b)² ~ nn⁴ —
# where Spark 4 ANSI errors but DuckDB promotes to HUGEINT; the
# shared-verbatim strings keep the IEEE op sequence identical).
_BRIER_REL = " + ".join(
    f"CASE WHEN n_{b} > 0 THEN "
    f"(CAST({b} * n_{b} AS DOUBLE) - 10 * s_{b})"
    f" * (CAST({b} * n_{b} AS DOUBLE) - 10 * s_{b})"
    f" / (CAST(100 AS DOUBLE) * n_{b}) ELSE CAST(0 AS DOUBLE) END"
    for b in range(11)
)
_BRIER_RES = " + ".join(
    f"CASE WHEN n_{b} > 0 THEN "
    f"(CAST(nn AS DOUBLE) * s_{b} - CAST(yy AS DOUBLE) * n_{b})"
    f" * (CAST(nn AS DOUBLE) * s_{b} - CAST(yy AS DOUBLE) * n_{b})"
    f" / (CAST(nn AS DOUBLE) * nn * n_{b}) ELSE CAST(0 AS DOUBLE) END"
    for b in range(11)
)


@query(
    "q_ml_brier",
    oracle="""
    WITH f AS (
        SELECT user_id,
               CAST(least(sum(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END), 10) AS BIGINT)
                   AS score,
               max(CASE WHEN event_type = 'purchase'
                         AND CAST(json_extract_string(props, '$.k')
                                  AS DOUBLE) >= 90
                        THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    piv AS (
        SELECT CAST(count(*) AS BIGINT) AS nn,
               CAST(sum(converted) AS BIGINT) AS yy,
               {piv_cols}
        FROM f
    )
    SELECT nn AS n_users,
           round(({rel}) / nn, 4) AS reliability,
           round(({res}) / nn, 4) AS resolution,
           round(CAST(yy AS DOUBLE) * (nn - yy) / nn / nn, 4)
               AS uncertainty,
           round(({rel}) / nn - ({res}) / nn
                 + CAST(yy AS DOUBLE) * (nn - yy) / nn / nn, 4) AS brier
    FROM piv
    """.format(
        piv_cols=_brier_piv(
            "CAST(count(CASE WHEN score = {b} THEN 1 END) AS BIGINT)"
            " AS n_{b}, "
            "CAST(coalesce(sum(CASE WHEN score = {b} THEN converted END), 0)"
            " AS BIGINT) AS s_{b}"
        ),
        rel=_BRIER_REL,
        res=_BRIER_RES,
    ),
)
def q_ml_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the naive
    score-proportional predictor p = score/10 against the sparse
    conversion outcome: reliability (miscalibration to pool away —
    what q_ml_isotonic fixes), resolution (how much the buckets
    separate), uncertainty (the outcome's intrinsic variance), and
    Brier = REL − RES + UNC — the third member of the calibration
    family (curve → isotonic fit → score decomposition).

    Determinism: every per-bucket term is one double division of exact
    BIGINT cross-products ((b·n_b − 10·s_b)², (N·s_b − Y·n_b)²), and
    the bucket sums run over the ELEVEN LITERAL buckets the
    least(...,10) cap guarantees, in fixed left-associative order —
    the pivot + fixed-order-literal pattern (Levene/nDCG).  One
    user-keyed aggregate then one 1-row pivot; nothing data-sized
    past the first shuffle."""
    ev = load_table(spark, sf_dir, "events")
    high_k = (F.col("event_type") == "purchase") & (
        F.get_json_object("props", "$.k").try_cast("double") >= 90
    )
    f = ev.groupBy("user_id").agg(
        F.least(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            F.lit(10),
        )
        .cast("bigint")
        .alias("score"),
        F.max(F.when(high_k, 1).otherwise(0)).alias("converted"),
    )
    piv = f.agg(
        F.count("*").alias("nn"),
        F.sum("converted").alias("yy"),
        *[
            c
            for b in range(11)
            for c in (
                F.count(F.when(F.col("score") == b, 1)).alias(f"n_{b}"),
                F.coalesce(
                    F.sum(F.when(F.col("score") == b, F.col("converted"))),
                    F.lit(0),
                ).alias(f"s_{b}"),
            )
        ],
    )
    rel = F.expr(_BRIER_REL)
    res = F.expr(_BRIER_RES)
    unc = F.expr("CAST(yy AS DOUBLE) * (nn - yy) / nn / nn")
    return piv.select(
        F.col("nn").alias("n_users"),
        F.round(rel / F.col("nn"), 4).alias("reliability"),
        F.round(res / F.col("nn"), 4).alias("resolution"),
        F.round(unc, 4).alias("uncertainty"),
        F.round(rel / F.col("nn") - res / F.col("nn") + unc, 4).alias(
            "brier"
        ),
    )


#: ECE numerator Σ_b |b·n_b − 10·s_b| — an EXACT BIGINT (per-bucket
#: |confidence − accuracy| mass, cross-multiplied by 10·n_b), shared
#: verbatim by both engines; ECE itself is one final division.
_ECE_NUM = " + ".join(f"abs({b} * n_{b} - 10 * s_{b})" for b in range(11))
#: Worst per-bucket |conf − acc| in basis points — exact floor
#: division, fixed literal order (greatest is order-insensitive).
_ECE_MAX_BPS = "greatest(" + ", ".join(
    f"CASE WHEN n_{b} > 0 THEN abs({b} * n_{b} - 10 * s_{b}) * 1000"
    f" DIV n_{b} ELSE 0 END"
    for b in range(11)
) + ")"


@query(
    "q_ml_ece",
    oracle="""
    WITH f AS (
        SELECT user_id,
               CAST(least(sum(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END), 10) AS BIGINT)
                   AS score,
               max(CASE WHEN event_type = 'purchase'
                         AND CAST(json_extract_string(props, '$.k')
                                  AS DOUBLE) >= 90
                        THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    piv AS (
        SELECT CAST(count(*) AS BIGINT) AS nn,
               {piv_cols}
        FROM f
    )
    SELECT nn AS n_users,
           round(CAST({num} AS DOUBLE) / (10 * nn), 4) AS ece,
           CAST({max_bps} AS BIGINT) AS max_gap_bps
    FROM piv
    """.format(
        piv_cols=_brier_piv(
            "CAST(count(CASE WHEN score = {b} THEN 1 END) AS BIGINT)"
            " AS n_{b}, "
            "CAST(coalesce(sum(CASE WHEN score = {b} THEN converted END), 0)"
            " AS BIGINT) AS s_{b}"
        ),
        num=_ECE_NUM,
        max_bps=_ECE_MAX_BPS.replace(" DIV ", " // "),
    ),
)
def q_ml_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error for the score-proportional predictor
    p = score/10 (the q_ml_brier frame): ECE = Σ_b (n_b/N)·|b/10 −
    s_b/n_b| — the single headline number a model card quotes, plus
    the worst per-bucket gap in basis points (which bucket to look at
    when ECE is bad).  Completes the calibration family: curve
    (q_ml_calibration) → isotonic repair (q_ml_isotonic) → Murphy
    decomposition (q_ml_brier) → the scalar summary.

    Determinism: the per-bucket mass simplifies to |b·n_b − 10·s_b| —
    an exact BIGINT over the ELEVEN literal buckets (the
    pivot + fixed-order pattern), one final double division; the max
    gap is exact floor-division bps.  The DIV/'//' spelling is the one
    cross-engine divergence, handled by string substitution."""
    ev = load_table(spark, sf_dir, "events")
    high_k = (F.col("event_type") == "purchase") & (
        F.get_json_object("props", "$.k").try_cast("double") >= 90
    )
    f = ev.groupBy("user_id").agg(
        F.least(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            F.lit(10),
        )
        .cast("bigint")
        .alias("score"),
        F.max(F.when(high_k, 1).otherwise(0)).alias("converted"),
    )
    piv = f.agg(
        F.count("*").alias("nn"),
        *[
            c
            for b in range(11)
            for c in (
                F.count(F.when(F.col("score") == b, 1)).alias(f"n_{b}"),
                F.coalesce(
                    F.sum(F.when(F.col("score") == b, F.col("converted"))),
                    F.lit(0),
                ).alias(f"s_{b}"),
            )
        ],
    )
    return piv.select(
        F.col("nn").alias("n_users"),
        F.round(
            F.expr(_ECE_NUM).cast("double") / (10 * F.col("nn")), 4
        ).alias("ece"),
        F.expr(_ECE_MAX_BPS).cast("long").alias("max_gap_bps"),
    )


@query(
    "q_ml_kappa",
    oracle="""
    WITH j AS (
        SELECT len(string_split(text, ' ')) >= 60 AS a,
               len(list_distinct(string_split(text, ' '))) >= 28 AS b
        FROM documents
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
               CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
               CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
               CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
        FROM j
    )
    SELECT n11, n10, n01, n00,
           round(CAST(n11 + n00 AS DOUBLE) / n, 4) AS po,
           round((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                  + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / n / n, 4)
               AS pe,
           round((CAST(n AS DOUBLE) * (n11 + n00)
                  - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                     + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)))
                 / (CAST(n AS DOUBLE) * n
                    - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                       + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))), 4)
               AS kappa
    FROM c
    """,
)
def q_ml_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two document-quality "judges" — the
    inter-annotator-agreement statistic every labeling/LLM-judge
    pipeline reports before trusting its labels (agreement corrected
    for chance): judge A = length gate (≥ 60 tokens), judge B =
    lexical-richness gate (≥ 28 distinct tokens) — deterministic
    rules over stored text, correlated but not identical (all four
    contingency cells populated on the driver corpus at every SF).

    Determinism: the 2×2 contingency is four exact BIGINT counts from
    ONE scan; po, pe and κ = (N·agree − Σ marginal products) /
    (N² − Σ marginal products) do their algebra in DOUBLE via the
    shared-verbatim expression (the r7 overflow rule — N² and the
    marginal products are quadratic in corpus size)."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.size(F.split("text", " ")) >= 60).alias("a"),
        (F.size(F.array_distinct(F.split("text", " "))) >= 28).alias("b"),
    )
    c = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    pe = (
        "(CAST(n11 + n10 AS DOUBLE) * (n11 + n01)"
        " + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))"
    )
    return c.select(
        "n11", "n10", "n01", "n00",
        F.round(F.expr("CAST(n11 + n00 AS DOUBLE) / n"), 4).alias("po"),
        F.round(F.expr(f"{pe} / n / n"), 4).alias("pe"),
        F.round(
            F.expr(
                f"(CAST(n AS DOUBLE) * (n11 + n00) - {pe})"
                f" / (CAST(n AS DOUBLE) * n - {pe})"
            ),
            4,
        ).alias("kappa"),
    )


#: McNemar continuity-corrected numerator (shared verbatim by both
#: engines): greatest(|n10 - n01| - 1, 0)² — exact BIGINT.
_MCNEMAR_NUM = (
    "greatest(abs(n10 - n01) - 1, 0) * greatest(abs(n10 - n01) - 1, 0)"
)


@query(
    "q_ml_mcnemar",
    oracle=f"""
    WITH j AS (
        SELECT len(string_split(text, ' ')) >= 60 AS a,
               len(list_distinct(string_split(text, ' '))) >= 28 AS b
        FROM documents
    ),
    c AS (
        SELECT CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n10,
               CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n01
        FROM j
    )
    SELECT n10, n01,
           CASE WHEN n10 + n01 > 0
                THEN round(CAST({_MCNEMAR_NUM} AS DOUBLE) / (n10 + n01), 4)
           END AS chi2_cc,
           CASE WHEN n10 + n01 > 0
                THEN 1000000 * ({_MCNEMAR_NUM}) >= 3841459 * (n10 + n01)
           END AS reject_05
    FROM c
    """,
)
def q_ml_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the q_ml_kappa judge pair — the PAIRED
    companion statistic: kappa asks "do the two labelers agree beyond
    chance?", McNemar asks "is one labeler systematically more lenient
    than the other?" (marginal homogeneity), which is the question to
    ask before swapping quality gates in a curation pipeline.  Only
    the DISCORDANT cells matter: continuity-corrected
    chi² = (|n10 − n01| − 1)² / (n10 + n01) on 1 df.

    Determinism: n10/n01 are exact BIGINT counts from one scan; the
    corrected numerator greatest(|n10−n01|−1, 0)² stays BIGINT (the
    max(·,0) guard keeps the b = c case at 0, not (−1)² = 1); the 5%
    decision avoids the float boundary entirely —
    10⁶·num ≥ 3841459·(n10+n01) is the exact-integer spelling of
    chi² ≥ 3.841459 (χ²₁,₀.₀₅ to 6 dp).  One final double division for
    the reported statistic.  Single hash aggregate, shuffle-minimal at
    any corpus size."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.size(F.split("text", " ")) >= 60).alias("a"),
        (F.size(F.array_distinct(F.split("text", " "))) >= 28).alias("b"),
    )
    c = d.agg(
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
    )
    guard = F.col("n10") + F.col("n01") > 0
    return c.select(
        "n10",
        "n01",
        F.when(
            guard,
            F.round(
                F.expr(_MCNEMAR_NUM).cast("double")
                / (F.col("n10") + F.col("n01")),
                4,
            ),
        ).alias("chi2_cc"),
        F.when(
            guard,
            F.expr(
                f"1000000 * ({_MCNEMAR_NUM}) >= 3841459 * (n10 + n01)"
            ),
        ).alias("reject_05"),
    )


#: The MCC denominator's four marginal products are quartic in corpus
#: size — DOUBLE from the first multiply (the r7 overflow rule), with
#: the exact BIGINT cells as inputs.
_MCC_DEN = (
    "sqrt(CAST(n11 + n10 AS DOUBLE) * (n11 + n01)"
    " * (n00 + n10) * (n00 + n01))"
)


@query(
    "q_ml_mcc",
    oracle=f"""
    WITH j AS (
        SELECT len(string_split(text, ' ')) >= 60 AS a,
               len(list_distinct(string_split(text, ' '))) >= 28 AS b
        FROM documents
    ),
    c AS (
        SELECT CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
               CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
               CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
               CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
        FROM j
    )
    SELECT n11, n10, n01, n00,
           CAST(n11 * n00 - n10 * n01 AS BIGINT) AS mcc_num,
           CASE WHEN (n11 + n10) * (n11 + n01)
                     * (n00 + n10) * (n00 + n01) > 0
                THEN round(CAST(n11 * n00 - n10 * n01 AS DOUBLE)
                           / {_MCC_DEN}, 4) END AS mcc
    FROM c
    """,
)
def q_ml_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient between the q_ml_kappa judge
    pair (judge A = length gate as "prediction", judge B =
    lexical-richness gate as "truth") — completes the agreement/
    calibration family (κ, McNemar, ECE) with the single-number
    confusion-matrix summary that stays honest under class imbalance
    (accuracy and even κ flatter when one cell dominates; MCC is the
    Pearson φ of the 2×2 table).

    Determinism: four exact BIGINT cells from ONE scan; the numerator
    n11·n00 − n10·n01 stays exact BIGINT (quadratic in corpus size —
    safe to ~3e9 docs); the denominator's quartic marginal product is
    DOUBLE from the first multiply with one sqrt and one division at
    the end (shared-verbatim expression), NULL when a marginal is
    empty (MCC undefined)."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.size(F.split("text", " ")) >= 60).alias("a"),
        (F.size(F.array_distinct(F.split("text", " "))) >= 28).alias("b"),
    )
    c = d.agg(
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    return c.select(
        "n11", "n10", "n01", "n00",
        F.expr("CAST(n11 * n00 - n10 * n01 AS BIGINT)").alias("mcc_num"),
        F.expr(
            "CASE WHEN (n11 + n10) * (n11 + n01)"
            " * (n00 + n10) * (n00 + n01) > 0"
            f" THEN round(CAST(n11 * n00 - n10 * n01 AS DOUBLE)"
            f" / {_MCC_DEN}, 4) END"
        ).alias("mcc"),
    )


@query(
    "q_graph_local_cluster",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v AS node FROM edges)
        GROUP BY node
    ),
    tris AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tcnt AS (
        SELECT node, CAST(count(*) AS BIGINT) AS t
        FROM (SELECT a AS node FROM tris
              UNION ALL SELECT b AS node FROM tris
              UNION ALL SELECT c AS node FROM tris)
        GROUP BY node
    )
    SELECT deg.node, deg.d, CAST(coalesce(tcnt.t, 0) AS BIGINT) AS t,
           CASE WHEN deg.d >= 2
                THEN round(2 * CAST(coalesce(tcnt.t, 0) AS DOUBLE)
                           / (deg.d * (deg.d - 1)), 4) END AS local_cc
    FROM deg LEFT JOIN tcnt USING (node)
    ORDER BY deg.d DESC, deg.node
    LIMIT 10
    """,
)
def q_graph_local_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient for the ten highest-degree
    parts of the co-purchase graph — the node-level companion to
    q_graph_triangles' global coefficient: a hub whose neighborhood is
    dense is a genuine community core, a hub with local_cc ≈ 0 is a
    star (a staple part bought with everything), and the distinction
    drives both recommendation quality and dedup-cluster sanity checks.

    Exact arithmetic: per-node triangle incidence t_v and degree d_v
    are exact BIGINT counts; local_cc = 2t/(d(d−1)) is one final
    double division (NULL below degree 2).  The top-10 has the unique
    (d desc, node) tie-break.

    Scale shape: the Spark plan reuses q_graph_triangles' degree
    orientation — every triangle is enumerated exactly once at its
    lowest-(degree, id) apex, bounding wedge fan-out at O(√E) on
    power-law graphs — then unpivots each triangle to its three
    corners for one keyed count; the oracle uses the naive ordered
    edge³ join (same multiset: each u<v<w triangle appears once in
    both).  TakeOrdered keeps the output k-bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a = baskets.alias("a")
    b = baskets.alias("b")
    # Same reuse structure as q_graph_triangles (deg ×2, oriented,
    # closing tri join, final deg join): materialize the edge list and
    # the oriented list once instead of replaying the basket self-join
    # per reference (88 Exchanges before).
    edges = truncate_lineage(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct(),
        eager=False,
    )
    # r12 kernel (VERDICT r11 #7): same gates and shape as
    # q_graph_triangles — per-node triangle incidence from one numpy
    # pass, the local_cc float expression kept IN SPARK on the exact
    # (node, d, t) ints so both branches share it verbatim.
    ku, kv, _n_edges = collect_edges(edges)
    if ku is not None:
        rows = local_cluster_topk(ku, kv, 10)
        if rows is not None:
            out10 = spark.createDataFrame(rows, "node long, d long, t long")
            return out10.select(
                "node",
                "d",
                "t",
                F.when(
                    F.col("d") >= 2,
                    F.round(
                        2
                        * F.col("t").cast("double")
                        / (F.col("d") * (F.col("d") - 1)),
                        4,
                    ),
                ).alias("local_cc"),
            ).orderBy(F.col("d").desc(), "node")
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = truncate_lineage(
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        ),
        eager=False,
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (F.col("o1.dst") < F.col("o2.dst")),
    ).select(
        F.col("o1.src").alias("apex"),
        F.col("o1.dst").alias("u"),
        F.col("o2.dst").alias("v"),
    )
    tris = wedges.join(edges, ["u", "v"])
    tcnt = (
        tris.select(
            F.explode(F.array("apex", "u", "v")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("t"))
    )
    out = (
        deg.join(tcnt, "node", "left")
        .select(
            "node",
            "d",
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("t"),
            F.when(
                F.col("d") >= 2,
                F.round(
                    2
                    * F.coalesce(F.col("t"), F.lit(0)).cast("double")
                    / (F.col("d") * (F.col("d") - 1)),
                    4,
                ),
            ).alias("local_cc"),
        )
        .orderBy(F.col("d").desc(), "node")
        .limit(10)
    )
    return out


#: SMAPE / MASE fixed-point + cross-multiplied machinery.  With the
#: SMA-3 forecast f = s3/3 over exact daily cents, the per-day SMAPE
#: term 2|f−a|/(f+a) = 2|s3−3a|/(s3+3a) is carried as the exact
#: truncated fixed-point BIGINT (2·10⁶·|s3−3a|) div (s3+3a) — integer
#: division of non-negative BIGINTs agrees between the engines, and
#: summing the truncated terms is order-free (the q_ml_logloss trick).
#: MASE crosses BIGINT range if cross-multiplied (~3e19 at sf0.1), so
#: its final ratio runs in DOUBLE over the four exact sums, shared
#: verbatim.
_MASE_EXPR = (
    "(CAST(sum_fe AS DOUBLE) * n_n) / (3 * CAST(sum_ne AS DOUBLE) * n_f)"
)


@query(
    "q_ml_smape",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT cents,
               lag(cents, 1) OVER (ORDER BY d) AS p1,
               lag(cents, 2) OVER (ORDER BY d) AS p2,
               lag(cents, 3) OVER (ORDER BY d) AS p3
        FROM daily
    ),
    terms AS (
        SELECT CAST(count(CASE WHEN p3 IS NOT NULL THEN 1 END) AS BIGINT)
                   AS n_f,
               CAST(sum(CASE WHEN p3 IS NOT NULL THEN
                   (2000000 * abs(p1 + p2 + p3 - 3 * cents))
                   // (p1 + p2 + p3 + 3 * cents) END) AS BIGINT) AS sum_fp,
               CAST(sum(CASE WHEN p3 IS NOT NULL
                             THEN abs(p1 + p2 + p3 - 3 * cents) END)
                    AS BIGINT) AS sum_fe,
               CAST(count(CASE WHEN p1 IS NOT NULL THEN 1 END) AS BIGINT)
                   AS n_n,
               CAST(sum(CASE WHEN p1 IS NOT NULL
                             THEN abs(cents - p1) END) AS BIGINT) AS sum_ne
        FROM lagged
    )
    SELECT n_f, sum_fp, sum_fe, n_n, sum_ne,
           round(CAST(sum_fp AS DOUBLE) / (n_f * 1000000), 4) AS smape,
           round({_MASE_EXPR}, 4) AS mase
    FROM terms
    """,
)
def q_ml_smape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMAPE + MASE of the 3-day simple-moving-average revenue
    forecast — the two scale-free forecast-accuracy metrics every
    demand-planning eval reports (SMAPE for percentage intuition, MASE
    for the Hyndman–Koehler property of being defined at zero actuals
    and benchmarked against the naive lag-1 forecast).

    Determinism discipline: daily revenue is exact cents; with
    f = (a₁+a₂+a₃)/3, each SMAPE term 2|f−a|/(f+a) = 2|s3−3a|/(s3+3a)
    becomes the exact truncated fixed-point BIGINT
    (2·10⁶·|s3−3a|) div (s3+3a) — the q_ml_logloss floor trick, so the
    cross-row sum is integer and order-free.  MASE = MAE_f/MAE_naive
    cross-multiplies past BIGINT at sf0.1 (~3e19), so the final ratio
    runs in DOUBLE over the four exact BIGINT sums in ONE expression
    shared verbatim (round-6 overflow rule).  The metric is DEFINED at
    1e-6 fixed point — both engines compute the identical integer.

    Scale shape: one date hash-agg (days, not orders, cross the
    shuffle), lag windows over the calendar-bounded daily series, one
    1-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "cents",
        F.lag("cents", 1).over(w).alias("p1"),
        F.lag("cents", 2).over(w).alias("p2"),
        F.lag("cents", 3).over(w).alias("p3"),
    )
    s3 = F.col("p1") + F.col("p2") + F.col("p3")
    has_f = F.col("p3").isNotNull()
    has_n = F.col("p1").isNotNull()
    terms = lagged.agg(
        F.count(F.when(has_f, 1)).cast("long").alias("n_f"),
        F.sum(
            F.when(
                has_f,
                F.expr(
                    "(2000000 * abs(p1 + p2 + p3 - 3 * cents))"
                    " div (p1 + p2 + p3 + 3 * cents)"
                ),
            )
        )
        .cast("long")
        .alias("sum_fp"),
        F.sum(F.when(has_f, F.abs(s3 - 3 * F.col("cents"))))
        .cast("long")
        .alias("sum_fe"),
        F.count(F.when(has_n, 1)).cast("long").alias("n_n"),
        F.sum(F.when(has_n, F.abs(F.col("cents") - F.col("p1"))))
        .cast("long")
        .alias("sum_ne"),
    )
    return terms.select(
        "n_f",
        "sum_fp",
        "sum_fe",
        "n_n",
        "sum_ne",
        F.round(
            F.col("sum_fp").cast("double") / (F.col("n_f") * 1000000), 4
        ).alias("smape"),
        F.round(F.expr(_MASE_EXPR), 4).alias("mase"),
    )


_HILL_K = 100


@query(
    "q_ev_hill",
    oracle=f"""
    WITH v AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc, event_id
        FROM events WHERE event_type = 'purchase' AND value > 0
    ),
    ranked AS (
        SELECT vc,
               CAST(row_number() OVER (ORDER BY vc DESC, event_id)
                    AS BIGINT) AS rn
        FROM v
    ),
    top AS (
        SELECT rn,
               CAST(floor(1000000 * ln(CAST(vc AS DOUBLE))) AS BIGINT)
                   AS ln_fp
        FROM ranked WHERE rn <= {_HILL_K} + 1
    ),
    s AS (
        SELECT CAST(count(CASE WHEN rn <= {_HILL_K} THEN 1 END)
                    AS BIGINT) AS k,
               CAST(sum(CASE WHEN rn <= {_HILL_K} THEN ln_fp END)
                    AS BIGINT) AS sum_ln,
               CAST(max(CASE WHEN rn = {_HILL_K} + 1 THEN ln_fp END)
                    AS BIGINT) AS ln_ref
        FROM top
        HAVING count(*) = {_HILL_K} + 1
    )
    SELECT k, ln_ref,
           CAST(sum_ln - k * ln_ref AS BIGINT) AS h_fp,
           CASE WHEN sum_ln - k * ln_ref > 0 THEN
               round(CAST(sum_ln - k * ln_ref AS DOUBLE)
                     / (k * 1000000), 6)
           END AS hill_h,
           CASE WHEN sum_ln - k * ln_ref > 0 THEN
               round(CAST(k AS DOUBLE) * 1000000
                     / (sum_ln - k * ln_ref), 4)
           END AS tail_alpha
    FROM s
    """,
)
def q_ev_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the purchase-value tail index over the top
    k = 100 order statistics — the ESTIMATOR behind q_ev_powerlaw's
    log₂-histogram diagnostic (the histogram shows heavy-tailedness;
    Hill puts a number α̂ = 1/H on it, H = (1/k)Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎),
    Hill 1975).

    Determinism: the order statistics are cents DESC with the unique
    event_id tie-break; every ln is the floor(10⁶·ln ·) fixed-point
    BIGINT (q_ml_logloss trick), so H_fp = Σln_fp − k·ln_ref is pure
    integer arithmetic; only the two final divisions are float.
    Fewer than k+1 positive purchases (edge corpus) yields zero rows
    via the HAVING gate — never a truncated-tail estimate passed off
    as the real one; a zero H_fp (all top values equal) yields NULL
    estimates with the exact 0 visible.

    Scale shape: the top-(k+1) selection is a TakeOrdered over one
    scan (no global sort materializes); the rank window then runs
    over the k+1 collected rows (k-bounded, allowlisted)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
        "event_id",
    )
    top_rows = v.orderBy(F.col("vc").desc(), "event_id").limit(_HILL_K + 1)
    ranked = top_rows.select(
        "vc",
        F.row_number()
        .over(Window.orderBy(F.col("vc").desc(), "event_id"))
        .cast("long")
        .alias("rn"),
    )
    top = ranked.select(
        "rn",
        F.expr(
            "CAST(floor(1000000 * ln(CAST(vc AS DOUBLE))) AS BIGINT)"
        ).alias("ln_fp"),
    )
    s = (
        top.agg(
            F.count(
                F.when(F.col("rn") <= _HILL_K, 1)
            ).cast("long").alias("k"),
            F.sum(
                F.when(F.col("rn") <= _HILL_K, F.col("ln_fp"))
            ).cast("long").alias("sum_ln"),
            F.max(
                F.when(F.col("rn") == _HILL_K + 1, F.col("ln_fp"))
            ).cast("long").alias("ln_ref"),
            F.count("*").alias("n_all"),
        )
        .where(F.col("n_all") == _HILL_K + 1)
    )
    h_fp = F.col("sum_ln") - F.col("k") * F.col("ln_ref")
    return s.select(
        "k",
        "ln_ref",
        h_fp.cast("long").alias("h_fp"),
        F.when(
            h_fp > 0,
            F.round(h_fp.cast("double") / (F.col("k") * 1000000), 6),
        ).alias("hill_h"),
        F.when(
            h_fp > 0,
            F.round(F.col("k").cast("double") * 1000000 / h_fp, 4),
        ).alias("tail_alpha"),
    )


@query(
    "q_ev_entropy_rate",
    oracle="""
    WITH t AS (
        SELECT prev, event_type AS nxt, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
        WHERE prev IS NOT NULL
        GROUP BY 1, 2
    ),
    rows_ AS (
        SELECT prev, CAST(sum(c) AS BIGINT) AS row_c FROM t GROUP BY 1
    ),
    cells AS (
        SELECT t.prev, t.c, r.row_c,
               CAST(floor(1000000 * ln(CAST(t.c AS DOUBLE) / r.row_c))
                    AS BIGINT) AS ln_fp
        FROM t JOIN rows_ r ON t.prev = r.prev
    ),
    s AS (
        SELECT CAST(sum(c) AS BIGINT) AS total,
               CAST(sum(c * ln_fp) AS BIGINT) AS wsum_fp
        FROM cells
    )
    SELECT total,
           CAST(-wsum_fp AS BIGINT) AS h_fp_weighted,
           round(CAST(-wsum_fp AS DOUBLE) / total / 1000000, 6)
               AS entropy_rate_nats
    FROM s
    """,
)
def q_ev_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the per-user event-type Markov chain:
    H(next | current) = −Σ_ij (c_ij/C)·ln(c_ij/c_i·) — ONE nat-valued
    scalar for "how predictable is the next action", the
    information-theoretic summary of the transition matrix
    q_ev_transitions reports cell by cell (and the quantity that says
    whether q_graph_pagerank's chain is near-deterministic or
    near-uniform).

    Determinism: transition counts are exact BIGINTs over the
    (user, ts, event_id) lag ordering (unique tie-break); each cell's
    ln(c/row) is the floor(10⁶·ln) fixed-point BIGINT, the weighted
    sum Σ c·ln_fp is pure integer arithmetic (order-free), and the
    final scale-out is one division.  Zero-count cells never exist by
    construction (GROUP BY only materializes observed transitions).

    Scale shape: user-partitioned lag window → k² hash agg → k-row
    join → 1-row agg; the chain alphabet (event types) bounds every
    post-agg stage."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # t is consumed twice (row totals + the cells join): truncate so
    # the full lag-window scan runs once; the frame is alphabet²-
    # bounded (≤25 rows).
    t = truncate_lineage(
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev")
        )
        .where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("nxt"))
        .agg(F.count("*").cast("long").alias("c")),
        eager=False,
    )
    rows_ = t.groupBy("prev").agg(F.sum("c").cast("long").alias("row_c"))
    cells = t.join(F.broadcast(rows_), "prev").select(
        "c",
        F.expr(
            "CAST(floor(1000000 * ln(CAST(c AS DOUBLE) / row_c))"
            " AS BIGINT)"
        ).alias("ln_fp"),
    )
    s = cells.agg(
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("ln_fp")).cast("long").alias("wsum_fp"),
    )
    return s.select(
        "total",
        (-F.col("wsum_fp")).cast("long").alias("h_fp_weighted"),
        F.round(
            (-F.col("wsum_fp")).cast("double") / F.col("total") / 1000000,
            6,
        ).alias("entropy_rate_nats"),
    )


@query(
    "q_graph_reciprocity",
    oracle="""
    WITH t AS (
        SELECT prev, event_type AS nxt, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
        WHERE prev IS NOT NULL
        GROUP BY 1, 2
    ),
    offd AS (
        SELECT a.prev, a.nxt, a.c,
               CAST(coalesce(b.c, 0) AS BIGINT) AS c_rev
        FROM t a LEFT JOIN t b ON b.prev = a.nxt AND b.nxt = a.prev
        WHERE a.prev <> a.nxt
    ),
    s AS (
        SELECT CAST(sum(c) AS BIGINT) AS m,
               CAST(sum(least(c, c_rev)) AS BIGINT) AS m_recip
        FROM offd
    )
    SELECT m, m_recip,
           CASE WHEN m > 0 THEN
               round(CAST(m_recip AS DOUBLE) / m, 6) END AS reciprocity
    FROM s
    """,
)
def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reciprocity of the event-type transition digraph:
    what fraction of off-diagonal transition mass flows on edges whose
    REVERSE also carries at least that much — r = Σ min(c_ij, c_ji) /
    Σ c_ij over i≠j (the weighted generalization of digraph
    reciprocity; Squartini et al. 2013).  High r says the behavior
    graph is conversational (view⇄click loops); low r says it is a
    one-way funnel — the single scalar that complements
    q_ev_entropy_rate's predictability with DIRECTIONALITY.

    Determinism: transition counts are exact BIGINTs over the unique
    (user, ts, event_id) lag order; min/sum are integer; the one float
    is the final division.  Self-loops are excluded by definition
    (stated); a loop-only graph yields NULL with the exact zero pair.

    Scale shape: user-partitioned lag window → k² hash agg → k²-row
    self-join (alphabet-bounded) → 1-row agg."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # t is consumed twice (forward side and its transpose b): without
    # truncation the full lag-window scan replays per reference.  The
    # frame is alphabet²-bounded (≤25 rows) — a free materialization.
    t = truncate_lineage(
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev")
        )
        .where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("nxt"))
        .agg(F.count("*").cast("long").alias("c")),
        eager=False,
    )
    b = t.select(
        F.col("nxt").alias("prev"),
        F.col("prev").alias("nxt"),
        F.col("c").alias("c_rev"),
    )
    offd = (
        t.join(F.broadcast(b), ["prev", "nxt"], "left")
        .where(F.col("prev") != F.col("nxt"))
        .select("c", F.coalesce(F.col("c_rev"), F.lit(0)).alias("c_rev"))
    )
    s = offd.agg(
        F.sum("c").cast("long").alias("m"),
        F.sum(F.least(F.col("c"), F.col("c_rev")))
        .cast("long")
        .alias("m_recip"),
    )
    return s.select(
        "m",
        "m_recip",
        F.when(
            F.col("m") > 0,
            F.round(F.col("m_recip").cast("double") / F.col("m"), 6),
        ).alias("reciprocity"),
    )


@query(
    "q_ord_newsvendor",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    ranked AS (
        SELECT day, c,
               CAST(row_number() OVER (ORDER BY c, day) AS BIGINT) AS rn
        FROM d
    ),
    sstar AS (
        SELECT min(c) AS s FROM ranked CROSS JOIN t
        WHERE 10 * rn >= 9 * n
    ),
    cost AS (
        SELECT CAST(sum(greatest(s.s - d.c, 0)) AS BIGINT)
                   AS overage_units,
               CAST(sum(greatest(d.c - s.s, 0)) AS BIGINT)
                   AS underage_units
        FROM d CROSS JOIN sstar s
    )
    SELECT t.n AS n_days, s.s AS s_star,
           c.overage_units, c.underage_units,
           CAST(1 * c.overage_units + 9 * c.underage_units AS BIGINT)
               AS total_cost_units
    FROM t CROSS JOIN sstar s CROSS JOIN cost c
    """,
)
def q_ord_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking level at the 0.9 critical fractile
    (cu = 9, co = 1 — underage costs 9× overage): S* =
    inf{s : F̂(s) ≥ 0.9} over the empirical daily purchase-demand
    distribution, plus the realized overage/underage cost of running
    S* against the observed history — the classic single-period
    inventory answer q_ord_eoq (order QUANTITY) and q_ord_reorder_gap
    (order TIMING) don't give.

    Determinism: S* is an exact lower order statistic — the smallest
    demand whose (c, day)-tie-broken rank satisfies the integer
    cross-multiplication 10·rank ≥ 9·n (no fractional quantile ever
    materializes — the q_agg_percentile_disc convention); cost units
    are exact BIGINT sums.

    Scale shape: one keyed date aggregate (calendar-bounded), a
    ~30-row rank window (allowlisted), broadcast scalars, one
    re-aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    t = d.agg(F.count("*").cast("long").alias("n"))
    ranked = d.select(
        "day",
        "c",
        F.row_number()
        .over(Window.orderBy("c", "day"))
        .cast("long")
        .alias("rn"),
    )
    sstar = (
        ranked.crossJoin(F.broadcast(t))
        .where(10 * F.col("rn") >= 9 * F.col("n"))
        .agg(F.min("c").alias("s"))
    )
    cost = d.crossJoin(F.broadcast(sstar)).agg(
        F.sum(F.greatest(F.col("s") - F.col("c"), F.lit(0)))
        .cast("long")
        .alias("overage_units"),
        F.sum(F.greatest(F.col("c") - F.col("s"), F.lit(0)))
        .cast("long")
        .alias("underage_units"),
    )
    return (
        t.crossJoin(F.broadcast(sstar))
        .crossJoin(F.broadcast(cost))
        .select(
            F.col("n").alias("n_days"),
            F.col("s").alias("s_star"),
            "overage_units",
            "underage_units",
            (1 * F.col("overage_units") + 9 * F.col("underage_units"))
            .cast("long")
            .alias("total_cost_units"),
        )
    )


#: Fleiss-kappa algebra over the exact (n, r_sum, s_agree) integers,
#: shared VERBATIM by both engines (quadratic-in-corpus products stay
#: in DOUBLE per the overflow rule): po = S/(6n), pe = (R² +
#: (3n−R)²)/(9n²), κ = (po − pe)/(1 − pe).
_FLEISS_PO = "CAST(s_agree AS DOUBLE) / (6 * n)"
_FLEISS_PE = (
    "(CAST(r_sum AS DOUBLE) * r_sum"
    " + CAST(3 * n - r_sum AS DOUBLE) * (3 * n - r_sum))"
    " / (CAST(9 AS DOUBLE) * n * n)"
)


@query(
    "q_stat_fleiss",
    oracle=f"""
    WITH j AS (
        SELECT (CASE WHEN len(string_split(text, ' ')) >= 60
                     THEN 1 ELSE 0 END)
             + (CASE WHEN len(list_distinct(string_split(text, ' '))) >= 28
                     THEN 1 ELSE 0 END)
             + (CASE WHEN n_chars >= 320 THEN 1 ELSE 0 END) AS r
        FROM documents
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(r) AS BIGINT) AS r_sum,
               CAST(sum(r * (r - 1) + (3 - r) * (2 - r)) AS BIGINT)
                   AS s_agree
        FROM j
    )
    SELECT n, r_sum, s_agree,
           round({_FLEISS_PO}, 4) AS p_bar,
           round({_FLEISS_PE}, 4) AS pe_bar,
           round(({_FLEISS_PO} - ({_FLEISS_PE}))
                 / (1 - ({_FLEISS_PE})), 4) AS fleiss_kappa
    FROM c
    """,
)
def q_stat_fleiss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for THREE document-quality judges (the m-rater
    generalization of q_ml_kappa's two-judge Cohen form): judge A =
    length gate (≥ 60 tokens), judge B = lexical richness (≥ 28
    distinct), judge C = size gate (n_chars ≥ 320).  With binary
    categories and m = 3 raters, per-item agreement P_i =
    (r(r−1) + (3−r)(2−r))/6 where r = positive votes, so the whole
    statistic reduces to three exact BIGINTs from ONE scan: n, R =
    Σr, S = Σ r(r−1)+(3−r)(2−r).

    Determinism: P̄ = S/(6n), P̄e = (R² + (3n−R)²)/(9n²), κ =
    (P̄−P̄e)/(1−P̄e) — all evaluated in DOUBLE via module-level
    expression strings shared verbatim by both engines (the marginal
    squares are quadratic in corpus size — the overflow rule keeps
    them out of BIGINT)."""
    d = load_table(spark, sf_dir, "documents").select(
        (
            F.when(F.size(F.split("text", " ")) >= 60, 1)
            .otherwise(0)
            + F.when(
                F.size(F.array_distinct(F.split("text", " "))) >= 28, 1
            ).otherwise(0)
            + F.when(F.col("n_chars") >= 320, 1).otherwise(0)
        ).alias("r")
    )
    c = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r").cast("long").alias("r_sum"),
        F.sum(
            F.col("r") * (F.col("r") - 1)
            + (3 - F.col("r")) * (2 - F.col("r"))
        )
        .cast("long")
        .alias("s_agree"),
    )
    return c.select(
        "n",
        "r_sum",
        "s_agree",
        F.round(F.expr(_FLEISS_PO), 4).alias("p_bar"),
        F.round(F.expr(_FLEISS_PE), 4).alias("pe_bar"),
        F.round(
            F.expr(
                f"({_FLEISS_PO} - ({_FLEISS_PE})) / (1 - ({_FLEISS_PE}))"
            ),
            4,
        ).alias("fleiss_kappa"),
    )


#: ICC(2,1) mean-square algebra over the exact integer aggregates
#: (n items × k=3 raters; T = grand sum, q = Σ cell², sr = Σ row-sum²,
#: sc = Σ col-sum² — all BIGINT-exact), shared verbatim: the sums of
#: squares divide by n·k only inside DOUBLE.
_ICC_MSR = (
    "(CAST(sr AS DOUBLE) / 3 - CAST(t AS DOUBLE) * t / (3 * n))"
    " / (n - 1)"
)
_ICC_MSC = (
    "(CAST(sc AS DOUBLE) / n - CAST(t AS DOUBLE) * t / (3 * n)) / 2"
)
_ICC_MSE = (
    "(CAST(q AS DOUBLE) - CAST(sr AS DOUBLE) / 3"
    " - CAST(sc AS DOUBLE) / n + CAST(t AS DOUBLE) * t / (3 * n))"
    " / ((n - 1) * 2)"
)


@query(
    "q_stat_icc",
    oracle=f"""
    WITH j AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
               CAST(2 * len(list_distinct(string_split(text, ' ')))
                    AS BIGINT) AS x2,
               CAST((n_chars + 3) // 4 AS BIGINT) AS x3
        FROM documents
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1 + x2 + x3) AS BIGINT) AS t,
               CAST(sum(x1 * x1 + x2 * x2 + x3 * x3) AS BIGINT) AS q,
               CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT)
                   AS sr,
               CAST(sum(x1) * sum(x1) + sum(x2) * sum(x2)
                    + sum(x3) * sum(x3) AS BIGINT) AS sc
        FROM j
    )
    SELECT n, t, q, sr, sc,
           round({_ICC_MSR}, 4) AS msr,
           round({_ICC_MSC}, 4) AS msc,
           round({_ICC_MSE}, 4) AS mse,
           round((({_ICC_MSR}) - ({_ICC_MSE}))
                 / (({_ICC_MSR}) + 2 * ({_ICC_MSE})
                    + 3 * (({_ICC_MSC}) - ({_ICC_MSE})) / n), 4)
               AS icc21
    FROM c
    """,
)
def q_stat_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(2,1) — intraclass correlation, two-way random effects,
    single measures (Shrout & Fleiss) — for three NUMERIC document
    raters: x1 = token count, x2 = 2× distinct-token count, x3 =
    quarter-character count (integer scores on comparable scales).
    The reliability statistic a labeling pipeline reports when raters
    give scores rather than classes (q_stat_fleiss's continuous
    sibling).

    Determinism: every sum of squares is assembled from five exact
    BIGINTs out of ONE scan (n, grand total T, Σcell², Σrow-sum²,
    Σcol-sum²); MSR/MSC/MSE and ICC(2,1) = (MSR−MSE)/(MSR + (k−1)MSE
    + k(MSC−MSE)/n) are DOUBLE expressions shared verbatim by both
    engines (T² and the sum-squares are quadratic in corpus size —
    overflow rule).  The k = 3 rater dimension is a fixed literal
    throughout."""
    d = load_table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("long").alias("x1"),
        (2 * F.size(F.array_distinct(F.split("text", " "))))
        .cast("long")
        .alias("x2"),
        F.floor((F.col("n_chars") + 3) / 4).cast("long").alias("x3"),
    )
    c = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x1") + F.col("x2") + F.col("x3"))
        .cast("long")
        .alias("t"),
        F.sum(
            F.col("x1") * F.col("x1")
            + F.col("x2") * F.col("x2")
            + F.col("x3") * F.col("x3")
        )
        .cast("long")
        .alias("q"),
        F.sum(
            (F.col("x1") + F.col("x2") + F.col("x3"))
            * (F.col("x1") + F.col("x2") + F.col("x3"))
        )
        .cast("long")
        .alias("sr"),
        (
            F.sum("x1") * F.sum("x1")
            + F.sum("x2") * F.sum("x2")
            + F.sum("x3") * F.sum("x3")
        )
        .cast("long")
        .alias("sc"),
    )
    return c.select(
        "n",
        "t",
        "q",
        "sr",
        "sc",
        F.round(F.expr(_ICC_MSR), 4).alias("msr"),
        F.round(F.expr(_ICC_MSC), 4).alias("msc"),
        F.round(F.expr(_ICC_MSE), 4).alias("mse"),
        F.round(
            F.expr(
                f"(({_ICC_MSR}) - ({_ICC_MSE}))"
                f" / (({_ICC_MSR}) + 2 * ({_ICC_MSE})"
                f" + 3 * (({_ICC_MSC}) - ({_ICC_MSE})) / n)"
            ),
            4,
        ).alias("icc21"),
    )


@query(
    "q_ml_balacc",
    oracle="""
    WITH j AS (
        SELECT len(string_split(text, ' ')) >= 60 AS a,
               len(list_distinct(string_split(text, ' '))) >= 28 AS b
        FROM documents
    ),
    c AS (
        SELECT CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
                   AS tp,
               CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn,
               CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn
        FROM j
    )
    SELECT tp, fp, fn, tn,
           round((CAST(tp AS DOUBLE) / (tp + fn)
                  + CAST(tn AS DOUBLE) / (tn + fp)) / 2, 4)
               AS balanced_accuracy,
           round(CAST(5 * tp AS DOUBLE) / (5 * tp + 4 * fn + fp), 4)
               AS f2,
           round(CAST(5 * tp AS DOUBLE) / (5 * tp + fn + 4 * fp), 4)
               AS f05
    FROM c
    """,
)
def q_ml_balacc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced accuracy + F-beta pair (beta = 2 and 0.5) for the
    q_ml_kappa judge confusion (judge A = prediction, judge B =
    truth) — the imbalance-robust scalar trio between plain accuracy
    and q_ml_mcc: balanced accuracy = (TPR+TNR)/2, F2 weights recall
    4x over precision (the screening regime), F0.5 the reverse (the
    precision regime).

    Exactness: all four cells are exact BIGINTs from ONE scan; both
    F-betas clear their fractional beta² by cross-multiplying to
    integers — F2 = 5·TP/(5TP+4FN+FP), F0.5 = 5·TP/(5TP+FN+4FP) (the
    x4 multiplied through (1+beta²)) — so every metric is ONE final
    division of exact integers."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.size(F.split("text", " ")) >= 60).alias("a"),
        (F.size(F.array_distinct(F.split("text", " "))) >= 28).alias("b"),
    )
    c = d.agg(
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            (
                F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
                + F.col("tn").cast("double") / (F.col("tn") + F.col("fp"))
            )
            / 2,
            4,
        ).alias("balanced_accuracy"),
        F.round(
            (5 * F.col("tp")).cast("double")
            / (5 * F.col("tp") + 4 * F.col("fn") + F.col("fp")),
            4,
        ).alias("f2"),
        F.round(
            (5 * F.col("tp")).cast("double")
            / (5 * F.col("tp") + F.col("fn") + 4 * F.col("fp")),
            4,
        ).alias("f05"),
    )


@query(
    "q_ord_croston",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events
        WHERE event_type = 'purchase' AND value > 95
        GROUP BY 1
    ),
    idx AS (
        SELECT day, x,
               row_number() OVER (ORDER BY day) AS t,
               count(*) OVER () AS n,
               date_diff('day', lag(day) OVER (ORDER BY day), day) AS q
        FROM d
    ),
    terms AS (
        SELECT t, n,
               CASE WHEN t = 1 THEN x / power(2e0, n - 1)
                    ELSE x / power(2e0, n - t + 1) END AS zterm,
               CASE WHEN t = 1 THEN NULL
                    WHEN t = 2 THEN q / power(2e0, n - 2)
                    ELSE q / power(2e0, n - t + 1) END AS qterm
        FROM idx
    ),
    cum AS (
        SELECT t, n,
               sum(zterm) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   AS z_hat,
               sum(qterm) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   AS p_hat
        FROM terms
    )
    SELECT CAST(n AS BIGINT) AS n_demand_days,
           round(z_hat / 100e0, 4) AS z_hat,
           round(p_hat, 4) AS p_hat,
           CASE WHEN p_hat > 0
                THEN round(z_hat / p_hat / 100e0, 4) END
               AS croston_forecast
    FROM cum WHERE t = n
    """,
)
def q_ord_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand (alpha = 1/2) on
    daily high-ticket purchase revenue (value > 95): smooth the
    nonzero demand SIZES and the inter-demand INTERVALS separately
    with exponential smoothing, forecast = size / interval — the
    estimator that doesn't bias toward zero the way plain SES does on
    a sparse series (Croston 1972).

    Determinism: with alpha = 1/2 and s_1 = x_1 the EWMA unrolls to
    the closed dyadic form s_T = x_1/2^(T-1) + Σ x_t/2^(T-t+1) —
    every term is an exact power-of-two quotient of exact integers
    (cents / calendar days), and the engines accumulate them through
    the ORDERED occurrence-index prefix (identical addition order →
    bit-identical even where a 52-bit mantissa would round).  The
    first interval (undefined) seeds the interval series at the
    second occurrence; a single-occurrence series yields NULL
    forecast through the guard, never a division error.

    Scale: one keyed date aggregate; the fold lives on the
    calendar-bounded demand-day series (allowlisted windows)."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 95))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    w = Window.orderBy("day")
    n0 = d.agg(F.count("*").cast("long").alias("n"))
    idx = d.crossJoin(F.broadcast(n0)).select(
        "x",
        "n",
        F.row_number().over(w).cast("long").alias("t"),
        F.datediff(F.col("day"), F.lag("day").over(w)).alias("q"),
    )
    zterm = F.when(
        F.col("t") == 1, F.col("x") / F.pow(F.lit(2.0), F.col("n") - 1)
    ).otherwise(
        F.col("x") / F.pow(F.lit(2.0), F.col("n") - F.col("t") + 1)
    )
    qterm = (
        F.when(F.col("t") == 1, F.lit(None).cast("double"))
        .when(
            F.col("t") == 2,
            F.col("q") / F.pow(F.lit(2.0), F.col("n") - 2),
        )
        .otherwise(
            F.col("q") / F.pow(F.lit(2.0), F.col("n") - F.col("t") + 1)
        )
    )
    terms = idx.select(
        "t", "n", zterm.alias("zterm"), qterm.alias("qterm")
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = terms.select(
        "t",
        "n",
        F.sum("zterm").over(w_cum).alias("z_hat"),
        F.sum("qterm").over(w_cum).alias("p_hat"),
    )
    return cum.where(F.col("t") == F.col("n")).select(
        F.col("n").alias("n_demand_days"),
        F.round(F.col("z_hat") / 100.0, 4).alias("z_hat"),
        F.round(F.col("p_hat"), 4).alias("p_hat"),
        F.when(
            F.col("p_hat") > 0,
            F.round(F.col("z_hat") / F.col("p_hat") / 100.0, 4),
        ).alias("croston_forecast"),
    )


@query(
    "q_ev_spc",
    oracle="""
    WITH p AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ),
    sub AS (
        SELECT day,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(max(cents) - min(cents) AS BIGINT) AS r
        FROM p WHERE rn <= 5
        GROUP BY day HAVING count(*) = 5
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(s) AS BIGINT) AS ss,
               CAST(sum(r) AS BIGINT) AS sr
        FROM sub
    )
    SELECT CAST(day AS VARCHAR) AS day, s AS s_cents, r AS r_cents,
           round(CAST(s AS DOUBLE) / 500, 4) AS xbar,
           round(CAST(ss AS DOUBLE) / (500 * k), 4) AS center,
           CAST(1000 * (k * s - ss) > 2885 * sr AS BOOLEAN)
               AS above_ucl,
           CAST(1000 * (ss - k * s) > 2885 * sr AS BOOLEAN)
               AS below_lcl,
           CAST(1000 * k * r > 2114 * sr AS BOOLEAN) AS range_oot
    FROM sub CROSS JOIN tot
    """,
)
def q_ev_spc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X-bar/R control chart over daily purchase subgroups
    (n = 5: the first five purchases of each day by event order —
    fixed subgroup size so the standard chart constants apply):
    per-day subgroup mean and range against the A2/D4 limits
    X-bar ± A2·R-bar and D4·R-bar (A2 = 0.577, D4 = 2.114, D3 = 0
    for n = 5) — the process-control surface an ops team runs on a
    metric stream.

    Determinism: every control decision is an exact-integer
    cross-multiplication — x-bar_i > X-bar + A2·R-bar becomes
    1000·(k·s_i − ΣS) > 5·577·ΣR with s_i the exact subgroup cent
    sum, and the range test 1000·k·r_i > 2114·ΣR — so no float ever
    decides a flag; the displayed means are single final divisions.
    The chart constants are exact rational literals (577/1000,
    2114/1000).

    Scale: the subgroup pick is a per-day partitioned row_number
    (never global); everything after lives on the calendar-bounded
    day table."""
    ev = load_table(spark, sf_dir, "events")
    w_day = Window.partitionBy(F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.to_date("ts").alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.row_number().over(w_day).alias("rn"),
    )
    sub = (
        p.where(F.col("rn") <= 5)
        .groupBy("day")
        .agg(
            F.sum("cents").cast("long").alias("s"),
            (F.max("cents") - F.min("cents")).cast("long").alias("r"),
            F.count("*").alias("cnt"),
        )
        .where(F.col("cnt") == 5)
        .drop("cnt")
    )
    tot = sub.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("s").cast("long").alias("ss"),
        F.sum("r").cast("long").alias("sr"),
    )
    j = sub.crossJoin(F.broadcast(tot))
    return j.select(
        F.col("day").cast("string").alias("day"),
        F.col("s").alias("s_cents"),
        F.col("r").alias("r_cents"),
        F.round(F.col("s").cast("double") / 500, 4).alias("xbar"),
        F.round(
            F.col("ss").cast("double") / (500 * F.col("k")), 4
        ).alias("center"),
        (
            1000 * (F.col("k") * F.col("s") - F.col("ss"))
            > 2885 * F.col("sr")
        ).alias("above_ucl"),
        (
            1000 * (F.col("ss") - F.col("k") * F.col("s"))
            > 2885 * F.col("sr")
        ).alias("below_lcl"),
        (1000 * F.col("k") * F.col("r") > 2114 * F.col("sr")).alias(
            "range_oot"
        ),
    )


@query(
    "q_ord_fullfill",
    oracle="""
    WITH lines AS (
        SELECT l_orderkey, o_orderpriority,
               CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) <= 30
                    THEN 1 ELSE 0 END AS ontime
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    ord AS (
        SELECT l_orderkey, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(min(ontime) AS BIGINT) AS full_ontime
        FROM lines GROUP BY l_orderkey, o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(full_ontime) AS BIGINT) AS n_fullfill,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           round(CAST(sum(full_ontime) AS DOUBLE) / count(*), 4)
               AS fullfill_rate
    FROM ord
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_ord_fullfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-level full-fill rate by order priority: an order counts
    only if EVERY line shipped within 30 days of the order date —
    the order-level strictening of q_ord_otif's line-level 30-day
    service level (one late line fails the whole order here; a
    customer experiences orders, not lines).

    Exactness: the full-order flag is min(ontime) over exact 0/1
    line flags (whole-day DATE arithmetic); per-priority counts are
    BIGINTs and the rate is one final division.

    Scale: one fact join (orders dimension broadcast), one
    order-keyed aggregate (map-side combinable), then a 5-row
    priority aggregate — the fact table is touched once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lines = li.join(
        F.broadcast(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "o_orderpriority",
        F.when(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30,
            1,
        )
        .otherwise(0)
        .alias("ontime"),
    )
    ord_flags = lines.groupBy("l_orderkey", "o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.min("ontime").cast("long").alias("full_ontime"),
    )
    return (
        ord_flags.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("full_ontime").cast("long").alias("n_fullfill"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.round(
                F.sum("full_ontime").cast("double") / F.count("*"), 4
            ).alias("fullfill_rate"),
        )
        .orderBy("o_orderpriority")
    )



@query(
    "q_stat_stuart_maxwell",
    oracle="""
    WITH j AS (
        SELECT CASE WHEN len(string_split(text, ' ')) < 50 THEN 0
                    WHEN len(string_split(text, ' ')) < 80 THEN 1
                    ELSE 2 END AS a,
               CASE WHEN n_chars < 250 THEN 0
                    WHEN n_chars < 400 THEN 1
                    ELSE 2 END AS b
        FROM documents
    ),
    cells AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS c
        FROM j GROUP BY a, b
    ),
    m AS (
        SELECT
            CAST(coalesce(sum(CASE WHEN a = 0 THEN c END), 0)
                 - coalesce(sum(CASE WHEN b = 0 THEN c END), 0)
                 AS BIGINT) AS d1,
            CAST(coalesce(sum(CASE WHEN a = 1 THEN c END), 0)
                 - coalesce(sum(CASE WHEN b = 1 THEN c END), 0)
                 AS BIGINT) AS d2,
            CAST(coalesce(sum(CASE WHEN a = 2 THEN c END), 0)
                 - coalesce(sum(CASE WHEN b = 2 THEN c END), 0)
                 AS BIGINT) AS d3,
            CAST(coalesce(sum(CASE WHEN (a = 0 AND b = 1)
                                     OR (a = 1 AND b = 0) THEN c END), 0)
                 AS BIGINT) AS m12,
            CAST(coalesce(sum(CASE WHEN (a = 0 AND b = 2)
                                     OR (a = 2 AND b = 0) THEN c END), 0)
                 AS BIGINT) AS m13,
            CAST(coalesce(sum(CASE WHEN (a = 1 AND b = 2)
                                     OR (a = 2 AND b = 1) THEN c END), 0)
                 AS BIGINT) AS m23
        FROM cells
    )
    SELECT d1, d2, d3, m12, m13, m23,
           CAST(m23 * d1 * d1 + m13 * d2 * d2 + m12 * d3 * d3
                AS BIGINT) AS chi2_num,
           CAST(m12 * m13 + m12 * m23 + m13 * m23 AS BIGINT)
               AS chi2_den,
           round(CAST(m23 * d1 * d1 + m13 * d2 * d2 + m12 * d3 * d3
                      AS DOUBLE)
                 / (m12 * m13 + m12 * m23 + m13 * m23), 4) AS chi2,
           CAST(1000000 * (m23 * d1 * d1 + m13 * d2 * d2
                           + m12 * d3 * d3)
                >= 5991464 * (m12 * m13 + m12 * m23 + m13 * m23)
                AS BOOLEAN) AS reject_05
    FROM m
    """,
)
def q_stat_stuart_maxwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuart–Maxwell test of marginal homogeneity for two
    THREE-category document judges (size band by token count vs size
    band by character count) — the k×k generalization of q_ml_mcnemar
    (which only handles 2×2): do the two banding rules assign the
    same marginal distribution, using only the discordant cells?

    For k = 3 the statistic has the closed form χ² = (n̄₂₃d₁² +
    n̄₁₃d₂² + n̄₁₂d₃²) / (2·Σ n̄ᵢⱼn̄ᵢ'ⱼ') which, with DOUBLED
    off-diagonal means mᵢⱼ = nᵢⱼ + nⱼᵢ, clears every fraction:
    χ² = (m₂₃d₁² + m₁₃d₂² + m₁₂d₃²)/(m₁₂m₁₃ + m₁₂m₂₃ + m₁₃m₂₃) —
    numerator and denominator are exact BIGINTs from the nine
    contingency cells (ONE scan), the χ² one final division, and the
    5% decision the integer cross-multiplication 10⁶·num ≥
    5991464·den (χ²crit(df=2) floored at 10⁶)."""
    d = load_table(spark, sf_dir, "documents").select(
        F.when(F.size(F.split("text", " ")) < 50, 0)
        .when(F.size(F.split("text", " ")) < 80, 1)
        .otherwise(2)
        .alias("a"),
        F.when(F.col("n_chars") < 250, 0)
        .when(F.col("n_chars") < 400, 1)
        .otherwise(2)
        .alias("b"),
    )
    cells = d.groupBy("a", "b").agg(F.count("*").cast("long").alias("c"))

    def _marg(side: str, v: int):
        return F.coalesce(
            F.sum(F.when(F.col(side) == v, F.col("c"))), F.lit(0)
        ).cast("long")

    def _pair(i: int, k: int):
        return F.coalesce(
            F.sum(
                F.when(
                    ((F.col("a") == i) & (F.col("b") == k))
                    | ((F.col("a") == k) & (F.col("b") == i)),
                    F.col("c"),
                )
            ),
            F.lit(0),
        ).cast("long")

    m = cells.agg(
        (_marg("a", 0) - _marg("b", 0)).alias("d1"),
        (_marg("a", 1) - _marg("b", 1)).alias("d2"),
        (_marg("a", 2) - _marg("b", 2)).alias("d3"),
        _pair(0, 1).alias("m12"),
        _pair(0, 2).alias("m13"),
        _pair(1, 2).alias("m23"),
    )
    num = (
        F.col("m23") * F.col("d1") * F.col("d1")
        + F.col("m13") * F.col("d2") * F.col("d2")
        + F.col("m12") * F.col("d3") * F.col("d3")
    )
    den = (
        F.col("m12") * F.col("m13")
        + F.col("m12") * F.col("m23")
        + F.col("m13") * F.col("m23")
    )
    return m.select(
        "d1",
        "d2",
        "d3",
        "m12",
        "m13",
        "m23",
        num.cast("long").alias("chi2_num"),
        den.cast("long").alias("chi2_den"),
        F.round(num.cast("double") / den, 4).alias("chi2"),
        (
            F.lit(1000000).cast("long") * num
            >= F.lit(5991464).cast("long") * den
        ).alias("reject_05"),
    )


#: Cramer's-rule determinants for the Bass OLS normal equations over
#: the exact BIGINT moments (S0..S4, T0..T2), shared VERBATIM — the
#: moment products are quartic-in-scale, so ALL determinant algebra
#: stays in DOUBLE (overflow rule).
_BASS_D = {
    "det": (
        "(CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * s4"
        " - CAST(s3 AS DOUBLE) * s3)"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s4"
        " - CAST(s3 AS DOUBLE) * s2)"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s3"
        " - CAST(s2 AS DOUBLE) * s2))"
    ),
    "deta": (
        "(CAST(t0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * s4"
        " - CAST(s3 AS DOUBLE) * s3)"
        " - CAST(s1 AS DOUBLE) * (CAST(t1 AS DOUBLE) * s4"
        " - CAST(s3 AS DOUBLE) * t2)"
        " + CAST(s2 AS DOUBLE) * (CAST(t1 AS DOUBLE) * s3"
        " - CAST(s2 AS DOUBLE) * t2))"
    ),
    "detb": (
        "(CAST(s0 AS DOUBLE) * (CAST(t1 AS DOUBLE) * s4"
        " - CAST(s3 AS DOUBLE) * t2)"
        " - CAST(t0 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s4"
        " - CAST(s3 AS DOUBLE) * s2)"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * t2"
        " - CAST(t1 AS DOUBLE) * s2))"
    ),
    "detc": (
        "(CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * t2"
        " - CAST(t1 AS DOUBLE) * s3)"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * t2"
        " - CAST(t1 AS DOUBLE) * s2)"
        " + CAST(t0 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s3"
        " - CAST(s2 AS DOUBLE) * s2))"
    ),
}
_BASS_A = f"({_BASS_D['deta']} / {_BASS_D['det']})"
_BASS_B = f"({_BASS_D['detb']} / {_BASS_D['det']})"
_BASS_C = f"({_BASS_D['detc']} / {_BASS_D['det']})"
_BASS_DISC = f"({_BASS_B} * {_BASS_B} - 4 * {_BASS_A} * {_BASS_C})"
_BASS_M = f"((-{_BASS_B} - sqrt({_BASS_DISC})) / (2 * {_BASS_C}))"


@query(
    "q_ev_bass",
    oracle=f"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'signup'
        GROUP BY 1
    ),
    cum AS (
        SELECT day, y,
               CAST(coalesce(sum(y) OVER (
                   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS np
        FROM d
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS s0,
               CAST(sum(np) AS BIGINT) AS s1,
               CAST(sum(np * np) AS BIGINT) AS s2,
               CAST(sum(np * np * np) AS BIGINT) AS s3,
               CAST(sum(np * np * np * np) AS BIGINT) AS s4,
               CAST(sum(y) AS BIGINT) AS t0,
               CAST(sum(y * np) AS BIGINT) AS t1,
               CAST(sum(y * np * np) AS BIGINT) AS t2
        FROM cum
    )
    SELECT s0 AS n_days, t0 AS n_adopters,
           round({_BASS_A}, 6) AS coef_a,
           round({_BASS_B}, 6) AS coef_b,
           round({_BASS_C}, 10) AS coef_c,
           CASE WHEN {_BASS_D['det']} <> 0 AND {_BASS_C} < 0
                     AND {_BASS_DISC} >= 0 THEN
               round({_BASS_M}, 2) END AS m_hat,
           CASE WHEN {_BASS_D['det']} <> 0 AND {_BASS_C} < 0
                     AND {_BASS_DISC} >= 0 AND {_BASS_M} > 0 THEN
               round({_BASS_A} / {_BASS_M}, 6) END AS p_hat,
           CASE WHEN {_BASS_D['det']} <> 0 AND {_BASS_C} < 0
                     AND {_BASS_DISC} >= 0 AND {_BASS_M} > 0 THEN
               round(-({_BASS_C}) * {_BASS_M}, 6) END AS q_hat
    FROM m
    """,
)
def q_ev_bass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion model fit for daily signups via the discrete
    OLS linearization (Bass 1969): n_t = pM + (q−p)N_{{t−1}} −
    (q/M)N²_{{t−1}}, i.e. regress daily adopters on [1, N, N²] and
    recover (M, p, q) from the coefficients — the
    innovation/imitation decomposition + market-size forecast a
    growth team fits on an adoption curve (M̂ answers "how big does
    this get", q/p "is it word-of-mouth driven").

    Determinism: the eight regression moments (up to ΣN⁴, ΣyN²) are
    exact BIGINTs off the exclusive cumulative-adopter prefix (safe
    to ~2e4 cumulative adopters in BIGINT at ΣN⁴; beyond that the
    moments move to DECIMAL(38,0)); the 3×3 normal equations are
    solved by Cramer's rule with ALL determinant algebra in DOUBLE
    via module-level expression strings shared verbatim (quartic
    products — overflow rule).  M̂ = (−b−√(b²−4ac))/(2c) takes the
    economically meaningful root (c < 0 for a diffusion curve);
    degenerate fits (singular system, c ≥ 0, negative discriminant)
    yield NULL estimates through exact guards, never an error.

    Scale: one keyed date aggregate; the prefix and the 1-row moment
    pivot live on the calendar-bounded day series (allowlisted)."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "signup")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    w_prev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = d.select(
        "y",
        F.coalesce(F.sum("y").over(w_prev), F.lit(0))
        .cast("long")
        .alias("np"),
    )
    m = cum.agg(
        F.count("*").cast("long").alias("s0"),
        F.sum("np").cast("long").alias("s1"),
        F.sum(F.col("np") * F.col("np")).cast("long").alias("s2"),
        F.sum(F.col("np") * F.col("np") * F.col("np"))
        .cast("long")
        .alias("s3"),
        F.sum(
            F.col("np") * F.col("np") * F.col("np") * F.col("np")
        )
        .cast("long")
        .alias("s4"),
        F.sum("y").cast("long").alias("t0"),
        F.sum(F.col("y") * F.col("np")).cast("long").alias("t1"),
        F.sum(F.col("y") * F.col("np") * F.col("np"))
        .cast("long")
        .alias("t2"),
    )
    guard = (
        f"{_BASS_D['det']} <> 0 AND {_BASS_C} < 0"
        f" AND {_BASS_DISC} >= 0"
    )
    return m.select(
        F.col("s0").alias("n_days"),
        F.col("t0").alias("n_adopters"),
        F.expr(f"round({_BASS_A}, 6)").alias("coef_a"),
        F.expr(f"round({_BASS_B}, 6)").alias("coef_b"),
        F.expr(f"round({_BASS_C}, 10)").alias("coef_c"),
        F.expr(
            f"CASE WHEN {guard} THEN round({_BASS_M}, 2) END"
        ).alias("m_hat"),
        F.expr(
            f"CASE WHEN {guard} AND {_BASS_M} > 0 THEN"
            f" round({_BASS_A} / {_BASS_M}, 6) END"
        ).alias("p_hat"),
        F.expr(
            f"CASE WHEN {guard} AND {_BASS_M} > 0 THEN"
            f" round(-({_BASS_C}) * {_BASS_M}, 6) END"
        ).alias("q_hat"),
    )


@query(
    "q_ev_capability",
    oracle="""
    WITH p AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ),
    sub AS (
        SELECT day,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(max(cents) - min(cents) AS BIGINT) AS r
        FROM p WHERE rn <= 5
        GROUP BY day HAVING count(*) = 5
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(s) AS BIGINT) AS ss,
               CAST(sum(r) AS BIGINT) AS sr
        FROM sub
    )
    SELECT k AS n_subgroups, ss AS sum_cents, sr AS sum_range_cents,
           round(CAST(ss AS DOUBLE) / (500 * k), 4) AS xbar,
           round(1000e0 * sr / (2326 * k) / 100, 4) AS sigma_hat,
           CASE WHEN sr > 0 THEN
               round(10000e0 * 2326 * k / (6e0 * 1000 * sr), 4) END
               AS cp,
           CASE WHEN sr > 0 THEN
               round(least(10000e0 - CAST(ss AS DOUBLE) / (5 * k),
                           CAST(ss AS DOUBLE) / (5 * k))
                     * 2326 * k / (3e0 * 1000 * sr), 4) END AS cpk
    FROM tot
    """,
)
def q_ev_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process capability Cp/Cpk from the q_ev_spc subgroups against
    the spec band [0, 100.00] (the construction range of ``value``):
    sigma estimated the SPC way as R-bar/d2 (d2 = 2.326 for n = 5) —
    the "can this process meet spec" number read together with the
    control chart (in-control but incapable is a real state).

    Determinism: the subgroup sums/ranges are exact cents (shared
    construction with q_ev_spc); d2 enters as the exact rational
    2326/1000, so Cp = (USL−LSL)·d2·k/(6·R̄-sum) and Cpk =
    min(USL−X̄, X̄−LSL)·d2·k/(3·R̄-sum) are single shared DOUBLE
    expressions over exact integers, NULL-guarded when every
    subgroup has zero range."""
    ev = load_table(spark, sf_dir, "events")
    w_day = Window.partitionBy(F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.to_date("ts").alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.row_number().over(w_day).alias("rn"),
    )
    sub = (
        p.where(F.col("rn") <= 5)
        .groupBy("day")
        .agg(
            F.sum("cents").cast("long").alias("s"),
            (F.max("cents") - F.min("cents")).cast("long").alias("r"),
            F.count("*").alias("cnt"),
        )
        .where(F.col("cnt") == 5)
    )
    tot = sub.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("s").cast("long").alias("ss"),
        F.sum("r").cast("long").alias("sr"),
    )
    return tot.select(
        F.col("k").alias("n_subgroups"),
        F.col("ss").alias("sum_cents"),
        F.col("sr").alias("sum_range_cents"),
        F.expr("round(CAST(ss AS DOUBLE) / (500 * k), 4)").alias(
            "xbar"
        ),
        F.expr(
            "round(1000e0 * sr / (2326 * k) / 100, 4)"
        ).alias("sigma_hat"),
        F.expr(
            "CASE WHEN sr > 0 THEN"
            " round(10000e0 * 2326 * k / (6e0 * 1000 * sr), 4) END"
        ).alias("cp"),
        F.expr(
            "CASE WHEN sr > 0 THEN"
            " round(least(10000e0 - CAST(ss AS DOUBLE) / (5 * k),"
            " CAST(ss AS DOUBLE) / (5 * k))"
            " * 2326 * k / (3e0 * 1000 * sr), 4) END"
        ).alias("cpk"),
    )


@query(
    "q_ord_safety_stock",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS u
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(u) AS BIGINT) AS s,
               CAST(sum(u * u) AS BIGINT) AS q
        FROM d
    )
    SELECT n AS n_days, s AS total_units,
           round(CAST(s AS DOUBLE) / n, 4) AS mean_daily,
           round(sqrt(greatest((CAST(n AS DOUBLE) * q
                                - CAST(s AS DOUBLE) * s)
                               / (CAST(n AS DOUBLE) * (n - 1)), 0e0)),
                 4) AS sd_daily,
           round(1645e0 / 1000
                 * sqrt(greatest((CAST(n AS DOUBLE) * q
                                  - CAST(s AS DOUBLE) * s)
                                 / (CAST(n AS DOUBLE) * (n - 1)), 0e0))
                 * sqrt(CAST(7 AS DOUBLE)), 2) AS safety_stock,
           round(CAST(s AS DOUBLE) / n * 7
                 + 1645e0 / 1000
                 * sqrt(greatest((CAST(n AS DOUBLE) * q
                                  - CAST(s AS DOUBLE) * s)
                                 / (CAST(n AS DOUBLE) * (n - 1)), 0e0))
                 * sqrt(CAST(7 AS DOUBLE)), 2) AS reorder_point
    FROM m
    """,
)
def q_ord_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock and reorder point for daily purchase demand at a
    7-day lead time and 95% service level: SS = z·σ_d·√L, ROP =
    mean·L + SS — the inventory-policy pair beside q_ord_eoq (EOQ
    answers "how much to order", this answers "when"), with z = 1.645
    as the exact rational 1645/1000.

    Determinism: daily unit counts, n, Σu, Σu² are exact BIGINTs; the
    variance uses the (nΣu²−S²)/(n(n−1)) identity with the algebra in
    DOUBLE (quadratic-in-scale — overflow rule) and a greatest(·,0)
    cancellation guard; every output is one shared expression."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("u"))
    )
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("u").cast("long").alias("s"),
        F.sum(F.col("u") * F.col("u")).cast("long").alias("q"),
    )
    sd = (
        "sqrt(greatest((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)"
        " / (CAST(n AS DOUBLE) * (n - 1)), 0e0))"
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("total_units"),
        F.expr("round(CAST(s AS DOUBLE) / n, 4)").alias("mean_daily"),
        F.expr(f"round({sd}, 4)").alias("sd_daily"),
        F.expr(
            f"round(1645e0 / 1000 * {sd} * sqrt(CAST(7 AS DOUBLE)), 2)"
        ).alias("safety_stock"),
        F.expr(
            f"round(CAST(s AS DOUBLE) / n * 7"
            f" + 1645e0 / 1000 * {sd} * sqrt(CAST(7 AS DOUBLE)), 2)"
        ).alias("reorder_point"),
    )


#: Hosmer–Lemeshow fixed-order term sum over the exact pivot columns
#: (score groups g = 1..9; g = 0 and 10 excluded — E(1−p) = 0 there),
#: shared VERBATIM by both engines: each term clears p = g/10 to the
#: exact rational (10·s_g − g·n_g)²/(g·n_g·(10−g)), square in DOUBLE
#: (overflow rule), empty groups contributing exactly 0.
_HL_STAT = "(" + " + ".join(
    f"(CASE WHEN n_{b} > 0 THEN CAST(10 * s_{b} - {b} * n_{b} AS DOUBLE)"
    f" * (10 * s_{b} - {b} * n_{b}) / ({b} * n_{b} * {10 - b})"
    " ELSE 0e0 END)"
    for b in range(1, 10)
) + ")"
_HL_NGROUPS = "(" + " + ".join(
    f"(CASE WHEN n_{b} > 0 THEN 1 ELSE 0 END)" for b in range(1, 10)
) + ")"
_HL_PIV_DUCK = ", ".join(
    f"CAST(count(CASE WHEN score = {b} THEN 1 END) AS BIGINT) AS n_{b},"
    f" CAST(coalesce(sum(CASE WHEN score = {b} THEN converted END), 0)"
    f" AS BIGINT) AS s_{b}"
    for b in range(1, 10)
)


@query(
    "q_ml_hosmer",
    oracle=f"""
    WITH f AS (
        SELECT user_id,
               CAST(least(sum(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END), 10) AS BIGINT)
                   AS score,
               max(CASE WHEN event_type = 'purchase'
                         AND CAST(json_extract_string(props, '$.k')
                                  AS DOUBLE) >= 90
                        THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    piv AS (
        SELECT CAST(count(*) AS BIGINT) AS nn,
               {_HL_PIV_DUCK}
        FROM f
    )
    SELECT nn AS n_users,
           CAST({_HL_NGROUPS} AS BIGINT) AS n_groups,
           round({_HL_STAT}, 4) AS hl_chi2,
           CAST(coalesce(CASE WHEN {_HL_NGROUPS} = 9 THEN
               {_HL_STAT} > CAST(14.067140 AS DOUBLE)
           END, FALSE) AS BOOLEAN) AS reject_05
    FROM piv
    """,
)
def q_ml_hosmer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer–Lemeshow goodness-of-fit test for the score-
    proportional predictor p = score/10 on the q_ml_ece frame — the
    calibration TEST beside ECE's magnitude (ECE says "how far off",
    HL says "is the miscalibration statistically real"): χ² =
    Σ_g (O_g − E_g)²/(E_g(1−p_g)) over the occupied score groups.

    Determinism: with p_g = g/10 every group term clears to the exact
    rational (10·s_g − g·n_g)²/(g·n_g·(10−g)); the nine terms are
    summed in ONE fixed-order module-level expression shared verbatim
    (squares in DOUBLE — overflow rule), empty groups contributing
    exactly 0.  The 5% decision uses χ²crit(df = 9−2) = 14.06714 and
    fires only in the full-group case — with fewer occupied groups the
    df-9 convention does not apply and the flag is FALSE (read
    n_groups; a nullable boolean would surface as NaN through the
    oracle's pandas path — documented).  Plan: one user-keyed aggregate + one
    1-row pivot."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.least(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ),
            F.lit(10),
        )
        .cast("long")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (
                    F.expr(
                        "CAST(get_json_object(props, '$.k') AS DOUBLE)"
                    )
                    >= 90
                ),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )
    aggs = [F.count("*").cast("long").alias("nn")]
    for b in range(1, 10):
        aggs.append(
            F.count(F.when(F.col("score") == b, 1))
            .cast("long")
            .alias(f"n_{b}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("score") == b, F.col("converted"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"s_{b}")
        )
    piv = f.agg(*aggs)
    return piv.select(
        F.col("nn").alias("n_users"),
        F.expr(_HL_NGROUPS).cast("long").alias("n_groups"),
        F.expr(f"round({_HL_STAT}, 4)").alias("hl_chi2"),
        F.expr(
            f"coalesce(CASE WHEN {_HL_NGROUPS} = 9 THEN"
            f" {_HL_STAT} > CAST(14.067140 AS DOUBLE) END, FALSE)"
        ).alias("reject_05"),
    )


@query(
    "q_alloc_apportion",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
    quota AS (
        SELECT event_type, cnt,
               CAST((100 * cnt) // n AS BIGINT) AS base,
               CAST((100 * cnt) % n AS BIGINT) AS rem
        FROM c CROSS JOIN tot
    ),
    lo AS (
        SELECT CAST(100 - sum(base) AS BIGINT) AS leftover FROM quota
    ),
    ranked AS (
        SELECT event_type, cnt, base, rem,
               row_number() OVER (ORDER BY rem DESC, event_type)
                   AS rk
        FROM quota
    )
    SELECT event_type, cnt, base, rem,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS seats
    FROM ranked CROSS JOIN lo
    ORDER BY event_type
    """,
)
def q_alloc_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a fixed budget
    of 100 slots across event types by traffic share — the exact
    integer allocation a sampler/budgeter needs when proportional
    shares must sum EXACTLY to the budget (naive rounding of 100·p_t
    over- or under-shoots; Hamilton provably never does).

    Determinism: base = (100·c) div N and rem = (100·c) mod N are
    exact non-negative integer operations (div ≡ floor — engines
    agree); the leftover seats go to the largest remainders with the
    tie broken on event_type — a rank over the bounded type
    dictionary (allowlisted), so the full allocation is
    integer-exact end to end and Σseats = 100 by construction."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = c.agg(F.sum("cnt").cast("long").alias("n"))
    quota = c.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "cnt",
        F.expr("(100 * cnt) div n").cast("long").alias("base"),
        ((100 * F.col("cnt")) % F.col("n")).cast("long").alias("rem"),
    )
    lo = quota.agg(
        (F.lit(100) - F.sum("base")).cast("long").alias("leftover")
    )
    ranked = quota.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), "event_type")
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(lo))
        .select(
            "event_type",
            "cnt",
            "base",
            "rem",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("seats"),
        )
        .orderBy("event_type")
    )


@query(
    "q_ml_calib_slope",
    oracle="""
    WITH f AS (
        SELECT user_id,
               CAST(least(sum(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END), 10) AS BIGINT)
                   AS score,
               max(CASE WHEN event_type = 'purchase'
                         AND CAST(json_extract_string(props, '$.k')
                                  AS DOUBLE) >= 90
                        THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    b AS (
        SELECT score, CAST(count(*) AS BIGINT) AS nb,
               CAST(coalesce(sum(converted), 0) AS BIGINT) AS sb
        FROM f WHERE score BETWEEN 1 AND 9
        GROUP BY score
    ),
    pts AS (
        SELECT nb AS w,
               CAST(floor(1000000e0 * ln(CAST(score AS DOUBLE)
                    / (10 - score))) AS BIGINT) AS x,
               CAST(floor(1000000e0 * ln(CAST(sb AS DOUBLE)
                    / (nb - sb))) AS BIGINT) AS y
        FROM b WHERE sb > 0 AND sb < nb
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(w) AS BIGINT) AS sw,
               CAST(sum(w * x) AS BIGINT) AS swx,
               CAST(sum(w * y) AS BIGINT) AS swy,
               CAST(sum(w * x * x) AS BIGINT) AS swxx,
               CAST(sum(w * x * y) AS BIGINT) AS swxy
        FROM pts
    )
    SELECT k AS n_buckets, sw AS n_users_used,
           round((CAST(sw AS DOUBLE) * swxy
                  - CAST(swx AS DOUBLE) * swy)
                 / (CAST(sw AS DOUBLE) * swxx
                    - CAST(swx AS DOUBLE) * swx), 4)
               AS calib_slope,
           round((CAST(swy AS DOUBLE) / sw
                  - ((CAST(sw AS DOUBLE) * swxy
                      - CAST(swx AS DOUBLE) * swy)
                     / (CAST(sw AS DOUBLE) * swxx
                        - CAST(swx AS DOUBLE) * swx))
                    * (CAST(swx AS DOUBLE) / sw)) / 1000000, 4)
               AS calib_intercept
    FROM m
    """,
)
def q_ml_calib_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox calibration slope and intercept for the score-proportional
    predictor (the q_ml_ece frame): weighted regression of the
    OBSERVED bucket log-odds on the PREDICTED log-odds logit(b/10) —
    the model-card recalibration pair beside ECE's magnitude and
    Hosmer–Lemeshow's test (slope < 1 = overconfident scores,
    intercept ≠ 0 = global bias; the fix is this exact linear map).

    Determinism: both logit coordinates are FLOORED at 10⁶
    fixed-point into BIGINTs (each enters ln() as one shared division
    of exact integers), so the bucket-count-weighted co-moments are
    exact order-free integer sums (the ln-floor regression trick);
    degenerate buckets (0% or 100% observed) are excluded exactly;
    slope is scale-free (the 10⁶ cancels) and the intercept rescales
    once.  Plan: one user aggregate + a ≤9-row bucket fold."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.least(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ),
            F.lit(10),
        )
        .cast("long")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (
                    F.expr(
                        "CAST(get_json_object(props, '$.k') AS DOUBLE)"
                    )
                    >= 90
                ),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )
    b = (
        f.where(F.col("score").between(1, 9))
        .groupBy("score")
        .agg(
            F.count("*").cast("long").alias("nb"),
            F.coalesce(F.sum("converted"), F.lit(0))
            .cast("long")
            .alias("sb"),
        )
    )
    pts = b.where(
        (F.col("sb") > 0) & (F.col("sb") < F.col("nb"))
    ).select(
        F.col("nb").alias("w"),
        F.floor(
            F.lit(1000000.0)
            * F.log(
                F.col("score").cast("double") / (10 - F.col("score"))
            )
        )
        .cast("long")
        .alias("x"),
        F.floor(
            F.lit(1000000.0)
            * F.log(
                F.col("sb").cast("double")
                / (F.col("nb") - F.col("sb"))
            )
        )
        .cast("long")
        .alias("y"),
    )
    m = pts.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w") * F.col("x")).cast("long").alias("swx"),
        F.sum(F.col("w") * F.col("y")).cast("long").alias("swy"),
        F.sum(F.col("w") * F.col("x") * F.col("x"))
        .cast("long")
        .alias("swxx"),
        F.sum(F.col("w") * F.col("x") * F.col("y"))
        .cast("long")
        .alias("swxy"),
    )
    num = (
        F.col("sw").cast("double") * F.col("swxy")
        - F.col("swx").cast("double") * F.col("swy")
    )
    den = (
        F.col("sw").cast("double") * F.col("swxx")
        - F.col("swx").cast("double") * F.col("swx")
    )
    slope = num / den
    return m.select(
        F.col("k").alias("n_buckets"),
        F.col("sw").alias("n_users_used"),
        F.round(slope, 4).alias("calib_slope"),
        F.round(
            (
                F.col("swy").cast("double") / F.col("sw")
                - slope * (F.col("swx").cast("double") / F.col("sw"))
            )
            / 1000000,
            4,
        ).alias("calib_intercept"),
    )
