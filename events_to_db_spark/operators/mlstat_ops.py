"""Model-fitting, higher-moment statistics, and graph-structure
operators (SURVEY.md §2.12, round 2 continuation).

Three families an analyst reaches for right after the basic tests in
:mod:`stats_ops`:

* a **decision stump** (`q_ml_stump`) — the 1-split classification tree
  that is the building block of boosting, fit by exhaustive threshold
  scan over the score column;
* the **Jarque–Bera normality statistic** (`q_stat_jarque_bera`) from
  exact integer power sums of cents;
* **degree assortativity** (`q_graph_assortativity`) of the event-type
  transition graph — "do high-fanout states feed high-fanin states?".

Determinism discipline (SURVEY §7.5) as everywhere: every statistic is
assembled from exact BIGINT/DECIMAL(38,0) integer sums; floats appear
only in one final per-row expression evaluated on identical integers in
both engines, rounded to 4–6 places; argmax ties are broken by a unique
key (the threshold itself).

Scale shape: the stump's cumulative class counts go through
``plans.prefix.bucketed_running_sum`` (two-level scan, no global
window); the moment sums are single keyed aggregates; the graph degrees
are two small aggregates broadcast back onto the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.plans.prefix import bucketed_running_sum
from events_to_db_spark.plans.checkpoints import truncate_lineage
from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table

# Fixed-point scale for the stump's split score.  Marked intermediate:
# (posL² + negL²)·SCALE ≤ (6e5)²·1e6 ≈ 3.6e17 < 2^63 at sf0.1; at
# 1e9-row samples switch the score columns to DECIMAL(38,0).
_STUMP_SCALE = 10**6


@query(
    "q_ml_stump",
    oracle=f"""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pv AS (
        SELECT vc, count(*) AS ct, CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT vc,
               sum(ct) OVER (ORDER BY vc) AS nl,
               sum(pos) OVER (ORDER BY vc) AS pl
        FROM pv
    ),
    tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
        FROM pv
    ),
    cand AS (
        SELECT vc, nl, pl, n, p,
               (n - nl) AS nr, (p - pl) AS pr,
               ((pl * pl + (nl - pl) * (nl - pl)) * {_STUMP_SCALE}) // nl
               + (((p - pl) * (p - pl)
                   + ((n - nl) - (p - pl)) * ((n - nl) - (p - pl)))
                  * {_STUMP_SCALE}) // (n - nl) AS score_scaled
        FROM cum CROSS JOIN tot
        WHERE nl < n
    )
    SELECT CAST(vc AS BIGINT) AS split_cents,
           round(vc / 100e0, 2) AS split_value,
           CAST(score_scaled AS BIGINT) AS score_scaled,
           CAST(nl AS BIGINT) AS n_left,
           CAST(nr AS BIGINT) AS n_right,
           CAST(pl AS BIGINT) AS pos_left,
           CAST(pr AS BIGINT) AS pos_right,
           round((n - CAST(pl * pl + (nl - pl) * (nl - pl) AS DOUBLE) / nl
                    - CAST(pr * pr + (nr - pr) * (nr - pr) AS DOUBLE) / nr)
                 / n, 6) AS weighted_gini
    FROM cand
    ORDER BY score_scaled DESC, vc
    LIMIT 1
    """,
)
def q_ml_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision stump: the single threshold on ``value`` that best
    separates purchase from view events by weighted Gini impurity.

    Minimizing weighted Gini ``(n_L·g_L + n_R·g_R)/n`` is equivalent to
    maximizing ``(pos_L²+neg_L²)/n_L + (pos_R²+neg_R²)/n_R``; both
    engines compare that rational via the identical fixed-point floor
    division (scale 1e6), so the argmax — tie-broken by the smallest
    threshold — hash-matches exactly.  Cumulative class counts come
    from the two-level bucketed scan ($20 cent-buckets ascend with the
    value order), not a global window; the threshold scan is a
    TakeOrdered top-1, so the whole fit is shuffle-bounded by the
    distinct-value count regardless of row count.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    pv = s.groupBy("vc").agg(
        F.count("*").alias("ct"), F.sum("y").cast("long").alias("pos")
    )
    cum = bucketed_running_sum(
        pv,
        F.expr("vc div 2000"),
        [F.col("vc")],
        {"nl": F.col("ct"), "pl": F.col("pos")},
    )
    tot = pv.agg(
        F.sum("ct").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("nl") < F.col("n"))
        .withColumn("nr", F.col("n") - F.col("nl"))
        .withColumn("pr", F.col("p") - F.col("pl"))
        .withColumn(
            "score_scaled",
            F.expr(
                f"((pl * pl + (nl - pl) * (nl - pl)) * {_STUMP_SCALE}) div nl"
                f" + ((pr * pr + (nr - pr) * (nr - pr)) * {_STUMP_SCALE})"
                " div nr"
            ),
        )
    )
    return (
        cand.select(
            F.col("vc").alias("split_cents"),
            F.round(F.col("vc") / 100.0, 2).alias("split_value"),
            F.col("score_scaled"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("nr").cast("long").alias("n_right"),
            F.col("pl").cast("long").alias("pos_left"),
            F.col("pr").cast("long").alias("pos_right"),
            F.round(
                (
                    F.col("n")
                    - (
                        F.col("pl") * F.col("pl")
                        + (F.col("nl") - F.col("pl"))
                        * (F.col("nl") - F.col("pl"))
                    ).cast("double")
                    / F.col("nl")
                    - (
                        F.col("pr") * F.col("pr")
                        + (F.col("nr") - F.col("pr"))
                        * (F.col("nr") - F.col("pr"))
                    ).cast("double")
                    / F.col("nr")
                )
                / F.col("n"),
                6,
            ).alias("weighted_gini"),
        )
        .orderBy(F.desc("score_scaled"), "split_cents")
        .limit(1)
    )


@query(
    "q_stat_jarque_bera",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS HUGEINT) AS v
        FROM events
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               sum(v) AS s1, sum(v * v) AS s2,
               sum(v * v * v) AS s3, sum(v * v * v * v) AS s4
        FROM c GROUP BY 1
    ),
    ctr AS (
        SELECT event_type, n,
               CAST(s1 AS DOUBLE) / n AS m1,
               CAST(s2 AS DOUBLE) / n AS r2,
               CAST(s3 AS DOUBLE) / n AS r3,
               CAST(s4 AS DOUBLE) / n AS r4
        FROM m
    ),
    mom AS (
        SELECT event_type, n,
               r2 - m1 * m1 AS m2,
               r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS m3,
               r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2
                  - 3 * m1 * m1 * m1 * m1 AS m4
        FROM ctr
    )
    SELECT event_type, n,
           round(m3 / (m2 * sqrt(m2)), 4) AS skewness,
           round(m4 / (m2 * m2), 4) AS kurtosis,
           round(n / 6e0 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                 + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4e0),
                 4) AS jb_stat
    FROM mom
    ORDER BY event_type
    """,
)
def q_stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality statistic of ``value`` per event type:
    ``JB = n/6·(S² + (K−3)²/4)`` from skewness S and kurtosis K.

    The four raw power sums are exact integers (cents as
    DECIMAL(38,0) / HUGEINT — cents⁴ ≈ 2e18 per row, ×1e5 rows ≈ 2e23,
    comfortably inside 38 digits up to ~1e14 rows); the central moments
    and the final statistic are one identical double expression over
    those identical integers, rounded to 4 places.  One keyed aggregate
    — no window, no shuffle beyond the groupBy.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.expr("cast(round(value * 100) as decimal(38,0))").alias("v"),
    )
    m = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("v * v")).alias("s2"),
        F.sum(F.expr("v * v * v")).alias("s3"),
        F.sum(F.expr("v * v * v * v")).alias("s4"),
    )
    ctr = m.select(
        "event_type",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n")).alias("r2"),
        (F.col("s3").cast("double") / F.col("n")).alias("r3"),
        (F.col("s4").cast("double") / F.col("n")).alias("r4"),
    )
    mom = ctr.select(
        "event_type",
        "n",
        (F.col("r2") - F.col("m1") * F.col("m1")).alias("m2"),
        (
            F.col("r3")
            - 3 * F.col("m1") * F.col("r2")
            + 2 * F.col("m1") * F.col("m1") * F.col("m1")
        ).alias("m3"),
        (
            F.col("r4")
            - 4 * F.col("m1") * F.col("r3")
            + 6 * F.col("m1") * F.col("m1") * F.col("r2")
            - 3 * F.col("m1") * F.col("m1") * F.col("m1") * F.col("m1")
        ).alias("m4"),
    )
    skew = F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))
    kurt = F.col("m4") / (F.col("m2") * F.col("m2"))
    return mom.select(
        "event_type",
        "n",
        F.round(skew, 4).alias("skewness"),
        F.round(kurt, 4).alias("kurtosis"),
        F.round(
            F.col("n") / F.lit(6.0)
            * (skew * skew + (kurt - 3) * (kurt - 3) / F.lit(4.0)),
            4,
        ).alias("jb_stat"),
    ).orderBy("event_type")


@query(
    "q_graph_assortativity",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= 40
    ),
    outd AS (SELECT c, CAST(count(*) AS BIGINT) AS od FROM edges GROUP BY 1),
    ind AS (SELECT s, CAST(count(*) AS BIGINT) AS id_ FROM edges GROUP BY 1),
    xy AS (
        SELECT o.od AS x, i.id_ AS y
        FROM edges e JOIN outd o ON e.c = o.c
        JOIN ind i ON e.s = i.s
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM xy
    )
    SELECT m, sx, sy, sxy, sxx, syy,
           round((m * sxy - sx * sy)
                 / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6)
               AS assortativity
    FROM s
    """,
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the bipartite customer–supplier graph
    (edges = high-quantity order lines): the Pearson correlation, over
    edges, between the customer's degree and the supplier's degree.

    Positive r = broad buyers concentrate on broad suppliers.  (The
    5-node event-type transition graph is complete on this corpus —
    constant degrees, r undefined — so the statistic lives on the
    purchase graph, where degrees genuinely vary.)  All six sufficient
    statistics are exact BIGINT sums over the distinct edge list; the
    correlation is one final double expression on those integers.
    Plan: one join + distinct for the edge list, two keyed degree
    aggregates broadcast back onto the edges, one global aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_quantity") >= 40)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    outd = edges.groupBy("c").agg(F.count("*").cast("long").alias("od"))
    ind = edges.groupBy("s").agg(F.count("*").cast("long").alias("id_"))
    xy = (
        edges.join(F.broadcast(outd), "c")
        .join(F.broadcast(ind), "s")
        .select(F.col("od").alias("x"), F.col("id_").alias("y"))
    )
    s = xy.agg(
        F.count("*").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        "m",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.round(num / (F.sqrt(denx) * F.sqrt(deny)), 6).alias(
            "assortativity"
        ),
    )


@query(
    "q_stat_mannkendall",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM d a JOIN d b ON b.day > a.day
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d),
    t AS (
        SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS tie18
        FROM (SELECT count(*) AS t FROM d GROUP BY x HAVING count(*) > 1)
    )
    SELECT n_days, s_stat,
           CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie18 AS BIGINT)
               AS var18,
           round(CASE WHEN s_stat = 0 THEN 0e0
                      ELSE (s_stat - sign(s_stat))
                           / sqrt((n_days * (n_days - 1) * (2 * n_days + 5)
                                   - tie18) / 18e0) END, 4) AS z_stat
    FROM s CROSS JOIN n CROSS JOIN t
    """,
)
def q_stat_mannkendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test on daily purchase revenue: S = Σ
    sign(x_j − x_i) over day pairs i<j, tie-corrected variance, and the
    continuity-corrected z statistic.

    S, the tie term, and the 18×-scaled variance are all exact BIGINTs
    (revenue is exact cents, so sign comparisons are exact); z is one
    final double expression over those integers, rounded to 4.  The
    pairwise join runs on the *daily aggregate* (|days| rows, broadcast
    both sides), so the pair count is calendar-bounded no matter how
    many raw events feed it — the same shape as q_stat_theilsen.
    """
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
        )
    ).cache()
    a = d.alias("a")
    b = d.alias("b")
    s = (
        a.join(F.broadcast(b), F.col("b.day") > F.col("a.day"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = d.agg(F.count("*").cast("long").alias("n_days"))
    t = (
        d.groupBy("x")
        .agg(F.count("*").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie18")
        )
    )
    var18 = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("tie18")
    ).cast("long")
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(t))
        .select(
            "n_days",
            "s_stat",
            var18.alias("var18"),
            F.round(
                F.when(F.col("s_stat") == 0, F.lit(0.0)).otherwise(
                    (
                        F.col("s_stat")
                        - F.signum(F.col("s_stat").cast("double"))
                    )
                    / F.sqrt(var18.cast("double") / F.lit(18.0))
                ),
                4,
            ).alias("z_stat"),
        )
    )


@query(
    "q_ev_mttr",
    oracle="""
    WITH nxt AS (
        SELECT event_type, ts,
               last_value(CASE WHEN event_type <> 'error' THEN ts END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS next_ok_ts
        FROM events
    ),
    r AS (
        SELECT (epoch_us(next_ok_ts) - epoch_us(ts)) // 1000000 AS rec_s
        FROM nxt WHERE event_type = 'error'
    )
    SELECT CAST(count(*) AS BIGINT) AS n_errors,
           CAST(count(rec_s) AS BIGINT) AS n_recovered,
           CAST(coalesce(sum(rec_s), 0) AS BIGINT) AS total_recovery_s,
           CAST(max(rec_s) AS BIGINT) AS max_recovery_s,
           round(CAST(sum(rec_s) AS DOUBLE) / count(rec_s), 4)
               AS avg_recovery_s
    FROM r
    """,
)
def q_ev_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-time-to-recovery: for every error event, the seconds until
    that user's next non-error event — the ops-health twin of
    q_ev_time_to_convert.

    The "next healthy event" is a descending-order carry window
    *excluding the current row* (UNBOUNDED PRECEDING .. 1 PRECEDING),
    so consecutive errors chain to the same recovery point and a
    trailing error recovers never (NULL, counted but excluded from the
    mean).  Gap seconds are exact integer µs floor-division (§7.5 —
    never a double quotient); one user_id shuffle, one global
    aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = ev.select(
        "event_type",
        "ts",
        F.last(
            F.when(F.col("event_type") != "error", F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("next_ok_ts"),
    )
    r = nxt.where(F.col("event_type") == "error").select(
        F.expr(
            "(unix_micros(next_ok_ts) - unix_micros(ts)) div 1000000"
        ).alias("rec_s")
    )
    return r.agg(
        F.count("*").alias("n_errors"),
        F.count("rec_s").alias("n_recovered"),
        F.coalesce(F.sum("rec_s"), F.lit(0)).cast("long").alias(
            "total_recovery_s"
        ),
        F.max("rec_s").cast("long").alias("max_recovery_s"),
        F.round(
            F.sum("rec_s").cast("double") / F.count("rec_s"), 4
        ).alias("avg_recovery_s"),
    )


@query(
    "q_ml_pit_features",
    oracle="""
    WITH f AS (
        SELECT event_id, user_id, ts, event_type, value,
               count(CASE WHEN event_type = 'click' THEN 1 END)
                 OVER w AS n_prior_clicks,
               count(CASE WHEN event_type = 'view' THEN 1 END)
                 OVER w AS n_prior_views,
               last_value(CASE WHEN event_type = 'click' THEN ts END
                          IGNORE NULLS) OVER w AS last_click_ts,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT) END)
                 OVER w AS prior_spend_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id,
           CAST(n_prior_clicks AS BIGINT) AS n_prior_clicks,
           CAST(n_prior_views AS BIGINT) AS n_prior_views,
           CAST((epoch_us(ts) - epoch_us(last_click_ts)) // 1000000
                AS BIGINT) AS last_click_gap_s,
           CAST(coalesce(prior_spend_cents, 0) AS BIGINT)
               AS prior_spend_cents,
           CAST(round(value * 100) AS BIGINT) AS label_cents
    FROM f WHERE event_type = 'purchase'
    """,
)
def q_ml_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training-set assembly (the feature-store join):
    for every purchase, the user's behavioral features *as of strictly
    before* that purchase — prior click/view counts, seconds since the
    last click, cumulative prior spend — plus the label.

    The whole feature block is ONE window pass per user (frame
    UNBOUNDED PRECEDING .. 1 PRECEDING, so the label row never leaks
    into its own features — the classic PIT-correctness requirement
    that naive joins violate).  Gap seconds are exact integer µs
    floor-division; spend is exact cents.  One user_id shuffle, no
    join, regardless of how many features ride the same frame.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.count(F.when(F.col("event_type") == "click", 1))
        .over(w)
        .alias("n_prior_clicks"),
        F.count(F.when(F.col("event_type") == "view", 1))
        .over(w)
        .alias("n_prior_views"),
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_click_ts"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("cast(round(value * 100) as bigint)"),
            )
        )
        .over(w)
        .alias("prior_spend_cents"),
    )
    return f.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("n_prior_clicks").cast("long").alias("n_prior_clicks"),
        F.col("n_prior_views").cast("long").alias("n_prior_views"),
        F.expr(
            "cast((unix_micros(ts) - unix_micros(last_click_ts))"
            " div 1000000 as bigint)"
        ).alias("last_click_gap_s"),
        F.coalesce(F.col("prior_spend_cents"), F.lit(0))
        .cast("long")
        .alias("prior_spend_cents"),
        F.expr("cast(round(value * 100) as bigint)").alias("label_cents"),
    )


@query(
    "q_stat_mutual_info",
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hr,
               CAST(count(*) AS BIGINT) AS n_xy
        FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT event_type, CAST(sum(n_xy) AS BIGINT) AS n_x
           FROM cells GROUP BY 1),
    my AS (SELECT hr, CAST(sum(n_xy) AS BIGINT) AS n_y
           FROM cells GROUP BY 1),
    nn AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells)
    SELECT c.event_type, c.hr, c.n_xy, mx.n_x, my.n_y, nn.n,
           round(ln(CAST(c.n_xy AS DOUBLE) * nn.n / (mx.n_x * my.n_y)),
                 6) AS pmi,
           round(CAST(c.n_xy AS DOUBLE) / nn.n
                 * ln(CAST(c.n_xy AS DOUBLE) * nn.n / (mx.n_x * my.n_y)),
                 6) AS mi_contrib
    FROM cells c
    JOIN mx ON c.event_type = mx.event_type
    JOIN my ON c.hr = my.hr
    CROSS JOIN nn
    """,
)
def q_stat_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event type and hour-of-day
    — the dependence heat-map feature selection starts from, emitted
    per cell so no cross-cell float summation ever happens.

    All counts (cell, both margins, total) are exact BIGINTs; PMI and
    the cell's MI contribution are single double expressions over an
    exact rational argument, rounded to 6.  Plan: one keyed cell
    aggregate, two tiny margin re-aggregates broadcast back, one
    scalar total — the cell table is |types|×24 rows no matter the
    input size.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count("*").alias("n_xy"))
    mx = cells.groupBy("event_type").agg(
        F.sum("n_xy").cast("long").alias("n_x")
    )
    my = cells.groupBy("hr").agg(F.sum("n_xy").cast("long").alias("n_y"))
    nn = cells.agg(F.sum("n_xy").cast("long").alias("n"))
    ratio = (
        F.col("n_xy").cast("double") * F.col("n")
        / (F.col("n_x") * F.col("n_y"))
    )
    return (
        cells.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "hr")
        .crossJoin(F.broadcast(nn))
        .select(
            "event_type",
            "hr",
            "n_xy",
            "n_x",
            "n_y",
            "n",
            F.round(F.log(ratio), 6).alias("pmi"),
            F.round(
                F.col("n_xy").cast("double") / F.col("n") * F.log(ratio),
                6,
            ).alias("mi_contrib"),
        )
    )


@query(
    "q_ml_roc",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    b AS (
        SELECT vc // 2000 AS bk,
               CAST(count(*) AS BIGINT) AS ct,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT bk,
               sum(ct) OVER (ORDER BY bk) AS cum_n,
               sum(pos) OVER (ORDER BY bk) AS cum_p
        FROM b
    ),
    tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
        FROM b
    )
    SELECT CAST((bk + 1) * 2000 AS BIGINT) AS thr_cents,
           CAST(p - cum_p AS BIGINT) AS tp,
           CAST((n - p) - (cum_n - cum_p) AS BIGINT) AS fp,
           CAST(cum_p AS BIGINT) AS fn,
           CAST(cum_n - cum_p AS BIGINT) AS tn,
           round(CAST(p - cum_p AS DOUBLE) / p, 6) AS tpr,
           round(CAST((n - p) - (cum_n - cum_p) AS DOUBLE) / (n - p), 6)
               AS fpr,
           round(CAST(p - cum_p AS DOUBLE)
                 / nullif((p - cum_p) + ((n - p) - (cum_n - cum_p)), 0),
                 6) AS precision_
    FROM cum CROSS JOIN tot
    """,
)
def q_ml_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC sweep: classify "purchase" by thresholding ``value`` at every
    $20 boundary; one row per threshold with the exact confusion counts
    and TPR/FPR/precision — the curve behind q_ml_eval's single point.

    Threshold t = (bucket+1)·2000 classifies vc ≥ t as positive, so the
    cumulative class counts *at or below* each bucket give the exact
    TP/FP/FN/TN split.  The cumulative scan is the two-level bucketed
    prefix sum over the per-bucket aggregate (|thresholds| rows — no
    unpartitioned window, SURVEY §7.5); rates are final doubles over
    exact integers.  Empty-prediction precision is NULL, not a crash.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = s.groupBy(F.expr("vc div 2000").alias("bk")).agg(
        F.count("*").alias("ct"), F.sum("y").cast("long").alias("pos")
    )
    cum = bucketed_running_sum(
        b,
        F.col("bk"),
        [F.col("bk")],
        {"cum_n": F.col("ct"), "cum_p": F.col("pos")},
    )
    tot = b.agg(
        F.sum("ct").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    tp = F.col("p") - F.col("cum_p")
    fp = (F.col("n") - F.col("p")) - (F.col("cum_n") - F.col("cum_p"))
    return j.select(
        ((F.col("bk") + 1) * 2000).cast("long").alias("thr_cents"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        F.col("cum_p").cast("long").alias("fn"),
        (F.col("cum_n") - F.col("cum_p")).cast("long").alias("tn"),
        F.round(tp.cast("double") / F.col("p"), 6).alias("tpr"),
        F.round(fp.cast("double") / (F.col("n") - F.col("p")), 6).alias(
            "fpr"
        ),
        F.round(
            tp.cast("double") / F.nullif(tp + fp, F.lit(0)), 6
        ).alias("precision_"),
    )


_PCA_ITERS = 4
_PCA_SCALE = 10**6


def _pca_oracle(iters: int = _PCA_ITERS) -> str:
    """Unrolled power-iteration CTE chain: per iteration s = Av (per
    vector), w = Aᵀs (per dim), then max-normalize — mirroring the
    Spark loop step for step, in the same fixed-point arithmetic."""
    sc = _PCA_SCALE
    parts = [
        f"""
    WITH cells AS (
        SELECT vec_id,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(unnest(embedding)::DOUBLE * {sc}) AS BIGINT) AS q
        FROM embeddings
    ),
    v0 AS (SELECT DISTINCT d, CAST({sc} AS BIGINT) AS v FROM cells)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"""
    s{i} AS (
        SELECT c.vec_id,
               CAST(sum(c.q * v.v) AS BIGINT) AS s
        FROM cells c JOIN v{p} v USING (d) GROUP BY 1
    ),
    sn{i} AS (
        SELECT vec_id,
               CASE WHEN s < 0 THEN -(abs(s) // {sc})
                    ELSE abs(s) // {sc} END AS sp
        FROM s{i}
    ),
    w{i} AS (
        SELECT c.d, CAST(sum(c.q * t.sp) AS BIGINT) AS w
        FROM cells c JOIN sn{i} t USING (vec_id) GROUP BY 1
    ),
    m{i} AS (SELECT max(abs(w)) AS m FROM w{i}),
    v{i} AS (
        SELECT d,
               CASE WHEN w < 0
                    THEN -(abs(w) // greatest(m // {sc}, 1))
                    ELSE abs(w) // greatest(m // {sc}, 1) END AS v
        FROM w{i} CROSS JOIN m{i}
    )"""
        )
    body = ",".join(parts)
    return f"""{body}
    SELECT CAST(d AS INT) AS dim_idx,
           CAST(v AS BIGINT) AS v_scaled,
           CAST(m AS BIGINT) AS max_w
    FROM v{iters} CROSS JOIN m{iters}
    ORDER BY d
    """


@query("q_ml_pca_power", oracle=_pca_oracle())
def q_ml_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant singular direction of the embedding matrix by 4 power
    iterations on the Gram matrix (v ← AᵀAv, max-normalized) — the
    distributed linear-algebra primitive under PCA/spectral methods,
    expressed as joins + keyed aggregates, never a matrix collect.

    Determinism: embeddings are quantized once to 1e-6 fixed point, so
    every mat-vec is exact BIGINT multiply-add (order-independent);
    rescaling uses sign·(|x| // k) in BOTH engines because Spark's
    ``div`` truncates toward zero while DuckDB's ``//`` floors — they
    only agree on non-negative operands (the same trap as µs gaps,
    one step nastier).  Overflow headroom: |w| ≤ n·64·(6e5)²·~60 ≈
    4e16 at sf0.1; past ~1e9 vectors switch q·s products to
    DECIMAL(38,0).  Each iteration is two shuffles (by dim, by
    vec_id); v is 64 rows, broadcast into both joins; nothing touches
    the driver.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    sc = _PCA_SCALE
    cells = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("p", "x"),
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("d"),
        F.expr(f"cast(round(cast(x as double) * {sc}) as bigint)").alias(
            "q"
        ),
    ).transform(lambda d: truncate_lineage(d, eager=False))
    v = cells.select("d").distinct().select(
        "d", F.lit(sc).cast("long").alias("v")
    )
    m = None
    for _ in range(_PCA_ITERS):
        s = (
            cells.join(F.broadcast(v), "d")
            .groupBy("vec_id")
            .agg(F.sum(F.col("q") * F.col("v")).cast("long").alias("s"))
        )
        sn = s.select(
            "vec_id",
            F.when(
                F.col("s") < 0, -F.expr(f"abs(s) div {sc}")
            )
            .otherwise(F.expr(f"abs(s) div {sc}"))
            .alias("sp"),
        )
        w = (
            cells.join(sn, "vec_id")
            .groupBy("d")
            .agg(F.sum(F.col("q") * F.col("sp")).cast("long").alias("w"))
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                "d",
                F.when(
                    F.col("w") < 0,
                    -F.expr(f"abs(w) div greatest(m div {sc}, 1)"),
                )
                .otherwise(
                    F.expr(f"abs(w) div greatest(m div {sc}, 1)")
                )
                .alias("v"),
            )
            .transform(lambda d: truncate_lineage(d, eager=False))
        )
    return (
        v.crossJoin(F.broadcast(m))
        .select(
            F.col("d").cast("int").alias("dim_idx"),
            F.col("v").cast("long").alias("v_scaled"),
            F.col("m").cast("long").alias("max_w"),
        )
        .orderBy("dim_idx")
    )


@query(
    "q_graph_modularity",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= 40
    ),
    lab AS (
        SELECT cu.c_nationkey AS cg, su.s_nationkey AS sg
        FROM edges e
        JOIN customer cu ON cu.c_custkey = e.c
        JOIN supplier su ON su.s_suppkey = e.s
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
    per AS (
        SELECT g,
               CAST(sum(e_g) AS BIGINT) AS e_g,
               CAST(sum(a_g) AS BIGINT) AS a_g,
               CAST(sum(b_g) AS BIGINT) AS b_g
        FROM (
            SELECT cg AS g,
                   CASE WHEN cg = sg THEN 1 ELSE 0 END AS e_g,
                   1 AS a_g, 0 AS b_g
            FROM lab
            UNION ALL
            SELECT sg AS g, 0, 0, 1 FROM lab
        )
        GROUP BY g
    )
    SELECT m,
           CAST(count(*) AS BIGINT) AS n_communities,
           CAST(sum(e_g) AS BIGINT) AS intra_edges,
           CAST(sum(e_g * m - a_g * b_g) AS BIGINT) AS q_num,
           round(CAST(sum(e_g * m - a_g * b_g) AS DOUBLE) / (m * m), 6)
               AS modularity
    FROM per CROSS JOIN m
    GROUP BY m
    """,
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity of the nation partition on the customer–supplier
    purchase graph: Q = Σ_g [e_g/m − a_g·b_g/m²] — do trading
    relationships stay inside national communities more than a random
    degree-preserving rewiring would predict?

    Q is carried as the exact integer numerator Σ(e_g·m − a_g·b_g)
    over denominator m² (BIGINT-safe: m ≤ 1e5 at sf0.1 → terms ≤
    1e10·25), so the statistic hash-matches; the division happens once
    at display.  Plan: the edge distinct, two broadcast dimension
    joins for labels, one union-shaped per-community aggregate, one
    scalar m — community count bounds every post-edge structure.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    edges = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_quantity") >= 40)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    lab = (
        edges.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("c") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            F.col("s") == F.col("s_suppkey"),
        )
        .select(
            F.col("c_nationkey").alias("cg"), F.col("s_nationkey").alias("sg")
        )
    ).cache()
    m = lab.agg(F.count("*").cast("long").alias("m"))
    left = lab.select(
        F.col("cg").alias("g"),
        F.when(F.col("cg") == F.col("sg"), 1).otherwise(0).alias("e_g"),
        F.lit(1).alias("a_g"),
        F.lit(0).alias("b_g"),
    )
    right = lab.select(
        F.col("sg").alias("g"),
        F.lit(0).alias("e_g"),
        F.lit(0).alias("a_g"),
        F.lit(1).alias("b_g"),
    )
    per = (
        left.unionByName(right)
        .groupBy("g")
        .agg(
            F.sum("e_g").cast("long").alias("e_g"),
            F.sum("a_g").cast("long").alias("a_g"),
            F.sum("b_g").cast("long").alias("b_g"),
        )
    )
    j = per.crossJoin(F.broadcast(m))
    term = F.col("e_g") * F.col("m") - F.col("a_g") * F.col("b_g")
    return j.groupBy("m").agg(
        F.count("*").alias("n_communities"),
        F.sum("e_g").cast("long").alias("intra_edges"),
        F.sum(term).cast("long").alias("q_num"),
        F.round(
            F.sum(term).cast("double") / (F.col("m") * F.col("m")), 6
        ).alias("modularity"),
    )


@query(
    "q_ml_kmeans_assign",
    oracle="""
    WITH cells AS (
        SELECT vec_id,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT)
                   AS q
        FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS cid, d, q FROM cells
        WHERE vec_id IN (SELECT vec_id FROM embeddings
                         ORDER BY vec_id LIMIT 3)
    ),
    dist AS (
        SELECT c.vec_id, ce.cid,
               CAST(sum((c.q - ce.q) * (c.q - ce.q)) AS BIGINT) AS d2
        FROM cells c JOIN cent ce ON c.d = ce.d
        GROUP BY 1, 2
    ),
    best AS (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rk
        FROM dist
    )
    SELECT cid AS centroid_id,
           CAST(count(*) AS BIGINT) AS n_assigned,
           CAST(sum(d2) AS BIGINT) AS inertia_q,
           CAST(min(d2) AS BIGINT) AS min_d2,
           CAST(max(d2) AS BIGINT) AS max_d2
    FROM best WHERE rk = 1
    GROUP BY cid
    """,
)
def q_ml_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means assignment step, made exactly checkable: every
    embedding assigned to the nearest of three data-chosen centroids
    (the three lowest vec_ids) under *quantized* squared-L2 distance —
    the E-step q_ml_kmeans runs with float centroids, here on 1e-6
    fixed-point integers so inertia and counts hash-match.

    Distances are exact BIGINT sums ((q−c)² ≤ 1.4e12 per dim, ×64 dims
    ×n rows ≈ 2e17 at sf0.1); argmin ties break on centroid id.  Plan:
    the k·dim centroid cells (192 rows) broadcast onto the exploded
    vector cells, one (vec_id,cid) aggregate, one partitioned top-1
    window — the |V|·k·dim work every distributed k-means E-step pays,
    with no driver matrix and no float divergence.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "x")
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("d"),
        F.expr("cast(round(cast(x as double) * 1000000) as bigint)").alias(
            "q"
        ),
    )
    seeds = emb.select("vec_id").orderBy("vec_id").limit(3)
    cent = (
        cells.join(
            F.broadcast(seeds.withColumnRenamed("vec_id", "cid")),
            cells.vec_id == F.col("cid"),
        )
        .select("cid", "d", "q")
        .withColumnRenamed("q", "cq")
    )
    dist = (
        cells.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
            )
            .cast("long")
            .alias("d2")
        )
    )
    wbest = Window.partitionBy("vec_id").orderBy("d2", "cid")
    best = dist.withColumn("rk", F.row_number().over(wbest)).where(
        F.col("rk") == 1
    )
    return best.groupBy(F.col("cid").alias("centroid_id")).agg(
        F.count("*").alias("n_assigned"),
        F.sum("d2").cast("long").alias("inertia_q"),
        F.min("d2").cast("long").alias("min_d2"),
        F.max("d2").cast("long").alias("max_d2"),
    )


@query(
    "q_ml_feature_hash",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    h AS (
        SELECT w,
               CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 64
                   AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY 1, 2
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CASE WHEN count(*) > 1 THEN 1 ELSE 0 END AS has_collision
    FROM h
    GROUP BY bucket
    """,
)
def q_ml_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: every vocabulary word mapped into 64 feature
    buckets by md5-prefix modulo — the fixed-width featurizer that
    sidesteps vocabulary builds entirely — with per-bucket load and
    collision audit (how much mass shares a slot with another word).

    The hash is the cross-engine md5-prefix BIGINT (same parity trick
    as every fingerprint in the repo); all outputs are exact counts.
    With a 31-word vocabulary in 64 buckets, birthday collisions are
    expected and the audit shows exactly which slots pay them.  One
    explode + two keyed aggregates; the bucket table is 64 rows at any
    corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.expr("split(text, ' ')")).alias("w"))
    h = tok.groupBy(
        "w",
        (
            F.expr("cast(conv(substr(md5(w), 1, 15), 16, 10) as bigint)")
            % 64
        ).alias("bucket"),
    ).agg(F.count("*").alias("n"))
    return h.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count("*").alias("n_distinct_words"),
        F.when(F.count("*") > 1, 1).otherwise(0).alias("has_collision"),
    )


@query(
    "q_ml_best_f1",
    oracle=f"""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    b AS (
        SELECT vc // 2000 AS bk,
               CAST(count(*) AS BIGINT) AS ct,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT bk,
               sum(ct) OVER (ORDER BY bk) AS cum_n,
               sum(pos) OVER (ORDER BY bk) AS cum_p
        FROM b
    ),
    tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
        FROM b
    ),
    f AS (
        SELECT (bk + 1) * 2000 AS thr,
               p - cum_p AS tp,
               (n - p) - (cum_n - cum_p) AS fp,
               cum_p AS fn_,
               (2 * (p - cum_p) * {10**6})
                   // (2 * (p - cum_p)
                       + ((n - p) - (cum_n - cum_p)) + cum_p)
                   AS f1_scaled
        FROM cum CROSS JOIN tot
    )
    SELECT CAST(thr AS BIGINT) AS thr_cents,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn_ AS BIGINT) AS fn,
           CAST(f1_scaled AS BIGINT) AS f1_scaled,
           round(2e0 * tp / (2 * tp + fp + fn_), 6) AS f1
    FROM f
    ORDER BY f1_scaled DESC, thr
    LIMIT 1
    """,
)
def q_ml_best_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-threshold tuning: the $20-grid threshold maximizing F1
    for "classify purchase by value ≥ t" — the step after q_ml_roc
    draws the curve.

    F1 = 2TP/(2TP+FP+FN) is compared across thresholds via the 1e6
    fixed-point floor score (denominator ≥ 2TP ≥ 0; the degenerate
    all-negative threshold scores 0, never a division crash since
    2TP+FP+FN ≥ P > 0), tie-broken by the smaller threshold.  Same
    two-level scan machinery as the stump — shuffle-bounded by the
    threshold grid.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = s.groupBy(F.expr("vc div 2000").alias("bk")).agg(
        F.count("*").alias("ct"), F.sum("y").cast("long").alias("pos")
    )
    cum = bucketed_running_sum(
        b,
        F.col("bk"),
        [F.col("bk")],
        {"cum_n": F.col("ct"), "cum_p": F.col("pos")},
    )
    tot = b.agg(
        F.sum("ct").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    tp = F.col("p") - F.col("cum_p")
    fp = (F.col("n") - F.col("p")) - (F.col("cum_n") - F.col("cum_p"))
    fn = F.col("cum_p")
    f = j.select(
        ((F.col("bk") + 1) * 2000).cast("long").alias("thr_cents"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.expr(
            f"(2 * (p - cum_p) * {10**6})"
            " div (2 * (p - cum_p)"
            " + ((n - p) - (cum_n - cum_p)) + cum_p)"
        )
        .cast("long")
        .alias("f1_scaled"),
        F.round(
            2.0 * tp.cast("double") / (2 * tp + fp + fn), 6
        ).alias("f1"),
    )
    return f.orderBy(F.desc("f1_scaled"), "thr_cents").limit(1)


_LC_FRACS = (25, 50, 75)


def _lc_oracle() -> str:
    """One stump-fit CTE block per training fraction, evaluated on the
    common held-out hash slice [75, 100) — mechanical unroll, same
    fixed-point score as q_ml_stump."""
    blocks = []
    for f in _LC_FRACS:
        blocks.append(f"""
    tr{f} AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS ct,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s WHERE hb < {f} GROUP BY 1
    ),
    cum{f} AS (
        SELECT vc, sum(ct) OVER (ORDER BY vc) AS nl,
               sum(pos) OVER (ORDER BY vc) AS pl
        FROM tr{f}
    ),
    tot{f} AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
        FROM tr{f}
    ),
    best{f} AS (
        SELECT vc AS thr, n AS n_train
        FROM cum{f} CROSS JOIN tot{f}
        WHERE nl < n
        ORDER BY ((pl * pl + (nl - pl) * (nl - pl)) * 1000000) // nl
               + (((p - pl) * (p - pl)
                   + ((n - nl) - (p - pl)) * ((n - nl) - (p - pl)))
                  * 1000000) // (n - nl) DESC, vc
        LIMIT 1
    ),
    ev{f} AS (
        SELECT {f} AS frac, b.n_train, b.thr,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN (e.vc > b.thr) = (e.y = 1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM s e CROSS JOIN best{f} b
        WHERE e.hb >= 75
        GROUP BY 1, 2, 3
    )""")
    body = ",".join(blocks)
    union = "\n    UNION ALL ".join(f"SELECT * FROM ev{f}" for f in _LC_FRACS)
    return f"""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 AS hb
        FROM events WHERE event_type IN ('purchase', 'view')
    ),{body}
    SELECT CAST(frac AS BIGINT) AS train_pct,
           CAST(n_train AS BIGINT) AS n_train,
           CAST(thr AS BIGINT) AS thr_cents,
           n_eval, n_correct,
           round(CAST(n_correct AS DOUBLE) / n_eval, 6) AS accuracy
    FROM ({union})
    """


@query("q_ml_learning_curve", oracle=_lc_oracle())
def q_ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve: the q_ml_stump fit repeated on deterministic
    25% / 50% / 75% hash-sampled training sets, each evaluated on the
    common held-out [75,100) hash slice — does more data move the
    threshold and the held-out accuracy?  The sample-efficiency
    readout every capacity-planning discussion wants.

    Splits are md5-bucket (reproducible, the repo's standard sampling
    discipline — train slices are nested by construction, as a real
    learning curve requires); each fit is the same fixed-point Gini
    argmax as the stump; accuracy is exact held-out counts.  The
    three fits share one base scan; each is threshold-grid-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (
            F.expr(
                "cast(conv(substr(md5(cast(event_id as string)), 1, 15),"
                " 16, 10) as bigint)"
            )
            % 100
        ).alias("hb"),
    ).cache()
    ev_hold = s.where(F.col("hb") >= 75)
    out = None
    for f in _LC_FRACS:
        tr = (
            s.where(F.col("hb") < f)
            .groupBy("vc")
            .agg(
                F.count("*").alias("ct"),
                F.sum("y").cast("long").alias("pos"),
            )
        )
        cum = bucketed_running_sum(
            tr,
            F.expr("vc div 2000"),
            [F.col("vc")],
            {"nl": F.col("ct"), "pl": F.col("pos")},
        )
        tot = tr.agg(
            F.sum("ct").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("p"),
        )
        best = (
            cum.crossJoin(F.broadcast(tot))
            .where(F.col("nl") < F.col("n"))
            .withColumn(
                "score",
                F.expr(
                    "((pl * pl + (nl - pl) * (nl - pl)) * 1000000) div nl"
                    " + (((p - pl) * (p - pl)"
                    " + ((n - nl) - (p - pl)) * ((n - nl) - (p - pl)))"
                    " * 1000000) div (n - nl)"
                ),
            )
            .orderBy(F.desc("score"), "vc")
            .limit(1)
            .select(F.col("vc").alias("thr"), F.col("n").alias("n_train"))
        )
        evf = (
            ev_hold.crossJoin(F.broadcast(best))
            .agg(
                F.lit(f).cast("long").alias("train_pct"),
                F.max("n_train").cast("long").alias("n_train"),
                F.max("thr").cast("long").alias("thr_cents"),
                F.count("*").alias("n_eval"),
                F.sum(
                    F.when(
                        (F.col("vc") > F.col("thr"))
                        == (F.col("y") == 1),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_correct"),
            )
            .select(
                "train_pct",
                "n_train",
                "thr_cents",
                "n_eval",
                "n_correct",
                F.round(
                    F.col("n_correct").cast("double") / F.col("n_eval"), 6
                ).alias("accuracy"),
            )
        )
        out = evf if out is None else out.unionByName(evf)
    return out


@query(
    "q_ml_shapley",
    oracle="""
    WITH b AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS x1,
               CAST(round(l_discount * 100) AS BIGINT) AS x2,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(x1::HUGEINT) AS s1, sum(x2::HUGEINT) AS s2,
               sum(y::HUGEINT) AS sy,
               sum(x1::HUGEINT * x1) AS s11,
               sum(x1::HUGEINT * x2) AS s12,
               sum(x2::HUGEINT * x2) AS s22,
               sum(x1::HUGEINT * y) AS s1y,
               sum(x2::HUGEINT * y) AS s2y
        FROM b
    ),
    beta AS (
        SELECT CAST(n AS DOUBLE) AS nd,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
               (CAST(n * s12 - s1 * s2 AS DOUBLE)
                * CAST(n * s2y - s2 * sy AS DOUBLE)
                - CAST(n * s22 - s2 * s2 AS DOUBLE)
                * CAST(n * s1y - s1 * sy AS DOUBLE))
               / (CAST(n * s12 - s1 * s2 AS DOUBLE)
                  * CAST(n * s12 - s1 * s2 AS DOUBLE)
                  - CAST(n * s11 - s1 * s1 AS DOUBLE)
                  * CAST(n * s22 - s2 * s2 AS DOUBLE)) AS b1,
               (CAST(n * s12 - s1 * s2 AS DOUBLE)
                * CAST(n * s1y - s1 * sy AS DOUBLE)
                - CAST(n * s11 - s1 * s1 AS DOUBLE)
                * CAST(n * s2y - s2 * sy AS DOUBLE))
               / (CAST(n * s12 - s1 * s2 AS DOUBLE)
                  * CAST(n * s12 - s1 * s2 AS DOUBLE)
                  - CAST(n * s11 - s1 * s1 AS DOUBLE)
                  * CAST(n * s22 - s2 * s2 AS DOUBLE)) AS b2
        FROM m
    ),
    top AS (
        SELECT l_orderkey, l_linenumber, x1, x2, y
        FROM b ORDER BY y DESC, l_orderkey, l_linenumber LIMIT 10
    )
    SELECT t.l_orderkey, CAST(t.l_linenumber AS INT) AS l_linenumber,
           t.y AS y_cents,
           round(be.b1 * (t.x1 - be.m1), 4) AS phi_qty,
           round(be.b2 * (t.x2 - be.m2), 4) AS phi_disc,
           round(be.my, 4) AS base_value,
           round(be.my + be.b1 * (t.x1 - be.m1)
                 + be.b2 * (t.x2 - be.m2), 4) AS yhat,
           round(t.y - (be.my + be.b1 * (t.x1 - be.m1)
                        + be.b2 * (t.x2 - be.m2)), 4) AS residual
    FROM top t CROSS JOIN beta be
    """,
)
def q_ml_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley attribution for the closed-form linear model: for
    a linear f, feature i's Shapley value collapses to
    φ_i = β_i·(x_i − x̄_i), so the additive explanation
    y ≈ base + φ_qty + φ_disc is computable with no sampling — shown
    for the ten highest-priced lines (unique tie-break).

    The nine raw moments are the same exact HUGEINT/DECIMAL(38,0)
    sums as q_ml_linreg (here pooled, not per flag); β and every φ
    are single double expressions over those identical integers,
    rounded to 4.  One moment aggregate + a TakeOrdered sample + a
    broadcast of the 1-row β — explainability at fact-table scale
    costs one extra scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    b = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    m = b.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x1").cast(dec)).alias("s1"),
        F.sum(F.col("x2").cast(dec)).alias("s2"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x1") * F.col("x1")).cast(dec)).alias("s11"),
        F.sum((F.col("x1") * F.col("x2")).cast(dec)).alias("s12"),
        F.sum((F.col("x2") * F.col("x2")).cast(dec)).alias("s22"),
        F.sum((F.col("x1") * F.col("y")).cast(dec)).alias("s1y"),
        F.sum((F.col("x2") * F.col("y")).cast(dec)).alias("s2y"),
    )
    c12 = (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")).cast(
        "double"
    )
    c11 = (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).cast(
        "double"
    )
    c22 = (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")).cast(
        "double"
    )
    c1y = (F.col("n") * F.col("s1y") - F.col("s1") * F.col("sy")).cast(
        "double"
    )
    c2y = (F.col("n") * F.col("s2y") - F.col("s2") * F.col("sy")).cast(
        "double"
    )
    den = c12 * c12 - c11 * c22
    beta = m.select(
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias(
            "m1"
        ),
        (F.col("s2").cast("double") / F.col("n").cast("double")).alias(
            "m2"
        ),
        (F.col("sy").cast("double") / F.col("n").cast("double")).alias(
            "my"
        ),
        ((c12 * c2y - c22 * c1y) / den).alias("b1"),
        ((c12 * c1y - c11 * c2y) / den).alias("b2"),
    )
    top = b.orderBy(
        F.desc("y"), "l_orderkey", "l_linenumber"
    ).limit(10)
    j = top.crossJoin(F.broadcast(beta))
    phi1 = F.col("b1") * (F.col("x1") - F.col("m1"))
    phi2 = F.col("b2") * (F.col("x2") - F.col("m2"))
    yhat = F.col("my") + phi1 + phi2
    return j.select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.col("y").alias("y_cents"),
        F.round(phi1, 4).alias("phi_qty"),
        F.round(phi2, 4).alias("phi_disc"),
        F.round(F.col("my"), 4).alias("base_value"),
        F.round(yhat, 4).alias("yhat"),
        F.round(F.col("y") - yhat, 4).alias("residual"),
    )


@query(
    "q_ml_cost_threshold",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    b AS (
        SELECT vc // 2000 AS bk,
               CAST(count(*) AS BIGINT) AS ct,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT bk,
               sum(ct) OVER (ORDER BY bk) AS cum_n,
               sum(pos) OVER (ORDER BY bk) AS cum_p
        FROM b
    ),
    tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
        FROM b
    )
    SELECT CAST((bk + 1) * 2000 AS BIGINT) AS thr_cents,
           CAST((n - p) - (cum_n - cum_p) AS BIGINT) AS fp,
           CAST(cum_p AS BIGINT) AS fn,
           CAST(500 * ((n - p) - (cum_n - cum_p)) + 2000 * cum_p
                AS BIGINT) AS total_cost_cents
    FROM cum CROSS JOIN tot
    ORDER BY total_cost_cents, thr_cents
    LIMIT 1
    """,
)
def q_ml_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive threshold selection: with a false positive
    costing 500¢ (wasted outreach) and a false negative 2000¢ (missed
    purchase), the $20-grid threshold minimizing total expected cost —
    the business-aligned alternative to q_ml_best_f1, and unlike F1
    the objective is ALREADY an exact integer: no fixed-point scaling
    needed at all, the argmin compares cents directly.

    Same two-level cumulative machinery as the ROC family; tie-break
    smaller threshold; TakeOrdered top-1.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = s.groupBy(F.expr("vc div 2000").alias("bk")).agg(
        F.count("*").alias("ct"), F.sum("y").cast("long").alias("pos")
    )
    cum = bucketed_running_sum(
        b,
        F.col("bk"),
        [F.col("bk")],
        {"cum_n": F.col("ct"), "cum_p": F.col("pos")},
    )
    tot = b.agg(
        F.sum("ct").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    fp = (F.col("n") - F.col("p")) - (F.col("cum_n") - F.col("cum_p"))
    fn = F.col("cum_p")
    return (
        j.select(
            ((F.col("bk") + 1) * 2000).cast("long").alias("thr_cents"),
            fp.cast("long").alias("fp"),
            fn.cast("long").alias("fn"),
            (500 * fp + 2000 * fn).cast("long").alias("total_cost_cents"),
        )
        .orderBy("total_cost_cents", "thr_cents")
        .limit(1)
    )


@query(
    "q_ml_ks_stat",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    b AS (
        SELECT vc // 2000 AS bk,
               CAST(count(*) AS BIGINT) AS ct,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT bk,
               sum(ct) OVER (ORDER BY bk) AS cum_n,
               sum(pos) OVER (ORDER BY bk) AS cum_p
        FROM b
    ),
    tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
        FROM b
    )
    SELECT CAST((bk + 1) * 2000 AS BIGINT) AS thr_cents,
           CAST((p - cum_p) * (n - p)
                - ((n - p) - (cum_n - cum_p)) * p AS BIGINT) AS j_num,
           CAST(p * (n - p) AS BIGINT) AS j_den,
           round(CAST(p - cum_p AS DOUBLE) / p
                 - CAST((n - p) - (cum_n - cum_p) AS DOUBLE) / (n - p),
                 6) AS ks_separation
    FROM cum CROSS JOIN tot
    ORDER BY (p - cum_p) * (n - p)
             - ((n - p) - (cum_n - cum_p)) * p DESC,
             bk
    LIMIT 1
    """,
)
def q_ml_ks_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit-scoring KS: the threshold maximizing TPR − FPR (Youden's
    J) — the separation statistic risk models are graded on.  Because
    both rates share constant denominators across thresholds, the
    argmax is the EXACT integer tp·(n−p) − fp·p: no fixed-point
    scaling, no float ordering, just a cross-multiplied BIGINT compare
    (≤ ~4e9 at sf0.1).

    Same two-level cumulative machinery as the ROC family; tie-break
    lower threshold; the separation value is one display division.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = s.groupBy(F.expr("vc div 2000").alias("bk")).agg(
        F.count("*").alias("ct"), F.sum("y").cast("long").alias("pos")
    )
    cum = bucketed_running_sum(
        b,
        F.col("bk"),
        [F.col("bk")],
        {"cum_n": F.col("ct"), "cum_p": F.col("pos")},
    )
    tot = b.agg(
        F.sum("ct").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    tp = F.col("p") - F.col("cum_p")
    fp = (F.col("n") - F.col("p")) - (F.col("cum_n") - F.col("cum_p"))
    jnum = tp * (F.col("n") - F.col("p")) - fp * F.col("p")
    return (
        j.select(
            ((F.col("bk") + 1) * 2000).cast("long").alias("thr_cents"),
            jnum.cast("long").alias("j_num"),
            (F.col("p") * (F.col("n") - F.col("p")))
            .cast("long")
            .alias("j_den"),
            F.round(
                tp.cast("double") / F.col("p")
                - fp.cast("double") / (F.col("n") - F.col("p")),
                6,
            ).alias("ks_separation"),
            F.col("bk").alias("_bk"),
        )
        .orderBy(F.desc("j_num"), "_bk")
        .limit(1)
        .drop("_bk")
    )


@query(
    "q_ml_cluster_quality",
    oracle="""
    WITH c AS (
        SELECT vec_id, label,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT)
                   AS q
        FROM embeddings
    ),
    cent AS (
        SELECT label, d,
               CASE WHEN sum(q) < 0
                    THEN -(abs(sum(q)) // count(*))
                    ELSE abs(sum(q)) // count(*) END AS cq
        FROM c GROUP BY 1, 2
    ),
    intra AS (
        SELECT c.label,
               CAST(count(DISTINCT c.vec_id) AS BIGINT) AS n,
               CAST(sum((c.q - ce.cq) * (c.q - ce.cq)) AS BIGINT)
                   AS intra_sum
        FROM c JOIN cent ce ON ce.label = c.label AND ce.d = c.d
        GROUP BY 1
    ),
    cpair AS (
        SELECT a.label AS la, b.label AS lb,
               CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT) AS d2
        FROM cent a JOIN cent b ON a.d = b.d AND a.label <> b.label
        GROUP BY 1, 2
    ),
    nearest AS (
        SELECT la AS label, lb AS nearest_label, d2 AS inter_d2
        FROM (
            SELECT la, lb, d2,
                   row_number() OVER (PARTITION BY la
                                      ORDER BY d2, lb) AS rk
            FROM cpair) WHERE rk = 1
    )
    SELECT i.label, i.n, i.intra_sum,
           CAST(n2.nearest_label AS INT) AS nearest_label,
           n2.inter_d2,
           round(CAST(i.intra_sum AS DOUBLE) / i.n / n2.inter_d2, 6)
               AS db_ratio
    FROM intra i JOIN nearest n2 ON n2.label = i.label
    """,
)
def q_ml_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality audit per label: mean intra-cluster squared
    distance to the label centroid over the squared distance to the
    NEAREST other centroid — the Davies–Bouldin-style separation
    ratio (≥ ~1 means the "clusters" are not separated, which on
    these uniform-random labels is the expected finding).

    Centroids are toward-zero integer means (the sign-safe |s|//n
    form both engines agree on), so every distance is an exact BIGINT
    and the only float is the final ratio.  Plan: cells → per-(label,
    dim) centroid agg (k·dim rows, broadcast back), one intra
    aggregate, a k²·dim centroid-pair join — all keyed, nothing
    driver-side.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("p", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("p") + 1).alias("d"),
        F.expr(
            "cast(round(cast(x as double) * 1000000) as bigint)"
        ).alias("q"),
    ).cache()
    cent = cells.groupBy("label", "d").agg(
        F.when(
            F.sum("q") < 0,
            -F.expr("abs(sum(q)) div count(*)"),
        )
        .otherwise(F.expr("abs(sum(q)) div count(*)"))
        .alias("cq")
    ).cache()
    intra = (
        cells.join(
            F.broadcast(cent.withColumnRenamed("label", "lbl")),
            (F.col("lbl") == F.col("label")) & (cent.d == cells.d),
        )
        .groupBy("label")
        .agg(
            F.countDistinct("vec_id").cast("long").alias("n"),
            F.sum(
                (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
            )
            .cast("long")
            .alias("intra_sum"),
        )
    )
    a = cent.alias("a")
    b = cent.alias("b")
    cpair = (
        a.join(
            b,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.label") != F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("la"), F.col("b.label").alias("lb")
        )
        .agg(
            F.sum(
                (F.col("a.cq") - F.col("b.cq"))
                * (F.col("a.cq") - F.col("b.cq"))
            )
            .cast("long")
            .alias("d2")
        )
    )
    wn = Window.partitionBy("la").orderBy("d2", "lb")
    nearest = (
        cpair.withColumn("rk", F.row_number().over(wn))
        .where(F.col("rk") == 1)
        .select(
            F.col("la").alias("label"),
            F.col("lb").cast("int").alias("nearest_label"),
            F.col("d2").alias("inter_d2"),
        )
    )
    return intra.join(F.broadcast(nearest), "label").select(
        "label",
        "n",
        "intra_sum",
        "nearest_label",
        "inter_d2",
        F.round(
            F.col("intra_sum").cast("double")
            / F.col("n")
            / F.col("inter_d2"),
            6,
        ).alias("db_ratio"),
    )


@query(
    "q_ml_auc",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pv AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS ct,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT vc, ct, pos,
               sum(ct) OVER (ORDER BY vc) AS cum_n
        FROM pv
    ),
    r AS (
        SELECT CAST(sum(pos * (2 * (cum_n - ct) + ct + 1)) AS BIGINT)
                   AS r2,
               CAST(sum(pos) AS BIGINT) AS n1,
               CAST(sum(ct) - sum(pos) AS BIGINT) AS n2
        FROM cum
    )
    SELECT n1, n2,
           CAST(r2 - n1 * (n1 + 1) AS BIGINT) AS auc_num,
           CAST(2 * n1 * n2 AS BIGINT) AS auc_den,
           round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / (2 * n1 * n2), 6)
               AS auc,
           round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / (n1 * n2) - 1, 6)
               AS gini_coef
    FROM r
    """,
)
def q_ml_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of "value predicts purchase (vs view)" via the
    rank statistic AUC = U/(n₁n₂): tie-averaged ranks carried as 2×
    integers (the q_stat_mannwhitney discipline), so the numerator
    R₂ − n₁(n₁+1) and denominator 2n₁n₂ are exact BIGINTs and the
    metric hash-matches to the last tie — no trapezoid float
    integration anywhere.  Gini coefficient (2·AUC − 1) rides along.

    Cumulative counts run on the per-distinct-value aggregate through
    the two-level scan; one final scalar row.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    pv = s.groupBy("vc").agg(
        F.count("*").alias("ct"), F.sum("y").cast("long").alias("pos")
    )
    cum = bucketed_running_sum(
        pv,
        F.expr("vc div 2000"),
        [F.col("vc")],
        {"cum_n": F.col("ct")},
    )
    r = cum.agg(
        F.sum(
            F.col("pos")
            * (2 * (F.col("cum_n") - F.col("ct")) + F.col("ct") + 1)
        )
        .cast("long")
        .alias("r2"),
        F.sum("pos").cast("long").alias("n1"),
        (F.sum("ct") - F.sum("pos")).cast("long").alias("n2"),
    )
    num = F.col("r2") - F.col("n1") * (F.col("n1") + 1)
    den = 2 * F.col("n1") * F.col("n2")
    return r.select(
        "n1",
        "n2",
        num.cast("long").alias("auc_num"),
        den.cast("long").alias("auc_den"),
        F.round(num.cast("double") / den, 6).alias("auc"),
        F.round(
            num.cast("double") / (F.col("n1") * F.col("n2")) - 1, 6
        ).alias("gini_coef"),
    )


@query(
    "q_ml_pr_auc",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pv AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS ct,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT vc, ct, pos,
               sum(ct)  OVER (ORDER BY vc DESC) AS cum_n,
               sum(pos) OVER (ORDER BY vc DESC) AS cum_tp
        FROM pv
    ),
    r AS (
        SELECT CAST(sum((pos * cum_tp * 1000000) // cum_n) AS BIGINT)
                   AS ap_num,
               CAST(sum(pos) AS BIGINT) AS n1,
               CAST(sum(ct) - sum(pos) AS BIGINT) AS n2
        FROM cum
    )
    SELECT n1, n2, ap_num,
           round(CAST(ap_num AS DOUBLE)
                 / (CAST(1000000 AS DOUBLE) * n1), 6) AS pr_auc,
           round(CAST(n1 AS DOUBLE) / (n1 + n2), 6) AS prevalence
    FROM r
    """,
)
def q_ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact area under the PRECISION-RECALL curve ("average
    precision", sklearn's step interpolation: Σ_t Δrecall_t·P_t over
    descending score thresholds) for the same "value predicts purchase
    (vs view)" task as q_ml_auc — the companion the imbalanced-class
    eval needs, where ROC AUC flatters (its baseline is 0.5 regardless
    of prevalence; PR's is the prevalence, emitted alongside).

    Determinism: per threshold the term Δtp·P_t = pos·cum_tp/cum_n is
    carried as the exact fixed-point BIGINT (pos·cum_tp·10⁶) div cum_n
    — floor division of non-negative BIGINTs, identical in both
    engines (the sign-safe rule never triggers), so the sum is an
    exact integer and the metric IS defined as that 1e-6 fixed-point
    value (one final division).  Magnitude: pos·cum_tp·10⁶ ≤ n₁²·10⁶
    ≈ 4e14 at sf0.1; beyond ~3e6 positives move the product to
    DECIMAL(38,0).

    Scale shape: one scan → per-distinct-value hash agg; the global
    descending cumulative runs through the two-level bucketed scan
    (plans/prefix), never a single-partition window; one scalar row
    out."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    pv = s.groupBy("vc").agg(
        F.count("*").alias("ct"), F.sum("y").cast("long").alias("pos")
    ).withColumn("negv", -F.col("vc"))
    cum = bucketed_running_sum(
        pv,
        F.expr("negv div 2000"),
        [F.col("negv")],
        {"cum_n": F.col("ct"), "cum_tp": F.col("pos")},
    )
    r = cum.agg(
        F.sum(
            F.expr("(pos * cum_tp * 1000000) div cum_n")
        )
        .cast("long")
        .alias("ap_num"),
        F.sum("pos").cast("long").alias("n1"),
        (F.sum("ct") - F.sum("pos")).cast("long").alias("n2"),
    )
    return r.select(
        "n1",
        "n2",
        "ap_num",
        F.round(
            F.col("ap_num").cast("double")
            / (F.lit(1000000).cast("double") * F.col("n1")),
            6,
        ).alias("pr_auc"),
        F.round(
            F.col("n1").cast("double") / (F.col("n1") + F.col("n2")), 6
        ).alias("prevalence"),
    )


_ABS_ITERS = 12
_ABS_SCALE = 10**6


def _absorption_oracle(iters: int = _ABS_ITERS) -> str:
    """Unrolled truncated-expectation iteration v ← 1 + P_transient·v
    with fixed-point 1e6 probabilities — mirrors the Spark loop."""
    sc = _ABS_SCALE
    parts = [
        f"""
    WITH edges AS (
        SELECT prev AS src, event_type AS dst, CAST(count(*) AS BIGINT) AS w
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
        WHERE prev IS NOT NULL
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY 1),
    ep AS (
        SELECT e.src, e.dst, (e.w * {sc}) // o.tw AS p
        FROM edges e JOIN outw o ON e.src = o.src
        WHERE e.src <> 'purchase' AND e.dst <> 'purchase'
    ),
    states AS (
        SELECT DISTINCT event_type AS s FROM events
        WHERE event_type <> 'purchase'
    ),
    v0 AS (SELECT s, CAST(0 AS BIGINT) AS v FROM states)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"""
    v{i} AS (
        SELECT st.s,
               {sc} + CAST(coalesce(sum((ep.p * vv.v) // {sc}), 0)
                           AS BIGINT) AS v
        FROM states st
        LEFT JOIN ep ON ep.src = st.s
        LEFT JOIN v{p} vv ON vv.s = ep.dst
        GROUP BY st.s
    )"""
        )
    body = ",".join(parts)
    return f"""{body}
    SELECT s AS state,
           CAST(v AS BIGINT) AS steps_scaled,
           round(v / {sc}.0, 4) AS expected_steps_h{iters}
    FROM v{iters}
    ORDER BY s
    """


@query("q_graph_absorption", oracle=_absorption_oracle())
def q_graph_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-Markov-chain analysis: the expected number of steps
    to reach the 'purchase' state from each other behavioral state,
    truncated at a 12-step horizon (v ← 1 + P_transient·v iterated —
    the fundamental-matrix quantity funnel optimization actually
    wants, not just next-step probabilities).

    Same fixed-point discipline as q_graph_pagerank: probabilities
    floor to 1e-6, v is a scaled integer, every update an exact
    multiply/floor-div/sum, so the truncated expectation hash-matches
    the oracle's unrolled CTE chain.  Each iteration is one broadcast
    join + one keyed aggregate over the transient edge list.
    """
    ev = load_table(spark, sf_dir, "events")
    sc = _ABS_SCALE
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    ep = (
        edges.join(outw, "src")
        .where((F.col("src") != "purchase") & (F.col("dst") != "purchase"))
        .select("src", "dst", F.expr(f"(w * {sc}) div tw").alias("p"))
        .cache()
    )
    states = (
        ev.where(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("s"))
        .distinct()
        .cache()
    )
    # Driver fold on the bounded type graph (r11 opt — see
    # graph_ops.GRAPH_DRIVER_MAX_NODES): 12 broadcast-join rounds cost
    # ~6 s of pure job overhead at |states| = 4; the same non-negative
    # integer arithmetic runs exactly in Python (// ≡ div), collected
    # once, oracle-identical.  Above the gate the distributed loop
    # below is untouched.
    from events_to_db_spark.operators.graph_ops import (
        _graph_driver_max_nodes,
    )

    state_list = [r["s"] for r in states.collect()]
    if 0 < len(state_list) <= _graph_driver_max_nodes():
        ep_rows = [(r["src"], r["dst"], r["p"]) for r in ep.collect()]
        v_d = {s: 0 for s in state_list}
        for _ in range(_ABS_ITERS):
            contrib: dict = {}
            for src, dst, p in ep_rows:
                if dst in v_d and src in v_d:
                    contrib[src] = contrib.get(src, 0) + (p * v_d[dst]) // sc
            v_d = {s: sc + contrib.get(s, 0) for s in state_list}
        out = spark.createDataFrame(
            sorted(v_d.items()), "s string, v long"
        )
        return out.select(
            F.col("s").alias("state"),
            F.col("v").alias("steps_scaled"),
            F.round(F.col("v") / F.lit(float(sc)), 4).alias(
                f"expected_steps_h{_ABS_ITERS}"
            ),
        ).orderBy("state")
    v = states.select("s", F.lit(0).cast("long").alias("v"))
    for _ in range(_ABS_ITERS):
        contrib = (
            ep.join(v, ep.dst == v.s)
            .groupBy("src")
            .agg(F.sum(F.expr(f"(p * v) div {sc}")).alias("c"))
        )
        v = (
            states.join(
                F.broadcast(contrib), states.s == contrib.src, "left"
            )
            .select(
                "s",
                (
                    F.lit(sc)
                    + F.coalesce(F.col("c"), F.lit(0))
                ).cast("long").alias("v"),
            )
            .transform(lambda d: truncate_lineage(d, eager=False))
        )
    return v.select(
        F.col("s").alias("state"),
        F.col("v").alias("steps_scaled"),
        F.round(F.col("v") / F.lit(float(sc)), 4).alias(
            f"expected_steps_h{_ABS_ITERS}"
        ),
    ).orderBy("state")


@query(
    "q_ml_fairness",
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS cohort,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS converted,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS views
        FROM events GROUP BY 1, 2
    ),
    band AS (
        SELECT least(views // 5, 3) AS view_band, cohort,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(converted) AS BIGINT) AS conv
        FROM u GROUP BY 1, 2
    ),
    piv AS (
        SELECT view_band,
               CAST(max(CASE WHEN cohort = 0 THEN n END) AS BIGINT) AS n0,
               CAST(max(CASE WHEN cohort = 0 THEN conv END) AS BIGINT)
                   AS c0,
               CAST(max(CASE WHEN cohort = 1 THEN n END) AS BIGINT) AS n1,
               CAST(max(CASE WHEN cohort = 1 THEN conv END) AS BIGINT)
                   AS c1
        FROM band GROUP BY 1
    )
    SELECT CAST(view_band AS BIGINT) AS view_band, n0, c0, n1, c1,
           round(CAST(c0 AS DOUBLE) / n0, 6) AS rate_0,
           round(CAST(c1 AS DOUBLE) / n1, 6) AS rate_1,
           CAST(CASE WHEN 5 * c1 * n0 < 4 * c0 * n1
                     OR 5 * c0 * n1 < 4 * c1 * n0
                     THEN 1 ELSE 0 END AS INT) AS di_violation
    FROM piv
    """,
)
def q_ml_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disparate-impact audit: conversion rates of the two user-id
    cohorts compared within matched exposure bands (views//5, capped),
    flagging bands where either cohort's rate falls below 4/5 of the
    other — the 80% rule, evaluated as the exact cross-multiplication
    5·c₁·n₀ < 4·c₀·n₁ so the flag never touches a float.

    Banding controls for exposure (the classic confounder in raw-rate
    comparisons); display rates round once.  Two keyed aggregates +
    a |bands|-row pivot.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("cohort")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("converted"),
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        )
        .cast("long")
        .alias("views"),
    )
    band = u.groupBy(
        F.least(F.expr("views div 5"), F.lit(3)).alias("view_band"),
        "cohort",
    ).agg(
        F.count("*").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    piv = band.groupBy("view_band").agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n")))
        .cast("long")
        .alias("n0"),
        F.max(F.when(F.col("cohort") == 0, F.col("conv")))
        .cast("long")
        .alias("c0"),
        F.max(F.when(F.col("cohort") == 1, F.col("n")))
        .cast("long")
        .alias("n1"),
        F.max(F.when(F.col("cohort") == 1, F.col("conv")))
        .cast("long")
        .alias("c1"),
    )
    viol = F.when(
        (5 * F.col("c1") * F.col("n0") < 4 * F.col("c0") * F.col("n1"))
        | (5 * F.col("c0") * F.col("n1") < 4 * F.col("c1") * F.col("n0")),
        1,
    ).otherwise(0)
    return piv.select(
        F.col("view_band").cast("long").alias("view_band"),
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(F.col("c0").cast("double") / F.col("n0"), 6).alias(
            "rate_0"
        ),
        F.round(F.col("c1").cast("double") / F.col("n1"), 6).alias(
            "rate_1"
        ),
        viol.cast("int").alias("di_violation"),
    )


_RIDGE_LAMBDA = 1000


def _ridge_cramer() -> tuple[str, str, str, str]:
    """Cramer's-rule expressions for the 3x3 ridge normal equations,
    shared verbatim by both engines (fixed operation order — the
    Levene pattern).  Matrix M = [[n,sx1,sx2],[sx1,q11+L,q12],
    [sx2,q12,q22+L]], rhs b = [sy,p1,p2]; every moment is an exact
    BIGINT < 2^53, so the double products/sums are bit-identical."""
    L = _RIDGE_LAMBDA
    m = {
        "a": "CAST(n AS DOUBLE)",
        "b": "CAST(sx1 AS DOUBLE)",
        "c": "CAST(sx2 AS DOUBLE)",
        "e": f"CAST(q11 + {L} AS DOUBLE)",
        "f": "CAST(q12 AS DOUBLE)",
        "g": f"CAST(q22 + {L} AS DOUBLE)",
        "y0": "CAST(sy AS DOUBLE)",
        "y1": "CAST(p1 AS DOUBLE)",
        "y2": "CAST(p2 AS DOUBLE)",
    }

    def det(c0, c1, c2):
        # 3x3 determinant of columns c0,c1,c2 (each a (row0,row1,row2)
        # triple of expression strings), written in one fixed order.
        return (
            f"({c0[0]} * ({c1[1]} * {c2[2]} - {c1[2]} * {c2[1]})"
            f" - {c1[0]} * ({c0[1]} * {c2[2]} - {c0[2]} * {c2[1]})"
            f" + {c2[0]} * ({c0[1]} * {c1[2]} - {c0[2]} * {c1[1]}))"
        )

    c0 = (m["a"], m["b"], m["c"])
    c1 = (m["b"], m["e"], m["f"])
    c2 = (m["c"], m["f"], m["g"])
    by = (m["y0"], m["y1"], m["y2"])
    return det(c0, c1, c2), det(by, c1, c2), det(c0, by, c2), det(c0, c1, by)


@query(
    "q_ml_ridge",
    oracle=f"""
    WITH mo AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1) AS BIGINT) AS sx1,
               CAST(sum(x2) AS BIGINT) AS sx2,
               CAST(sum(x1 * x1) AS BIGINT) AS q11,
               CAST(sum(x1 * x2) AS BIGINT) AS q12,
               CAST(sum(x2 * x2) AS BIGINT) AS q22,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x1 * y) AS BIGINT) AS p1,
               CAST(sum(x2 * y) AS BIGINT) AS p2
        FROM (
            SELECT CAST(hour(ts) AS BIGINT) AS x1,
                   CAST(dayofweek(ts) + 1 AS BIGINT) AS x2,
                   CAST(round(value * 100) AS BIGINT) AS y
            FROM events
        )
    )
    SELECT n, {_RIDGE_LAMBDA} AS lambda,
           round({_ridge_cramer()[1]} / {_ridge_cramer()[0]}, 6) AS beta0,
           round({_ridge_cramer()[2]} / {_ridge_cramer()[0]}, 6) AS beta1,
           round({_ridge_cramer()[3]} / {_ridge_cramer()[0]}, 6) AS beta2
    FROM mo
    """,
)
def q_ml_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression as ONE distributed aggregation —
    "model training is just moments": predict event value (cents) from
    hour-of-day and day-of-week by accumulating the 9 normal-equation
    moments (all exact BIGINTs — order/partition-independent sums),
    then solving (XᵀX + λI)β = Xᵀy by Cramer's rule in a single
    fixed-operation-order double expression per coefficient.

    This is the pattern that trains linear models at 100 TB with zero
    iterations: the XᵀX/Xᵀy moments partial-aggregate map-side and the
    3×3 solve is driver-free arithmetic on one row.  Every moment is
    < 2^53 so the double casts are exact; both engines evaluate the
    same literal Cramer string, so the hash matches (§7.5; Levene
    pattern).  λ = 1000 on the non-intercept diagonal."""
    d, d0, d1, d2 = _ridge_cramer()
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("long").alias("x1"),
        (F.dayofweek("ts")).cast("long").alias("x2"),
        F.expr("cast(round(value * 100) as bigint)").alias("y"),
    )
    mo = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast("long").alias("sx1"),
        F.sum("x2").cast("long").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("q11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("q12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("q22"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("p1"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("p2"),
    )
    return mo.select(
        "n",
        F.lit(_RIDGE_LAMBDA).alias("lambda"),
        F.round(F.expr(d0) / F.expr(d), 6).alias("beta0"),
        F.round(F.expr(d1) / F.expr(d), 6).alias("beta1"),
        F.round(F.expr(d2) / F.expr(d), 6).alias("beta2"),
    )


@query(
    "q_ml_item_cosine",
    oracle="""
    WITH ui AS (
        SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    np AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM ui GROUP BY 1),
    co AS (
        SELECT a.p AS part_a, b.p AS part_b,
               CAST(count(*) AS BIGINT) AS co
        FROM ui a JOIN ui b ON a.u = b.u AND a.p < b.p
        GROUP BY 1, 2
    )
    SELECT c.part_a, c.part_b, c.co,
           na.n AS n_a, nb.n AS n_b,
           round(c.co / sqrt(CAST(na.n * nb.n AS DOUBLE)), 4) AS cos
    FROM co c
    JOIN np na ON na.p = c.part_a
    JOIN np nb ON nb.p = c.part_b
    ORDER BY c.co DESC, c.part_a, c.part_b
    LIMIT 20
    """,
)
def q_ml_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item–item collaborative-filtering similarity on implicit
    feedback: the binary customer×part purchase matrix, top-20 part
    pairs by co-purchase count with their cosine similarity
    co/√(n_a·n_b) — the classic "customers who bought X also bought Y"
    scorer (Amazon item-to-item CF), computed as pure aggregation.

    Everything is exact integers until one final float op per
    surviving pair; ordering is on the integer co-count with part-id
    tie-breaks, so no float argmax crosses the engines (§7.5).  Shape:
    distinct user–item pairs, a per-user self-join (quadratic only in
    each user's basket width, never in users), two hash-aggs, top-k.
    At 100 TB the per-user fan-out is bounded by the basket-width cap
    a real recommender would enforce anyway."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ui = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    np_ = ui.groupBy("p").agg(F.count("*").cast("long").alias("n"))
    a = ui.select("u", F.col("p").alias("part_a"))
    b = ui.select("u", F.col("p").alias("part_b"))
    co = (
        a.join(b, "u")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("co"))
    )
    na = np_.select(F.col("p").alias("part_a"), F.col("n").alias("n_a"))
    nb = np_.select(F.col("p").alias("part_b"), F.col("n").alias("n_b"))
    return (
        co.join(na, "part_a")
        .join(nb, "part_b")
        .orderBy(F.col("co").desc(), "part_a", "part_b")
        .limit(20)
        .select(
            "part_a",
            "part_b",
            "co",
            "n_a",
            "n_b",
            F.round(
                F.col("co") / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")),
                4,
            ).alias("cos"),
        )
    )


@query(
    "q_ml_target_encode",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(event_id % 5 AS INT) AS fold,
               CASE WHEN value > 250 THEN 1 ELSE 0 END AS y
        FROM events
    ),
    per AS (
        SELECT event_type, fold,
               CAST(count(*) AS BIGINT) AS n_f,
               CAST(sum(y) AS BIGINT) AS pos_f
        FROM base GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type,
               CAST(sum(n_f) AS BIGINT) AS n_t,
               CAST(sum(pos_f) AS BIGINT) AS pos_t
        FROM per GROUP BY 1
    )
    SELECT p.event_type, p.fold,
           p.n_f AS n_fold,
           t.pos_t - p.pos_f AS oof_pos,
           t.n_t - p.n_f AS oof_n,
           round(CAST(t.pos_t - p.pos_f AS DOUBLE)
                 / (t.n_t - p.n_f), 6) AS oof_encoding,
           round(CAST(t.pos_t AS DOUBLE) / t.n_t, 6) AS full_rate
    FROM per p JOIN tot t USING (event_type)
    ORDER BY p.event_type, p.fold
    """,
)
def q_ml_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free K-fold target encoding — the feature-engineering
    primitive that turns a categorical column into the target rate
    WITHOUT letting a row see its own label: each (category, fold)
    cell is encoded with the positive rate computed from the OTHER
    four folds (out-of-fold statistics by subtraction: one pass
    computes per-fold counts, the out-of-fold encoding is
    (pos_total − pos_fold)/(n_total − n_fold) — no second scan, no
    per-fold recomputation).

    Everything is exact integers until the two final divisions, so the
    encodings hash-match; folds are deterministic (event_id % 5).  At
    100 TB this is the only affordable shape: K scans of the data
    (the naive formulation) collapse into ONE aggregate plus a 25-row
    subtraction."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.col("event_id") % 5).cast("int").alias("fold"),
        F.when(F.col("value") > 250, 1).otherwise(0).alias("y"),
    )
    per = base.groupBy("event_type", "fold").agg(
        F.count("*").cast("long").alias("n_f"),
        F.sum("y").cast("long").alias("pos_f"),
    )
    tot = per.groupBy("event_type").agg(
        F.sum("n_f").cast("long").alias("n_t"),
        F.sum("pos_f").cast("long").alias("pos_t"),
    )
    return (
        per.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "fold",
            F.col("n_f").alias("n_fold"),
            (F.col("pos_t") - F.col("pos_f")).alias("oof_pos"),
            (F.col("n_t") - F.col("n_f")).alias("oof_n"),
            F.round(
                (F.col("pos_t") - F.col("pos_f")).cast("double")
                / (F.col("n_t") - F.col("n_f")),
                6,
            ).alias("oof_encoding"),
            F.round(F.col("pos_t").cast("double") / F.col("n_t"), 6).alias(
                "full_rate"
            ),
        )
        .orderBy("event_type", "fold")
    )


@query(
    "q_ml_woe",
    oracle="""
    WITH lab AS (
        SELECT least(CAST(round(value * 100) AS BIGINT) // 5000, 9) AS bin,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS bad
        FROM events
        WHERE event_type IN ('purchase', 'error')
    ),
    per AS (
        SELECT bin,
               CAST(sum(good) AS BIGINT) AS g,
               CAST(sum(bad) AS BIGINT)  AS b
        FROM lab GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt
        FROM per
    )
    SELECT CAST(p.bin AS INT) AS bin, p.g AS n_good, p.b AS n_bad,
           CASE WHEN p.g > 0 AND p.b > 0
                THEN round(ln((CAST(p.g AS DOUBLE) * t.bt)
                              / (CAST(p.b AS DOUBLE) * t.gt)), 6)
           END AS woe,
           CASE WHEN p.g > 0 AND p.b > 0
                THEN round((CAST(p.g AS DOUBLE) / t.gt
                            - CAST(p.b AS DOUBLE) / t.bt)
                           * ln((CAST(p.g AS DOUBLE) * t.bt)
                                / (CAST(p.b AS DOUBLE) * t.gt)), 6)
           END AS iv_term
    FROM per p CROSS JOIN tot t
    ORDER BY p.bin
    """,
)
def q_ml_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value binning — the credit-
    scoring feature transform: event values bucketed into ten fixed
    50-unit bins, each bin scored WoE = ln((g/G)/(b/B)) with purchase
    as "good" and error as "bad", plus the bin's IV contribution
    (g/G − b/B)·WoE.  Bins with a zero class stay NULL rather than
    ±∞ (the smoothing decision is the caller's).

    All counts are exact integers; WoE is one log of an exact rational
    (g·B)/(b·G) — no accumulated float sums, so 10 rows hash-match.
    One scan, one 10-row pivot — the shape that computes WoE tables
    over a 100 TB loan book."""
    ev = load_table(spark, sf_dir, "events")
    lab = ev.filter(F.col("event_type").isin("purchase", "error")).select(
        F.least(
            F.expr("cast(round(value * 100) as bigint) div 5000"), F.lit(9)
        ).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("good"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("bad"),
    )
    per = lab.groupBy("bin").agg(
        F.sum("good").cast("long").alias("g"),
        F.sum("bad").cast("long").alias("b"),
    )
    tot = per.agg(
        F.sum("g").cast("long").alias("gt"), F.sum("b").cast("long").alias("bt")
    )
    ratio = (F.col("g").cast("double") * F.col("bt")) / (
        F.col("b").cast("double") * F.col("gt")
    )
    ok = (F.col("g") > 0) & (F.col("b") > 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("int").alias("bin"),
            F.col("g").alias("n_good"),
            F.col("b").alias("n_bad"),
            F.when(ok, F.round(F.log(ratio), 6)).alias("woe"),
            F.when(
                ok,
                F.round(
                    (
                        F.col("g").cast("double") / F.col("gt")
                        - F.col("b").cast("double") / F.col("bt")
                    )
                    * F.log(ratio),
                    6,
                ),
            ).alias("iv_term"),
        )
        .orderBy("bin")
    )


@query(
    "q_ml_lift",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS spend,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT converted,
               ntile(10) OVER (ORDER BY spend DESC, user_id) AS decile
        FROM u
    ),
    per AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(converted) AS BIGINT) AS conv
        FROM d GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(conv) AS BIGINT) AS ct
        FROM per
    ),
    cum AS (
        SELECT decile, n, conv,
               sum(n) OVER (ORDER BY decile) AS cum_n,
               sum(conv) OVER (ORDER BY decile) AS cum_conv
        FROM per
    )
    SELECT CAST(c.decile AS INT) AS decile, c.n, c.conv,
           CAST(c.cum_conv AS BIGINT) AS cum_conv,
           round(CAST(c.conv AS DOUBLE) / c.n, 6) AS decile_rate,
           round(CAST(c.cum_conv AS DOUBLE) * t.nt
                 / (CAST(c.cum_n AS DOUBLE) * t.ct), 6) AS cum_lift
    FROM cum c CROSS JOIN tot t
    ORDER BY c.decile
    """,
)
def q_ml_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table — the marketing-model report: users
    ranked by spend (the model score proxy; unique user_id tie-break),
    cut into 10 equal-fill deciles, each row showing the decile's
    conversion rate and the cumulative lift over the base rate
    (cum_conv/cum_n ÷ total_conv/total_n, cross-multiplied so the one
    float division happens on exact integers).

    Scale shape: the global decile rank comes from
    `plans/prefix.bucketed_running_sum` (per-bucket windows + broadcast
    carry — the q_win_distribution pattern), so NO window ever sees the
    full user population in one task; the 10-row cumulative is a
    bounded window.  The oracle's native ntile matches because the
    order is total and the fill rule identical."""
    from events_to_db_spark.plans.prefix import (
        bucketed_running_sum,
        ntile_from_rank,
    )

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)"))
        .cast("long")
        .alias("spend"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    n_tot = u.agg(F.count("*").alias("n_tot"))
    ranked = bucketed_running_sum(
        u.select("user_id", "spend", "converted"),
        bucket=-F.floor(F.col("spend") / F.lit(100000)),
        order_cols=[F.col("spend").desc(), F.col("user_id")],
        sums={"rank": F.lit(1)},
    )
    d = ranked.crossJoin(F.broadcast(n_tot)).select(
        "converted",
        ntile_from_rank(F.col("rank"), F.col("n_tot"), 10)
        .cast("int")
        .alias("decile"),
    )
    per = d.groupBy("decile").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("conv").cast("long").alias("ct"),
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "decile",
        "n",
        "conv",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("conv").over(w).alias("cum_conv"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n",
            "conv",
            F.col("cum_conv").cast("long").alias("cum_conv"),
            F.round(F.col("conv").cast("double") / F.col("n"), 6).alias(
                "decile_rate"
            ),
            F.round(
                F.col("cum_conv").cast("double")
                * F.col("nt")
                / (F.col("cum_n").cast("double") * F.col("ct")),
                6,
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


#: Laplace-style score→probability map for the log-loss: value cents
#: vc ∈ [0, 49000] (value < 490 by construction) → p = (vc+1)/49002,
#: strictly inside (0,1) so both ln terms are finite at every SF.
_LL_DEN = 49002


@query(
    "q_ml_logloss",
    oracle=f"""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pv AS (
        SELECT vc, CAST(sum(y) AS BIGINT) AS pos,
               CAST(count(*) - sum(y) AS BIGINT) AS neg
        FROM s GROUP BY 1
    ),
    terms AS (
        SELECT CAST(sum(
                   pos * CAST(floor(CAST(-1000000 AS DOUBLE)
                       * ln(CAST(vc + 1 AS DOUBLE) / {_LL_DEN}))
                       AS BIGINT)
                   + neg * CAST(floor(CAST(-1000000 AS DOUBLE)
                       * ln(CAST({_LL_DEN} - vc - 1 AS DOUBLE) / {_LL_DEN}))
                       AS BIGINT)
               ) AS BIGINT) AS ll_num,
               CAST(sum(pos + neg) AS BIGINT) AS n
        FROM pv
    )
    SELECT n, ll_num,
           round(CAST(ll_num AS DOUBLE) / (CAST(1000000 AS DOUBLE) * n), 6)
               AS logloss
    FROM terms
    """,
)
def q_ml_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-loss (binary cross-entropy) of the Laplace-mapped value
    score on q_ml_auc's purchase-vs-view task — the proper scoring
    rule completing the calibration family (Brier penalizes
    quadratically; log-loss is what training objectives actually
    optimize and punishes confident misses hardest).

    Determinism: scores collapse to their ~49k distinct cent values
    first (exact pos/neg BIGINT counts per value), then each value's
    −ln p and −ln(1−p) are FIXED-POINT: floor(−10⁶·ln(...)) cast to
    BIGINT — ln parity per the q_embed_drift precedent, and the floor
    makes any sub-ulp engine difference vanish into the same integer —
    so the weighted sum is exact BIGINT arithmetic and the metric is
    DEFINED at 1e-6 fixed point (one final division).

    Scale shape: one scan → per-distinct-value hash agg → one scalar
    row; no window, no join."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    pv = s.groupBy("vc").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("neg"),
    )
    terms = pv.agg(
        F.sum(
            F.expr(
                "pos * CAST(floor(CAST(-1000000 AS DOUBLE)"
                f" * ln(CAST(vc + 1 AS DOUBLE) / {_LL_DEN})) AS BIGINT)"
                " + neg * CAST(floor(CAST(-1000000 AS DOUBLE)"
                f" * ln(CAST({_LL_DEN} - vc - 1 AS DOUBLE) / {_LL_DEN}))"
                " AS BIGINT)"
            )
        )
        .cast("long")
        .alias("ll_num"),
        F.sum(F.expr("pos + neg")).cast("long").alias("n"),
    )
    return terms.select(
        "n",
        "ll_num",
        F.round(
            F.col("ll_num").cast("double")
            / (F.lit(1000000).cast("double") * F.col("n")),
            6,
        ).alias("logloss"),
    )


@query(
    "q_ml_youden",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    b AS (
        SELECT vc // 2000 AS bk,
               CAST(count(*) AS BIGINT) AS ct,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT bk,
               sum(ct) OVER (ORDER BY bk) AS cum_n,
               sum(pos) OVER (ORDER BY bk) AS cum_p
        FROM b
    ),
    tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
        FROM b
    )
    SELECT CAST((bk + 1) * 2000 AS BIGINT) AS thr_cents,
           CAST(p - cum_p AS BIGINT) AS tp,
           CAST((n - p) - (cum_n - cum_p) AS BIGINT) AS fp,
           CAST(cum_p AS BIGINT) AS fn,
           CAST(cum_n - cum_p AS BIGINT) AS tn,
           CAST((p - cum_p) * (n - p)
                - ((n - p) - (cum_n - cum_p)) * p AS BIGINT) AS j_num,
           CAST(p * (n - p) AS BIGINT) AS j_den,
           round(CAST((p - cum_p) * (n - p)
                      - ((n - p) - (cum_n - cum_p)) * p AS DOUBLE)
                 / (p * (n - p)), 6) AS youden_j
    FROM cum CROSS JOIN tot
    WHERE p > 0 AND n > p
    ORDER BY (p - cum_p) * (n - p)
                 - ((n - p) - (cum_n - cum_p)) * p DESC,
             bk
    LIMIT 1
    """,
)
def q_ml_youden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Youden's J optimal operating point over the q_ml_roc threshold
    sweep: the $20-grid threshold maximizing J = TPR − FPR — the
    standard "best balanced cut" a deployment picks off the ROC curve
    (q_ml_cost_threshold picks by asymmetric cost; this is the
    cost-free special case, and q_ml_best_f1 the precision-weighted
    one).

    Determinism: J = tp/P − fp/N is maximized as the exact BIGINT
    common-denominator numerator tp·N − fp·P (P, N constant across
    thresholds) with the smaller-threshold tie-break, so the argmax
    never touches a float; the reported youden_j is one final division
    of the exact pair.  Degenerate single-class inputs (P=0 or N=0)
    return zero rows rather than a NULL-scored arbitrary pick.

    Scale shape: identical to q_ml_roc — one hash agg to the $20
    buckets, the two-level bucketed prefix scan, a broadcast 1-row
    total, then a TakeOrdered-1 over |thresholds| rows."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = s.groupBy(F.expr("vc div 2000").alias("bk")).agg(
        F.count("*").alias("ct"), F.sum("y").cast("long").alias("pos")
    )
    cum = bucketed_running_sum(
        b,
        F.col("bk"),
        [F.col("bk")],
        {"cum_n": F.col("ct"), "cum_p": F.col("pos")},
    )
    tot = b.agg(
        F.sum("ct").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    j = cum.crossJoin(F.broadcast(tot)).where(
        (F.col("p") > 0) & (F.col("n") > F.col("p"))
    )
    tp = F.col("p") - F.col("cum_p")
    fp = (F.col("n") - F.col("p")) - (F.col("cum_n") - F.col("cum_p"))
    j_num = tp * (F.col("n") - F.col("p")) - fp * F.col("p")
    j_den = F.col("p") * (F.col("n") - F.col("p"))
    return (
        j.orderBy(j_num.desc(), "bk")
        .limit(1)
        .select(
            ((F.col("bk") + 1) * 2000).cast("long").alias("thr_cents"),
            tp.cast("long").alias("tp"),
            fp.cast("long").alias("fp"),
            F.col("cum_p").cast("long").alias("fn"),
            (F.col("cum_n") - F.col("cum_p")).cast("long").alias("tn"),
            j_num.cast("long").alias("j_num"),
            j_den.cast("long").alias("j_den"),
            F.round(j_num.cast("double") / j_den, 6).alias("youden_j"),
        )
    )


#: Fixed-class-order macro-F1 assembly (the Levene literal-sum
#: pattern): per-class F1 = 2tp/(2tp+fp+fn) is an exact rational;
#: the three-term mean is ONE fixed-order double expression shared
#: verbatim (a common-denominator exact form is (1e8)³ products at
#: 1000× sf0.1 — past BIGINT, so the division happens per class).
_MACRO_F1 = (
    "(CAST(2 * tp_p AS DOUBLE) / (2 * tp_p + fp_p + fn_p)"
    " + CAST(2 * tp_v AS DOUBLE) / (2 * tp_v + fp_v + fn_v)"
    " + CAST(2 * tp_c AS DOUBLE) / (2 * tp_c + fp_c + fn_c)) / 3"
)


@query(
    "q_ml_multiclass",
    oracle=f"""
    WITH s AS (
        SELECT event_type AS y,
               CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000
                         THEN 'purchase'
                    WHEN CAST(round(value * 100) AS BIGINT) >= 2000
                         THEN 'click'
                    ELSE 'view' END AS pred
        FROM events WHERE event_type IN ('purchase', 'view', 'click')
    ),
    cm AS (
        SELECT
            CAST(sum(CASE WHEN y = 'purchase' AND pred = 'purchase'
                     THEN 1 ELSE 0 END) AS BIGINT) AS tp_p,
            CAST(sum(CASE WHEN y <> 'purchase' AND pred = 'purchase'
                     THEN 1 ELSE 0 END) AS BIGINT) AS fp_p,
            CAST(sum(CASE WHEN y = 'purchase' AND pred <> 'purchase'
                     THEN 1 ELSE 0 END) AS BIGINT) AS fn_p,
            CAST(sum(CASE WHEN y = 'view' AND pred = 'view'
                     THEN 1 ELSE 0 END) AS BIGINT) AS tp_v,
            CAST(sum(CASE WHEN y <> 'view' AND pred = 'view'
                     THEN 1 ELSE 0 END) AS BIGINT) AS fp_v,
            CAST(sum(CASE WHEN y = 'view' AND pred <> 'view'
                     THEN 1 ELSE 0 END) AS BIGINT) AS fn_v,
            CAST(sum(CASE WHEN y = 'click' AND pred = 'click'
                     THEN 1 ELSE 0 END) AS BIGINT) AS tp_c,
            CAST(sum(CASE WHEN y <> 'click' AND pred = 'click'
                     THEN 1 ELSE 0 END) AS BIGINT) AS fp_c,
            CAST(sum(CASE WHEN y = 'click' AND pred <> 'click'
                     THEN 1 ELSE 0 END) AS BIGINT) AS fn_c,
            CAST(count(*) AS BIGINT) AS n
        FROM s
    )
    SELECT tp_p, fp_p, fn_p, tp_v, fp_v, fn_v, tp_c, fp_c, fn_c, n,
           CAST(tp_p + tp_v + tp_c AS BIGINT) AS acc_num,
           round(CAST(tp_p + tp_v + tp_c AS DOUBLE) / n, 6)
               AS micro_f1,
           round({_MACRO_F1}, 6) AS macro_f1
    FROM cm
    """,
)
def q_ml_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class evaluation panel — the 3×3 confusion matrix of the
    fixed value-threshold classifier (≥$50 → purchase, ≥$20 → click,
    else view) with micro-F1 (= accuracy for single-label multi-class)
    and macro-F1.  Every other metric in the ML-eval family is binary;
    this is the multi-class surface (macro averaging weights the rare
    purchase class equally — THE reason macro/micro diverge on
    imbalanced logs).

    Determinism: all nine confusion cells are exact BIGINTs from ONE
    scan and one 10-column conditional aggregate (the q_curate_funnel
    shape); micro-F1 is one exact division; macro-F1 is a fixed-class
    -order literal double expression over the exact cells (per-class
    denominators 2tp+fp+fn are nonzero whenever the class appears on
    either side; the three classes here are guaranteed by the WHERE).

    Scale shape: one scan → one 1-row hash aggregate, no shuffle
    beyond the final 1-row merge."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(
        F.col("event_type").isin("purchase", "view", "click")
    ).select(
        F.col("event_type").alias("y"),
        F.when(
            F.expr("CAST(round(value * 100) AS BIGINT)") >= 5000,
            "purchase",
        )
        .when(F.expr("CAST(round(value * 100) AS BIGINT)") >= 2000, "click")
        .otherwise("view")
        .alias("pred"),
    )

    def cell(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(alias)

    y, p = F.col("y"), F.col("pred")
    cm = s.agg(
        cell((y == "purchase") & (p == "purchase"), "tp_p"),
        cell((y != "purchase") & (p == "purchase"), "fp_p"),
        cell((y == "purchase") & (p != "purchase"), "fn_p"),
        cell((y == "view") & (p == "view"), "tp_v"),
        cell((y != "view") & (p == "view"), "fp_v"),
        cell((y == "view") & (p != "view"), "fn_v"),
        cell((y == "click") & (p == "click"), "tp_c"),
        cell((y != "click") & (p == "click"), "fp_c"),
        cell((y == "click") & (p != "click"), "fn_c"),
        F.count("*").cast("long").alias("n"),
    )
    acc = F.col("tp_p") + F.col("tp_v") + F.col("tp_c")
    return cm.select(
        "tp_p", "fp_p", "fn_p", "tp_v", "fp_v", "fn_v",
        "tp_c", "fp_c", "fn_c", "n",
        acc.cast("long").alias("acc_num"),
        F.round(acc.cast("double") / F.col("n"), 6).alias("micro_f1"),
        F.round(F.expr(_MACRO_F1), 6).alias("macro_f1"),
    )


_PSM_PACK = 2**33  # packed match key: score·2³³ + user_id


@query(
    "q_ml_psm",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS score,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS treated
        FROM events GROUP BY user_id
    ),
    p AS (
        SELECT user_id, score, y, treated,
               CASE WHEN treated = 0
                    THEN score * {_PSM_PACK} + user_id END AS packed
        FROM u
    ),
    m AS (
        SELECT user_id, score, y, treated,
               max(packed) OVER (ORDER BY score, treated, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS back_p,
               min(packed) OVER (ORDER BY score, treated, user_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS fwd_p
        FROM p
    ),
    ch AS (
        SELECT user_id, score, y,
               CASE
                   WHEN back_p IS NULL THEN fwd_p % {_PSM_PACK}
                   WHEN fwd_p IS NULL THEN back_p % {_PSM_PACK}
                   WHEN score - back_p // {_PSM_PACK}
                        <= fwd_p // {_PSM_PACK} - score
                       THEN back_p % {_PSM_PACK}
                   ELSE fwd_p % {_PSM_PACK}
               END AS chosen_uid
        FROM m WHERE treated = 1
    ),
    att AS (
        SELECT CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(ch.y) AS BIGINT) AS sum_y_t,
               CAST(sum(c.y) AS BIGINT) AS sum_y_c
        FROM ch JOIN u c ON c.user_id = ch.chosen_uid
        WHERE ch.chosen_uid IS NOT NULL
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM u WHERE treated = 1)
               AS n_treated,
           n_matched, sum_y_t, sum_y_c,
           CASE WHEN n_matched > 0 THEN
               round(CAST(sum_y_t - sum_y_c AS DOUBLE) / n_matched, 4)
           END AS att_views
    FROM att
    """,
)
def q_ml_psm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor matching ATT (the propensity-score-matching
    estimator shape, with the click covariate as the score): every
    purchasing user is matched — with replacement — to the
    non-purchasing user nearest in click count, and ATT = mean(y_t −
    y_match) on the view-count outcome.  Completes the causal family:
    q_ev_cuped (variance reduction), q_ev_did (parallel trends),
    q_ev_event_study (dynamics) — this is the cross-sectional
    matching leg.

    Determinism: matching runs on the packed BIGINT score·2³³+uid, so
    nearest-below is a running MAX over preceding controls and
    nearest-above a running MIN over following controls in the total
    (score, treated, uid) order — ties inside a score resolve to the
    largest/smallest control uid, distance ties prefer the backward
    match (all stated, all integer); ATT is one final division of
    exact sums.

    Scale shape: the Spark side runs both carries through
    ``bucketed_running_max`` (two-level scan, score-range buckets) —
    no unpartitioned window over the user dimension, the exact reason
    the oracle's plain SQL window is NOT the Spark plan; the outcome
    re-join is keyed on the matched uid."""
    from events_to_db_spark.plans.prefix import bucketed_running_max

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("score"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("y"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("treated"),
    )
    p = u.withColumn(
        "packed",
        F.when(
            F.col("treated") == 0,
            F.col("score") * _PSM_PACK + F.col("user_id"),
        ),
    )
    fwd = bucketed_running_max(
        p.withColumn("npacked", -F.col("packed")),
        -(F.expr("score div 8")),
        [
            F.col("score").desc(),
            F.col("treated").desc(),
            F.col("user_id").desc(),
        ],
        F.col("npacked"),
        "nfwd_p",
    ).withColumn("fwd_p", -F.col("nfwd_p"))
    m = bucketed_running_max(
        fwd,
        F.expr("score div 8"),
        [F.col("score"), F.col("treated"), F.col("user_id")],
        F.col("packed"),
        "back_p",
    )
    sb = F.expr(f"back_p div {_PSM_PACK}")
    sf_ = F.expr(f"fwd_p div {_PSM_PACK}")
    ch = m.where(F.col("treated") == 1).select(
        "y",
        F.when(F.col("back_p").isNull(), F.expr(f"fwd_p % {_PSM_PACK}"))
        .when(F.col("fwd_p").isNull(), F.expr(f"back_p % {_PSM_PACK}"))
        .when(
            F.col("score") - sb <= sf_ - F.col("score"),
            F.expr(f"back_p % {_PSM_PACK}"),
        )
        .otherwise(F.expr(f"fwd_p % {_PSM_PACK}"))
        .alias("chosen_uid"),
    )
    att = (
        ch.where(F.col("chosen_uid").isNotNull())
        .join(
            u.select(
                F.col("user_id").alias("chosen_uid"),
                F.col("y").alias("y_c"),
            ),
            "chosen_uid",
        )
        .agg(
            F.count("*").cast("long").alias("n_matched"),
            F.sum("y").cast("long").alias("sum_y_t"),
            F.sum("y_c").cast("long").alias("sum_y_c"),
        )
    )
    n_treated = u.where(F.col("treated") == 1).agg(
        F.count("*").cast("long").alias("n_treated")
    )
    return n_treated.crossJoin(att).select(
        "n_treated",
        "n_matched",
        "sum_y_t",
        "sum_y_c",
        F.when(
            F.col("n_matched") > 0,
            F.round(
                (F.col("sum_y_t") - F.col("sum_y_c")).cast("double")
                / F.col("n_matched"),
                4,
            ),
        ).alias("att_views"),
    )


@query(
    "q_ml_qini",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS score,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
               (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                ::BIGINT % 2) AS arm
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT arm, converted,
               ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
        FROM u
    ),
    per AS (
        SELECT decile,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_t,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_c,
               CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                    AS BIGINT) AS r_t,
               CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                    AS BIGINT) AS r_c
        FROM d GROUP BY 1
    ),
    cum AS (
        SELECT decile, n_t, n_c, r_t, r_c,
               sum(n_t) OVER (ORDER BY decile) AS cn_t,
               sum(n_c) OVER (ORDER BY decile) AS cn_c,
               sum(r_t) OVER (ORDER BY decile) AS cr_t,
               sum(r_c) OVER (ORDER BY decile) AS cr_c
        FROM per
    )
    SELECT CAST(decile AS INT) AS decile, n_t, n_c, r_t, r_c,
           CASE WHEN n_t > 0 AND n_c > 0 THEN
               round(CAST(r_t AS DOUBLE) / n_t
                     - CAST(r_c AS DOUBLE) / n_c, 6) END AS uplift_rate,
           CASE WHEN cn_c > 0 THEN
               round(CAST(cr_t AS DOUBLE)
                     - CAST(cr_c AS DOUBLE) * cn_t / cn_c, 4)
           END AS qini_k
    FROM cum ORDER BY decile
    """,
)
def q_ml_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift-by-decile table (Radcliffe 2007) — the
    uplift-modeling readout the plain q_ml_lift table cannot give:
    users ranked by the view-count score into equal-fill deciles, the
    md5-parity arms compared WITHIN each decile (incremental response
    rate), and the cumulative Qini value Q_k = R_t(k) − R_c(k)·N_t(k)/
    N_c(k) — the curve whose area is the Qini coefficient.

    Determinism: the decile cut is the exact unique-rank ntile
    (bucketed two-level scan + ntile_from_rank on the Spark side; the
    oracle's native ntile matches because the (score, user_id) order
    is total and the fill rule identical — the q_ml_lift precedent);
    all eight per-decile cells are exact BIGINTs, cumulative sums run
    over the 10-row aggregate, and the two reported rates are final
    divisions of exact integers.  Empty arms yield NULL rates, never
    a crash.

    Scale shape: user hash agg → bucketed rank scan → 10-row
    everything."""
    from events_to_db_spark.plans.prefix import (
        bucketed_running_sum,
        ntile_from_rank,
    )

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    ).withColumn(
        "arm",
        F.expr(
            "pmod(cast(conv(substr(md5(cast(cast(user_id as string)"
            " as binary)), 1, 15), 16, 10) as bigint), 2)"
        ),
    )
    n_tot = u.agg(F.count("*").alias("n_tot"))
    ranked = bucketed_running_sum(
        u.select("user_id", "score", "converted", "arm"),
        bucket=-F.floor(F.col("score") / F.lit(8)),
        order_cols=[F.col("score").desc(), F.col("user_id")],
        sums={"rank": F.lit(1)},
    )
    d = ranked.crossJoin(F.broadcast(n_tot)).select(
        "arm",
        "converted",
        ntile_from_rank(F.col("rank"), F.col("n_tot"), 10)
        .cast("int")
        .alias("decile"),
    )

    def cnt(cond, val, alias):
        return (
            F.sum(F.when(cond, val).otherwise(0)).cast("long").alias(alias)
        )

    per = d.groupBy("decile").agg(
        cnt(F.col("arm") == 1, 1, "n_t"),
        cnt(F.col("arm") == 0, 1, "n_c"),
        cnt(F.col("arm") == 1, F.col("converted"), "r_t"),
        cnt(F.col("arm") == 0, F.col("converted"), "r_c"),
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "decile",
        "n_t",
        "n_c",
        "r_t",
        "r_c",
        F.sum("n_t").over(w).alias("cn_t"),
        F.sum("n_c").over(w).alias("cn_c"),
        F.sum("r_t").over(w).alias("cr_t"),
        F.sum("r_c").over(w).alias("cr_c"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        "n_t",
        "n_c",
        "r_t",
        "r_c",
        F.when(
            (F.col("n_t") > 0) & (F.col("n_c") > 0),
            F.round(
                F.col("r_t").cast("double") / F.col("n_t")
                - F.col("r_c").cast("double") / F.col("n_c"),
                6,
            ),
        ).alias("uplift_rate"),
        F.when(
            F.col("cn_c") > 0,
            F.round(
                F.col("cr_t").cast("double")
                - F.col("cr_c").cast("double")
                * F.col("cn_t")
                / F.col("cn_c"),
                4,
            ),
        ).alias("qini_k"),
    ).orderBy("decile")


def _lang_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-counting sufficient statistics for comparing the two
    document partitions (by ``lang`` vs by ``source``): doubled
    same-pair counts sij2 = Σ n_ij(n_ij−1) over the contingency,
    sa2/sb2 over the marginals, t2 = n(n−1).  One scan + three tiny
    re-aggregates over the 5×20 contingency."""
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("c")
    )
    sij = cell.agg(
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("sij2")
    )
    a = (
        cell.groupBy("lang")
        .agg(F.sum("c").alias("ai"))
        .agg(
            F.sum(F.col("ai") * (F.col("ai") - 1))
            .cast("long")
            .alias("sa2"),
            F.sum("ai").cast("long").alias("n"),
        )
    )
    b = (
        cell.groupBy("source")
        .agg(F.sum("c").alias("bj"))
        .agg(
            F.sum(F.col("bj") * (F.col("bj") - 1))
            .cast("long")
            .alias("sb2")
        )
    )
    return (
        sij.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(b))
        .select(
            "n",
            "sij2",
            "sa2",
            "sb2",
            (F.col("n") * (F.col("n") - 1)).cast("long").alias("t2"),
        )
    )


_LANG_SOURCE_PAIRS_SQL = """
        SELECT CAST(sum(ct) AS BIGINT) AS n,
               CAST(sum(ct * (ct - 1)) AS BIGINT) AS sij2,
               (SELECT CAST(sum(ai * (ai - 1)) AS BIGINT) FROM (
                    SELECT sum(ct) AS ai FROM cells GROUP BY lang))
                   AS sa2,
               (SELECT CAST(sum(bj * (bj - 1)) AS BIGINT) FROM (
                    SELECT sum(ct) AS bj FROM cells GROUP BY source))
                   AS sb2,
               CAST(sum(ct) * (sum(ct) - 1) AS BIGINT) AS t2
        FROM cells
"""


@query(
    "q_ml_ari",
    oracle=f"""
    WITH cells AS (
        SELECT lang, source, count(*) AS ct FROM documents GROUP BY 1, 2
    ),
    s AS ({_LANG_SOURCE_PAIRS_SQL})
    SELECT n, sij2, sa2, sb2, t2,
           round((CAST(t2 AS DOUBLE) * sij2
                  - CAST(sa2 AS DOUBLE) * sb2)
                 / (CAST(t2 AS DOUBLE) * (sa2 + sb2) / 2
                    - CAST(sa2 AS DOUBLE) * sb2), 6) AS ari
    FROM s
    """,
)
def q_ml_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index between the ``lang`` and ``source``
    partitions of the document corpus — THE chance-corrected
    partition-agreement statistic for comparing a clustering against
    a reference labeling (Hubert & Arabie 1985): ARI =
    (Σ C(n_ij,2) − E)/(max − E) with E the independence expectation.

    Exactness: every C(·,2) is carried DOUBLED (x(x−1), exact BIGINT)
    so no halving ever leaves integers: sij2 over the 5×20 contingency
    cells, sa2/sb2 over the marginals, t2 = n(n−1); the ARI folds to
    (t2·sij2 − sa2·sb2)/(t2·(sa2+sb2)/2 − sa2·sb2) whose products are
    quadratic-in-corpus — evaluated in DOUBLE per the overflow rule,
    identical expression both engines.  Plan: one keyed agg over the
    bounded label space, three 1-row re-aggregates, no shuffle wider
    than the contingency."""
    return _lang_source_pairs(spark, sf_dir).select(
        "n",
        "sij2",
        "sa2",
        "sb2",
        "t2",
        F.round(
            (
                F.col("t2").cast("double") * F.col("sij2")
                - F.col("sa2").cast("double") * F.col("sb2")
            )
            / (
                F.col("t2").cast("double")
                * (F.col("sa2") + F.col("sb2"))
                / 2
                - F.col("sa2").cast("double") * F.col("sb2")
            ),
            6,
        ).alias("ari"),
    )


@query(
    "q_ml_fowlkes",
    oracle=f"""
    WITH cells AS (
        SELECT lang, source, count(*) AS ct FROM documents GROUP BY 1, 2
    ),
    s AS ({_LANG_SOURCE_PAIRS_SQL})
    SELECT n, sij2, sa2, sb2,
           round(CAST(sij2 AS DOUBLE)
                 / sqrt(CAST(sa2 AS DOUBLE) * sb2), 6) AS fowlkes_mallows
    FROM s
    """,
)
def q_ml_fowlkes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fowlkes–Mallows index over the same lang-vs-source pair
    statistics as q_ml_ari: FM = TP/√((TP+FP)(TP+FN)) — the geometric
    mean of pairwise precision and recall between two partitions, the
    un-adjusted companion the ARI is usually read against (high FM +
    low ARI = agreement explained by chance).

    With doubled pair counts the ratio is sij2/√(sa2·sb2) exactly
    (the ×2 cancels); one DOUBLE sqrt on exact BIGINTs, shared
    pipeline with q_ml_ari (same helper, one contingency scan)."""
    return _lang_source_pairs(spark, sf_dir).select(
        "n",
        "sij2",
        "sa2",
        "sb2",
        F.round(
            F.col("sij2").cast("double")
            / F.sqrt(F.col("sa2").cast("double") * F.col("sb2")),
            6,
        ).alias("fowlkes_mallows"),
    )


@query(
    "q_ml_silhouette",
    oracle="""
    WITH cells AS (
        SELECT vec_id,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT)
                   AS q
        FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS cid, d, q FROM cells
        WHERE vec_id IN (SELECT vec_id FROM embeddings
                         ORDER BY vec_id LIMIT 3)
    ),
    dist AS (
        SELECT c.vec_id, ce.cid,
               CAST(sum((c.q - ce.q) * (c.q - ce.q)) AS BIGINT) AS d2
        FROM cells c JOIN cent ce ON c.d = ce.d
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rk
        FROM dist
    ),
    ab AS (
        SELECT a.vec_id, a.cid, a.d2 AS a2, b.d2 AS b2,
               CASE WHEN b.d2 > 0
                    THEN (10000 * (b.d2 - a.d2)) // b.d2
                    ELSE 0 END AS s4
        FROM ranked a JOIN ranked b
          ON b.vec_id = a.vec_id AND a.rk = 1 AND b.rk = 2
    )
    SELECT cid AS centroid_id,
           CAST(count(*) AS BIGINT) AS n_assigned,
           CAST(sum(s4) AS BIGINT) AS sum_s4,
           round(CAST(sum(s4) AS DOUBLE) / (10000 * count(*)), 4)
               AS mean_silhouette
    FROM ab GROUP BY cid
    """,
)
def q_ml_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster for the
    q_ml_kmeans_assign partition: s_i = (b−a)/max(a,b) with a = the
    quantized squared distance to the ASSIGNED (nearest) centroid and
    b = to the second-nearest — the cluster-quality diagnostic that
    localizes WHICH cluster is poorly separated, where inertia alone
    only gives a corpus total.  Centroid-based (not pairwise)
    silhouette is the standard linear-time variant; squared-distance
    form is a documented spec choice (rank-identical to Euclidean for
    a ratio of the same monotone transform family).

    Determinism: distances are the exact BIGINT quantized sums shared
    with q_ml_kmeans_assign; a ≤ b by construction (argmin
    assignment), so each s_i is the NON-NEGATIVE integer floor-div
    ⌊10⁴(b−a)/b⌋ (floor ≡ truncate on non-negatives — the engines
    agree) and per-cluster sums are exact; the mean is ONE division.

    Scale: the k·dim centroid cells broadcast; one (vec,cid)
    aggregate + a per-vec partitioned top-2 window — same |V|·k·dim
    shape as the E-step, no extra pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "x")
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("d"),
        F.expr(
            "cast(round(cast(x as double) * 1000000) as bigint)"
        ).alias("q"),
    )
    seeds = emb.select("vec_id").orderBy("vec_id").limit(3)
    cent = (
        cells.join(
            F.broadcast(seeds.withColumnRenamed("vec_id", "cid")),
            cells.vec_id == F.col("cid"),
        )
        .select("cid", "d", F.col("q").alias("cq"))
    )
    dist = (
        cells.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
            )
            .cast("long")
            .alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    ranked = dist.withColumn("rk", F.row_number().over(w))
    a = ranked.where(F.col("rk") == 1).select(
        "vec_id", "cid", F.col("d2").alias("a2")
    )
    b = ranked.where(F.col("rk") == 2).select(
        "vec_id", F.col("d2").alias("b2")
    )
    ab = a.join(b, "vec_id").select(
        "cid",
        F.when(
            F.col("b2") > 0,
            F.expr("(10000 * (b2 - a2)) div b2"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("s4"),
    )
    return ab.groupBy(F.col("cid").alias("centroid_id")).agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.sum("s4").cast("long").alias("sum_s4"),
        F.round(
            F.sum("s4").cast("double") / (10000 * F.count("*")), 4
        ).alias("mean_silhouette"),
    )


@query(
    "q_ml_davies_bouldin",
    oracle="""
    WITH cells AS (
        SELECT vec_id,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT)
                   AS q
        FROM embeddings
    ),
    seeds AS (
        SELECT vec_id AS cid,
               row_number() OVER (ORDER BY vec_id) AS sid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 3)
    ),
    cent AS (
        SELECT s.sid, c.d, c.q
        FROM cells c JOIN seeds s ON c.vec_id = s.cid
    ),
    dist AS (
        SELECT c.vec_id, ce.sid,
               CAST(sum((c.q - ce.q) * (c.q - ce.q)) AS BIGINT) AS d2
        FROM cells c JOIN cent ce ON c.d = ce.d
        GROUP BY 1, 2
    ),
    best AS (
        SELECT vec_id, sid, d2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, sid) AS rk
        FROM dist
    ),
    cl AS (
        SELECT
            CAST(sum(CASE WHEN sid = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS m1,
            CAST(coalesce(sum(CASE WHEN sid = 1 THEN d2 END), 0)
                 AS BIGINT) AS w1,
            CAST(sum(CASE WHEN sid = 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS m2,
            CAST(coalesce(sum(CASE WHEN sid = 2 THEN d2 END), 0)
                 AS BIGINT) AS w2,
            CAST(sum(CASE WHEN sid = 3 THEN 1 ELSE 0 END) AS BIGINT)
                AS m3,
            CAST(coalesce(sum(CASE WHEN sid = 3 THEN d2 END), 0)
                 AS BIGINT) AS w3
        FROM best WHERE rk = 1
    ),
    cd AS (
        SELECT
            CAST(coalesce(sum(CASE WHEN a.sid = 1 AND b.sid = 2
                              THEN (a.q - b.q) * (a.q - b.q) END), 0)
                 AS BIGINT) AS c12,
            CAST(coalesce(sum(CASE WHEN a.sid = 1 AND b.sid = 3
                              THEN (a.q - b.q) * (a.q - b.q) END), 0)
                 AS BIGINT) AS c13,
            CAST(coalesce(sum(CASE WHEN a.sid = 2 AND b.sid = 3
                              THEN (a.q - b.q) * (a.q - b.q) END), 0)
                 AS BIGINT) AS c23
        FROM cent a JOIN cent b ON a.d = b.d AND a.sid < b.sid
    )
    SELECT m1, m2, m3,
           round((
               greatest(
                   (CAST(w1 AS DOUBLE) / m1 + CAST(w2 AS DOUBLE) / m2)
                       / c12,
                   (CAST(w1 AS DOUBLE) / m1 + CAST(w3 AS DOUBLE) / m3)
                       / c13)
             + greatest(
                   (CAST(w2 AS DOUBLE) / m2 + CAST(w1 AS DOUBLE) / m1)
                       / c12,
                   (CAST(w2 AS DOUBLE) / m2 + CAST(w3 AS DOUBLE) / m3)
                       / c23)
             + greatest(
                   (CAST(w3 AS DOUBLE) / m3 + CAST(w1 AS DOUBLE) / m1)
                       / c13,
                   (CAST(w3 AS DOUBLE) / m3 + CAST(w2 AS DOUBLE) / m2)
                       / c23)
           ) / 3, 6) AS dbi_sq
    FROM cl CROSS JOIN cd
    """,
)
def q_ml_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies–Bouldin index (squared-distance variant) for the
    q_ml_kmeans_assign partition: DBI = (1/k)Σᵢ maxⱼ≠ᵢ
    (σ²ᵢ + σ²ⱼ)/d²(cᵢ,cⱼ) — the "worst-neighbor" separation score
    that complements q_ml_silhouette's per-point view (DBI names the
    most-confusable cluster PAIR).  Squared-distance scatter/
    separation is the documented spec (consistent numerator and
    denominator — the ranking is the standard DBI's on isotropic
    clusters).

    Determinism: per-cluster counts, within-cluster d² sums, and the
    three centroid-pair d² are all exact BIGINTs on the shared
    quantized cells; the k = 3 max/mean fold is ONE fixed shared
    DOUBLE expression (greatest of identical operand expressions —
    no float ordering enters any aggregate).

    Scale: same |V|·k·dim E-step shape as kmeans_assign + a k²·dim
    centroid self-join (192 rows)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "x")
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("d"),
        F.expr(
            "cast(round(cast(x as double) * 1000000) as bigint)"
        ).alias("q"),
    )
    seeds = (
        emb.select("vec_id")
        .orderBy("vec_id")
        .limit(3)
        .select(
            F.col("vec_id").alias("cid"),
            F.row_number()
            .over(Window.orderBy("vec_id"))
            .alias("sid"),
        )
    )
    cent = cells.join(
        F.broadcast(seeds), cells.vec_id == F.col("cid")
    ).select("sid", "d", F.col("q").alias("cq"))
    dist = (
        cells.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "sid")
        .agg(
            F.sum(
                (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
            )
            .cast("long")
            .alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "sid")
    best = dist.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") == 1
    )
    cl_aggs = []
    for i in (1, 2, 3):
        cl_aggs.append(
            F.sum(F.when(F.col("sid") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"m{i}")
        )
        cl_aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("sid") == i, F.col("d2"))), F.lit(0)
            )
            .cast("long")
            .alias(f"w{i}")
        )
    cl = best.agg(*cl_aggs)
    a = cent.select(
        F.col("sid").alias("sa"), F.col("d"), F.col("cq").alias("qa")
    )
    b = cent.select(
        F.col("sid").alias("sb"), F.col("d"), F.col("cq").alias("qb")
    )
    cd = (
        a.join(b, "d")
        .where(F.col("sa") < F.col("sb"))
        .agg(
            *[
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("sa") == i) & (F.col("sb") == j),
                            (F.col("qa") - F.col("qb"))
                            * (F.col("qa") - F.col("qb")),
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"c{i}{j}")
                for i, j in ((1, 2), (1, 3), (2, 3))
            ]
        )
    )
    dbi = (
        "(greatest((CAST(w1 AS DOUBLE) / m1 + CAST(w2 AS DOUBLE) / m2)"
        " / c12,"
        " (CAST(w1 AS DOUBLE) / m1 + CAST(w3 AS DOUBLE) / m3) / c13)"
        " + greatest((CAST(w2 AS DOUBLE) / m2 + CAST(w1 AS DOUBLE) / m1)"
        " / c12,"
        " (CAST(w2 AS DOUBLE) / m2 + CAST(w3 AS DOUBLE) / m3) / c23)"
        " + greatest((CAST(w3 AS DOUBLE) / m3 + CAST(w1 AS DOUBLE) / m1)"
        " / c13,"
        " (CAST(w3 AS DOUBLE) / m3 + CAST(w2 AS DOUBLE) / m2) / c23))"
        " / 3"
    )
    return cl.crossJoin(F.broadcast(cd)).select(
        "m1",
        "m2",
        "m3",
        F.expr(f"round({dbi}, 6)").alias("dbi_sq"),
    )


#: D'Agostino-Pearson K^2 pieces, shared VERBATIM over the per-group
#: columns n (BIGINT) and m2/m3/m4 (DOUBLE central moments derived
#: identically in both engines, the q_stat_jarque_bera pattern).
_DP_G1 = "(m3 / (sqrt(m2) * m2))"
_DP_B2 = "(m4 / (m2 * m2))"
_DP_Y = (
    f"({_DP_G1} * sqrt((CAST(n AS DOUBLE) + 1) * (n + 3)"
    " / (6e0 * (n - 2))))"
)
_DP_BETA2 = (
    "(3e0 * (CAST(n AS DOUBLE) * n + 27 * n - 70) * (n + 1) * (n + 3)"
    " / ((CAST(n AS DOUBLE) - 2) * (n + 5) * (n + 7) * (n + 9)))"
)
_DP_W2 = f"(-1 + sqrt(2 * ({_DP_BETA2} - 1)))"
_DP_DELTA = f"(1 / sqrt(ln(sqrt({_DP_W2}))))"
_DP_ALPHA = f"(sqrt(2e0 / ({_DP_W2} - 1)))"
_DP_Z1 = (
    f"({_DP_DELTA} * ln({_DP_Y} / {_DP_ALPHA}"
    f" + sqrt(({_DP_Y} / {_DP_ALPHA}) * ({_DP_Y} / {_DP_ALPHA}) + 1)))"
)
_DP_EB2 = "(3e0 * (n - 1) / (n + 1))"
_DP_VB2 = (
    "(24e0 * n * (n - 2) * (n - 3)"
    " / ((CAST(n AS DOUBLE) + 1) * (n + 1) * (n + 3) * (n + 5)))"
)
_DP_X = f"(({_DP_B2} - {_DP_EB2}) / sqrt({_DP_VB2}))"
_DP_BETA1 = (
    "(6e0 * (CAST(n AS DOUBLE) * n - 5 * n + 2)"
    " / ((n + 7) * (n + 9))"
    " * sqrt(6e0 * (n + 3) * (n + 5)"
    " / (CAST(n AS DOUBLE) * (n - 2) * (n - 3))))"
)
_DP_A = (
    f"(6 + 8 / {_DP_BETA1} * (2 / {_DP_BETA1}"
    f" + sqrt(1 + 4 / ({_DP_BETA1} * {_DP_BETA1}))))"
)
_DP_Z2 = (
    f"(((1 - 2 / (9 * {_DP_A}))"
    f" - cbrt((1 - 2 / {_DP_A})"
    f" / (1 + {_DP_X} * sqrt(2 / ({_DP_A} - 4)))))"
    f" / sqrt(2 / (9 * {_DP_A})))"
)
_DP_K2 = f"({_DP_Z1} * {_DP_Z1} + {_DP_Z2} * {_DP_Z2})"


@query(
    "q_stat_dagostino",
    oracle=f"""
    WITH c AS (
        SELECT event_type,
               CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS v
        FROM events
    ),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               sum(v) AS s1, sum(v * v) AS s2,
               sum(v * v * v) AS s3, sum(v * v * v * v) AS s4
        FROM c GROUP BY event_type
        HAVING count(*) >= 20
    ),
    ctr AS (
        SELECT event_type, n,
               CAST(s1 AS DOUBLE) / n AS m1,
               CAST(s2 AS DOUBLE) / n AS r2,
               CAST(s3 AS DOUBLE) / n AS r3,
               CAST(s4 AS DOUBLE) / n AS r4
        FROM m
    ),
    mom AS (
        SELECT event_type, n,
               r2 - m1 * m1 AS m2,
               r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS m3,
               r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2
                  - 3 * m1 * m1 * m1 * m1 AS m4
        FROM ctr
    )
    SELECT event_type, n,
           round({_DP_Z1}, 4) AS z_skew,
           round({_DP_Z2}, 4) AS z_kurt,
           round({_DP_K2}, 4) AS k2,
           CAST({_DP_K2} > CAST(5.991465 AS DOUBLE) AS BOOLEAN)
               AS reject_05
    FROM mom ORDER BY event_type
    """,
)
def q_stat_dagostino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Agostino–Pearson K² omnibus normality test of ``value`` per
    event type: the finite-sample-corrected skewness z (Johnson SU
    transform) and kurtosis z (Anscombe–Glynn cube-root transform),
    combined as K² = z₁² + z₂² ~ χ²(2) — the normality test that
    stays calibrated at moderate n where q_stat_jarque_bera's
    asymptotic χ² over-rejects.

    Determinism: the four raw power sums are exact integers
    (DECIMAL(38,0)/HUGEINT internally — the JB pattern; never in the
    OUTPUT schema); central moments and both z transforms are
    module-level DOUBLE expression strings shared verbatim by both
    engines (ln/sqrt/cbrt on identical doubles — the ln-parity
    precedent; cbrt handles the negative operand branch identically),
    and the 5% decision compares the same shared expression against
    the χ²(2) literal.  Groups below n = 20 are excluded exactly (the
    finite-sample transforms divide by n−2/n−3 and are meaningless
    there — never a division error).  One keyed aggregate, 5-row
    output."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.expr("cast(round(value * 100) as decimal(38,0))").alias("v"),
    )
    m = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("v * v")).alias("s2"),
        F.sum(F.expr("v * v * v")).alias("s3"),
        F.sum(F.expr("v * v * v * v")).alias("s4"),
    ).where(F.col("n") >= 20)
    ctr = m.select(
        "event_type",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n")).alias("r2"),
        (F.col("s3").cast("double") / F.col("n")).alias("r3"),
        (F.col("s4").cast("double") / F.col("n")).alias("r4"),
    )
    mom = ctr.select(
        "event_type",
        "n",
        (F.col("r2") - F.col("m1") * F.col("m1")).alias("m2"),
        (
            F.col("r3")
            - 3 * F.col("m1") * F.col("r2")
            + 2 * F.col("m1") * F.col("m1") * F.col("m1")
        ).alias("m3"),
        (
            F.col("r4")
            - 4 * F.col("m1") * F.col("r3")
            + 6 * F.col("m1") * F.col("m1") * F.col("r2")
            - 3
            * F.col("m1")
            * F.col("m1")
            * F.col("m1")
            * F.col("m1")
        ).alias("m4"),
    )
    return mom.select(
        "event_type",
        "n",
        F.expr(f"round({_DP_Z1}, 4)").alias("z_skew"),
        F.expr(f"round({_DP_Z2}, 4)").alias("z_kurt"),
        F.expr(f"round({_DP_K2}, 4)").alias("k2"),
        F.expr(f"{_DP_K2} > CAST(5.991465 AS DOUBLE)").alias(
            "reject_05"
        ),
    ).orderBy("event_type")


#: Hanley–McNeil AUC standard error, shared VERBATIM over the exact
#: (n1, n2, auc_num) integers: A = num/(2 n1 n2), Q1 = A/(2−A),
#: Q2 = 2A²/(1+A) — all algebra DOUBLE (overflow rule).
_AUC_A = "(CAST(auc_num AS DOUBLE) / (2e0 * n1 * n2))"
_AUC_SE = (
    f"(sqrt(({_AUC_A} * (1 - {_AUC_A})"
    f" + (n1 - 1) * ({_AUC_A} / (2 - {_AUC_A}) - {_AUC_A} * {_AUC_A})"
    f" + (n2 - 1) * (2 * {_AUC_A} * {_AUC_A} / (1 + {_AUC_A})"
    f" - {_AUC_A} * {_AUC_A}))"
    f" / (CAST(n1 AS DOUBLE) * n2)))"
)


@query(
    "q_ml_auc_ci",
    oracle=f"""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pv AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS ct,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT vc, ct, pos,
               sum(ct) OVER (ORDER BY vc) AS cum_n
        FROM pv
    ),
    r AS (
        SELECT CAST(sum(pos * (2 * (cum_n - ct) + ct + 1)) AS BIGINT)
                   AS r2,
               CAST(sum(pos) AS BIGINT) AS n1,
               CAST(sum(ct) - sum(pos) AS BIGINT) AS n2
        FROM cum
    ),
    a AS (
        SELECT n1, n2,
               CAST(r2 - n1 * (n1 + 1) AS BIGINT) AS auc_num
        FROM r
    )
    SELECT n1, n2,
           round({_AUC_A}, 6) AS auc,
           round({_AUC_SE}, 6) AS auc_se,
           round(greatest({_AUC_A} - 196e0 / 100 * {_AUC_SE}, 0e0), 6)
               AS ci_lo,
           round(least({_AUC_A} + 196e0 / 100 * {_AUC_SE}, 1e0), 6)
               AS ci_hi
    FROM a
    """,
)
def q_ml_auc_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hanley–McNeil 95% confidence interval for the exact ROC AUC
    (q_ml_auc's rank statistic): SE² = (A(1−A) + (n₁−1)(Q₁−A²) +
    (n₂−1)(Q₂−A²))/(n₁n₂) with Q₁ = A/(2−A), Q₂ = 2A²/(1+A) — the
    uncertainty that belongs next to every reported AUC (0.61 on 100
    positives and 0.61 on 100k are different claims).

    Determinism: the AUC numerator reuses q_ml_auc's exact 2×-rank
    machinery verbatim (exact BIGINT off the bucketed prefix scan);
    A, the Hanley–McNeil SE, and the clamped z = 196/100 bands are
    module-level shared DOUBLE expression strings over those
    integers."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    pv = s.groupBy("vc").agg(
        F.count("*").alias("ct"), F.sum("y").cast("long").alias("pos")
    )
    cum = bucketed_running_sum(
        pv,
        F.expr("vc div 2000"),
        [F.col("vc")],
        {"cum_n": F.col("ct")},
    )
    r = cum.agg(
        F.sum(
            F.col("pos")
            * (2 * (F.col("cum_n") - F.col("ct")) + F.col("ct") + 1)
        )
        .cast("long")
        .alias("r2"),
        F.sum("pos").cast("long").alias("n1"),
        (F.sum("ct") - F.sum("pos")).cast("long").alias("n2"),
    )
    a = r.select(
        "n1",
        "n2",
        (F.col("r2") - F.col("n1") * (F.col("n1") + 1))
        .cast("long")
        .alias("auc_num"),
    )
    return a.select(
        "n1",
        "n2",
        F.expr(f"round({_AUC_A}, 6)").alias("auc"),
        F.expr(f"round({_AUC_SE}, 6)").alias("auc_se"),
        F.expr(
            f"round(greatest({_AUC_A} - 196e0 / 100 * {_AUC_SE},"
            f" 0e0), 6)"
        ).alias("ci_lo"),
        F.expr(
            f"round(least({_AUC_A} + 196e0 / 100 * {_AUC_SE},"
            f" 1e0), 6)"
        ).alias("ci_hi"),
    )
