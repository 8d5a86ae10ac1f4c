"""Statistical-test operators (SURVEY.md §2.12, round 2).

The hypothesis-testing layer an analyst runs directly on the copied
event log: distribution comparison (Kolmogorov–Smirnov), rank tests
(Mann–Whitney U), rank correlation (Spearman), and the χ² independence
table.  All follow SURVEY §7.5 determinism discipline:

* every test statistic is assembled from exact BIGINT counts and rank
  sums — tie-averaged ranks are carried as *2× integers* so no fraction
  ever enters an aggregate;
* global orderings (pooled ranks, empirical CDFs) never use an
  unpartitioned window on the Spark side — they go through
  ``plans.prefix.bucketed_running_sum`` (two-level parallel scan), so
  the same code survives a 1000-executor corpus;
* floats appear only in one final per-row expression evaluated on
  identical integers in both engines, rounded to 4–6 places.

Overflow posture: the KS/MWU cross products are ≤ n₁·n₂ ≈ 4e10 at
sf0.1 — comfortably inside BIGINT; at 1e10-row samples switch the two
product columns to DECIMAL(38,0) (noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.plans.prefix import bucketed_running_sum
from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


def _two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled per-distinct-value counts for the purchase-vs-view
    two-sample tests: one keyed aggregate, columns (value, ct, c1t)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g1"),
    )
    return s.groupBy("value").agg(
        F.count("*").alias("ct"), F.sum("g1").alias("c1t")
    )


@query(
    "q_stat_ks",
    oracle="""
    WITH s AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pv AS (
        SELECT value, count(*) AS ct, CAST(sum(g1) AS BIGINT) AS c1t
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT sum(ct) OVER (ORDER BY value) AS cum_t,
               sum(c1t) OVER (ORDER BY value) AS cum_1
        FROM pv
    ),
    tot AS (
        SELECT CAST(sum(c1t) AS BIGINT) AS n1,
               CAST(sum(ct) - sum(c1t) AS BIGINT) AS n2
        FROM pv
    )
    SELECT n1, n2,
           CAST(max(abs(cum_1 * n2 - (cum_t - cum_1) * n1)) AS BIGINT)
               AS d_num,
           round(CAST(max(abs(cum_1 * n2 - (cum_t - cum_1) * n1))
                      AS DOUBLE) / (n1 * n2), 6) AS ks_d
    FROM cum CROSS JOIN tot
    GROUP BY n1, n2
    """,
)
def q_stat_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the ``value``
    distributions of purchase vs view events.

    D = max over the pooled support of |F₁(x) − F₂(x)|, carried as the exact
    integer numerator ``|c₁·n₂ − c₂·n₁|`` (ties handled by evaluating
    at inclusive per-distinct-value counts); the single float division
    happens once on the final max.  The empirical-CDF prefix sums run
    through the bucketed two-level scan (value-range buckets), not a
    global window — at 100 TB the d_num products move to DECIMAL(38,0).
    Plan: one keyed agg → bucketed scan → one scalar aggregate.
    """
    pv = _two_sample(spark, sf_dir)
    cum = bucketed_running_sum(
        pv,
        bucket=F.floor(F.col("value") / F.lit(25.0)).cast("long"),
        order_cols=[F.col("value")],
        sums={"cum_t": F.col("ct"), "cum_1": F.col("c1t")},
    )
    tot = pv.agg(
        F.sum("c1t").alias("n1"),
        (F.sum("ct") - F.sum("c1t")).alias("n2"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.abs(
            F.col("cum_1") * F.col("n2")
            - (F.col("cum_t") - F.col("cum_1")) * F.col("n1")
        ).alias("dn"),
    )
    return d.groupBy("n1", "n2").agg(
        F.max("dn").cast("long").alias("d_num"),
        F.round(
            F.max("dn").cast("double") / (F.col("n1") * F.col("n2")), 6
        ).alias("ks_d"),
    )


@query(
    "q_stat_mannwhitney",
    oracle="""
    WITH s AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pv AS (
        SELECT value, count(*) AS ct, CAST(sum(g1) AS BIGINT) AS c1t
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT ct, c1t,
               sum(ct) OVER (ORDER BY value) AS cum_t
        FROM pv
    ),
    tot AS (
        SELECT CAST(sum(c1t) AS BIGINT) AS n1,
               CAST(sum(ct) - sum(c1t) AS BIGINT) AS n2
        FROM pv
    ),
    ranks AS (
        -- avg pooled rank of a tie block, times two (exact integer):
        -- 2p + c - 1 with p = first position = cum_t - ct + 1
        SELECT CAST(sum(c1t * (2 * (cum_t - ct + 1) + ct - 1)) AS BIGINT)
            AS r1_2
        FROM cum
    )
    SELECT n1, n2,
           CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u1_2,
           round((CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) - n1 * n2)
                 / (2 * sqrt(CAST(n1 AS DOUBLE) * n2
                             * (n1 + n2 + 1) / 12)), 4) AS z_score
    FROM ranks CROSS JOIN tot
    """,
)
def q_stat_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank test (purchase vs view ``value``), with
    tie-averaged pooled ranks carried as 2× integers.

    The rank sum needs each distinct value's first pooled position —
    the inclusive running count from the bucketed scan minus the tie
    size — so ``U·2 = Σ c₁·(2p+c−1) − n₁(n₁+1)`` is exact; the normal
    z-score (no tie correction, identical formula both engines) is the
    single final float.  Plan mirrors q_stat_ks.
    """
    pv = _two_sample(spark, sf_dir)
    cum = bucketed_running_sum(
        pv,
        bucket=F.floor(F.col("value") / F.lit(25.0)).cast("long"),
        order_cols=[F.col("value")],
        sums={"cum_t": F.col("ct")},
    )
    tot = pv.agg(
        F.sum("c1t").alias("n1"),
        (F.sum("ct") - F.sum("c1t")).alias("n2"),
    )
    ranks = cum.agg(
        F.sum(
            F.col("c1t")
            * (2 * (F.col("cum_t") - F.col("ct") + 1) + F.col("ct") - 1)
        ).alias("r1_2")
    )
    return ranks.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1))
        .cast("long")
        .alias("u1_2"),
        F.round(
            (
                (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)).cast(
                    "double"
                )
                - F.col("n1") * F.col("n2")
            )
            / (
                2
                * F.sqrt(
                    F.col("n1").cast("double")
                    * F.col("n2")
                    * (F.col("n1") + F.col("n2") + 1)
                    / 12
                )
            ),
            4,
        ).alias("z_score"),
    )


@query(
    "q_corr_spearman",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS cnt,
               count(DISTINCT user_id) AS du
        FROM events GROUP BY 1, 2
    ),
    rk AS (
        SELECT event_type,
               2 * rank() OVER (PARTITION BY event_type ORDER BY cnt)
                 + count(*) OVER (PARTITION BY event_type, cnt) - 1 AS x2,
               2 * rank() OVER (PARTITION BY event_type ORDER BY du)
                 + count(*) OVER (PARTITION BY event_type, du) - 1 AS y2
        FROM daily
    ),
    sums AS (
        SELECT event_type,
               count(*) AS n,
               CAST(sum(x2) AS BIGINT) AS sx,
               CAST(sum(y2) AS BIGINT) AS sy,
               CAST(sum(x2 * x2) AS BIGINT) AS sxx,
               CAST(sum(y2 * y2) AS BIGINT) AS syy,
               CAST(sum(x2 * y2) AS BIGINT) AS sxy
        FROM rk GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS rho
    FROM sums
    ORDER BY event_type
    """,
)
def q_corr_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation, per event type, between daily event
    volume and daily distinct users.

    Pearson-on-ranks with tie-averaged ranks as 2× integers (2·rank +
    tie−1); all five moment sums are exact BIGINT aggregates over the
    bounded per-type day series, and ρ is one final float expression
    (doubles entering the products BEFORE multiplication — n·Sxx·n·Syy
    would overflow BIGINT).  The ranking windows partition by
    event_type, whose row count is bounded by the calendar, not the
    event volume — scale-safe by construction.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("cnt"),
        F.countDistinct("user_id").alias("du"),
    )
    rk = daily.select(
        "event_type",
        (
            2 * F.rank().over(Window.partitionBy("event_type").orderBy("cnt"))
            + F.count("*").over(Window.partitionBy("event_type", "cnt"))
            - 1
        ).alias("x2"),
        (
            2 * F.rank().over(Window.partitionBy("event_type").orderBy("du"))
            + F.count("*").over(Window.partitionBy("event_type", "du"))
            - 1
        ).alias("y2"),
    )
    sums = rk.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x2").alias("sx"),
        F.sum("y2").alias("sy"),
        F.sum(F.col("x2") * F.col("x2")).alias("sxx"),
        F.sum(F.col("y2") * F.col("y2")).alias("syy"),
        F.sum(F.col("x2") * F.col("y2")).alias("sxy"),
    )
    return sums.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(
            (
                F.col("n").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / F.sqrt(
                (
                    F.col("n").cast("double") * F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx")
                )
                * (
                    F.col("n").cast("double") * F.col("syy")
                    - F.col("sy").cast("double") * F.col("sy")
                )
            ),
            6,
        ).alias("rho"),
    ).orderBy("event_type")


@query(
    "q_stat_chisq",
    oracle="""
    WITH cells AS (
        SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
          FROM cells GROUP BY 1),
    c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS nt FROM cells)
    SELECT cells.event_type, CAST(cells.dow AS INT) AS dow,
           CAST(o AS BIGINT) AS observed,
           round(CAST(rt AS DOUBLE) * ct / nt, 4) AS expected,
           round(
               (o - CAST(rt AS DOUBLE) * ct / nt)
               * (o - CAST(rt AS DOUBLE) * ct / nt)
               / (CAST(rt AS DOUBLE) * ct / nt), 4) AS contrib
    FROM cells
    JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
    ORDER BY event_type, dow
    """,
)
def q_stat_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence table for event_type × day-of-week: observed
    count, expected count under independence, and the per-cell χ²
    contribution.

    The cell table (|types|·7 rows) is emitted instead of the summed
    statistic — summing ~35 per-cell doubles is engine-order-dependent,
    while each cell's E = R·C/N and (O−E)²/E are single float
    expressions on exact integers (R, C, N via broadcast joins onto the
    cell aggregate).  Spark ``dayofweek`` (Sunday=1) ≡ DuckDB
    ``dayofweek + 1``.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("o"))
    r = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    c = cells.groupBy("dow").agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o").alias("nt"))
    e = F.col("rt").cast("double") * F.col("ct") / F.col("nt")
    return (
        cells.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("o").cast("long").alias("observed"),
            F.round(e, 4).alias("expected"),
            F.round((F.col("o") - e) * (F.col("o") - e) / e, 4).alias(
                "contrib"
            ),
        )
        .orderBy("event_type", "dow")
    )


@query(
    "q_agg_argmax",
    oracle="""
    WITH uc AS (
        SELECT event_type, user_id, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, user_id, cnt,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY cnt DESC, user_id ASC) AS rn
        FROM uc
    )
    SELECT event_type,
           CAST(user_id AS BIGINT) AS top_user,
           CAST(cnt AS BIGINT) AS top_cnt
    FROM ranked WHERE rn = 1
    ORDER BY event_type
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG MAX as a pure aggregate: the most active user per event
    type, ties broken to the smallest user_id.

    Spark side uses ``max(struct(cnt, -user_id))`` — a single two-phase
    hash aggregate (partial max per map task, no window, no sort),
    which is the shape ``max_by`` cannot guarantee under ties.  The
    oracle states the same contract as a row_number pick.  At any scale
    this is two keyed aggregates with map-side combine.
    """
    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("cnt"))
    return (
        uc.groupBy("event_type")
        .agg(
            F.max(
                F.struct(
                    F.col("cnt").alias("c"),
                    (-F.col("user_id")).alias("nu"),
                )
            ).alias("m")
        )
        .select(
            "event_type",
            (-F.col("m.nu")).cast("long").alias("top_user"),
            F.col("m.c").cast("long").alias("top_cnt"),
        )
        .orderBy("event_type")
    )


@query(
    "q_corr_matrix",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS nd,
               CAST(sum(a.n) AS BIGINT) AS sx,
               CAST(sum(b.n) AS BIGINT) AS sy,
               CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
               CAST(sum(b.n * b.n) AS BIGINT) AS syy,
               CAST(sum(a.n * b.n) AS BIGINT) AS sxy
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(nd AS BIGINT) AS n_days,
           round((CAST(nd AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(nd AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(nd AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS pearson
    FROM pairs
    ORDER BY type_a, type_b
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (upper triangle) between
    event types' daily volumes — "do errors move with clicks?".

    The pair join is keyed on the calendar day (fan-out ≤ |types|² per
    day, bounded), never on rows; the five moment sums are exact
    BIGINTs and r is one final float per pair (doubles enter before
    the n·Sxx products — BIGINT would overflow past ~10⁶ days·count²).
    Same discipline as q_corr_spearman, which ranks first instead.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count("*").alias("nd"),
            F.sum("a.n").alias("sx"),
            F.sum("b.n").alias("sy"),
            F.sum(F.col("a.n") * F.col("a.n")).alias("sxx"),
            F.sum(F.col("b.n") * F.col("b.n")).alias("syy"),
            F.sum(F.col("a.n") * F.col("b.n")).alias("sxy"),
        )
    )
    return pairs.select(
        "type_a",
        "type_b",
        F.col("nd").cast("long").alias("n_days"),
        F.round(
            (
                F.col("nd").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / F.sqrt(
                (
                    F.col("nd").cast("double") * F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx")
                )
                * (
                    F.col("nd").cast("double") * F.col("syy")
                    - F.col("sy").cast("double") * F.col("sy")
                )
            ),
            6,
        ).alias("pearson"),
    ).orderBy("type_a", "type_b")


@query(
    "q_stat_ttest",
    oracle="""
    WITH m AS (
        SELECT
            CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n1,
            CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS s1,
            CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT)
                               * CAST(round(value * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS q1,
            CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n2,
            CAST(sum(CASE WHEN event_type = 'view'
                          THEN CAST(round(value * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS s2,
            CAST(sum(CASE WHEN event_type = 'view'
                          THEN CAST(round(value * 100) AS BIGINT)
                               * CAST(round(value * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS q2
        FROM events WHERE event_type IN ('purchase', 'view')
    )
    SELECT n1, n2,
           round((CAST(s1 AS DOUBLE) / n1) / 100, 4) AS mean1,
           round((CAST(s2 AS DOUBLE) / n2) / 100, 4) AS mean2,
           round(((CAST(s1 AS DOUBLE) / n1) - (CAST(s2 AS DOUBLE) / n2))
                 / sqrt(((CAST(q1 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n1) * s1)
                         / (n1 - 1)) / n1
                        + ((CAST(q2 AS DOUBLE) - (CAST(s2 AS DOUBLE) / n2) * s2)
                           / (n2 - 1)) / n2), 4) AS t_welch,
           round(
             (((CAST(q1 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n1) * s1)
               / (n1 - 1)) / n1
              + ((CAST(q2 AS DOUBLE) - (CAST(s2 AS DOUBLE) / n2) * s2)
                 / (n2 - 1)) / n2)
             * (((CAST(q1 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n1) * s1)
                 / (n1 - 1)) / n1
                + ((CAST(q2 AS DOUBLE) - (CAST(s2 AS DOUBLE) / n2) * s2)
                   / (n2 - 1)) / n2)
             / ((((CAST(q1 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n1) * s1)
                  / (n1 - 1)) / n1)
                * (((CAST(q1 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n1) * s1)
                    / (n1 - 1)) / n1) / (n1 - 1)
                + (((CAST(q2 AS DOUBLE) - (CAST(s2 AS DOUBLE) / n2) * s2)
                    / (n2 - 1)) / n2)
                  * (((CAST(q2 AS DOUBLE) - (CAST(s2 AS DOUBLE) / n2) * s2)
                      / (n2 - 1)) / n2) / (n2 - 1)), 2) AS df_welch
    FROM m
    """,
)
def q_stat_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test (unequal variances) on purchase vs
    view values: t statistic and Welch–Satterthwaite degrees of
    freedom, assembled entirely from six exact BIGINT moment sums
    (n, Σc, Σc² per group on value cents) gathered in ONE conditional
    aggregation pass.  Every double operation after the single
    aggregate row is the same left-to-right expression in both
    engines, so the statistic hash-matches to 4 places with no
    float-sum ordering hazard — the §7.5 discipline applied to
    inference.

    Scale shape: one map-side-combinable aggregate over the filtered
    scan; the test itself is O(1) arithmetic on one row.  Overflow:
    Σc² ≤ ~3e14 at sf0.1 (cents² per row ≤ 2.5e9) — inside BIGINT
    through ~1e8 rows, then move the two Q columns to DECIMAL(38,0).
    """
    c = F.round(F.col("value") * 100).cast("bigint")
    is1 = F.col("event_type") == "purchase"
    is2 = F.col("event_type") == "view"
    m = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .agg(
            F.sum(is1.cast("bigint")).alias("n1"),
            F.sum(F.when(is1, c).otherwise(0)).alias("s1"),
            F.sum(F.when(is1, c * c).otherwise(0)).alias("q1"),
            F.sum(is2.cast("bigint")).alias("n2"),
            F.sum(F.when(is2, c).otherwise(0)).alias("s2"),
            F.sum(F.when(is2, c * c).otherwise(0)).alias("q2"),
        )
    )
    # Per-group standard error components, written once and reused so
    # the Spark expression tree mirrors the oracle's literal text.
    se1 = "(((CAST(q1 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n1) * s1) / (n1 - 1)) / n1)"
    se2 = "(((CAST(q2 AS DOUBLE) - (CAST(s2 AS DOUBLE) / n2) * s2) / (n2 - 1)) / n2)"
    return m.select(
        "n1",
        "n2",
        F.expr("round((CAST(s1 AS DOUBLE) / n1) / 100, 4)").alias("mean1"),
        F.expr("round((CAST(s2 AS DOUBLE) / n2) / 100, 4)").alias("mean2"),
        F.expr(
            "round(((CAST(s1 AS DOUBLE) / n1) - (CAST(s2 AS DOUBLE) / n2))"
            f" / sqrt({se1} + {se2}), 4)"
        ).alias("t_welch"),
        F.expr(
            f"round(({se1} + {se2}) * ({se1} + {se2})"
            f" / ({se1} * {se1} / (n1 - 1) + {se2} * {se2} / (n2 - 1)), 2)"
        ).alias("df_welch"),
    )


#: The five event types, pinned so the ANOVA between-group sum is a
#: literal fixed-order expression (no float-sum-over-groups hazard).
_EV_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_stat_anova",
    oracle=f"""
    WITH m AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
            CAST(sum(CAST(round(value * 100) AS BIGINT)
                     * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q,
            {", ".join(
                f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}, "
                f"CAST(sum(CASE WHEN event_type = '{t}' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_{t}"
                for t in _EV_TYPES)}
        FROM events
    )
    SELECT n,
           round(({" + ".join(f"(CAST(s_{t} AS DOUBLE) / n_{t}) * s_{t}" for t in _EV_TYPES)}
                  - (CAST(s AS DOUBLE) / n) * s) / 10000, 4) AS ssb,
           round((CAST(q AS DOUBLE)
                  - ({" + ".join(f"(CAST(s_{t} AS DOUBLE) / n_{t}) * s_{t}" for t in _EV_TYPES)})) / 10000, 4) AS ssw,
           round((({" + ".join(f"(CAST(s_{t} AS DOUBLE) / n_{t}) * s_{t}" for t in _EV_TYPES)}
                   - (CAST(s AS DOUBLE) / n) * s) / ({len(_EV_TYPES)} - 1))
                 / ((CAST(q AS DOUBLE)
                     - ({" + ".join(f"(CAST(s_{t} AS DOUBLE) / n_{t}) * s_{t}" for t in _EV_TYPES)}))
                    / (n - {len(_EV_TYPES)})), 4) AS f_stat,
           round(({" + ".join(f"(CAST(s_{t} AS DOUBLE) / n_{t}) * s_{t}" for t in _EV_TYPES)}
                  - (CAST(s AS DOUBLE) / n) * s)
                 / (CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n) * s), 6) AS eta_sq
    FROM m
    """,
)
def q_stat_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across the five event types on value cents:
    between/within sums of squares, the F statistic, and η² effect
    size.  The decomposition needs Σᵢ Sᵢ²/nᵢ — a float sum over
    groups, which would be summation-order-dependent if computed by an
    aggregate; instead the five types are PIVOTED into one row by
    conditional aggregation and the group sum is a literal
    left-to-right five-term expression, identical text in both
    engines.  Everything upstream of that expression is exact BIGINT.

    One map-side-combinable pass over the scan; O(1) arithmetic after.
    """
    c = F.round(F.col("value") * 100).cast("bigint")
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum(c).alias("s"),
        F.sum(c * c).alias("q"),
    ]
    for t in _EV_TYPES:
        it = F.col("event_type") == t
        aggs.append(F.sum(it.cast("bigint")).alias(f"n_{t}"))
        aggs.append(F.sum(F.when(it, c).otherwise(0)).alias(f"s_{t}"))
    m = load_table(spark, sf_dir, "events").agg(*aggs)
    between = " + ".join(
        f"(CAST(s_{t} AS DOUBLE) / n_{t}) * s_{t}" for t in _EV_TYPES
    )
    k = len(_EV_TYPES)
    return m.select(
        "n",
        F.expr(
            f"round(({between} - (CAST(s AS DOUBLE) / n) * s) / 10000, 4)"
        ).alias("ssb"),
        F.expr(f"round((CAST(q AS DOUBLE) - ({between})) / 10000, 4)").alias(
            "ssw"
        ),
        F.expr(
            f"round((({between} - (CAST(s AS DOUBLE) / n) * s) / ({k} - 1))"
            f" / ((CAST(q AS DOUBLE) - ({between})) / (n - {k})), 4)"
        ).alias("f_stat"),
        F.expr(
            f"round(({between} - (CAST(s AS DOUBLE) / n) * s)"
            " / (CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n) * s), 6)"
        ).alias("eta_sq"),
    )


@query(
    "q_ml_linreg",
    oracle="""
    WITH b AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT)                  AS x1,
               CAST(round(l_discount * 100) AS BIGINT)     AS x2,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT flag, count(*) AS n,
               sum(x1) AS s1,  sum(x2) AS s2,  sum(y) AS sy,
               sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x1*x2) AS s12,
               sum(x1*y) AS s1y,  sum(x2*y) AS s2y,  sum(y*y) AS syy
        FROM b GROUP BY flag
    ),
    c AS (
        SELECT flag, n,
               CAST(n*s11 - s1*s1 AS DOUBLE) AS c11,
               CAST(n*s22 - s2*s2 AS DOUBLE) AS c22,
               CAST(n*s12 - s1*s2 AS DOUBLE) AS c12,
               CAST(n*s1y - s1*sy AS DOUBLE) AS c1y,
               CAST(n*s2y - s2*sy AS DOUBLE) AS c2y,
               CAST(n*syy - sy*sy AS DOUBLE) AS cyy,
               CAST(s1 AS DOUBLE) AS ds1, CAST(s2 AS DOUBLE) AS ds2,
               CAST(sy AS DOUBLE) AS dsy
        FROM m
    ),
    s AS (
        SELECT flag, n, c1y, c2y, cyy, ds1, ds2, dsy,
               (c22*c1y - c12*c2y) / (c11*c22 - c12*c12) AS b1,
               (c11*c2y - c12*c1y) / (c11*c22 - c12*c12) AS b2
        FROM c
    )
    SELECT flag AS l_returnflag,
           CAST(n AS BIGINT) AS n,
           round(b1, 6) AS b_qty,
           round(b2, 6) AS b_disc,
           round((dsy - b1*ds1 - b2*ds2) / CAST(n AS DOUBLE), 4)
               AS intercept,
           round((b1*c1y + b2*c2y) / cyy, 6) AS r2
    FROM s
    """,
)
def q_ml_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression (2 features + intercept) solved in
    closed form from the normal equations — price-in-cents regressed on
    quantity and discount-in-percent per return flag.  One aggregation
    pass accumulates the nine raw moments as EXACT integers (cents ×
    quantity products are BIGINT row-side, summed as DECIMAL(38,0) on
    the Spark side / HUGEINT in DuckDB — ``sum(y*y)`` crosses int64
    around 2e5 rows per group, so the widening is load-bearing, not
    defensive), the centered co-moment matrix is assembled with exact
    integer arithmetic, and floats appear only in the final Cramer's
    rule division evaluated on identical integers in both engines
    (SURVEY §7.5).  R² comes from the same moments.

    Scale posture: a single map-side-combinable hash aggregate — the
    only shuffle is 3 groups × 10 moment columns, then a constant-size
    solve.  This is the pattern for distributed OLS at any width: k
    features need k(k+3)/2 moment sums and a driver-side k×k solve
    (here inlined because k=2 has a closed form).
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    m = b.groupBy("flag").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x1").cast(dec)).alias("s1"),
        F.sum(F.col("x2").cast(dec)).alias("s2"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x1") * F.col("x1")).cast(dec)).alias("s11"),
        F.sum((F.col("x2") * F.col("x2")).cast(dec)).alias("s22"),
        F.sum((F.col("x1") * F.col("x2")).cast(dec)).alias("s12"),
        F.sum((F.col("x1") * F.col("y")).cast(dec)).alias("s1y"),
        F.sum((F.col("x2") * F.col("y")).cast(dec)).alias("s2y"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    c = m.select(
        "flag",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1"))
        .cast("double").alias("c11"),
        (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2"))
        .cast("double").alias("c22"),
        (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2"))
        .cast("double").alias("c12"),
        (F.col("n") * F.col("s1y") - F.col("s1") * F.col("sy"))
        .cast("double").alias("c1y"),
        (F.col("n") * F.col("s2y") - F.col("s2") * F.col("sy"))
        .cast("double").alias("c2y"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double").alias("cyy"),
        F.col("s1").cast("double").alias("ds1"),
        F.col("s2").cast("double").alias("ds2"),
        F.col("sy").cast("double").alias("dsy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    s = c.select(
        "flag", "n", "c1y", "c2y", "cyy", "ds1", "ds2", "dsy",
        ((F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det)
        .alias("b1"),
        ((F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det)
        .alias("b2"),
    )
    return s.select(
        F.col("flag").alias("l_returnflag"),
        "n",
        F.round("b1", 6).alias("b_qty"),
        F.round("b2", 6).alias("b_disc"),
        F.round(
            (
                F.col("dsy")
                - F.col("b1") * F.col("ds1")
                - F.col("b2") * F.col("ds2")
            )
            / F.col("n").cast("double"),
            4,
        ).alias("intercept"),
        F.round(
            (F.col("b1") * F.col("c1y") + F.col("b2") * F.col("c2y"))
            / F.col("cyy"),
            6,
        ).alias("r2"),
    )


def _daily_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day exact pair series for the bivariate rank/time tests:
    ``x`` = purchase revenue in integer cents, ``y`` = view count.
    One keyed aggregate over the log; the day grain bounds the series
    at calendar size regardless of corpus row count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type").isin("purchase", "view"))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.expr("CAST(round(value * 100) AS BIGINT)"),
                    )
                ),
                F.lit(0),
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("y"),
        )
    )


_DAILY_XY_SQL = """
        SELECT CAST(ts AS DATE) AS day,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                 THEN CAST(round(value * 100) AS BIGINT)
                                 END), 0) AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events
        WHERE event_type IN ('purchase', 'view')
        GROUP BY CAST(ts AS DATE)
"""


@query(
    "q_stat_kendall",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    p AS (
        SELECT sign(a.x - b.x) AS dx, sign(a.y - b.y) AS dy
        FROM d a JOIN d b ON a.day < b.day
    ),
    c AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_concordant,
            CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_discordant,
            CAST(sum(CASE WHEN dx = 0 AND dy != 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_tie_x,
            CAST(sum(CASE WHEN dy = 0 AND dx != 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_tie_y,
            CAST(sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_tie_both
        FROM p
    )
    SELECT (SELECT count(*) FROM d) AS n_days,
           n_pairs, n_concordant, n_discordant, n_tie_x, n_tie_y,
           n_tie_both,
           round((CAST(n_concordant AS DOUBLE) - n_discordant)
                 / sqrt((CAST(n_pairs AS DOUBLE) - n_tie_x - n_tie_both)
                        * (CAST(n_pairs AS DOUBLE) - n_tie_y - n_tie_both)),
                 4) AS tau_b
    FROM c
    """,
)
def q_stat_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank correlation (tau-b) between daily purchase revenue
    and daily view count — the non-parametric monotone-association test
    an analyst runs when Spearman's rank averaging is too coarse for
    heavy ties.

    Determinism: concordant/discordant/tie counts are pure BIGINT pair
    classifications over exact cents and counts; ``tau_b`` is the single
    final float expression on those integers (SURVEY §7.5).  Plan: one
    day-grain aggregate shrinks the log to calendar size, then the
    O(days²) pair self-join runs on the broadcast aggregate — at 100 TB
    the quadratic term is over days, not rows, so the shape survives
    scale unchanged."""
    d = _daily_xy(spark, sf_dir)
    a = d.select(
        F.col("day").alias("day_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = d.select(
        F.col("day").alias("day_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    pairs = a.join(F.broadcast(b), F.col("day_a") < F.col("day_b")).select(
        F.signum(F.col("xa") - F.col("xb")).cast("int").alias("dx"),
        F.signum(F.col("ya") - F.col("yb")).cast("int").alias("dy"),
    )
    c = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(F.col("dx") * F.col("dy") > 0, 1).otherwise(0)).alias(
            "n_concordant"
        ),
        F.sum(F.when(F.col("dx") * F.col("dy") < 0, 1).otherwise(0)).alias(
            "n_discordant"
        ),
        F.sum(
            F.when((F.col("dx") == 0) & (F.col("dy") != 0), 1).otherwise(0)
        ).alias("n_tie_x"),
        F.sum(
            F.when((F.col("dy") == 0) & (F.col("dx") != 0), 1).otherwise(0)
        ).alias("n_tie_y"),
        F.sum(
            F.when((F.col("dx") == 0) & (F.col("dy") == 0), 1).otherwise(0)
        ).alias("n_tie_both"),
    )
    n_days = d.agg(F.count("*").alias("n_days"))
    return c.crossJoin(F.broadcast(n_days)).select(
        "n_days", "n_pairs", "n_concordant", "n_discordant",
        "n_tie_x", "n_tie_y", "n_tie_both",
        F.round(
            (
                F.col("n_concordant").cast("double")
                - F.col("n_discordant")
            )
            / F.sqrt(
                (
                    F.col("n_pairs").cast("double")
                    - F.col("n_tie_x")
                    - F.col("n_tie_both")
                )
                * (
                    F.col("n_pairs").cast("double")
                    - F.col("n_tie_y")
                    - F.col("n_tie_both")
                )
            ),
            4,
        ).alias("tau_b"),
    )


@query(
    "q_stat_runs",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS total FROM d
    ),
    f AS (
        SELECT d.day,
               CASE WHEN d.x * t.n > t.total THEN 1 ELSE 0 END AS above
        FROM d CROSS JOIN t
    ),
    r AS (
        SELECT above,
               CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
                         OR lag(above) OVER (ORDER BY day) != above
                    THEN 1 ELSE 0 END AS is_start
        FROM f
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(above) AS BIGINT) AS n_above,
               CAST(count(*) - sum(above) AS BIGINT) AS n_below,
               CAST(sum(is_start) AS BIGINT) AS n_runs
        FROM r
    )
    SELECT n_days, n_above, n_below, n_runs,
           round(1 + 2.0 * n_above * n_below / n_days, 4) AS expected_runs,
           round((n_runs - (1 + 2.0 * n_above * n_below / n_days))
                 / sqrt(2.0 * n_above * n_below
                        * (2.0 * n_above * n_below - n_days)
                        / (CAST(n_days AS DOUBLE) * n_days
                           * (n_days - 1))), 4) AS z
    FROM s
    """,
)
def q_stat_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily purchase-revenue series:
    is the above/below-mean pattern random, or does it trend/cluster?

    The above-mean flag is the exact integer comparison
    ``x·n > Σx`` (cross-multiplied mean — no fractional mean ever
    materializes), run boundaries come from a lag over the day order,
    and only ``expected_runs``/``z`` are final float expressions on the
    exact counts.  The global day-ordered window is calendar-bounded
    (allowlisted); everything upstream is a keyed aggregate."""
    d = _daily_xy(spark, sf_dir)
    t = d.agg(
        F.count("*").alias("n"), F.sum("x").alias("total")
    )
    f = d.crossJoin(F.broadcast(t)).select(
        "day",
        F.when(F.col("x") * F.col("n") > F.col("total"), 1)
        .otherwise(0)
        .alias("above"),
    )
    w = Window.orderBy("day")
    r = f.select(
        "above",
        F.when(
            F.lag("above").over(w).isNull()
            | (F.lag("above").over(w) != F.col("above")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    s = r.agg(
        F.count("*").alias("n_days"),
        F.sum("above").alias("n_above"),
        (F.count("*") - F.sum("above")).alias("n_below"),
        F.sum("is_start").alias("n_runs"),
    )
    exp = 1 + 2.0 * F.col("n_above") * F.col("n_below") / F.col("n_days")
    var = (
        2.0
        * F.col("n_above")
        * F.col("n_below")
        * (2.0 * F.col("n_above") * F.col("n_below") - F.col("n_days"))
        / (
            F.col("n_days").cast("double")
            * F.col("n_days")
            * (F.col("n_days") - 1)
        )
    )
    return s.select(
        "n_days", "n_above", "n_below", "n_runs",
        F.round(exp, 4).alias("expected_runs"),
        F.round((F.col("n_runs") - exp) / F.sqrt(var), 4).alias("z"),
    )


@query(
    "q_win_rolling_corr",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    w AS (
        SELECT day,
               CAST(count(*) OVER f AS BIGINT) AS n,
               CAST(sum(x) OVER f AS BIGINT) AS sx,
               CAST(sum(y) OVER f AS BIGINT) AS sy,
               CAST(sum(x * x) OVER f AS BIGINT) AS sxx,
               CAST(sum(y * y) OVER f AS BIGINT) AS syy,
               CAST(sum(x * y) OVER f AS BIGINT) AS sxy
        FROM d
        WINDOW f AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(day AS VARCHAR) AS day,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 4) AS r7
    FROM w WHERE n = 7
    """,
)
def q_win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling Pearson correlation between daily purchase revenue
    and daily view count — the co-movement monitor behind "do views
    still convert?" dashboards.

    All six rolling moments (n, Σx, Σy, Σx², Σy², Σxy) are BIGINT sums
    of exact cents/counts over a ROWS frame; ``r7`` is the one final
    float per row, so frame evaluation order cannot perturb the hash.
    Overflow headroom: Σx² over 7 days of cents stays < 2⁶² far beyond
    sf100.  Day output is VARCHAR (DATE canonicalizer hazard).  The
    day-ordered global window is calendar-bounded (allowlisted)."""
    d = _daily_xy(spark, sf_dir)
    f = (
        Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    )
    w = d.select(
        "day",
        F.count("*").over(f).alias("n"),
        F.sum("x").over(f).alias("sx"),
        F.sum("y").over(f).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(f).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(f).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(f).alias("sxy"),
    )
    return w.where(F.col("n") == 7).select(
        F.col("day").cast("string").alias("day"),
        F.round(
            (
                F.col("n").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / F.sqrt(
                (
                    F.col("n").cast("double") * F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx")
                )
                * (
                    F.col("n").cast("double") * F.col("syy")
                    - F.col("sy").cast("double") * F.col("sy")
                )
            ),
            4,
        ).alias("r7"),
    )


# Cumulative Poisson(1) thresholds scaled to 2^60 — fixed literals shared
# verbatim by both engines (the derivation's float precision is
# irrelevant; only cross-engine equality of the constants matters).
_POIS = [
    424136118829305344, 848272237658610688, 1060340297073263360,
    1131029650211480960, 1148701988496035328, 1152236456152946176,
    1152825534095764608, 1152909688087595776, 1152920207336574720,
]
_POIS_CASE = (
    "CASE "
    + " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POIS)
    )
    + " ELSE 9 END"
)


@query(
    "q_stat_bootstrap",
    oracle=f"""
    WITH x AS (
        SELECT event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT b, cents,
               ('0x' || substr(md5(event_id || '_' || b), 1, 15))::BIGINT
                   AS u
        FROM x CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
    ),
    m AS (
        SELECT b,
               CAST(sum({_POIS_CASE}) AS BIGINT) AS n_b,
               CAST(sum(({_POIS_CASE}) * cents) AS BIGINT) AS s_b
        FROM r GROUP BY b
    ),
    ranked AS (
        SELECT s_b, n_b,
               row_number() OVER (
                   ORDER BY CAST(s_b AS DOUBLE) / n_b, b) AS rk
        FROM m
    ),
    pt AS (
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(cents) AS BIGINT) AS total FROM x
    )
    SELECT n_events,
           round(CAST(total AS DOUBLE) / n_events / 100, 4) AS point_mean,
           round((SELECT CAST(s_b AS DOUBLE) / n_b / 100
                  FROM ranked WHERE rk = 2), 4) AS ci_lo,
           round((SELECT CAST(s_b AS DOUBLE) / n_b / 100
                  FROM ranked WHERE rk = 63), 4) AS ci_hi
    FROM pt
    """,
)
def q_stat_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean purchase
    value — the cluster-scale bootstrap (Chamandy et al.): instead of
    resampling rows with replacement (which needs global coordination),
    each (row, resample) pair draws an independent Poisson(1)
    multiplicity, so the 64 resamples are computed in ONE scan with an
    explode and a keyed aggregate — embarrassingly parallel at 100 TB.

    Determinism: the multiplicity is a pure function of
    ``md5(event_id, b)`` compared against fixed 2⁶⁰-scaled cumulative-
    Poisson thresholds (integer compares, no RNG); each resample's
    (Σc·x, Σc) are exact BIGINTs; resample means are ranked by the
    IEEE-identical double of those exact ints with ``b`` as tie-break;
    the 2.5 %/97.5 % bounds are discrete order statistics (ranks 2 and
    63 of 64).  The rank window runs over exactly 64 rows (fixed B)."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("event_type") == "purchase").select(
        "event_id", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    r = x.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
        F.col("event_id"),
    ).select(
        "b",
        "cents",
        F.expr(
            "conv(substr(md5(concat(CAST(event_id AS STRING), '_',"
            " CAST(b AS STRING))), 1, 15), 16, 10)"
        ).cast("bigint").alias("u"),
    )
    m = r.select(
        "b", "cents", F.expr(_POIS_CASE).alias("c")
    ).groupBy("b").agg(
        F.sum("c").alias("n_b"),
        F.sum(F.col("c") * F.col("cents")).alias("s_b"),
    )
    w = Window.orderBy(
        F.col("s_b").cast("double") / F.col("n_b"), F.col("b")
    )
    ranked = m.select(
        "s_b", "n_b", F.row_number().over(w).alias("rk")
    )
    # min() aggregates (single-row groups) so an EMPTY purchase set
    # still yields one NULL row — matching the oracle's scalar
    # subqueries — instead of an empty cross join.
    lo = ranked.where(F.col("rk") == 2).agg(
        F.min(
            F.round(F.col("s_b").cast("double") / F.col("n_b") / 100, 4)
        ).alias("ci_lo")
    )
    hi = ranked.where(F.col("rk") == 63).agg(
        F.min(
            F.round(F.col("s_b").cast("double") / F.col("n_b") / 100, 4)
        ).alias("ci_hi")
    )
    pt = x.agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("cents").cast("double") / F.count("*") / 100, 4).alias(
            "point_mean"
        ),
    )
    return (
        pt.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi)).select(
            "n_events", "point_mean", "ci_lo", "ci_hi"
        )
    )


@query(
    "q_stat_theilsen",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    i AS (
        SELECT date_diff('day', DATE '1970-01-01', day) AS di, x FROM d
    ),
    p AS (
        SELECT b.x - a.x AS dy, b.di - a.di AS dx
        FROM i a JOIN i b ON a.di < b.di
    ),
    rk AS (
        SELECT p.dy, p.dx,
               (SELECT count(*) FROM p q
                WHERE q.dy * p.dx < p.dy * q.dx) AS n_less,
               (SELECT count(*) FROM p q
                WHERE q.dy * p.dx = p.dy * q.dx) AS n_eq
        FROM p
    ),
    n AS (SELECT count(*) AS n_pairs FROM p)
    SELECT (SELECT count(*) FROM d) AS n_days,
           (SELECT CAST(n_pairs AS BIGINT) FROM n) AS n_pairs,
           round(min(CAST(dy AS DOUBLE) / dx / 100), 4)
               AS slope_per_day
    FROM rk CROSS JOIN n
    WHERE n_less < (n_pairs + 1) // 2
      AND n_less + n_eq >= (n_pairs + 1) // 2
    """,
)
def q_stat_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator: the median of all pairwise
    slopes of the daily purchase-revenue series — the outlier-immune
    answer to "is revenue trending?" (breakdown point 29%, vs 0% for
    OLS).

    Exact-median discipline: each pairwise slope is the rational
    dy/dx (cents per day, dx > 0); the median is selected by exact
    CROSS-MULTIPLIED rank comparison (dy_q·dx_p < dy_p·dx_q — no float
    ever participates in the ordering), taking the lower-median order
    statistic; every rank-tied winner carries the same rational value,
    so the single final float division is well-defined.  Products stay
    < 2⁴⁰ at any plausible scale.  Plan: day-grain aggregate, then the
    O(days²) pair join and O(days⁴)-bounded rank join both run on
    broadcast calendar-size inputs."""
    d = _daily_xy(spark, sf_dir)
    i = d.select(
        F.datediff("day", F.lit("1970-01-01").cast("date")).alias("di"),
        "x",
    )
    a = i.select(F.col("di").alias("dia"), F.col("x").alias("xa"))
    b = i.select(F.col("di").alias("dib"), F.col("x").alias("xb"))
    p = a.join(F.broadcast(b), F.col("dia") < F.col("dib")).select(
        (F.col("xb") - F.col("xa")).alias("dy"),
        (F.col("dib") - F.col("dia")).cast("long").alias("dx"),
    )
    # Collapse duplicate (dy, dx) pairs first and carry multiplicities:
    # ranking on raw pair rows would count each q-match once per
    # duplicate p-row, inflating n_less/n_eq for repeated slopes.
    pd_ = p.groupBy("dy", "dx").agg(F.count("*").alias("w"))
    q = pd_.select(
        F.col("dy").alias("qdy"), F.col("dx").alias("qdx"),
        F.col("w").alias("qw"),
    )
    rk = (
        pd_.join(
            F.broadcast(q),
            (F.col("qdy") * F.col("dx") <= F.col("dy") * F.col("qdx")),
        )
        .groupBy("dy", "dx")
        .agg(
            F.sum(
                F.when(
                    F.col("qdy") * F.col("dx") < F.col("dy") * F.col("qdx"),
                    F.col("qw"),
                ).otherwise(0)
            ).alias("n_less"),
            F.sum(
                F.when(
                    F.col("qdy") * F.col("dx") == F.col("dy") * F.col("qdx"),
                    F.col("qw"),
                ).otherwise(0)
            ).alias("n_eq"),
        )
    )
    n = p.agg(F.count("*").alias("n_pairs"))
    nd = d.agg(F.count("*").alias("n_days"))
    med = (
        rk.crossJoin(F.broadcast(n))
        .where(
            (F.col("n_less") < (F.col("n_pairs") + 1) / 2)
            & (
                F.col("n_less") + F.col("n_eq")
                >= (F.col("n_pairs") + 1).cast("long") / 2
            )
        )
        .agg(
            F.round(
                F.min(F.col("dy").cast("double") / F.col("dx") / 100), 4
            ).alias("slope_per_day")
        )
    )
    return (
        nd.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(med)).select(
            "n_days", "n_pairs", "slope_per_day"
        )
    )


@query(
    "q_stat_qq",
    oracle="""
    WITH s AS (
        SELECT event_type AS side,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pv AS (
        SELECT side, vc, CAST(count(*) AS BIGINT) AS ct
        FROM s GROUP BY 1, 2
    ),
    cum AS (
        SELECT side, vc,
               sum(ct) OVER (PARTITION BY side ORDER BY vc) AS cum_n,
               sum(ct) OVER (PARTITION BY side) AS n
        FROM pv
    ),
    dec AS (SELECT unnest(generate_series(1, 9)) AS decile),
    at_d AS (
        SELECT d.decile, c.side, CAST(min(c.vc) AS BIGINT) AS vc
        FROM cum c JOIN dec d ON 10 * c.cum_n >= d.decile * c.n
        GROUP BY 1, 2
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(max(CASE WHEN side = 'purchase' THEN vc END) AS BIGINT)
               AS purchase_cents,
           CAST(max(CASE WHEN side = 'view' THEN vc END) AS BIGINT)
               AS view_cents
    FROM at_d
    GROUP BY decile
    """,
)
def q_stat_qq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile–quantile table: the nine exact deciles of the purchase
    and view ``value`` distributions side by side — the distribution-
    shift picture behind the KS statistic (q_stat_ks gives the max
    gap; this gives the whole curve).

    Each decile is the exact lower order statistic: the smallest value
    whose cumulative count satisfies 10·cum ≥ d·n — pure integer
    predicates, no interpolation, no floats anywhere.  The cumulative
    scan runs per side over the *per-distinct-value* aggregate
    (bounded by distinct cents, not rows); the decile spine joins as a
    broadcast θ-join, and the final pivot is a 18-row conditional agg.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.col("event_type").alias("side"),
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
    )
    pv = s.groupBy("side", "vc").agg(F.count("*").alias("ct"))
    wc = (
        Window.partitionBy("side")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("side")
    cum = pv.select(
        "side",
        "vc",
        F.sum("ct").over(wc).alias("cum_n"),
        F.sum("ct").over(wn).alias("n"),
    )
    dec = spark.range(1, 10).select(F.col("id").alias("decile"))
    at_d = (
        cum.join(
            F.broadcast(dec),
            10 * F.col("cum_n") >= F.col("decile") * F.col("n"),
        )
        .groupBy("decile", "side")
        .agg(F.min("vc").cast("long").alias("vc"))
    )
    return at_d.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.max(F.when(F.col("side") == "purchase", F.col("vc")))
        .cast("long")
        .alias("purchase_cents"),
        F.max(F.when(F.col("side") == "view", F.col("vc")))
        .cast("long")
        .alias("view_cents"),
    )


_BF_TYPES = ("click", "error", "purchase", "signup", "view")


def _bf_oracle() -> str:
    """Brown–Forsythe oracle: exact per-group (n, Σz, Σz²) pivoted to
    one row, then ONE fixed-group-order float expression — the same
    shape the Spark side uses, so no cross-group summation-order
    hazard exists in either engine."""
    piv = ",\n           ".join(
        f"CAST(max(CASE WHEN g = '{t}' THEN {c} END) AS BIGINT) AS {c}_{i}"
        for i, t in enumerate(_BF_TYPES)
        for c in ("n", "s", "q")
    )
    bet = " + ".join(
        f"CAST(s_{i} AS DOUBLE) * s_{i} / n_{i}" for i in range(5)
    )
    qq = " + ".join(f"CAST(q_{i} AS DOUBLE)" for i in range(5))
    nn = " + ".join(f"n_{i}" for i in range(5))
    ss = " + ".join(f"s_{i}" for i in range(5))
    return f"""
    WITH s AS (
        SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    pv AS (
        SELECT g, vc, CAST(count(*) AS BIGINT) AS ct
        FROM s GROUP BY 1, 2
    ),
    cum AS (
        SELECT g, vc,
               sum(ct) OVER (PARTITION BY g ORDER BY vc) AS cum_n,
               sum(ct) OVER (PARTITION BY g) AS n
        FROM pv
    ),
    med AS (
        SELECT g, CAST(min(vc) AS BIGINT) AS med
        FROM cum WHERE 2 * cum_n >= n GROUP BY g
    ),
    z AS (
        SELECT s.g, abs(s.vc - med.med) AS z
        FROM s JOIN med ON s.g = med.g
    ),
    per AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(z) AS BIGINT) AS s,
               CAST(sum(z * z) AS BIGINT) AS q
        FROM z GROUP BY 1
    ),
    one AS (
        SELECT {piv}
        FROM per
    ),
    fin AS (
        SELECT ({nn}) AS nt, ({ss}) AS st,
               ({bet}) AS grp_sq, ({qq}) AS qt
        FROM one
    )
    SELECT CAST(nt AS BIGINT) AS n_total,
           CAST(st AS BIGINT) AS sum_z,
           round((grp_sq - CAST(st AS DOUBLE) * st / nt)
                 / ((qt - grp_sq) / (nt - 5)) / 4, 4) AS bf_stat
    FROM fin
    """


@query("q_stat_levene", oracle=_bf_oracle())
def q_stat_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe (median-based Levene) test: are the ``value``
    spreads equal across the five event types?  One-way ANOVA on
    |x − group median| — the robust variance-homogeneity gate run
    before trusting a pooled t-test.

    Group medians are exact lower order statistics (2·cum ≥ n over the
    per-distinct-value scan); |x−med| is exact integer; each group's
    (n, Σz, Σz²) is an exact BIGINT triple pivoted into ONE row, and
    the F statistic is a single fixed-group-order double expression —
    the five-term sums are written out literally in both engines, so
    no engine ever sums floats in a nondeterministic order.  Plan: two
    keyed aggregates + a broadcast median join; the pivot row is 15
    integers.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.col("event_type").alias("g"),
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
    )
    pv = s.groupBy("g", "vc").agg(F.count("*").alias("ct"))
    wc = (
        Window.partitionBy("g")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("g")
    cum = pv.select(
        "g",
        "vc",
        F.sum("ct").over(wc).alias("cum_n"),
        F.sum("ct").over(wn).alias("n"),
    )
    med = (
        cum.where(2 * F.col("cum_n") >= F.col("n"))
        .groupBy("g")
        .agg(F.min("vc").cast("long").alias("med"))
    )
    z = s.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("vc") - F.col("med")).alias("z")
    )
    per = z.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("z").cast("long").alias("s"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("q"),
    )
    one = per.agg(
        *[
            F.max(F.when(F.col("g") == t, F.col(c)))
            .cast("long")
            .alias(f"{c}_{i}")
            for i, t in enumerate(_BF_TYPES)
            for c in ("n", "s", "q")
        ]
    )
    nt = sum((F.col(f"n_{i}") for i in range(1, 5)), F.col("n_0"))
    st = sum((F.col(f"s_{i}") for i in range(1, 5)), F.col("s_0"))
    grp_sq = sum(
        (
            F.col(f"s_{i}").cast("double") * F.col(f"s_{i}")
            / F.col(f"n_{i}")
            for i in range(1, 5)
        ),
        F.col("s_0").cast("double") * F.col("s_0") / F.col("n_0"),
    )
    qt = sum(
        (F.col(f"q_{i}").cast("double") for i in range(1, 5)),
        F.col("q_0").cast("double"),
    )
    return one.select(
        nt.cast("long").alias("n_total"),
        st.cast("long").alias("sum_z"),
        F.round(
            (grp_sq - st.cast("double") * st / nt)
            / ((qt - grp_sq) / (nt - 5))
            / 4,
            4,
        ).alias("bf_stat"),
    )


@query(
    "q_stat_permtest",
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    obs AS (
        SELECT CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
                   AS a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS b,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2
        FROM u
    ),
    perms AS (
        SELECT k,
               CAST(sum(CASE WHEN bit = 1 THEN y ELSE 0 END) AS BIGINT)
                   AS ak,
               CAST(sum(CASE WHEN bit = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1k,
               CAST(sum(CASE WHEN bit = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS bk,
               CAST(sum(CASE WHEN bit = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2k
        FROM (
            SELECT u.y, k.k,
                   CAST(('0x' || substr(md5(CAST(u.user_id AS VARCHAR)
                                            || ':' || k.k), 1, 15))
                        AS BIGINT) & 1 AS bit
            FROM u CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS k) k
        )
        GROUP BY k
    ),
    cmp AS (
        SELECT p.k,
               CASE WHEN abs(p.ak * p.n2k - p.bk * p.n1k) * o.n1 * o.n2
                         >= abs(o.a * o.n2 - o.b * o.n1) * p.n1k * p.n2k
                    THEN 1 ELSE 0 END AS extreme
        FROM perms p CROSS JOIN obs o
    )
    SELECT o.a, o.n1, o.b, o.n2,
           round(CAST(o.a AS DOUBLE) / o.n1
                 - CAST(o.b AS DOUBLE) / o.n2, 6) AS observed_diff,
           CAST(sum(c.extreme) AS BIGINT) AS n_extreme,
           CAST(count(*) AS BIGINT) AS n_perms,
           round(CAST(sum(c.extreme) AS DOUBLE) / count(*), 6) AS p_value
    FROM cmp c CROSS JOIN obs o
    GROUP BY o.a, o.n1, o.b, o.n2
    """,
)
def q_stat_permtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test on the purchase-conversion difference between
    the two user-id-parity arms, with 32 DETERMINISTIC pseudo-
    permutations: permutation k reassigns each user by bit 0 of
    md5(user:k) — the Monte-Carlo method made exactly reproducible,
    the same trick as the repo's hash samplers.

    The "is this permutation at least as extreme" comparison never
    forms a rate: |a_k·n2k − b_k·n1k|·n1·n2 ≥ |a·n2 − b·n1|·n1k·n2k
    cross-multiplies both fractions into exact BIGINTs (≤ ~5e15 at
    sf0.1), so the p-value is an exact rational count/32.  One
    per-user aggregate, a 32-row spine fan-out, two tiny aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("y")
    ).cache()
    obs = u.agg(
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    ks = spark.range(0, 32).select(F.col("id").alias("k"))
    perms = (
        u.crossJoin(F.broadcast(ks))
        .select(
            "y",
            "k",
            (
                F.expr(
                    "cast(conv(substr(md5(cast(user_id as string)"
                    " || ':' || k), 1, 15), 16, 10) as bigint)"
                )
                % 2
            ).alias("bit"),
        )
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("bit") == 1, F.col("y")).otherwise(0))
            .cast("long")
            .alias("ak"),
            F.sum(F.when(F.col("bit") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n1k"),
            F.sum(F.when(F.col("bit") == 0, F.col("y")).otherwise(0))
            .cast("long")
            .alias("bk"),
            F.sum(F.when(F.col("bit") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n2k"),
        )
    )
    cmp = perms.crossJoin(F.broadcast(obs)).select(
        "a",
        "n1",
        "b",
        "n2",
        F.when(
            F.abs(
                F.col("ak") * F.col("n2k") - F.col("bk") * F.col("n1k")
            )
            * F.col("n1")
            * F.col("n2")
            >= F.abs(
                F.col("a") * F.col("n2") - F.col("b") * F.col("n1")
            )
            * F.col("n1k")
            * F.col("n2k"),
            1,
        )
        .otherwise(0)
        .alias("extreme"),
    )
    return cmp.groupBy("a", "n1", "b", "n2").agg(
        F.round(
            F.col("a").cast("double") / F.col("n1")
            - F.col("b").cast("double") / F.col("n2"),
            6,
        ).alias("observed_diff"),
        F.sum("extreme").cast("long").alias("n_extreme"),
        F.count("*").alias("n_perms"),
        F.round(
            F.sum("extreme").cast("double") / F.count("*"), 6
        ).alias("p_value"),
    ).select(
        "a",
        "n1",
        "b",
        "n2",
        "observed_diff",
        "n_extreme",
        "n_perms",
        "p_value",
    )


@query(
    "q_stat_cdf_point",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN CAST(round(value * 100) AS BIGINT)
                           < 10000 THEN 1 END) AS BIGINT) AS n_below,
           CAST(count(CASE WHEN CAST(round(value * 100) AS BIGINT)
                           = 10000 THEN 1 END) AS BIGINT) AS n_equal,
           round(CAST(count(CASE WHEN CAST(round(value * 100) AS BIGINT)
                                 < 10000 THEN 1 END) AS DOUBLE)
                 / count(*), 6) AS cdf_at_100
    FROM events
    GROUP BY event_type
    """,
)
def q_stat_cdf_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-quantile point query: where does the $100.00 mark sit
    in each event type's value distribution — F(100) as exact
    below/equal counts plus the rounded CDF value.  The dual of the
    percentile family (they answer "what value at p"; this answers
    "what p at value"), and the primitive behind threshold what-if
    questions.

    Pure conditional counts on exact cents; one aggregate, no window,
    no sort — the cheapest query in the registry by design, because
    the dashboard asks it on every slider move.
    """
    ev = load_table(spark, sf_dir, "events")
    vc = F.expr("cast(round(value * 100) as bigint)")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(F.when(vc < 10000, 1)).cast("long").alias("n_below"),
        F.count(F.when(vc == 10000, 1)).cast("long").alias("n_equal"),
        F.round(
            F.count(F.when(vc < 10000, 1)).cast("double") / F.count("*"),
            6,
        ).alias("cdf_at_100"),
    )


@query(
    "q_stat_wilson",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS conv,
               CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                        END) AS BIGINT) AS clicked
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT clicked AS segment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(conv) AS BIGINT) AS k
        FROM u GROUP BY 1
    )
    SELECT CAST(segment AS BIGINT) AS clicked_segment, n, k,
           round(CAST(k AS DOUBLE) / n, 6) AS rate,
           round((k + 1.9208) / (n + 3.8416)
                 - 1.96 * sqrt(CAST(k AS DOUBLE) * (n - k) / n + 0.9604)
                   / (n + 3.8416), 6) AS wilson_low,
           round((k + 1.9208) / (n + 3.8416)
                 + 1.96 * sqrt(CAST(k AS DOUBLE) * (n - k) / n + 0.9604)
                   / (n + 3.8416), 6) AS wilson_high
    FROM g
    """,
)
def q_stat_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for the conversion rate of clickers
    vs non-clickers — the binomial CI that stays sane at small n and
    extreme rates where the naive Wald interval breaks (the reason
    every experimentation UI quotes Wilson bounds).

    (n, k) are exact integers; the interval is the identical
    closed-form double expression (z = 1.96, z² = 3.8416) over those
    integers in both engines, rounded to 6.  One per-user aggregate +
    a 2-row segment aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("conv"),
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .cast("long")
        .alias("clicked"),
    )
    g = u.groupBy(F.col("clicked").alias("segment")).agg(
        F.count("*").alias("n"), F.sum("conv").cast("long").alias("k")
    )
    center = (F.col("k") + 1.9208) / (F.col("n") + 3.8416)
    half = (
        1.96
        * F.sqrt(
            F.col("k").cast("double")
            * (F.col("n") - F.col("k"))
            / F.col("n")
            + 0.9604
        )
        / (F.col("n") + 3.8416)
    )
    return g.select(
        F.col("segment").cast("long").alias("clicked_segment"),
        "n",
        "k",
        F.round(F.col("k").cast("double") / F.col("n"), 6).alias("rate"),
        F.round(center - half, 6).alias("wilson_low"),
        F.round(center + half, 6).alias("wilson_high"),
    )


@query(
    "q_ml_stump_stability",
    oracle=f"""
    WITH x AS (
        SELECT event_id,
               CAST(round(value * 100) AS BIGINT) // 2000 AS bk,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    r AS (
        SELECT b, bk, y,
               ('0x' || substr(md5(event_id || '_' || b), 1, 15))::BIGINT
                   AS u
        FROM x CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b)
    ),
    g AS (
        SELECT b, bk,
               CAST(sum({_POIS_CASE}) AS BIGINT) AS ct,
               CAST(sum(({_POIS_CASE}) * y) AS BIGINT) AS pos
        FROM r GROUP BY 1, 2
    ),
    cum AS (
        SELECT b, bk,
               sum(ct) OVER (PARTITION BY b ORDER BY bk) AS nl,
               sum(pos) OVER (PARTITION BY b ORDER BY bk) AS pl,
               sum(ct) OVER (PARTITION BY b) AS n,
               sum(pos) OVER (PARTITION BY b) AS p
        FROM g
    ),
    best AS (
        SELECT b, bk FROM (
            SELECT b, bk,
                   row_number() OVER (
                       PARTITION BY b
                       ORDER BY ((pl * pl + (nl - pl) * (nl - pl))
                                 * 1000000) // nl
                              + (((p - pl) * (p - pl)
                                  + ((n - nl) - (p - pl))
                                    * ((n - nl) - (p - pl)))
                                 * 1000000) // (n - nl) DESC, bk) AS rk
            FROM cum WHERE nl < n AND nl > 0
        ) WHERE rk = 1
    ),
    modal AS (
        SELECT bk, CAST(count(*) AS BIGINT) AS freq
        FROM best GROUP BY bk ORDER BY freq DESC, bk LIMIT 1
    )
    SELECT CAST((SELECT count(*) FROM best) AS BIGINT) AS n_resamples,
           CAST((SELECT count(DISTINCT bk) FROM best) AS BIGINT)
               AS n_distinct_thresholds,
           CAST((SELECT min(bk) * 2000 FROM best) AS BIGINT)
               AS min_thr_cents,
           CAST((SELECT max(bk) * 2000 FROM best) AS BIGINT)
               AS max_thr_cents,
           CAST(m.bk * 2000 AS BIGINT) AS modal_thr_cents,
           m.freq AS modal_freq
    FROM modal m
    """,
)
def q_ml_stump_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-stability audit: the q_ml_stump split refit on 16
    deterministic Poisson-bootstrap resamples (the q_stat_bootstrap
    weights) on the $20 threshold grid — a split that jumps between
    resamples is noise, not signal, and this is the check before
    anyone ships the cutoff.

    Every resample's weighted class counts are exact integers (hash-
    derived Poisson multiplicities), the per-resample argmax is the
    stump's fixed-point score partitioned by resample, and the
    summary (distinct thresholds, range, mode with earliest-threshold
    tie-break) is exact.  ONE scan fans out all 16 resamples.
    """
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "event_id",
        F.expr("cast(round(value * 100) as bigint) div 2000").alias("bk"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    spine = spark.range(0, 16).select(F.col("id").alias("b"))
    r = x.crossJoin(F.broadcast(spine)).select(
        "b",
        "bk",
        "y",
        F.expr(
            "cast(conv(substr(md5(concat(cast(event_id as string), '_',"
            " cast(b as string))), 1, 15), 16, 10) as bigint)"
        ).alias("u"),
    )
    g = r.groupBy("b", "bk").agg(
        F.sum(F.expr(_POIS_CASE)).cast("long").alias("ct"),
        F.sum(F.expr(f"({_POIS_CASE}) * y")).cast("long").alias("pos"),
    )
    wc = (
        Window.partitionBy("b")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("b")
    cum = g.select(
        "b",
        "bk",
        F.sum("ct").over(wc).alias("nl"),
        F.sum("pos").over(wc).alias("pl"),
        F.sum("ct").over(wt).alias("n"),
        F.sum("pos").over(wt).alias("p"),
    ).where((F.col("nl") < F.col("n")) & (F.col("nl") > 0))
    score = F.expr(
        "((pl * pl + (nl - pl) * (nl - pl)) * 1000000) div nl"
        " + (((p - pl) * (p - pl)"
        " + ((n - nl) - (p - pl)) * ((n - nl) - (p - pl)))"
        " * 1000000) div (n - nl)"
    )
    wbest = Window.partitionBy("b").orderBy(score.desc(), "bk")
    best = (
        cum.withColumn("rk", F.row_number().over(wbest))
        .where(F.col("rk") == 1)
        .select("b", "bk")
    ).cache()
    summ = best.agg(
        F.count("*").alias("n_resamples"),
        F.countDistinct("bk").cast("long").alias("n_distinct_thresholds"),
        (F.min("bk") * 2000).cast("long").alias("min_thr_cents"),
        (F.max("bk") * 2000).cast("long").alias("max_thr_cents"),
    )
    modal = (
        best.groupBy("bk")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "bk")
        .limit(1)
        .select(
            (F.col("bk") * 2000).cast("long").alias("modal_thr_cents"),
            F.col("freq").cast("long").alias("modal_freq"),
        )
    )
    return summ.crossJoin(F.broadcast(modal))


@query(
    "q_stat_tukey",
    oracle="""
    WITH s AS (
        SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    pv AS (
        SELECT g, vc, CAST(count(*) AS BIGINT) AS ct FROM s GROUP BY 1, 2
    ),
    cum AS (
        SELECT g, vc,
               sum(ct) OVER (PARTITION BY g ORDER BY vc) AS cum_n,
               sum(ct) OVER (PARTITION BY g) AS n
        FROM pv
    ),
    q AS (
        SELECT g,
               CAST(min(CASE WHEN 4 * cum_n >= n THEN vc END) AS BIGINT)
                   AS q1,
               CAST(min(CASE WHEN 4 * cum_n >= 3 * n THEN vc END)
                    AS BIGINT) AS q3
        FROM cum GROUP BY g
    )
    SELECT s.g AS event_type, q.q1 AS q1_cents, q.q3 AS q3_cents,
           CAST(q.q3 - q.q1 AS BIGINT) AS iqr_cents,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN 2 * (s.vc - q.q1) < -3 * (q.q3 - q.q1)
                         OR 2 * (s.vc - q.q3) > 3 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM s JOIN q ON q.g = s.g
    GROUP BY s.g, q.q1, q.q3
    """,
)
def q_stat_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier census per event type: exact lower-quartile
    order statistics (4·cum ≥ n / ≥ 3n), and the 1.5·IQR fences
    evaluated as the doubled integer comparison 2·(x−Q1) < −3·IQR —
    so the half-step fence never becomes a float and the outlier
    counts hash-match exactly.  The box-plot's outlier dots, counted.

    Per-type distinct-value scan + a broadcast quartile join back
    onto the rows; one aggregate out.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.col("event_type").alias("g"),
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
    )
    pv = s.groupBy("g", "vc").agg(F.count("*").alias("ct"))
    wc = (
        Window.partitionBy("g")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("g")
    cum = pv.select(
        "g",
        "vc",
        F.sum("ct").over(wc).alias("cum_n"),
        F.sum("ct").over(wn).alias("n"),
    )
    q = cum.groupBy("g").agg(
        F.min(
            F.when(4 * F.col("cum_n") >= F.col("n"), F.col("vc"))
        )
        .cast("long")
        .alias("q1"),
        F.min(
            F.when(4 * F.col("cum_n") >= 3 * F.col("n"), F.col("vc"))
        )
        .cast("long")
        .alias("q3"),
    )
    j = s.join(F.broadcast(q), "g")
    iqr = F.col("q3") - F.col("q1")
    out = F.when(
        (2 * (F.col("vc") - F.col("q1")) < -3 * iqr)
        | (2 * (F.col("vc") - F.col("q3")) > 3 * iqr),
        1,
    ).otherwise(0)
    return j.groupBy(
        F.col("g").alias("event_type"),
        F.col("q1").alias("q1_cents"),
        F.col("q3").alias("q3_cents"),
    ).agg(
        iqr.cast("long").alias("iqr_cents"),
        F.count("*").alias("n"),
        F.sum(out).cast("long").alias("n_outliers"),
    ).select(
        "event_type",
        "q1_cents",
        "q3_cents",
        "iqr_cents",
        "n",
        "n_outliers",
    )


# ---------------------------------------------------------------- round 3

_CHI_TYPES = ("click", "error", "purchase", "signup", "view")


def _cramers_pieces() -> tuple[dict, dict, str, str]:
    """(row-total exprs, col-total exprs, chi² expression, N
    expression) shared verbatim by both engines so every float add
    happens in the same literal order — the Levene/Brown–Forsythe
    §7.5 pattern."""
    cells = [(i, d) for i in range(len(_CHI_TYPES)) for d in range(1, 8)]
    r = {
        i: "(" + " + ".join(f"o_{i}_{d}" for d in range(1, 8)) + ")"
        for i in range(len(_CHI_TYPES))
    }
    c = {
        d: "(" + " + ".join(f"o_{i}_{d}" for i in range(len(_CHI_TYPES))) + ")"
        for d in range(1, 8)
    }
    n = "(" + " + ".join(f"o_{i}_{d}" for i, d in cells) + ")"
    terms = " + ".join(
        f"(CAST(o_{i}_{d} AS DOUBLE) * o_{i}_{d} / ({r[i]} * CAST({c[d]} AS DOUBLE)))"
        for i, d in cells
    )
    chi2 = f"CAST({n} AS DOUBLE) * (({terms}) - 1.0)"
    return r, c, chi2, n


def _cramers_oracle() -> str:
    _r, _c, chi2, n = _cramers_pieces()
    piv = ",\n           ".join(
        f"CAST(coalesce(max(CASE WHEN event_type = '{t}' AND dow = {d}"
        f" THEN o END), 0) AS BIGINT) AS o_{i}_{d}"
        for i, t in enumerate(_CHI_TYPES)
        for d in range(1, 8)
    )
    return f"""
    WITH cells AS (
        SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    one AS (SELECT {piv} FROM cells),
    fin AS (SELECT {chi2} AS chi2, {n} AS nt FROM one)
    SELECT CAST(nt AS BIGINT)                          AS n_total,
           4                                           AS dof,
           round(chi2, 4)                              AS chi2,
           round(sqrt(chi2 / (CAST(nt AS DOUBLE) * 4)), 6) AS cramers_v
    FROM fin
    """


@query("q_stat_cramers_v", oracle=_cramers_oracle())
def q_stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the event_type × day-of-week
    association — the "is this dependence practically meaningful"
    number next to q_stat_chisq's per-cell table (which avoids summing
    the statistic precisely because a 35-term float sum is
    engine-order-dependent).

    This query DOES sum it, safely: the 35 exact-integer cell counts
    pivot into ONE row and χ² = N·(Σ O²/(R·C) − 1) is a single
    fixed-cell-order double expression built from the same generator
    string in both engines, so the adds happen in the same sequence
    and the hash matches (§7.5; Levene precedent).  V = √(χ²/(N·4)),
    dof = min(r−1, c−1) = 4.  One 35-row aggregate → one row: scale
    is O(events) scan + a constant pivot."""
    _r, _c, chi2, n = _cramers_pieces()
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("o"))
    one = cells.agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("event_type") == t) & (F.col("dow") == d),
                        F.col("o"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"o_{i}_{d}")
            for i, t in enumerate(_CHI_TYPES)
            for d in range(1, 8)
        ]
    )
    return one.select(
        F.expr(n).cast("long").alias("n_total"),
        F.lit(4).alias("dof"),
        F.round(F.expr(chi2), 4).alias("chi2"),
        F.round(
            F.sqrt(F.expr(chi2) / (F.expr(n).cast("double") * 4)), 6
        ).alias("cramers_v"),
    )


@query(
    "q_stat_fdr",
    oracle="""
    WITH obs AS (
        SELECT event_type, dayofweek(ts) + 1 AS dow,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY 1
    ),
    perm AS (
        SELECT event_type, k,
               1 + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                                             || ':' || k), 1, 15))
                         AS BIGINT) % 7) AS dow,
               CAST(count(*) AS BIGINT) AS ok
        FROM events
        CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS k) ks
        GROUP BY 1, 2, 3
    ),
    cell AS (
        SELECT o.event_type, o.dow, o.o, r.rt,
               CAST(coalesce(sum(CASE WHEN abs(7 * p.ok - r.rt)
                                           >= abs(7 * o.o - r.rt)
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_extreme
        FROM obs o
        JOIN r USING (event_type)
        LEFT JOIN perm p
          ON p.event_type = o.event_type AND p.dow = o.dow
        GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (
                   ORDER BY n_extreme, event_type, dow
               ) AS rnk,
               count(*) OVER () AS m
        FROM cell
    ),
    cutoff AS (
        SELECT CAST(coalesce(max(CASE WHEN n_extreme * 10 * m
                                           <= 1 * rnk * 32
                                      THEN rnk END), 0) AS BIGINT) AS rmax
        FROM ranked
    )
    SELECT event_type, CAST(dow AS INT) AS dow, o AS observed,
           rt AS row_total_x7_expected,
           n_extreme,
           round(CAST(n_extreme AS DOUBLE) / 32, 4) AS p_value,
           CAST(rnk AS BIGINT) AS p_rank,
           rnk <= rmax AS bh_reject
    FROM ranked CROSS JOIN cutoff
    ORDER BY event_type, dow
    """,
)
def q_stat_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over 35 simultaneous hypotheses
    (is event type i over/under-represented on day-of-week d vs the
    uniform-week null?) — the multiple-testing gate every metrics
    platform needs once it tests more than one cell at a time.

    Per-cell p-values are EXACT rationals from 32 deterministic
    pseudo-permutations (permutation k re-deals each event's weekday
    as md5(event_id:k) % 7 — the q_stat_permtest trick), with the
    "at least as extreme" comparison on exact integers:
    |7·O_perm − R| ≥ |7·O_obs − R| (never a float rate).  The BH
    step-up p(r) ≤ α·r/m at α = 0.10 cross-multiplies to
    n_extreme·10·m ≤ r·32 — exact again — and the rejection set is
    tie-order-invariant because a tied p-block passes iff its LAST
    rank passes.  Scale: one events scan fans out ×32 (map-side,
    pre-aggregated per partition), then everything is 35 rows; the
    35-row rank window is fixed-size (allowlisted)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").cast("long").alias("o"))
    r = obs.groupBy("event_type").agg(F.sum("o").cast("long").alias("rt"))
    ks = spark.range(0, 32).select(F.col("id").alias("k"))
    perm = (
        ev.select("event_id", "event_type")
        .crossJoin(F.broadcast(ks))
        .select(
            "event_type",
            "k",
            (
                1
                + F.expr(
                    "cast(conv(substr(md5(cast(event_id as string)"
                    " || ':' || k), 1, 15), 16, 10) as bigint)"
                )
                % 7
            ).alias("dow"),
        )
        .groupBy("event_type", "k", "dow")
        .agg(F.count("*").cast("long").alias("ok"))
    )
    cell = (
        obs.join(F.broadcast(r), "event_type")
        .join(perm, ["event_type", "dow"], "left")
        .groupBy("event_type", "dow", "o", "rt")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.abs(7 * F.col("ok") - F.col("rt"))
                        >= F.abs(7 * F.col("o") - F.col("rt")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_extreme")
        )
    )
    w = Window.orderBy("n_extreme", "event_type", "dow")
    ranked = cell.withColumn("rnk", F.row_number().over(w)).withColumn(
        "m", F.count("*").over(Window.partitionBy())
    )
    cutoff = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("n_extreme") * 10 * F.col("m")
                    <= F.col("rnk") * 32,
                    F.col("rnk"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("rmax")
    )
    return (
        ranked.crossJoin(F.broadcast(cutoff))
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("o").alias("observed"),
            F.col("rt").alias("row_total_x7_expected"),
            "n_extreme",
            F.round(F.col("n_extreme").cast("double") / 32, 4).alias(
                "p_value"
            ),
            F.col("rnk").cast("long").alias("p_rank"),
            (F.col("rnk") <= F.col("rmax")).alias("bh_reject"),
        )
        .orderBy("event_type", "dow")
    )


# --------------------------------------------------------------------------
# Residual-autocorrelation diagnostics: Durbin-Watson + Ljung-Box
# --------------------------------------------------------------------------

#: Ljung-Box lag depth (the weekly-seasonality screen's horizon) and
#: the chi-square(df=7) 95% critical value, embedded as a literal in
#: both engines (a live quantile call would be float-library-dependent).
_LB_LAGS = 7
_LB_CRIT = "14.0671"


def _lb_term_sql(k: int) -> str:
    """One fixed-order Ljung-Box term (covk/cov0)^2 / (n-k), guarded
    for short series (n <= k) and constant series (cov0 = 0)."""
    return (
        f"CASE WHEN n > {k} AND cov0 <> CAST(0 AS DOUBLE) THEN "
        f"(cov{k} / cov0) * (cov{k} / cov0)"
        f" / (n - {k}) ELSE CAST(0 AS DOUBLE) END"
    )


_LB_Q_EXPR = (
    "CAST(n AS DOUBLE) * (n + 2) * ("
    + " + ".join(_lb_term_sql(k) for k in range(1, _LB_LAGS + 1))
    + ")"
)


def _lb_cov_sql(k: int) -> str:
    """Lag-k centered co-moment Σ(n·c−s)(n·c_k−s) EXPANDED over the
    exact BIGINT moments (p=Σc·c_k, a=Σc, b=Σc_k, m=#valid over the
    lag-valid rows) with the algebra in DOUBLE — shared verbatim by
    both engines, so the IEEE op sequence is identical (ADVICE r06:
    the direct (n·c−s)² form grows ~n³·σ² and overflows BIGINT at
    large daily-count scale, the q_sample_neyman class; Spark 4 ANSI
    errors while DuckDB promotes to HUGEINT, so the engines would
    diverge exactly when it matters)."""
    return (
        f"CAST(n AS DOUBLE) * n * p{k} - CAST(n AS DOUBLE) * s * a{k}"
        f" - CAST(n AS DOUBLE) * s * b{k} + CAST(m{k} AS DOUBLE) * s * s"
    )


#: Σ(n·c−s)² = n²·Σc² − n·(Σc)², in DOUBLE (see _lb_cov_sql); the
#: greatest(·,0) guards float cancellation on a near-constant series
#: (the Neyman rule, CLAUDE.md).
_LB_COV0_SQL = (
    "greatest(CAST(n AS DOUBLE) * n * ss - CAST(n AS DOUBLE) * s * s,"
    " CAST(0 AS DOUBLE))"
)

#: Durbin-Watson n²·Σ(c−c1)² / (n·Σc² − (Σc)²) / n with the variance
#: algebra in DOUBLE (same overflow class as the co-moments).
_LB_DW_SQL = (
    "CAST(n AS DOUBLE) * n * dnum"
    " / nullif(CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s,"
    " CAST(0 AS DOUBLE)) / n"
)


def _lb_pabm_sql(k: int) -> str:
    """The four exact BIGINT lag-k moments (linear sums of c-products
    — quadratic in value scale, the documented-safe class)."""
    return (
        f"CAST(sum(CASE WHEN c{k} IS NOT NULL THEN c * c{k} END) AS BIGINT)"
        f" AS p{k},\n"
        f"           CAST(sum(CASE WHEN c{k} IS NOT NULL THEN c END)"
        f" AS BIGINT) AS a{k},\n"
        f"           CAST(sum(CASE WHEN c{k} IS NOT NULL THEN c{k} END)"
        f" AS BIGINT) AS b{k},\n"
        f"           CAST(count(c{k}) AS BIGINT) AS m{k}"
    )


@query(
    "q_stat_portmanteau",
    oracle="""
    WITH span AS (
        SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
        FROM events
    ),
    grid AS (
        SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM span
    ),
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT t.event_type, g.day, coalesce(d.c, 0) AS c
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN grid g
        LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day
    ),
    tot AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS ss
        FROM series GROUP BY 1
    ),
    lagged AS (
        SELECT s.event_type, t.n, t.s, t.ss, s.c,
               lag(s.c, 1) OVER w AS c1, lag(s.c, 2) OVER w AS c2,
               lag(s.c, 3) OVER w AS c3, lag(s.c, 4) OVER w AS c4,
               lag(s.c, 5) OVER w AS c5, lag(s.c, 6) OVER w AS c6,
               lag(s.c, 7) OVER w AS c7
        FROM series s JOIN tot t USING (event_type)
        WINDOW w AS (PARTITION BY s.event_type ORDER BY s.day)
    ),
    sums AS (
        SELECT event_type, any_value(n) AS n, any_value(s) AS s,
               any_value(ss) AS ss,
               CAST(sum(CASE WHEN c1 IS NOT NULL
                             THEN (c - c1) * (c - c1) END) AS BIGINT)
                   AS dnum,
               {pabm}
        FROM lagged GROUP BY event_type
    ),
    covs AS (
        SELECT event_type, n, s, ss, dnum,
               {cov0} AS cov0,
               {covk}
        FROM sums
    )
    SELECT event_type, n AS n_days,
           round({dw}, 4) AS dw,
           round({q_expr}, 4) AS q_lb,
           ({q_expr}) > CAST({crit} AS DOUBLE) AS lb_reject
    FROM covs
    """.replace(
        "{pabm}",
        ",\n               ".join(
            _lb_pabm_sql(k) for k in range(1, _LB_LAGS + 1)
        ),
    )
    .replace("{cov0}", _LB_COV0_SQL)
    .replace(
        "{covk}",
        ",\n               ".join(
            f"{_lb_cov_sql(k)} AS cov{k}" for k in range(1, _LB_LAGS + 1)
        ),
    )
    .replace("{dw}", _LB_DW_SQL)
    .replace("{q_expr}", _LB_Q_EXPR)
    .replace("{crit}", _LB_CRIT),
)
def q_stat_portmanteau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-autocorrelation diagnostics on the daily event-count
    series per type: Durbin-Watson (lag-1) and the Ljung-Box
    portmanteau Q over lags 1..7 with its chi-square(7) 95% gate — the
    "are these residuals white noise" screen a forecasting/monitoring
    pipeline runs before trusting a model's error bars.

    Determinism discipline (SURVEY §7.5): DW's numerator needs no mean
    at all (differences cancel it: e_t - e_{t-1} = c_t - c_{t-1}).
    The accumulators are the exact BIGINT moments Σc, Σc², Σc·c_k,
    Σ(c−c1)² per lag-valid set — linear sums of c-products, the
    documented-safe overflow class — and ALL centering algebra
    (n²Σc·c_k − nsΣc − nsΣc_k + m·s², the variance denominator, DW)
    runs in DOUBLE via expression strings shared verbatim by both
    engines, so the IEEE op sequence is identical (ADVICE r06 / the
    q_sample_neyman rule: the direct (n·c−s)² BIGINT form grows
    ~n³·σ² and overflows at large daily-count scale, where Spark 4
    ANSI errors but DuckDB promotes to HUGEINT).  Q sums the 7 terms
    in one fixed left-associative literal expression — the
    Levene/nDCG pattern, no float accumulation across rows.  The
    chi-square critical value is an embedded literal (a live quantile
    would be float-library-dependent).  Scale: everything past the
    per-(type, day) aggregate is calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    grid = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("c"))
    types = ev.select("event_type").distinct()
    series = (
        types.crossJoin(F.broadcast(grid))
        .join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("c", F.lit(0)).alias("c"))
    )
    tot = series.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = series.join(F.broadcast(tot), "event_type").select(
        "event_type", "n", "s", "ss", "c",
        *[F.lag("c", k).over(w).alias(f"c{k}") for k in range(1, _LB_LAGS + 1)],
    )
    def pabm(k: int):
        ck = F.col(f"c{k}")
        return [
            F.sum(F.when(ck.isNotNull(), F.col("c") * ck))
            .cast("long")
            .alias(f"p{k}"),
            F.sum(F.when(ck.isNotNull(), F.col("c")))
            .cast("long")
            .alias(f"a{k}"),
            F.sum(F.when(ck.isNotNull(), ck)).cast("long").alias(f"b{k}"),
            F.count(ck).cast("long").alias(f"m{k}"),
        ]

    sums = lagged.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.first("s").alias("s"),
        F.first("ss").alias("ss"),
        F.sum(
            F.when(
                F.col("c1").isNotNull(),
                (F.col("c") - F.col("c1")) * (F.col("c") - F.col("c1")),
            )
        ).alias("dnum"),
        *[col for k in range(1, _LB_LAGS + 1) for col in pabm(k)],
    )
    covs = sums.select(
        "event_type", "n", "s", "ss", "dnum",
        F.expr(_LB_COV0_SQL).alias("cov0"),
        *[
            F.expr(_lb_cov_sql(k)).alias(f"cov{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    q_expr = F.expr(_LB_Q_EXPR)
    return covs.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(F.expr(_LB_DW_SQL), 4).alias("dw"),
        F.round(q_expr, 4).alias("q_lb"),
        (q_expr > F.expr(f"CAST({_LB_CRIT} AS DOUBLE)")).alias("lb_reject"),
    )


#: χ²(df=4) upper 5% critical value 9.487729, carried as the exact
#: integer pair (9487729, 10⁶) so the Friedman decision is an integer
#: cross-multiplication, never a float boundary (the q_ml_mcnemar
#: pattern).
_FRIEDMAN_CRIT_NUM = 9487729
_FRIEDMAN_CRIT_DEN = 10**6


@query(
    "q_stat_friedman",
    oracle=f"""
    WITH counts AS (
        SELECT CAST(ts AS DATE) AS d, event_type,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type,
               CAST(row_number() OVER (
                   PARTITION BY d ORDER BY c, event_type) AS BIGINT) AS rk
        FROM counts
    ),
    rsums AS (
        SELECT event_type, CAST(sum(rk) AS BIGINT) AS r_j,
               CAST(count(*) AS BIGINT) AS n_days
        FROM ranked GROUP BY event_type
    ),
    stat AS (
        SELECT CAST(sum(r_j * r_j) AS BIGINT) AS sum_r2,
               CAST(max(n_days) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k
        FROM rsums
    )
    SELECT n, k, sum_r2,
           CAST(12 * sum_r2 - 3 * n * n * k * (k + 1) * (k + 1)
                AS BIGINT) AS chi2_num,
           CAST(n * k * (k + 1) AS BIGINT) AS chi2_den,
           round(CAST(12 * sum_r2 - 3 * n * n * k * (k + 1) * (k + 1)
                      AS DOUBLE) / (n * k * (k + 1)), 4) AS chi2_f,
           CAST({_FRIEDMAN_CRIT_DEN} * (12 * sum_r2
                    - 3 * n * n * k * (k + 1) * (k + 1))
                > {_FRIEDMAN_CRIT_NUM} * (n * k * (k + 1))
                AS BOOLEAN) AS reject_05
    FROM stat
    """,
)
def q_stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test — the nonparametric repeated-measures ANOVA the
    stats family was missing (Mann–Whitney compares two groups; this
    asks whether the k = 5 event types keep the same RANK ORDER of
    daily volume across the n = 30 day blocks, robust to any
    monotone volume transform).

    Determinism: per-day ranks are row_number with the unique
    (count, event_type) tie-break (deterministic tie policy, stated —
    average-rank ties would need the 2× trick; the daily count table
    here has no ties but the policy must not depend on that); rank
    sums and χ²_F = [12·ΣR_j² − 3n²k(k+1)²] / [nk(k+1)] are carried
    as exact BIGINT numerator/denominator with ONE final division, and
    the 5% decision (df = k−1 = 4) is the integer cross-multiplication
    against 9.487729·10⁶.

    Scale shape: one hash agg to n×k daily counts, rank windows
    partitioned by day (k = 5 rows each, bounded), then a k-row agg —
    the events table is touched once."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            F.to_date("ts").alias("d"), "event_type"
        ).agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.partitionBy("d").orderBy("c", "event_type")
    ranked = counts.select(
        "event_type", F.row_number().over(w).cast("long").alias("rk")
    )
    rsums = ranked.groupBy("event_type").agg(
        F.sum("rk").cast("long").alias("r_j"),
        F.count("*").cast("long").alias("n_days"),
    )
    stat = rsums.agg(
        F.sum(F.col("r_j") * F.col("r_j")).cast("long").alias("sum_r2"),
        F.max("n_days").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    num = F.expr(
        "CAST(12 * sum_r2 - 3 * n * n * k * (k + 1) * (k + 1) AS BIGINT)"
    )
    den = F.expr("CAST(n * k * (k + 1) AS BIGINT)")
    return stat.select(
        "n", "k", "sum_r2",
        num.alias("chi2_num"),
        den.alias("chi2_den"),
        F.round(num.cast("double") / den, 4).alias("chi2_f"),
        (
            F.lit(_FRIEDMAN_CRIT_DEN).cast("long") * num
            > F.lit(_FRIEDMAN_CRIT_NUM).cast("long") * den
        ).alias("reject_05"),
    )


#: χ²(df=2) upper 5% critical value 5.991465 (6 dp), as the exact
#: integer pair for cross-multiplied decisions (the q_ml_mcnemar /
#: q_stat_friedman pattern).
_CHI2_DF2_CRIT_NUM = 5991465
_CHI2_DF2_CRIT_DEN = 10**6

#: Cochran's Q for k = 3 matched binary raters, fully integer:
#: Q = (k−1)·(k·ΣG_j² − T²) / (k·T − ΣL_i²) with column totals G_j,
#: grand total T = ΣG = ΣL, and per-item row totals L_i.  Both
#: expressions are shared verbatim by the two engines.
_COCHRAN_NUM = (
    "2 * (3 * (ga * ga + gb * gb + gc * gc)"
    " - (ga + gb + gc) * (ga + gb + gc))"
)
_COCHRAN_DEN = "3 * (ga + gb + gc) - sum_l2"


@query(
    "q_stat_cochran",
    oracle=f"""
    WITH j AS (
        SELECT CASE WHEN len(string_split(text, ' ')) >= 60
                    THEN 1 ELSE 0 END AS a,
               CASE WHEN len(list_distinct(string_split(text, ' '))) >= 28
                    THEN 1 ELSE 0 END AS b,
               CASE WHEN length(text) >= 330 THEN 1 ELSE 0 END AS c
        FROM documents
    ),
    agg AS (
        SELECT CAST(sum(a) AS BIGINT) AS ga,
               CAST(sum(b) AS BIGINT) AS gb,
               CAST(sum(c) AS BIGINT) AS gc,
               CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS sum_l2
        FROM j
    )
    SELECT ga, gb, gc,
           CAST({_COCHRAN_NUM} AS BIGINT) AS q_num,
           CAST({_COCHRAN_DEN} AS BIGINT) AS q_den,
           CASE WHEN {_COCHRAN_DEN} > 0
                THEN round(CAST({_COCHRAN_NUM} AS DOUBLE)
                           / ({_COCHRAN_DEN}), 4) END AS q_stat,
           CASE WHEN {_COCHRAN_DEN} > 0
                THEN {_CHI2_DF2_CRIT_DEN} * ({_COCHRAN_NUM})
                     >= {_CHI2_DF2_CRIT_NUM} * ({_COCHRAN_DEN})
           END AS reject_05
    FROM agg
    """,
)
def q_stat_cochran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over THREE matched binary quality judges — the
    k-rater generalization of q_ml_mcnemar (k = 2 marginal homogeneity)
    that completes the agreement-test ladder: do the length, the
    distinct-vocabulary, and the character-length gates pass documents
    at the same rate?  Judges a/b are exactly q_ml_kappa's pair; judge
    c (char length ≥ 330, the corpus median) adds the third column.

    Exact-integer discipline: Q = (k−1)(k·ΣG_j² − T²)/(k·T − ΣL_i²)
    needs only the three column totals and ΣL² — all exact BIGINT from
    ONE scan; the 5% decision vs χ²(2) is the integer cross-mult
    10⁶·num ≥ 5991465·den (never a float boundary), and the reported
    statistic is the single final double division.  The denominator
    Σ L(k−L) is 0 only when every document is passed by all three or
    by none (guarded NULL).

    Scale shape: one scan → one 1-row hash aggregate — shuffle-minimal
    at any corpus size."""
    d = load_table(spark, sf_dir, "documents").select(
        F.when(F.size(F.split("text", " ")) >= 60, 1).otherwise(0).alias("a"),
        F.when(F.size(F.array_distinct(F.split("text", " "))) >= 28, 1)
        .otherwise(0)
        .alias("b"),
        F.when(F.length("text") >= 330, 1).otherwise(0).alias("c"),
    )
    agg = d.agg(
        F.sum("a").cast("long").alias("ga"),
        F.sum("b").cast("long").alias("gb"),
        F.sum("c").cast("long").alias("gc"),
        F.sum(
            (F.col("a") + F.col("b") + F.col("c"))
            * (F.col("a") + F.col("b") + F.col("c"))
        )
        .cast("long")
        .alias("sum_l2"),
    )
    num = F.expr(_COCHRAN_NUM)
    den = F.expr(_COCHRAN_DEN)
    return agg.select(
        "ga",
        "gb",
        "gc",
        num.cast("long").alias("q_num"),
        den.cast("long").alias("q_den"),
        F.when(den > 0, F.round(num.cast("double") / den, 4)).alias(
            "q_stat"
        ),
        F.when(
            den > 0,
            F.lit(_CHI2_DF2_CRIT_DEN).cast("long") * num
            >= F.lit(_CHI2_DF2_CRIT_NUM).cast("long") * den,
        ).alias("reject_05"),
    )


#: Kruskal–Wallis H with tie correction, DOUBLE algebra on exact
#: BIGINTs shared verbatim (the round-6 overflow rule: (2R_j)² at
#: sf0.1 is ~5e19 — past BIGINT — so the squaring happens in DOUBLE on
#: exact integer inputs in ONE fixed-order expression).  At 1e10-row
#: groups move r*_2/tie sums to DECIMAL(38,0).
_KW_H = (
    "3 * (CAST(r1_2 AS DOUBLE) * r1_2 / n1"
    " + CAST(r2_2 AS DOUBLE) * r2_2 / n2"
    " + CAST(r3_2 AS DOUBLE) * r3_2 / n3)"
    " / (CAST(n AS DOUBLE) * (n + 1)) - 3 * (n + 1)"
)
_KW_C = "1 - CAST(tie_num AS DOUBLE) / (n * n * n - n)"


@query(
    "q_stat_kruskal",
    oracle=f"""
    WITH s AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g3
        FROM events WHERE event_type IN ('purchase', 'view', 'click')
    ),
    pv AS (
        SELECT value, count(*) AS ct,
               CAST(sum(g1) AS BIGINT) AS c1t,
               CAST(sum(g2) AS BIGINT) AS c2t,
               CAST(sum(g3) AS BIGINT) AS c3t
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT ct, c1t, c2t, c3t,
               sum(ct) OVER (ORDER BY value) AS cum_t
        FROM pv
    ),
    rsum AS (
        SELECT CAST(sum(c1t * (2 * cum_t - ct + 1)) AS BIGINT) AS r1_2,
               CAST(sum(c2t * (2 * cum_t - ct + 1)) AS BIGINT) AS r2_2,
               CAST(sum(c3t * (2 * cum_t - ct + 1)) AS BIGINT) AS r3_2,
               CAST(sum(ct * ct * ct - ct) AS BIGINT) AS tie_num
        FROM cum
    ),
    tot AS (
        SELECT CAST(sum(c1t) AS BIGINT) AS n1,
               CAST(sum(c2t) AS BIGINT) AS n2,
               CAST(sum(c3t) AS BIGINT) AS n3,
               CAST(sum(ct) AS BIGINT) AS n
        FROM pv
    )
    SELECT n1, n2, n3, r1_2, r2_2, r3_2, tie_num,
           round({_KW_H}, 4) AS h,
           round(({_KW_H}) / ({_KW_C}), 4) AS h_adj,
           ({_KW_H}) / ({_KW_C}) >= CAST(5.991465 AS DOUBLE) AS reject_05
    FROM rsum CROSS JOIN tot
    """,
)
def q_stat_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across THREE groups (purchase / view / click
    ``value`` distributions) with the tie correction — the k-sample
    generalization of q_stat_mannwhitney (which covers k = 2), closing
    the rank-test family: ANOVA's question without ANOVA's normality
    assumption.

    Determinism discipline: tie-averaged pooled ranks are carried as
    2× integers exactly as in Mann–Whitney (midrank2 = 2·cum − ct + 1
    from the inclusive bucketed running count), so the three rank sums
    r_j·2 and the tie term Σ(t³−t) are exact BIGINT.  (2R_j)² at sf0.1
    is ~5e19 — past BIGINT — so H's squaring runs in DOUBLE over those
    exact integers in ONE fixed-order expression shared verbatim by
    both engines (the round-6 overflow rule); the tie-correction
    divisor N³−N stays BIGINT (~2e14 at sf0.1 — move it and the tie
    sum to DECIMAL(38,0) beyond ~2e6 pooled rows).  The
    5% decision vs χ²(2) compares the same shared DOUBLE expression in
    both engines — identical IEEE op sequence, identical bits.

    Scale shape: one keyed agg → bucketed two-level prefix scan (no
    unpartitioned window) → two scalar aggregates; mirrors q_stat_ks."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(
        F.col("event_type").isin("purchase", "view", "click")
    ).select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g1"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g2"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g3"),
    )
    pv = s.groupBy("value").agg(
        F.count("*").alias("ct"),
        F.sum("g1").cast("long").alias("c1t"),
        F.sum("g2").cast("long").alias("c2t"),
        F.sum("g3").cast("long").alias("c3t"),
    )
    cum = bucketed_running_sum(
        pv,
        bucket=F.floor(F.col("value") / F.lit(25.0)).cast("long"),
        order_cols=[F.col("value")],
        sums={"cum_t": F.col("ct")},
    )
    mid2 = 2 * F.col("cum_t") - F.col("ct") + 1
    rsum = cum.agg(
        F.sum(F.col("c1t") * mid2).cast("long").alias("r1_2"),
        F.sum(F.col("c2t") * mid2).cast("long").alias("r2_2"),
        F.sum(F.col("c3t") * mid2).cast("long").alias("r3_2"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("tie_num"),
    )
    tot = pv.agg(
        F.sum("c1t").cast("long").alias("n1"),
        F.sum("c2t").cast("long").alias("n2"),
        F.sum("c3t").cast("long").alias("n3"),
        F.sum("ct").cast("long").alias("n"),
    )
    h = F.expr(_KW_H)
    c = F.expr(_KW_C)
    return rsum.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        "n3",
        "r1_2",
        "r2_2",
        "r3_2",
        "tie_num",
        F.round(h, 4).alias("h"),
        F.round(h / c, 4).alias("h_adj"),
        (h / c >= F.expr("CAST(5.991465 AS DOUBLE)")).alias("reject_05"),
    )


#: z²(two-sided 5%) = χ²(df=1) upper 5% critical value 3.841459, as
#: the exact integer pair for cross-multiplied decisions (the
#: q_ml_mcnemar pattern, shared by every normal-approximation test).
_Z2_CRIT_NUM = 3841459
_Z2_CRIT_DEN = 10**6


@query(
    "q_stat_wilcoxon",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    p AS (
        SELECT a.day AS day, b.x - a.x AS diff
        FROM d a JOIN d b ON b.day = a.day + INTERVAL 7 DAY
        WHERE b.x <> a.x
    ),
    r AS (
        SELECT day, diff, abs(diff) AS adiff,
               CAST(row_number() OVER (ORDER BY abs(diff), day)
                    AS BIGINT) AS rn
        FROM p
    ),
    g AS (
        SELECT day, diff,
               min(rn) OVER (PARTITION BY adiff)
                   + max(rn) OVER (PARTITION BY adiff) AS rk2
        FROM r
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(coalesce(sum(CASE WHEN diff > 0 THEN rk2 ELSE 0 END),
                             0) AS BIGINT) AS w2
        FROM g
    )
    SELECT n, w2,
           CAST(2 * w2 - n * (n + 1) AS BIGINT) AS dev4,
           CASE WHEN n >= 2 THEN
               round((2 * w2 - n * (n + 1))
                     / (4 * sqrt(CAST(n * (n + 1) * (2 * n + 1)
                                      AS DOUBLE) / 24)), 4)
           END AS z,
           CAST(3 * {_Z2_CRIT_DEN} * (2 * w2 - n * (n + 1))
                    * (2 * w2 - n * (n + 1))
                > {_Z2_CRIT_NUM} * 2 * n * (n + 1) * (2 * n + 1)
                AS BOOLEAN) AS reject_05
    FROM s
    """,
)
def q_stat_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on week-over-week paired daily
    purchase revenue (day d vs day d+7): the PAIRED complement to
    q_stat_mannwhitney's two-sample U — does the weekly difference
    distribution sit symmetrically around zero?

    Determinism: zero differences are excluded (the standard Wilcoxon
    reduction); tie groups of |diff| get the average rank carried as
    the 2× integer min(rn)+max(rn) over the tie partition (SURVEY
    §7.5 — no fraction enters an aggregate; rn's (|diff|, day)
    tie-break cancels within a group); W⁺ is then the exact BIGINT
    2×rank sum over positive differences, z = (2W₂−n(n+1)) /
    (4·√(n(n+1)(2n+1)/24)) is ONE final float expression shared
    verbatim, and the 5% decision is the integer cross-multiplication
    3·10⁶·(2W₂−n(n+1))² > 3841459·2n(n+1)(2n+1).

    Scale shape: the pair series is calendar-bounded (≤ |days| rows
    after one keyed aggregate), so the global rank window is over a
    ~23-row frame (allowlisted); the events table is touched once."""
    d = _daily_xy(spark, sf_dir)
    a = d.select(F.col("day"), F.col("x").alias("xa"))
    b = d.select(
        F.date_sub(F.col("day"), 7).alias("day"), F.col("x").alias("xb")
    )
    p = (
        a.join(b, "day")
        .select("day", (F.col("xb") - F.col("xa")).alias("diff"))
        .where(F.col("diff") != 0)
    )
    r = p.select(
        "day",
        "diff",
        F.abs("diff").alias("adiff"),
        F.row_number()
        .over(Window.orderBy(F.abs("diff"), "day"))
        .cast("long")
        .alias("rn"),
    )
    wt = Window.partitionBy("adiff")
    g = r.select(
        "diff",
        (F.min("rn").over(wt) + F.max("rn").over(wt)).alias("rk2"),
    )
    s = g.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("diff") > 0, F.col("rk2")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("w2"),
    )
    dev = 2 * F.col("w2") - F.col("n") * (F.col("n") + 1)
    return s.select(
        "n",
        "w2",
        dev.cast("long").alias("dev4"),
        F.when(
            F.col("n") >= 2,
            F.round(
                dev
                / (
                    4
                    * F.sqrt(
                        (
                            F.col("n")
                            * (F.col("n") + 1)
                            * (2 * F.col("n") + 1)
                        ).cast("double")
                        / 24
                    )
                ),
                4,
            ),
        ).alias("z"),
        (
            F.lit(3 * _Z2_CRIT_DEN).cast("long") * dev * dev
            > F.lit(2 * _Z2_CRIT_NUM).cast("long")
            * F.col("n")
            * (F.col("n") + 1)
            * (2 * F.col("n") + 1)
        ).alias("reject_05"),
    )


@query(
    "q_stat_page",
    oracle=f"""
    WITH counts AS (
        SELECT CAST(ts AS DATE) AS d, event_type,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT d, event_type,
               CAST(row_number() OVER (
                   PARTITION BY d ORDER BY c, event_type) AS BIGINT) AS rk
        FROM counts
    ),
    rsums AS (
        SELECT event_type, CAST(sum(rk) AS BIGINT) AS r_j,
               CAST(count(*) AS BIGINT) AS n_days
        FROM ranked GROUP BY event_type
    ),
    ordered AS (
        SELECT event_type, r_j, n_days,
               CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS j
        FROM rsums
    ),
    stat AS (
        SELECT CAST(sum(j * r_j) AS BIGINT) AS l_stat,
               CAST(max(n_days) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k
        FROM ordered
    )
    SELECT n, k, l_stat,
           CAST(4 * l_stat - n * k * (k + 1) * (k + 1) AS BIGINT) AS dev4,
           CASE WHEN k >= 2 THEN
               round((4 * l_stat - n * k * (k + 1) * (k + 1))
                     / (4 * sqrt(CAST(n AS DOUBLE)
                                 * (k * k * k - k) * (k * k * k - k)
                                 / (144 * (k - 1)))), 4)
           END AS z,
           CAST(9 * {_Z2_CRIT_DEN} * (k - 1)
                    * (4 * l_stat - n * k * (k + 1) * (k + 1))
                    * (4 * l_stat - n * k * (k + 1) * (k + 1))
                > {_Z2_CRIT_NUM} * n
                    * (k * k * k - k) * (k * k * k - k)
                AS BOOLEAN) AS reject_05
    FROM stat
    """,
)
def q_stat_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test over the q_stat_friedman rank table: beyond
    "the k event types differ in rank" (Friedman), L = Σ_j j·R_j asks
    whether the daily volume ranks follow a MONOTONE trend in a fixed
    hypothesized treatment order (here: alphabetical event_type — an
    arbitrary but frozen ordering, documented as such; the test is
    reported two-sided against it).

    Determinism: per-day ranks are the Friedman row_number policy
    (count, event_type tie-break); the hypothesized position j is a
    row_number over the k-row rank-sum aggregate (bounded dimension);
    L and the deviation 4L − nk(k+1)² are exact BIGINTs; z =
    (L−μ)/σ with μ = nk(k+1)²/4, σ² = n(k³−k)²/(144(k−1)) (Page 1963)
    is ONE final float expression, and the 5% decision is the integer
    cross-multiplication 9·10⁶·(k−1)·(4L−nk(k+1)²)² >
    3841459·n·(k³−k)².

    Scale shape: identical to Friedman — one hash agg to n×k daily
    counts, day-partitioned k-row rank windows, then a k-row agg."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count("*").cast("long").alias("c"))
    w = Window.partitionBy("d").orderBy("c", "event_type")
    ranked = counts.select(
        "event_type", F.row_number().over(w).cast("long").alias("rk")
    )
    rsums = ranked.groupBy("event_type").agg(
        F.sum("rk").cast("long").alias("r_j"),
        F.count("*").cast("long").alias("n_days"),
    )
    ordered = rsums.select(
        "r_j",
        "n_days",
        F.row_number()
        .over(Window.orderBy("event_type"))
        .cast("long")
        .alias("j"),
    )
    stat = ordered.agg(
        F.sum(F.col("j") * F.col("r_j")).cast("long").alias("l_stat"),
        F.max("n_days").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    n, k = F.col("n"), F.col("k")
    dev = 4 * F.col("l_stat") - n * k * (k + 1) * (k + 1)
    kk = k * k * k - k
    return stat.select(
        "n",
        "k",
        "l_stat",
        dev.cast("long").alias("dev4"),
        F.when(
            k >= 2,
            F.round(
                dev
                / (
                    4
                    * F.sqrt(
                        n.cast("double") * kk * kk / (144 * (k - 1))
                    )
                ),
                4,
            ),
        ).alias("z"),
        (
            F.lit(9 * _Z2_CRIT_DEN).cast("long") * (k - 1) * dev * dev
            > F.lit(_Z2_CRIT_NUM).cast("long") * n * kk * kk
        ).alias("reject_05"),
    )


@query(
    "q_stat_grubbs",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS s2
        FROM d
    ),
    dev AS (
        SELECT d.day, d.y, t.n, t.s, t.s2,
               CAST((d.y * t.n - t.s) * (d.y * t.n - t.s) AS BIGINT)
                   AS dev2
        FROM d CROSS JOIN t
    )
    SELECT CAST(day AS VARCHAR) AS outlier_day,
           y AS y_count, n,
           dev2,
           CAST(dev2 * (n - 1) AS BIGINT) AS g2_num,
           CAST(n * (n * s2 - s * s) AS BIGINT) AS g2_den,
           CASE WHEN n >= 2 AND n * s2 > s * s THEN
               round(sqrt(CAST(dev2 AS DOUBLE) * (n - 1)
                          / (CAST(n AS DOUBLE) * (n * s2 - s * s))), 4)
           END AS g
    FROM dev
    ORDER BY dev2 DESC, day
    LIMIT 1
    """,
)
def q_stat_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' extreme studentized deviate on the daily view-count
    series: WHICH day is the most extreme outlier, and how many
    sample standard deviations is it from the mean — the single-point
    complement to q_ev_anomaly's banded monitor.

    Determinism: the argmax is over the exact BIGINT deviation
    (y·n − Σy)² with the earlier-day tie-break; G² =
    dev²·(n−1)/(n·(nΣy²−(Σy)²)) is carried as the exact integer
    num/den pair and only the final √ is float (shared verbatim).
    No decision column: Grubbs' critical value is a t-quantile in n,
    and n is data-dependent — the statistic and its exact rational
    square are the contract, the cut is the caller's.

    Overflow: counts (not cents) keep n·Σy² ≤ ~2e16 even at 1000×
    sf0.1 volumes — BIGINT-safe (DECIMAL(38,0) switch noted past
    ~1e8 events/day).  Scale shape: one keyed aggregate to calendar
    size, a broadcast of the 1-row moment total, a TakeOrdered-1."""
    d = _daily_xy(spark, sf_dir)
    t = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"),
    )
    dev = d.crossJoin(F.broadcast(t)).select(
        "day",
        "y",
        "n",
        "s",
        "s2",
        ((F.col("y") * F.col("n") - F.col("s"))
         * (F.col("y") * F.col("n") - F.col("s")))
        .cast("long")
        .alias("dev2"),
    )
    ssq = F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    return (
        dev.orderBy(F.col("dev2").desc(), "day")
        .limit(1)
        .select(
            F.col("day").cast("string").alias("outlier_day"),
            F.col("y").alias("y_count"),
            "n",
            "dev2",
            (F.col("dev2") * (F.col("n") - 1)).cast("long").alias("g2_num"),
            (F.col("n") * ssq).cast("long").alias("g2_den"),
            F.when(
                (F.col("n") >= 2) & (ssq > 0),
                F.round(
                    F.sqrt(
                        F.col("dev2").cast("double")
                        * (F.col("n") - 1)
                        / (F.col("n").cast("double") * ssq)
                    ),
                    4,
                ),
            ).alias("g"),
        )
    )


#: Nemenyi critical difference at α=0.05, k=5: q_{0.05,5,∞}/√2 =
#: 3.858 / 1.41421… = 2.728 (Demšar 2006 Table 5), squared and
#: 10⁶-scaled for the integer cross-multiplied decision:
#: |R_i−R_j| > q·√(nk(k+1)/12)  ⟺  12·10⁶·(R_i−R_j)² > q²·10⁶·nk(k+1).
_NEMENYI_Q2_NUM = 7441984  # 2.728² × 10⁶
_NEMENYI_K = 5  # the critical value is k-specific; guarded in-query


@query(
    "q_stat_nemenyi",
    oracle=f"""
    WITH counts AS (
        SELECT CAST(ts AS DATE) AS d, event_type,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT d, event_type,
               CAST(row_number() OVER (
                   PARTITION BY d ORDER BY c, event_type) AS BIGINT) AS rk
        FROM counts
    ),
    rsums AS (
        SELECT event_type, CAST(sum(rk) AS BIGINT) AS r_j,
               CAST(count(*) AS BIGINT) AS n_days
        FROM ranked GROUP BY event_type
    ),
    meta AS (
        SELECT CAST(max(n_days) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k
        FROM rsums
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.r_j AS r_a, b.r_j AS r_b,
           CAST(abs(a.r_j - b.r_j) AS BIGINT) AS rank_diff,
           m.n, m.k,
           CASE WHEN m.k = {_NEMENYI_K} THEN
               CAST(12 * {_Z2_CRIT_DEN}
                        * (a.r_j - b.r_j) * (a.r_j - b.r_j)
                    > {_NEMENYI_Q2_NUM} * m.n * m.k * (m.k + 1)
                    AS BOOLEAN)
           END AS significant_05
    FROM rsums a JOIN rsums b ON a.event_type < b.event_type
    CROSS JOIN meta m
    ORDER BY type_a, type_b
    """,
)
def q_stat_nemenyi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nemenyi post-hoc after q_stat_friedman: WHICH event-type pairs
    differ in daily-volume rank — the pairwise critical-difference
    matrix (Demšar 2006) that turns Friedman's single "they differ"
    into actionable pairs.

    Determinism: rank sums R_j are the exact Friedman BIGINTs; the
    pairwise decision |R_i−R_j| > q·√(nk(k+1)/12) is squared and
    cross-multiplied to 12·10⁶·(R_i−R_j)² > q²·10⁶·nk(k+1) — fully
    integer, no √ anywhere.  The q_{0.05} critical value is k-specific
    (table constant for k=5); the decision column is NULL if the data
    ever presents a different k, never a silently wrong cut.

    Scale shape: Friedman's one hash agg + bounded rank windows, then
    a k²-row self-join over the k-row aggregate — constant-size pair
    matrix at any corpus scale."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count("*").cast("long").alias("c"))
    w = Window.partitionBy("d").orderBy("c", "event_type")
    ranked = counts.select(
        "event_type", F.row_number().over(w).cast("long").alias("rk")
    )
    rsums = ranked.groupBy("event_type").agg(
        F.sum("rk").cast("long").alias("r_j"),
        F.count("*").cast("long").alias("n_days"),
    )
    meta = rsums.agg(
        F.max("n_days").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    a = rsums.select(
        F.col("event_type").alias("type_a"), F.col("r_j").alias("r_a")
    )
    b = rsums.select(
        F.col("event_type").alias("type_b"), F.col("r_j").alias("r_b")
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b")).crossJoin(
        F.broadcast(meta)
    )
    diff = F.col("r_a") - F.col("r_b")
    return pairs.select(
        "type_a",
        "type_b",
        "r_a",
        "r_b",
        F.abs(diff).cast("long").alias("rank_diff"),
        "n",
        "k",
        F.when(
            F.col("k") == _NEMENYI_K,
            F.lit(12 * _Z2_CRIT_DEN).cast("long") * diff * diff
            > F.lit(_NEMENYI_Q2_NUM).cast("long")
            * F.col("n")
            * F.col("k")
            * (F.col("k") + 1),
        ).alias("significant_05"),
    ).orderBy("type_a", "type_b")


#: KR-20 / Cronbach's α over the three binary judges: with population
#: variances the n² denominators cancel, so α = k/(k−1)·(1 − Σσᵢ²/σ_t²)
#: is the exact integer pair k·(num_t − Σnumᵢ) / ((k−1)·num_t) with
#: numᵢ = n·Gᵢ − Gᵢ² (binary items: Σx² = Σx) and
#: num_t = n·Σt² − (ΣGᵢ)².  Shared verbatim by both engines.
_CRONBACH_ITEM_NUM = (
    "(n * ga - ga * ga) + (n * gb - gb * gb) + (n * gc - gc * gc)"
)
_CRONBACH_TOT_NUM = (
    "n * sum_l2 - (ga + gb + gc) * (ga + gb + gc)"
)


@query(
    "q_stat_cronbach",
    oracle=f"""
    WITH j AS (
        SELECT CASE WHEN len(string_split(text, ' ')) >= 60
                    THEN 1 ELSE 0 END AS a,
               CASE WHEN len(list_distinct(string_split(text, ' '))) >= 28
                    THEN 1 ELSE 0 END AS b,
               CASE WHEN length(text) >= 330 THEN 1 ELSE 0 END AS c
        FROM documents
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a) AS BIGINT) AS ga,
               CAST(sum(b) AS BIGINT) AS gb,
               CAST(sum(c) AS BIGINT) AS gc,
               CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS sum_l2
        FROM j
    )
    SELECT n, ga, gb, gc,
           CAST({_CRONBACH_ITEM_NUM} AS BIGINT) AS item_var_num,
           CAST({_CRONBACH_TOT_NUM} AS BIGINT) AS total_var_num,
           CAST(3 * (({_CRONBACH_TOT_NUM}) - ({_CRONBACH_ITEM_NUM}))
                AS BIGINT) AS alpha_num,
           CAST(2 * ({_CRONBACH_TOT_NUM}) AS BIGINT) AS alpha_den,
           CASE WHEN ({_CRONBACH_TOT_NUM}) > 0 THEN
               round(CAST(3 * (({_CRONBACH_TOT_NUM})
                               - ({_CRONBACH_ITEM_NUM})) AS DOUBLE)
                     / (2 * ({_CRONBACH_TOT_NUM})), 6)
           END AS alpha
    FROM agg
    """,
)
def q_stat_cronbach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α (= KR-20 on binary items) over q_stat_cochran's
    three matched quality judges: do the length, distinct-vocabulary,
    and char-length gates measure ONE underlying construct
    (internal-consistency reliability), the question a curation team
    asks before collapsing its rule panel into a single score.
    Cochran asks whether the judges' RATES differ; κ whether a pair
    AGREES; α whether the panel COHERES — the reliability ladder.

    Exact-integer discipline: with population variances the n²
    denominators cancel, so α = k/(k−1)·(1 − Σσᵢ²/σ_t²) collapses to
    the exact BIGINT pair 3·(num_t − Σnumᵢ) / (2·num_t), where binary
    items give numᵢ = n·Gᵢ − Gᵢ² and num_t = n·Σt² − T² — everything
    from the SAME one-scan aggregate Cochran uses, ONE final division.
    Zero total variance (all documents identical across judges) yields
    NULL α with the exact 0 pair visible.

    Scale shape: one scan → one 1-row hash aggregate; the n·Σt² cross
    term is ≤ 9n² — BIGINT-safe past 1e9 documents."""
    d = load_table(spark, sf_dir, "documents").select(
        F.when(F.size(F.split("text", " ")) >= 60, 1).otherwise(0).alias("a"),
        F.when(F.size(F.array_distinct(F.split("text", " "))) >= 28, 1)
        .otherwise(0)
        .alias("b"),
        F.when(F.length("text") >= 330, 1).otherwise(0).alias("c"),
    )
    agg = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast("long").alias("ga"),
        F.sum("b").cast("long").alias("gb"),
        F.sum("c").cast("long").alias("gc"),
        F.sum(
            (F.col("a") + F.col("b") + F.col("c"))
            * (F.col("a") + F.col("b") + F.col("c"))
        )
        .cast("long")
        .alias("sum_l2"),
    )
    item = F.expr(_CRONBACH_ITEM_NUM)
    tot = F.expr(_CRONBACH_TOT_NUM)
    return agg.select(
        "n",
        "ga",
        "gb",
        "gc",
        item.cast("long").alias("item_var_num"),
        tot.cast("long").alias("total_var_num"),
        (3 * (tot - item)).cast("long").alias("alpha_num"),
        (2 * tot).cast("long").alias("alpha_den"),
        F.when(
            tot > 0,
            F.round((3 * (tot - item)).cast("double") / (2 * tot), 6),
        ).alias("alpha"),
    )


#: Bartlett's M pieces, shared verbatim: per-group sample variance as
#: the exact rational (n·Σx²−S²)/(n(n−1)), its ln as the
#: floor(10⁶·ln) fixed-point BIGINT (q_ml_logloss floor trick), the
#: pooled variance as ONE fixed-group-order double expression over the
#: exact pieces (the Levene literal-sum pattern).
_BARTLETT_SP2 = (
    "((CAST(num_p AS DOUBLE) / n_p) + (CAST(num_v AS DOUBLE) / n_v)"
    " + (CAST(num_c AS DOUBLE) / n_c))"
    " / (n_p + n_v + n_c - 3)"
)
_BARTLETT_C = (
    "1 + ((CAST(1 AS DOUBLE) / (n_p - 1) + CAST(1 AS DOUBLE) / (n_v - 1)"
    " + CAST(1 AS DOUBLE) / (n_c - 1)"
    " - CAST(1 AS DOUBLE) / (n_p + n_v + n_c - 3)) / 6)"
)


@query(
    "q_stat_bartlett",
    oracle=f"""
    WITH s AS (
        SELECT event_type AS g,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE event_type IN ('purchase', 'view', 'click')
    ),
    byg AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(vc) AS BIGINT) AS sv,
               CAST(sum(vc * vc) AS BIGINT) AS sv2
        FROM s GROUP BY g
    ),
    piv AS (
        SELECT
            CAST(max(CASE WHEN g = 'purchase' THEN n END) AS BIGINT) AS n_p,
            CAST(max(CASE WHEN g = 'view' THEN n END) AS BIGINT) AS n_v,
            CAST(max(CASE WHEN g = 'click' THEN n END) AS BIGINT) AS n_c,
            CAST(max(CASE WHEN g = 'purchase' THEN n * sv2 - sv * sv END)
                 AS BIGINT) AS num_p,
            CAST(max(CASE WHEN g = 'view' THEN n * sv2 - sv * sv END)
                 AS BIGINT) AS num_v,
            CAST(max(CASE WHEN g = 'click' THEN n * sv2 - sv * sv END)
                 AS BIGINT) AS num_c
        FROM byg
    ),
    fp AS (
        SELECT n_p, n_v, n_c,
               CAST(floor(1000000 * ln(CAST(num_p AS DOUBLE)
                                       / (n_p * (n_p - 1)))) AS BIGINT)
                   AS ln_p,
               CAST(floor(1000000 * ln(CAST(num_v AS DOUBLE)
                                       / (n_v * (n_v - 1)))) AS BIGINT)
                   AS ln_v,
               CAST(floor(1000000 * ln(CAST(num_c AS DOUBLE)
                                       / (n_c * (n_c - 1)))) AS BIGINT)
                   AS ln_c,
               CAST(floor(1000000 * ln({_BARTLETT_SP2})) AS BIGINT)
                   AS ln_sp,
               num_p, num_v, num_c
        FROM piv
        WHERE num_p > 0 AND num_v > 0 AND num_c > 0
    )
    SELECT n_p, n_v, n_c, ln_p, ln_v, ln_c, ln_sp,
           CAST((n_p + n_v + n_c - 3) * ln_sp
                - (n_p - 1) * ln_p - (n_v - 1) * ln_v - (n_c - 1) * ln_c
                AS BIGINT) AS m_fp,
           round({_BARTLETT_C}, 6) AS c_corr,
           round(CAST((n_p + n_v + n_c - 3) * ln_sp
                      - (n_p - 1) * ln_p - (n_v - 1) * ln_v
                      - (n_c - 1) * ln_c AS DOUBLE)
                 / 1000000 / ({_BARTLETT_C}), 4) AS bartlett_stat
    FROM fp
    """,
)
def q_stat_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for equal variances across the purchase / view /
    click ``value`` distributions — the PARAMETRIC complement to
    q_stat_levene's Brown–Forsythe (Bartlett is more powerful under
    normality, fragile otherwise; a pipeline reports both).

    Determinism: per-group (n, Σx, Σx²) are exact BIGINT cent sums;
    each sample variance enters only as the exact rational
    (nΣx²−S²)/(n(n−1)); every ln is the floor(10⁶·ln ·) fixed-point
    BIGINT (the q_ml_logloss floor absorbs sub-ulp ln drift), so
    M = (N−k)·ln s²_p − Σ(nᵢ−1)·ln s²ᵢ is INTEGER arithmetic on
    fixed-point terms; the pooled variance and the C correction are
    single fixed-group-order double expressions over exact ints (the
    Levene literal-sum pattern).  The statistic is reported at 10⁻⁶
    fixed point; no decision column — χ²(k−1) on a fixed-point M
    would cut a boundary the fixed point itself defines.  Degenerate
    zero-variance groups produce zero rows (guarded WHERE), never a
    ln(0) crash.

    Scale shape: one scan → 3-group hash agg → 1-row pivot; weights
    (nᵢ−1)·ln_fp ≤ ~1e8·2e7 = 2e15 — BIGINT-safe."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(
        F.col("event_type").isin("purchase", "view", "click")
    ).select(
        F.col("event_type").alias("g"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
    )
    byg = s.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("vc").cast("long").alias("sv"),
        F.sum(F.col("vc") * F.col("vc")).cast("long").alias("sv2"),
    )

    def cell(g: str, expr: str, alias: str):
        return F.max(
            F.when(F.col("g") == g, F.expr(expr))
        ).cast("long").alias(alias)

    piv = byg.agg(
        cell("purchase", "n", "n_p"),
        cell("view", "n", "n_v"),
        cell("click", "n", "n_c"),
        cell("purchase", "n * sv2 - sv * sv", "num_p"),
        cell("view", "n * sv2 - sv * sv", "num_v"),
        cell("click", "n * sv2 - sv * sv", "num_c"),
    )
    fp = piv.where(
        (F.col("num_p") > 0) & (F.col("num_v") > 0) & (F.col("num_c") > 0)
    ).select(
        "n_p",
        "n_v",
        "n_c",
        F.expr(
            "CAST(floor(1000000 * ln(CAST(num_p AS DOUBLE)"
            " / (n_p * (n_p - 1)))) AS BIGINT)"
        ).alias("ln_p"),
        F.expr(
            "CAST(floor(1000000 * ln(CAST(num_v AS DOUBLE)"
            " / (n_v * (n_v - 1)))) AS BIGINT)"
        ).alias("ln_v"),
        F.expr(
            "CAST(floor(1000000 * ln(CAST(num_c AS DOUBLE)"
            " / (n_c * (n_c - 1)))) AS BIGINT)"
        ).alias("ln_c"),
        F.expr(
            f"CAST(floor(1000000 * ln({_BARTLETT_SP2})) AS BIGINT)"
        ).alias("ln_sp"),
    )
    m_fp = F.expr(
        "CAST((n_p + n_v + n_c - 3) * ln_sp"
        " - (n_p - 1) * ln_p - (n_v - 1) * ln_v - (n_c - 1) * ln_c"
        " AS BIGINT)"
    )
    return fp.select(
        "n_p",
        "n_v",
        "n_c",
        "ln_p",
        "ln_v",
        "ln_c",
        "ln_sp",
        m_fp.alias("m_fp"),
        F.round(F.expr(_BARTLETT_C), 6).alias("c_corr"),
        F.round(
            m_fp.cast("double") / 1000000 / F.expr(_BARTLETT_C), 4
        ).alias("bartlett_stat"),
    )


#: TOST pieces shared verbatim: Welch standard error over exact
#: moments (the r6 overflow rule — Σ and Σ² exact BIGINT, variance
#: algebra in DOUBLE with an identical op sequence), z for both
#: one-sided tests, and the 5% one-sided normal critical value as a
#: CAST-DOUBLE literal.
_TOST_SE = (
    "sqrt((CAST(n1 * s2_1 - s1 * s1 AS DOUBLE) / n1 / (n1 - 1)) / n1"
    " + (CAST(n2 * s2_2 - s2 * s2 AS DOUBLE) / n2 / (n2 - 1)) / n2)"
)
_TOST_DELTA = "(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
_TOST_MARGIN_CENTS = 50
_TOST_Z_CRIT = "CAST(1.644854 AS DOUBLE)"


@query(
    "q_stat_tost",
    oracle=f"""
    WITH s AS (
        SELECT (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                ::BIGINT % 2) AS arm,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n1,
            CAST(sum(CASE WHEN arm = 0 THEN vc ELSE 0 END) AS BIGINT)
                AS s1,
            CAST(sum(CASE WHEN arm = 0 THEN vc * vc ELSE 0 END)
                 AS BIGINT) AS s2_1,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n2,
            CAST(sum(CASE WHEN arm = 1 THEN vc ELSE 0 END) AS BIGINT)
                AS s2,
            CAST(sum(CASE WHEN arm = 1 THEN vc * vc ELSE 0 END)
                 AS BIGINT) AS s2_2
        FROM s
    )
    SELECT n1, n2, s1, s2,
           round({_TOST_DELTA}, 4) AS delta_cents,
           round({_TOST_SE}, 4) AS se_cents,
           CASE WHEN n1 >= 2 AND n2 >= 2 THEN
               round(({_TOST_DELTA} + {_TOST_MARGIN_CENTS})
                     / ({_TOST_SE}), 4) END AS z_lower,
           CASE WHEN n1 >= 2 AND n2 >= 2 THEN
               round(({_TOST_MARGIN_CENTS} - ({_TOST_DELTA}))
                     / ({_TOST_SE}), 4) END AS z_upper,
           CASE WHEN n1 >= 2 AND n2 >= 2 THEN
               (({_TOST_DELTA} + {_TOST_MARGIN_CENTS})
                    > {_TOST_Z_CRIT} * ({_TOST_SE})
                AND ({_TOST_MARGIN_CENTS} - ({_TOST_DELTA}))
                    > {_TOST_Z_CRIT} * ({_TOST_SE}))
           END AS equivalent_05
    FROM m
    """,
)
def q_stat_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided tests, Schuirmann 1987) on
    purchase value between the two md5-parity user arms: the question
    every holdback readout actually needs — not "is there a
    difference?" (q_stat_ttest) but "is any difference INSIDE the
    ±50¢ margin?".  Rejecting both one-sided nulls at 5% declares
    equivalence; an insignificant t-test never can.

    Determinism: per-arm (n, Σx, Σx²) are exact BIGINT cent sums from
    ONE scan; the Welch standard error does its variance algebra in
    DOUBLE over the exact sums (the r6 overflow rule — the op sequence
    is shared verbatim, so both engines compute bit-identical
    doubles); both z statistics and the joint decision evaluate that
    same shared expression against the CAST-DOUBLE 1.644854 literal.
    Arms with n < 2 yield NULL tests, never a division crash.

    Scale shape: one scan → one 1-row conditional aggregate."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "purchase").select(
        F.expr(
            "pmod(cast(conv(substr(md5(cast(cast(user_id as string)"
            " as binary)), 1, 15), 16, 10) as bigint), 2)"
        ).alias("arm"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
    )

    def cell(arm: int, expr: str, alias: str):
        return (
            F.sum(F.when(F.col("arm") == arm, F.expr(expr)).otherwise(0))
            .cast("long")
            .alias(alias)
        )

    m = s.agg(
        cell(0, "1", "n1"),
        cell(0, "vc", "s1"),
        cell(0, "vc * vc", "s2_1"),
        cell(1, "1", "n2"),
        cell(1, "vc", "s2"),
        cell(1, "vc * vc", "s2_2"),
    )
    delta = F.expr(_TOST_DELTA)
    se = F.expr(_TOST_SE)
    ok = (F.col("n1") >= 2) & (F.col("n2") >= 2)
    crit = F.expr(_TOST_Z_CRIT)
    return m.select(
        "n1",
        "n2",
        "s1",
        "s2",
        F.round(delta, 4).alias("delta_cents"),
        F.round(se, 4).alias("se_cents"),
        F.when(
            ok, F.round((delta + _TOST_MARGIN_CENTS) / se, 4)
        ).alias("z_lower"),
        F.when(
            ok, F.round((_TOST_MARGIN_CENTS - delta) / se, 4)
        ).alias("z_upper"),
        F.when(
            ok,
            ((delta + _TOST_MARGIN_CENTS) > crit * se)
            & ((_TOST_MARGIN_CENTS - delta) > crit * se),
        ).alias("equivalent_05"),
    )


def _mood_term(o: str, r: str, c: str) -> str:
    """(O·N − R·C)²/(N·R·C) with the square taken in DOUBLE — the
    BIGINT cross term O·N is ~3e10 at sf0.1 and its square would
    overflow, so exactly one factor is cast first (r6 overflow rule)."""
    x = f"({o} * nn - {r} * {c})"
    return f"(CAST({x} AS DOUBLE) * {x}) / (CAST(nn AS DOUBLE) * {r} * {c})"


#: Mood's median χ² over the 2×3 above/≤-median table, written as six
#: fixed-order literal terms shared verbatim (the Levene pattern).
_MOOD_CHI2 = " + ".join(
    [
        _mood_term("a_p", "n_p", "ca"),
        _mood_term("a_v", "n_v", "ca"),
        _mood_term("a_c", "n_c", "ca"),
        _mood_term("(n_p - a_p)", "n_p", "cb"),
        _mood_term("(n_v - a_v)", "n_v", "cb"),
        _mood_term("(n_c - a_c)", "n_c", "cb"),
    ]
)


@query(
    "q_stat_mood",
    oracle=f"""
    WITH s AS (
        SELECT event_type AS g,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE event_type IN ('purchase', 'view', 'click')
    ),
    pv AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY vc
    ),
    cum AS (
        SELECT vc, sum(c) OVER (ORDER BY vc) AS cumc FROM pv
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pv),
    med AS (
        SELECT min(vc) AS m FROM cum CROSS JOIN tot
        WHERE 2 * cumc >= n
    ),
    piv AS (
        SELECT
            CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_p,
            CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_v,
            CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_c,
            CAST(sum(CASE WHEN g = 'purchase' AND vc > m.m
                     THEN 1 ELSE 0 END) AS BIGINT) AS a_p,
            CAST(sum(CASE WHEN g = 'view' AND vc > m.m
                     THEN 1 ELSE 0 END) AS BIGINT) AS a_v,
            CAST(sum(CASE WHEN g = 'click' AND vc > m.m
                     THEN 1 ELSE 0 END) AS BIGINT) AS a_c
        FROM s CROSS JOIN med m
    ),
    x AS (
        SELECT n_p, n_v, n_c, a_p, a_v, a_c,
               CAST(n_p + n_v + n_c AS BIGINT) AS nn,
               CAST(a_p + a_v + a_c AS BIGINT) AS ca,
               CAST(n_p + n_v + n_c - a_p - a_v - a_c AS BIGINT) AS cb
        FROM piv
    )
    SELECT n_p, n_v, n_c, a_p, a_v, a_c,
           (SELECT m FROM med) AS median_cents,
           CASE WHEN ca > 0 AND cb > 0
                     AND n_p > 0 AND n_v > 0 AND n_c > 0 THEN
               round({_MOOD_CHI2}, 4) END AS chi2,
           CASE WHEN ca > 0 AND cb > 0
                     AND n_p > 0 AND n_v > 0 AND n_c > 0 THEN
               ({_MOOD_CHI2}) >= CAST(5.991465 AS DOUBLE) END
               AS reject_05
    FROM x
    """,
)
def q_stat_mood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across purchase/view/click values: do the
    three groups share one median?  The k-sample LOCATION complement
    to Kruskal–Wallis (which tests the full rank distribution) and
    Brown–Forsythe (which tests SPREAD around group medians): Mood's
    reduces every observation to one bit — above the POOLED median or
    not — and χ²-tests the resulting 2×3 table, so it is the most
    outlier-robust of the three.

    Determinism: the pooled median is the exact lower order statistic
    (2·cum ≥ n over the per-distinct-value prefix scan — the
    q_stat_levene machinery, here pooled); all six table cells are
    exact BIGINTs from ONE conditional aggregate; χ² = Σ(O·N−R·C)² /
    (N·R·C) is six fixed-order literal double terms over the exact
    cells (squares taken in DOUBLE — the BIGINT square would overflow
    at ~3e10), and the 5% decision evaluates the same shared
    expression against the χ²(2) CAST-DOUBLE literal.  Degenerate
    marginals (an empty group, or everything on one side of the
    median) yield NULLs, never a division crash.

    Scale shape: per-distinct-value hash agg + the two-level bucketed
    prefix scan, a broadcast 1-row median, one conditional aggregate."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(
        F.col("event_type").isin("purchase", "view", "click")
    ).select(
        F.col("event_type").alias("g"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
    )
    pv = s.groupBy("vc").agg(F.count("*").cast("long").alias("c"))
    # COARSE bucket for the prefix scan (r11 opt): value-grain
    # buckets made the carry theta-join |distinct values|^2 (a ~1e9-
    # comparison BNLJ measured seconds at sf0.1, quadratic at scale);
    # floor(vc/2500) ascends with vc (floor, not div: order-aligned
    # for negatives too), so the scan is unchanged semantically.
    cum = bucketed_running_sum(
        pv,
        F.floor(F.col("vc") / F.lit(2500)).cast("long"),
        [F.col("vc")],
        {"cumc": F.col("c")},
    )
    tot = pv.agg(F.sum("c").cast("long").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .where(2 * F.col("cumc") >= F.col("n"))
        .agg(F.min("vc").alias("m"))
    )

    def cnt(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(alias)

    g, vc, m = F.col("g"), F.col("vc"), F.col("m")
    piv = s.crossJoin(F.broadcast(med)).agg(
        cnt(g == "purchase", "n_p"),
        cnt(g == "view", "n_v"),
        cnt(g == "click", "n_c"),
        cnt((g == "purchase") & (vc > m), "a_p"),
        cnt((g == "view") & (vc > m), "a_v"),
        cnt((g == "click") & (vc > m), "a_c"),
        F.first("m").alias("median_cents"),
    )
    x = piv.select(
        "n_p", "n_v", "n_c", "a_p", "a_v", "a_c", "median_cents",
        (F.col("n_p") + F.col("n_v") + F.col("n_c"))
        .cast("long")
        .alias("nn"),
        (F.col("a_p") + F.col("a_v") + F.col("a_c"))
        .cast("long")
        .alias("ca"),
    ).withColumn("cb", (F.col("nn") - F.col("ca")).cast("long"))
    ok = (
        (F.col("ca") > 0)
        & (F.col("cb") > 0)
        & (F.col("n_p") > 0)
        & (F.col("n_v") > 0)
        & (F.col("n_c") > 0)
    )
    chi2 = F.expr(_MOOD_CHI2)
    return x.select(
        "n_p", "n_v", "n_c", "a_p", "a_v", "a_c", "median_cents",
        F.when(ok, F.round(chi2, 4)).alias("chi2"),
        F.when(ok, chi2 >= F.expr("CAST(5.991465 AS DOUBLE)")).alias(
            "reject_05"
        ),
    )


@query(
    "q_stat_dispersion",
    oracle="""
    WITH h AS (
        SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id
        FROM events
    ),
    span AS (
        SELECT CAST(min(hour_id) AS BIGINT) AS h0,
               CAST(max(hour_id) AS BIGINT) AS h1
        FROM h
    ),
    spine AS (
        SELECT unnest(generate_series(h0, h1)) AS hour_id FROM span
    ),
    obs AS (
        SELECT hour_id, CAST(count(*) AS BIGINT) AS c
        FROM h GROUP BY hour_id
    ),
    filled AS (
        SELECT s.hour_id, CAST(coalesce(o.c, 0) AS BIGINT) AS c
        FROM spine s LEFT JOIN obs o ON o.hour_id = s.hour_id
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS s2
        FROM filled
    )
    SELECT n, s, s2,
           CAST(n * s2 - s * s AS BIGINT) AS chi2_num,
           round(CAST(n * s2 - s * s AS DOUBLE) / s, 4) AS chi2,
           round(CAST(n * s2 - s * s AS DOUBLE) / (s * (n - 1)), 4)
               AS vmr
    FROM m
    """,
)
def q_stat_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion (index-of-dispersion) test on hourly event
    arrivals: VMR = s²/x̄ over the ZERO-FILLED hour spine — the
    classic overdispersion screen (VMR ≈ 1 Poisson, ≫ 1 bursty /
    self-exciting, ≪ 1 regularized) that says whether q_ev_burst's
    peaks are noise or structure.  The spine matters: grouping only
    observed hours silently drops the empty intervals that carry the
    underdispersion signal.

    Determinism: the dispersion χ² = (n−1)s²/x̄ collapses EXACTLY to
    the integer pair (n·Σc² − S²)/S — no variance algebra ever leaves
    BIGINT (n·Σc² ≈ 7e2·7e2·(avg c)² — safe past 1e9 events/hour);
    the two reported ratios are final divisions.  The hour spine is
    exact integer epoch-hour ids (µs floor-division on non-negative
    epochs — the µs-gap rule).

    Scale shape: one scan → hour hash agg (calendar-bounded), a
    generated spine joined at hour grain, a 1-row moment agg."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        F.expr("CAST(unix_micros(ts) div 3600000000 AS BIGINT)").alias(
            "hour_id"
        )
    )
    span = h.agg(
        F.min("hour_id").alias("h0"), F.max("hour_id").alias("h1")
    )
    spine = span.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_id")
    )
    obs = h.groupBy("hour_id").agg(F.count("*").cast("long").alias("c"))
    filled = spine.join(obs, "hour_id", "left").select(
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
    )
    m = filled.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    num = F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    return m.select(
        "n",
        "s",
        "s2",
        num.cast("long").alias("chi2_num"),
        F.round(num.cast("double") / F.col("s"), 4).alias("chi2"),
        F.round(
            num.cast("double") / (F.col("s") * (F.col("n") - 1)), 4
        ).alias("vmr"),
    )


@query(
    "q_stat_sign",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    p AS (
        SELECT a.day AS day, b.x - a.x AS diff
        FROM d a JOIN d b ON b.day = a.day + INTERVAL 7 DAY
        WHERE b.x <> a.x
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(coalesce(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS s_plus
        FROM p
    )
    SELECT n, s_plus,
           CAST(2 * s_plus - n AS BIGINT) AS dev,
           CASE WHEN n >= 1 THEN
               round((2 * s_plus - n) / sqrt(CAST(n AS DOUBLE)), 4)
           END AS z,
           CAST({_Z2_CRIT_DEN} * (2 * s_plus - n) * (2 * s_plus - n)
                > {_Z2_CRIT_NUM} * n AS BOOLEAN) AS reject_05
    FROM s
    """,
)
def q_stat_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign test on the week-over-week paired daily revenue — the
    bottom rung of the paired-test ladder (sign: direction only →
    q_stat_wilcoxon: + magnitude ranks → q_stat_ttest: + full values):
    under H₀ the weekly difference is positive with probability ½, so
    S⁺ ~ Binomial(n, ½).  The rung that stays valid under ANY
    difference distribution — the robustness floor the other two are
    judged against.

    Determinism: the same zero-excluded pair series as Wilcoxon
    (shared construction, stated); S⁺ and the deviation 2S⁺−n are
    exact BIGINTs; z = (2S⁺−n)/√n is the one final float, and the 5%
    normal-approximation decision is the integer cross-multiplication
    10⁶·(2S⁺−n)² > 3841459·n.

    Scale shape: one keyed date aggregate, a calendar-bounded
    self-join, one 1-row agg — no windows at all."""
    d = _daily_xy(spark, sf_dir)
    a = d.select(F.col("day"), F.col("x").alias("xa"))
    b = d.select(
        F.date_sub(F.col("day"), 7).alias("day"), F.col("x").alias("xb")
    )
    p = (
        a.join(b, "day")
        .select((F.col("xb") - F.col("xa")).alias("diff"))
        .where(F.col("diff") != 0)
    )
    s = p.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("s_plus"),
    )
    dev = 2 * F.col("s_plus") - F.col("n")
    return s.select(
        "n",
        "s_plus",
        dev.cast("long").alias("dev"),
        F.when(
            F.col("n") >= 1,
            F.round(dev / F.sqrt(F.col("n").cast("double")), 4),
        ).alias("z"),
        (
            F.lit(_Z2_CRIT_DEN).cast("long") * dev * dev
            > F.lit(_Z2_CRIT_NUM).cast("long") * F.col("n")
        ).alias("reject_05"),
    )


def _three_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-distinct-value counts for the ordered three-group rank
    tests: c1 = view, c2 = click, c3 = purchase occurrences of each
    ``value``.  One keyed aggregate, same shape as ``_two_sample``."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "value",
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g1"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g2"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("g3"),
    )
    return s.groupBy("value").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
        F.sum("g3").cast("long").alias("c3"),
    )


_THREE_SAMPLE_SQL = """
        SELECT value,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c3
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY value
"""


@query(
    "q_stat_cliffs",
    oracle="""
    WITH s AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pv AS (
        SELECT value, count(*) AS ct, CAST(sum(g1) AS BIGINT) AS c1t
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT ct, c1t,
               sum(ct) OVER (ORDER BY value) AS cum_t,
               sum(c1t) OVER (ORDER BY value) AS cum_1
        FROM pv
    ),
    tot AS (
        SELECT CAST(sum(c1t) AS BIGINT) AS n1,
               CAST(sum(ct) - sum(c1t) AS BIGINT) AS n2
        FROM pv
    ),
    acc AS (
        SELECT
            CAST(sum(c1t * ((cum_t - ct) - (cum_1 - c1t))) AS BIGINT)
                AS s_vb,
            CAST(sum(c1t * (ct - c1t)) AS BIGINT) AS s_tie
        FROM cum
    )
    SELECT n1, n2,
           CAST(2 * s_vb + s_tie - n1 * n2 AS BIGINT) AS delta_num,
           round(CAST(2 * s_vb + s_tie - n1 * n2 AS DOUBLE)
                 / (n1 * n2), 6) AS cliffs_delta,
           round((CAST(2 * s_vb + s_tie - n1 * n2 AS DOUBLE)
                  + n1 * n2) / (2 * n1 * n2), 6) AS vargha_a
    FROM acc CROSS JOIN tot
    """,
)
def q_stat_cliffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta + Vargha–Delaney A (purchase vs view ``value``) —
    the ordinal effect-size companion to q_stat_mannwhitney's test:
    delta = (#(x>y) − #(x<y))/(n1·n2), A = P(x>y) + P(x=y)/2, the
    magnitude the significance test alone doesn't give.

    Exactness: with per-distinct-value counts (c1 = purchases, c2 =
    views at v) and the exclusive-below view count vb(v), the identity
    #(x>y) − #(x<y) = 2·Σ c1·vb + Σ c1·c2 − n1·n2 makes the numerator
    one exact BIGINT; both ratios are single final floats.  The
    value-ordered prefix runs through the bucketed two-level scan, not
    a global window (plan mirrors q_stat_ks).  At 1e10-row samples the
    c1·vb products move to DECIMAL(38,0) (same note as KS)."""
    pv = _two_sample(spark, sf_dir)
    cum = bucketed_running_sum(
        pv,
        bucket=F.floor(F.col("value") / F.lit(25.0)).cast("long"),
        order_cols=[F.col("value")],
        sums={"cum_t": F.col("ct"), "cum_1": F.col("c1t")},
    )
    tot = pv.agg(
        F.sum("c1t").alias("n1"),
        (F.sum("ct") - F.sum("c1t")).alias("n2"),
    )
    acc = cum.agg(
        F.sum(
            F.col("c1t")
            * (
                (F.col("cum_t") - F.col("ct"))
                - (F.col("cum_1") - F.col("c1t"))
            )
        )
        .cast("long")
        .alias("s_vb"),
        F.sum(F.col("c1t") * (F.col("ct") - F.col("c1t")))
        .cast("long")
        .alias("s_tie"),
    )
    num = 2 * F.col("s_vb") + F.col("s_tie") - F.col("n1") * F.col("n2")
    return acc.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        num.cast("long").alias("delta_num"),
        F.round(
            num.cast("double") / (F.col("n1") * F.col("n2")), 6
        ).alias("cliffs_delta"),
        F.round(
            (num.cast("double") + F.col("n1") * F.col("n2"))
            / (2 * F.col("n1") * F.col("n2")),
            6,
        ).alias("vargha_a"),
    )


@query(
    "q_stat_jonckheere",
    oracle=f"""
    WITH pv AS ({_THREE_SAMPLE_SQL}),
    cum AS (
        SELECT c1, c2, c3,
               sum(c1) OVER (ORDER BY value) AS cum1,
               sum(c2) OVER (ORDER BY value) AS cum2
        FROM pv
    ),
    acc AS (
        SELECT CAST(sum(
                   2 * c2 * (cum1 - c1) + c1 * c2
                 + 2 * c3 * ((cum1 - c1) + (cum2 - c2))
                 + c3 * (c1 + c2)) AS BIGINT) AS jt2
        FROM cum
    ),
    tot AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2,
               CAST(sum(c3) AS BIGINT) AS n3
        FROM pv
    ),
    m AS (
        SELECT jt2, n1, n2, n3, n1 + n2 + n3 AS nn,
               (n1 + n2 + n3) * (n1 + n2 + n3)
                   - (n1 * n1 + n2 * n2 + n3 * n3) AS e4,
               (n1 + n2 + n3) * (n1 + n2 + n3)
                   * (2 * (n1 + n2 + n3) + 3)
                 - (n1 * n1 * (2 * n1 + 3) + n2 * n2 * (2 * n2 + 3)
                    + n3 * n3 * (2 * n3 + 3)) AS v72
        FROM acc CROSS JOIN tot
    )
    SELECT n1, n2, n3, jt2,
           CAST(e4 AS BIGINT) AS e4,
           CAST(v72 AS BIGINT) AS v72,
           round((CAST(jt2 AS DOUBLE) / 2 - CAST(e4 AS DOUBLE) / 4)
                 / sqrt(CAST(v72 AS DOUBLE) / 72), 4) AS z_stat,
           CAST(72000000e0 * CAST(2 * jt2 - e4 AS DOUBLE)
                           * CAST(2 * jt2 - e4 AS DOUBLE)
                > 16000000e0 * 3.841459e0 * CAST(v72 AS DOUBLE)
                AS BOOLEAN) AS reject_05
    FROM m
    """,
)
def q_stat_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra ordered-alternative test (view < click <
    purchase in ``value``): JT = sum over group pairs a<b of U_ab, the
    Mann–Whitney counts in the hypothesized group order — the trend
    test ANOVA/Kruskal–Wallis can't express (they test ANY difference,
    JT tests the ORDERED one).

    Exactness: per-distinct-value group counts + exclusive-below
    prefixes give 2·JT = Σ 2c₂·b₁ + c₁c₂ + 2c₃·(b₁+b₂) + c₃(c₁+c₂)
    (ties counted ½, doubled to stay integer); E and Var carried as
    the exact integers e4 = 4E = N²−Σn_k² and v72 = 72·Var.  z and
    the 5% decision 72·(4(JT−E))² > 16·z²crit·v72 are evaluated in
    DOUBLE over those exact integers with the identical expression in
    both engines (the squared deviation is quadratic-in-value-scale —
    the overflow rule forbids BIGINT here).  Prefixes run through the
    bucketed two-level scan; no global window."""
    pv = _three_sample(spark, sf_dir)
    cum = bucketed_running_sum(
        pv,
        bucket=F.floor(F.col("value") / F.lit(25.0)).cast("long"),
        order_cols=[F.col("value")],
        sums={"cum1": F.col("c1"), "cum2": F.col("c2")},
    )
    acc = cum.agg(
        F.sum(
            2 * F.col("c2") * (F.col("cum1") - F.col("c1"))
            + F.col("c1") * F.col("c2")
            + 2
            * F.col("c3")
            * (
                (F.col("cum1") - F.col("c1"))
                + (F.col("cum2") - F.col("c2"))
            )
            + F.col("c3") * (F.col("c1") + F.col("c2"))
        )
        .cast("long")
        .alias("jt2")
    )
    tot = pv.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum("c3").alias("n3"),
    )
    m = acc.crossJoin(F.broadcast(tot))
    nn = F.col("n1") + F.col("n2") + F.col("n3")
    e4 = nn * nn - (
        F.col("n1") * F.col("n1")
        + F.col("n2") * F.col("n2")
        + F.col("n3") * F.col("n3")
    )
    v72 = nn * nn * (2 * nn + 3) - (
        F.col("n1") * F.col("n1") * (2 * F.col("n1") + 3)
        + F.col("n2") * F.col("n2") * (2 * F.col("n2") + 3)
        + F.col("n3") * F.col("n3") * (2 * F.col("n3") + 3)
    )
    dev_d = (2 * F.col("jt2") - e4).cast("double")
    return m.select(
        "n1",
        "n2",
        "n3",
        "jt2",
        e4.cast("long").alias("e4"),
        v72.cast("long").alias("v72"),
        F.round(
            (F.col("jt2").cast("double") / 2 - e4.cast("double") / 4)
            / F.sqrt(v72.cast("double") / 72),
            4,
        ).alias("z_stat"),
        (
            F.lit(72000000.0) * dev_d * dev_d
            > F.lit(16000000.0) * F.lit(3.841459) * v72.cast("double")
        ).alias("reject_05"),
    )


@query(
    "q_stat_pettitt",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    rk AS (
        SELECT day,
               2 * rank() OVER (ORDER BY x)
                 + count(*) OVER (PARTITION BY x) - 1 AS r2
        FROM d
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d),
    u AS (
        SELECT day,
               CAST(sum(r2) OVER (ORDER BY day) AS BIGINT)
                 - row_number() OVER (ORDER BY day) * (n_days + 1) AS u_t,
               n_days
        FROM rk CROSS JOIN n
    ),
    best AS (
        SELECT n_days,
               max(abs(u_t) * 1048576
                   + (1048575 - date_diff('day', DATE '2024-01-01', day)))
                   AS packed
        FROM u GROUP BY n_days
    )
    SELECT n_days,
           CAST(packed // 1048576 AS BIGINT) AS k_stat,
           CAST(DATE '2024-01-01'
                + CAST(1048575 - packed % 1048576 AS INTEGER)
                AS VARCHAR) AS change_day,
           round(2 * exp(-(6e0 * (packed // 1048576) * (packed // 1048576))
                         / (CAST(n_days AS DOUBLE) * n_days * n_days
                            + CAST(n_days AS DOUBLE) * n_days)), 4)
               AS p_approx,
           CAST(6000000 * (packed // 1048576) * (packed // 1048576)
                >= 3688879 * (n_days * n_days * n_days + n_days * n_days)
                AS BOOLEAN) AS reject_05
    FROM best
    """,
)
def q_stat_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point test on the daily purchase-revenue series:
    U_t = sum_(i<=t) sum_(j>t) sign(x_i − x_j), K = max_t |U_t|, with
    the change day at the argmax — the rank-based (distribution-free)
    single-changepoint detector, the nonparametric sibling of
    q_ev_changepoint's variance-based split.

    Exactness: with tie-averaged pooled ranks carried as 2× integers,
    U_t = (running sum of r2 in day order) − t·(n+1) is an exact
    BIGINT for every prefix t; K and the argmax day come from ONE
    packed max (|U|·2²⁰ + reversed day code — earliest day wins ties,
    never a SortAggregate struct-min); the 5% decision is the integer
    cross-multiplication 6·10⁶·K² ≥ ln(40)·10⁶·(n³+n²) with
    ln(40)→3688879 floored (a shared deterministic rule; the floor
    direction only loosens the bound by <1e-6).  p_approx =
    2·exp(−6K²/(n³+n²)) is one final float on exact integers.

    Scale shape: everything after the keyed date aggregate lives on
    the calendar-bounded daily series (windows justified in the
    allowlist); K² stays in BIGINT to ~1000-day spans, then moves to
    DECIMAL(38,0)."""
    d = _daily_xy(spark, sf_dir)
    w_rank = Window.orderBy("x")
    w_tie = Window.partitionBy("x")
    rk = d.select(
        "day",
        (
            2 * F.rank().over(w_rank) + F.count("*").over(w_tie) - 1
        ).alias("r2"),
    )
    n = d.agg(F.count("*").cast("long").alias("n_days"))
    w_day = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    u = rk.crossJoin(F.broadcast(n)).select(
        "day",
        (
            F.sum("r2").over(w_day).cast("long")
            - F.row_number().over(Window.orderBy("day"))
            * (F.col("n_days") + 1)
        ).alias("u_t"),
        "n_days",
    )
    day_code = F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
    best = u.groupBy("n_days").agg(
        F.max(
            F.abs(F.col("u_t")) * 1048576 + (1048575 - day_code)
        ).alias("packed")
    )
    k = F.floor(F.col("packed") / 1048576).cast("long")
    nd = F.col("n_days").cast("double")
    return best.select(
        "n_days",
        k.alias("k_stat"),
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            (1048575 - F.col("packed") % 1048576).cast("int"),
        )
        .cast("string")
        .alias("change_day"),
        F.round(
            2
            * F.exp(
                -(F.lit(6.0) * k * k)
                / (nd * F.col("n_days") * F.col("n_days")
                   + nd * F.col("n_days"))
            ),
            4,
        ).alias("p_approx"),
        (
            F.lit(6000000).cast("long") * k * k
            >= F.lit(3688879).cast("long")
            * (
                F.col("n_days") * F.col("n_days") * F.col("n_days")
                + F.col("n_days") * F.col("n_days")
            )
        ).alias("reject_05"),
    )


@query(
    "q_stat_coxstuart",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    idx AS (
        SELECT x, row_number() OVER (ORDER BY day) AS i,
               count(*) OVER () AS n
        FROM d
    ),
    p AS (
        SELECT b.x - a.x AS diff
        FROM idx a JOIN idx b ON b.i = a.i + (a.n + 1) // 2
        WHERE b.x <> a.x
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(coalesce(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS s_plus
        FROM p
    )
    SELECT m, s_plus,
           CAST(2 * s_plus - m AS BIGINT) AS dev,
           CASE WHEN m >= 1 THEN
               round((2 * s_plus - m) / sqrt(CAST(m AS DOUBLE)), 4)
           END AS z,
           CAST({_Z2_CRIT_DEN} * (2 * s_plus - m) * (2 * s_plus - m)
                > {_Z2_CRIT_NUM} * m AS BOOLEAN) AS reject_05
    FROM s
    """,
)
def q_stat_coxstuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox–Stuart trend test on daily purchase revenue: pair day i
    with day i + ceil(n/2) (first half against second half, middle
    day dropped when n is odd) and sign-test the paired differences —
    the O(n) trend detector beside q_stat_mannkendall's O(n²) S
    statistic, valid under any distribution.

    Exactness: the pairing index is an integer row_number over the
    calendar-bounded daily series (allowlisted); zero differences are
    excluded exactly (revenue is exact cents); S⁺, the deviation
    2S⁺−m, and the 5% normal-approximation decision
    10⁶·(2S⁺−m)² > 3841459·m are all integer arithmetic, z the one
    final float.  Same decision constants as q_stat_sign (shared
    module literals)."""
    d = _daily_xy(spark, sf_dir)
    w = Window.orderBy("day")
    idx = d.crossJoin(
        F.broadcast(d.agg(F.count("*").cast("long").alias("n")))
    ).select(
        "x",
        F.row_number().over(w).cast("long").alias("i"),
        "n",
    )
    a = idx.select(
        (F.col("i") + F.floor((F.col("n") + 1) / 2)).alias("j"),
        F.col("x").alias("xa"),
    )
    b = idx.select(F.col("i").alias("j"), F.col("x").alias("xb"))
    p = (
        a.join(b, "j")
        .select((F.col("xb") - F.col("xa")).alias("diff"))
        .where(F.col("diff") != 0)
    )
    s = p.agg(
        F.count("*").cast("long").alias("m"),
        F.coalesce(
            F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("s_plus"),
    )
    dev = 2 * F.col("s_plus") - F.col("m")
    return s.select(
        "m",
        "s_plus",
        dev.cast("long").alias("dev"),
        F.when(
            F.col("m") >= 1,
            F.round(dev / F.sqrt(F.col("m").cast("double")), 4),
        ).alias("z"),
        (
            F.lit(_Z2_CRIT_DEN).cast("long") * dev * dev
            > F.lit(_Z2_CRIT_NUM).cast("long") * F.col("m")
        ).alias("reject_05"),
    )


@query(
    "q_stat_gtest",
    oracle="""
    WITH cells AS (
        SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
          FROM cells GROUP BY 1),
    c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS nt FROM cells),
    terms AS (
        SELECT CAST(floor(2000000e0 * o
                          * ln(CAST(o AS DOUBLE) * nt
                               / (CAST(rt AS DOUBLE) * ct)))
                    AS BIGINT) AS t6
        FROM cells
        JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
        WHERE o > 0
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(t6) AS BIGINT) AS g6
        FROM terms
    )
    SELECT n_cells, g6,
           round(CAST(g6 AS DOUBLE) / 1000000e0, 4) AS g_stat_approx,
           CAST(g6 >= 36415028 AS BOOLEAN) AS reject_05
    FROM g
    """,
)
def q_stat_gtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood-ratio χ²) of independence for
    event_type × day-of-week — the information-theoretic twin of
    q_stat_chisq (G = 2·Σ O·ln(O/E) = 2N·MI; additive across
    partitions of the table where Pearson's χ² is not).

    Determinism: summing ~35 per-cell ln DOUBLEs is engine-order-
    dependent, so each cell's term 2·O·ln(O·N/(R·C)) is FLOORED at
    fixed-point 10⁶ into a BIGINT first (the q_ml_logloss trick — the
    floor absorbs sub-ulp libm drift) and the integer sum is exact;
    zero cells contribute exactly 0 (skipped — lim x·ln x = 0).  The
    5% decision compares the fixed-point sum against χ²crit(df=24) =
    36.41503 floored at the same scale.  The per-cell floor biases G
    down by < 35e-6 — documented spec.  Plan mirrors q_stat_chisq:
    one scan + marginal re-aggregates broadcast onto the 35-cell
    table."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("o"))
    r = cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("rt")
    )
    c = cells.groupBy("dow").agg(F.sum("o").cast("long").alias("ct"))
    n = cells.agg(F.sum("o").cast("long").alias("nt"))
    terms = (
        cells.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .where(F.col("o") > 0)
        .select(
            F.floor(
                F.lit(2000000.0)
                * F.col("o")
                * F.log(
                    F.col("o").cast("double")
                    * F.col("nt")
                    / (F.col("rt").cast("double") * F.col("ct"))
                )
            )
            .cast("long")
            .alias("t6")
        )
    )
    g = terms.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("t6").cast("long").alias("g6"),
    )
    return g.select(
        "n_cells",
        "g6",
        F.round(F.col("g6").cast("double") / 1000000.0, 4).alias(
            "g_stat_approx"
        ),
        (F.col("g6") >= F.lit(36415028).cast("long")).alias(
            "reject_05"
        ),
    )


@query(
    "q_stat_acf",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS HUGEINT) AS s,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        FROM d
    ),
    lags AS (SELECT unnest(generate_series(1, 7)) AS k),
    p AS (
        SELECT k,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS sxy,
               CAST(sum(a.x) AS HUGEINT) AS sh,
               CAST(sum(b.x) AS HUGEINT) AS st
        FROM lags
        JOIN d a ON true
        JOIN d b ON b.day = a.day + CAST(k AS INTEGER)
        GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag_days, cnt AS n_pairs,
           round(CAST(n * n * sxy - n * s * (sh + st) + cnt * s * s
                      AS DOUBLE)
                 / CAST(n * (n * sxx - s * s) AS DOUBLE), 6) AS acf
    FROM p CROSS JOIN g
    ORDER BY k
    """,
)
def q_stat_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily purchase revenue at lags
    1..7 — the per-lag table under q_stat_portmanteau's pooled
    Ljung–Box statistic (an analyst reads the weekly seasonality off
    r_7 directly; the portmanteau only says "some lag is nonzero").
    Uses the conventional estimator: full-series mean and variance,
    numerator over the n−k overlapping pairs.

    Exactness: the numerator and denominator are cleared of the
    rational mean by n²-scaling — num = n²Σxy − nS(Σhead+Σtail) +
    (n−k)S², den = n(nΣx² − S²) — both exact integers computed in
    DECIMAL(38,0) Spark-side / HUGEINT oracle-side (ADVICE r09: the
    old BIGINT form wraps already at ~366 days × 1e6-cent days — the
    JB/K² internal-wide-integer pattern, never DECIMAL in the OUTPUT
    schema; the 38-digit envelope covers ~1e5 days × 1e10-cent days);
    each r_k is ONE final division of the two exact integers cast to
    DOUBLE.  The lag pairing is a calendar-date equi-join (day + k),
    never a window.

    Scale: the 7-lag fan-out and pair joins live entirely on the
    calendar-bounded daily aggregate."""
    d = _daily_xy(spark, sf_dir).select(
        "day", F.expr("CAST(x AS DECIMAL(38,0))").alias("x")
    )
    g = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    a = d.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    p = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.expr("db = date_add(da, k)"))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(F.expr("xa * xb")).alias("sxy"),
            F.sum("xa").alias("sh"),
            F.sum("xb").alias("st"),
        )
    )
    num = F.expr(
        "CAST(n AS DECIMAL(38,0)) * n * sxy"
        " - CAST(n AS DECIMAL(38,0)) * s * (sh + st)"
        " + CAST(cnt AS DECIMAL(38,0)) * s * s"
    )
    den = F.expr(
        "CAST(n AS DECIMAL(38,0))"
        " * (CAST(n AS DECIMAL(38,0)) * sxx - s * s)"
    )
    return (
        p.crossJoin(F.broadcast(g))
        .select(
            F.col("k").cast("long").alias("lag_days"),
            F.col("cnt").alias("n_pairs"),
            F.round(num.cast("double") / den.cast("double"), 6).alias(
                "acf"
            ),
        )
        .orderBy("lag_days")
    )


#: Welch algebra over the exact per-group integers (n_k, s_k = Σx,
#: q_k = Σx²) for k = 3 groups, shared VERBATIM by both engines.
#: v_k = (n_k·q_k − s_k²)/(n_k(n_k−1)) in DOUBLE; w_k = n_k/v_k.
_WELCH_V = {
    i: (
        f"((CAST(n{i} AS DOUBLE) * q{i} - CAST(s{i} AS DOUBLE) * s{i})"
        f" / (CAST(n{i} AS DOUBLE) * (n{i} - 1)))"
    )
    for i in (1, 2, 3)
}
_WELCH_W = {i: f"(CAST(n{i} AS DOUBLE) / {_WELCH_V[i]})" for i in (1, 2, 3)}
_WELCH_WSUM = f"({_WELCH_W[1]} + {_WELCH_W[2]} + {_WELCH_W[3]})"
_WELCH_M = {i: f"(CAST(s{i} AS DOUBLE) / n{i})" for i in (1, 2, 3)}
_WELCH_MBAR = (
    f"(({_WELCH_W[1]} * {_WELCH_M[1]} + {_WELCH_W[2]} * {_WELCH_M[2]}"
    f" + {_WELCH_W[3]} * {_WELCH_M[3]}) / {_WELCH_WSUM})"
)
_WELCH_A = (
    "(("
    + " + ".join(
        f"{_WELCH_W[i]} * ({_WELCH_M[i]} - {_WELCH_MBAR})"
        f" * ({_WELCH_M[i]} - {_WELCH_MBAR})"
        for i in (1, 2, 3)
    )
    + ") / 2)"
)
_WELCH_C = (
    "("
    + " + ".join(
        f"(1 - {_WELCH_W[i]} / {_WELCH_WSUM})"
        f" * (1 - {_WELCH_W[i]} / {_WELCH_WSUM}) / (n{i} - 1)"
        for i in (1, 2, 3)
    )
    + ")"
)
_WELCH_F = f"({_WELCH_A} / (1 + CAST(0.25 AS DOUBLE) * {_WELCH_C}))"
_WELCH_DF2 = f"(8 / (3 * {_WELCH_C}))"


@query(
    "q_stat_welch",
    oracle=f"""
    WITH s AS (
        SELECT CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                               ELSE 3 END AS g,
               CAST(round(value * 100) AS BIGINT) AS x
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    piv AS (
        SELECT
            CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(coalesce(sum(CASE WHEN g = 1 THEN x END), 0) AS BIGINT)
                AS s1,
            CAST(coalesce(sum(CASE WHEN g = 1 THEN x * x END), 0)
                 AS BIGINT) AS q1,
            CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(coalesce(sum(CASE WHEN g = 2 THEN x END), 0) AS BIGINT)
                AS s2,
            CAST(coalesce(sum(CASE WHEN g = 2 THEN x * x END), 0)
                 AS BIGINT) AS q2,
            CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
            CAST(coalesce(sum(CASE WHEN g = 3 THEN x END), 0) AS BIGINT)
                AS s3,
            CAST(coalesce(sum(CASE WHEN g = 3 THEN x * x END), 0)
                 AS BIGINT) AS q3
        FROM s
    )
    SELECT n1, n2, n3,
           round({_WELCH_F}, 4) AS f_welch,
           round({_WELCH_DF2}, 2) AS df2
    FROM piv
    """,
)
def q_stat_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA across the three event
    populations (view / click / purchase ``value``) — the unequal-
    variance form that stays valid where q_stat_anova's pooled-
    variance F silently assumes homoscedasticity (Levene tests it;
    Welch is what you run when Levene rejects): F_W = Σw_k(m̄_k−m̄)²/
    (k−1) over the Satterthwaite correction, with the approximate
    denominator df.

    Determinism: the nine sufficient statistics (n, Σx, Σx² per
    group, exact cents) come from ONE scan; every mean/variance/
    weight and the F statistic are assembled from module-level
    expression strings shared VERBATIM by both engines (the variance
    products are quadratic-in-scale — the overflow rule keeps all
    algebra in DOUBLE; the 0.25 = 2(k−2)/(k²−1) and 8/3 constants
    are exact literals for k = 3)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(3)
        .alias("g"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("x"),
    )
    aggs = []
    for i in (1, 2, 3):
        aggs += [
            F.sum(F.when(F.col("g") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"n{i}"),
            F.coalesce(
                F.sum(F.when(F.col("g") == i, F.col("x"))), F.lit(0)
            )
            .cast("long")
            .alias(f"s{i}"),
            F.coalesce(
                F.sum(F.when(F.col("g") == i, F.col("x") * F.col("x"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"q{i}"),
        ]
    piv = s.agg(*aggs)
    return piv.select(
        "n1",
        "n2",
        "n3",
        F.round(F.expr(_WELCH_F), 4).alias("f_welch"),
        F.round(F.expr(_WELCH_DF2), 2).alias("df2"),
    )


@query(
    "q_stat_cohend",
    oracle="""
    WITH s AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS g,
               CAST(round(value * 100) AS BIGINT) AS x
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    piv AS (
        SELECT
            CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(coalesce(sum(CASE WHEN g = 1 THEN x END), 0) AS BIGINT)
                AS s1,
            CAST(coalesce(sum(CASE WHEN g = 1 THEN x * x END), 0)
                 AS BIGINT) AS q1,
            CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(coalesce(sum(CASE WHEN g = 2 THEN x END), 0) AS BIGINT)
                AS s2,
            CAST(coalesce(sum(CASE WHEN g = 2 THEN x * x END), 0)
                 AS BIGINT) AS q2
        FROM s
    )
    SELECT n1, n2,
           round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 / sqrt(((CAST(n1 AS DOUBLE) * q1
                          - CAST(s1 AS DOUBLE) * s1) / n1
                         + (CAST(n2 AS DOUBLE) * q2
                            - CAST(s2 AS DOUBLE) * s2) / n2)
                        / (n1 + n2 - 2)), 4) AS cohen_d,
           round(((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                  / sqrt(((CAST(n1 AS DOUBLE) * q1
                           - CAST(s1 AS DOUBLE) * s1) / n1
                          + (CAST(n2 AS DOUBLE) * q2
                             - CAST(s2 AS DOUBLE) * s2) / n2)
                         / (n1 + n2 - 2)))
                 * (1 - 3e0 / (4 * (n1 + n2) - 9)), 4) AS hedges_g
    FROM piv
    """,
)
def q_stat_cohend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g for purchase-vs-view ``value`` — the
    standardized mean difference that turns q_stat_ttest's "is there
    an effect" into "how big is it" (the number meta-analyses pool),
    with Hedges' small-sample bias correction J = 1 − 3/(4N−9).

    Determinism: the six sufficient statistics are exact BIGINTs from
    ONE scan; the pooled SD uses the identity (n−1)v = (nΣx² −
    (Σx)²)/n so d is a single shared DOUBLE expression over exact
    integers (quadratic products in DOUBLE per the overflow rule);
    J is an exact rational of integers."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(2)
        .alias("g"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("x"),
    )
    aggs = []
    for i in (1, 2):
        aggs += [
            F.sum(F.when(F.col("g") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"n{i}"),
            F.coalesce(
                F.sum(F.when(F.col("g") == i, F.col("x"))), F.lit(0)
            )
            .cast("long")
            .alias(f"s{i}"),
            F.coalesce(
                F.sum(F.when(F.col("g") == i, F.col("x") * F.col("x"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"q{i}"),
        ]
    piv = s.agg(*aggs)
    d_expr = (
        "(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
        " / sqrt(((CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)"
        " / n1 + (CAST(n2 AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2)"
        " / n2) / (n1 + n2 - 2))"
    )
    return piv.select(
        "n1",
        "n2",
        F.round(F.expr(d_expr), 4).alias("cohen_d"),
        F.round(
            F.expr(f"({d_expr}) * (1 - 3e0 / (4 * (n1 + n2) - 9))"), 4
        ).alias("hedges_g"),
    )


@query(
    "q_stat_2prop",
    oracle="""
    WITH u AS (
        SELECT (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                ::BIGINT % 2) AS grp,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS conv
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT
            CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n1,
            CAST(coalesce(sum(CASE WHEN grp = 0 THEN conv END), 0)
                 AS BIGINT) AS x1,
            CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n2,
            CAST(coalesce(sum(CASE WHEN grp = 1 THEN conv END), 0)
                 AS BIGINT) AS x2
        FROM u
    )
    SELECT n1, x1, n2, x2,
           CASE WHEN x1 + x2 > 0 AND x1 + x2 < n1 + n2 THEN
               round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                     / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                            * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                            * (1e0 / n1 + 1e0 / n2)), 4) END AS z,
           CAST(1000000e0 * (CAST(x1 AS DOUBLE) * n2
                             - CAST(x2 AS DOUBLE) * n1)
                          * (CAST(x1 AS DOUBLE) * n2
                             - CAST(x2 AS DOUBLE) * n1)
                          * (n1 + n2)
                > 3841459e0 * n1 * n2 * (x1 + x2)
                           * (n1 + n2 - x1 - x2) AS BOOLEAN)
               AS reject_05
    FROM c
    """,
)
def q_stat_2prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test on user conversion (any purchase)
    between the deterministic md5-parity arms — the A/B readout for a
    BINARY outcome, beside CUPED/t-test's continuous one: z =
    (p̂₁−p̂₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) with the pooled p̂.

    Determinism: per-arm user and converter counts are exact BIGINTs
    (one keyed aggregate + one 1-row pivot); z is one shared DOUBLE
    expression, and the 5% decision is the cross-multiplied form
    10⁶·(x₁n₂−x₂n₁)²·N > z²crit·n₁n₂·x·(N−x) evaluated in DOUBLE
    (the squared cross product is quadratic-in-corpus — the overflow
    rule bans BIGINT there) with the identical literal in both
    engines.  A degenerate pool (0% or 100% conversion) yields NULL z
    through an exact integer guard — never a division error (this
    corpus converts every active user at small SF)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("conv")
    ).select(
        F.expr(
            "pmod(cast(conv(substr(md5(cast(cast(user_id as string)"
            " as binary)), 1, 15), 16, 10) as bigint), 2)"
        ).alias("grp"),
        "conv",
    )
    c = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.coalesce(
            F.sum(F.when(F.col("grp") == 0, F.col("conv"))), F.lit(0)
        )
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.coalesce(
            F.sum(F.when(F.col("grp") == 1, F.col("conv"))), F.lit(0)
        )
        .cast("long")
        .alias("x2"),
    )
    return c.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.expr(
            "CASE WHEN x1 + x2 > 0 AND x1 + x2 < n1 + n2 THEN"
            " round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)"
            " / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
            " * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
            " * (1e0 / n1 + 1e0 / n2)), 4) END"
        ).alias("z"),
        F.expr(
            "1000000e0 * (CAST(x1 AS DOUBLE) * n2"
            " - CAST(x2 AS DOUBLE) * n1)"
            " * (CAST(x1 AS DOUBLE) * n2 - CAST(x2 AS DOUBLE) * n1)"
            " * (n1 + n2)"
            " > 3841459e0 * n1 * n2 * (x1 + x2) * (n1 + n2 - x1 - x2)"
        ).alias("reject_05"),
    )


@query(
    "q_stat_cmh",
    oracle="""
    WITH s AS (
        SELECT dayofweek(ts) + 1 AS dow,
               CAST(event_id % 2 AS BIGINT) AS arm,
               CASE WHEN value > 50 THEN 1 ELSE 0 END AS hit
        FROM events WHERE event_type = 'purchase'
    ),
    strata AS (
        SELECT dow,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS r1,
               CAST(sum(hit) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN arm = 0 THEN hit ELSE 0 END)
                    AS BIGINT) AS a
        FROM s GROUP BY dow
    ),
    terms AS (
        SELECT dow, a,
               CAST(r1 AS DOUBLE) * c1 / n AS e,
               CASE WHEN n > 1 THEN
                   CAST(r1 AS DOUBLE) * (n - r1) * c1 * (n - c1)
                   / (CAST(n AS DOUBLE) * n * (n - 1))
               ELSE 0e0 END AS v
        FROM strata
    ),
    cum AS (
        SELECT dow,
               sum(a) OVER (ORDER BY dow ROWS UNBOUNDED PRECEDING)
                   AS asum,
               sum(e) OVER (ORDER BY dow ROWS UNBOUNDED PRECEDING)
                   AS esum,
               sum(v) OVER (ORDER BY dow ROWS UNBOUNDED PRECEDING)
                   AS vsum
        FROM terms
    )
    SELECT CAST(asum AS BIGINT) AS a_total,
           round(esum, 4) AS e_total,
           round(vsum, 4) AS v_total,
           CASE WHEN vsum > 0 THEN
               round(greatest(abs(asum - esum) - 0.5e0, 0e0)
                     * greatest(abs(asum - esum) - 0.5e0, 0e0)
                     / vsum, 4) END AS cmh_chi2,
           CASE WHEN vsum > 0 THEN
               CAST(greatest(abs(asum - esum) - 0.5e0, 0e0)
                    * greatest(abs(asum - esum) - 0.5e0, 0e0)
                    > CAST(3.841459 AS DOUBLE) * vsum AS BOOLEAN)
               ELSE FALSE END AS reject_05
    FROM cum WHERE dow = (SELECT max(dow) FROM terms)
    """,
)
def q_stat_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Mantel–Haenszel test of conditional independence
    across day-of-week strata: does the event-id-parity "arm" shift
    the P(value > 50) outcome AFTER controlling for the weekday mix —
    the stratified 2×2 test that catches Simpson reversals a pooled
    q_stat_chisq would hide, with the standard continuity correction
    (|ΣA − ΣE| − ½)²/ΣV.

    Determinism: per-stratum cell counts are exact BIGINTs from ONE
    scan; the rational E and V terms are per-stratum DOUBLEs summed
    via the ORDERED 7-row dow prefix (identical addition order both
    engines — the fixed-stratum analogue of the survival-family
    discipline), with the statistic read off the last stratum.  The
    5% decision compares against z²crit·ΣV in DOUBLE with the shared
    literal."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "purchase").select(
        F.dayofweek("ts").alias("dow"),
        (F.col("event_id") % 2).cast("long").alias("arm"),
        F.when(F.col("value") > 50, 1).otherwise(0).alias("hit"),
    )
    strata = s.groupBy("dow").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("r1"),
        F.sum("hit").cast("long").alias("c1"),
        F.sum(F.when(F.col("arm") == 0, F.col("hit")).otherwise(0))
        .cast("long")
        .alias("a"),
    )
    terms = strata.select(
        "dow",
        "a",
        (F.col("r1").cast("double") * F.col("c1") / F.col("n")).alias(
            "e"
        ),
        F.when(
            F.col("n") > 1,
            F.col("r1").cast("double")
            * (F.col("n") - F.col("r1"))
            * F.col("c1")
            * (F.col("n") - F.col("c1"))
            / (
                F.col("n").cast("double")
                * F.col("n")
                * (F.col("n") - 1)
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    w_cum = Window.orderBy("dow").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = terms.select(
        "dow",
        F.sum("a").over(w_cum).alias("asum"),
        F.sum("e").over(w_cum).alias("esum"),
        F.sum("v").over(w_cum).alias("vsum"),
    )
    dmax = terms.agg(F.max("dow").alias("dm"))
    dev = F.greatest(
        F.abs(F.col("asum") - F.col("esum")) - F.lit(0.5), F.lit(0.0)
    )
    return (
        cum.crossJoin(F.broadcast(dmax))
        .where(F.col("dow") == F.col("dm"))
        .select(
            F.col("asum").cast("long").alias("a_total"),
            F.round("esum", 4).alias("e_total"),
            F.round("vsum", 4).alias("v_total"),
            F.when(
                F.col("vsum") > 0,
                F.round(dev * dev / F.col("vsum"), 4),
            ).alias("cmh_chi2"),
            F.when(
                F.col("vsum") > 0,
                dev * dev
                > F.expr("CAST(3.841459 AS DOUBLE)") * F.col("vsum"),
            )
            .otherwise(F.lit(False))
            .alias("reject_05"),
        )
    )


@query(
    "q_stat_ks1",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE event_type = 'purchase'
    ),
    pv AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY vc
    ),
    cum AS (SELECT vc, c, sum(c) OVER (ORDER BY vc) AS cumc FROM pv),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pv),
    d AS (
        SELECT n,
               CAST(max(10000 * cumc - n * vc) AS BIGINT) AS dp_num,
               CAST(max(n * vc - 10000 * (cumc - c)) AS BIGINT)
                   AS dm_num
        FROM cum CROSS JOIN tot
        GROUP BY n
    )
    SELECT n, dp_num, dm_num,
           round(CAST(greatest(dp_num, dm_num) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * 10000), 6) AS ks_d,
           CAST(1000000e0 * CAST(greatest(dp_num, dm_num) AS DOUBLE)
                          * greatest(dp_num, dm_num)
                > 1844164e0 * 100000000 * n AS BOOLEAN) AS reject_05
    FROM d
    """,
)
def q_stat_ks1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample Kolmogorov–Smirnov goodness-of-fit of purchase
    values against Uniform(0, 100] (the generator's nominal
    distribution): D = sup|F̂ − F| evaluated at both sides of every
    jump — the distribution-fit companion to the two-sample
    q_stat_ks (is the data what the spec SAYS it is, not just
    self-consistent).

    Determinism: with exact-cent values the uniform CDF at a jump is
    the exact rational v/10⁴, so both one-sided sups clear to exact
    integer numerators — D⁺ = max(10⁴·cum − n·v), D⁻ = max(n·v −
    10⁴·(cum−c)) — off the value-grain prefix scan; D is ONE final
    division and the 5% decision 10⁶·D_num² > 1.358²·10⁶·10⁸·n
    squares in DOUBLE (overflow rule) with shared literals.

    Scale: one value-grain prefix scan (bucketed, never a global
    window) + a 1-row max."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "purchase").select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc")
    )
    pv = s.groupBy("vc").agg(F.count("*").cast("long").alias("c"))
    cum = bucketed_running_sum(
        pv,
        bucket=F.floor(F.col("vc") / F.lit(2500)).cast("long"),
        order_cols=[F.col("vc")],
        sums={"cumc": F.col("c")},
    )
    tot = pv.agg(F.sum("c").cast("long").alias("n"))
    d = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.max(10000 * F.col("cumc") - F.col("n") * F.col("vc"))
            .cast("long")
            .alias("dp_num"),
            F.max(
                F.col("n") * F.col("vc")
                - 10000 * (F.col("cumc") - F.col("c"))
            )
            .cast("long")
            .alias("dm_num"),
        )
    )
    dnum = F.greatest(F.col("dp_num"), F.col("dm_num"))
    return d.select(
        "n",
        "dp_num",
        "dm_num",
        F.round(
            dnum.cast("double") / (F.col("n").cast("double") * 10000),
            6,
        ).alias("ks_d"),
        (
            F.lit(1000000.0) * dnum.cast("double") * dnum
            > F.lit(1844164.0) * F.lit(100000000) * F.col("n")
        ).alias("reject_05"),
    )


@query(
    "q_stat_jackknife",
    oracle=f"""
    WITH d AS ({_DAILY_XY_SQL}),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy
        FROM d
    ),
    loo AS (
        SELECT day,
               CASE WHEN sy - y <> 0 THEN
                   CAST(sx - x AS DOUBLE) / (sy - y) END AS th
        FROM d CROSS JOIN tot
    ),
    cum AS (
        SELECT day,
               sum(th) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS sth,
               sum(th * th) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS sth2
        FROM loo WHERE th IS NOT NULL
    ),
    fin AS (
        SELECT n, sx, sy, sth, sth2
        FROM cum CROSS JOIN tot
        WHERE day = (SELECT max(day) FROM loo WHERE th IS NOT NULL)
    )
    SELECT n AS n_days,
           round(CAST(sx AS DOUBLE) / sy, 6) AS ratio_cents_per_view,
           round(sqrt(greatest((CAST(n AS DOUBLE) - 1) / n
                               * (sth2 - sth * sth / n), 0e0)), 6)
               AS jackknife_se,
           round(CAST(sx AS DOUBLE) / sy
                 - 196e0 / 100
                 * sqrt(greatest((CAST(n AS DOUBLE) - 1) / n
                                 * (sth2 - sth * sth / n), 0e0)), 6)
               AS ci_lo,
           round(CAST(sx AS DOUBLE) / sy
                 + 196e0 / 100
                 * sqrt(greatest((CAST(n AS DOUBLE) - 1) / n
                                 * (sth2 - sth * sth / n), 0e0)), 6)
               AS ci_hi
    FROM fin
    """,
)
def q_stat_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-day-out jackknife standard error for the RATIO
    estimator revenue-per-view (Σx/Σy) — the uncertainty machinery
    for a statistic with no closed-form SE (a ratio of correlated
    sums), where q_stat_bootstrap resamples and the jackknife gives
    the deterministic delete-1 answer: SE² = (n−1)/n·Σ(θ̂₍ᵢ₎−θ̄)².

    Determinism: each leave-one-out replicate θ̂₍ᵢ₎ = (S−xᵢ)/(T−yᵢ)
    is ONE DOUBLE division of exact integers (zero-denominator days
    excluded exactly); Σθ and Σθ² accumulate via the ORDERED
    day-window prefix (identical addition order both engines) and the
    SE uses the Σθ²−(Σθ)²/n identity with a greatest(·,0)
    cancellation guard; z = 196/100 exact.  Plan: one keyed date
    aggregate + calendar-bounded prefix windows (allowlisted)."""
    d = _daily_xy(spark, sf_dir)
    tot = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    loo = (
        d.crossJoin(F.broadcast(tot))
        .select(
            "day",
            "n",
            "sx",
            "sy",
            F.when(
                (F.col("sy") - F.col("y")) != 0,
                (F.col("sx") - F.col("x")).cast("double")
                / (F.col("sy") - F.col("y")),
            ).alias("th"),
        )
        .where(F.col("th").isNotNull())
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = loo.select(
        "day",
        "n",
        "sx",
        "sy",
        F.sum("th").over(w_cum).alias("sth"),
        F.sum(F.col("th") * F.col("th")).over(w_cum).alias("sth2"),
    )
    dmax = loo.agg(F.max("day").alias("dm"))
    se = F.sqrt(
        F.greatest(
            (F.col("n").cast("double") - 1)
            / F.col("n")
            * (
                F.col("sth2")
                - F.col("sth") * F.col("sth") / F.col("n")
            ),
            F.lit(0.0),
        )
    )
    ratio = F.col("sx").cast("double") / F.col("sy")
    z = F.lit(196.0) / 100
    return (
        cum.crossJoin(F.broadcast(dmax))
        .where(F.col("day") == F.col("dm"))
        .select(
            F.col("n").alias("n_days"),
            F.round(ratio, 6).alias("ratio_cents_per_view"),
            F.round(se, 6).alias("jackknife_se"),
            F.round(ratio - z * se, 6).alias("ci_lo"),
            F.round(ratio + z * se, 6).alias("ci_hi"),
        )
    )


@query(
    "q_stat_meta",
    oracle="""
    WITH s AS (
        SELECT dayofweek(ts) + 1 AS dow,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS g,
               CAST(round(value * 100) AS BIGINT) AS x
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    strata AS (
        SELECT dow,
            CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n1,
            CAST(coalesce(sum(CASE WHEN g = 1 THEN x END), 0) AS BIGINT)
                AS s1,
            CAST(coalesce(sum(CASE WHEN g = 1 THEN x * x END), 0)
                 AS BIGINT) AS q1,
            CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS n2,
            CAST(coalesce(sum(CASE WHEN g = 2 THEN x END), 0) AS BIGINT)
                AS s2,
            CAST(coalesce(sum(CASE WHEN g = 2 THEN x * x END), 0)
                 AS BIGINT) AS q2
        FROM s GROUP BY dow
    ),
    terms AS (
        SELECT dow,
               CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS d,
               (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
                   / (CAST(n1 AS DOUBLE) * (n1 - 1)) / n1
               + (CAST(n2 AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2)
                   / (CAST(n2 AS DOUBLE) * (n2 - 1)) / n2 AS v
        FROM strata WHERE n1 > 1 AND n2 > 1
    ),
    cum AS (
        SELECT dow,
               count(*) OVER (ORDER BY dow ROWS UNBOUNDED PRECEDING)
                   AS k,
               sum(1 / v) OVER (ORDER BY dow ROWS UNBOUNDED PRECEDING)
                   AS sw,
               sum(d / v) OVER (ORDER BY dow ROWS UNBOUNDED PRECEDING)
                   AS swd,
               sum(d * d / v) OVER (ORDER BY dow
                   ROWS UNBOUNDED PRECEDING) AS swd2
        FROM terms WHERE v > 0
    )
    SELECT CAST(k AS BIGINT) AS n_studies,
           round(swd / sw, 4) AS pooled_diff_cents,
           round(sqrt(1 / sw), 4) AS pooled_se,
           round(swd2 - swd * swd / sw, 4) AS cochran_q,
           round(greatest((swd2 - swd * swd / sw - (k - 1))
                          / (swd2 - swd * swd / sw), 0e0), 4)
               AS i_squared
    FROM cum WHERE dow = (SELECT max(dow) FROM terms WHERE v > 0)
    """,
)
def q_stat_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-effect (inverse-variance) meta-analysis pooling the
    purchase-minus-view mean value difference across the seven
    day-of-week "studies": pooled θ = Σwd/Σw (w = 1/Var(d)), its SE,
    Cochran's Q heterogeneity statistic and I² — the meta-analytic
    machinery that says both WHAT the pooled effect is and whether
    the strata even agree enough to pool (high I² → the pooled number
    is a fiction).

    Determinism: per-stratum sufficient statistics are exact BIGINTs
    from ONE scan; d and Var(d) = v₁/n₁ + v₂/n₂ are per-stratum
    DOUBLEs, and the weighted sums Σw, Σwd, Σwd² accumulate via the
    ORDERED 7-row dow prefix (the q_stat_cmh discipline); Q uses the
    Σwd² − (Σwd)²/Σw identity and I² is clamped at 0.  Degenerate
    strata (n ≤ 1 or zero variance) are excluded exactly."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("purchase", "view")).select(
        F.dayofweek("ts").alias("dow"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(2)
        .alias("g"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("x"),
    )
    aggs = []
    for i in (1, 2):
        aggs += [
            F.sum(F.when(F.col("g") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"n{i}"),
            F.coalesce(
                F.sum(F.when(F.col("g") == i, F.col("x"))), F.lit(0)
            )
            .cast("long")
            .alias(f"s{i}"),
            F.coalesce(
                F.sum(F.when(F.col("g") == i, F.col("x") * F.col("x"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"q{i}"),
        ]
    strata = s.groupBy("dow").agg(*aggs)
    terms = strata.where(
        (F.col("n1") > 1) & (F.col("n2") > 1)
    ).select(
        "dow",
        (
            F.col("s1").cast("double") / F.col("n1")
            - F.col("s2").cast("double") / F.col("n2")
        ).alias("d"),
        (
            (
                F.col("n1").cast("double") * F.col("q1")
                - F.col("s1").cast("double") * F.col("s1")
            )
            / (F.col("n1").cast("double") * (F.col("n1") - 1))
            / F.col("n1")
            + (
                F.col("n2").cast("double") * F.col("q2")
                - F.col("s2").cast("double") * F.col("s2")
            )
            / (F.col("n2").cast("double") * (F.col("n2") - 1))
            / F.col("n2")
        ).alias("v"),
    )
    pos = terms.where(F.col("v") > 0)
    w_cum = Window.orderBy("dow").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = pos.select(
        "dow",
        F.count("*").over(w_cum).alias("k"),
        F.sum(F.lit(1) / F.col("v")).over(w_cum).alias("sw"),
        F.sum(F.col("d") / F.col("v")).over(w_cum).alias("swd"),
        F.sum(F.col("d") * F.col("d") / F.col("v"))
        .over(w_cum)
        .alias("swd2"),
    )
    dmax = pos.agg(F.max("dow").alias("dm"))
    q_stat = F.col("swd2") - F.col("swd") * F.col("swd") / F.col("sw")
    return (
        cum.crossJoin(F.broadcast(dmax))
        .where(F.col("dow") == F.col("dm"))
        .select(
            F.col("k").cast("long").alias("n_studies"),
            F.round(F.col("swd") / F.col("sw"), 4).alias(
                "pooled_diff_cents"
            ),
            F.round(F.sqrt(F.lit(1) / F.col("sw")), 4).alias(
                "pooled_se"
            ),
            F.round(q_stat, 4).alias("cochran_q"),
            F.round(
                F.greatest(
                    (q_stat - (F.col("k") - 1)) / q_stat, F.lit(0.0)
                ),
                4,
            ).alias("i_squared"),
        )
    )


#: Dunn post-hoc pieces over the exact Kruskal rank machinery, shared
#: VERBATIM: mean ranks from the 2x rank sums, tie-corrected pooled
#: variance sigma2 = (N(N+1)/12 - tie/(12(N-1))) * (1/ni + 1/nj) --
#: all algebra DOUBLE over exact BIGINTs (overflow rule).
_DUNN_S2 = (
    "(CAST(n AS DOUBLE) * (n + 1) / 12"
    " - CAST(tie_num AS DOUBLE) / (12 * (n - 1)))"
)


def _dunn_z(i: int, j: int) -> str:
    return (
        f"((CAST(r{i}_2 AS DOUBLE) / (2 * n{i})"
        f" - CAST(r{j}_2 AS DOUBLE) / (2 * n{j}))"
        f" / sqrt({_DUNN_S2} * (1e0 / n{i} + 1e0 / n{j})))"
    )


@query(
    "q_stat_dunn",
    oracle=f"""
    WITH s AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g3
        FROM events WHERE event_type IN ('purchase', 'view', 'click')
    ),
    pv AS (
        SELECT value, count(*) AS ct,
               CAST(sum(g1) AS BIGINT) AS c1t,
               CAST(sum(g2) AS BIGINT) AS c2t,
               CAST(sum(g3) AS BIGINT) AS c3t
        FROM s GROUP BY 1
    ),
    cum AS (
        SELECT ct, c1t, c2t, c3t,
               sum(ct) OVER (ORDER BY value) AS cum_t
        FROM pv
    ),
    rsum AS (
        SELECT CAST(sum(c1t * (2 * cum_t - ct + 1)) AS BIGINT) AS r1_2,
               CAST(sum(c2t * (2 * cum_t - ct + 1)) AS BIGINT) AS r2_2,
               CAST(sum(c3t * (2 * cum_t - ct + 1)) AS BIGINT) AS r3_2,
               CAST(sum(ct * ct * ct - ct) AS BIGINT) AS tie_num
        FROM cum
    ),
    tot AS (
        SELECT CAST(sum(c1t) AS BIGINT) AS n1,
               CAST(sum(c2t) AS BIGINT) AS n2,
               CAST(sum(c3t) AS BIGINT) AS n3,
               CAST(sum(ct) AS BIGINT) AS n
        FROM pv
    )
    SELECT n1, n2, n3,
           round({_dunn_z(1, 2)}, 4) AS z_purchase_view,
           round({_dunn_z(1, 3)}, 4) AS z_purchase_click,
           round({_dunn_z(2, 3)}, 4) AS z_view_click,
           CAST(abs({_dunn_z(1, 2)}) > CAST(2.393980 AS DOUBLE)
                AS BOOLEAN) AS sig_purchase_view,
           CAST(abs({_dunn_z(1, 3)}) > CAST(2.393980 AS DOUBLE)
                AS BOOLEAN) AS sig_purchase_click,
           CAST(abs({_dunn_z(2, 3)}) > CAST(2.393980 AS DOUBLE)
                AS BOOLEAN) AS sig_view_click
    FROM rsum CROSS JOIN tot
    """,
)
def q_stat_dunn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons after q_stat_kruskal:
    which of the three group pairs actually differ, at the
    Bonferroni-adjusted 5% level (alpha/3 two-sided, z-crit 2.39398)
    — the step an analyst takes the moment Kruskal-Wallis rejects
    (H says "some pair differs"; Dunn names it), with the standard
    tie-corrected pooled variance.

    Determinism: reuses the exact Kruskal machinery verbatim — 2x
    tie-averaged rank sums and the tie term are exact BIGINTs off the
    bucketed prefix scan; each z and its decision are fixed shared
    DOUBLE expressions (mean-rank differences over the pooled sigma),
    the critical value an exact literal.  One row, all three pairs —
    no nullable boolean (every z is defined whenever all groups are
    nonempty on this corpus; an empty group yields NULLs uniformly in
    both engines through the same division)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(
        F.col("event_type").isin("purchase", "view", "click")
    ).select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g1"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g2"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g3"),
    )
    pv = s.groupBy("value").agg(
        F.count("*").alias("ct"),
        F.sum("g1").cast("long").alias("c1t"),
        F.sum("g2").cast("long").alias("c2t"),
        F.sum("g3").cast("long").alias("c3t"),
    )
    cum = bucketed_running_sum(
        pv,
        bucket=F.floor(F.col("value") / F.lit(25.0)).cast("long"),
        order_cols=[F.col("value")],
        sums={"cum_t": F.col("ct")},
    )
    mid2 = 2 * F.col("cum_t") - F.col("ct") + 1
    rsum = cum.agg(
        F.sum(F.col("c1t") * mid2).cast("long").alias("r1_2"),
        F.sum(F.col("c2t") * mid2).cast("long").alias("r2_2"),
        F.sum(F.col("c3t") * mid2).cast("long").alias("r3_2"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("tie_num"),
    )
    tot = pv.agg(
        F.sum("c1t").cast("long").alias("n1"),
        F.sum("c2t").cast("long").alias("n2"),
        F.sum("c3t").cast("long").alias("n3"),
        F.sum("ct").cast("long").alias("n"),
    )
    out = [F.col("n1"), F.col("n2"), F.col("n3")]
    for (i, j), name in (
        ((1, 2), "purchase_view"),
        ((1, 3), "purchase_click"),
        ((2, 3), "view_click"),
    ):
        out.append(
            F.expr(f"round({_dunn_z(i, j)}, 4)").alias(f"z_{name}")
        )
    for (i, j), name in (
        ((1, 2), "purchase_view"),
        ((1, 3), "purchase_click"),
        ((2, 3), "view_click"),
    ):
        out.append(
            F.expr(
                f"abs({_dunn_z(i, j)}) > CAST(2.393980 AS DOUBLE)"
            ).alias(f"sig_{name}")
        )
    return rsum.crossJoin(F.broadcast(tot)).select(*out)


@query(
    "q_stat_ccc",
    oracle="""
    WITH j AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
               CAST((n_chars + 3) // 4 AS BIGINT) AS y
        FROM documents
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM j
    )
    SELECT n, sx, sy,
           round(2 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    + (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                    + CAST(sx - sy AS DOUBLE) * (sx - sy)), 6) AS ccc,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS pearson_r
    FROM m
    """,
)
def q_stat_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin's concordance correlation coefficient between the two
    continuous document raters (token count vs quarter-character
    count, the q_stat_icc frame): CCC = 2s_xy/(s_x² + s_y² +
    (m_x−m_y)²) — agreement WITH the 45-degree line, not just linear
    association (Pearson's r is emitted beside it: r high + CCC low =
    correlated but biased raters, the case ICC averages away).

    Determinism: the n²-scaling cancels throughout, so CCC =
    2(nΣxy − ΣxΣy)/((nΣx²−Σx²ᵗᵒᵗ) + (nΣy²−Σy²ᵗᵒᵗ) + (Σx−Σy)²) over
    six exact BIGINTs from ONE scan; both outputs are single shared
    DOUBLE expressions (quadratic products — overflow rule)."""
    d = load_table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("long").alias("x"),
        F.floor((F.col("n_chars") + 3) / 4).cast("long").alias("y"),
    )
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return m.select(
        "n",
        "sx",
        "sy",
        F.expr(
            "round(2 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            " + (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
            " + CAST(sx - sy AS DOUBLE) * (sx - sy)), 6)"
        ).alias("ccc"),
        F.expr(
            "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            " * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),"
            " 6)"
        ).alias("pearson_r"),
    )


@query(
    "q_stat_tost_prop",
    oracle="""
    WITH s AS (
        SELECT CAST(event_id % 2 AS BIGINT) AS arm,
               CASE WHEN value > 50 THEN 1 ELSE 0 END AS hit
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n1,
            CAST(coalesce(sum(CASE WHEN arm = 0 THEN hit END), 0)
                 AS BIGINT) AS x1,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n2,
            CAST(coalesce(sum(CASE WHEN arm = 1 THEN hit END), 0)
                 AS BIGINT) AS x2
        FROM s
    ),
    z AS (
        SELECT n1, x1, n2, x2,
               CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2 AS d,
               sqrt(CAST(x1 AS DOUBLE) / n1
                    * (1 - CAST(x1 AS DOUBLE) / n1) / n1
                    + CAST(x2 AS DOUBLE) / n2
                    * (1 - CAST(x2 AS DOUBLE) / n2) / n2) AS se
        FROM c
    )
    SELECT n1, x1, n2, x2,
           round(d, 4) AS diff,
           CASE WHEN se > 0 THEN round((d + 5e-2) / se, 4) END AS z_low,
           CASE WHEN se > 0 THEN round((d - 5e-2) / se, 4) END
               AS z_high,
           CAST(coalesce(
               se > 0 AND (d + 5e-2) / se > CAST(1.644854 AS DOUBLE)
                      AND (d - 5e-2) / se < -CAST(1.644854 AS DOUBLE),
               FALSE) AS BOOLEAN) AS equivalent_05
    FROM z
    """,
)
def q_stat_tost_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test for two proportions (margin ±5 points) on
    the event-parity arms' P(value > 50) — the proportions companion
    to q_stat_tost's means version: a non-significant q_stat_2prop
    does NOT show the arms are the same; TOST's two one-sided tests
    against the ±δ margin do (the A/A-test / no-regression-launch
    readout).

    Determinism: arm counts are exact BIGINTs from ONE scan; the
    difference, the UNPOOLED standard error (the correct TOST form),
    and both one-sided z's are shared DOUBLE expressions with δ = 5e-2
    and z₀.₀₅ = 1.644854 as exact literals; the equivalence verdict is
    coalesced to FALSE on a degenerate SE (the nullable-boolean NaN
    trap, documented at q_ml_hosmer)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "purchase").select(
        (F.col("event_id") % 2).cast("long").alias("arm"),
        F.when(F.col("value") > 50, 1).otherwise(0).alias("hit"),
    )
    c = s.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("hit"))), F.lit(0)
        )
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("hit"))), F.lit(0)
        )
        .cast("long")
        .alias("x2"),
    )
    d = F.col("x1").cast("double") / F.col("n1") - F.col("x2").cast(
        "double"
    ) / F.col("n2")
    se = F.sqrt(
        F.col("x1").cast("double")
        / F.col("n1")
        * (1 - F.col("x1").cast("double") / F.col("n1"))
        / F.col("n1")
        + F.col("x2").cast("double")
        / F.col("n2")
        * (1 - F.col("x2").cast("double") / F.col("n2"))
        / F.col("n2")
    )
    z = c.select("n1", "x1", "n2", "x2", d.alias("d"), se.alias("se"))
    crit = F.expr("CAST(1.644854 AS DOUBLE)")
    return z.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round("d", 4).alias("diff"),
        F.when(
            F.col("se") > 0,
            F.round((F.col("d") + F.lit(5e-2)) / F.col("se"), 4),
        ).alias("z_low"),
        F.when(
            F.col("se") > 0,
            F.round((F.col("d") - F.lit(5e-2)) / F.col("se"), 4),
        ).alias("z_high"),
        F.coalesce(
            (F.col("se") > 0)
            & ((F.col("d") + F.lit(5e-2)) / F.col("se") > crit)
            & ((F.col("d") - F.lit(5e-2)) / F.col("se") < -crit),
            F.lit(False),
        ).alias("equivalent_05"),
    )


@query(
    "q_stat_seasonal_mk",
    oracle="""
    WITH d AS (
        SELECT dayofweek(ts) + 1 AS dow, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    per AS (
        SELECT a.dow,
               CAST(sum(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_g,
               CAST(max(cnt.n_g * (cnt.n_g - 1) * (2 * cnt.n_g + 5))
                    AS BIGINT) AS var18_g
        FROM d a
        JOIN d b ON b.dow = a.dow AND b.day > a.day
        JOIN (SELECT dow, CAST(count(*) AS BIGINT) AS n_g
              FROM d GROUP BY dow) cnt ON cnt.dow = a.dow
        GROUP BY a.dow
    ),
    tot AS (
        SELECT CAST(sum(s_g) AS BIGINT) AS s,
               CAST(sum(var18_g) AS BIGINT) AS var18,
               CAST(count(*) AS BIGINT) AS n_seasons
        FROM per
    )
    SELECT n_seasons, s AS s_stat, var18,
           round(CASE WHEN s = 0 THEN 0e0
                      ELSE (s - sign(s))
                           / sqrt(var18 / 18e0) END, 4) AS z_stat,
           CAST(18000000 * (abs(s) - 1) * (abs(s) - 1)
                > 3841459 * var18 AND s <> 0 AS BOOLEAN) AS reject_05
    FROM tot
    """,
)
def q_stat_seasonal_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann–Kendall trend test (Hirsch–Slack) on daily
    purchase revenue with day-of-week seasons: the S statistic and
    variance are computed WITHIN each weekday and summed — so a
    strong weekly cycle cannot masquerade as (or mask) a monotone
    trend the way it can in the plain q_stat_mannkendall (only
    same-weekday pairs are compared).

    Determinism: per-season S_g and the 18×-scaled variances
    n_g(n_g−1)(2n_g+5) are exact BIGINTs (exact-cent sign
    comparisons; ties-in-value correction omitted — exact-cent daily
    sums are effectively tie-free, documented); the totals are exact
    integer sums, z is one final float with the continuity
    correction, and the 5% decision is the integer
    cross-multiplication 18·10⁶·(|S|−1)² > 3841459·Var18.

    Scale: the pair joins run per-season on the calendar-bounded
    day table (≤ (days/7)² pairs per season)."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(
            F.dayofweek("ts").alias("dow"),
            F.to_date("ts").alias("day"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    a = d.select(
        F.col("dow"), F.col("day").alias("da"), F.col("x").alias("xa")
    )
    b = d.select(
        F.col("dow"), F.col("day").alias("db"), F.col("x").alias("xb")
    )
    cnt = d.groupBy("dow").agg(F.count("*").cast("long").alias("n_g"))
    per = (
        a.join(b, (a.dow == b.dow) & (F.col("db") > F.col("da")))
        .drop(b.dow)
        .groupBy("dow")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_g")
        )
        .join(F.broadcast(cnt), "dow")
        .select(
            "dow",
            "s_g",
            (
                F.col("n_g")
                * (F.col("n_g") - 1)
                * (2 * F.col("n_g") + 5)
            )
            .cast("long")
            .alias("var18_g"),
        )
    )
    tot = per.agg(
        F.sum("s_g").cast("long").alias("s"),
        F.sum("var18_g").cast("long").alias("var18"),
        F.count("*").cast("long").alias("n_seasons"),
    )
    return tot.select(
        "n_seasons",
        F.col("s").alias("s_stat"),
        "var18",
        F.round(
            F.when(F.col("s") == 0, F.lit(0.0)).otherwise(
                (F.col("s") - F.signum(F.col("s").cast("double")))
                / F.sqrt(F.col("var18") / F.lit(18.0))
            ),
            4,
        ).alias("z_stat"),
        (
            (
                F.lit(18000000).cast("long")
                * (F.abs(F.col("s")) - 1)
                * (F.abs(F.col("s")) - 1)
                > F.lit(3841459).cast("long") * F.col("var18")
            )
            & (F.col("s") != 0)
        ).alias("reject_05"),
    )
