"""Event-log operators, batch-checkable — SURVEY.md §2.9.

The heart of the events-to-db capability surface: time-window
aggregation, sessionization, idempotent dedup, funnel, cohort
retention, and latest-state materialization.  Each query is expressed
once over the batch ``events`` table; the streaming module
(:mod:`events_to_db_spark.streaming`) runs the same logical plans on an
unbounded source with watermarks (Spark's unified batch/stream
semantics) — the batch answer is the oracle for the stream
(tests/test_streaming.py).

Boundary semantics pinned empirically (SURVEY.md §7.3.6): Spark
``session_window(ts, '30 minutes')`` merges a gap of exactly 30:00 —
a new session starts iff gap > 30 min strictly — and the lag/cumsum
oracle uses the same strict comparison.

Scale notes: every operator shuffles once on ``user_id`` (or the window
key) and aggregates; no self-joins except the funnel's bounded
first-signup⋈first-purchase (both sides pre-aggregated to one row per
user before the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@query(
    "q_ev_tumbling",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
           event_type,
           count(*)            AS n,
           round(sum(value), 4) AS sum_v
    FROM events GROUP BY 1, 2
    """,
)
def q_ev_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling window × event type (BASELINE.md B7).  Uses the
    streaming-capable ``F.window`` so the identical expression runs
    under a watermark on the live path."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("d"),
            "event_type",
            "n",
            "sum_v",
        )
    )


@query(
    "q_ev_sliding",
    oracle="""
    WITH b AS (
        SELECT to_timestamp(floor(epoch(ts) / 1800) * 1800) AS bucket, value
        FROM events
    ), w AS (
        SELECT bucket AS w_start, value FROM b
        UNION ALL
        SELECT bucket - INTERVAL 30 MINUTE AS w_start, value FROM b
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M') AS ws, count(*) AS n
    FROM w GROUP BY 1
    """,
)
def q_ev_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min — each event lands in exactly
    two windows.  The oracle reproduces the epoch-aligned grid by
    exploding each event into its two containing windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("ws"), "n"
        )
    )


@query(
    "q_ev_session",
    oracle=f"""
    WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g
    )
    SELECT user_id,
           strftime(min(ts), '{TS_FMT_DUCK}') AS s_ts,
           strftime(max(ts), '{TS_FMT_DUCK}') AS e_ts,
           count(*) AS n_events,
           CAST(date_diff('microseconds', min(ts), max(ts)) AS BIGINT) AS span_us
    FROM s GROUP BY user_id, sid
    """,
)
def q_ev_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization per user (BASELINE.md B8) via native
    ``session_window`` — one row per session with span and size.  The
    oracle is the classic lag→gap-flag→cumsum formulation with the same
    strict-> boundary (gap of exactly 30:00 merges, pinned by unit
    fixture)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .select(
            "user_id",
            F.date_format("min_ts", TS_FMT).alias("s_ts"),
            F.date_format("max_ts", TS_FMT).alias("e_ts"),
            "n_events",
            # Exact integer µs — float seconds round differently at the
            # .00005 boundary between engines.
            (F.unix_micros("max_ts") - F.unix_micros("min_ts")).alias("span_us"),
        )
    )


@query(
    "q_ev_dedup",
    oracle="""
    WITH r AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY user_id, event_type, date_trunc('minute', ts)
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT event_type, count(*) AS n_survivors
    FROM r WHERE rn = 1 GROUP BY event_type
    """,
)
def q_ev_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent-redelivery dedup: one event per
    ``(user, type, minute)``, keeping the earliest (tie-break
    event_id) — the batch twin of ``dropDuplicatesWithinWatermark``."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("minute", "ts")
    ).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_survivors"))
    )


@query(
    "q_ev_funnel",
    oracle=f"""
    WITH s AS (
        SELECT user_id, min(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
        SELECT s.user_id, s.signup_ts, min(e.ts) AS purchase_ts
        FROM s JOIN events e ON e.user_id = s.user_id
         AND e.event_type = 'purchase'
         AND e.ts >= s.signup_ts
         AND e.ts <= s.signup_ts + INTERVAL 7 DAY
        GROUP BY s.user_id, s.signup_ts
    )
    SELECT user_id,
           strftime(signup_ts, '{TS_FMT_DUCK}')   AS signup_ts,
           strftime(purchase_ts, '{TS_FMT_DUCK}') AS purchase_ts
    FROM p
    """,
)
def q_ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: first signup → first purchase within 7 days.
    Both stages reduce to one row per user *before* joining, so the
    join input is bounded by |users| regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    return (
        signups.join(purchases, "user_id")
        .filter(
            (F.col("p_ts") >= F.col("signup_ts"))
            & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
        .select(
            "user_id",
            F.date_format("signup_ts", TS_FMT).alias("signup_ts"),
            F.date_format("purchase_ts", TS_FMT).alias("purchase_ts"),
        )
    )


@query(
    "q_ev_cohort",
    oracle="""
    WITH f AS (
        SELECT user_id, date_trunc('week', min(ts)) AS w0 FROM events GROUP BY user_id
    ), act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT strftime(f.w0, '%Y-%m-%d') AS cohort_week,
           count(*)                    AS n_users,
           count(a.user_id)            AS n_retained
    FROM f LEFT JOIN act a
      ON a.user_id = f.user_id AND a.w = f.w0 + INTERVAL 7 DAY
    GROUP BY 1
    """,
)
def q_ev_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-event ISO week ×
    still-active in the following week (two aggregations + one
    per-user-bounded join)."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy(F.col("user_id").alias("f_user")).agg(
        F.date_trunc("week", F.min("ts")).alias("w0")
    )
    active = ev.select(
        F.col("user_id").alias("a_user"), F.date_trunc("week", "ts").alias("w")
    ).distinct()
    joined = first.join(
        active,
        (F.col("a_user") == F.col("f_user"))
        & (F.col("w") == F.col("w0") + F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    return joined.groupBy(
        F.date_format("w0", "yyyy-MM-dd").alias("cohort_week")
    ).agg(
        F.count("*").alias("n_users"),
        F.count("a_user").alias("n_retained"),
    )


@query(
    "q_ev_latest",
    oracle=f"""
    WITH r AS (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_id, event_type, value,
           strftime(ts, '{TS_FMT_DUCK}') AS ts_s
    FROM r WHERE rn = 1
    """,
)
def q_ev_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user latest event — the "current state" materialization an
    event→DB copier exists to serve (streaming twin: ``foreachBatch``
    MERGE in the sink module)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.date_format("ts", TS_FMT).alias("ts_s"),
        )
    )


@query(
    "q_ev_gap",
    oracle="""
    SELECT user_id,
           count(*) AS n_gaps,
           round(avg(gap_us) / 1000000.0, 4) AS avg_gap_s,
           round(max(gap_us) / 1000000.0, 4) AS max_gap_s
    FROM (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ) WHERE gap_us IS NOT NULL
    GROUP BY user_id
    HAVING count(*) >= 5
    """,
)
def q_ev_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user (inter-arrival analysis —
    the latency/heartbeat view a DB copy of an event log gets queried
    for).  Gaps are computed as exact integer microsecond differences
    via ``lag`` over the per-user timeline, then averaged; only the
    final average is floating-point (§7.5.1).  One shuffle on user_id
    shared by the window and the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.avg("gap_us") / 1e6, 4).alias("avg_gap_s"),
            F.round(F.max("gap_us") / 1e6, 4).alias("max_gap_s"),
        )
        .filter(F.col("n_gaps") >= 5)
    )


@query(
    "q_ev_newusers",
    oracle="""
    SELECT CAST(first_d AS VARCHAR) AS d,
           count(*) AS new_users,
           CAST(sum(count(*)) OVER (ORDER BY first_d) AS BIGINT)
               AS cum_users
    FROM (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_d
        FROM events GROUP BY user_id
    )
    GROUP BY first_d
    """,
)
def q_ev_newusers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts plus the cumulative user curve: first
    event day per user, grouped, then a running sum over the (tiny)
    per-day aggregate — the growth dashboard an event-log copy serves.
    The unbounded-ordered window runs over days, not events, so the
    single-partition window stage is bounded by the calendar."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d")
    )
    daily = first.groupBy("first_d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("first_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        F.col("first_d").cast("string").alias("d"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


@query(
    "q_ev_ohlc",
    oracle="""
    SELECT event_type, CAST(d AS VARCHAR) AS d,
           round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open_v,
           round(max(value), 4) AS high_v,
           round(min(value), 4) AS low_v,
           round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close_v,
           count(*) AS n_events
    FROM (
        SELECT event_type, CAST(ts AS DATE) AS d, value,
               row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    GROUP BY event_type, d
    """,
)
def q_ev_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: per (event_type, day) the opening, highest, lowest
    and closing ``value`` — the time-series downsampling a DB copy of
    a metrics stream exists to serve.  First/last rows are selected by
    row_number with the (ts, event_id) total order (§7.5.2) — robust
    to timestamp ties, unlike arg_min on ts alone.  Both window passes
    share one shuffle on the bar key."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    wa = Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    tagged = ev.select(
        "event_type", d.alias("d"), "value", "ts", "event_id"
    ).select(
        "event_type",
        "d",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return tagged.groupBy("event_type", "d").agg(
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4).alias("open_v"),
        F.round(F.max("value"), 4).alias("high_v"),
        F.round(F.min("value"), 4).alias("low_v"),
        F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4).alias("close_v"),
        F.count("*").alias("n_events"),
    ).withColumn("d", F.col("d").cast("string"))


@query(
    "q_ev_rfm",
    oracle="""
    SELECT recency_d, f_quartile, count(*) AS n_users,
           round(avg(monetary), 4) AS avg_monetary
    FROM (
        SELECT user_id,
               datediff('day', max(CAST(ts AS DATE)),
                        (SELECT max(CAST(ts AS DATE)) FROM events))
                   AS recency_d,
               ntile(4) OVER (ORDER BY count(*) DESC, user_id) AS f_quartile,
               sum(value) AS monetary
        FROM events GROUP BY user_id
    )
    GROUP BY recency_d, f_quartile
    """,
)
def q_ev_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (days since last event,
    relative to the corpus max day), frequency quartile (exact ntile
    semantics with the §7.5.2 unique tie-break) and monetary sum,
    rolled up to the (recency, frequency-quartile) grid.

    Scale shape: a global ``ntile(4) OVER (ORDER BY freq DESC,
    user_id)`` would sort every user in ONE task.  Instead the global
    rank comes from ``bucketed_running_sum`` (two-level parallel scan:
    partitioned per-bucket windows + broadcast carry-join over bucket
    totals) and the quartile from the exact ntile fill rule applied to
    (rank, n_users) — same answer, no single-partition window.  The
    global max-day and user-count scalars are one-row broadcasts."""
    from events_to_db_spark.plans.prefix import bucketed_running_sum, ntile_from_rank

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("last_d"),
        F.count("*").alias("freq"),
        F.sum("value").alias("monetary"),
    )
    max_d = ev.agg(F.max(F.col("ts").cast("date")).alias("gmax_d"))
    n_users = per_user.agg(F.count("*").alias("n_tot"))
    # bucket ascends with (freq DESC, user_id): negate a coarse freq range
    ranked = bucketed_running_sum(
        per_user,
        bucket=-F.floor(F.col("freq") / F.lit(16)),
        order_cols=[F.col("freq").desc(), F.col("user_id")],
        sums={"rank": F.lit(1)},
    )
    scored = (
        ranked.crossJoin(F.broadcast(max_d))
        .crossJoin(F.broadcast(n_users))
        .select(
            F.datediff(F.col("gmax_d"), F.col("last_d")).alias("recency_d"),
            ntile_from_rank(F.col("rank"), F.col("n_tot"), 4)
            .cast("int")
            .alias("f_quartile"),
            "monetary",
        )
    )
    return scored.groupBy("recency_d", "f_quartile").agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("monetary"), 4).alias("avg_monetary"),
    )


@query(
    "q_ev_anomaly",
    oracle="""
    SELECT event_type,
           count(*) AS n_outliers,
           round(min(value), 4) AS min_out,
           round(max(value), 4) AS max_out
    FROM (
        SELECT event_type, value,
               avg(value) OVER (PARTITION BY event_type) AS mu,
               stddev_samp(value) OVER (PARTITION BY event_type) AS sigma
        FROM events
    )
    WHERE abs(value - mu) > 2.5 * sigma
    GROUP BY event_type
    """,
)
def q_ev_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection: events whose ``value`` sits more
    than 2.5 sample standard deviations from its type's mean — the
    outlier sweep run over a metrics copy before training or
    alerting.  Both engines compute μ/σ from the same exact sums, and
    2.5σ boundaries fall in continuous data, so no rounding is needed
    before the comparison.  The unpartitioned-looking window is keyed
    by event_type (bounded cardinality), one shuffle total."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    scored = ev.select(
        "event_type",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
    )
    return (
        scored.filter(
            F.abs(F.col("value") - F.col("mu")) > 2.5 * F.col("sigma")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_outliers"),
            F.round(F.min("value"), 4).alias("min_out"),
            F.round(F.max("value"), 4).alias("max_out"),
        )
    )


@query(
    "q_ev_scd2",
    oracle="""
    SELECT user_id, state, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us) AS valid_to_us,
           CAST(lead(valid_from_us) OVER (PARTITION BY user_id
                ORDER BY valid_from_us) IS NULL AS BOOLEAN) AS is_current
    FROM (
        SELECT user_id, event_type AS state, epoch_us(ts) AS valid_from_us
        FROM (
            SELECT user_id, event_type, ts,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    """,
)
def q_ev_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event log → SCD-type-2 dimension: collapse each user's event
    stream into state intervals (``valid_from``/``valid_to``/
    ``is_current``) — the materialization an event→DB copier produces
    when the target wants history, not just latest state
    (``q_ev_latest``'s richer sibling).  Run boundaries come from
    ``lag`` over the (ts, event_id) total order; interval ends from
    ``lead`` over the collapsed rows.  Timestamps are exported as
    exact integer epoch-microseconds (§7.5.3 — no sub-second string
    formatting).  Both window passes share the user_id shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.unix_micros(F.col("ts")).alias("valid_from_us"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("state"))
        )
        .drop("prev_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us")
    return changes.select(
        "user_id",
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        F.lead("valid_from_us").over(w2).isNull().alias("is_current"),
    )


@query(
    "q_ev_gapfill",
    oracle="""
    WITH span AS (
        SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
        FROM events
    ),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
            AS d
        FROM span
    ),
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT t.event_type, CAST(s.d AS VARCHAR) AS d,
           CAST(coalesce(daily.n, 0) AS BIGINT) AS n,
           CAST(daily.n IS NULL AS BOOLEAN) AS is_gap
    FROM spine s
    CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = s.d
    """,
)
def q_ev_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (gap-fill): a complete (event_type ×
    day) grid over the log's span with zero-filled missing days — the
    step every downsampled time series needs before charting or
    model-ready export, and a classic hole in plain SQL group-bys.
    The date spine is generated from the global min/max (one-row
    aggregate → ``sequence`` → explode), cross-joined with the
    (bounded) type dimension, then left-joined to the daily counts;
    spine and dimension are broadcast, so the only shuffle is the
    daily aggregate's."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("n"))
    grid = F.broadcast(spine).crossJoin(F.broadcast(types))
    return (
        grid.join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.col("d").cast("string").alias("d"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


@query(
    "q_ev_transitions",
    oracle="""
    SELECT prev_type, event_type AS next_type, n, rnk
    FROM (
        SELECT prev_type, event_type, n,
               row_number() OVER (PARTITION BY prev_type
                                  ORDER BY n DESC, event_type) AS rnk
        FROM (
            SELECT prev_type, event_type, count(*) AS n
            FROM (
                SELECT event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events
            )
            WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        )
    ) WHERE rnk <= 3
    """,
)
def q_ev_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov view): for
    each predecessor type, the top-3 successor types by frequency —
    the behavioral-flow question ("what do users do after an error?")
    an event-log copy gets asked.  One user_id-shuffled lag, one
    hash-aggregate on the (bounded) type×type grid, one tiny window
    with the §7.5.2 tie-break."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )
    w2 = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= 3)
        .select(
            "prev_type",
            F.col("event_type").alias("next_type"),
            "n",
            "rnk",
        )
    )


@query(
    "q_ev_hysteresis",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN sig = 'ON' AND (prev IS NULL OR prev = 'OFF')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts,
           max(CASE WHEN rn_d = 1 THEN sig END) = 'ON' AS alert_open
    FROM (
        SELECT user_id, sig,
               lag(sig) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN value > 300 THEN 'ON' ELSE 'OFF' END AS sig
            FROM events
            WHERE value > 300 OR value < 150
        )
    )
    GROUP BY user_id
    HAVING sum(CASE WHEN sig = 'ON' AND (prev IS NULL OR prev = 'OFF')
               THEN 1 ELSE 0 END) > 0
    """,
)
def q_ev_hysteresis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold alerting with hysteresis: an alert opens when a
    user's ``value`` exceeds 300 and closes only below 150 — the
    two-threshold state machine (no flapping) every monitoring
    pipeline runs over an event feed.

    The automaton looks order-recursive, but state only changes at
    *crossing* events (>300 or <150), so filtering to those and
    taking ``lag`` over the (ts, event_id) total order is exact:
    an alert fires at each ON-event whose previous crossing was OFF
    (or none).  That compression is also the scale story — the
    windowed pass runs over the crossing events only, and the filter
    is evaluable at the scan.  The streaming twin
    (:mod:`events_to_db_spark.streaming.stateful`) keeps one boolean
    per user in ``applyInPandasWithState``; batch answer = stream
    answer (tests/test_stateful_streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    sig = ev.filter((F.col("value") > 300) | (F.col("value") < 150)).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("value") > 300, "ON").otherwise("OFF").alias("sig"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    flagged = sig.select(
        "user_id",
        "sig",
        F.lag("sig").over(w).alias("prev"),
        F.row_number().over(wd).alias("rn_d"),
    )
    fired = F.when(
        (F.col("sig") == "ON")
        & (F.col("prev").isNull() | (F.col("prev") == "OFF")),
        1,
    ).otherwise(0)
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum(fired).alias("n_alerts"),
            (F.max(F.when(F.col("rn_d") == 1, F.col("sig"))) == "ON").alias(
                "alert_open"
            ),
        )
        .filter(F.col("n_alerts") > 0)
    )


@query(
    "q_ev_burst",
    oracle="""
    SELECT user_id,
           CAST(max(n_1h) AS BIGINT) AS peak_1h
    FROM (
        SELECT user_id,
               count(*) OVER (PARTITION BY user_id ORDER BY es
                              RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
                   AS n_1h
        FROM (
            SELECT user_id, epoch_us(ts) // 1000000 AS es FROM events
        )
    )
    GROUP BY user_id
    HAVING max(n_1h) >= 3
    """,
)
def q_ev_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak burst rate: the most events any user produced inside a
    1-hour sliding window (exact, event-anchored — not the bucketed
    approximation a tumbling window gives), keeping users peaking ≥3.
    A RANGE frame over integer epoch-seconds counts each event's
    trailing window; RANGE (not ROWS) so same-second peers count in
    both engines.  One user_id shuffle shared by window and
    aggregate; state is the frame, bounded by the 3600-second span."""
    ev = load_table(spark, sf_dir, "events")
    es = (F.unix_micros(F.col("ts")) / F.lit(1000000)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-3599, Window.currentRow)
    )
    per_event = ev.select("user_id", es.alias("es")).select(
        "user_id", F.count("*").over(w).alias("n_1h")
    )
    return (
        per_event.groupBy("user_id")
        .agg(F.max("n_1h").alias("peak_1h"))
        .filter(F.col("peak_1h") >= 3)
    )


@query(
    "q_ev_wau",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    span AS (
        SELECT min(d) AS lo, max(d) AS hi FROM user_days
    ),
    contrib AS (
        SELECT user_id,
               CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE) AS w_end
        FROM user_days
    )
    SELECT CAST(w_end AS VARCHAR) AS d,
           count(DISTINCT user_id) AS wau
    FROM contrib, span
    WHERE w_end BETWEEN lo AND hi
    GROUP BY w_end
    """,
)
def q_ev_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the rolling
    *cardinality* no plain window frame can express (COUNT(DISTINCT)
    over a moving range).  Formulated scalably: dedup to user-days,
    then each user-day *contributes* to the 7 window-end days it is
    visible from (a 7× explode — pure projection, no self-join), then
    one distinct-count per day.  Shuffle volume is 7·|user-days|,
    independent of raw event count; the alternative day-spine band
    join is quadratic in the calendar."""
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    span = user_days.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("w_end"),
    )
    return (
        contrib.crossJoin(F.broadcast(span))
        .filter(F.col("w_end").between(F.col("lo"), F.col("hi")))
        .groupBy("w_end")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("w_end").cast("string").alias("d"), "wau")
    )


@query(
    "q_ev_attribution",
    oracle="""
    SELECT attributed, count(*) AS n_purchases
    FROM (
        SELECT event_type,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS attributed
        FROM events
    )
    WHERE event_type = 'purchase' AND attributed IS NOT NULL
    GROUP BY attributed
    """,
)
def q_ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the user's
    most recent *preceding* non-purchase event (strictly before, via a
    1-PRECEDING frame; first-ever purchases stay unattributed) —
    the marketing-analytics question an event→DB copy answers daily.
    ``last_value IGNORE NULLS`` over the (ts, event_id) total order is
    the single-pass formulation; no self-join, one user_id shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = ev.select(
        "event_type",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("attributed"),
    )
    return (
        attributed.filter(
            (F.col("event_type") == "purchase")
            & F.col("attributed").isNotNull()
        )
        .groupBy("attributed")
        .agg(F.count("*").alias("n_purchases"))
    )


@query(
    "q_ev_streak",
    oracle="""
    SELECT user_id,
           CAST(max(streak_len) AS BIGINT) AS best_streak,
           count(*) AS n_streaks
    FROM (
        SELECT user_id, island, count(*) AS streak_len
        FROM (
            SELECT user_id, d,
                   d - CAST(row_number() OVER (PARTITION BY user_id
                                               ORDER BY d) AS INT) AS island
            FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        )
        GROUP BY user_id, island
    )
    GROUP BY user_id
    HAVING max(streak_len) >= 5
    """,
)
def q_ev_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands pattern: over distinct user-days, ``day −
    row_number`` is constant exactly within a consecutive run, so one
    window plus two aggregates finds every streak with no self-join.
    Keeps users with a ≥5-day best streak.  DuckDB's DATE − INT is
    Spark's ``date_sub``; both yield a DATE island key."""
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = user_days.select(
        "user_id",
        F.date_sub(
            F.col("d"), F.row_number().over(w).cast("int")
        ).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("streak_len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("streak_len").alias("best_streak"),
            F.count("*").alias("n_streaks"),
        )
        .filter(F.col("best_streak") >= 5)
    )


@query(
    "q_api_pipeline",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_v
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
      AND value > 50
    GROUP BY event_type
    ORDER BY n DESC, event_type
    LIMIT 3
    """,
)
def q_api_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AQL-shaped fluent builder as a first-class contract query:
    FROM (time-bounded) → FILTER → AGGREGATE (grouped) → LIMIT
    (total-ordered) through :class:`events_to_db_spark.api.EventQuery`
    — proving the API layer composes to exactly the plan the raw
    DataFrame chain builds (same pushdown, same
    TakeOrderedAndProject), not a parallel dialect."""
    from events_to_db_spark.api import EventQuery

    ev = load_table(spark, sf_dir, "events")
    return (
        EventQuery.from_events(ev)
        .between("2024-01-08", "2024-01-15")
        .filter(F.col("value") > 50)
        .aggregate(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_v"),
            by=["event_type"],
        )
        .limit(3, order_by=[F.col("n").desc(), F.col("event_type")])
        .df()
    )


@query(
    "q_ev_replay",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS seq,
           event_id, user_id, event_type
    FROM (
        SELECT * FROM events ORDER BY ts, event_id LIMIT 100
    )
    """,
)
def q_ev_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order replay: the first 100 events of the log in the
    global (ts, event_id) order with their replay sequence numbers —
    the deterministic-replay semantics of a totally-ordered event log
    (the reference's (lamport, stream) order, §1.1) made queryable.
    ``orderBy().limit()`` compiles to TakeOrderedAndProject (per-
    partition top-k + driver merge — no global sort), and the
    sequence-number window runs over the 100 surviving rows only."""
    ev = load_table(spark, sf_dir, "events")
    head = ev.orderBy("ts", "event_id").limit(100)
    w = Window.orderBy("ts", "event_id")
    return head.select(
        F.row_number().over(w).cast("long").alias("seq"),
        "event_id",
        "user_id",
        "event_type",
    )


@query(
    "q_ev_offsetmap",
    oracle="""
    SELECT user_id,
           max(event_id) AS high_offset,
           count(*) AS n_events,
           CAST(max(epoch_us(ts)) AS BIGINT) AS high_ts_us
    FROM events GROUP BY user_id
    """,
)
def q_ev_offsetmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The offset map as a query: per stream key (user_id here — the
    testdata's stream analog) the highest offset (event_id), the event
    count, and the high-water timestamp in exact epoch-µs — precisely
    the resume-token table an events→DB copier persists alongside the
    data so redelivery restarts exactly where it left off (§1.1; the
    streaming twin is the checkpoint introspected by
    streaming/offsets.py).  One hash-aggregate, three max/count
    folds."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("high_offset"),
        F.count("*").alias("n_events"),
        F.max(F.unix_micros(F.col("ts"))).alias("high_ts_us"),
    )


@query(
    "q_win_slope",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(value, epoch_us(ts) / 86400000000.0), 4)
               AS slope_per_day,
           round(regr_r2(value, epoch_us(ts) / 86400000000.0), 4) AS r2
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 50
    """,
)
def q_win_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity trend detection: OLS slope (value per day) and R²
    of each sufficiently-active user's value series — the drift/decay
    screen run over a metrics copy.  Time is exact epoch-µs scaled to
    days, so both engines regress on identical doubles; slope and R²
    are single-pass co-moment aggregates (one shuffle, map-side
    partials)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts")) / F.lit(86400000000.0)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.regr_slope(F.col("value"), x), 4).alias(
                "slope_per_day"
            ),
            F.round(F.regr_r2(F.col("value"), x), 4).alias("r2"),
        )
        .filter(F.col("n") >= 50)
    )


@query(
    "q_ev_concurrency",
    oracle="""
    WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS sid
        FROM g
    ), sess AS (
        SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS s_us,
               CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS e_us
        FROM s GROUP BY user_id, sid
    ), bounds AS (
        SELECT s_us AS t_us, 1 AS delta FROM sess
        UNION ALL
        SELECT e_us AS t_us, -1 AS delta FROM sess
    ), swept AS (
        SELECT t_us,
               sum(delta) OVER (ORDER BY t_us, delta) AS conc
        FROM bounds
    )
    SELECT CAST(CAST(make_timestamp(t_us) AS DATE) AS VARCHAR) AS d,
           CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM swept
    GROUP BY 1
    """,
)
def q_ev_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day (sweep-line over session
    intervals): sessions are the same 30-min-gap windows as
    ``q_ev_session`` (active until last-event + gap, Spark's
    ``session_window`` end), decomposed into ±1 boundary events and
    swept with a running sum in (t, delta) order — delta −1 sorts
    first, so back-to-back sessions touching at an instant never
    double-count.  Tie instants are deterministic because the running
    sum is read only after grouping to per-day peaks and the (t_us,
    delta) order folds −1s before +1s at the same instant.

    Scale shape: the sweep partitions by DAY with per-day carry-in
    (``bucketed_running_sum``): each day's boundary rows prefix-sum in
    their own partition, and the number of sessions still open at
    day-start arrives as a broadcast carry from the per-day delta
    totals — no single-partition window over the 2·|sessions| rows."""
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count("*").alias("n"))
    bounds = sessions.select(
        F.explode(
            F.array(
                F.struct(
                    F.unix_micros(F.col("w.start")).alias("t_us"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    F.unix_micros(F.col("w.end")).alias("t_us"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("b")
    ).select("b.t_us", "b.delta")
    from events_to_db_spark.plans.prefix import bucketed_running_sum

    swept = bucketed_running_sum(
        bounds,
        bucket=F.floor(F.col("t_us") / F.lit(86_400_000_000)),  # UTC day
        order_cols=[F.col("t_us"), F.col("delta")],
        sums={"conc": F.col("delta")},
    )
    return (
        swept.groupBy(
            F.timestamp_micros(F.col("t_us")).cast("date").cast("string").alias("d")
        )
        .agg(F.max("conc").alias("peak_concurrency"))
    )


@query(
    "q_ev_seasonality",
    oracle="""
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hr,
           count(*) AS n,
           round(count(*) * 10000.0 / (SELECT count(*) FROM events), 4)
               AS pct_bp
    FROM events
    GROUP BY dow, hr
    """,
)
def q_ev_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity seasonality: the day-of-week × hour-of-day heat map
    with each cell's share in basis points — the load-profile /
    chronotype view an event copy serves to capacity planning.
    Dialect parity: Spark ``dayofweek`` is 1-based (Sunday=1),
    DuckDB's is 0-based (Sunday=0) — the oracle shifts by one.  The
    global total is a broadcast scalar.
    One hash-aggregate over a 168-cell grid."""
    ev = load_table(spark, sf_dir, "events")
    total = ev.agg(F.count("*").alias("total"))
    return (
        ev.groupBy(
            F.dayofweek("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hr"),
        )
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hr",
            "n",
            F.round(F.col("n") * 10000.0 / F.col("total"), 4).alias(
                "pct_bp"
            ),
        )
    )


@query(
    "q_ev_pareto",
    oracle="""
    SELECT CAST(min(rnk) AS BIGINT) AS n_users_80pct,
           (SELECT count(DISTINCT user_id) FROM events) AS total_users,
           round(min(cum_share), 4) AS reached_share
    FROM (
        SELECT sum(n) OVER (ORDER BY n DESC, user_id)
                   / CAST((SELECT count(*) FROM events) AS DOUBLE)
                   AS cum_share,
               row_number() OVER (ORDER BY n DESC, user_id) AS rnk
        FROM (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
    )
    WHERE cum_share >= 0.8
    """,
)
def q_ev_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: how many top users (by event count,
    user_id tie-break) it takes to cover 80 % of all events, and the
    exact share reached at that cut — the 80/20 question every usage
    report answers.  The cumulative sum and rank over per-user
    aggregates come from ``bucketed_running_sum`` (per-bucket
    partitioned windows + broadcast carry-join), so no task ever sorts
    the full user list; the frontier is the single row where the
    cumulative share first crosses 0.8."""
    from events_to_db_spark.plans.prefix import bucketed_running_sum

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    total = ev.agg(F.sum(F.lit(1)).alias("ev_total"))
    ranked = bucketed_running_sum(
        per_user,
        bucket=-F.floor(F.col("n") / F.lit(16)),
        order_cols=[F.col("n").desc(), F.col("user_id")],
        sums={"cum_n": F.col("n"), "rnk": F.lit(1)},
    ).crossJoin(F.broadcast(total)).select(
        (F.col("cum_n") / F.col("ev_total").cast("double")).alias("cum_share"),
        "rnk",
    )
    frontier = ranked.filter(F.col("cum_share") >= 0.8).agg(
        F.min("rnk").cast("long").alias("n_users_80pct"),
        F.round(F.min("cum_share"), 4).alias("reached_share"),
    )
    total_users = per_user.agg(F.count("*").alias("total_users"))
    return frontier.crossJoin(F.broadcast(total_users)).select(
        "n_users_80pct", "total_users", "reached_share"
    )


@query(
    "q_ev_eventually_follows",
    oracle="""
    WITH pos AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS r
        FROM events
    ),
    per AS (
        SELECT user_id, event_type,
               CAST(min(r) AS BIGINT) AS min_r,
               CAST(max(r) AS BIGINT) AS max_r
        FROM pos GROUP BY 1, 2
    ),
    ef AS (
        SELECT a.event_type AS src, b.event_type AS dst,
               CAST(count(*) AS BIGINT) AS n_users
        FROM per a JOIN per b
          ON a.user_id = b.user_id AND a.min_r < b.max_r
         AND a.event_type <> b.event_type
        GROUP BY 1, 2
    ),
    nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS total FROM events)
    SELECT src, dst, n_users,
           round(CAST(n_users AS DOUBLE) / total, 6) AS support
    FROM ef CROSS JOIN nu
    """,
)
def q_ev_eventually_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining eventually-follows relation: for every ordered
    type pair (a, b), how many users ever do *a* strictly before some
    later *b* — the EF-graph that process-discovery algorithms (alpha
    miner, heuristics miner) start from, and the non-adjacent
    complement of q_ev_transitions' directly-follows edges.

    Event order is the unique (ts, event_id) sequence position, so
    "eventually before" is an exact integer comparison of each type's
    first position against the other's last — no timestamp-tie
    ambiguity.  Plan: one position window per user, a per-(user,type)
    min/max aggregate (≤ |types| rows per user), then a user-keyed
    self-join of that tiny per-user table — the quadratic term is
    |types|², never events².
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("r")
    )
    per = pos.groupBy("user_id", "event_type").agg(
        F.min("r").cast("long").alias("min_r"),
        F.max("r").cast("long").alias("max_r"),
    )
    a = per.alias("a")
    b = per.alias("b")
    ef = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.min_r") < F.col("b.max_r"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("src"),
            F.col("b.event_type").alias("dst"),
        )
        .agg(F.count("*").alias("n_users"))
    )
    nu = ev.agg(F.countDistinct("user_id").cast("long").alias("total"))
    return ef.crossJoin(F.broadcast(nu)).select(
        "src",
        "dst",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.col("total"), 6
        ).alias("support"),
    )
