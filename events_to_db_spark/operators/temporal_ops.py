"""Temporal event-log operators, round 2 (SURVEY.md §2.12).

The reference's domain is an eventually-ordered, at-least-once event
feed copied into a database (SURVEY §1.1).  This module adds the
time-series verbs that surface on top of such a feed and that round 1
did not yet cover:

* time-weighted averages (``q_ev_timeweighted``) — the right mean for
  irregularly-sampled state;
* last-observation-carried-forward resampling (``q_ev_resample``) —
  downsample to a regular grid;
* changelog application / CDC merge (``q_ev_cdc_apply``) — the batch
  twin of the streaming upsert sink;
* watermark lateness accounting (``q_ev_late``) and per-stream disorder
  stats (``q_ev_outoforder``) — quantify the out-of-orderness the
  streaming layer's watermarks must absorb.

The testdata's ``ts`` is perfectly monotone in ``event_id`` (measured:
0 inversions at sf0.01), so the two disorder queries simulate network
arrival order with the engine's standard md5-derived key hash — a
deterministic shuffle both engines compute identically, giving the
lateness logic real work and the oracle an exact target.

Scale posture: every window here is partitioned by ``user_id`` except
the global watermark sweep, which uses the two-level bucketed
running-max (plans/prefix.py) instead of a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.plans.prefix import bucketed_running_max
from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table

#: md5-derived 60-bit arrival key — identical in both engines (CLAUDE.md).
_SPARK_AK = (
    "cast(conv(substr(md5(cast(cast(event_id as string) as binary)), 1, 15),"
    " 16, 10) as bigint)"
)
_DUCK_AK = "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT"

#: Snapshot/changelog split point for the CDC + drift queries.
_T0 = "2024-01-16 00:00:00"


@query(
    "q_ev_timeweighted",
    oracle="""
    WITH seg AS (
        SELECT user_id, value, epoch_us(ts) AS t,
               lead(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_seg,
           CAST(sum(nxt - t) AS BIGINT) AS active_us,
           round(sum(value * (nxt - t)) / sum(nxt - t), 4) AS twap
    FROM seg WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
)
def q_ev_timeweighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value
    holds until the user's next event, so the mean weights by holding
    duration instead of treating an irregular sample stream as
    equally-spaced — the correct average for state observed at event
    times.  Durations are exact integer epoch-µs diffs from ``lead``
    over the (ts, event_id) total order; one ``user_id`` shuffle shared
    by the window and the aggregate; zero-length segments (duplicate
    timestamps) contribute zero weight by construction."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        us.alias("t"),
        F.lead(us).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    dur = F.col("nxt") - F.col("t")
    return seg.groupBy("user_id").agg(
        F.count("*").alias("n_seg"),
        F.sum(dur).alias("active_us"),
        F.round(F.sum(F.col("value") * dur) / F.sum(dur), 4).alias("twap"),
    )


@query(
    "q_ev_resample",
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
    dv AS (
        SELECT user_id, d, value FROM (
            SELECT user_id, CAST(ts AS DATE) AS d, value,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    grid AS (
        SELECT u.user_id, s.d
        FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN spine s
    ),
    locf AS (
        SELECT g.user_id, g.d,
               last_value(dv.value IGNORE NULLS) OVER
                   (PARTITION BY g.user_id ORDER BY g.d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        FROM grid g
        LEFT JOIN dv ON dv.user_id = g.user_id AND dv.d = g.d
    )
    SELECT CAST(d AS VARCHAR) AS d,
           CAST(count(v) AS BIGINT) AS n_users_defined,
           round(avg(v), 4) AS avg_locf
    FROM locf GROUP BY d
    """,
)
def q_ev_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample each user's irregular event stream to a regular daily
    grid with last-observation-carried-forward: for every (user, day)
    the value of the user's latest event at-or-before end of day —
    the resampling step that turns an event log into model-ready
    fixed-frequency panels.  Per-day last values reduce first (one
    row per user-day), the calendar spine comes from the global span
    (broadcast), and the carry-forward is ``last(..., ignorenulls)``
    over a per-user window — everything keyed by ``user_id``, so the
    plan holds when users × days is billions of grid cells."""
    ev = load_table(spark, sf_dir, "events")
    d_col = F.col("ts").cast("date")
    w_day = Window.partitionBy("user_id", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    dv = (
        ev.select("user_id", d_col.alias("d"), "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select("user_id", "d", "value")
    )
    span = ev.agg(
        F.min(d_col).alias("lo"), F.max(d_col).alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    grid = ev.select("user_id").distinct().crossJoin(F.broadcast(spine))
    w_locf = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    locf = grid.join(dv, ["user_id", "d"], "left").select(
        "user_id",
        "d",
        F.last("value", ignorenulls=True).over(w_locf).alias("v"),
    )
    return locf.groupBy(F.col("d").cast("string").alias("d")).agg(
        F.count("v").alias("n_users_defined"),
        F.round(F.avg("v"), 4).alias("avg_locf"),
    )


#: CDC windows: snapshot = state up to SNAP_HI, changelog = events from
#: DELTA_LO on.  The gap makes the merge matrix non-degenerate on this
#: dense corpus (measured at sf0.01: 249 carried / 64 inserted / 386
#: updated entities).
_SNAP_HI = "2024-01-05 00:00:00"
_DELTA_LO = "2024-01-29 00:00:00"


@query(
    "q_ev_cdc_apply",
    oracle=f"""
    WITH snap AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '{_SNAP_HI}'
        ) WHERE rn = 1
    ),
    delta AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '{_DELTA_LO}'
        ) WHERE rn = 1
    )
    SELECT CASE WHEN s.user_id IS NOT NULL AND d.user_id IS NOT NULL
                    THEN 'updated'
                WHEN d.user_id IS NOT NULL THEN 'inserted'
                ELSE 'carried' END AS status,
           CAST(count(*) AS BIGINT) AS n_entities,
           round(avg(coalesce(d.value, s.value)), 4) AS avg_final
    FROM snap s FULL OUTER JOIN delta d
        ON s.user_id = d.user_id AND s.event_type = d.event_type
    GROUP BY 1
    """,
)
def q_ev_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog application (CDC merge): the per-(user, type) state
    snapshot as of an early cut, merged with a later changelog under
    upsert semantics — exactly what the streaming ``foreachBatch``
    upsert sink does per micro-batch, expressed as a batch query so
    the oracle can value-check the whole merge matrix (updated /
    inserted / carried).  Both sides reduce to one row per entity
    *before* the full-outer join, so the join input is bounded by
    |entities|, not |events| — the MERGE pattern that scales."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest(df: DataFrame, p: str) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("user_id").alias(f"{p}_uid"),
                F.col("event_type").alias(f"{p}_type"),
                F.col("value").alias(f"{p}_val"),
            )
        )

    snap = latest(
        ev.filter(F.col("ts") < F.lit(_SNAP_HI).cast("timestamp")), "s"
    )
    delta = latest(
        ev.filter(F.col("ts") >= F.lit(_DELTA_LO).cast("timestamp")), "d"
    )
    merged = snap.join(
        delta,
        (snap.s_uid == delta.d_uid) & (snap.s_type == delta.d_type),
        "full",
    )
    status = (
        F.when(F.col("s_uid").isNotNull() & F.col("d_uid").isNotNull(), "updated")
        .when(F.col("d_uid").isNotNull(), "inserted")
        .otherwise("carried")
    )
    return merged.groupBy(status.alias("status")).agg(
        F.count("*").alias("n_entities"),
        F.round(F.avg(F.coalesce("d_val", "s_val")), 4).alias("avg_final"),
    )


@query(
    "q_ev_late",
    oracle=f"""
    WITH a AS (
        SELECT event_type, epoch_us(ts) AS us, {_DUCK_AK} AS ak
        FROM events
    ),
    r AS (
        SELECT event_type, us,
               max(us) OVER (ORDER BY ak
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS wm
        FROM a
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN us < wm - 3600000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           CAST(max(CASE WHEN us < wm - 3600000000
                         THEN wm - 3600000000 - us END) AS BIGINT)
               AS max_late_us
    FROM r GROUP BY event_type
    """,
)
def q_ev_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark lateness audit: replay the log in simulated arrival
    order (md5-hash of event_id — deterministic out-of-order delivery)
    and count, per type, the events that a 1-hour watermark would drop:
    event time more than 1 h behind the running max event time at
    arrival.  This is the batch quantification of what the streaming
    layer's ``withWatermark`` silently discards — run it before picking
    a delay.  The running max over the global arrival order uses the
    two-level bucketed scan (plans/prefix.py), not a single-partition
    window: arrival keys are uniform, so the top 5 bits of the key make
    32 order-aligned buckets.

    Late-test uses the *inclusive* running max: an event equal to the
    max is never late, so inclusive ≡ exclusive here."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.expr(_SPARK_AK).alias("ak"),
    )
    r = bucketed_running_max(
        a,
        bucket=F.shiftright(F.col("ak"), 55),
        order_cols=[F.col("ak")],
        value=F.col("us"),
        out="wm",
    )
    late = F.col("us") < F.col("wm") - 3600000000
    return r.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).alias("n_late"),
        F.max(F.when(late, F.col("wm") - 3600000000 - F.col("us"))).alias(
            "max_late_us"
        ),
    )


@query(
    "q_ev_outoforder",
    oracle=f"""
    WITH a AS (
        SELECT user_id, event_type, epoch_us(ts) AS us, {_DUCK_AK} AS ak
        FROM events
    ),
    p AS (
        SELECT event_type, us,
               lag(us) OVER (PARTITION BY user_id ORDER BY ak) AS prev
        FROM a
    )
    SELECT event_type,
           CAST(count(prev) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN us < prev THEN 1 ELSE 0 END) AS BIGINT)
               AS n_backward,
           CAST(max(CASE WHEN us < prev THEN prev - us END) AS BIGINT)
               AS max_back_us,
           round(sum(CASE WHEN us < prev THEN 1.0 ELSE 0.0 END)
                 / count(prev), 4) AS backward_ratio
    FROM p WHERE prev IS NOT NULL
    GROUP BY event_type
    """,
)
def q_ev_outoforder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream disorder profile: replaying each user's events in
    simulated arrival order (same md5 arrival key as ``q_ev_late``),
    how often does event time step backwards, and by how much?  The
    answer sizes reorder buffers and watermark delays for the streaming
    path (Actyx feeds are per-stream ordered but cross-stream
    interleaved — SURVEY §1.1).  One ``user_id``-partitioned window,
    one aggregate; no global ordering anywhere."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.expr(_SPARK_AK).alias("ak"),
    )
    w = Window.partitionBy("user_id").orderBy("ak")
    p = a.select(
        "event_type", "us", F.lag("us").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    back = F.col("us") < F.col("prev")
    return p.groupBy("event_type").agg(
        F.count("prev").alias("n_pairs"),
        F.sum(F.when(back, 1).otherwise(0)).alias("n_backward"),
        F.max(F.when(back, F.col("prev") - F.col("us"))).alias("max_back_us"),
        F.round(
            F.sum(F.when(back, F.lit(1.0)).otherwise(F.lit(0.0)))
            / F.count("prev"),
            4,
        ).alias("backward_ratio"),
    )
