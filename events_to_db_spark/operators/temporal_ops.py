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


@query(
    "q_join_interval",
    oracle="""
    WITH incident AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               min(ts) AS s_ts, max(ts) AS e_ts
        FROM events WHERE event_type = 'error'
        GROUP BY 1, 2
    ),
    inside AS (
        SELECT i.d, p.value
        FROM events p
        JOIN incident i
            ON i.user_id = p.user_id
            AND CAST(p.ts AS DATE) = i.d
            AND p.ts BETWEEN i.s_ts AND i.e_ts
        WHERE p.event_type = 'purchase'
    ),
    per_day AS (
        SELECT d, count(*) AS n_purchases_inside,
               round(sum(value), 4) AS value_inside
        FROM inside GROUP BY d
    )
    SELECT CAST(i.d AS VARCHAR) AS d,
           CAST(count(DISTINCT i.user_id) AS BIGINT) AS n_incident_users,
           CAST(coalesce(max(p.n_purchases_inside), 0) AS BIGINT)
               AS n_purchases_inside,
           coalesce(max(p.value_inside), 0.0) AS value_inside
    FROM incident i LEFT JOIN per_day p ON p.d = i.d
    GROUP BY i.d
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join with *derived* intervals: each user's
    daily error window [first error, last error] becomes an interval,
    and purchases falling inside it are attributed to the incident —
    "what did users still buy while things were broken".  The join is
    the scalable interval-join shape: equi keys (user, day) carry the
    shuffle, the interval containment is a residual predicate — never
    a cross product, unlike a naive ts-range join (q_join_range covers
    the banded variant).  Interval build and probe share one scan
    lineage; per-day rollup keeps the output calendar-sized."""
    ev = load_table(spark, sf_dir, "events")
    d_col = F.col("ts").cast("date")
    incident = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", d_col.alias("d"))
        .agg(F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), d_col.alias("p_d"), "ts", "value"
    )
    inside = pur.join(
        incident,
        (F.col("p_uid") == F.col("user_id"))
        & (F.col("p_d") == F.col("d"))
        & F.col("ts").between(F.col("s_ts"), F.col("e_ts")),
    )
    per_day = inside.groupBy("d").agg(
        F.count("*").alias("n_purchases_inside"),
        F.round(F.sum("value"), 4).alias("value_inside"),
    )
    return (
        incident.join(per_day, "d", "left")
        .groupBy(F.col("d").cast("string").alias("d"))
        .agg(
            F.countDistinct("user_id").alias("n_incident_users"),
            F.coalesce(F.max("n_purchases_inside"), F.lit(0)).alias(
                "n_purchases_inside"
            ),
            F.coalesce(F.max("value_inside"), F.lit(0.0)).alias(
                "value_inside"
            ),
        )
    )


@query(
    "q_ev_sessionpath",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS sid
        FROM g
    ),
    paths AS (
        SELECT user_id, sid,
               array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:5], '>')
                   AS path
        FROM s GROUP BY user_id, sid
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 10
    """,
)
def q_ev_sessionpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session paths: each 30-min-gap session reduced to the '>'
    joined sequence of its first 5 event types, ranked by frequency —
    the "how do journeys start" view funnel analysis begins with
    (q_ev_funnel checks one hypothesis; this surfaces the hypotheses).
    Sessionization is native ``session_window`` (same boundary
    semantics as q_ev_session, which the oracle's lag/cumsum
    formulation pins); the path string is built array-side from the
    deterministically sorted (ts, event_id) struct list, so no ARRAY
    reaches the output.  Top-10 is TakeOrderedAndProject over the
    bounded path dimension."""
    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.expr(
                "array_join(transform(slice(sort_array("
                "collect_list(struct(ts, event_id, event_type))), 1, 5),"
                " s -> s.event_type), '>')"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


@query(
    "q_ev_incremental",
    oracle=f"""
    WITH state0 AS (
        SELECT event_type, count(*) AS n0, sum(value) AS s0
        FROM events WHERE ts < TIMESTAMP '{_T0}' GROUP BY 1
    ),
    delta AS (
        SELECT event_type, count(*) AS nd, sum(value) AS sd
        FROM events WHERE ts >= TIMESTAMP '{_T0}' GROUP BY 1
    ),
    merged AS (
        SELECT coalesce(a.event_type, d.event_type) AS event_type,
               coalesce(a.n0, 0) + coalesce(d.nd, 0) AS n,
               coalesce(a.s0, 0) + coalesce(d.sd, 0) AS s
        FROM state0 a FULL OUTER JOIN delta d
            ON a.event_type = d.event_type
    ),
    direct AS (
        SELECT event_type, count(*) AS n, sum(value) AS s
        FROM events GROUP BY 1
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS merged_n,
           CAST(d.n AS BIGINT) AS direct_n,
           round(m.s, 4) AS merged_sum,
           round(d.s, 4) AS direct_sum,
           CAST(m.n = d.n AS BOOLEAN) AS counts_consistent
    FROM merged m JOIN direct d ON d.event_type = m.event_type
    """,
)
def q_ev_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the per-type running state as
    of T0 merged with the delta since T0 must equal the direct
    recompute — the mergeability property that lets an event→DB copier
    maintain aggregates by folding in each micro-batch instead of
    rescanning history.  The query materializes both sides and the
    consistency flag, so the differential check certifies the merge
    algebra (counts exactly; float sums to round-4, the honest
    equality for re-associated additions)."""
    ev = load_table(spark, sf_dir, "events")
    t0 = F.lit(_T0).cast("timestamp")

    def agg(df: DataFrame, n: str, s: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias(n), F.sum("value").alias(s)
        )

    state0 = agg(ev.filter(F.col("ts") < t0), "n0", "s0").withColumnRenamed(
        "event_type", "a_type"
    )
    delta = agg(ev.filter(F.col("ts") >= t0), "nd", "sd").withColumnRenamed(
        "event_type", "d_type"
    )
    merged = state0.join(
        delta, F.col("a_type") == F.col("d_type"), "full"
    ).select(
        F.coalesce("a_type", "d_type").alias("event_type"),
        (F.coalesce("n0", F.lit(0)) + F.coalesce("nd", F.lit(0))).alias("n"),
        (F.coalesce("s0", F.lit(0.0)) + F.coalesce("sd", F.lit(0.0))).alias(
            "s"
        ),
    )
    direct = agg(ev, "dn", "ds")
    return merged.join(direct, "event_type").select(
        "event_type",
        F.col("n").alias("merged_n"),
        F.col("dn").alias("direct_n"),
        F.round("s", 4).alias("merged_sum"),
        F.round("ds", 4).alias("direct_sum"),
        (F.col("n") == F.col("dn")).alias("counts_consistent"),
    )


_SPARK_UBUCKET = (
    "pmod(cast(conv(substr(md5(cast(cast(user_id as string) as binary)), 1, 15),"
    " 16, 10) as bigint), 10)"
)
_DUCK_UBUCKET = "(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 10)"


@query(
    "q_gdpr_purge",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN {_DUCK_UBUCKET} = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purged,
           CAST(sum(CASE WHEN {_DUCK_UBUCKET} = 0 THEN 0 ELSE 1 END)
                AS BIGINT) AS n_remaining,
           CAST(count(DISTINCT CASE WHEN {_DUCK_UBUCKET} <> 0
                                    THEN user_id END) AS BIGINT)
               AS remaining_users
    FROM events GROUP BY event_type
    """,
)
def q_gdpr_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure purge audit: a deterministic ~10 % forget-set
    of users (hash bucket 0 — standing in for a deletion-request
    table) swept across the event log, reporting per type how many
    rows the purge removes and what remains — the accounting a
    GDPR/CCPA deletion run must produce before rewriting 100 TB of
    partitions.  One scan, one aggregate; with a real request table
    the CASE becomes a broadcast left-semi mark, same plan shape."""
    ev = load_table(spark, sf_dir, "events")
    forget = F.expr(_SPARK_UBUCKET) == 0
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(forget, 1).otherwise(0)).alias("n_purged"),
        F.sum(F.when(forget, 0).otherwise(1)).alias("n_remaining"),
        F.countDistinct(
            F.when(~forget, F.col("user_id"))
        ).alias("remaining_users"),
    )


@query(
    "q_ev_funnel3",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'view' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    ),
    f AS (
        SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
               CASE WHEN s3.t3 IS NOT NULL
                    AND s3.t3 <= s1.t1 + INTERVAL 7 DAY
                    THEN 1 ELSE 0 END AS converted
        FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
                LEFT JOIN s3 ON s3.user_id = s1.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_stage1,
           CAST(count(t2) AS BIGINT) AS n_stage2,
           CAST(count(t3) AS BIGINT) AS n_stage3,
           CAST(sum(converted) AS BIGINT) AS n_converted_7d,
           round(sum(converted) * 1.0 / count(*), 4) AS conversion
    FROM f
    """,
)
def q_ev_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage ordered funnel (signup → view → purchase): each
    stage's timestamp must strictly follow the previous stage's first
    qualifying timestamp, and full conversion must land within 7 days
    of the signup — the N-step generalization of ``q_ev_funnel``'s
    two-step pattern, built by chaining per-stage min-timestamp
    reductions (each a keyed aggregate + join on user_id, so stage
    count scales linearly in shuffles, not combinatorially in state).
    The streaming twin is the applyInPandasWithState funnel
    (streaming/stateful.py) fed stage by stage."""
    ev = load_table(spark, sf_dir, "events")

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    f = (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "t1",
            "t2",
            "t3",
            F.when(
                F.col("t3").isNotNull()
                & (F.col("t3") <= F.col("t1") + F.expr("INTERVAL 7 DAYS")),
                1,
            )
            .otherwise(0)
            .alias("converted"),
        )
    )
    return f.agg(
        F.count("*").alias("n_stage1"),
        F.count("t2").alias("n_stage2"),
        F.count("t3").alias("n_stage3"),
        F.sum("converted").alias("n_converted_7d"),
        F.round(F.sum("converted") / F.count("*"), 4).alias("conversion"),
    )


@query(
    "q_ev_retention_curve",
    oracle="""
    WITH first_day AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events
        GROUP BY user_id
    ),
    tot AS (SELECT count(*) AS n_users FROM first_day),
    active AS (
        SELECT DISTINCT f.user_id,
               date_diff('day', f.d0, CAST(e.ts AS DATE)) AS k
        FROM events e JOIN first_day f ON f.user_id = e.user_id
        WHERE date_diff('day', f.d0, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
    )
    SELECT k, CAST(count(*) AS BIGINT) AS n_active,
           round(count(*) * 1.0 / max(t.n_users), 4) AS retention
    FROM active CROSS JOIN tot t
    GROUP BY k
    """,
)
def q_ev_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-k retention curve (k = 0..7): the share of all users active
    exactly k days after their own first-seen day — the fine-grained
    sibling of ``q_ev_cohort``'s weekly matrix, and the curve growth
    dashboards plot.  Per-user first day is one keyed aggregate; the
    re-join to events stays on the user_id shuffle; distinct
    (user, offset) bounds the second aggregate's input by 8·|users|.
    The total-user count is a broadcast scalar (same shape as
    q_subquery_scalar)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    first_day = ev.groupBy("user_id").agg(F.min(d).alias("d0"))
    tot = first_day.agg(F.count("*").alias("n_users"))
    active = (
        ev.select("user_id", d.alias("d"))
        .join(first_day, "user_id")
        .select("user_id", F.datediff("d", "d0").alias("k"))
        .filter(F.col("k").between(0, 7))
        .distinct()
    )
    return (
        active.crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_active"),
            F.round(F.count("*") / F.max("n_users"), 4).alias("retention"),
        )
    )


@query(
    "q_ev_lifecycle",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
        FROM events
    ),
    seq AS (
        SELECT user_id, w,
               lag(w)  OVER (PARTITION BY user_id ORDER BY w) AS pw,
               lead(w) OVER (PARTITION BY user_id ORDER BY w) AS nw
        FROM active
    ),
    maxw AS (SELECT max(w) AS mw FROM active),
    cls AS (
        SELECT w,
               CASE WHEN pw IS NULL THEN 'new'
                    WHEN date_diff('day', pw, w) = 7 THEN 'retained'
                    ELSE 'resurrected' END AS status
        FROM seq
    ),
    churn AS (
        SELECT w + INTERVAL 7 DAY AS w, count(*) AS n_churned
        FROM seq CROSS JOIN maxw
        WHERE (nw IS NULL OR date_diff('day', w, nw) > 7)
          AND w + INTERVAL 7 DAY <= mw
        GROUP BY 1
    )
    SELECT CAST(c.w AS VARCHAR) AS week,
           CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(coalesce(max(ch.n_churned), 0) AS BIGINT) AS n_churned
    FROM cls c LEFT JOIN churn ch ON CAST(ch.w AS DATE) = c.w
    GROUP BY c.w
    """,
)
def q_ev_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: every active (user, week) classified as new /
    retained / resurrected, plus the churn ledger (active in week w,
    silent in w+7, attributed to w+7) — the four numbers every growth
    dashboard decomposes engagement into, and a direct consumer of the
    copied event log.  One distinct-aggregate builds the (user, week)
    activity set; a single user-partitioned window yields both
    neighbors; churn needs no extra scan (it is the lead-gap read in
    reverse).  The week-end boundary is closed against the global max
    week (broadcast scalar) so the last observable week never reports
    phantom churn."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    wdw = Window.partitionBy("user_id").orderBy("w")
    seq = active.select(
        "user_id",
        "w",
        F.lag("w").over(wdw).alias("pw"),
        F.lead("w").over(wdw).alias("nw"),
    )
    maxw = active.agg(F.max("w").alias("mw"))
    status = (
        F.when(F.col("pw").isNull(), "new")
        .when(F.datediff("w", "pw") == 7, "retained")
        .otherwise("resurrected")
    )
    cls = seq.select("w", status.alias("status"))
    churn = (
        seq.crossJoin(F.broadcast(maxw))
        .filter(
            (F.col("nw").isNull() | (F.datediff("nw", "w") > 7))
            & (F.date_add("w", 7) <= F.col("mw"))
        )
        .groupBy(F.date_add("w", 7).alias("w"))
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        cls.groupBy("w")
        .agg(
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias(
                "n_new"
            ),
            F.sum(
                F.when(F.col("status") == "retained", 1).otherwise(0)
            ).alias("n_retained"),
            F.sum(
                F.when(F.col("status") == "resurrected", 1).otherwise(0)
            ).alias("n_resurrected"),
        )
        .join(churn, "w", "left")
        .select(
            F.col("w").cast("string").alias("week"),
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


@query(
    "q_ev_interpolate",
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
    ctx AS (
        SELECT g.user_id, g.d,
               last_value(dv.value IGNORE NULLS) OVER wp AS vp,
               last_value(dv.d IGNORE NULLS) OVER wp AS dp,
               first_value(dv.value IGNORE NULLS) OVER wn AS vn,
               first_value(dv.d IGNORE NULLS) OVER wn AS dn
        FROM grid g
        LEFT JOIN dv ON dv.user_id = g.user_id AND dv.d = g.d
        WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY g.user_id ORDER BY g.d
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    interp AS (
        SELECT d,
               CASE WHEN dp = dn THEN vp
                    WHEN dp IS NOT NULL AND dn IS NOT NULL
                    THEN vp + (vn - vp) * date_diff('day', dp, d)
                             / date_diff('day', dp, dn)
               END AS v
        FROM ctx
    )
    SELECT CAST(d AS VARCHAR) AS d,
           CAST(count(v) AS BIGINT) AS n_defined,
           round(avg(v), 4) AS avg_interp
    FROM interp GROUP BY d
    """,
)
def q_ev_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling: the daily grid again
    (q_ev_resample's spine), but interior gaps are filled by the
    straight line between the surrounding observations instead of
    carrying the last one — the other standard resampling mode, needing
    both window directions (last-non-null preceding AND first-non-null
    following) plus the *days* those values came from.  Outside the
    observed range the series stays NULL (no extrapolation), which the
    defined-count column makes visible.  Same scale shape as LOCF: two
    frames over one user_id shuffle."""
    ev = load_table(spark, sf_dir, "events")
    d_col = F.col("ts").cast("date")
    w_day = Window.partitionBy("user_id", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    dv = (
        ev.select("user_id", d_col.alias("d"), "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select("user_id", "d", F.col("value").alias("obs"))
    )
    span = ev.agg(F.min(d_col).alias("lo"), F.max(d_col).alias("hi"))
    spine = span.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    grid = ev.select("user_id").distinct().crossJoin(F.broadcast(spine))
    wp = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("obs").isNotNull(), F.col("d"))
    ctx = grid.join(dv, ["user_id", "d"], "left").select(
        "user_id",
        "d",
        F.last("obs", ignorenulls=True).over(wp).alias("vp"),
        F.last(obs_d, ignorenulls=True).over(wp).alias("dp"),
        F.first("obs", ignorenulls=True).over(wn).alias("vn"),
        F.first(obs_d, ignorenulls=True).over(wn).alias("dn"),
    )
    v = F.when(F.col("dp") == F.col("dn"), F.col("vp")).when(
        F.col("dp").isNotNull() & F.col("dn").isNotNull(),
        F.col("vp")
        + (F.col("vn") - F.col("vp"))
        * F.datediff("d", "dp")
        / F.datediff("dn", "dp"),
    )
    return (
        ctx.select("d", v.alias("v"))
        .groupBy(F.col("d").cast("string").alias("d"))
        .agg(
            F.count("v").alias("n_defined"),
            F.round(F.avg("v"), 4).alias("avg_interp"),
        )
    )


@query(
    "q_ev_shipping_lag",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           round(avg(date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE))), 4) AS avg_lag_d,
           round(quantile_cont(date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)), 0.5), 4)
               AS median_lag_d,
           CAST(max(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE))) AS BIGINT)
               AS max_lag_d,
           CAST(sum(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                        CAST(l.l_shipdate AS DATE)) > 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_over_60d
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_ev_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency profile per priority class: the fulfilment
    SLA view of the star schema (avg / median / max lag in whole days
    + the over-60-day violation count).  The day difference is an
    exact integer in both engines; the median interpolates identically
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``).  One shuffled
    fact⋈dim-key join, one aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.avg(lag), 4).alias("avg_lag_d"),
            F.round(F.percentile(lag, F.lit(0.5)), 4).alias("median_lag_d"),
            F.max(lag).cast("long").alias("max_lag_d"),
            F.sum(F.when(lag > 60, 1).otherwise(0)).alias("n_over_60d"),
        )
    )


@query(
    "q_win_wow_growth",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               CAST(date_trunc('week', ts) AS DATE) AS w,
               count(*) AS n,
               sum(value) AS rev
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(w AS VARCHAR) AS week,
           CAST(n AS BIGINT) AS n,
           round(rev, 4) AS rev,
           round((rev - lag(rev) OVER (PARTITION BY event_type ORDER BY w))
                 / lag(rev) OVER (PARTITION BY event_type ORDER BY w), 4)
               AS wow_growth
    FROM weekly
    """,
)
def q_win_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth rate per event type — the trend metric
    layered on a pre-aggregate: events collapse to (type × week) rows
    first, so the lag window runs over a calendar-bounded input
    (weeks, not events) and the first week's growth is honestly NULL.
    One shuffle for the aggregate; the window reuses the type
    partitioning."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        F.date_trunc("week", "ts").cast("date").alias("w"),
    ).agg(F.count("*").alias("n"), F.sum("value").alias("rev"))
    wdw = Window.partitionBy("event_type").orderBy("w")
    prev = F.lag("rev").over(wdw)
    return weekly.select(
        "event_type",
        F.col("w").cast("string").alias("week"),
        "n",
        F.round("rev", 4).alias("rev"),
        F.round((F.col("rev") - prev) / prev, 4).alias("wow_growth"),
    )


@query(
    "q_ev_autocorr",
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
    lagged AS (
        SELECT event_type, c,
               lag(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS c1,
               lag(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS c7
        FROM series
    ),
    sums AS (
        SELECT event_type,
               count(c1) AS n1,
               sum(CASE WHEN c1 IS NOT NULL THEN c END) AS sx1,
               sum(c1) AS sy1,
               sum(CASE WHEN c1 IS NOT NULL THEN c * c1 END) AS sxy1,
               sum(CASE WHEN c1 IS NOT NULL THEN c * c END) AS sxx1,
               sum(c1 * c1) AS syy1,
               count(c7) AS n7,
               sum(CASE WHEN c7 IS NOT NULL THEN c END) AS sx7,
               sum(c7) AS sy7,
               sum(CASE WHEN c7 IS NOT NULL THEN c * c7 END) AS sxy7,
               sum(CASE WHEN c7 IS NOT NULL THEN c * c END) AS sxx7,
               sum(c7 * c7) AS syy7
        FROM lagged GROUP BY 1
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_days,
           round(CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE)
                 / sqrt(CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE)
                        * CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)), 4)
               AS r_lag1,
           round(CAST(n7 * sxy7 - sx7 * sy7 AS DOUBLE)
                 / sqrt(CAST(n7 * sxx7 - sx7 * sx7 AS DOUBLE)
                        * CAST(n7 * syy7 - sy7 * sy7 AS DOUBLE)), 4)
               AS r_lag7
    FROM sums
    """,
)
def q_ev_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series per type at
    lags 1 and 7 — the seasonality screen (a high r_lag7 with a low
    r_lag1 is a weekly cycle) run over a metrics copy before choosing
    a forecasting model.

    Determinism: the series is zero-filled onto the complete daily
    grid so both engines correlate identical vectors, and Pearson r is
    assembled from six BIGINT sums (counts are integers, so every
    moment is exact — no engine-private incremental co-moment like
    ``corr()`` is trusted across engines); the final expression is one
    identical float formula per row.  Scale: the window runs over the
    per-(type, day) aggregate — bounded by calendar days, not events.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    span = ev.agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
    grid = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count("*").alias("c")
    )
    series = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(grid))
        .join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = series.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 7).over(w).alias("c7"),
    )
    def _sums(k: str):
        ck = F.col(f"c{k}")
        return [
            F.count(ck).alias(f"n{k}"),
            F.sum(F.when(ck.isNotNull(), F.col("c"))).alias(f"sx{k}"),
            F.sum(ck).alias(f"sy{k}"),
            F.sum(F.when(ck.isNotNull(), F.col("c") * ck)).alias(f"sxy{k}"),
            F.sum(F.when(ck.isNotNull(), F.col("c") * F.col("c"))).alias(
                f"sxx{k}"
            ),
            F.sum(ck * ck).alias(f"syy{k}"),
        ]
    sums = lagged.groupBy("event_type").agg(*(_sums("1") + _sums("7")))
    def _r(k: str):
        return F.round(
            F.expr(
                f"cast(n{k} * sxy{k} - sx{k} * sy{k} as double)"
                f" / sqrt(cast(n{k} * sxx{k} - sx{k} * sx{k} as double)"
                f" * cast(n{k} * syy{k} - sy{k} * sy{k} as double))"
            ),
            4,
        )
    return sums.select(
        "event_type",
        F.col("n1").cast("long").alias("n_days"),
        _r("1").alias("r_lag1"),
        _r("7").alias("r_lag7"),
    )


@query(
    "q_ev_cusum",
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
    pre AS (
        SELECT event_type, day, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS prefix,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
               sum(c) OVER (PARTITION BY event_type) AS total,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM series
    ),
    drift AS (
        SELECT event_type, day, prefix, t, total, nd,
               abs(nd * prefix - t * total) AS adrift,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY abs(nd * prefix - t * total) DESC, day) AS rk
        FROM pre
    )
    SELECT event_type,
           CAST(day AS VARCHAR) AS changepoint_day,
           round(adrift / CAST(nd AS DOUBLE), 4) AS cusum_stat,
           round(CAST(prefix AS DOUBLE) / t, 4) AS mean_before,
           round(CAST(total - prefix AS DOUBLE) / nullif(nd - t, 0), 4)
               AS mean_after
    FROM drift WHERE rk = 1
    """,
)
def q_ev_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the day where the
    cumulative deviation of the daily count from its overall mean
    peaks — the level-shift detector run over a copied metrics stream
    (deploy regressions, traffic shifts) before alerting on it.

    The drift statistic S_t = Σ_{i≤t}(c_i − mean) is carried as the
    exact integer nd·prefix_t − t·total (multiplying through by nd
    avoids the float mean), so the argmax is an exact-integer
    comparison with a calendar tie-break — no float-argmax divergence
    between engines (SURVEY §7.5).  Windows run over the per-(type,
    day) aggregate: bounded by calendar days, partitioned by type.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    span = ev.agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
    grid = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count("*").alias("c")
    )
    series = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(grid))
        .join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("c", F.lit(0)).alias("c"))
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    wp = Window.partitionBy("event_type")
    pre = series.select(
        "event_type",
        "day",
        F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "prefix"
        ),
        F.row_number().over(wo).alias("t"),
        F.sum("c").over(wp).alias("total"),
        F.count("*").over(wp).alias("nd"),
    )
    adrift = F.abs(
        F.col("nd") * F.col("prefix") - F.col("t") * F.col("total")
    )
    drift = pre.select(
        "event_type",
        "day",
        "prefix",
        "t",
        "total",
        "nd",
        adrift.alias("adrift"),
        F.row_number()
        .over(wo.orderBy(adrift.desc(), F.col("day")))
        .alias("rk"),
    )
    return drift.where(F.col("rk") == 1).select(
        "event_type",
        F.col("day").cast("string").alias("changepoint_day"),
        F.round(F.col("adrift") / F.col("nd").cast("double"), 4).alias(
            "cusum_stat"
        ),
        F.round(F.col("prefix").cast("double") / F.col("t"), 4).alias(
            "mean_before"
        ),
        F.round(
            (F.col("total") - F.col("prefix")).cast("double")
            / F.expr("nullif(nd - t, 0)"),
            4,
        ).alias("mean_after"),
    )


@query(
    "q_ev_bitemporal",
    oracle=f"""
    WITH bt AS (
        SELECT user_id, event_id, event_type, value, ts,
               ts + to_seconds(({_DUCK_AK}) % 3600) AS recorded_at
        FROM events
    ),
    known AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rk
        FROM bt
        WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
          AND recorded_at <= TIMESTAMP '2024-01-20 01:00:00'
    )
    SELECT user_id, event_id, event_type,
           round(value, 4) AS value,
           CAST(epoch_us(ts) AS BIGINT) AS valid_us
    FROM known WHERE rk = 1
    """,
)
def q_ev_bitemporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of query: each user's state at *valid time*
    2024-01-20 00:00 **as it was known at** *transaction time* 01:00 —
    the audit question ("what did the dashboard say then?") a plain
    as-of join cannot answer, because an event that had happened but
    had not yet been ingested must be excluded.

    The ingestion delay is synthesized deterministically (md5 of
    event_id, mod 1 h) so both engines see the identical bitemporal
    log; events valid before the cutoff but recorded after the
    transaction cutoff are the interesting exclusions.  Valid time is
    reported in exact epoch-µs.  Plan: one filtered scan, one
    per-user window with a unique (ts, event_id) tie-break.
    """
    ev = load_table(spark, sf_dir, "events")
    bt = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts",
        F.expr(f"timestampadd(SECOND, ({_SPARK_AK}) % 3600, ts)").alias(
            "recorded_at"
        ),
    )
    known = bt.where(
        (F.expr("ts <= timestamp'2024-01-20 00:00:00'"))
        & (F.expr("recorded_at <= timestamp'2024-01-20 01:00:00'"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        known.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.expr("unix_micros(ts)").alias("valid_us"),
        )
    )


@query(
    "q_alloc_budget",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT day, event_type, c,
               sum(c) OVER (PARTITION BY day) AS total
        FROM daily
    ),
    fl AS (
        SELECT day, event_type, c, total,
               (10000 * c) // total AS fl,
               (10000 * c) % total AS rem
        FROM tot
    ),
    lo AS (
        SELECT day, event_type, c, fl, rem,
               10000 - sum(fl) OVER (PARTITION BY day) AS leftover,
               row_number() OVER (
                   PARTITION BY day ORDER BY rem DESC, event_type) AS rk
        FROM fl
    )
    SELECT CAST(day AS VARCHAR) AS day, event_type,
           CAST(c AS BIGINT) AS n_events,
           CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS alloc
    FROM lo
    """,
)
def q_alloc_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional budget allocation with largest-remainder rounding:
    a fixed 10 000-unit daily budget (sampling quota, rate limit,
    labeling spend) split across event types proportional to their
    counts, with Hamilton's method distributing the rounding leftover
    to the largest fractional remainders.

    The classic apportionment op a training-data pipeline uses to turn
    fractional sampling rates into exact per-class quotas that sum to
    the budget.  Every step is integer arithmetic (floor-div mod,
    remainder rank with a type tie-break), so the allocation
    value-hashes across engines and Σalloc = 10 000 per day by
    construction.  Windows run over the per-(day, type) aggregate —
    five rows per day — partitioned by day.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("c"))
    wd = Window.partitionBy("day")
    tot = daily.select(
        "day", "event_type", "c", F.sum("c").over(wd).alias("total")
    )
    fl = tot.select(
        "day",
        "event_type",
        "c",
        F.expr("(10000 * c) div total").alias("fl"),
        F.expr("(10000 * c) % total").alias("rem"),
    )
    lo = fl.select(
        "day",
        "event_type",
        "c",
        "fl",
        "rem",
        (F.lit(10000) - F.sum("fl").over(wd)).alias("leftover"),
        F.row_number()
        .over(wd.orderBy(F.col("rem").desc(), F.col("event_type")))
        .alias("rk"),
    )
    return lo.select(
        F.col("day").cast("string").alias("day"),
        "event_type",
        F.col("c").cast("long").alias("n_events"),
        (
            F.col("fl")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


@query(
    "q_ev_survival",
    oracle="""
    WITH lifespan AS (
        SELECT user_id,
               CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END)
                         IS NOT NULL
                    THEN date_diff('day', CAST(min(ts) AS DATE),
                         CAST(min(CASE WHEN event_type = 'purchase' THEN ts
                                  END) AS DATE))
                    ELSE date_diff('day', CAST(min(ts) AS DATE),
                                   CAST(max(ts) AS DATE))
               END AS t_last,
               CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END)
                         IS NOT NULL THEN 1 ELSE 0 END AS churned
        FROM events GROUP BY user_id
    ),
    n0 AS (SELECT count(*) AS n FROM lifespan),
    ev AS (
        SELECT t_last AS t,
               sum(churned) AS d,
               count(*) AS leaving
        FROM lifespan GROUP BY t_last
    ),
    risk AS (
        SELECT t, d,
               n0.n - coalesce(sum(leaving) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n_at_risk
        FROM ev CROSS JOIN n0
    ),
    km AS (
        SELECT t, d, n_at_risk,
               sum(CASE WHEN d < n_at_risk
                        THEN ln(1 - CAST(d AS DOUBLE) / n_at_risk)
                        ELSE 0e0 END) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnS,
               max(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS hit_zero
        FROM risk
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(d AS BIGINT) AS n_churned,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CASE WHEN hit_zero = 1 THEN 0e0 ELSE round(exp(lnS), 4) END
               AS survival
    FROM km WHERE d > 0
    """,
)
def q_ev_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase: per
    user, the days from first event to first ``purchase`` event;
    users who never purchase are right-censored at their last observed
    day instead of being dropped or counted as converted.  S(t) =
    Π(1 − dᵢ/nᵢ) over conversion days — the correctly-censored
    time-to-event estimate (median time-to-convert) a growth team
    reads off an event-log copy, where naive "average days to
    purchase" over converters only is biased low.

    Float discipline: the KM product is computed as exp of the
    *ordered* cumulative sum of ln(1 − d/n) — an ordered window prefix
    is evaluated left-to-right over identically-sorted rows in both
    engines, so every partial sum is bit-identical (unordered float
    SUMs across engines are banned, ordered prefixes are not).  The
    at-risk counts are exact integers via a 1-PRECEDING prefix; the
    day the last at-risk users convert (d = n) takes S to exactly 0
    through a guarded branch instead of ln(0).

    Scale: per-user lifespans are one keyed aggregate; the curve
    itself lives on the per-day event table (bounded by calendar span,
    a single ordered window over ≤ a few thousand rows at any SF).
    """
    ev = load_table(spark, sf_dir, "events")
    first_purchase = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    )
    lifespan = ev.groupBy("user_id").agg(
        F.when(
            first_purchase.isNotNull(),
            F.datediff(F.to_date(first_purchase), F.min(F.to_date("ts"))),
        )
        .otherwise(F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))))
        .alias("t_last"),
        F.when(first_purchase.isNotNull(), 1).otherwise(0).alias("churned"),
    ).select("t_last", "churned")
    n0 = lifespan.agg(F.count("*").alias("n"))
    evt = lifespan.groupBy(F.col("t_last").alias("t")).agg(
        F.sum("churned").alias("d"), F.count("*").alias("leaving")
    )
    wo = Window.orderBy("t")
    risk = evt.crossJoin(F.broadcast(n0)).select(
        "t",
        "d",
        (
            F.col("n")
            - F.coalesce(
                F.sum("leaving").over(
                    wo.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("n_at_risk"),
    )
    wcum = wo.rowsBetween(Window.unboundedPreceding, 0)
    km = risk.select(
        "t",
        "d",
        "n_at_risk",
        F.sum(
            F.when(
                F.col("d") < F.col("n_at_risk"),
                F.log(
                    F.lit(1) - F.col("d").cast("double") / F.col("n_at_risk")
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(wcum)
        .alias("lnS"),
        F.max(
            F.when(F.col("d") >= F.col("n_at_risk"), 1).otherwise(0)
        )
        .over(wcum)
        .alias("hit_zero"),
    )
    return km.where(F.col("d") > 0).select(
        F.col("t").cast("long").alias("t_days"),
        F.col("d").cast("long").alias("n_churned"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("lnS"), 4))
        .alias("survival"),
    )


@query(
    "q_win_drawdown",
    oracle="""
    WITH signed AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN -value
                    ELSE value END AS flow
        FROM events
    ),
    eq AS (
        SELECT user_id, ts, event_id,
               sum(flow) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS equity
        FROM signed
    ),
    cum AS (
        SELECT user_id, equity,
               max(equity) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS peak
        FROM eq
    )
    SELECT user_id,
           round(max(peak - equity), 4) AS max_drawdown,
           round(max(peak), 4) AS peak_equity
    FROM cum
    GROUP BY user_id
    HAVING max(peak - equity) > 0
    """,
)
def q_win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the signed cumulative ledger
    (purchases debit, everything else credits): the largest
    peak-to-trough fall of the running balance in (ts, event_id)
    order — the risk metric every trading/credit/usage ledger derives
    from an event-log copy (and a double-stacked window: a running
    max *of* a running sum).

    Float discipline: both the prefix sum and its running max are
    *ordered* windows — evaluated left-to-right over the identical
    (ts, event_id) total order in both engines, so every intermediate
    is bit-identical; the final per-user max compares identical values
    (order-free).  One shuffle on user_id serves both windows and the
    final aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flow = F.when(
        F.col("event_type") == "purchase", -F.col("value")
    ).otherwise(F.col("value"))
    cum = ev.select(
        "user_id", "ts", "event_id", flow.alias("flow")
    ).withColumn("equity", F.sum("flow").over(w)).withColumn(
        "peak", F.max("equity").over(w)
    )
    return (
        cum.groupBy("user_id")
        .agg(
            F.round(F.max(F.col("peak") - F.col("equity")), 4).alias(
                "max_drawdown"
            ),
            F.round(F.max("peak"), 4).alias("peak_equity"),
        )
        .where(F.col("max_drawdown") > 0)
    )


@query(
    "q_ev_rollup_cascade",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(min(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS min_c,
           CAST(max(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS max_c
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_ev_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup maintenance (hypertable continuous-
    aggregate pattern): the day grain produced by cascading raw →
    minute → hour → day, where each level reduces the next-finer
    *aggregate* rather than rescanning the fact.

    The oracle aggregates raw directly at day grain — hash-equality
    proves the re-aggregation laws (counts/sums re-sum, min/max
    re-min/max on exact cents) hold through two cascade hops.  Scan
    economy and streaming maintenance are pinned in
    tests/test_streaming.py::test_rollup_cascade_equals_direct_aggregation.
    """
    from events_to_db_spark.streaming.rollup import cascade

    ev = load_table(spark, sf_dir, "events")
    day = cascade(ev)["day"]
    return day.select(
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_c").cast("bigint").alias("sum_c"),
        F.col("min_c").cast("bigint").alias("min_c"),
        F.col("max_c").cast("bigint").alias("max_c"),
    ).orderBy("day", "event_type")


@query(
    "q_ev_funnel_unordered",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type AS etype, min(epoch_us(ts)) AS fus
        FROM events
        WHERE event_type IN ('signup', 'view', 'purchase')
        GROUP BY 1, 2
    ),
    j AS (
        SELECT user_id,
               count(*) AS n_types,
               first(etype ORDER BY fus, etype) AS first_type,
               max(fus) - min(fus) AS span_us
        FROM firsts
        GROUP BY user_id
    )
    SELECT first_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN span_us <= CAST(604800000000 AS BIGINT)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within7,
           CAST(sum(span_us // 1000000) AS BIGINT) AS sum_span_s,
           round(CAST(sum(span_us // 1000000) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 4) AS avg_span_s
    FROM j
    WHERE n_types = 3
    GROUP BY first_type
    """,
)
def q_ev_funnel_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered (any-sequence) funnel: a user completes when all
    three stage types have occurred, in any order — completion span =
    last FIRST-TOUCH minus first FIRST-TOUCH, the complement of
    q_ev_funnel3's strict-order semantics.  Grouped by which stage the
    user entered through (exact (µs, type) tie-break via ``min_by``
    over a struct on the Spark side ↔ ``first(… ORDER BY)`` in
    DuckDB — SURVEY §7.5 unique tie-breaks).  Spans are exact integer
    µs, floored to seconds with integer division (never a double
    quotient — the µs-gap discipline), and the 7-day completion gate
    compares integers.

    Two keyed hash aggregates on the user shuffle — no windows, no
    self-joins: first-touch extraction is map-side combinable, so this
    holds at any user cardinality.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = (
        ev.where(F.col("event_type").isin("signup", "view", "purchase"))
        .select(
            "user_id",
            F.col("event_type").alias("etype"),
            F.unix_micros("ts").alias("us"),
        )
        .groupBy("user_id", "etype")
        .agg(F.min("us").alias("fus"))
    )
    j = firsts.groupBy("user_id").agg(
        F.count("*").alias("n_types"),
        F.expr("min_by(etype, struct(fus, etype))").alias("first_type"),
        (F.max("fus") - F.min("fus")).alias("span_us"),
    )
    # integer-div seconds: span_us is non-negative so floor == trunc
    spans = j.where(F.col("n_types") == 3).select(
        "first_type",
        "span_us",
        F.expr("span_us div 1000000").alias("span_s"),
    )
    return spans.groupBy("first_type").agg(
        F.count("*").alias("n_users"),
        F.sum(
            (F.col("span_us") <= F.lit(7 * 86400 * 1_000_000)).cast("bigint")
        ).alias("n_within7"),
        F.sum("span_s").alias("sum_span_s"),
        F.round(
            F.sum("span_s").cast("double") / F.count("*").cast("double"), 4
        ).alias("avg_span_s"),
    )


@query(
    "q_ord_o2c",
    oracle="""
    WITH cyc AS (
        SELECT o.o_orderpriority AS prio,
               datediff('day', CAST(o.o_orderdate AS DATE),
                        max(CAST(l.l_shipdate AS DATE))) AS days
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT prio,
           CAST(count(*) AS BIGINT)          AS n_orders,
           CAST(sum(days) AS BIGINT)         AS sum_days,
           round(CAST(sum(days) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 4) AS avg_days,
           CAST(max(days) AS BIGINT)         AS max_days,
           round(quantile_cont(days, 0.9), 4) AS p90_days
    FROM cyc
    GROUP BY prio
    """,
)
def q_ord_o2c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-cash cycle time: days from order placement to the
    LAST line shipment of that order (the order completes when its
    slowest line ships), rolled up per order priority — the
    multi-table latency-chain metric an operations team tracks.
    Day deltas are exact integer calendar-day differences (DATE-cast
    on both sides; DuckDB ``datediff('day', …)`` on DATEs counts
    whole days, matching Spark's ``datediff``), the mean is one
    division of exact integers, and p90 interpolates identically
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` on integer
    inputs — established by q_agg_percentile_cont).

    Two shuffles: per-order max-shipdate (keyed by orderkey — at
    100 TB this is the natural co-partitioning of orders×lineitem,
    bucket-ready), then the 5-row priority rollup.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cyc = (
        o.select("o_orderkey", "o_orderpriority", "o_orderdate")
        .join(li.select("l_orderkey", "l_shipdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"))
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.datediff("last_ship", F.col("o_orderdate").cast("date")).alias(
                "days"
            ),
        )
    )
    return cyc.groupBy("prio").agg(
        F.count("*").alias("n_orders"),
        F.sum("days").cast("bigint").alias("sum_days"),
        F.round(
            F.sum("days").cast("double") / F.count("*").cast("double"), 4
        ).alias("avg_days"),
        F.max("days").cast("bigint").alias("max_days"),
        F.round(F.percentile(F.col("days"), F.lit(0.9)), 4).alias("p90_days"),
    )


@query(
    "q_alloc_fifo",
    oracle="""
    WITH li AS (
        SELECT l.l_partkey,
               CAST(l.l_quantity AS BIGINT) AS qty,
               CAST(coalesce(sum(CAST(l.l_quantity AS BIGINT)) OVER (
                   PARTITION BY l.l_partkey
                   ORDER BY l.l_shipdate, l.l_orderkey, l.l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM lineitem l
    ),
    a AS (
        SELECT p.p_brand, li.qty,
               greatest(CAST(0 AS BIGINT),
                        least(li.qty,
                              CAST(p.p_size AS BIGINT) * 10
                              - li.cum_before)) AS alloc
        FROM li JOIN part p ON p.p_partkey = li.l_partkey
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(qty) AS BIGINT) AS demand_qty,
           CAST(sum(alloc) AS BIGINT) AS alloc_qty,
           CAST(sum(alloc) * 10000 // sum(qty) AS BIGINT) AS fill_bps,
           CAST(sum(CASE WHEN alloc = qty THEN 1 ELSE 0 END) AS BIGINT)
               AS n_full,
           CAST(sum(CASE WHEN alloc > 0 AND alloc < qty THEN 1 ELSE 0 END)
                AS BIGINT) AS n_partial,
           CAST(sum(CASE WHEN alloc = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_starved
    FROM a
    GROUP BY p_brand
    """,
)
def q_alloc_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO supply allocation: each part has a finite supply cap
    (``p_size × 10`` units) consumed by its lineitems in ship-date
    order; a line gets ``clamp(cap − already_consumed, 0, qty)`` units.
    The classic warehouse fill/backorder computation — an inherently
    order-dependent business rule expressed as one partitioned running
    sum, no iteration.

    Determinism: quantities are integral by construction, the running
    consumption is a BIGINT prefix sum with the unique
    (shipdate, orderkey, linenumber) tie-break, fill rate is integer
    basis points (floor division) — no floats anywhere.  Plan: one
    shuffle on partkey for the window, broadcast part dim, one hash
    aggregate on brand; per-part sequential semantics parallelize
    across parts, which is exactly how it scales to 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    consumed = li.select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.coalesce(
            F.sum(F.col("l_quantity").cast("bigint")).over(w), F.lit(0)
        ).alias("cum_before"),
    )
    a = consumed.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "p_brand",
        "qty",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(
                F.col("qty"),
                F.col("p_size").cast("bigint") * 10 - F.col("cum_before"),
            ),
        ).alias("alloc"),
    )
    return a.groupBy("p_brand").agg(
        F.count("*").alias("n_lines"),
        F.sum("qty").alias("demand_qty"),
        F.sum("alloc").alias("alloc_qty"),
        F.expr("sum(alloc) * 10000 div sum(qty)").alias("fill_bps"),
        F.sum(F.when(F.col("alloc") == F.col("qty"), 1).otherwise(0)).alias(
            "n_full"
        ),
        F.sum(
            F.when(
                (F.col("alloc") > 0) & (F.col("alloc") < F.col("qty")), 1
            ).otherwise(0)
        ).alias("n_partial"),
        F.sum(F.when(F.col("alloc") == 0, 1).otherwise(0)).alias(
            "n_starved"
        ),
    )


@query(
    "q_ev_abandonment",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, epoch_us(ts) AS us,
               CAST(ts AS DATE) AS day
        FROM events WHERE event_type = 'click'
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(sum(CASE WHEN NOT EXISTS (
                    SELECT 1 FROM events p
                    WHERE p.event_type = 'purchase'
                      AND p.user_id = c.user_id
                      AND epoch_us(p.ts) > c.us
                      AND epoch_us(p.ts) <= c.us + 3600000000
                ) THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
           CAST(sum(CASE WHEN NOT EXISTS (
                    SELECT 1 FROM events p
                    WHERE p.event_type = 'purchase'
                      AND p.user_id = c.user_id
                      AND epoch_us(p.ts) > c.us
                      AND epoch_us(p.ts) <= c.us + 3600000000
                ) THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
               AS abandon_bps
    FROM c
    GROUP BY day
    """,
)
def q_ev_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed-absence anti-join (cart abandonment): a click is
    abandoned when the same user makes NO purchase in the following
    hour.  The batch twin of the streaming left-outer stream-stream
    join's null-extension — "A not followed by B within horizon" is the
    negative-pattern primitive behind abandonment, SLA-breach, and
    churn-trigger queries.

    Plan: user-equi anti join with the (0, 1 h] band as the join-time
    range predicate — co-partitioned on user_id, no quadratic blowup;
    exact integer-µs window arithmetic (epoch-µs compares, never a
    float gap); abandonment rate in integer basis points.  Day output
    is VARCHAR (DATE canonicalizer hazard)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.expr("unix_micros(ts)").alias("c_us"),
        F.to_date("ts").alias("day"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.expr("unix_micros(ts)").alias("p_us"),
    )
    abandoned = clicks.join(
        purch,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_us") > F.col("c_us"))
        & (F.col("p_us") <= F.col("c_us") + 3600000000),
        "left_anti",
    )
    base = clicks.groupBy("day").agg(F.count("*").alias("n_clicks"))
    ab = abandoned.groupBy("day").agg(F.count("*").alias("n_abandoned"))
    return (
        base.join(ab, "day", "left")
        .select(
            F.col("day").cast("string").alias("day"),
            "n_clicks",
            F.coalesce("n_abandoned", F.lit(0)).alias("n_abandoned"),
            F.expr(
                "coalesce(n_abandoned, 0) * 10000 div n_clicks"
            ).alias("abandon_bps"),
        )
    )


@query(
    "q_ev_proration",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(min(ts) AS DATE) AS d0,
               CAST(max(ts) AS DATE) AS d1
        FROM events GROUP BY 1
    ),
    bounds AS (
        SELECT date_trunc('month', min(d0)) AS m0,
               date_trunc('month', max(d1)) AS m1
        FROM u
    ),
    months AS (
        SELECT unnest(generate_series(m0, m1, INTERVAL 1 MONTH))::DATE
                   AS ms
        FROM bounds
    ),
    mm AS (
        SELECT ms,
               (ms + INTERVAL 1 MONTH - INTERVAL 1 DAY)::DATE AS me,
               date_part('day',
                   (ms + INTERVAL 1 MONTH - INTERVAL 1 DAY)::DATE) AS dim
        FROM months
    ),
    ol AS (
        SELECT mm.ms, mm.dim, u.user_id,
               date_diff('day',
                         greatest(u.d0, mm.ms),
                         least(u.d1, mm.me)) + 1 AS od
        FROM u JOIN mm ON u.d0 <= mm.me AND u.d1 >= mm.ms
    )
    SELECT CAST(ms AS VARCHAR) AS month_start,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(od) AS BIGINT) AS active_days,
           CAST(sum((3000 * od) // dim) AS BIGINT) AS billed_cents
    FROM ol
    GROUP BY ms
    """,
)
def q_ev_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subscription proration: each user is "subscribed" from their
    first to their last event day at a flat 3000¢/month; partial months
    bill pro-rata by day — ``3000·overlap_days // days_in_month``, the
    billing-engine kernel.

    Overlap days are exact DATE arithmetic (both engines count whole-
    day deltas on DATEs identically — the µs ambiguity never appears),
    the proration is integer floor division on positive operands, and
    the month spine comes from a generator over the global bounds (a
    two-scalar aggregate), broadcast onto the per-user interval table
    with a range predicate — |users|·|overlapped months| fan-out, the
    same shape billing actually runs at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("d0"),
        F.max("ts").cast("date").alias("d1"),
    )
    bounds = u.agg(
        F.date_trunc("month", F.min("d0")).cast("date").alias("m0"),
        F.date_trunc("month", F.max("d1")).cast("date").alias("m1"),
    )
    months = bounds.select(
        F.explode(
            F.expr("sequence(m0, m1, interval 1 month)")
        ).alias("ms")
    ).select(
        "ms",
        F.expr("last_day(ms)").alias("me"),
        F.expr("day(last_day(ms))").cast("long").alias("dim"),
    )
    ol = u.join(
        F.broadcast(months),
        (F.col("d0") <= F.col("me")) & (F.col("d1") >= F.col("ms")),
    ).select(
        "ms",
        "dim",
        (
            F.datediff(
                F.least(F.col("d1"), F.col("me")),
                F.greatest(F.col("d0"), F.col("ms")),
            )
            + 1
        ).cast("long").alias("od"),
    )
    return ol.groupBy("ms").agg(
        F.count("*").alias("n_users"),
        F.sum("od").cast("long").alias("active_days"),
        F.sum(F.expr("(3000 * od) div dim")).cast("long").alias(
            "billed_cents"
        ),
    ).select(
        F.col("ms").cast("string").alias("month_start"),
        "n_users",
        "active_days",
        "billed_cents",
    )


@query(
    "q_ev_forecast_holt",
    oracle="""
    WITH RECURSIVE d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    s AS (
        SELECT x, row_number() OVER (ORDER BY day) AS rn FROM d
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
    rec AS (
        SELECT rn, x, x AS l, CAST(0 AS BIGINT) AS b
        FROM s WHERE rn = 1
        UNION ALL
        SELECT s.rn, s.x,
               CAST(floor((s.x + r.l + r.b) / 2.0) AS BIGINT),
               CAST(floor((r.b + CAST(floor((s.x + r.l + r.b) / 2.0)
                                      AS BIGINT) - r.l) / 2.0) AS BIGINT)
        FROM rec r JOIN s ON s.rn = r.rn + 1
    )
    SELECT nn.n AS n_days,
           CAST(r.l AS BIGINT) AS level_cents,
           CAST(r.b AS BIGINT) AS trend_cents,
           CAST(r.l + 7 * r.b AS BIGINT) AS forecast_7d_cents,
           round((r.l + 7 * r.b) / 100e0, 2) AS forecast_7d
    FROM rec r CROSS JOIN nn WHERE r.rn = nn.n
    """,
)
def q_ev_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) forecast of daily purchase
    revenue, α = β = ½, as an exact integer fold: level and trend
    update by halving with an explicit FLOOR — and halving is the one
    float division that is always exact in binary, so
    ``floor((a+b+c)/2.0)`` is bit-identical in both engines with no
    truncate-vs-floor divergence even on negative trends.

    Order-dependent recursion, so the Spark side is the documented
    custom-operator tier (b): an ``applyInPandas`` fold over the
    day-ordered series (bounded at |days| rows per series — partition
    by series key when forecasting millions of series), while the
    oracle replays the identical recurrence as a recursive CTE.
    Output: final level/trend and the 7-day-ahead linear forecast.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
        )
        .withColumn("series", F.lit(1))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        xs = [int(v) for v in pdf["x"]]
        l, b = xs[0], 0
        for x in xs[1:]:
            l2 = (x + l + b) // 2  # python // floors — matches FLOOR(…/2.0)
            b = (b + l2 - l) // 2
            l = l2
        return pd.DataFrame(
            {
                "n_days": [len(xs)],
                "level_cents": [l],
                "trend_cents": [b],
                "forecast_7d_cents": [l + 7 * b],
                "forecast_7d": [round((l + 7 * b) / 100.0, 2)],
            }
        )

    return d.groupBy("series").applyInPandas(
        holt,
        schema="n_days long, level_cents long, trend_cents long,"
        " forecast_7d_cents long, forecast_7d double",
    )


@query(
    "q_ev_incremental_join",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_scaled
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q_ev_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view — the delta-join
    identity that keeps a materialized join current without full
    recomputation when BOTH inputs receive new data:

        (A0 ∪ ΔA) ⋈ (B0 ∪ ΔB)
          = A0⋈B0  ∪  ΔA⋈B0  ∪  A0⋈ΔB  ∪  ΔA⋈ΔB

    Here A = orders (Δ = orders placed from 1997), B = lineitem
    (Δ = lines shipped from 1997); the Spark side materializes the
    view as the four-term union — at refresh time only the three
    Δ-terms run, each sized by the delta, never by the base — and the
    oracle states the plain full join, so the hash-match IS the proof
    of the identity.  Complements q_ev_incremental (additive agg
    deltas); joins need this four-term form because new rows on either
    side can match old rows on the other.

    Revenue is exact-integer (cents × discount-percent scale 1e4), so
    the union-order-independent BIGINT sum hash-matches."""
    cut = "1997-01-01"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_orderdate") < cut).alias("is_base_o"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_shipdate") < cut).alias("is_base_l"),
        (
            F.expr("cast(round(l_extendedprice * 100) as bigint)")
            * (100 - F.expr("cast(round(l_discount * 100) as bigint)"))
        ).alias("rev"),
    )
    a0 = o.filter("is_base_o")
    da = o.filter("not is_base_o")
    b0 = li.filter("is_base_l")
    db = li.filter("not is_base_l")
    join = lambda x, y: x.join(y, x.o_orderkey == y.l_orderkey)  # noqa: E731
    view = (
        join(a0, b0)
        .unionByName(join(da, b0))
        .unionByName(join(a0, db))
        .unionByName(join(da, db))
    )
    return (
        view.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count("*").cast("long").alias("n_lineitems"),
            F.sum("rev").cast("long").alias("revenue_scaled"),
        )
        .orderBy("yr")
    )


@query(
    "q_ev_cdc_net",
    oracle="""
    WITH ops AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'signup' THEN 'I'
                    WHEN event_type = 'error'  THEN 'D'
                    ELSE 'U' END AS op
        FROM events
    ),
    per AS (
        SELECT user_id,
               first(op ORDER BY ts, event_id) AS first_op,
               last(op ORDER BY ts, event_id)  AS last_op,
               CAST(count(*) AS BIGINT)        AS n_ops
        FROM ops GROUP BY 1
    ),
    net AS (
        SELECT user_id, n_ops,
               CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'none'
                    WHEN first_op = 'I'                   THEN 'insert'
                    WHEN last_op = 'D'                    THEN 'delete'
                    ELSE 'update' END AS net_op
        FROM per
    )
    SELECT net_op,
           CAST(count(*) AS BIGINT)  AS n_keys,
           CAST(sum(n_ops) AS BIGINT) AS n_raw_changes,
           CAST(min(user_id) AS BIGINT) AS min_key,
           CAST(max(user_id) AS BIGINT) AS max_key
    FROM net GROUP BY 1 ORDER BY 1
    """,
)
def q_ev_cdc_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC net-changes compaction (the Debezium/Delta "net effect"
    view): a key touched N times in a change window collapses to ONE
    net operation decided by its first and last ops in (ts, event_id)
    order — I…D ⇒ none (created and deleted inside the window, never
    ship it), I…≠D ⇒ insert, else last=D ⇒ delete, else update.  This
    is what keeps downstream merges O(|keys|) instead of O(|changes|)
    at 100 TB: the compaction is one hash-aggregate (min_by/max_by
    carry first/last op — no per-key sort, no window), and only the
    4-row summary leaves the stage here.

    Event types map deterministically onto ops (signup→I, error→D,
    rest→U).  Spark's min_by/max_by order by the (ts, event_id)
    struct; DuckDB states the same via first/last(… ORDER BY) — the
    total unique order makes both exact."""
    ev = load_table(spark, sf_dir, "events")
    ops = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
    )
    order = F.struct("ts", "event_id")
    per = ops.groupBy("user_id").agg(
        F.min_by("op", order).alias("first_op"),
        F.max_by("op", order).alias("last_op"),
        F.count("*").cast("long").alias("n_ops"),
    )
    net = per.select(
        "user_id",
        "n_ops",
        F.when(
            (F.col("first_op") == "I") & (F.col("last_op") == "D"), "none"
        )
        .when(F.col("first_op") == "I", "insert")
        .when(F.col("last_op") == "D", "delete")
        .otherwise("update")
        .alias("net_op"),
    )
    return (
        net.groupBy("net_op")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("n_ops").cast("long").alias("n_raw_changes"),
            F.min("user_id").cast("long").alias("min_key"),
            F.max("user_id").cast("long").alias("max_key"),
        )
        .orderBy("net_op")
    )


#: Single-bin DFT at period 7 (the weekly line of the daily-count
#: series): cos/sin of 2πr/7 for r = 0..6, pre-rounded to 10 dp and
#: embedded as CAST-to-DOUBLE literals in BOTH engines (live
#: cos()/sin() would risk libm drift; the 7 residue sums are exact
#: BIGINTs, so the two 7-term fixed-order dot products are the only
#: float work).
_DFT7_COS = (
    "1.0", "0.6234898019", "-0.2225209340", "-0.9009688679",
    "-0.9009688679", "-0.2225209340", "0.6234898019",
)
_DFT7_SIN = (
    "0.0", "0.7818314825", "0.9749279122", "0.4338837391",
    "-0.4338837391", "-0.9749279122", "-0.7818314825",
)
_DFT7_A = " + ".join(
    f"CAST(s_{r} AS DOUBLE) * CAST({c} AS DOUBLE)"
    for r, c in enumerate(_DFT7_COS)
)
_DFT7_B = " + ".join(
    f"CAST(s_{r} AS DOUBLE) * CAST({c} AS DOUBLE)"
    for r, c in enumerate(_DFT7_SIN)
)
_DFT7_S_COLS = ", ".join(
    f"CAST(coalesce(sum(CASE WHEN r = {r} THEN x END), 0) AS BIGINT)"
    f" AS s_{r}"
    for r in range(7)
)


@query(
    "q_ev_spectral",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    anchored AS (
        SELECT x, date_diff('day', (SELECT min(d) FROM daily), d) % 7 AS r,
               1 AS one
        FROM daily
    ),
    s AS (
        SELECT {_DFT7_S_COLS},
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(x) AS BIGINT) AS n_events
        FROM anchored
    )
    SELECT n_days, n_events,
           round({_DFT7_A}, 4) AS re7,
           round({_DFT7_B}, 4) AS im7,
           round(sqrt(({_DFT7_A}) * ({_DFT7_A})
                      + ({_DFT7_B}) * ({_DFT7_B})), 4) AS amp7
    FROM s
    """,
)
def q_ev_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly spectral line of the event stream: the single-frequency
    DFT bin at period 7 over the daily-count series (the Goertzel
    question — "is there a weekly rhythm, and how strong?" — without
    materializing a full FFT; seasonality detectors and anomaly
    baselines start from exactly this bin).

    Determinism discipline: days are anchored at the series' own min
    date, so residues r = Δdays % 7 are non-negative integers in both
    engines; the seven residue sums S_r are exact BIGINTs from one
    pivot aggregate; cos/sin(2πr/7) are 10-dp literals (CAST AS
    DOUBLE — the bare-decimal DECIMAL trap) in two fixed-order 7-term
    dot products shared verbatim, so re/im/amp are bit-identical.  The
    raw bin is reported without mean removal (the DC term lives at
    r-sum total, orthogonal over complete weeks) — documented, not
    hidden.

    Scale shape: one date hash-agg (days, not events, cross the
    shuffle), a broadcast scalar min, then a 1-row pivot aggregate —
    linear scan, constant-width state at any event count."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("x"))
    )
    mn = daily.agg(F.min("d").alias("min_d"))
    anchored = daily.crossJoin(F.broadcast(mn)).select(
        "x", (F.datediff("d", "min_d") % 7).alias("r")
    )
    s = anchored.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("r") == r, F.col("x"))), F.lit(0)
            )
            .cast("long")
            .alias(f"s_{r}")
            for r in range(7)
        ],
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("n_events"),
    )
    a = F.expr(_DFT7_A)
    b = F.expr(_DFT7_B)
    return s.select(
        "n_days",
        "n_events",
        F.round(a, 4).alias("re7"),
        F.round(b, 4).alias("im7"),
        F.round(F.sqrt(a * a + b * b), 4).alias("amp7"),
    )


@query(
    "q_ml_pinball",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    p AS (
        SELECT b.day, b.y, a.y AS f
        FROM d a JOIN d b ON b.day = a.day + INTERVAL 7 DAY
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(9 * greatest(y - f, 0) + greatest(f - y, 0))
                    AS BIGINT) AS loss10_sum
        FROM p
    )
    SELECT n_days, loss10_sum,
           CASE WHEN n_days > 0 THEN
               round(CAST(loss10_sum AS DOUBLE) / (10 * n_days), 2)
           END AS pinball_mean_cents
    FROM s
    """,
)
def q_ml_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss at τ = 0.9 of the seasonal-naive
    (lag-7) daily-revenue forecast — the metric that scores a
    QUANTILE forecast (does the P90 band hold?) where q_ml_smape/MASE
    score the point forecast; together they are the forecast-eval
    panel.

    Exact-integer discipline: with τ = 9/10, 10·loss =
    9·max(y−f, 0) + max(f−y, 0) is an exact BIGINT per day (cents in,
    cents out — no float enters the sum, so summation order is
    irrelevant); the mean is ONE final division.  Days without a
    lag-7 partner are excluded by the inner join (the standard
    holdout convention, stated).

    Scale shape: one keyed date aggregate (calendar-bounded), a
    self-join on the 30-row day table, a 1-row agg."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("y")
        )
    )
    a = d.select(F.date_add(F.col("day"), 7).alias("day"), F.col("y").alias("f"))
    p = d.join(a, "day")
    s = p.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(
            9 * F.greatest(F.col("y") - F.col("f"), F.lit(0))
            + F.greatest(F.col("f") - F.col("y"), F.lit(0))
        )
        .cast("long")
        .alias("loss10_sum"),
    )
    return s.select(
        "n_days",
        "loss10_sum",
        F.when(
            F.col("n_days") > 0,
            F.round(
                F.col("loss10_sum").cast("double") / (10 * F.col("n_days")),
                2,
            ),
        ).alias("pinball_mean_cents"),
    )


#: Shared lifespan construction for the survival family (same
#: semantics as q_ev_survival): per user, days from first event to
#: first purchase (event) or to last observed day (censored).
_LIFESPAN_SQL = """
        SELECT user_id,
               CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END)
                         IS NOT NULL
                    THEN date_diff('day', CAST(min(ts) AS DATE),
                         CAST(min(CASE WHEN event_type = 'purchase' THEN ts
                                  END) AS DATE))
                    ELSE date_diff('day', CAST(min(ts) AS DATE),
                                   CAST(max(ts) AS DATE))
               END AS t,
               CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END)
                         IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM events GROUP BY user_id
"""


def _lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user (t, ev) time-to-first-purchase frame — one keyed
    aggregate, the q_ev_survival construction factored for reuse by
    the r9 survival family (log-rank / Nelson–Aalen / RMST)."""
    ev = load_table(spark, sf_dir, "events")
    first_purchase = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    )
    return ev.groupBy("user_id").agg(
        F.when(
            first_purchase.isNotNull(),
            F.datediff(F.to_date(first_purchase), F.min(F.to_date("ts"))),
        )
        .otherwise(
            F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        )
        .alias("t"),
        F.when(first_purchase.isNotNull(), 1).otherwise(0).alias("ev"),
    )


@query(
    "q_ev_logrank",
    oracle=f"""
    WITH ls AS ({_LIFESPAN_SQL}),
    g AS (
        SELECT t, ev,
               (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                ::BIGINT % 2) AS grp
        FROM ls
    ),
    n0 AS (
        SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1g,
               CAST(count(*) AS BIGINT) AS ng
        FROM g
    ),
    evt AS (
        SELECT t,
               CAST(sum(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS BIGINT)
                   AS d1,
               CAST(sum(ev) AS BIGINT) AS d,
               CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS l1,
               CAST(count(*) AS BIGINT) AS l
        FROM g GROUP BY t
    ),
    risk AS (
        SELECT t, d1, d,
               n1g - coalesce(sum(l1) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n1t,
               ng - coalesce(sum(l) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS nt,
               n1g, ng
        FROM evt CROSS JOIN n0
    ),
    terms AS (
        SELECT t, d1, n1g, ng,
               CAST(d AS DOUBLE) * n1t / nt AS e1,
               CASE WHEN nt > 1 THEN
                   CAST(d AS DOUBLE) * n1t * (nt - n1t) * (nt - d)
                   / (CAST(nt AS DOUBLE) * nt * (nt - 1))
               ELSE 0e0 END AS v
        FROM risk WHERE d > 0
    ),
    cum AS (
        SELECT t, n1g, ng,
               sum(d1) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS o1,
               sum(e1) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS e1c,
               sum(v) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS vc
        FROM terms
    )
    SELECT n1g AS n1,
           CAST(ng - n1g AS BIGINT) AS n2,
           CAST(o1 AS BIGINT) AS o1,
           round(e1c, 4) AS e1,
           round(vc, 4) AS v,
           round((o1 - e1c) * (o1 - e1c) / vc, 4) AS chi2,
           CAST((o1 - e1c) * (o1 - e1c)
                > CAST(3.841459 AS DOUBLE) * vc AS BOOLEAN) AS reject_05
    FROM cum WHERE t = (SELECT max(t) FROM terms)
    """,
)
def q_ev_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank (Mantel–Cox) test on time-to-first-purchase:
    users split by the deterministic md5 parity bucket (the engine's
    hash-split convention), O−E accumulated over conversion days with
    the hypergeometric variance — THE censoring-correct comparison of
    two survival curves (a t-test on conversion days ignores the
    censored users entirely).

    Determinism: per-day d/d1/at-risk counts are exact integers from
    the 1-PRECEDING prefix; the E and V terms are per-day DOUBLEs
    summed via the ORDERED day-window prefix (identical addition
    order both engines — the q_ev_survival discipline), with the
    statistic read off the final event day.  The 5% decision compares
    (O−E)² against z²crit·V in DOUBLE with the shared literal.

    Scale: one keyed user aggregate; everything after lives on the
    calendar-bounded conversion-day table (allowlisted windows)."""
    ls = _lifespan(spark, sf_dir)
    g = ls.select(
        "t",
        "ev",
        F.expr(
            "pmod(cast(conv(substr(md5(cast(cast(user_id as string)"
            " as binary)), 1, 15), 16, 10) as bigint), 2)"
        ).alias("grp"),
    )
    n0 = g.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1g"),
        F.count("*").cast("long").alias("ng"),
    )
    evt = g.groupBy("t").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("ev")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("l1"),
        F.count("*").cast("long").alias("l"),
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = evt.crossJoin(F.broadcast(n0)).select(
        "t",
        "d1",
        "d",
        (
            F.col("n1g")
            - F.coalesce(F.sum("l1").over(w_prev), F.lit(0))
        ).alias("n1t"),
        (
            F.col("ng") - F.coalesce(F.sum("l").over(w_prev), F.lit(0))
        ).alias("nt"),
        "n1g",
        "ng",
    )
    terms = risk.where(F.col("d") > 0).select(
        "t",
        "d1",
        "n1g",
        "ng",
        (
            F.col("d").cast("double") * F.col("n1t") / F.col("nt")
        ).alias("e1"),
        F.when(
            F.col("nt") > 1,
            F.col("d").cast("double")
            * F.col("n1t")
            * (F.col("nt") - F.col("n1t"))
            * (F.col("nt") - F.col("d"))
            / (
                F.col("nt").cast("double")
                * F.col("nt")
                * (F.col("nt") - 1)
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = terms.select(
        "t",
        "n1g",
        "ng",
        F.sum("d1").over(w_cum).alias("o1"),
        F.sum("e1").over(w_cum).alias("e1c"),
        F.sum("v").over(w_cum).alias("vc"),
    )
    tmax = terms.agg(F.max("t").alias("tm"))
    dev2 = (F.col("o1") - F.col("e1c")) * (F.col("o1") - F.col("e1c"))
    return (
        cum.crossJoin(F.broadcast(tmax))
        .where(F.col("t") == F.col("tm"))
        .select(
            F.col("n1g").alias("n1"),
            (F.col("ng") - F.col("n1g")).cast("long").alias("n2"),
            F.col("o1").cast("long").alias("o1"),
            F.round(F.col("e1c"), 4).alias("e1"),
            F.round(F.col("vc"), 4).alias("v"),
            F.round(dev2 / F.col("vc"), 4).alias("chi2"),
            (dev2 > F.expr("CAST(3.841459 AS DOUBLE)") * F.col("vc"))
            .alias("reject_05"),
        )
    )


@query(
    "q_ev_nelson_aalen",
    oracle=f"""
    WITH ls AS ({_LIFESPAN_SQL}),
    n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ls),
    evt AS (
        SELECT t, CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS l
        FROM ls GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               n - coalesce(sum(l) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS nt
        FROM evt CROSS JOIN n0
    ),
    na AS (
        SELECT t, d, nt,
               sum(CAST(d AS DOUBLE) / nt) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS h,
               sum(CAST(d AS DOUBLE) / (CAST(nt AS DOUBLE) * nt)) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS hv
        FROM risk
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           d AS n_events,
           CAST(nt AS BIGINT) AS n_at_risk,
           round(h, 4) AS cum_hazard,
           round(hv, 6) AS hazard_var
    FROM na WHERE d > 0
    """,
)
def q_ev_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator H(t) = Σ d_i/n_i for
    time-to-first-purchase, with the Poisson-type variance Σ d_i/n_i²
    — the hazard-scale complement of q_ev_survival's Kaplan–Meier
    curve (H(t) ≈ −ln S(t); an analyst reads slope changes off H
    directly, where S flattens unreadably).

    Determinism: d and the at-risk counts are exact integers from the
    1-PRECEDING prefix; the per-day hazard increments are DOUBLEs
    summed via the ORDERED day-window prefix (identical addition
    order both engines).  Same lifespan construction, same
    calendar-bounded plan shape as q_ev_survival."""
    ls = _lifespan(spark, sf_dir)
    n0 = ls.agg(F.count("*").cast("long").alias("n"))
    evt = ls.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count("*").cast("long").alias("l"),
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = evt.crossJoin(F.broadcast(n0)).select(
        "t",
        "d",
        (
            F.col("n") - F.coalesce(F.sum("l").over(w_prev), F.lit(0))
        ).alias("nt"),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    na = risk.select(
        "t",
        "d",
        "nt",
        F.sum(F.col("d").cast("double") / F.col("nt"))
        .over(w_cum)
        .alias("h"),
        F.sum(
            F.col("d").cast("double")
            / (F.col("nt").cast("double") * F.col("nt"))
        )
        .over(w_cum)
        .alias("hv"),
    )
    return na.where(F.col("d") > 0).select(
        F.col("t").cast("long").alias("t_days"),
        F.col("d").alias("n_events"),
        F.col("nt").cast("long").alias("n_at_risk"),
        F.round("h", 4).alias("cum_hazard"),
        F.round("hv", 6).alias("hazard_var"),
    )


@query(
    "q_ev_rmst",
    oracle=f"""
    WITH ls AS ({_LIFESPAN_SQL}),
    n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ls),
    evt AS (
        SELECT t, CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS l
        FROM ls GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               n - coalesce(sum(l) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS nt,
               n
        FROM evt CROSS JOIN n0
    ),
    km AS (
        SELECT t, d, n,
               sum(CASE WHEN d < nt
                        THEN ln(1 - CAST(d AS DOUBLE) / nt)
                        ELSE 0e0 END) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnS,
               max(CASE WHEN d >= nt THEN 1 ELSE 0 END) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS hz
        FROM risk
    ),
    steps AS (
        SELECT t, d, n,
               CASE WHEN hz = 1 THEN 0e0 ELSE exp(lnS) END AS s
        FROM km WHERE d > 0
    ),
    rects AS (
        SELECT t, d, n, s,
               lag(s, 1, 1e0) OVER (ORDER BY t)
                   * (least(t, 30)
                      - least(lag(t, 1, 0) OVER (ORDER BY t), 30)) AS rect
        FROM steps
    ),
    contrib AS (
        SELECT t, n, s,
               sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   AS d_cum,
               sum(rect) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   AS area
        FROM rects
    )
    SELECT n AS n_users,
           CAST(d_cum AS BIGINT) AS n_events,
           round(s, 4) AS s_final,
           round(area + s * (30 - least(t, 30)), 4) AS rmst30
    FROM contrib WHERE t = (SELECT max(t) FROM steps)
    """,
)
def q_ev_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at tau = 30 days for
    time-to-first-purchase: the area under the Kaplan–Meier step
    curve up to 30 days — the censoring-correct "average days without
    a purchase in the first month", the single-number summary
    regulators and A/B analyses prefer over the (often undefined)
    median survival.

    Determinism: the KM steps reuse q_ev_survival's exact machinery
    (integer d/at-risk, ORDERED ln-prefix, guarded zero-hit); each
    rectangle S_prev·(min(t,30) − min(t_prev,30)) and the running
    area are DOUBLEs accumulated via the ORDERED day-window prefix
    (identical addition order both engines); the final value adds the
    flat tail S_last·(30 − min(t_last,30)) read off the last event
    day.  Intervals past tau contribute exactly zero through the
    least() clamp — no branch on t.

    Scale: same plan as q_ev_survival — one keyed user aggregate,
    calendar-bounded day table after."""
    ls = _lifespan(spark, sf_dir)
    n0 = ls.agg(F.count("*").cast("long").alias("n"))
    evt = ls.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count("*").cast("long").alias("l"),
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = evt.crossJoin(F.broadcast(n0)).select(
        "t",
        "d",
        (
            F.col("n") - F.coalesce(F.sum("l").over(w_prev), F.lit(0))
        ).alias("nt"),
        "n",
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    km = risk.select(
        "t",
        "d",
        "n",
        F.sum(
            F.when(
                F.col("d") < F.col("nt"),
                F.log(
                    F.lit(1)
                    - F.col("d").cast("double") / F.col("nt")
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(w_cum)
        .alias("lnS"),
        F.max(F.when(F.col("d") >= F.col("nt"), 1).otherwise(0))
        .over(w_cum)
        .alias("hz"),
    )
    steps = km.where(F.col("d") > 0).select(
        "t",
        "d",
        "n",
        F.when(F.col("hz") == 1, F.lit(0.0))
        .otherwise(F.exp("lnS"))
        .alias("s"),
    )
    w_ord = Window.orderBy("t")
    rects = steps.select(
        "t",
        "d",
        "n",
        "s",
        (
            F.lag("s", 1, 1.0).over(w_ord)
            * (
                F.least(F.col("t"), F.lit(30))
                - F.least(F.lag("t", 1, 0).over(w_ord), F.lit(30))
            )
        ).alias("rect"),
    )
    contrib = rects.select(
        "t",
        "n",
        "s",
        F.sum("d").over(w_cum).alias("d_cum"),
        F.sum("rect").over(w_cum).alias("area"),
    )
    tmax = steps.agg(F.max("t").alias("tm"))
    return (
        contrib.crossJoin(F.broadcast(tmax))
        .where(F.col("t") == F.col("tm"))
        .select(
            F.col("n").alias("n_users"),
            F.col("d_cum").cast("long").alias("n_events"),
            F.round("s", 4).alias("s_final"),
            F.round(
                F.col("area")
                + F.col("s") * (30 - F.least(F.col("t"), F.lit(30))),
                4,
            ).alias("rmst30"),
        )
    )


@query(
    "q_ev_km_ci",
    oracle=f"""
    WITH ls AS ({_LIFESPAN_SQL}),
    n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ls),
    evt AS (
        SELECT t, CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS l
        FROM ls GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               n - coalesce(sum(l) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS nt
        FROM evt CROSS JOIN n0
    ),
    km AS (
        SELECT t, d, nt,
               sum(CASE WHEN d < nt
                        THEN ln(1 - CAST(d AS DOUBLE) / nt)
                        ELSE 0e0 END) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnS,
               sum(CASE WHEN d < nt
                        THEN CAST(d AS DOUBLE) / (CAST(nt AS DOUBLE)
                                                  * (nt - d))
                        ELSE 0e0 END) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS gw,
               max(CASE WHEN d >= nt THEN 1 ELSE 0 END) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS hz
        FROM risk
    )
    SELECT CAST(t AS BIGINT) AS t_days, d AS n_events,
           CAST(nt AS BIGINT) AS n_at_risk,
           CASE WHEN hz = 1 THEN 0e0 ELSE round(exp(lnS), 4) END
               AS survival,
           CASE WHEN hz = 1 THEN 0e0 ELSE
               round(greatest(exp(lnS) * (1 - 196e0 / 100
                                          * sqrt(gw)), 0e0), 4) END
               AS ci_lo,
           CASE WHEN hz = 1 THEN 0e0 ELSE
               round(least(exp(lnS) * (1 + 196e0 / 100
                                       * sqrt(gw)), 1e0), 4) END
               AS ci_hi
    FROM km WHERE d > 0
    """,
)
def q_ev_km_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier curve with Greenwood 95% confidence bands:
    Var(S(t)) = S²·Σ d/(n(n−d)) — the uncertainty a decision-maker
    needs before acting on q_ev_survival's point curve (a 0.62
    survival with ±0.15 bands is a different business fact than
    ±0.02).  Plain (linear-scale) Greenwood bands, clamped to [0,1];
    z = 1.96 enters as the exact rational 196/100.

    Determinism: the Greenwood sum rides the SAME ordered day-window
    prefix as the ln-survival sum (identical addition order both
    engines); d, n are exact integers; the bands are single shared
    expressions.  Days where the curve hits zero emit 0-width bands
    through the guarded branch (variance undefined there — documented
    spec)."""
    ls = _lifespan(spark, sf_dir)
    n0 = ls.agg(F.count("*").cast("long").alias("n"))
    evt = ls.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count("*").cast("long").alias("l"),
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = evt.crossJoin(F.broadcast(n0)).select(
        "t",
        "d",
        (
            F.col("n") - F.coalesce(F.sum("l").over(w_prev), F.lit(0))
        ).alias("nt"),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    km = risk.select(
        "t",
        "d",
        "nt",
        F.sum(
            F.when(
                F.col("d") < F.col("nt"),
                F.log(
                    F.lit(1)
                    - F.col("d").cast("double") / F.col("nt")
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(w_cum)
        .alias("lnS"),
        F.sum(
            F.when(
                F.col("d") < F.col("nt"),
                F.col("d").cast("double")
                / (F.col("nt").cast("double") * (F.col("nt") - F.col("d"))),
            ).otherwise(F.lit(0.0))
        )
        .over(w_cum)
        .alias("gw"),
        F.max(F.when(F.col("d") >= F.col("nt"), 1).otherwise(0))
        .over(w_cum)
        .alias("hz"),
    )
    z = F.lit(196.0) / 100
    return km.where(F.col("d") > 0).select(
        F.col("t").cast("long").alias("t_days"),
        F.col("d").alias("n_events"),
        F.col("nt").cast("long").alias("n_at_risk"),
        F.when(F.col("hz") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("lnS"), 4))
        .alias("survival"),
        F.when(F.col("hz") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.greatest(
                    F.exp("lnS") * (1 - z * F.sqrt("gw")), F.lit(0.0)
                ),
                4,
            )
        )
        .alias("ci_lo"),
        F.when(F.col("hz") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.least(
                    F.exp("lnS") * (1 + z * F.sqrt("gw")), F.lit(1.0)
                ),
                4,
            )
        )
        .alias("ci_hi"),
    )


@query(
    "q_ev_retention_fit",
    oracle="""
    WITH first_day AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events
        GROUP BY user_id
    ),
    weeks AS (
        SELECT DISTINCT f.user_id,
               date_diff('day', f.d0, CAST(e.ts AS DATE)) // 7 AS w
        FROM events e JOIN first_day f ON f.user_id = e.user_id
    ),
    r AS (
        SELECT w, CAST(count(*) AS BIGINT) AS retained
        FROM weeks GROUP BY w
    ),
    r0 AS (SELECT retained AS base FROM r WHERE w = 0),
    pts AS (
        SELECT CAST(w AS BIGINT) AS w,
               CAST(floor(1000000e0
                   * ln(CAST(retained AS DOUBLE) / base)) AS BIGINT)
                   AS u
        FROM r CROSS JOIN r0 WHERE retained > 0
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(w) AS BIGINT) AS sw,
               CAST(sum(u) AS BIGINT) AS su,
               CAST(sum(w * w) AS BIGINT) AS sww,
               CAST(sum(w * u) AS BIGINT) AS swu
        FROM pts
    )
    SELECT k AS n_weeks,
           round((CAST(k AS DOUBLE) * swu - CAST(sw AS DOUBLE) * su)
                 / (CAST(k AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw)
                 / 1000000, 6) AS decay_rate,
           CASE WHEN (CAST(k AS DOUBLE) * swu - CAST(sw AS DOUBLE) * su)
                     < 0 THEN
               round(CAST(0.6931471805599453 AS DOUBLE)
                     / (-((CAST(k AS DOUBLE) * swu
                           - CAST(sw AS DOUBLE) * su)
                          / (CAST(k AS DOUBLE) * sww
                             - CAST(sw AS DOUBLE) * sw)
                          / 1000000)), 2) END AS half_life_weeks
    FROM m
    """,
)
def q_ev_retention_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay fit of the weekly retention curve:
    regress ln(retained_w / retained_0) on week offset w — the decay
    rate λ and half-life = ln2/λ that turn q_ev_retention_curve's
    point table into the ONE number a growth model plugs in
    (constant-hazard churn ⇒ exponential retention).

    Determinism: weekly retained counts are exact BIGINTs (distinct
    users per week offset); each point's log-retention is FLOORED at
    10⁶ fixed-point (ratio of exact integers enters ln — the ln-floor
    trick), so the regression co-moments over the handful of week
    points are exact integer sums; slope and half-life are single
    shared DOUBLE expressions with ln(2) as an exact double literal,
    the half-life NULL-guarded on a non-decaying fit.

    Scale: one user aggregate + one distinct + a week-keyed
    aggregate — the fit itself runs on ≤ a few dozen points."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0")
    )
    weeks = (
        ev.join(F.broadcast(first_day), "user_id")
        .select(
            "user_id",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("d0")) / 7
            ).alias("w"),
        )
        .distinct()
    )
    r = weeks.groupBy("w").agg(
        F.count("*").cast("long").alias("retained")
    )
    r0 = r.where(F.col("w") == 0).select(
        F.col("retained").alias("base")
    )
    pts = (
        r.crossJoin(F.broadcast(r0))
        .where(F.col("retained") > 0)
        .select(
            F.col("w").cast("long").alias("w"),
            F.floor(
                F.lit(1000000.0)
                * F.log(
                    F.col("retained").cast("double") / F.col("base")
                )
            )
            .cast("long")
            .alias("u"),
        )
    )
    m = pts.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("w").cast("long").alias("sw"),
        F.sum("u").cast("long").alias("su"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sww"),
        F.sum(F.col("w") * F.col("u")).cast("long").alias("swu"),
    )
    num = (
        F.col("k").cast("double") * F.col("swu")
        - F.col("sw").cast("double") * F.col("su")
    )
    den = (
        F.col("k").cast("double") * F.col("sww")
        - F.col("sw").cast("double") * F.col("sw")
    )
    slope = num / den / 1000000
    return m.select(
        F.col("k").alias("n_weeks"),
        F.round(slope, 6).alias("decay_rate"),
        F.when(
            num < 0,
            F.round(
                F.expr("CAST(0.6931471805599453 AS DOUBLE)") / (-slope),
                2,
            ),
        ).alias("half_life_weeks"),
    )


@query(
    "q_ev_weibull",
    oracle="""
    WITH p AS (
        SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT) AS us
        FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
        SELECT (us - lag(us) OVER (PARTITION BY user_id ORDER BY us))
               // 1000000 AS g
        FROM p
    ),
    pv AS (
        SELECT g, CAST(count(*) AS BIGINT) AS c
        FROM gaps WHERE g IS NOT NULL AND g > 0
        GROUP BY g
    ),
    cum AS (SELECT g, c, sum(c) OVER (ORDER BY g) AS cumc FROM pv),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pv),
    pts AS (
        SELECT c,
               CAST(floor(10000e0 * ln(CAST(g AS DOUBLE))) AS BIGINT)
                   AS u,
               CAST(floor(10000e0 * ln(-ln(
                   CAST(10 * n + 4 - (5 * (2 * cumc - c + 1) - 3)
                        AS DOUBLE) / (10 * n + 4)))) AS BIGINT) AS v
        FROM cum CROSS JOIN tot
    ),
    m AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(c * u) AS BIGINT) AS su,
               CAST(sum(c * v) AS BIGINT) AS sv,
               CAST(sum(c * u * u) AS BIGINT) AS suu,
               CAST(sum(c * u * v) AS BIGINT) AS suv,
               CAST(sum(c * v * v) AS BIGINT) AS svv
        FROM pts
    )
    SELECT n AS n_gaps,
           round((CAST(n AS DOUBLE) * suv - CAST(su AS DOUBLE) * sv)
                 / (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su),
                 4) AS shape_k,
           round(exp(-((CAST(sv AS DOUBLE) / n
                        - ((CAST(n AS DOUBLE) * suv
                            - CAST(su AS DOUBLE) * sv)
                           / (CAST(n AS DOUBLE) * suu
                              - CAST(su AS DOUBLE) * su))
                          * (CAST(su AS DOUBLE) / n)) / 10000)
                     / ((CAST(n AS DOUBLE) * suv
                         - CAST(su AS DOUBLE) * sv)
                        / (CAST(n AS DOUBLE) * suu
                           - CAST(su AS DOUBLE) * su))), 2)
               AS scale_s,
           round((CAST(n AS DOUBLE) * suv - CAST(su AS DOUBLE) * sv)
                 * (CAST(n AS DOUBLE) * suv - CAST(su AS DOUBLE) * sv)
                 / ((CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su)
                    * (CAST(n AS DOUBLE) * svv
                       - CAST(sv AS DOUBLE) * sv)), 4) AS r2
    FROM m
    """,
)
def q_ev_weibull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of inter-purchase gaps by median-rank regression
    (Weibull probability plotting): regress ln(−ln(1−F_i)) on ln(t_i)
    with Benard's approximation F_i = (i−0.3)/(n+0.4) — shape k < 1
    means purchase hazard FALLS with time since last purchase
    (re-engage fast or lose them), k > 1 means it rises; the
    parametric leg of the survival family (KM/NA/RMST are its
    non-parametric siblings), plus the plot's R² as the
    goodness-of-fit readout.

    Determinism: gaps are exact integer seconds (epoch-µs integer
    div — the µs-gap rule); tie blocks get the exact midrank, so the
    plotting position clears to the integer ratio (10n+4−(5(2cum−c+1)
    −3))/(10n+4) whose double ln(−ln(·)) both engines evaluate on the
    identical argument; BOTH plot coordinates are then FLOORED at 10⁴
    fixed-point into BIGINTs, making every count-weighted co-moment
    an exact order-free integer sum (the q_ord_elasticity regression
    trick — the 10⁴ scales cancel in slope and R²; the intercept
    rescales once).  Slope, scale = exp(−b/k), and R² are single
    shared DOUBLE expressions.

    Scale: per-user lag (partitioned), one gap-grain aggregate, the
    bucketed prefix scan over distinct gap values, one 1-row moment
    fold."""
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("us")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("CAST(unix_micros(ts) AS BIGINT)").alias("us"),
    )
    gaps = p.select(
        F.expr(
            "(us - lag(us) OVER (PARTITION BY user_id ORDER BY us))"
            " div 1000000"
        ).alias("g")
    )
    pv = (
        gaps.where(F.col("g").isNotNull() & (F.col("g") > 0))
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("c"))
    )
    from events_to_db_spark.plans.prefix import bucketed_running_sum

    cum = bucketed_running_sum(
        pv,
        bucket=F.floor(F.col("g") / F.lit(100000)).cast("long"),
        order_cols=[F.col("g")],
        sums={"cumc": F.col("c")},
    )
    tot = pv.agg(F.sum("c").cast("long").alias("n"))
    pts = cum.crossJoin(F.broadcast(tot)).select(
        "c",
        F.floor(F.lit(10000.0) * F.log(F.col("g").cast("double")))
        .cast("long")
        .alias("u"),
        F.floor(
            F.lit(10000.0)
            * F.log(
                -F.log(
                    (
                        10 * F.col("n")
                        + 4
                        - (
                            5 * (2 * F.col("cumc") - F.col("c") + 1)
                            - 3
                        )
                    ).cast("double")
                    / (10 * F.col("n") + 4)
                )
            )
        )
        .cast("long")
        .alias("v"),
    )
    m = pts.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("u")).cast("long").alias("su"),
        F.sum(F.col("c") * F.col("v")).cast("long").alias("sv"),
        F.sum(F.col("c") * F.col("u") * F.col("u"))
        .cast("long")
        .alias("suu"),
        F.sum(F.col("c") * F.col("u") * F.col("v"))
        .cast("long")
        .alias("suv"),
        F.sum(F.col("c") * F.col("v") * F.col("v"))
        .cast("long")
        .alias("svv"),
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
    slope = num / denu
    intercept4 = (
        F.col("sv").cast("double") / F.col("n")
        - slope * (F.col("su").cast("double") / F.col("n"))
    )
    return m.select(
        F.col("n").alias("n_gaps"),
        F.round(slope, 4).alias("shape_k"),
        F.round(F.exp(-(intercept4 / 10000) / slope), 2).alias(
            "scale_s"
        ),
        F.round(num * num / (denu * denv), 4).alias("r2"),
    )


@query(
    "q_ev_time_concentration",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    rk AS (
        SELECT x, row_number() OVER (ORDER BY x, day) AS r
        FROM d
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(r * x) AS BIGINT) AS srx
        FROM rk
    )
    SELECT n AS n_days, s AS total_cents,
           CAST(2 * srx - (n + 1) * s AS BIGINT) AS gini_num,
           round(CAST(2 * srx - (n + 1) * s AS DOUBLE) / (n * s), 6)
               AS gini_time,
           round(CAST(n AS DOUBLE) / (n - (CAST(2 * srx
                 - (n + 1) * s AS DOUBLE) / s)), 2)
               AS effective_days
    FROM m
    """,
)
def q_ev_time_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of revenue ACROSS DAYS — the temporal axis
    of the inequality family (q_agg_gini asks "which users", this
    asks "which days"): G = (2Σr·x − (n+1)Σx)/(nΣx) over
    revenue-ranked days, plus the effective number of revenue days
    n/(1+G·(n/(n−G·n))) collapsed to n/(n−G·n/1)… emitted as
    n/(n − G·n) = 1/(1−G)-scaled days — high concentration means a
    few spike days carry the month (capacity planning reads this
    before averages).

    Determinism: day ranks are unique (tie-break by day), so the
    rank-weighted sum Σr·x and the Gini numerator 2Σrx − (n+1)S are
    exact BIGINTs; both outputs are single final divisions.  The rank
    runs over the calendar-bounded day table (allowlisted)."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    rk = d.select(
        "x",
        F.row_number()
        .over(Window.orderBy("x", "day"))
        .cast("long")
        .alias("r"),
    )
    m = rk.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("r") * F.col("x")).cast("long").alias("srx"),
    )
    gnum = 2 * F.col("srx") - (F.col("n") + 1) * F.col("s")
    return m.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("total_cents"),
        gnum.cast("long").alias("gini_num"),
        F.round(
            gnum.cast("double") / (F.col("n") * F.col("s")), 6
        ).alias("gini_time"),
        F.round(
            F.col("n").cast("double")
            / (F.col("n") - gnum.cast("double") / F.col("s")),
            2,
        ).alias("effective_days"),
    )
