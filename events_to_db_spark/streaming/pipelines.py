"""Streaming pipelines: the events-to-db copy plus streaming twins of
the batch §2.9 operators.

Each pipeline takes an unbounded events DataFrame (from
:mod:`.sources`), applies the *same logical plan* as its batch twin,
and writes through a checkpointed sink.  Run with
``trigger(availableNow=True)`` to drain everything currently in the
source and stop — that is the replay path the equivalence tests use;
omit the trigger for a live follow.

Watermarks bound state (and define late-data drop) exactly where the
reference's eventually-ordered feed needs it: aggregation state older
than the watermark is finalized and evicted, so state size tracks the
watermark horizon, not the stream length — the 100 TB-stream posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from events_to_db_spark.streaming.sink import upsert_foreach_batch


def copy_to_db(
    events: DataFrame,
    db_path: str,
    table: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """The reference pipeline itself: copy the event feed into a SQL
    table, idempotently keyed by ``event_id``.

    ``dropDuplicatesWithinWatermark`` absorbs redelivered events whose
    event-time lies within the watermark horizon; the keyed upsert
    absorbs *any* redelivery (even past the horizon) — two independent
    layers, matching at-least-once + idempotent-insert.  Late rows are
    NOT dropped: a copier must never lose data, and (verified in
    tests) ``dropDuplicatesWithinWatermark`` only expires state — late
    arrivals pass through and the sink keeps them idempotent."""
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert_foreach_batch(db_path, table, ["event_id"]))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``q_ev_dedup``'s first stage: one event per
    ``(user_id, event_type, minute)`` within the watermark horizon."""
    return (
        events.withColumn("minute_ts", F.date_trunc("minute", "ts"))
        .withWatermark("minute_ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "minute_ts"])
    )


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``q_ev_tumbling``: 1-day windows × event type.
    Append mode emits a window once the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("d"),
            "event_type",
            "n",
            "sum_v",
        )
    )


def session_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``q_ev_session``: 30-min-gap session windows
    per user, emitted when the watermark closes the session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s_ts"),
            "n_events",
        )
    )


def signup_purchase_join_stream(
    events: DataFrame,
    events_again: DataFrame,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: purchases joined to the signups
    they follow within 7 days — the live twin of the funnel's join
    stage and of ``q_join_range``'s band-join shape.

    Both inputs are watermarked and the join condition bounds
    purchase-time relative to signup-time, so Spark can size the join
    state: a buffered signup is droppable once the watermark passes
    ``signup_ts + 7 days``.  Pass the same source twice (two separate
    ``readStream`` handles — self-joins of one streaming DataFrame
    are not supported).

    ``how='left_outer'`` additionally emits each signup with NULL
    purchase columns once the watermark proves no purchase can still
    arrive in its 7-day window (state-expiry-driven null extension —
    outer results are necessarily late by the watermark delay)."""
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("signup_ts"),
            F.col("event_id").alias("signup_event_id"),
        )
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        events_again.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_event_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")),
        how,
    ).select(
        F.col("s_user").alias("user_id"),
        "signup_ts",
        "purchase_ts",
        "signup_event_id",
        "purchase_event_id",
    )


def latest_state_to_db(
    events: DataFrame,
    db_path: str,
    table: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of ``q_ev_latest``: maintain the per-user current
    state in the target table via per-batch MERGE.

    Each micro-batch reduces to one candidate row per user (max ts,
    tie-break event_id) *before* touching the sink; the upsert then
    keeps the newer of (existing, candidate) — monotone, idempotent,
    and restart-safe.  The reduction runs distributed; only |users in
    batch| rows reach the writer."""
    from pyspark.sql import Window

    def write(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        cand = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        # MERGE with "newer wins": SQLite upsert + WHERE guard.
        out = cand.withColumn(
            "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        )
        from events_to_db_spark.streaming.sink import _connect, ensure_table

        ensure_table(db_path, table, out, ["user_id"])
        columns = [c for c, _ in out.dtypes]
        col_list = ", ".join(f'"{c}"' for c in columns)
        placeholders = ", ".join("?" for _ in columns)
        updates = ", ".join(
            f'"{c}" = excluded."{c}"' for c in columns if c != "user_id"
        )
        sql = (
            f'INSERT INTO "{table}" ({col_list}) VALUES ({placeholders}) '
            f"ON CONFLICT (user_id) DO UPDATE SET {updates} "
            f'WHERE (excluded."ts", excluded."event_id") > ("{table}"."ts", "{table}"."event_id")'
        )
        with _connect(db_path) as con:
            for row in out.toLocalIterator():
                con.execute(sql, [row[c] for c in columns])

    writer = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sliding_counts_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of ``q_ev_sliding``: 1-hour windows sliding every
    30 minutes (each event lands in two windows).  Same unified-
    semantics contract as the tumbling twin — the batch plan is the
    oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("ws"),
            "event_type",
            "n",
        )
    )


def incremental_agg_to_db(
    events: DataFrame, db_path: str, table: str = "agg_state"
):
    """Continuously maintain per-type (count, sum) totals in the target
    DB — incremental aggregate maintenance (the q_ev_incremental merge
    algebra as a live pipeline).  Non-idempotent additive merges are
    made exactly-once by the sink's transactional batch log
    (sink.additive_agg_foreach_batch); state equals the batch answer
    after any crash/restart sequence."""
    from events_to_db_spark.streaming.sink import additive_agg_foreach_batch

    return (
        events.writeStream.foreachBatch(
            additive_agg_foreach_batch(db_path, table, "event_type", "value")
        )
        .outputMode("update")
    )


def scd2_to_db(
    events: DataFrame,
    db_path: str,
    table: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Live SCD2 dimension maintenance: fold the event feed's
    (user, event_type) observations into a type-2 history table — the
    incremental twin of the batch q_ev_scd2 rebuild (equivalence- and
    redelivery-tested in tests/test_streaming.py)."""
    from pyspark.sql import functions as F

    obs = events.select(
        F.col("user_id").alias("key"),
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").alias("seq"),
    )
    from events_to_db_spark.streaming.sink import scd2_foreach_batch

    return (
        obs.writeStream.foreachBatch(scd2_foreach_batch(db_path, table))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
