"""Streaming equivalence tests — SURVEY.md §5.3.

Replay the batch ``events`` table through the Structured-Streaming path
in k Parquet chunks and assert the final sink/result state equals the
batch answer; then inject redelivered duplicates and assert the
idempotent upsert absorbs them, and kill/restart against the same
checkpoint to prove offset-map resume.  This is the reference's core
guarantee (at-least-once + idempotent keyed insert + offset map ⇒
effectively-once), checked end to end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from events_to_db_spark.session import load_table
from events_to_db_spark.streaming import (
    copy_to_db,
    dedup_stream,
    latest_state_to_db,
    session_counts_stream,
    tumbling_counts_stream,
)
from events_to_db_spark.streaming.sources import events_file_stream
from events_to_db_spark.streaming.sink import read_sink_table
from tests.conftest import N_CHUNKS, SF_SMOKE



def test_copy_pipeline_matches_batch(spark, chunked_events, tmp_path):
    feed, ev, n = chunked_events
    db = str(tmp_path / "sink.db")
    q = copy_to_db(
        events_file_stream(spark, feed),
        db,
        "events_copy",
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    state = read_sink_table(db, "events_copy")
    assert len(state) == n
    assert sorted(state["event_id"]) == sorted(
        r["event_id"] for r in ev.select("event_id").collect()
    )


def test_copy_pipeline_idempotent_on_redelivery(spark, chunked_events, tmp_path):
    """Re-delivering every chunk (fresh checkpoint = full replay — the
    worst-case redelivery) must not change the sink state."""
    feed, ev, n = chunked_events
    db = str(tmp_path / "sink.db")
    for attempt in range(2):
        q = copy_to_db(
            events_file_stream(spark, feed),
            db,
            "events_copy",
            str(tmp_path / f"ckpt_{attempt}"),  # new checkpoint → redelivery
        )
        q.awaitTermination()
    state = read_sink_table(db, "events_copy")
    assert len(state) == n


def test_copy_pipeline_checkpoint_resume(spark, chunked_events, tmp_path):
    """Stop after draining, add late-arriving files, restart on the SAME
    checkpoint: only the new files are processed (offset-map resume) and
    the final state is complete with no duplicates."""
    import shutil
    from pathlib import Path

    feed, ev, n = chunked_events
    staged = tmp_path / "staged_feed"
    staged.mkdir()
    files = sorted(Path(feed).glob("*.parquet"))
    for p in files[: len(files) // 2]:
        shutil.copy(p, staged / p.name)

    db = str(tmp_path / "sink.db")
    ckpt = str(tmp_path / "ckpt")
    q = copy_to_db(events_file_stream(spark, str(staged)), db, "events_copy", ckpt)
    q.awaitTermination()
    partial = len(read_sink_table(db, "events_copy"))
    assert 0 < partial < n

    for p in files[len(files) // 2 :]:
        shutil.copy(p, staged / p.name)
    q = copy_to_db(events_file_stream(spark, str(staged)), db, "events_copy", ckpt)
    q.awaitTermination()
    state = read_sink_table(db, "events_copy")
    assert len(state) == n


def test_copy_pipeline_crash_mid_stream_resumes_exactly(spark, chunked_events, tmp_path):
    """Kill the query AFTER a batch's sink write but BEFORE Spark
    commits the batch to the checkpoint — the exact crash window the
    effectively-once design (at-least-once replay + keyed idempotent
    upsert) must absorb.  On restart the crashed batch is redelivered,
    the upsert re-applies the same keys, and the final sink state is
    complete with no duplicates and no gaps."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from events_to_db_spark.streaming.sink import upsert_foreach_batch

    feed, ev, n = chunked_events
    db = str(tmp_path / "sink.db")
    ckpt = str(tmp_path / "ckpt")
    real_write = upsert_foreach_batch(db, "events_copy", ["event_id"])

    def crash_after_write(batch_df, batch_id):
        real_write(batch_df, batch_id)  # rows land in the sink...
        raise RuntimeError("injected crash before checkpoint commit")

    stream = events_file_stream(spark, feed)  # one file per micro-batch
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(crash_after_write)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    partial = read_sink_table(db, "events_copy")
    assert 0 < len(partial) < n  # first batch written, not committed

    # restart on the SAME checkpoint with the healthy writer: the
    # uncommitted batch replays (its keys re-upsert) and the rest drain
    q = copy_to_db(events_file_stream(spark, feed), db, "events_copy", ckpt)
    q.awaitTermination()
    state = read_sink_table(db, "events_copy")
    assert len(state) == n  # no gaps
    assert len(set(state["event_id"])) == n  # no duplicates
    assert sorted(state["event_id"]) == sorted(
        r["event_id"] for r in ev.select("event_id").collect()
    )


def test_tumbling_stream_matches_batch(spark, chunked_events, tmp_path):
    """Windowed agg through the stream (availableNow, complete output via
    memory sink in update mode is awkward for append windows — drain with
    a large watermark and foreachBatch accumulation) equals batch."""
    feed, ev, n = chunked_events
    acc: dict[tuple, tuple] = {}

    def collect_batch(batch_df, _bid):
        for r in batch_df.collect():
            acc[(r["d"], r["event_type"])] = (r["n"], r["sum_v"])

    # complete mode re-emits full state per batch; final batch wins.
    q = (
        tumbling_counts_stream(events_file_stream(spark, feed))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(collect_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("d"),
            "event_type",
            "n",
            "sum_v",
        )
        .collect()
    )
    expected = {(r["d"], r["event_type"]): (r["n"], r["sum_v"]) for r in batch}
    assert acc == expected


def test_update_mode_emits_only_changed_windows(spark, chunked_events, tmp_path):
    """Output-mode matrix (§2.9): update mode re-emits a window only
    when a batch changes it, and the last emission per window equals
    the batch answer — completing append (late-drop), complete
    (full-state) coverage elsewhere in this file."""
    feed, ev, n = chunked_events
    emitted: list[tuple] = []
    last: dict[tuple, tuple] = {}

    def collect(batch_df, _bid):
        for r in batch_df.collect():
            emitted.append((r["d"], r["event_type"]))
            last[(r["d"], r["event_type"])] = (r["n"], r["sum_v"])

    q = (
        tumbling_counts_stream(events_file_stream(spark, feed), watermark="40 days")
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = {
        (r["d"], r["event_type"]): (r["n"], r["sum_v"])
        for r in ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("d"),
            "event_type",
            "n",
            "sum_v",
        )
        .collect()
    }
    assert last == batch
    # update mode emitted far fewer rows than |batches| × |windows|
    # (a window untouched by a batch is not re-emitted); with an
    # ordered feed most windows are touched by exactly one chunk
    assert len(emitted) < N_CHUNKS * len(batch)


def test_dedup_stream_matches_batch(spark, chunked_events, tmp_path):
    """Streaming minute-dedup over the ordered feed keeps exactly the
    batch survivors (watermark large enough that no state expires
    mid-replay)."""
    feed, ev, n = chunked_events
    seen = []

    def collect(batch_df, _bid):
        seen.extend(batch_df.select("event_id").collect())

    q = (
        dedup_stream(events_file_stream(spark, feed), watermark="40 days")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from pyspark.sql import Window

    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("minute", "ts")
    ).orderBy("ts", "event_id")
    batch_ids = {
        r["event_id"]
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id")
        .collect()
    }
    got_ids = {r["event_id"] for r in seen}
    # stream processes per-batch: it keeps the first row per key per
    # batch; across ordered batches the earliest occurrence wins, so
    # the survivor SET must equal the batch answer
    assert got_ids == batch_ids


def test_session_stream_matches_batch(spark, chunked_events, tmp_path):
    """Streaming session windows, once the watermark closes them, carry
    the same (user, start, size) as the batch sessionization."""
    feed, ev, n = chunked_events
    acc = []

    def collect(batch_df, _bid):
        acc.extend(batch_df.collect())

    # complete mode: final emission covers all sessions incl. open ones
    q = (
        session_counts_stream(events_file_stream(spark, feed))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, i: (acc.clear(), acc.extend(b.collect())))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s_ts"),
            "n_events",
        )
        .collect()
    )
    got = {(r["user_id"], r["s_ts"], r["n_events"]) for r in acc}
    want = {(r["user_id"], r["s_ts"], r["n_events"]) for r in batch}
    assert got == want


def test_copy_pipeline_passes_late_rows_through(spark, chunked_events, tmp_path):
    """A copier must never lose data: rows arriving behind the
    watermark bypass the (expired) dedup state but still reach the
    sink, where the keyed upsert keeps them idempotent.  Verified
    empirically: ``dropDuplicatesWithinWatermark`` expires state, it
    does not drop late inputs."""
    import os
    import shutil
    import time
    from pathlib import Path

    feed, ev, n = chunked_events
    files = sorted(Path(feed).glob("*.parquet"))
    late_feed = tmp_path / "late_feed"
    late_feed.mkdir()
    base = time.time() - 600
    # newest chunk first (advances watermark to ~end of month), oldest
    # chunk second — a whole file behind the watermark
    shutil.copy(files[-1], late_feed / "a.parquet")
    os.utime(late_feed / "a.parquet", (base, base))
    shutil.copy(files[0], late_feed / "b.parquet")
    os.utime(late_feed / "b.parquet", (base + 10, base + 10))

    db = str(tmp_path / "sink.db")
    q = copy_to_db(
        events_file_stream(spark, str(late_feed)),
        db,
        "events_copy",
        str(tmp_path / "ckpt"),
        watermark="1 hour",
    )
    q.awaitTermination()
    per_chunk = (n + N_CHUNKS - 1) // N_CHUNKS
    assert len(read_sink_table(db, "events_copy")) == 2 * per_chunk


def test_windowed_agg_watermark_bounds_state(spark, chunked_events, tmp_path):
    """The watermark must advance with event time and evict finalized
    window state — state size tracks the watermark horizon, not the
    stream length (the 100 TB-stream posture).  Asserted on the
    stateOperators metrics: watermark moved off epoch and eviction
    occurred once it passed the open windows."""
    import os
    import shutil
    import time
    from pathlib import Path

    feed, ev, n = chunked_events
    files = sorted(Path(feed).glob("*.parquet"))
    late_feed = tmp_path / "late_feed"
    late_feed.mkdir()
    base = time.time() - 600
    shutil.copy(files[-1], late_feed / "a.parquet")
    os.utime(late_feed / "a.parquet", (base, base))
    shutil.copy(files[0], late_feed / "b.parquet")
    os.utime(late_feed / "b.parquet", (base + 10, base + 10))

    q = (
        tumbling_counts_stream(events_file_stream(spark, str(late_feed)))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("noop")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = list(q.recentProgress)
    assert progresses
    final_wm = progresses[-1]["eventTime"]["watermark"]
    assert final_wm > "2024-01-30"  # advanced to max event time - 1h
    evicted = sum(
        op.get("numRowsRemoved", 0)
        for pr in progresses
        for op in pr.get("stateOperators", [])
    )
    assert evicted > 0  # finalized windows left the state store


def test_stream_stream_interval_join_matches_batch(spark, chunked_events, tmp_path):
    """Watermarked stream-stream interval join equals the equivalent
    batch join: every (signup, purchase-within-7d) pair, exactly once."""
    from events_to_db_spark.streaming import signup_purchase_join_stream

    feed, ev, n = chunked_events
    acc = []

    q = (
        signup_purchase_join_stream(
            events_file_stream(spark, feed),
            events_file_stream(spark, feed),
            watermark="40 days",  # replay spans a month: keep all state
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, i: acc.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("s_ts"),
        F.col("event_id").alias("s_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    batch = (
        s.join(p, "u")
        .filter(
            (F.col("p_ts") >= F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS"))
        )
        .collect()
    )
    got = {(r["signup_event_id"], r["purchase_event_id"]) for r in acc}
    want = {(r["s_id"], r["p_id"]) for r in batch}
    assert len(got) == len(acc)  # exactly-once: no duplicate pairs
    assert got == want


def test_latest_state_stream_matches_batch(spark, chunked_events, tmp_path):
    feed, ev, n = chunked_events
    db = str(tmp_path / "sink.db")
    q = latest_state_to_db(
        events_file_stream(spark, feed), db, "user_state", str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    state = read_sink_table(db, "user_state").set_index("user_id")

    import __spark_entry__ as e

    batch = e.queries()["q_ev_latest"](spark, SF_SMOKE).toPandas().set_index("user_id")
    assert len(state) == len(batch)
    for uid, row in batch.iterrows():
        assert state.loc[uid, "event_id"] == row["event_id"], uid
        assert state.loc[uid, "ts"] == row["ts_s"], uid


def test_sliding_stream_matches_batch(spark, chunked_events, tmp_path):
    """Sliding (overlapping) windows through the stream equal the
    batch plan — each event counted in exactly two 1-hour windows."""
    from events_to_db_spark.streaming.pipelines import sliding_counts_stream

    feed, ev, n = chunked_events
    acc: dict[tuple, int] = {}

    def collect_batch(batch_df, _bid):
        for r in batch_df.collect():
            acc[(r["ws"], r["event_type"])] = r["n"]

    q = (
        sliding_counts_stream(events_file_stream(spark, feed))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
        .foreachBatch(collect_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"),
            "event_type",
            "n",
        )
        .collect()
    )
    expected = {(r["ws"], r["event_type"]): r["n"] for r in batch}
    assert acc == expected
    # every event lands in exactly two windows
    assert sum(acc.values()) == 2 * n


def test_stream_static_enrichment_matches_batch(spark, chunked_events, tmp_path):
    """Stream-to-static enrichment join (the dimension-lookup shape of
    a live copy pipeline): streaming events joined to a static
    per-user dimension must equal the batch join.  The static side is
    planned as a broadcast per micro-batch — no stream-side state."""
    feed, ev, n = chunked_events
    dim = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("user_total"))
    )
    acc = []

    def collect(batch_df, _bid):
        acc.extend(batch_df.collect())

    stream = events_file_stream(spark, feed).join(F.broadcast(dim), "user_id")
    q = (
        stream.select("event_id", "user_id", "user_total")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = {
        (r["event_id"], r["user_id"], r["user_total"])
        for r in ev.join(dim, "user_id")
        .select("event_id", "user_id", "user_total")
        .collect()
    }
    assert {(r["event_id"], r["user_id"], r["user_total"]) for r in acc} == batch
    assert len(acc) == n


def test_incremental_agg_exactly_once_across_crash(spark, chunked_events, tmp_path):
    """Additive aggregate maintenance is NOT idempotent, so the sink's
    transactional batch log must make redelivery a no-op.  Crash after
    the sink transaction but before the checkpoint commit, restart, and
    assert the running totals equal the batch answer exactly — a
    double-applied batch would show up as inflated counts."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import functions as F

    from events_to_db_spark.streaming.pipelines import incremental_agg_to_db
    from events_to_db_spark.streaming.sink import (
        additive_agg_foreach_batch,
        read_sink_table,
    )
    from events_to_db_spark.streaming.sources import events_file_stream

    feed, ev, n = chunked_events
    db = str(tmp_path / "agg.db")
    ckpt = str(tmp_path / "ckpt")

    real_write = additive_agg_foreach_batch(db, "agg_state", "event_type", "value")
    crashed = {"done": False}

    def crash_once_after_write(batch_df, batch_id):
        real_write(batch_df, batch_id)
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before checkpoint commit")

    q = (
        events_file_stream(spark, feed)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(crash_once_after_write)
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(StreamingQueryException):
        q.awaitTermination()

    # Restart on the same checkpoint: batch 0 is redelivered (it was
    # never committed), the sink's batch log skips it.
    q = (
        incremental_agg_to_db(events_file_stream(spark, feed), db)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["event_type"]: (r["n"], round(r["s"], 4))
        for _, r in read_sink_table(db, "agg_state").iterrows()
    }
    want = {
        r["event_type"]: (r["n"], round(r["s"], 4))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def _scd2_expected(sf_dir):
    """Batch-rebuilt SCD2 history (run-collapse) as a sorted row list."""
    import duckdb

    con = duckdb.connect()
    return con.execute(
        f"""
        WITH o AS (
            SELECT user_id, event_type, epoch_us(ts) AS us,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS p
            FROM '{sf_dir}/events.parquet'
        ),
        runs AS (
            SELECT user_id, event_type, us FROM o
            WHERE p IS NULL OR p <> event_type
        )
        SELECT user_id, event_type, us,
               lead(us) OVER (PARTITION BY user_id ORDER BY us) AS nxt
        FROM runs
        ORDER BY user_id, us
        """
    ).fetchall()


def test_scd2_sink_matches_batch_rebuild(spark, chunked_events, tmp_path):
    """Streaming SCD2 maintenance over the drip feed ends in exactly
    the batch-rebuilt history: same intervals, same open rows."""
    from events_to_db_spark.streaming import events_file_stream, scd2_to_db
    from events_to_db_spark.streaming.sink import read_sink_table
    from tests.conftest import SF_SMOKE

    feed, ev, n = chunked_events
    db = str(tmp_path / "scd2.db")
    q = scd2_to_db(
        events_file_stream(spark, feed), db, "dim_user", str(tmp_path / "ck")
    )
    q.awaitTermination()
    state = read_sink_table(db, "dim_user")
    got = sorted(
        (
            (
                int(r.key),
                r.state,
                int(r.valid_from_us),
                None
                if r.valid_to_us is None or r.valid_to_us != r.valid_to_us
                else int(r.valid_to_us),
            )
            for r in state.itertuples()
        ),
        key=lambda t: (t[0], t[2]),
    )
    want = [
        (int(u), s, int(us), None if nxt is None else int(nxt))
        for u, s, us, nxt in _scd2_expected(SF_SMOKE)
    ]
    assert got == want
    # exactly one open interval per key
    cur = state[state.is_current == 1]
    assert cur.key.is_unique


def test_scd2_sink_idempotent_on_full_replay(spark, chunked_events, tmp_path):
    """Worst-case redelivery (fresh checkpoint = replay everything)
    leaves the history table byte-identical — every transition re-lands
    as a late-drop or run-collapse no-op."""
    from events_to_db_spark.streaming import events_file_stream, scd2_to_db
    from events_to_db_spark.streaming.sink import read_sink_table

    feed, ev, n = chunked_events
    db = str(tmp_path / "scd2.db")
    snapshots = []
    for attempt in range(2):
        q = scd2_to_db(
            events_file_stream(spark, feed),
            db,
            "dim_user",
            str(tmp_path / f"ck_{attempt}"),
        )
        q.awaitTermination()
        snapshots.append(
            read_sink_table(db, "dim_user")
            .sort_values(["key", "valid_from_us"])
            .reset_index(drop=True)
        )
    assert snapshots[0].equals(snapshots[1])


def test_rollup_cascade_equals_direct_aggregation(spark):
    """Every cascade level must equal aggregating raw events directly
    at that grain — the re-aggregation laws, end to end.  Also pins
    the scan economy: hour/day plans must NOT rescan the events
    relation (they reduce the minute state)."""
    from events_to_db_spark.session import load_table
    from events_to_db_spark.streaming.rollup import base_rollup, cascade

    ev = load_table(spark, SF_SMOKE, "events")
    levels = cascade(ev)
    for grain in ("minute", "hour", "day"):
        direct = base_rollup(ev, grain).collect()
        got = levels[grain].collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, direct)), grain

    # avg derivation from carried (sum, count) matches direct avg
    from pyspark.sql import functions as F

    day = levels["day"].select(
        "bucket",
        "event_type",
        (F.col("sum_c").cast("double") / F.col("n") / 100.0).alias("avg_v"),
    )
    direct_avg = ev.groupBy(
        F.date_trunc("day", "ts").alias("bucket"), "event_type"
    ).agg(F.avg("value").alias("avg_v"))
    j = day.join(direct_avg, ["bucket", "event_type"]).select(
        (F.abs(day.avg_v - direct_avg.avg_v) < 1e-9).alias("ok")
    )
    assert all(r.ok for r in j.collect())

    # scan economy: day level reads the minute aggregate, not raw events
    day_plan = (
        levels["day"]._jdf.queryExecution().optimizedPlan().toString()
    )
    assert day_plan.lower().count("relation") <= 1


def test_stream_stream_left_outer_join_emits_null_extension(
    spark, chunked_events, tmp_path
):
    """Left-outer stream-stream join: signups with no purchase in their
    7-day window are null-extended once the watermark proves the window
    closed — Spark's state-expiry-driven outer semantics.  Inner pairs
    must still equal the batch join exactly; outer rows must be exactly
    the batch-unmatched signups old enough for the watermark to have
    passed (trailing signups legitimately stay buffered at stream end)."""
    from events_to_db_spark.streaming import signup_purchase_join_stream

    feed, ev, n = chunked_events
    acc = []
    wm = "2 days"

    q = (
        signup_purchase_join_stream(
            events_file_stream(spark, feed),
            events_file_stream(spark, feed),
            watermark=wm,
            how="left_outer",
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, i: acc.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("s_ts"),
        F.col("event_id").alias("s_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    within = (F.col("p_ts") >= F.col("s_ts")) & (
        F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS")
    )
    batch_inner = s.join(p, "u").filter(within).collect()
    matched_ids = {r["s_id"] for r in batch_inner}
    unmatched = {
        r["s_id"]: r["s_ts"]
        for r in s.collect()
        if r["s_id"] not in matched_ids
    }

    got_inner = {
        (r["signup_event_id"], r["purchase_event_id"])
        for r in acc
        if r["purchase_event_id"] is not None
    }
    want_inner = {(r["s_id"], r["p_id"]) for r in batch_inner}
    assert got_inner == want_inner

    got_outer = {
        r["signup_event_id"] for r in acc if r["purchase_event_id"] is None
    }
    # no false null-extensions: every outer row is genuinely unmatched
    assert got_outer <= set(unmatched)
    # coverage: any unmatched signup whose window + watermark horizon
    # closed well before the feed's end must have been emitted
    import datetime as _dt

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - _dt.timedelta(days=12)  # 7d window + 2d wm + slack
    must_emit = {i for i, ts in unmatched.items() if ts < horizon}
    assert must_emit, "fixture should contain closable unmatched signups"
    assert must_emit <= got_outer
    # exactly-once on the outer path too
    n_outer_rows = sum(1 for r in acc if r["purchase_event_id"] is None)
    assert n_outer_rows == len(got_outer)
