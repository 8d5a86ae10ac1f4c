"""AQL subscriptions (streaming/subscriptions.py): the same compiled
AQL pipeline, run over the drip-fed event stream, must converge to the
batch run_aql answer — row pipelines via append mode, aggregate
pipelines via complete mode — and LIMIT compiles to the stateful
take-first-n whose emitted prefix equals the batch compile on an
ordered replay (VERDICT r03 #6)."""

from __future__ import annotations

import pytest

from events_to_db_spark.functions.aql import run_aql
from events_to_db_spark.functions.tags import with_tags
from events_to_db_spark.session import load_table
from events_to_db_spark.streaming.sources import events_file_stream
from events_to_db_spark.streaming.subscriptions import aql_subscription
from tests.conftest import SF_SMOKE

ROW_QUERY = (
    "FROM 'type:view' FILTER _.k >= 90"
    " SELECT { k: _.k * 1, is_top: _.k >= 95 }"
)
AGG_QUERY = (
    "FROM 'type:purchase' FILTER _.k > 40"
    " AGGREGATE { total_k: SUM(_.k), n: COUNT() }"
)


def test_row_subscription_matches_batch(spark, chunked_events, tmp_path):
    feed, ev, _n = chunked_events
    acc = []
    q = (
        aql_subscription(events_file_stream(spark, feed), ROW_QUERY)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sub_row"))
        .foreachBatch(lambda df, _bid: acc.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = run_aql(with_tags(load_table(spark, SF_SMOKE, "events")), ROW_QUERY)
    want = {tuple(r) for r in batch.collect()}
    got = {tuple(r) for r in acc}
    assert got == want and len(acc) == len(want)


def test_agg_subscription_converges_to_batch(spark, chunked_events, tmp_path):
    feed, ev, _n = chunked_events
    emissions = []
    q = (
        aql_subscription(events_file_stream(spark, feed), AGG_QUERY)
        .writeStream.outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sub_agg"))
        .foreachBatch(
            lambda df, bid: emissions.append((bid, df.collect()))
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(emissions) > 1, "drip feed should emit per micro-batch"
    final = {tuple(r) for r in emissions[-1][1]}
    batch = run_aql(
        with_tags(load_table(spark, SF_SMOKE, "events")), AGG_QUERY
    )
    assert final == {tuple(r) for r in batch.collect()}

    # The fold-so-far must be monotone in n across micro-batches.
    ns = [rows[0]["n"] for _bid, rows in emissions if rows]
    assert ns == sorted(ns)


# k >= 90 matches (3, 1, 5, 6) view events across the four feed chunks
# — LIMIT 7 therefore spans three micro-batches (3+1+3) and leaves the
# fourth empty, exercising both the cross-batch counter and the
# emit-nothing steady state.
LIMIT_QUERY = (
    "FROM 'type:view' FILTER _.k >= 90 LIMIT 7"
    " SELECT { k: _.k * 1, big: _.k >= 95 }"
)


def test_subscription_limit_matches_batch_prefix(
    spark, chunked_events, tmp_path
):
    """Mid-pipeline LIMIT over the drip feed: the stateful take-first-n
    must emit exactly the batch compile's event-order prefix, spread
    across micro-batches, and emit nothing once n rows are taken."""
    feed, _ev, _n = chunked_events
    batches = []
    q = (
        aql_subscription(events_file_stream(spark, feed), LIMIT_QUERY)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sub_limit"))
        .foreachBatch(lambda df, bid: batches.append((bid, df.collect())))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = [tuple(r) for _bid, rows in batches for r in rows]
    batch = run_aql(
        with_tags(load_table(spark, SF_SMOKE, "events")), LIMIT_QUERY
    )
    want = [tuple(r) for r in batch.collect()]
    assert len(got) == 7
    assert sorted(got) == sorted(want)
    # Prefix spans several micro-batches (a bounded prefix, not a
    # single-batch head), and later batches emit nothing.
    nonempty = [bid for bid, rows in batches if rows]
    assert len(nonempty) >= 2
    tail = [rows for bid, rows in batches if bid > max(nonempty)]
    assert all(not rows for rows in tail)


def test_subscription_limit_terminal_stage(spark, chunked_events, tmp_path):
    """LIMIT as the last stage: plain first-n of the filtered stream."""
    feed, _ev, _n = chunked_events
    acc = []
    q = (
        aql_subscription(
            events_file_stream(spark, feed), "FROM 'type:purchase' LIMIT 5"
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sub_limit2"))
        .foreachBatch(lambda df, _bid: acc.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batch = run_aql(
        with_tags(load_table(spark, SF_SMOKE, "events")),
        "FROM 'type:purchase' LIMIT 5",
    )
    assert sorted(tuple(r) for r in acc) == sorted(
        tuple(r) for r in batch.collect()
    )


def test_subscription_limit_multichunk_batch(spark, tmp_path):
    """A micro-batch bigger than one Arrow chunk (ADVICE r04): the
    take-first-n must sort the WHOLE micro-batch before taking the
    prefix, not sort-and-head each ~maxRecordsPerBatch chunk in chunk
    order.  One 60-row file written in DESCENDING ts order + a 7-row
    Arrow batch size makes the per-chunk strategy emit high-ts rows;
    the correct prefix is the 5 globally-smallest (ts, event_id)."""
    import os
    import shutil
    import time

    from events_to_db_spark.streaming.subscriptions import (
        _stateful_take_first_n,
    )

    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events")
    sub = ev.orderBy(F.col("ts").desc()).limit(60).select("event_id", "ts")
    src = tmp_path / "one_big_file"
    sub.coalesce(1).write.mode("overwrite").parquet(str(src))
    feed = tmp_path / "feed"
    feed.mkdir()
    base = time.time() - 3600
    for p in sorted(src.glob("part-*.parquet")):
        dst = feed / "00_0.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (base, base))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = (
            spark.readStream.schema("event_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(feed))
        )
        acc = []
        q = (
            _stateful_take_first_n(stream, 5, ("ts", "event_id"))
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_mchunk"))
            .foreachBatch(lambda df, _bid: acc.extend(df.collect()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    want = [
        (r["event_id"], r["ts"])
        for r in sub.orderBy("ts", "event_id").limit(5).collect()
    ]
    got = sorted((r["event_id"], r["ts"]) for r in acc)
    assert got == sorted(want)


def test_batch_frame_rejected(spark):
    with pytest.raises(ValueError, match="streaming"):
        aql_subscription(
            with_tags(load_table(spark, SF_SMOKE, "events")), ROW_QUERY
        )


def test_envelope_meta_subscription_matches_batch(
    spark, chunked_events, tmp_path
):
    """Envelope metadata (`_time`/`_key`/`_appId`/`_tags[i]`, r6)
    compiles to carried envelope columns, so the SAME pipeline string
    runs unchanged over the subscription stream and converges to the
    batch answer."""
    q_text = (
        "FROM 'cat:conversion' FILTER _appId != 'app-2'"
        " SELECT { id: _key, app: _appId, tag0: _tags[0], k: _.k * 1 }"
    )
    feed, ev, _n = chunked_events
    acc = []
    q = (
        aql_subscription(events_file_stream(spark, feed), q_text)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sub_meta"))
        .foreachBatch(lambda df, _bid: acc.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = run_aql(with_tags(load_table(spark, SF_SMOKE, "events")), q_text)
    want = {tuple(r) for r in batch.collect()}
    got = {tuple(r) for r in acc}
    assert got == want and len(want) > 0
