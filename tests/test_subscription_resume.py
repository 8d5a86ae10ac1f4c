"""Subscription resume (the reference's query-then-subscribe restart
contract): an AQL subscription stopped mid-feed and restarted on the
SAME checkpoint must consume exactly the remaining files — no
duplicates, no gaps — ending with the full batch answer."""

from __future__ import annotations

import os
import shutil
import time

from events_to_db_spark.functions.aql import run_aql
from events_to_db_spark.functions.tags import with_tags
from events_to_db_spark.session import load_table
from events_to_db_spark.streaming.sources import events_file_stream
from events_to_db_spark.streaming.subscriptions import aql_subscription
from tests.conftest import SF_SMOKE

QUERY = "FROM 'type:view' FILTER _.k >= 80 SELECT { k: _.k * 1 }"


def _drain(spark, feed, ckpt, acc):
    q = (
        aql_subscription(events_file_stream(spark, feed), QUERY)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _bid: acc.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_subscription_resumes_exactly_once(spark, chunked_events, tmp_path):
    src, ev, _n = chunked_events
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    files = sorted(os.listdir(src))
    assert len(files) >= 4, "need a multi-file feed to split"
    half = len(files) // 2
    base = time.time() - 3600

    # Phase 1: only the first half of the feed exists.
    for i, f in enumerate(files[:half]):
        shutil.copy(os.path.join(src, f), os.path.join(feed, f))
        os.utime(os.path.join(feed, f), (base + i * 10, base + i * 10))
    ckpt = str(tmp_path / "ckpt_resume")
    acc: list = []
    _drain(spark, feed, ckpt, acc)
    n_phase1 = len(acc)

    # Phase 2: the rest lands; SAME checkpoint resumes the feed.
    for i, f in enumerate(files[half:], start=half):
        shutil.copy(os.path.join(src, f), os.path.join(feed, f))
        os.utime(os.path.join(feed, f), (base + i * 10, base + i * 10))
    _drain(spark, feed, ckpt, acc)

    batch = run_aql(with_tags(load_table(spark, SF_SMOKE, "events")), QUERY)
    want = [tuple(r) for r in batch.collect()]
    got = [tuple(r) for r in acc]
    # exactly-once: multiset equality (no dup, no gap), and phase 1
    # must have delivered a strict prefix worth of rows
    assert sorted(got) == sorted(want)
    assert 0 < n_phase1 < len(want)
