"""Arbitrary-stateful streaming funnel vs the batch oracle."""

from __future__ import annotations

import pandas as pd

from events_to_db_spark.streaming.sources import events_file_stream
from events_to_db_spark.streaming.stateful import funnel_stream
from tests.conftest import SF_SMOKE


def test_funnel_stream_matches_batch(spark, chunked_events, tmp_path):
    feed, ev, n = chunked_events
    acc = []

    def collect(batch_df, _bid):
        acc.extend(batch_df.collect())

    q = (
        funnel_stream(events_file_stream(spark, feed))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import __spark_entry__ as e

    batch = e.queries()["q_ev_funnel"](spark, SF_SMOKE).collect()
    fmt = "%Y-%m-%d %H:%M:%S.%f"
    got = {
        (
            r["user_id"],
            pd.Timestamp(r["signup_ts"]).strftime(fmt),
            pd.Timestamp(r["purchase_ts"]).strftime(fmt),
        )
        for r in acc
    }
    want = {(r["user_id"], r["signup_ts"], r["purchase_ts"]) for r in batch}
    assert got == want
    # at most one conversion per user
    assert len({u for u, *_ in got}) == len(got)


def test_alert_stream_matches_batch_hysteresis(spark, chunked_events, tmp_path):
    """The applyInPandasWithState hysteresis automaton must reproduce
    the batch crossing-event formulation exactly: same per-user alert
    (ON-transition) counts, same final open/closed state."""
    from events_to_db_spark.streaming.stateful import alert_stream

    feed, ev, n = chunked_events
    acc = []

    def collect(batch_df, _bid):
        acc.extend(batch_df.collect())

    q = (
        alert_stream(events_file_stream(spark, feed))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_alert"))
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import __spark_entry__ as e

    batch = {
        r["user_id"]: (r["n_alerts"], r["alert_open"])
        for r in e.queries()["q_ev_hysteresis"](spark, SF_SMOKE).collect()
    }
    opens: dict[int, int] = {}
    last: dict[int, bool] = {}
    for r in sorted(acc, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        if r["transition"]:
            opens[r["user_id"]] = opens.get(r["user_id"], 0) + 1
        last[r["user_id"]] = r["transition"]
    got = {u: (opens[u], last[u]) for u in opens}
    assert got == batch


def test_balance_stream_matches_batch_fold(spark, chunked_events, tmp_path):
    """The streaming token bucket's LAST snapshot per user must equal
    the batch applyInPandas fold — state carried across micro-batches
    replays the identical clamp sequence."""
    from events_to_db_spark.streaming.stateful import balance_stream

    feed, ev, n = chunked_events
    acc = []

    def collect(batch_df, bid):
        acc.extend((bid, r) for r in batch_df.collect())

    q = (
        balance_stream(events_file_stream(spark, feed))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bal"))
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    last = {}
    for bid, r in sorted(acc, key=lambda t: t[0]):
        last[r["user_id"]] = (
            r["n_ops"],
            r["final_balance_cents"],
            r["n_clamped_low"],
            r["n_clamped_high"],
        )

    import __spark_entry__ as e

    batch = e.queries()["q_ev_clamped_balance"](spark, SF_SMOKE).collect()
    want = {
        r["user_id"]: (
            r["n_ops"],
            r["final_balance_cents"],
            r["n_clamped_low"],
            r["n_clamped_high"],
        )
        for r in batch
    }
    assert last == want


def test_heavy_hitter_stream_matches_batch_fold(spark, chunked_events, tmp_path):
    """The streaming Misra–Gries counter set after the last micro-batch
    must equal a driver-side replay of the identical fold over the
    whole feed in (ts, event_id) order — state carried across batches
    changes nothing."""
    from events_to_db_spark.streaming.stateful import (
        heavy_hitter_stream,
        misra_gries_fold,
    )

    feed, ev, n = chunked_events
    acc = []

    def collect(batch_df, bid):
        acc.extend((bid, r) for r in batch_df.collect())

    q = (
        heavy_hitter_stream(events_file_stream(spark, feed))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # each emission replaces the type's snapshot — keep the last batch's
    by_batch: dict = {}
    for bid, r in acc:
        by_batch.setdefault((r["event_type"], bid), {})[r["user_id"]] = r[
            "est_count"
        ]
    last_bid: dict = {}
    for (et, bid), snap in by_batch.items():
        if et not in last_bid or bid > last_bid[et][0]:
            last_bid[et] = (bid, snap)
    got = {et: snap for et, (bid, snap) in last_bid.items()}

    rows = sorted(
        ev.select("event_type", "ts", "event_id", "user_id").collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    want: dict = {}
    for r in rows:
        want.setdefault(r["event_type"], [])
        want[r["event_type"]].append(r["user_id"])
    want = {
        et: misra_gries_fold(users, {}) for et, users in want.items()
    }
    assert got == want

    # State-store bound (VERDICT r02 #9): the Misra–Gries operator keeps
    # exactly one state row per event type — the "state is O(|types|),
    # not O(|events|)" claim as a pinned number.
    ops = (q.lastProgress or {}).get("stateOperators") or []
    assert ops, "no stateOperators in lastProgress"
    n_types = ev.select("event_type").distinct().count()
    assert 0 < ops[0]["numRowsTotal"] <= n_types, ops[0]


def test_session_timeout_stream_matches_batch_sessions(
    spark, chunked_events, tmp_path
):
    """Every emitted session must equal its `session_window` batch
    twin; every NON-final session per user must be gap-closed
    in-stream (deterministic regardless of watermark progress);
    timeout-closures may additionally flush trailing sessions."""
    from pyspark.sql import functions as F

    from events_to_db_spark.streaming.stateful import (
        session_timeout_stream,
    )

    feed, ev, n = chunked_events
    acc = []

    def collect(batch_df, bid):
        acc.extend(batch_df.collect())

    q = (
        session_timeout_stream(events_file_stream(spark, feed))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess_to"))
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    want = {
        (r["user_id"], r["start_ts"]): (r["end_ts"], r["n_events"])
        for r in batch
    }
    # final (latest-starting) session per user — the only ones allowed
    # to be missing from the emitted set
    finals = {}
    for (uid, st), _v in want.items():
        if uid not in finals or st > finals[uid]:
            finals[uid] = st

    got = {}
    for r in acc:
        k = (r["user_id"], r["start_ts"])
        assert k in want, f"emitted session not in batch set: {k}"
        assert want[k] == (r["end_ts"], r["n_events"]), k
        got[k] = r["closed_by"]

    for k in want:
        uid, st = k
        if finals[uid] != st:
            assert k in got and got[k] == "gap", (
                f"non-final session must be gap-closed in-stream: {k}"
            )

    # State-store bound (VERDICT r02 #9): after the final micro-batch
    # the sessionizer holds at most one open-session row per user still
    # inside the watermark — never O(|events|).  EventTimeTimeout has
    # expired everything the final watermark passed.
    ops = (q.lastProgress or {}).get("stateOperators") or []
    assert ops, "no stateOperators in lastProgress"
    n_users = ev.select("user_id").distinct().count()
    assert ops[0]["numRowsTotal"] <= n_users, ops[0]
