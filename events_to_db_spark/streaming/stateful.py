"""Arbitrary stateful streaming — the funnel/alerting surface
(SURVEY.md §2.9).

The batch funnel (``q_ev_funnel``) asks: which users purchased within
7 days of their first signup?  On a live feed the same question needs
per-user state that outlives a micro-batch: the first signup timestamp
and whether the conversion already fired.  Implemented with
``applyInPandasWithState`` (the GroupState API): the engine shuffles
rows by key, hands each key's batch rows to the update function with a
keyed state store, and checkpoints state with the offsets —
restart-safe like everything else in the pipeline.

API note: Spark 4's successor API ``transformWithStateInPandas``
(StatefulProcessor + RocksDB provider) is the forward path, but its
Python driver worker requires ``google.protobuf``, which is not
functional in this environment — verified failing with
``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE: ImportError:
cannot import name 'descriptor' from 'google.protobuf'``.  The
GroupState formulation below is semantically equivalent for this
operator and runs on the default state store.

Ordering contract: conversions are emitted as soon as the qualifying
purchase is *seen*, assuming the feed is per-user time-ordered across
batches (the replay contract).  An out-of-order-robust variant would
buffer purchases with event-time timeouts until the watermark seals
the signup; the batch twin is the oracle for fully unordered data.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("signup_ts", TimestampType()),
        StructField("purchase_ts", TimestampType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("signup_ts", TimestampType()),
        StructField("converted", BooleanType()),
    ]
)

WINDOW_DAYS = 7


def _funnel_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user conversion detector: remembers the first signup, emits
    once when a purchase lands within the window."""
    signup_ts, converted = state.get if state.exists else (None, False)
    out = []
    for pdf in pdfs:
        if converted:
            break
        pdf = pdf.sort_values(["ts", "event_id"])
        for _, row in pdf.iterrows():
            if row["event_type"] == "signup" and signup_ts is None:
                signup_ts = row["ts"]
            elif (
                row["event_type"] == "purchase"
                and not converted
                and signup_ts is not None
                and signup_ts <= row["ts"] <= signup_ts + pd.Timedelta(days=WINDOW_DAYS)
            ):
                converted = True
                out.append((key[0], signup_ts, row["ts"]))
                break
    state.update((signup_ts, converted))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "signup_ts", "purchase_ts"])


def funnel_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Conversions as an append stream: at most one row per user,
    emitted in the micro-batch where the qualifying purchase arrives."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_update,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="Append",
            timeoutConf="NoTimeout",
        )
    )


ALERT_HI = 300.0
ALERT_LO = 150.0

ALERT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("transition", BooleanType()),  # True = opened
    ]
)

ALERT_STATE_SCHEMA = StructType([StructField("alert_on", BooleanType())])


def _alert_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Hysteresis automaton (same thresholds as the batch
    ``q_ev_hysteresis``): open above ALERT_HI, close below ALERT_LO,
    emit one row per transition.  State is a single boolean per user —
    bounded regardless of stream length."""
    (on,) = state.get if state.exists else (False,)
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for _, row in pdf.iterrows():
            if not on and row["value"] > ALERT_HI:
                on = True
                out.append((key[0], row["ts"], row["event_id"], True))
            elif on and row["value"] < ALERT_LO:
                on = False
                out.append((key[0], row["ts"], row["event_id"], False))
    state.update((on,))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "ts", "event_id", "transition"]
        )


def alert_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Alert transitions as an append stream — the live counterpart of
    the batch crossing-event formulation (the batch answer is the
    oracle: tests/test_stateful_streaming.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _alert_update,
            outputStructType=ALERT_OUTPUT_SCHEMA,
            stateStructType=ALERT_STATE_SCHEMA,
            outputMode="Append",
            timeoutConf="NoTimeout",
        )
    )


BALANCE_CAP = 100000
BALANCE_DRAIN = 500

BALANCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_ops", LongType()),
        StructField("final_balance_cents", LongType()),
        StructField("n_clamped_low", LongType()),
        StructField("n_clamped_high", LongType()),
    ]
)

BALANCE_STATE_SCHEMA = StructType(
    [
        StructField("bal", LongType()),
        StructField("n_ops", LongType()),
        StructField("n_lo", LongType()),
        StructField("n_hi", LongType()),
    ]
)


def _balance_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Streaming twin of the batch clamped fold (operators/udfs.py
    q_ev_clamped_balance): the per-user token bucket survives across
    micro-batches as four bounded integers of GroupState.  Emits the
    running snapshot after each batch touching the user; the final
    emission per user equals the batch fold exactly (equivalence test
    in tests/test_stateful_streaming.py)."""
    bal, n_ops, lo, hi = state.get if state.exists else (0, 0, 0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for d in pdf["delta"]:
            b = bal + int(d)
            if b < 0:
                lo += 1
                b = 0
            elif b > BALANCE_CAP:
                hi += 1
                b = BALANCE_CAP
            bal = b
            n_ops += 1
    state.update((bal, n_ops, lo, hi))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_ops": [n_ops],
            "final_balance_cents": [bal],
            "n_clamped_low": [lo],
            "n_clamped_high": [hi],
        }
    )


def balance_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Clamped-balance snapshots as an update-ish append stream: one
    snapshot row per (user, micro-batch that touched the user)."""
    from pyspark.sql import functions as F

    ops = events.where(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.expr("CAST(round(value * 100) AS BIGINT)"),
        )
        .otherwise(F.lit(-BALANCE_DRAIN).cast("bigint"))
        .alias("delta"),
    )
    return (
        ops.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _balance_update,
            outputStructType=BALANCE_OUTPUT_SCHEMA,
            stateStructType=BALANCE_STATE_SCHEMA,
            outputMode="Append",
            timeoutConf="NoTimeout",
        )
    )


HH_COUNTERS = 8

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("est_count", LongType()),
        StructField("n_seen", LongType()),
    ]
)

HH_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)


def misra_gries_fold(users, counters: dict, m: int = HH_COUNTERS) -> dict:
    """The Misra–Gries update shared by the streaming operator and its
    batch twin: +1 if tracked, insert if a slot is free, else decrement
    every counter and drop zeros.  Deterministic given the input order;
    estimates undercount by at most n/m (the classical guarantee)."""
    for u in users:
        u = int(u)
        if u in counters:
            counters[u] += 1
        elif len(counters) < m:
            counters[u] = 1
        else:
            for k in list(counters):
                counters[k] -= 1
                if counters[k] == 0:
                    del counters[k]
    return counters


def _hh_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-event-type Misra–Gries heavy hitters: at most HH_COUNTERS
    (user, count) pairs of bounded GroupState per key, whatever the
    user cardinality — the sketch that makes streaming top-k feasible
    when an exact per-user count map would be unbounded state."""
    if state.exists:
        keys, counts, n_seen = state.get
        counters = dict(zip(keys, counts))
    else:
        counters, n_seen = {}, 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        misra_gries_fold(pdf["user_id"], counters)
        n_seen += len(pdf)
    items = sorted(counters.items())
    state.update(([k for k, _c in items], [c for _k, c in items], n_seen))
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(items),
            "user_id": [k for k, _c in items],
            "est_count": [c for _k, c in items],
            "n_seen": [n_seen] * len(items),
        }
    )


def heavy_hitter_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming per-type heavy hitters (Misra–Gries, 8 counters):
    emits the surviving counter set after every micro-batch touching
    the type; the final emission equals the batch replay of the same
    fold exactly (tests/test_stateful_streaming.py)."""
    ops = events.select("event_type", "ts", "event_id", "user_id")
    return (
        ops.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _hh_update,
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="Append",
            timeoutConf="NoTimeout",
        )
    )


SESSION_GAP_MIN = 30

SESS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
        StructField("n_events", LongType()),
        StructField("closed_by", StringType()),
    ]
)

SESS_STATE_SCHEMA = StructType(
    [
        StructField("start_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("n", LongType()),
    ]
)


def _session_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """GroupState sessionizer with EVENT-TIME TIMEOUTS: a session
    closes either because a later event arrives past the gap
    ('gap'-closed, in-stream) or because the WATERMARK passes
    last_ts + gap with no successor ('timeout'-closed — the state
    store expiring idle keys, which is what bounds state on a feed
    with churned users).  The other stateful ops here never time out;
    this one exists to exercise that contract."""
    import datetime as dt

    gap = dt.timedelta(minutes=SESSION_GAP_MIN)
    out = []
    if state.hasTimedOut:
        start_ts, last_ts, n = state.get
        out.append((key[0], start_ts, last_ts, n, "timeout"))
        state.remove()
        yield pd.DataFrame(
            out,
            columns=["user_id", "start_ts", "end_ts", "n_events", "closed_by"],
        )
        return
    cur = state.get if state.exists else None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            ts = ts.to_pydatetime()
            if cur is None:
                cur = (ts, ts, 1)
            elif ts - cur[1] > gap:
                out.append((key[0], cur[0], cur[1], cur[2], "gap"))
                cur = (ts, ts, 1)
            else:
                cur = (cur[0], ts, cur[2] + 1)
    if cur is not None:
        state.update(cur)
        state.setTimeoutTimestamp(
            int((cur[1] + gap).timestamp() * 1000)
        )
    yield pd.DataFrame(
        out,
        columns=["user_id", "start_ts", "end_ts", "n_events", "closed_by"],
    )


def session_timeout_stream(
    events: DataFrame, watermark: str = "1 second"
) -> DataFrame:
    """Timeout-closing sessionizer: gap-closures emit as soon as the
    successor event is seen; idle sessions emit when the watermark
    expires them — so state size tracks ACTIVE users only.  The batch
    twin is `session_window(ts, '30 minutes')`; equivalence asserted
    in tests/test_stateful_streaming.py."""
    ops = events.select("user_id", "ts", "event_id")
    return (
        ops.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESS_OUTPUT_SCHEMA,
            stateStructType=SESS_STATE_SCHEMA,
            outputMode="Append",
            timeoutConf="EventTimeTimeout",
        )
    )
