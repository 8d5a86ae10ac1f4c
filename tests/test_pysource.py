"""Custom Python DataSource (Spark 4 API): partition planning, arrow
emission, determinism, and partial filter pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from events_to_db_spark.sources.pysource import (
    SyntheticEventsDataSource,
    SyntheticEventsReader,
    _row,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SyntheticEventsDataSource)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    yield
    spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rowcount_schema_and_parallelism(spark):
    df = _read(spark, rows=5000, numPartitions=8)
    assert df.count() == 5000
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]
    assert df.rdd.getNumPartitions() == 8


def test_deterministic_across_reads_and_partitionings(spark):
    a = _read(spark, rows=2000, numPartitions=2).collect()
    b = _read(spark, rows=2000, numPartitions=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # and row i is the documented pure function of i
    eid, ts_us, uid, etype, value = _row(123)
    got = [r for r in a if r.event_id == 123][0]
    assert (got.user_id, got.event_type, got.value) == (uid, etype, value)


def test_filter_pushdown_into_generator(spark):
    full = _read(spark, rows=5000).collect()
    pushed = (
        _read(spark, rows=5000)
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") > 250))
        .collect()
    )
    want = [r for r in full if r.event_type == "purchase" and r.user_id > 250]
    assert sorted(map(tuple, pushed)) == sorted(map(tuple, want))
    assert pushed  # predicate keeps a non-trivial slice


def test_pushdown_contract_partial(spark):
    """The reader consumes what it supports and yields back the rest —
    unit-level check of the pushFilters contract."""
    from pyspark.sql.datasource import EqualTo

    r = SyntheticEventsReader({"rows": "10"})
    leftover = list(
        r.pushFilters([EqualTo(("event_type",), "view"), EqualTo(("value",), 1.0)])
    )
    assert r.type_eq == "view"
    assert len(leftover) == 1 and leftover[0].attribute == ("value",)


def test_unsupported_filter_still_correct_end_to_end(spark):
    """A filter the source can't evaluate (on value) must be applied by
    Spark above the scan — results identical to post-hoc filtering."""
    got = _read(spark, rows=3000).filter(F.col("value") < 1.0).collect()
    want = [r for r in _read(spark, rows=3000).collect() if r.value < 1.0]
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


# --- r6: the streaming side (SimpleDataSourceStreamReader) ----------------


def _stream(spark, **opts):
    r = spark.readStream.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _drain(stream, ckpt, acc):
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, bid: acc.append((bid, df.collect())))
        .start()
    )
    q.processAllAvailable()
    from tests.conftest import stop_query

    stop_query(q)


def test_stream_matches_batch_read(spark, tmp_path):
    """Replay-then-follow equivalence: draining the stream over the
    [0, maxRows) horizon yields exactly the batch reader's rows — the
    two paths share one deterministic generator."""
    acc = []
    _drain(
        _stream(spark, maxRows=1000, rowsPerBatch=250),
        str(tmp_path / "ckpt"),
        acc,
    )
    assert len(acc) >= 4, "rowsPerBatch must shape micro-batches"
    got = sorted(tuple(r) for _bid, rows in acc for r in rows)
    want = sorted(tuple(r) for r in _read(spark, rows=1000).collect())
    assert got == want and len(got) == 1000


def test_stream_resume_from_checkpoint(spark, tmp_path):
    """Raising the horizon and re-running with the SAME checkpoint
    serves only the unseen suffix — offset resume, no redelivery."""
    ckpt = str(tmp_path / "ckpt_resume")
    first: list = []
    _drain(_stream(spark, maxRows=300, rowsPerBatch=100), ckpt, first)
    ids1 = {r.event_id for _b, rows in first for r in rows}
    assert ids1 == set(range(300))

    second: list = []
    _drain(_stream(spark, maxRows=600, rowsPerBatch=100), ckpt, second)
    ids2 = {r.event_id for _b, rows in second for r in rows}
    assert ids2 == set(range(300, 600)), "must not redeliver the prefix"


def test_stream_idle_at_horizon(spark, tmp_path):
    """At the horizon the reader reports no-new-data: a second drain on
    the same checkpoint emits nothing (clean steady state)."""
    ckpt = str(tmp_path / "ckpt_idle")
    _drain(_stream(spark, maxRows=100, rowsPerBatch=50), ckpt, [])
    again: list = []
    _drain(_stream(spark, maxRows=100, rowsPerBatch=50), ckpt, again)
    assert sum(len(rows) for _b, rows in again) == 0
