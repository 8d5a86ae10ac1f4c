"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference exposes its event store as a first-class *source* — not
a file format — with partitioned parallel reads and predicate
pushdown.  Spark 4's Python DataSource API is the idiomatic way to
build exactly that surface without JVM code, so this module ships one:
a deterministic synthetic event-log source with

* **partition planning** — ``partitions()`` splits the row range into
  ``numPartitions`` contiguous slices, each read independently by an
  executor (the parallel-scan contract);
* **filter pushdown** — ``pushFilters()`` accepts ``event_type =``
  equality and ``user_id`` range predicates and applies them inside
  the generator, returning the rest to Spark for post-evaluation
  (partial pushdown, the same contract as the parquet reader);
* **arrow-batch emission** — rows are yielded as pyarrow RecordBatches
  (columnar transfer, not per-row pickling);
* **a streaming side** (r6) — the SAME format name serves
  ``spark.readStream`` through a ``SimpleDataSourceStreamReader``:
  offset-tracked bounded replay of the identical row generator, the
  reference's replay-then-follow feed shape (batch/stream equivalence
  and checkpoint resume are pinned in tests/test_pysource.py).

Determinism: row ``i`` is a pure function of ``i`` (multiplicative
hashing, no RNG object), so any partitioning of the index range yields
the same multiset — re-reads and different parallelism are
reproducible, which the tests pin.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_TYPES = ("view", "click", "purchase", "login", "logout")
_BASE_TS_US = 820454400000000  # 1996-01-01T00:00:00Z in epoch µs


def _row(i: int) -> tuple[int, int, int, str, float]:
    """Deterministic event ``i``: (event_id, ts_us, user_id, type, value)."""
    h = (i * 2654435761) & 0xFFFFFFFF  # Knuth multiplicative hash
    user_id = h % 500
    etype = _TYPES[(h >> 8) % len(_TYPES)]
    value = ((h >> 16) % 10000) / 100.0
    ts_us = _BASE_TS_US + i * 1_000_000
    return i, ts_us, user_id, etype, value


@dataclass
class _Slice(InputPartition):
    start: int
    end: int


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 10_000))
        self.n_parts = int(options.get("numPartitions", 4))
        self.batch_rows = int(options.get("batchRows", 4_096))
        self.type_eq: str | None = None
        self.uid_lo: int | None = None  # user_id > uid_lo
        self.uid_hi: int | None = None  # user_id < uid_hi

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Consume what the generator can evaluate; yield back the rest.

        Supported: ``event_type = lit`` and ``user_id </>`` bounds.
        Yielded (unsupported) filters are re-applied by Spark above the
        scan — partial pushdown is always semantics-preserving."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[-1] if attr else None
            if isinstance(f, EqualTo) and col == "event_type":
                self.type_eq = f.value
            elif type(f).__name__ == "GreaterThan" and col == "user_id":
                self.uid_lo = f.value
            elif type(f).__name__ == "LessThan" and col == "user_id":
                self.uid_hi = f.value
            else:
                yield f

    def partitions(self):
        per = max(1, -(-self.n_rows // self.n_parts))  # ceil
        return [
            _Slice(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _Slice):
        ids, tss, uids, types, vals = [], [], [], [], []

        def flush():
            if not ids:
                return None
            batch = pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(tss, pa.timestamp("us")),
                    pa.array(uids, pa.int64()),
                    pa.array(types, pa.string()),
                    pa.array(vals, pa.float64()),
                ],
                names=["event_id", "ts", "user_id", "event_type", "value"],
            )
            ids.clear(); tss.clear(); uids.clear(); types.clear(); vals.clear()
            return batch

        for i in range(partition.start, partition.end):
            eid, ts_us, uid, etype, value = _row(i)
            if self.type_eq is not None and etype != self.type_eq:
                continue
            if self.uid_lo is not None and not uid > self.uid_lo:
                continue
            if self.uid_hi is not None and not uid < self.uid_hi:
                continue
            ids.append(eid); tss.append(ts_us); uids.append(uid)
            types.append(etype); vals.append(value)
            if len(ids) >= self.batch_rows:
                yield flush()
        tail = flush()
        if tail is not None:
            yield tail


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)`` —
    register with ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", TimestampType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType):  # noqa: N802 (API)
        return SyntheticEventsStreamReader(self.options)


# --------------------------------------------------------------------------
# Streaming side: the replay-then-follow feed (Spark 4 simple stream API)
# --------------------------------------------------------------------------

class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """The same event log as an unbounded feed —
    ``spark.readStream.format("synthetic_events")``.

    Offsets are row indices (``{"index": i}``); each poll serves the
    next ``rowsPerBatch`` rows until the configured ``maxRows``
    horizon, then reports no-new-data (so ``processAllAvailable()``
    drains and returns — the bounded-replay harness shape).  Restart
    safety comes from the API itself: Spark hands ``read(start)`` the
    checkpointed offset, and ``readBetweenOffsets`` replays a
    committed-but-unflushed range after recovery — both are pure
    functions of the deterministic row generator, so replay is
    bit-identical (exactly-once with any idempotent sink).

    Scale posture, stated honestly: the simple stream reader is a
    driver-side feed — the right shape for the reference's single
    event socket (a live tail is not a parallel scan).  The CATCH-UP
    path at 100 TB is the partitioned batch reader above (or the
    persisted log via the file source); this reader is the follow
    path.
    """

    def __init__(self, options: dict):
        self.max_rows = int(options.get("maxRows", 10_000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 1_000))

    def initialOffset(self) -> dict:
        return {"index": 0}

    @staticmethod
    def _rows(lo: int, hi: int):
        """One bounded chunk, MATERIALIZED: the runner's prefetch cache
        replays reads by copying the returned iterator, so it must be
        list-backed (a generator raises "cannot pickle 'generator'");
        chunks are ≤ rowsPerBatch rows, so memory stays bounded."""
        import datetime as dt

        out = []
        for i in range(lo, hi):
            eid, ts_us, uid, etype, value = _row(i)
            ts = dt.datetime.fromtimestamp(
                ts_us / 1_000_000, tz=dt.timezone.utc
            ).replace(tzinfo=None)
            out.append((eid, ts, uid, etype, value))
        return out

    def read(self, start: dict):
        lo = int(start["index"])
        hi = min(lo + self.rows_per_batch, self.max_rows)
        if hi <= lo:
            return iter(()), {"index": lo}
        return iter(self._rows(lo, hi)), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["index"]), int(end["index"])))

    def commit(self, end: dict) -> None:
        pass  # the generator is stateless; nothing to release
