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
  (columnar transfer, not per-row pickling).

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
