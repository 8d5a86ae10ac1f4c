"""Structured-Streaming surface — the events-to-db capability proper
(SURVEY.md §2.9 streaming-only).

The reference is an event→database copy pipeline: subscribe to an event
feed, flatten events to rows, upsert into a SQL table keyed by event id,
and persist an offset map so restarts resume exactly where they left
off.  The Spark-native equivalent, implemented here:

* sources   — bounded-or-live file source over the events schema, plus
  a rate-source mapping for soak tests (:mod:`.sources`);
* operators — the SAME logical plans as the batch §2.9 queries, with
  ``withWatermark`` bounding state (:mod:`.pipelines`);
* sink      — ``foreachBatch`` idempotent upsert keyed by ``event_id``
  (:mod:`.sink`); Spark's ``checkpointLocation`` (offset log + commit
  log) *is* the reference's offset map, and at-least-once delivery +
  idempotent upsert ⇒ effectively-once — the reference's core
  guarantee.

Verified by tests/test_streaming.py: drip-feed the batch table through
the stream in chunks and assert the final sink state equals the batch
answer, including redelivered-duplicate absorption and
checkpoint-resume.
"""

from events_to_db_spark.streaming.pipelines import (  # noqa: F401
    copy_to_db,
    dedup_stream,
    latest_state_to_db,
    session_counts_stream,
    scd2_to_db,
    signup_purchase_join_stream,
    tumbling_counts_stream,
)
from events_to_db_spark.streaming.sink import read_sink_table, upsert_foreach_batch  # noqa: F401
from events_to_db_spark.streaming.sources import events_file_stream, rate_events_stream  # noqa: F401
