"""AQL subscriptions — live AQL pipelines over the event stream.

The reference's query language has two consumption modes: ``query``
(bounded, replay) and ``subscribe`` (unbounded: replay history, then
keep following).  Because the AQL front-end (functions/aql.py) compiles
every stage to pure Catalyst expressions, the SAME compiled pipeline
runs unchanged on a Structured Streaming DataFrame — the file source's
replay-then-follow contract (offset log + new files as increments)
supplies the subscription semantics, and checkpointing makes a restart
resume exactly where the subscription left off.

Mode mapping:

* FROM / FILTER / SELECT / LET pipelines are stateless projections →
  ``outputMode("append")``, rows emitted as events arrive;
* AGGREGATE pipelines are running folds → ``outputMode("complete")``
  (or ``update``), each micro-batch emitting the fold-so-far — the
  reference's live-updating aggregate subscription;
* LIMIT is a *bounded-prefix* operator (first-n in total event order)
  — meaningless over an unbounded feed, so it is REJECTED loudly
  rather than silently re-interpreted.

tests/test_aql_subscription.py proves both modes converge to the batch
``run_aql`` answer when the feed drains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from events_to_db_spark.functions.aql import parse_aql, run_aql
from events_to_db_spark.functions.tags import with_tags


def aql_subscription(
    events_stream: DataFrame,
    query: str,
    payload_col: str = "props",
    tags_col: str = "tags",
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """Compile an AQL pipeline against an unbounded event frame.

    Returns the streaming DataFrame; the caller picks trigger/sink.
    Raises ``ValueError`` for pipelines whose semantics need a bounded
    stream (LIMIT).
    """
    if not events_stream.isStreaming:
        raise ValueError(
            "aql_subscription needs a streaming DataFrame; use run_aql "
            "for bounded queries"
        )
    parsed = parse_aql(query)
    if any(kind == "LIMIT" for kind, _body in parsed.stages):
        raise ValueError(
            "AQL LIMIT is a bounded event-order prefix and cannot run as "
            "a subscription; drop the LIMIT or use the bounded query mode"
        )
    tagged = with_tags(events_stream)
    return run_aql(
        tagged,
        query,
        payload_col=payload_col,
        tags_col=tags_col,
        order_cols=order_cols,
    )
