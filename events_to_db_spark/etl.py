"""events-to-db config runner — the reference's namesake surface.

The public utility this engine re-expresses is *config-driven*: a user
declares, in one config document, which AQL/tag queries feed which
target tables, and the tool owns the rest of the lifecycle — catch up
from the last checkpoint, follow the live feed, flatten events to rows,
insert idempotently, commit offsets (SURVEY.md §3.1 Path A).  The exact
config keys are unknowable (empty reference checkout, SURVEY §0), so
this module defines a minimal documented schema carrying the same
information::

    {
      "events":      "<dir of event-log parquet files>",
      "db":          "<target db path>",          # file-backed SQL engine
      "checkpoints": "<checkpoint root dir>",     # one sub-dir per table
      "tables": [
        {"table": "purchases",
         "query": "FROM 'type:purchase' FILTER _.k >= 2"
                  " SELECT { user: _.user_id, k: _.k }"},
        {"table": "raw_copy"}    # no query → copy every event
      ]
    }

Mapping onto the engine (zero new execution machinery):

* each table entry compiles through the SAME AQL front-end as queries
  and subscriptions (:func:`streaming.subscriptions.aql_subscription`),
  so the full FROM/FILTER/SELECT/LET/envelope-metadata surface of
  functions/aql.py is available in configs;
* ``run_aql`` row pipelines always carry ``(ts, event_id)`` — the
  event key — so every sink write is an *idempotent upsert on
  event_id* (at-least-once delivery + idempotent insert, the
  reference's two-layer exactly-once posture);
* catch-up/offset state is the streaming checkpoint: re-running a
  config resumes where the last run stopped (new source files only),
  and redelivered rows are absorbed by the keyed upsert — the
  "read checkpoint → catch up → follow" loop with the offset map held
  by Spark's offset log instead of a bespoke table;
* ``AGGREGATE`` entries are rejected loudly: the copy utility moves
  rows (folds belong to the query/subscription surface — the target
  DB aggregates downstream, SURVEY §3.1 Path C).

At 100 TB the per-table pipelines are independent streaming jobs: each
scans only its tag partition (the FROM predicate is pushdown-eligible),
state is bounded by the checkpoint horizon, and the sink batches are
per-micro-batch transactions — nothing accumulates on the driver.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from events_to_db_spark.functions.aql import parse_aql
from events_to_db_spark.streaming.sink import upsert_foreach_batch
from events_to_db_spark.streaming.sources import events_file_stream
from events_to_db_spark.streaming.subscriptions import aql_subscription

#: A table entry without a query copies the whole log: envelope
#: (ts, event_id) + the raw payload — "flatten {metadata + payload}".
DEFAULT_QUERY = "FROM allEvents"

#: Table names splice into checkpoint paths and quoted SQL identifiers;
#: restrict them so a name can never escape the checkpoint directory
#: ('/', '..') or break the generated SQL ('"') — the same identifier
#: gate expectations.py applies to rule ids (ADVICE r06).  Requires at
#: least one word character so '.'/'..' cannot pass the charset.
_TABLE_RE = re.compile(r"^(?=.*[A-Za-z0-9_])[A-Za-z0-9_.\-]+$")


def validate_config(config: dict) -> None:
    """Fail fast, before any stream starts: every query must parse and
    be a ROW pipeline (AGGREGATE folds have no event key to upsert on)."""
    for key in ("events", "db", "checkpoints", "tables"):
        if key not in config:
            raise ValueError(f"etl config: missing key {key!r}")
    if not config["tables"]:
        raise ValueError("etl config: no tables declared")
    seen: set[str] = set()
    for entry in config["tables"]:
        name = entry.get("table")
        if not name:
            raise ValueError("etl config: table entry without 'table' name")
        if not _TABLE_RE.match(name):
            raise ValueError(
                f"etl config: table name {name!r} must match "
                "[A-Za-z0-9_.-]+ (with at least one word character) — "
                "names splice into checkpoint paths and SQL identifiers"
            )
        if name in seen:
            raise ValueError(f"etl config: duplicate table {name!r}")
        seen.add(name)
        q = parse_aql(entry.get("query", DEFAULT_QUERY))
        for kind, _body in q.stages:
            if kind == "AGGREGATE":
                raise ValueError(
                    f"etl config: table {name!r} uses AGGREGATE — the "
                    "copy pipeline moves rows; run folds via "
                    "aql_subscription / run_aql and aggregate in the "
                    "target DB instead"
                )


def table_pipeline(
    spark: SparkSession, config: dict, entry: dict
) -> DataFrame:
    """The unbounded, compiled frame for one table entry (no sink)."""
    stream = events_file_stream(
        spark, config["events"], max_files_per_trigger=int(
            config.get("max_files_per_trigger", 1)
        )
    )
    return aql_subscription(stream, entry.get("query", DEFAULT_QUERY))


def run_etl_config(
    spark: SparkSession, config: dict, available_now: bool = True
) -> dict[str, StreamingQuery]:
    """Start every table pipeline in the config; returns
    ``{table: StreamingQuery}``.

    ``available_now=True`` is the catch-up mode (drain everything the
    offset log has not seen, then stop — the utility's "run until
    caught up" invocation); ``False`` keeps following the live feed.
    Callers in catch-up mode should ``awaitTermination()`` each query.
    """
    validate_config(config)
    queries: dict[str, StreamingQuery] = {}
    for entry in config["tables"]:
        name = entry["table"]
        out = table_pipeline(spark, config, entry)
        writer = (
            out.writeStream.outputMode("append")
            .option(
                "checkpointLocation", f"{config['checkpoints']}/{name}"
            )
            .foreachBatch(
                upsert_foreach_batch(config["db"], name, ["event_id"])
            )
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        queries[name] = writer.start()
    return queries
