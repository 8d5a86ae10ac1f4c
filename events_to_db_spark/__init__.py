"""events_to_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Actyx/events-to-db.

The reference is a streaming ETL utility (Actyx event log → SQL
database) riding on the AQL query surface of the Actyx node; this engine
re-expresses that whole capability surface — scans, filters, joins,
aggregations, windows, event-log operators, streaming ingest with
idempotent sinks — plus the LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) as idiomatic
Spark DataFrame / SQL / Structured Streaming plans.  SURVEY.md is the
blueprint; §2 is the executable operator contract.
"""

from events_to_db_spark.session import configure, get_spark, load_sf, load_table


def __getattr__(name):
    # Lazy exports: EventQuery and the tag algebra pull in operator
    # modules; keep base import light for the driver contract path.
    if name == "EventQuery":
        from events_to_db_spark.api import EventQuery

        return EventQuery
    if name in ("Tag", "parse_tag_expr", "with_tags"):
        from events_to_db_spark.functions import tags

        return getattr(tags, name)
    raise AttributeError(name)


__all__ = [
    "configure",
    "get_spark",
    "load_sf",
    "load_table",
    "EventQuery",
    "Tag",
    "parse_tag_expr",
    "with_tags",
]
__version__ = "0.1.0"
