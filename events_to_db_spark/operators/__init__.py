"""Operator modules — importing this package registers every contract
query from SURVEY.md §2 into :mod:`events_to_db_spark.registry`."""

from events_to_db_spark.operators import (  # noqa: F401
    aggregates,
    curation_ops,
    events_ops,
    filters,
    graph_ops,
    joins,
    llm_ops,
    pipeline_ops,
    quality,
    sampling,
    scalar_fns,
    scans,
    setops,
    sketch_ops,
    subqueries,
    temporal_ops,
    udfs,
    windows,
)

__all__ = [
    "aggregates",
    "curation_ops",
    "events_ops",
    "filters",
    "graph_ops",
    "joins",
    "llm_ops",
    "pipeline_ops",
    "quality",
    "sampling",
    "scalar_fns",
    "scans",
    "setops",
    "sketch_ops",
    "subqueries",
    "temporal_ops",
    "udfs",
    "windows",
]
