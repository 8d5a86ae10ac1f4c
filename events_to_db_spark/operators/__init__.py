"""Operator modules — importing this package registers every contract
query from SURVEY.md §2 into :mod:`events_to_db_spark.registry`."""

from events_to_db_spark.operators import (  # noqa: F401
    aggregates,
    events_ops,
    filters,
    joins,
    llm_ops,
    pipeline_ops,
    quality,
    sampling,
    scalar_fns,
    scans,
    setops,
    subqueries,
    udfs,
    windows,
)

__all__ = [
    "aggregates",
    "events_ops",
    "filters",
    "joins",
    "llm_ops",
    "pipeline_ops",
    "quality",
    "sampling",
    "scalar_fns",
    "scans",
    "setops",
    "subqueries",
    "udfs",
    "windows",
]
