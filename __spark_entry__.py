"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`events_to_db_spark`: importing the operators
package registers every implemented SURVEY.md §2 query into the
registry; this module re-exports the three driver hooks.

* ``entry(spark)`` — flagship query (TPC-H-Q1-style aggregation) on
  sf0.001; driver checks rows > 0.
* ``queries()`` — name → fn(spark, sf_dir) -> DataFrame.
* ``oracle_sql()`` — name → equivalent DuckDB ANSI SQL over the
  pre-registered views (region nation customer supplier part orders
  lineitem events documents embeddings).  Names absent here get the
  driver's weaker rows-only check (approx sketches, non-SQL ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import events_to_db_spark.operators  # noqa: F401  (registers queries)
from events_to_db_spark.registry import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_agg_q1"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every hash-checkable query."""
    return dict(ORACLES)
