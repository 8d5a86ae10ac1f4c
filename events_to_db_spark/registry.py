"""Central query/oracle registry.

Every contract query from SURVEY.md §2 registers itself here via the
:func:`query` decorator; ``__spark_entry__.py`` re-exports the two dicts
the driver consumes.  Keeping registration declarative means the operator
modules stay importable without a SparkSession and the driver contract
file stays a thin shim.

A registered callable has signature ``fn(spark, sf_dir) -> DataFrame``
and must alias every computed column identically to its oracle SQL
(the driver compares schemas by sorted column name — SURVEY.md §7.5.4).
Queries with no SQL-expressible oracle (approx sketches, streaming-only
surface) register ``oracle=None`` and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as contract query ``name`` with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
