"""Fluent event-query API — the AQL pipeline shape over DataFrames.

AQL evaluates ``FROM tag-expr → FILTER → SELECT → AGGREGATE → LIMIT``.
This module gives a user of the reference the same pipeline shape,
compiled 1:1 to DataFrame operations so Catalyst sees an ordinary
declarative plan (no interpretation layer at execution time):

    result = (
        EventQuery.from_tags(events, "'type:purchase' & 'cat:conversion'")
        .filter(F.col("value") > 100)
        .select("user_id", "value", "ts")
        .aggregate(F.sum("value").alias("total"), by=["user_id"])
        .limit(10, order_by=[F.col("total").desc(), "user_id"])
        .df()
    )

Deliberately *not* an AQL string parser (SURVEY.md §1.3 — the
capabilities, not the syntax, are the target); the tag-expression text
form IS parsed (:mod:`events_to_db_spark.functions.tags`) because tag
queries live in configs.

Time bounds mirror AQL's FROM time constraints; ``subscribe()`` hands
back the same pipeline over an unbounded source, which is the
query-then-subscribe contract Spark's unified batch/stream semantics
provide for free.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from events_to_db_spark.functions.tags import TagExpr, parse_tag_expr, with_tags


class EventQuery:
    """Immutable builder; every step returns a new query object."""

    def __init__(self, df: DataFrame):
        self._df = df

    # ------------------------------------------------------------ FROM
    @classmethod
    def from_events(cls, events: DataFrame) -> "EventQuery":
        """allEvents — no tag constraint."""
        return cls(events)

    @classmethod
    def from_tags(
        cls, events: DataFrame, expr: "TagExpr | str", tags_col: str = "tags"
    ) -> "EventQuery":
        """FROM tag-expr: events must carry a ``tags`` array column
        (see :func:`with_tags` for deriving one)."""
        if tags_col not in events.columns:
            events = with_tags(events)
        if isinstance(expr, str):
            expr = parse_tag_expr(expr)
        return cls(events.filter(expr.to_column(tags_col)))

    def between(
        self,
        start: dt.datetime | str | None = None,
        end: dt.datetime | str | None = None,
        ts_col: str = "ts",
    ) -> "EventQuery":
        """FROM time bounds: ``start <= ts < end`` (half-open, the
        window convention)."""
        df = self._df
        if start is not None:
            df = df.filter(F.col(ts_col) >= F.lit(start))
        if end is not None:
            df = df.filter(F.col(ts_col) < F.lit(end))
        return EventQuery(df)

    # ---------------------------------------------------------- FILTER
    def filter(self, predicate: Column | str) -> "EventQuery":
        return EventQuery(self._df.filter(predicate))

    # ---------------------------------------------------------- SELECT
    def select(self, *cols: Column | str) -> "EventQuery":
        return EventQuery(self._df.select(*cols))

    # ------------------------------------------------------- AGGREGATE
    def aggregate(
        self, *aggs: Column, by: Sequence[Column | str] = ()
    ) -> "EventQuery":
        """AQL AGGREGATE folds the whole stream; ``by`` extends it to
        grouped aggregation (the relational generalization)."""
        if by:
            return EventQuery(self._df.groupBy(*by).agg(*aggs))
        return EventQuery(self._df.agg(*aggs))

    # ------------------------------------------------- time grouping
    def window(
        self,
        duration: str,
        *aggs: Column,
        slide: str | None = None,
        by: Sequence[Column | str] = (),
        ts_col: str = "ts",
    ) -> "EventQuery":
        """Tumbling (or, with ``slide``, sliding) event-time windows —
        the time-bucketed AGGREGATE every event pipeline runs.  The
        window struct is flattened to ``w_start``/``w_end`` so the
        result stays scalar-typed (§7.5.5 discipline).  Identical call
        works on a streaming source (plus a watermark)."""
        win = (
            F.window(ts_col, duration, slide)
            if slide
            else F.window(ts_col, duration)
        )
        out = (
            self._df.groupBy(win.alias("_w"), *by)
            .agg(*aggs)
            .withColumn("w_start", F.col("_w.start"))
            .withColumn("w_end", F.col("_w.end"))
            .drop("_w")
        )
        return EventQuery(out)

    def sessionize(
        self,
        gap: str,
        *aggs: Column,
        by: Sequence[Column | str] = ("user_id",),
        ts_col: str = "ts",
    ) -> "EventQuery":
        """Gap-based sessions (native ``session_window``) with per-
        session aggregates — the stateful twin lives in
        streaming/pipelines.py with the same grouping."""
        out = (
            self._df.groupBy(
                *by, F.session_window(ts_col, gap).alias("_w")
            )
            .agg(*aggs)
            .withColumn("s_start", F.col("_w.start"))
            .withColumn("s_end", F.col("_w.end"))
            .drop("_w")
        )
        return EventQuery(out)

    # ----------------------------------------------------------- LIMIT
    def limit(
        self, n: int, order_by: Sequence[Column | str] = ()
    ) -> "EventQuery":
        """LIMIT with an explicit total order (deterministic top-n —
        SURVEY.md §7.5.2; compiles to TakeOrderedAndProject, no global
        sort)."""
        df = self._df
        if order_by:
            df = df.orderBy(*order_by)
        return EventQuery(df.limit(n))

    # ------------------------------------------------------------ sinks
    def df(self) -> DataFrame:
        """The composed plan, lazy."""
        return self._df

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)
