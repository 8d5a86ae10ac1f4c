"""Rollup cascade — hierarchical time-grain maintenance (hypertable
continuous-aggregate pattern).

The reference-class problem: dashboards read day/hour grains, events
arrive at seconds.  Re-aggregating raw events for every grain is
O(raw) per grain; the cascade aggregates raw → minute ONCE, then each
coarser grain reduces the next-finer grain — O(minutes) for hours,
O(hours) for days.  At 100 TB the raw→minute step is the only one
that ever touches the fact table, and it is exactly the incremental
aggregate the additive sink (`incremental_agg_to_db`) maintains
per-batch, so the cascade runs off the sink table without re-reading
raw history.

Correctness requirement for cascading: every measure must be
*re-aggregable* — sums/counts/min/max re-aggregate with themselves;
avg must be carried as (sum, count) and derived at read time.  The
cascade therefore refuses non-decomposable aggregates by
construction: its state schema is fixed to the decomposable four.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: grain → truncation unit understood by date_trunc
_GRAINS = ("minute", "hour", "day")


def base_rollup(events: DataFrame, grain: str = "minute") -> DataFrame:
    """Raw events → the finest-grain rollup state (the only step that
    reads the fact).  Measures are the decomposable four + exact cent
    volume; ``avg`` intentionally absent — derive it as sum/count."""
    assert grain in _GRAINS
    return (
        events.groupBy(
            F.date_trunc(grain, F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_c"),
            F.min(F.round(F.col("value") * 100).cast("bigint")).alias("min_c"),
            F.max(F.round(F.col("value") * 100).cast("bigint")).alias("max_c"),
        )
    )


def coarsen(finer: DataFrame, grain: str) -> DataFrame:
    """Next-finer rollup state → coarser grain.  Touches only the
    finer *aggregate* (never raw events): counts and sums re-sum,
    min/max re-min/max — the re-aggregation laws the fixed schema
    guarantees."""
    assert grain in _GRAINS
    return (
        finer.groupBy(
            F.date_trunc(grain, F.col("bucket")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_c").alias("sum_c"),
            F.min("min_c").alias("min_c"),
            F.max("max_c").alias("max_c"),
        )
    )


def cascade(events: DataFrame) -> dict[str, DataFrame]:
    """The full minute → hour → day cascade as lazy frames; each level
    is built from the previous, so materializing all three costs one
    fact scan plus two small re-aggregations."""
    minute = base_rollup(events, "minute")
    hour = coarsen(minute, "hour")
    day = coarsen(hour, "day")
    return {"minute": minute, "hour": hour, "day": day}
