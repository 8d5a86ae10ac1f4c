"""Physical-plan audit helpers — the "is this the plan I'd want at
100 TB" check, executable (SURVEY.md §4).

Correct results with a wrong plan (full scan instead of pushdown,
sort-merge where a broadcast fits, accidental cartesian) pass value
checks at sf0.01 and fall over at scale.  These helpers let tests pin
the plan shape itself, so a regression that silently de-optimizes a
query fails CI, not the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-planning, pre-execution AQE)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_counts(df: DataFrame) -> dict[str, int]:
    plan = executed_plan(df)
    counts = {
        marker: plan.count(marker)
        for marker in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
            "Exchange",
            "HashAggregate",
            "FileScan parquet",
        )
    }
    # toString renders codegen stages as a "*(n) " operator prefix
    counts["WholeStageCodegen"] = plan.count("*(")
    return counts


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a filter reached the Parquet scan (``PushedFilters``)."""
    plan = executed_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed to scan; pushed lines: {pushed}"
    )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    n = plan_counts(df)["BroadcastHashJoin"]
    assert n >= at_least, f"expected >= {at_least} BroadcastHashJoin, got {n}"


def assert_no_cartesian(df: DataFrame) -> None:
    counts = plan_counts(df)
    bad = counts["CartesianProduct"]
    assert bad == 0, f"plan contains a CartesianProduct:\n{executed_plan(df)}"
