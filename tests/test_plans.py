"""Plan-shape regression tests (SURVEY.md §4): pin that the optimizer
actually produces the scale-safe plan, not just correct values."""

from __future__ import annotations

import __spark_entry__ as e
from events_to_db_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    plan_counts,
)
from tests.conftest import SF_SMOKE


def _q(spark, name):
    return e.queries()[name](spark, SF_SMOKE)


def test_scan_pushdown_reaches_parquet(spark):
    df = _q(spark, "q_scan_pushdown")
    assert_pushed_filters(df, "l_quantity")
    assert_pushed_filters(df, "l_shipdate")


def test_scan_prunes_columns(spark):
    plan = _q(spark, "q_scan_pushdown")._jdf.queryExecution().executedPlan().toString()
    scan_line = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    # projection needs 2 columns (+2 filter columns); the 16-col table
    # must not be read whole
    assert "l_comment" not in scan_line
    assert "l_returnflag" not in scan_line


def test_small_dims_broadcast(spark):
    assert_broadcast_join(_q(spark, "q_join_broadcast"))
    assert_broadcast_join(_q(spark, "q_join_multiway"), at_least=3)


def test_multiway_join_filter_pushed_to_region(spark):
    assert_pushed_filters(_q(spark, "q_join_multiway"), "r_name")


def test_no_accidental_cartesian_in_equi_joins(spark):
    for name in ("q_join_inner", "q_join_multiway", "q_join_left", "q_join_semi"):
        assert_no_cartesian(_q(spark, name))


def test_agg_uses_partial_aggregation(spark):
    # two HashAggregate nodes = map-side partial + final, so the
    # shuffle moves per-group partials, not raw rows
    df = _q(spark, "q_agg_q1")
    counts = plan_counts(df)
    assert counts["HashAggregate"] >= 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan


def test_topk_uses_take_ordered(spark):
    plan = _q(spark, "q_limit")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no full global sort for LIMIT
