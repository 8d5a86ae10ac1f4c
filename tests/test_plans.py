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


def test_scd2_single_user_shuffle(spark):
    """Both SCD2 window passes and the run-collapse must share one
    user_id exchange — a second shuffle would double the largest cost
    at scale."""
    counts = plan_counts(_q(spark, "q_ev_scd2"))
    assert counts.get("Exchange", 0) <= 1


def test_ohlc_windows_share_one_shuffle(spark):
    """The asc and desc row_number passes run over the same (type, day)
    partitioning; Catalyst must not re-exchange between them."""
    counts = plan_counts(_q(spark, "q_ev_ohlc"))
    assert counts.get("Exchange", 0) <= 2  # partition-key exchange + final agg

def test_gapfill_broadcasts_spine_and_dims(spark):
    """The generated date spine × type grid must build via broadcast
    (a BroadcastNestedLoopJoin cross of two tiny inputs — NOT a
    CartesianProduct shuffle), and the grid→daily left join must be a
    BroadcastHashJoin, keeping the event-side shuffle the only big
    exchange at scale."""
    df = _q(spark, "q_ev_gapfill")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan and "CartesianProduct" not in plan
    assert_broadcast_join(df, at_least=1)


def test_nullsafe_join_is_hash_not_loop(spark):
    """<=> keeps equi-join planning: no BroadcastNestedLoopJoin /
    CartesianProduct may appear."""
    assert_no_cartesian(_q(spark, "q_join_nullsafe"))


def test_editdist_blocked_join_no_cartesian(spark):
    """The brand-blocked fuzzy join must plan as an equi-join on the
    block key with the levenshtein predicate residual."""
    assert_no_cartesian(_q(spark, "q_dedup_editdist"))


def test_decimal_agg_two_phase(spark):
    """Exact decimal sums still partial-aggregate (map-side combine)."""
    plan = _q(spark, "q_fn_decimal")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2


def test_partitioned_scan_prunes_at_planning_time(spark):
    plan = (
        _q(spark, "q_scan_partitioned")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_line = next(
        ln for ln in plan.splitlines() if "FileScan parquet" in ln
    )
    # the partition-key predicate must be a PartitionFilter (directory
    # pruning), leaving no row-level DataFilters at all
    assert "PartitionFilters: [isnotnull(event_type" in scan_line
    assert "DataFilters: []" in scan_line


def test_exceptall_is_aggregate_not_join_explosion(spark):
    # Spark lowers EXCEPT ALL to a union + count-diff aggregate +
    # generate; a SortMergeJoin/CartesianProduct here would be the wrong
    # (quadratic-ish) plan
    assert_no_cartesian(_q(spark, "q_except_all"))
    assert_no_cartesian(_q(spark, "q_intersect_all"))


def test_stats_tests_avoid_global_windows(spark):
    # KS / MWU rank scans must go through the bucketed two-level prefix
    # scan: every WindowExec must carry a partition key
    for name in ("q_stat_ks", "q_stat_mannwhitney"):
        plan = (
            _q(spark, name)._jdf.queryExecution().executedPlan().toString()
        )
        for ln in plan.splitlines():
            if "Window " in ln or "RunningWindowFunction" in ln:
                assert "partitionBy=[]" not in ln.replace(" ", "")


def test_bucketed_contract_join_no_shuffle_exchange(spark):
    # with broadcast disabled, the bucketed layout must carry the join
    # with zero shuffle Exchange on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            _q(spark, "q_join_bucketed")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        join_section = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning" not in join_section, join_section
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_runtime_bloom_filter_engages_on_selective_dim_join(spark):
    """Runtime-filter posture for the 100 TB shuffle join: when a
    selective dim side can't broadcast, Spark injects a bloom filter
    from the dim build into the fact scan (`might_contain`), pruning
    probe rows before the exchange.  The trigger thresholds are sized
    for real clusters (10 GB application-side scan), so this test
    lowers them to prove the mechanism — and that results are
    unchanged — at fixture scale."""
    from events_to_db_spark.session import load_table
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        filtered = j.collect()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    baseline = (
        load_table(spark, SF_SMOKE, "lineitem")
        .join(
            load_table(spark, SF_SMOKE, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, filtered)) == sorted(map(tuple, baseline))


def test_q21_decorrelation_reuses_orderkey_partitioning(spark):
    """The per-order roll-up and the qualifying join must reuse the
    per-(order,supplier) aggregate's l_orderkey exchange — re-shuffling
    the fact between the two grouping levels would double the dominant
    cost.  Expected exchanges: one fact shuffle on l_orderkey, one
    small per-supplier shuffle (plus broadcast for supplier names)."""
    plan = (
        _q(spark, "q_tpch_q21")._jdf.queryExecution().executedPlan().toString()
    )
    counts = plan_counts(_q(spark, "q_tpch_q21"))
    # lineitem scanned once (decorrelated; the EXISTS form would scan 3x)
    scan_lines = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "lineitem" in ln
    ]
    assert len(scan_lines) == 1
    assert counts.get("CartesianProduct", 0) == 0


def test_notin_plans_null_aware_anti_join(spark):
    """Single-column NOT IN must compile to Spark's null-aware anti
    join (broadcast hash), not a nested-loop fallback or a plain anti
    join that would get the NULL semantics wrong."""
    plan = (
        _q(spark, "q_subquery_notin")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Spark renders the single-key NOT IN rewrite as a broadcast hash
    # LeftAnti with the isNullAwareAntiJoin flag (trailing "true")
    assert "LeftAnti, BuildRight, true" in plan


def test_hhi_broadcasts_all_dims(spark):
    """q_agg_hhi: the three dimension joins (supplier/nation/region)
    must broadcast — no SortMergeJoin anywhere; the only Exchanges are
    the two aggregation shuffles."""
    counts = plan_counts(_q(spark, "q_agg_hhi"))
    assert counts["BroadcastHashJoin"] >= 3
    assert counts["SortMergeJoin"] == 0


def test_linreg_is_single_moment_aggregate(spark):
    """q_ml_linreg: one two-phase hash aggregate over lineitem — the
    closed-form solve adds no extra shuffle (everything after the
    3-row moment table is projection)."""
    counts = plan_counts(_q(spark, "q_ml_linreg"))
    assert counts["Exchange"] == 1, counts
    assert counts["SortMergeJoin"] == 0
    scan = next(
        ln
        for ln in _q(spark, "q_ml_linreg")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .splitlines()
        if "FileScan parquet" in ln
    )
    # 4-column projection out of the 16-column table
    assert "l_comment" not in scan and "l_shipdate" not in scan


def test_kmeans_assign_broadcasts_centroid_cells(spark):
    """The E-step must broadcast the k·dim centroid cells onto the
    exploded vectors — a shuffled join here would move every vector
    cell twice."""
    df = _q(spark, "q_ml_kmeans_assign")
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_pca_power_iterations_broadcast_v(spark):
    """Each mat-vec must broadcast the 64-row v, never shuffle the
    cells against it; no iteration may degenerate to a cartesian."""
    df = _q(spark, "q_ml_pca_power")
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_stump_and_roc_use_two_level_scan(spark):
    """The threshold scans must run on the bucketed two-level prefix
    sum — an unpartitioned global window here is the scale bug the
    allowlist test guards against repo-wide."""
    for name in ("q_ml_stump", "q_ml_roc", "q_ev_changepoint"):
        plan = (
            _q(spark, name)._jdf.queryExecution().executedPlan().toString()
        )
        # the two-level scan's within-bucket window partitions by _pb
        assert "_pb" in plan, name


def test_bloom_prune_joins_on_bits_not_rows(spark):
    df = _q(spark, "q_join_bloom_prune")
    assert_no_cartesian(df)


def test_matryoshka_blocked_path_no_cartesian(spark, monkeypatch):
    """Above the broadcast gate the exploded-cells fallback engages;
    its d-keyed self-join must stay an equi-join."""
    monkeypatch.setenv("SPARK_GRAFT_SIM_BROADCAST_MAX", "1")
    df = _q(spark, "q_embed_matryoshka")
    assert_no_cartesian(df)
