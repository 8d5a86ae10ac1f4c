"""Scale-utility tests: bucketed co-located joins (no Exchange) and
deterministic skew salting (same result, split hot keys)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from events_to_db_spark.functions.skew import salted_join
from events_to_db_spark.plans.audit import executed_plan
from events_to_db_spark.session import load_table
from events_to_db_spark.sources.bucketing import read_table, write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle joins so Exchange placement is observable."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_skips_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    write_bucketed(orders, "b_orders", ["o_custkey"], 8)
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        ["o_custkey"],
        8,
    )

    joined = read_table(spark, "b_orders").join(
        read_table(spark, "b_customer"), "o_custkey"
    )
    plan = executed_plan(joined)
    assert "Exchange" not in plan, plan  # bucket-aligned: no shuffle at all
    # same join on plain parquet shuffles both sides
    plain = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    assert "Exchange" in executed_plan(plain)
    # and the bucketed join returns identical results
    assert joined.count() == plain.count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    # skewed small dim: one row per event_type
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    plain = ev.join(dim, "event_type").select("event_id", "type_avg")
    salted = salted_join(
        ev, dim, ["event_type"], salt_from="event_id", k=8
    ).select("event_id", "type_avg")
    a = Counter((r["event_id"], round(r["type_avg"], 6)) for r in plain.collect())
    b = Counter((r["event_id"], round(r["type_avg"], 6)) for r in salted.collect())
    assert a == b


def test_salt_actually_splits_hot_keys(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    from events_to_db_spark.functions.skew import SALT_COL, salt_left

    salted = salt_left(ev, "event_id", 8)
    dist = (
        salted.groupBy("event_type", SALT_COL)
        .count()
        .groupBy("event_type")
        .agg(F.countDistinct(SALT_COL).alias("n_salts"))
        .collect()
    )
    # every (hot) key spreads over all 8 sub-keys
    assert all(r["n_salts"] == 8 for r in dist)


def test_aqe_splits_skewed_sort_merge_join(spark, no_broadcast):
    """AQE's runtime skew-join split — the other half of the skew
    story (salting is the hash-join fallback; AQE handles sort-merge
    automatically).  Thresholds lowered so a 400 k-row hot key
    triggers the split locally; asserts the executed final plan
    carries SortMergeJoin(skew=true)."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(400000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        j.collect()  # execute THIS plan object so AQE finalizes it
        plan = executed_plan(j)
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k int, lv string"
    )
    right = spark.createDataFrame([(1, "a")], "k int, rv string")
    out = salted_join(left, right, ["k"], salt_from="lv", k=4, how="left")
    rows = {r["k"]: r["rv"] for r in out.collect()}
    assert rows == {1: "a", 2: None, 3: None}


def test_salted_join_rejects_right_outer(spark):
    """Right/full-outer salted joins would emit each unmatched
    small-side row k times (the small side is replicated); the helper
    must refuse rather than silently duplicate."""
    import pytest

    from events_to_db_spark.functions.skew import salted_join

    big = spark.range(10).selectExpr("id AS k", "id AS payload")
    small = spark.range(3).selectExpr("id AS k")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="equivalence-preserving"):
            salted_join(big, small, ["k"], "payload", k=4, how=how)
