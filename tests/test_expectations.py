"""Declarative expectations engine (expectations.py): rule compilation,
violation semantics (incl. NULL handling), one-scan plan shape, and
loud compile-time validation."""

from __future__ import annotations

import pytest

from events_to_db_spark.expectations import run_expectations, validate_rules


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, 10.0, "a"),
        (2, None, "b"),
        (2, 500.0, "zzz"),
        (3, -5.0, None),
    ]
    return spark.createDataFrame(rows, "k int, v double, cat string")


RULES = [
    {"id": "k_unique", "type": "unique", "col": "k"},
    {"id": "v_not_null", "type": "not_null", "col": "v"},
    {"id": "v_range", "type": "range", "col": "v", "lo": 0, "hi": 100},
    {"id": "cat_set", "type": "in_set", "col": "cat", "values": ["a", "b"]},
    {"id": "v_pos", "type": "custom", "expr": "v > 0"},
]


def test_violation_semantics(spark, frame):
    got = {r["rule_id"]: (r["violations"], r["ok"]) for r in run_expectations(frame, RULES).collect()}
    assert got == {
        "k_unique": (1, False),  # k=2 twice
        "v_not_null": (1, False),
        "v_range": (2, False),  # 500 above hi, -5 below lo; NULL not counted
        "cat_set": (2, False),  # 'zzz' and NULL both violate membership
        "v_pos": (2, False),  # -5 fails, NULL must fail (3-valued logic)
    }
    n_rows = {r["rule_id"]: r["n_rows"] for r in run_expectations(frame, RULES).collect()}
    assert set(n_rows.values()) == {4}


def test_single_scan_plan(spark, frame):
    """The whole suite must compile to one aggregate over one scan —
    no per-rule re-reads (the cost model the module promises)."""
    plan = run_expectations(frame, RULES)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_half_open_range_and_all_pass(spark, frame):
    ok = run_expectations(
        frame, [{"id": "lo_only", "type": "range", "col": "k", "lo": 0}]
    ).collect()
    assert ok[0]["violations"] == 0 and ok[0]["ok"]


def test_validation_is_loud(spark):
    for bad, msg in [
        ([], "empty"),
        ([{"type": "not_null", "col": "x"}], "without 'id'"),
        ([{"id": "a", "type": "nope", "col": "x"}], "unknown type"),
        (
            [{"id": "a", "type": "not_null", "col": "x"},
             {"id": "a", "type": "not_null", "col": "x"}],
            "duplicate",
        ),
        ([{"id": "a", "type": "not_null"}], "needs 'col'"),
        ([{"id": "a", "type": "range", "col": "x"}], "'lo' and/or 'hi'"),
        ([{"id": "a", "type": "in_set", "col": "x", "values": []}], "needs 'values'"),
        ([{"id": "a", "type": "custom"}], "needs 'expr'"),
    ]:
        with pytest.raises(ValueError, match=msg):
            validate_rules(bad)
