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
        ([{"id": "a'); drop", "type": "not_null", "col": "x"}], "must match"),
    ]:
        with pytest.raises(ValueError, match=msg):
            validate_rules(bad)


STREAM_RULES = [
    {"id": "uid_not_null", "type": "not_null", "col": "user_id"},
    {"id": "value_range", "type": "range", "col": "value", "lo": 0, "hi": 90},
    {
        "id": "type_known",
        "type": "in_set",
        "col": "event_type",
        "values": ["view", "click", "purchase", "signup"],
    },
    {"id": "value_nonneg", "type": "custom", "expr": "value >= 0"},
]


def test_streaming_monitor_matches_batch_and_is_idempotent(
    spark, chunked_events, tmp_path
):
    from events_to_db_spark.expectations import (
        expectations_foreach_batch,
        run_expectations,
    )
    from events_to_db_spark.session import load_table
    from events_to_db_spark.streaming.sink import read_sink_table
    from events_to_db_spark.streaming.sources import events_file_stream
    from tests.conftest import SF_SMOKE

    feed, ev, n = chunked_events
    db = str(tmp_path / "dq.db")

    def run():
        q = (
            events_file_stream(spark, feed)
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(expectations_foreach_batch(db, "dq", STREAM_RULES))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got = read_sink_table(db, "dq").set_index("rule_id")
    want = {
        r["rule_id"]: (r["n_rows"], r["violations"])
        for r in run_expectations(
            load_table(spark, SF_SMOKE, "events"), STREAM_RULES
        ).collect()
    }
    assert len(got) == len(STREAM_RULES)
    for rid, (n_rows, viol) in want.items():
        assert (got.loc[rid, "n_rows"], got.loc[rid, "violations"]) == (
            n_rows,
            viol,
        ), rid
    assert want["value_range"][1] > 0, "suite must see real violations"

    # nothing new + same checkpoint -> totals unchanged (no double count)
    run()
    again = read_sink_table(db, "dq").set_index("rule_id")
    assert again.equals(got)


def test_streaming_monitor_rejects_unique(spark, tmp_path):
    from events_to_db_spark.expectations import expectations_foreach_batch

    with pytest.raises(ValueError, match="not additive"):
        expectations_foreach_batch(
            str(tmp_path / "x.db"),
            "dq",
            [{"id": "u", "type": "unique", "col": "event_id"}],
        )


def test_quarantine_routes_violations_exactly_once(
    spark, chunked_events, tmp_path
):
    """VERDICT r06 #5: quarantine=True routes each violating row to
    <table>__quarantine (batch_id, violated rule ids, row JSON) in the
    SAME transaction as the counter merge — inspectable, counted once,
    and replay-proof (a re-run with the same checkpoint adds nothing)."""
    import json

    from events_to_db_spark.expectations import (
        expectations_foreach_batch,
        run_expectations,
    )
    from events_to_db_spark.session import load_table
    from events_to_db_spark.streaming.sink import read_sink_table
    from events_to_db_spark.streaming.sources import events_file_stream
    from tests.conftest import SF_SMOKE

    feed, ev, n = chunked_events
    db = str(tmp_path / "dq.db")

    def run():
        q = (
            events_file_stream(spark, feed)
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(
                expectations_foreach_batch(
                    db, "dq", STREAM_RULES, quarantine=True
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    counters = read_sink_table(db, "dq").set_index("rule_id")
    quar = read_sink_table(db, "dq__quarantine")

    # every quarantined row names at least one rule; the per-rule tally
    # over the quarantine equals the violation counters exactly
    batch = load_table(spark, SF_SMOKE, "events")
    want = {
        r["rule_id"]: r["violations"]
        for r in run_expectations(batch, STREAM_RULES).collect()
    }
    assert want["value_range"] > 0, "suite must see real violations"
    tally: dict[str, int] = {}
    for v in quar["violated"]:
        assert v
        for rid in v.split(","):
            tally[rid] = tally.get(rid, 0) + 1
    assert tally == {k: v for k, v in want.items() if v > 0}
    for rid, viol in want.items():
        assert counters.loc[rid, "violations"] == viol

    # quarantined payloads are real rows: every row_json parses and its
    # event_id exists in the source
    ids = {
        json.loads(r)["event_id"] for r in quar["row_json"]
    }
    src_ids = {r["event_id"] for r in batch.select("event_id").collect()}
    assert ids <= src_ids and len(ids) > 0

    # same checkpoint, nothing new: counters AND quarantine unchanged
    run()
    assert read_sink_table(db, "dq").set_index("rule_id").equals(counters)
    assert len(read_sink_table(db, "dq__quarantine")) == len(quar)
