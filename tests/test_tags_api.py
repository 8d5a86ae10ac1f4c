"""Tag-expression algebra + fluent EventQuery API tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from events_to_db_spark.api import EventQuery
from events_to_db_spark.functions.tags import (
    AllEvents,
    Tag,
    filter_by_tags,
    parse_tag_expr,
    with_tags,
)
from events_to_db_spark.session import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tagged(spark):
    return with_tags(load_table(spark, SF_SMOKE, "events"))


def test_tag_atom_matches_type(spark, tagged):
    n_direct = tagged.filter(F.col("event_type") == "purchase").count()
    n_tag = filter_by_tags(tagged, Tag("type:purchase")).count()
    assert n_direct == n_tag > 0


def test_tag_conjunction_and_negation(spark, tagged):
    conv_not_signup = filter_by_tags(
        tagged, Tag("cat:conversion") & ~Tag("type:signup")
    ).count()
    purchases = filter_by_tags(tagged, Tag("type:purchase")).count()
    assert conv_not_signup == purchases  # conversion = purchase ∪ signup


def test_tag_disjunction_counts_union(spark, tagged):
    a = filter_by_tags(tagged, Tag("type:error")).count()
    b = filter_by_tags(tagged, Tag("type:view")).count()
    both = filter_by_tags(tagged, Tag("type:error") | Tag("type:view")).count()
    assert both == a + b  # types are disjoint


def test_parse_text_form_precedence(spark, tagged):
    # & binds tighter than |
    parsed = parse_tag_expr("'type:error' | 'type:purchase' & 'cat:conversion'")
    n = filter_by_tags(tagged, parsed).count()
    want = filter_by_tags(
        tagged, Tag("type:error") | (Tag("type:purchase") & Tag("cat:conversion"))
    ).count()
    assert n == want


def test_parse_parens_and_not(spark, tagged):
    n = filter_by_tags(
        tagged, parse_tag_expr("!('type:error' | 'type:view')")
    ).count()
    total = tagged.count()
    e = filter_by_tags(tagged, Tag("type:error")).count()
    v = filter_by_tags(tagged, Tag("type:view")).count()
    assert n == total - e - v


def test_parse_all_events(spark, tagged):
    assert filter_by_tags(tagged, "allEvents").count() == tagged.count()
    assert isinstance(parse_tag_expr("allEvents"), AllEvents)


def test_parse_rejects_garbage():
    for bad in ("'a' &", "('a'", "'a' 'b'", "& 'a'"):
        with pytest.raises(ValueError):
            parse_tag_expr(bad)


def test_event_query_pipeline_end_to_end(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    out = (
        EventQuery.from_tags(ev, "'cat:conversion'")
        .between("2024-01-05", "2024-01-20")
        .filter(F.col("value") > 50)
        .select("user_id", "value")
        .aggregate(
            F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"),
            by=["user_id"],
        )
        .limit(5, order_by=[F.col("total").desc(), "user_id"])
        .df()
        .collect()
    )
    assert 0 < len(out) <= 5
    totals = [r["total"] for r in out]
    assert totals == sorted(totals, reverse=True)

    # cross-check against the equivalent raw DataFrame plan
    want = (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .filter((F.col("ts") >= F.lit("2024-01-05")) & (F.col("ts") < F.lit("2024-01-20")))
        .filter(F.col("value") > 50)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy(F.col("total").desc(), "user_id")
        .limit(5)
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in want]


def test_event_query_global_aggregate(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    row = (
        EventQuery.from_events(ev)
        .aggregate(F.count("*").alias("n"))
        .df()
        .collect()[0]
    )
    assert row["n"] == ev.count()


def test_event_query_window_matches_raw_plan(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    out = (
        EventQuery.from_events(ev)
        .window("1 day", F.count("*").alias("n"), by=["event_type"])
        .df()
    )
    assert {"w_start", "w_end", "event_type", "n"} <= set(out.columns)
    want = (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"))
        .count()
    )
    assert out.count() == want


def test_event_query_sessionize_matches_contract_query(spark):
    import __spark_entry__ as e

    ev = load_table(spark, SF_SMOKE, "events")
    api_sessions = (
        EventQuery.from_events(ev)
        .sessionize("30 minutes", F.count("*").alias("n_events"))
        .df()
    )
    contract = e.queries()["q_ev_session"](spark, SF_SMOKE)
    assert api_sessions.count() == contract.count()
    # per-user session counts agree
    a = {
        r["user_id"]: r["cnt"]
        for r in api_sessions.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    b = {
        r["user_id"]: r["cnt"]
        for r in contract.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert a == b
