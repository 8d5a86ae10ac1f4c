"""Tag-algebra TIME-bound extension tests (the core tag algebra is
covered in tests/test_tags_api.py; the AQL front-end in
tests/test_aql.py)."""

from __future__ import annotations

from pyspark.sql import functions as F




def test_time_bound_atoms_compile_to_ts_range(spark):
    """TIME atoms in the FROM expression equal the hand-written ts
    range filter, compose with tag containment under &, and negate."""
    from events_to_db_spark.functions.tags import parse_tag_expr, with_tags
    from events_to_db_spark.session import load_table
    from tests.conftest import SF_SMOKE

    ev = with_tags(load_table(spark, SF_SMOKE, "events"))
    expr = parse_tag_expr(
        "'type:purchase' & TIME >= 2024-01-05 & TIME < 2024-01-20"
    )
    got = ev.filter(expr.to_column("tags"))
    want = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    # ISO instant with T/Z, and negation
    neg = parse_tag_expr("allEvents & ! (TIME >= 2024-01-15T00:00:00Z)")
    n_before = ev.filter(
        F.col("ts") < F.lit("2024-01-15").cast("timestamp")
    ).count()
    assert ev.filter(neg.to_column("tags")).count() == n_before


def test_time_bound_is_pushed_to_scan(spark):
    """The compiled TIME predicate must reach the parquet scan as a
    pushed filter (min/max row-group pruning at scale), not remain a
    post-scan Filter only."""
    from events_to_db_spark.functions.tags import parse_tag_expr
    from events_to_db_spark.session import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    # On the raw table (no derived tags column) the ts bound is the
    # only predicate — it must appear in PushedFilters.
    expr = parse_tag_expr("allEvents & TIME >= 2024-01-10")
    plan = (
        ev.filter(expr.to_column("tags"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "ts" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]


def test_appid_islocal_atoms_parse_and_compile(spark):
    """appId(..) / isLocal FROM atoms (VERDICT r03 #3): parse in both
    the tag grammar and the AQL front-end, compile to the synthesized
    app_id / is_local columns, and partition the stream exactly."""
    from events_to_db_spark.functions.tags import (
        AppId,
        IsLocal,
        parse_tag_expr,
        with_tags,
    )
    from events_to_db_spark.session import load_table
    from tests.conftest import SF_SMOKE

    # Parser produces the atom objects (dotted/dashed ids accepted).
    e = parse_tag_expr("appId(com.example.machine-1) & isLocal")
    assert e.left == AppId("com.example.machine-1")
    assert e.right == IsLocal()

    ev = with_tags(load_table(spark, SF_SMOKE, "events"))
    n = ev.count()
    # The three synthesized apps partition the stream; isLocal halves it.
    by_app = sum(
        ev.filter(parse_tag_expr(f"appId(app-{i})").to_column("tags")).count()
        for i in range(3)
    )
    assert by_app == n
    loc = ev.filter(parse_tag_expr("isLocal").to_column("tags")).count()
    rem = ev.filter(parse_tag_expr("!isLocal").to_column("tags")).count()
    assert loc + rem == n and loc > 0 and rem > 0
    # Conjunction with tags behaves as intersection.
    both = ev.filter(
        parse_tag_expr("appId(app-0) & 'type:purchase'").to_column("tags")
    ).count()
    manual = ev.filter(
        (F.col("app_id") == "app-0") & (F.col("event_type") == "purchase")
    ).count()
    assert both == manual


def test_appid_atom_through_aql_front_end(spark):
    """The AQL tokenizer must keep appId(ident) verbatim (its value
    chars are not expression tokens) and the FROM compile must match
    the DataFrame-side predicate."""
    from events_to_db_spark.functions.aql import run_aql
    from events_to_db_spark.functions.tags import with_tags
    from events_to_db_spark.session import load_table
    from tests.conftest import SF_SMOKE

    ev = with_tags(load_table(spark, SF_SMOKE, "events"))
    out = run_aql(ev, "FROM appId(app-2) & isLocal AGGREGATE { n: COUNT() }")
    want = ev.filter((F.col("app_id") == "app-2") & F.col("is_local")).count()
    assert out.collect()[0]["n"] == want > 0


def test_appid_parse_errors():
    import pytest

    from events_to_db_spark.functions.tags import parse_tag_expr

    with pytest.raises(ValueError):
        parse_tag_expr("appId()")
    with pytest.raises(ValueError):
        parse_tag_expr("appId(")


def test_time_instant_normalization_and_rejection(spark):
    """ADVICE r07: spaces adjacent to '-'/':' are token-reassembly
    artifacts and normalize away; one interior space is the date-time
    separator (supported end-to-end); anything else is a LOUD parse
    error, not a silent to_timestamp NULL."""
    import pytest
    from pyspark.sql import functions as F

    from events_to_db_spark.functions.tags import (
        TimeBound,
        filter_by_tags,
        parse_tag_expr,
        with_tags,
    )
    from events_to_db_spark.session import load_table
    from tests.conftest import SF_SMOKE

    assert TimeBound(">=", "2024 - 01 - 10").instant == "2024-01-10"
    assert (
        TimeBound("<", "2024-01-10T12:30:00Z").instant
        == "2024-01-10 12:30:00"
    )
    assert (
        TimeBound("<", "2024-01-10 12:30:00").instant
        == "2024-01-10 12:30:00"
    )
    with pytest.raises(ValueError, match="bad TIME instant"):
        TimeBound(">=", "2024-01-10 12")  # dangling hour, no minutes
    with pytest.raises(ValueError, match="bad TIME instant"):
        TimeBound(">=", "2024-01-10 12:00 00")  # interior space

    ev = with_tags(load_table(spark, SF_SMOKE, "events"))
    got = filter_by_tags(ev, "TIME >= 2024-01-10 12:30:00").count()
    want = ev.filter(F.col("ts") >= "2024-01-10 12:30:00").count()
    assert got == want > 0
    # and through the parser with a following term
    e = parse_tag_expr("TIME >= 2024-01-10 12:30:00 & 'type:view'")
    n = ev.filter(e.to_column("tags")).count()
    assert (
        n
        == ev.filter(
            (F.col("ts") >= "2024-01-10 12:30:00")
            & (F.col("event_type") == "view")
        ).count()
        > 0
    )
