"""Property-based tests (hypothesis) — algebraic invariants that must
hold for ANY data, not just the fixtures (SURVEY.md §5.3.2).

Each example round-trips a small generated dataset through Spark;
``max_examples`` is kept low because a Spark job per example is ~100 ms
— the generator's value is edge-case search (empty inputs, all-ties,
single rows, boundary gaps), not volume.
"""

from __future__ import annotations

import datetime as dt
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),        # key
        st.integers(min_value=-100, max_value=100),   # value
    ),
    max_size=30,
)


@given(rows=rows_strategy)
@SETTINGS
def test_filter_commutes_with_projection(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int") if rows else (
        spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("v"))
    )
    pred = F.col("k") % 2 == 0
    a = Counter(r["v"] for r in df.filter(pred).select("v", "k").collect())
    b = Counter(r["v"] for r in df.select("k", "v").filter(pred).collect())
    assert a == b


@given(rows_a=rows_strategy, rows_b=rows_strategy)
@SETTINGS
def test_union_all_count_additivity(spark, rows_a, rows_b):
    schema = "k int, v int"
    a = spark.createDataFrame(rows_a, schema) if rows_a else spark.createDataFrame([], schema)
    b = spark.createDataFrame(rows_b, schema) if rows_b else spark.createDataFrame([], schema)
    assert a.unionByName(b).count() == len(rows_a) + len(rows_b)
    # distinct union is bounded by both
    du = a.unionByName(b).distinct().count()
    assert du <= len(set(rows_a)) + len(set(rows_b))
    assert du >= max(len(set(rows_a)), len(set(rows_b)))


@given(rows_a=rows_strategy, rows_b=rows_strategy)
@SETTINGS
def test_join_cardinality_bounds(spark, rows_a, rows_b):
    schema = "k int, v int"
    a = spark.createDataFrame(rows_a, schema) if rows_a else spark.createDataFrame([], schema)
    b = spark.createDataFrame(rows_b, schema) if rows_b else spark.createDataFrame([], schema)
    inner = a.join(b, "k").count()
    # exact inner-join cardinality from key histograms
    ca = Counter(k for k, _ in rows_a)
    cb = Counter(k for k, _ in rows_b)
    assert inner == sum(ca[k] * cb[k] for k in ca)
    assert a.join(b, ["k"], "left").count() >= len(rows_a)
    assert a.join(b, ["k"], "left_semi").count() == sum(
        1 for k, _ in rows_a if cb[k] > 0
    )
    assert a.join(b, ["k"], "left_anti").count() == sum(
        1 for k, _ in rows_a if cb[k] == 0
    )


@given(
    gaps_min=st.lists(
        st.integers(min_value=0, max_value=90), min_size=1, max_size=25
    ),
)
@SETTINGS
def test_sessionization_partitions_events(spark, gaps_min):
    """Sessions partition the event sequence; consecutive events in one
    session differ by <= 30 min; the first event after a > 30-min gap
    opens a new session."""
    t = dt.datetime(2024, 1, 1)
    ts = []
    for g in gaps_min:
        t = t + dt.timedelta(minutes=g)
        ts.append(t)
    df = spark.createDataFrame([(x,) for x in ts], "ts timestamp")
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in sessions) == len(ts)
    # expected session count from the gap sequence (strict > 30 min splits)
    expected = 1 + sum(1 for g in gaps_min[1:] if g > 30)
    assert len(sessions) == expected


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_topk_is_prefix_of_total_order(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    k = 5
    got = [
        (r["id"], r["v"])
        for r in df.orderBy(F.col("v").desc(), "id").limit(k).collect()
    ]
    want = sorted(rows, key=lambda r: (-r[1], r[0]))[:k]
    assert got == want


# ---------------------------------------------------------------- tag algebra

tag_names = st.sampled_from(["a", "b", "c", "d"])


@st.composite
def tag_exprs(draw, depth=0):
    from events_to_db_spark.functions.tags import AllEvents, And, Not, Or, Tag

    if depth >= 3 or draw(st.booleans()):
        return draw(
            st.one_of(
                st.builds(Tag, tag_names), st.just(AllEvents())
            )
        )
    kind = draw(st.sampled_from(["and", "or", "not"]))
    if kind == "not":
        return Not(draw(tag_exprs(depth + 1)))
    left, right = draw(tag_exprs(depth + 1)), draw(tag_exprs(depth + 1))
    return And(left, right) if kind == "and" else Or(left, right)


def _eval_py(expr, tags: set) -> bool:
    from events_to_db_spark.functions.tags import AllEvents, And, Not, Or, Tag

    if isinstance(expr, Tag):
        return expr.name in tags
    if isinstance(expr, AllEvents):
        return True
    if isinstance(expr, And):
        return _eval_py(expr.left, tags) and _eval_py(expr.right, tags)
    if isinstance(expr, Or):
        return _eval_py(expr.left, tags) or _eval_py(expr.right, tags)
    if isinstance(expr, Not):
        return not _eval_py(expr.inner, tags)
    raise TypeError(expr)


@given(
    expr=tag_exprs(),
    tag_sets=st.lists(
        st.sets(tag_names, max_size=4), min_size=1, max_size=12
    ),
)
@SETTINGS
def test_tag_expr_compilation_matches_reference_semantics(spark, expr, tag_sets):
    """The compiled Catalyst predicate must agree with a direct Python
    evaluation of the tag algebra on every generated tag set."""
    rows = [(i, sorted(s)) for i, s in enumerate(tag_sets)]
    df = spark.createDataFrame(rows, "id int, tags array<string>")
    got = {r["id"] for r in df.filter(expr.to_column("tags")).collect()}
    want = {i for i, s in enumerate(tag_sets) if _eval_py(expr, set(s))}
    assert got == want


# ----------------------------------------------- cross-operator invariants

def test_cross_operator_invariants_smoke(spark):
    """Operators that summarize the same log must agree with each
    other — cheap global invariants over the smoke data."""
    import __spark_entry__ as e
    from tests.conftest import SF_SMOKE
    from events_to_db_spark.session import load_table

    Q = e.queries()
    ev = load_table(spark, SF_SMOKE, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()

    # new-user curve: final cumulative == total distinct users,
    # daily new-user sum == total distinct users
    nu = Q["q_ev_newusers"](spark, SF_SMOKE).collect()
    assert max(r["cum_users"] for r in nu) == n_users
    assert sum(r["new_users"] for r in nu) == n_users

    # gap-fill: zero-filled grid conserves the event total and covers
    # the full span × type grid
    gf = Q["q_ev_gapfill"](spark, SF_SMOKE).collect()
    assert sum(r["n"] for r in gf) == n_events
    n_days = len({r["d"] for r in gf})
    n_types = len({r["event_type"] for r in gf})
    assert len(gf) == n_days * n_types

    # WAU dominates DAU everywhere, never exceeds the user universe
    dau = {
        r["d"]: r["n"]
        for r in ev.groupBy(F.col("ts").cast("date").cast("string").alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in Q["q_ev_wau"](spark, SF_SMOKE).collect():
        assert dau.get(r["d"], 0) <= r["wau"] <= n_users

    # streaks never exceed the user's distinct active days
    days_per_user = {
        r["user_id"]: r["nd"]
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct(F.col("ts").cast("date")).alias("nd"))
        .collect()
    }
    for r in Q["q_ev_streak"](spark, SF_SMOKE).collect():
        assert r["best_streak"] <= days_per_user[r["user_id"]]

    # attribution: attributed purchases cannot exceed total purchases
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    attributed = sum(
        r["n_purchases"]
        for r in Q["q_ev_attribution"](spark, SF_SMOKE).collect()
    )
    assert attributed <= n_purch


# ---------------------------------------------------------------------------
# partition_bound weakening property (r8): for ANY tag expression, the
# partition-only weakening must never exclude a row the exact predicate
# accepts — this is what makes the multiplexed shared-scan pruning
# lossless for every config that will ever be written, not just the
# shapes the example tests cover.
# ---------------------------------------------------------------------------

_tag_atoms = st.sampled_from(
    [
        "'type:purchase'",
        "'type:view'",
        "'type:error'",
        "'cat:conversion'",
        "'user:7'",
        "allEvents",
        "isLocal",
        "TIME >= 2024-01-08",
        "TIME < 2024-01-18",
        "TIME >= 2024-01-12 06:00:00",
    ]
)

_tag_exprs = st.recursive(
    _tag_atoms,
    lambda inner: st.one_of(
        st.tuples(inner, inner).map(lambda t: f"({t[0]} & {t[1]})"),
        st.tuples(inner, inner).map(lambda t: f"({t[0]} | {t[1]})"),
        inner.map(lambda e: f"!{e}" if not e.startswith("TIME") else f"!({e})"),
    ),
    max_leaves=5,
)


@pytest.fixture(scope="module")
def landing_frame(spark, tmp_path_factory):
    from events_to_db_spark.etl import build_landing_layout, load_landing
    from events_to_db_spark.functions.tags import with_tags
    from tests.conftest import SF_SMOKE

    dst = str(tmp_path_factory.mktemp("land_prop") / "events")
    build_landing_layout(spark, SF_SMOKE, dst)
    return with_tags(load_landing(spark, dst)).cache()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=_tag_exprs)
def test_partition_bound_never_excludes_exact_rows(landing_frame, expr):
    from events_to_db_spark.functions.tags import (
        parse_tag_expr,
        partition_bound,
    )

    cols = set(landing_frame.columns)
    exact = parse_tag_expr(expr).to_column("tags", cols)
    weak = partition_bound(expr, cols)
    # weakening property: exact ⇒ weak, i.e. no row is exact∧¬weak
    assert landing_frame.filter(exact & ~weak).count() == 0
