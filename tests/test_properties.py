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
