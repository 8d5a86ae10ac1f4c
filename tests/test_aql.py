"""AQL front-end tests (SURVEY.md §1.3): every pipeline string is
checked for EQUIVALENCE against the hand-written DataFrame plan it
must compile to — same discipline as the streaming twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from events_to_db_spark.functions.aql import parse_aql, run_aql
from events_to_db_spark.functions.tags import with_tags
from events_to_db_spark.session import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tagged(spark):
    return with_tags(load_table(spark, SF_SMOKE, "events")).cache()


def _k(col="props"):
    return F.get_json_object(col, "$.k").try_cast("double")


def test_from_filter_select(spark, tagged):
    got = run_aql(
        tagged, "FROM 'type:purchase' FILTER _.k > 50 SELECT _.k * 2"
    )
    want = (
        tagged.filter(F.array_contains("tags", "type:purchase"))
        .filter(_k() > 50)
        .select("ts", "event_id", (_k() * 2).alias("value"))
    )
    assert sorted(r["value"] for r in got.collect()) == sorted(
        r["value"] for r in want.collect()
    )
    assert got.count() > 0


def test_tag_conjunction_and_negation(spark, tagged):
    got = run_aql(tagged, "FROM 'cat:conversion' & !'type:signup' SELECT _.k")
    want = tagged.filter(
        F.array_contains("tags", "cat:conversion")
        & ~F.array_contains("tags", "type:signup")
    )
    assert got.count() == want.count() > 0


def test_aggregate_sum_and_count(spark, tagged):
    got = run_aql(
        tagged, "FROM 'type:error' AGGREGATE SUM(_.k) / COUNT()"
    ).collect()[0]["value"]
    errs = tagged.filter(F.array_contains("tags", "type:error"))
    want = errs.agg(
        (F.sum(_k()) / F.count(F.lit(1))).alias("v")
    ).collect()[0]["v"]
    assert got == pytest.approx(want)


def test_first_last_follow_event_order(spark, tagged):
    got = run_aql(
        tagged, "FROM 'type:click' AGGREGATE LAST(_.k) - FIRST(_.k)"
    ).collect()[0]["value"]
    clicks = tagged.filter(F.array_contains("tags", "type:click"))
    o = F.struct("ts", "event_id")
    want = clicks.agg(
        (
            F.max_by(_k(), o).try_cast("double")
            - F.min_by(_k(), o).try_cast("double")
        ).alias("v")
    ).collect()[0]["v"]
    assert got == pytest.approx(want)


def test_case_endcase(spark, tagged):
    got = run_aql(
        tagged,
        "FROM allEvents SELECT CASE WHEN _.k >= 50 THEN 'hi'"
        " ELSE 'lo' ENDCASE",
    )
    hi = sum(1 for r in got.collect() if r["value"] == "hi")
    want = tagged.filter(_k() >= 50).count()
    assert hi == want


def test_limit_is_event_ordered_prefix(spark, tagged):
    # a bare path in SELECT stays dynamically typed (raw JSON text)
    got = run_aql(tagged, "FROM allEvents SELECT _.k LIMIT 5").collect()
    want = (
        tagged.orderBy("ts", "event_id")
        .select(F.get_json_object("props", "$.k").alias("value"))
        .limit(5)
        .collect()
    )
    assert [r["value"] for r in got] == [r["value"] for r in want]


def test_filter_boolean_algebra_and_string_compare(spark, tagged):
    got = run_aql(
        tagged,
        "FROM allEvents FILTER (_.k < 10 | _.k > 90) & _.k != 95 SELECT _.k",
    )
    k = _k()
    want = tagged.filter(((k < 10) | (k > 90)) & (k != 95))
    assert got.count() == want.count() > 0


def test_tag_predicate_reaches_scan_as_filter(spark, tagged):
    # the FROM tag expression must compile to a plain Catalyst
    # predicate (array_contains), not a UDF — visible in the plan
    df = run_aql(tagged, "FROM 'type:purchase' SELECT _.k")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "array_contains" in plan
    assert "pythonUDF" not in plan.lower()


def test_parse_errors_are_loud(spark, tagged):
    for bad in (
        "FILTER _.k > 1",  # missing FROM
        "FROM 'a' LIMIT x",  # bad limit
        "FROM 'a' FILTER CASE WHEN _.k THEN 2",  # unclosed CASE
        "FROM 'a' AGGREGATE _.k",  # AGGREGATE without aggregate fn
        "FROM 'a' FILTER _.k > > 1",  # mangled expression
    ):
        with pytest.raises(ValueError):
            run_aql(tagged, bad)


def test_select_object_construction_flattens_to_columns(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:view' SELECT { k: _.k, hi: _.k >= 50,"
        " scaled: _.k * 10 } LIMIT 3",
    )
    assert got.columns == ["ts", "event_id", "k", "hi", "scaled"]
    rows = got.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["hi"] == (float(r["k"]) >= 50)
        assert r["scaled"] == float(r["k"]) * 10


def test_object_parse_errors(spark, tagged):
    for bad in (
        "FROM 'a' SELECT { k _.k }",  # missing colon
        "FROM 'a' SELECT { k: _.k",  # unclosed
    ):
        with pytest.raises(ValueError):
            run_aql(tagged, bad)


def test_chained_select_filter_select_rebinds_payload(spark, tagged):
    """After a SELECT, `_` is the selected value — the post-SELECT
    FILTER reads it, and the second SELECT transforms it again."""
    got = run_aql(
        tagged,
        "FROM 'type:view' SELECT _.k + 1 FILTER _ > 51 SELECT _ * 10",
    )
    want = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .select("ts", "event_id", (_k() + 1).alias("v"))
        .filter(F.col("v") > 51)
        .select("ts", "event_id", (F.col("v") * 10).alias("value"))
    )
    assert sorted(r["value"] for r in got.collect()) == sorted(
        r["value"] for r in want.collect()
    )
    assert got.count() > 0


def test_object_select_then_filter_on_field(spark, tagged):
    """Object SELECT mid-pipeline: later stages address its fields."""
    got = run_aql(
        tagged,
        "FROM 'type:view' SELECT { k: _.k, big: _.k > 50 } "
        "FILTER _.big SELECT _.k",
    )
    want = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .filter(_k() > 50)
        .select("ts", "event_id", _k().alias("value"))
    )
    got_vals = sorted(float(r["value"]) for r in got.collect())
    want_vals = sorted(float(r["value"]) for r in want.collect())
    assert got_vals == want_vals and got_vals


def test_mid_pipeline_limit_is_event_order_prefix(spark, tagged):
    """LIMIT mid-pipeline takes the first n in (ts, event_id) order and
    keeps piping — the stream-prefix semantics, not an arbitrary n."""
    got = run_aql(
        tagged,
        "FROM 'type:purchase' LIMIT 20 FILTER _.k > 50 SELECT _.k",
    )
    base = (
        tagged.filter(F.array_contains("tags", "type:purchase"))
        .orderBy("ts", "event_id")
        .limit(20)
        .filter(_k() > 50)
        .select(_k().alias("value"))
    )
    assert sorted(float(r["value"]) for r in got.collect()) == sorted(
        float(r["value"]) for r in base.collect()
    )
    # prefix-then-filter ≠ filter-then-prefix: prove the order matters
    assert got.count() <= 20


def test_aggregate_must_be_last(spark, tagged):
    with pytest.raises(ValueError, match="AGGREGATE must be the last"):
        run_aql(tagged, "FROM allEvents AGGREGATE SUM(_.k) FILTER _ > 1")


def test_final_object_select_flattens(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:view' FILTER _.k > 80 SELECT { twice: _.k * 2, neg: 0 - _.k }",
    )
    assert set(got.columns) == {"ts", "event_id", "twice", "neg"}
    rows = got.collect()
    assert rows and all(r.twice == -2 * r.neg for r in rows)


def test_let_binding_survives_select_rebind(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:view' LET orig := _.k SELECT _.k * 2 FILTER orig >= 90",
    )
    base = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .filter(_k() >= 90)
        .select((_k() * 2).alias("value"))
    )
    assert sorted(float(r["value"]) for r in got.collect()) == sorted(
        float(r["value"]) for r in base.collect()
    )
    # binding columns are internal — never leak into the output
    assert set(got.columns) == {"ts", "event_id", "value"}


def test_let_usable_in_aggregate_and_object(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:view' LET kk := _.k * 2 AGGREGATE SUM(kk)",
    ).collect()
    base = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .agg(F.sum(_k() * 2).alias("v"))
        .collect()
    )
    assert abs(got[0]["value"] - base[0]["v"]) < 1e-9
    obj = run_aql(
        tagged,
        "FROM 'type:view' LET kk := _.k * 2 SELECT { kk: kk, orig: _.k }",
    )
    rows = obj.collect()
    assert rows and all(abs(r.kk - 2 * float(r.orig)) < 1e-9 for r in rows)


def test_let_parse_errors(spark, tagged):
    with pytest.raises(ValueError, match="LET needs ':='"):
        run_aql(tagged, "FROM allEvents LET x = _.k SELECT x")
    with pytest.raises(ValueError, match="LET needs a binding name"):
        run_aql(tagged, "FROM allEvents LET := _.k SELECT _.k")
    with pytest.raises(ValueError, match="LET cannot contain aggregates"):
        run_aql(tagged, "FROM allEvents LET x := SUM(_.k) SELECT x")


def test_aggregate_object_single_pass(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:purchase' AGGREGATE"
        " { total: SUM(_.k), hi: MAX(_.k), n: COUNT() }",
    )
    assert got.columns == ["total", "hi", "n"]
    row = got.collect()[0]
    base = (
        tagged.filter(F.array_contains("tags", "type:purchase"))
        .agg(
            F.sum(_k()).alias("total"),
            F.max(_k()).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert abs(row["total"] - base["total"]) < 1e-9
    assert row["hi"] == base["hi"] and row["n"] == base["n"]
    # one scan: the object form must not multiply the source
    # (AQE's toString repeats the plan under "== Initial Plan ==" —
    # count scans in the final section only)
    plan = got._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") <= 1


def test_aggregate_object_requires_an_aggregate(spark, tagged):
    with pytest.raises(ValueError, match="AGGREGATE needs an aggregate"):
        run_aql(tagged, "FROM allEvents AGGREGATE { a: _.k }")


def test_nested_object_select_and_leaf_access(spark, tagged):
    """Nested `{ a: { b: … } }` construction compiles to nested structs
    and later stages address leaves through the struct chain."""
    got = run_aql(
        tagged,
        "FROM 'type:view'"
        " SELECT { meta: { dbl: _.k * 2, big: _.k >= 60 }, raw: _.k * 1 }"
        " FILTER _.meta.big"
        " SELECT _.meta.dbl - _.raw",
    )
    want = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .filter(_k() >= 60)
        .select("ts", "event_id", (_k() * 2 - _k()).alias("value"))
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_nested_object_in_aggregate_errors_without_agg(spark, tagged):
    with pytest.raises(ValueError, match="needs an aggregate"):
        run_aql(tagged, "FROM allEvents AGGREGATE { a: { b: _.k } }")


# --- sub-query binding (LET x := FROM … END) ---------------------------


def test_subquery_scalar_equivalence(spark, tagged):
    """AGGREGATE-terminated sub-query binds a scalar; equivalent to the
    hand-built broadcast scalar plan."""
    got = run_aql(
        tagged,
        "FROM 'type:purchase' LET thr := FROM 'type:view'"
        " AGGREGATE MAX(_.k) END FILTER _.k >= thr - 5"
        " AGGREGATE { n: COUNT() }",
    )
    thr = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .agg(F.max(_k()))
        .collect()[0][0]
    )
    want = (
        tagged.filter(F.array_contains("tags", "type:purchase"))
        .filter(_k() >= thr - 5)
        .count()
    )
    assert got.collect()[0]["n"] == want > 0


def test_subquery_array_is_event_ordered(spark, tagged):
    """SELECT-pipeline sub-query binds the event-ordered array of its
    row values."""
    got = run_aql(
        tagged,
        "FROM 'type:purchase' LET top := FROM 'type:error'"
        " SELECT _.k LIMIT 3 END SELECT { t3: top, one: top[1] } LIMIT 1",
    ).collect()[0]
    want = [
        r["value"]
        for r in (
            tagged.filter(F.array_contains("tags", "type:error"))
            .select("ts", "event_id", F.get_json_object("props", "$.k").alias("value"))
            .orderBy("ts", "event_id")
            .limit(3)
            .collect()
        )
    ]
    assert list(got["t3"]) == want
    assert got["one"] == want[1]


def test_subquery_struct_binding_field_access(spark, tagged):
    """Object-AGGREGATE sub-query binds a struct; fields addressed by
    binding-rooted paths."""
    got = run_aql(
        tagged,
        "FROM 'type:purchase' LET s := FROM 'type:view'"
        " AGGREGATE { n: COUNT(), mx: MAX(_.k) } END"
        " SELECT { subn: s.n, submx: s.mx } LIMIT 1",
    ).collect()[0]
    view = tagged.filter(F.array_contains("tags", "type:view"))
    assert got["subn"] == view.count()
    assert got["submx"] == view.agg(F.max(_k())).collect()[0][0]


def test_subquery_nests(spark, tagged):
    """A sub-query may itself contain a sub-query (depth-counted
    FROM/END pairing)."""
    got = run_aql(
        tagged,
        "FROM 'type:purchase'"
        " LET t := FROM 'type:view' LET m := FROM 'type:error'"
        " AGGREGATE MAX(_.k) END FILTER _.k > m - 50 AGGREGATE COUNT() END"
        " AGGREGATE { deep: MAX(t) }",
    ).collect()[0]
    m = (
        tagged.filter(F.array_contains("tags", "type:error"))
        .agg(F.max(_k()))
        .collect()[0][0]
    )
    want = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .filter(_k() > m - 50)
        .count()
    )
    assert got["deep"] == want


def test_subquery_plan_is_broadcast_not_per_row(spark, tagged):
    """The compiled plan must contain a broadcast of the 1-row
    sub-result — scalar-subquery shape, no per-row re-execution."""
    df = run_aql(
        tagged,
        "FROM 'type:purchase' LET thr := FROM 'type:view'"
        " AGGREGATE MAX(_.k) END FILTER _.k >= thr"
        " AGGREGATE COUNT()",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_subquery_parse_errors(spark, tagged):
    with pytest.raises(ValueError, match="missing END"):
        parse_aql("FROM 'a' LET x := FROM 'b' AGGREGATE COUNT()")
    with pytest.raises(ValueError, match="END without matching FROM"):
        parse_aql("FROM 'a' LET x := 1 END SELECT _.k")
    with pytest.raises(ValueError, match="whole binding"):
        run_aql(
            tagged,
            "FROM 'type:view' LET x := FROM 'type:error'"
            " AGGREGATE COUNT() END + 1 AGGREGATE COUNT()",
        )
    with pytest.raises(ValueError, match="unknown binding"):
        run_aql(tagged, "FROM 'type:view' SELECT { a: nope.x }")


def test_subquery_array_cap_raises_loudly(spark, tagged, monkeypatch):
    """ADVICE r04: an array-valued sub-query that materializes more
    rows than SPARK_GRAFT_AQL_SUB_MAX must fail with a loud, named
    error instead of silently concentrating the event log into one
    aggregation row; under the cap the same query is unaffected."""
    q = (
        "FROM 'type:purchase' LET ks := FROM 'type:view'"
        " SELECT _.k END SELECT { ks: ks } LIMIT 1"
    )
    monkeypatch.setenv("SPARK_GRAFT_AQL_SUB_MAX", "2")
    with pytest.raises(Exception, match="SPARK_GRAFT_AQL_SUB_MAX"):
        run_aql(tagged, q).collect()

    monkeypatch.delenv("SPARK_GRAFT_AQL_SUB_MAX")
    n_view = tagged.filter(F.array_contains("tags", "type:view")).count()
    assert len(run_aql(tagged, q).collect()[0]["ks"]) == n_view


def test_envelope_meta_filter_and_select(spark, tagged):
    """VERDICT r04 #5: `_time`, `_key`, `_appId`, `_tags[i]` address
    the event envelope in expressions — equivalence vs the
    hand-written plan on the carried envelope columns."""
    got = run_aql(
        tagged,
        "FROM 'type:purchase' FILTER _appId = 'app-1'"
        " SELECT { id: _key, app: _appId, tag0: _tags[0], k: _.k * 1 }",
    )
    want = (
        tagged.filter(F.array_contains("tags", "type:purchase"))
        .filter(F.col("app_id") == "app-1")
        .select(
            F.col("event_id").alias("id"),
            F.col("app_id").alias("app"),
            F.col("tags").getItem(0).alias("tag0"),
            _k().alias("k"),
        )
    )
    assert sorted(map(tuple, got.select("id", "app", "tag0", "k").collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() > 0


def test_envelope_time_orders_as_text(spark, tagged):
    lo = "2024-01-10"
    got = run_aql(
        tagged, f"FROM 'type:view' FILTER _time >= '{lo}' AGGREGATE COUNT()"
    ).collect()[0]["value"]
    want = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .filter(F.col("ts").cast("string") >= lo)
        .count()
    )
    assert got == want > 0


def test_envelope_meta_survives_select_rebind(spark, tagged):
    """Envelope columns are carried across SELECT rebinds, so a
    later FILTER can still address them."""
    got = run_aql(
        tagged,
        "FROM 'type:purchase' SELECT { k2: _.k * 2 }"
        " FILTER _appId = 'app-0' & _key >= 0 SELECT _.k2",
    )
    want = (
        tagged.filter(F.array_contains("tags", "type:purchase"))
        .filter(F.col("app_id") == "app-0")
        .select((_k() * 2).alias("value"))
    )
    assert sorted(r["value"] for r in got.collect()) == sorted(
        r["value"] for r in want.collect()
    )


def test_envelope_meta_errors(spark, tagged):
    with pytest.raises(ValueError, match="not indexable"):
        run_aql(tagged, "FROM 'type:view' SELECT _time[0]")
    # a frame without app_id: referencing _appId is a compile error
    bare = tagged.drop("app_id")
    with pytest.raises(ValueError, match="_appId"):
        run_aql(bare, "FROM 'type:view' FILTER _appId = 'x' SELECT _.k")


def test_envelope_meta_in_let_and_aggregate(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:error' LET who := _appId"
        " AGGREGATE { n: COUNT(), last_id: LAST(_key) }",
    ).collect()[0]
    errs = tagged.filter(F.array_contains("tags", "type:error"))
    last_id = (
        errs.orderBy(F.desc("ts"), F.desc("event_id"))
        .select("event_id")
        .first()["event_id"]
    )
    assert got["n"] == errs.count() > 0
    assert got["last_id"] == last_id


# --- round 6: PRAGMA header, interpolation, multi-emission ---------------


def test_pragma_header_recorded_and_ignored(spark, tagged):
    q = parse_aql(
        "PRAGMA features := subQuery interpolation\n"
        "PRAGMA features := multiEmission\n"
        "FROM 'type:view' SELECT _.k"
    )
    assert q.features == ("subQuery", "interpolation", "multiEmission")
    got = run_aql(
        tagged, "PRAGMA features := zøg\nFROM 'type:view' AGGREGATE COUNT()"
    ).collect()
    want = run_aql(tagged, "FROM 'type:view' AGGREGATE COUNT()").collect()
    assert got == want


def test_interpolation_matches_concat_plan(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:view' FILTER _.k >= 95"
        " SELECT { m: `e{_key} k={_.k}` }",
    )
    want = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .filter(_k() >= 95)
        .select(
            "ts",
            "event_id",
            F.concat(
                F.lit("e"),
                F.col("event_id").cast("string"),
                F.lit(" k="),
                F.get_json_object("props", "$.k"),
            ).alias("m"),
        )
    )
    assert sorted(r["m"] for r in got.collect()) == sorted(
        r["m"] for r in want.collect()
    )
    assert got.count() > 0


def test_interpolation_escapes_and_null(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:view' LIMIT 1 SELECT { m: `\\{lit\\} \\` {_.k}` }",
    ).collect()
    assert len(got) == 1 and got[0]["m"].startswith("{lit} ` ")
    # a NULL splice propagates (SQL concat semantics)
    got = run_aql(
        tagged, "FROM 'type:view' LIMIT 1 SELECT { m: `x{_.nope}y` }"
    ).collect()
    assert got[0]["m"] is None
    # literal-only and empty interpolations
    got = run_aql(
        tagged, "FROM 'type:view' LIMIT 1 SELECT { a: `plain`, b: `` }"
    ).collect()
    assert got[0]["a"] == "plain" and got[0]["b"] == ""


def test_interpolation_errors(spark, tagged):
    with pytest.raises(ValueError, match="unterminated"):
        run_aql(tagged, "FROM 'type:view' SELECT `a{_.k`")
    with pytest.raises(ValueError, match="outside"):
        run_aql(tagged, "FROM 'type:view' SELECT `a}b`")
    with pytest.raises(ValueError, match="aggregates"):
        run_aql(tagged, "FROM 'type:view' AGGREGATE `n={COUNT()}`")


def test_multi_emission_scalar_packs_key(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:view' FILTER _.k >= 99 SELECT _.k * 1, 0 - _.k * 1",
    )
    base = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .filter(_k() >= 99)
        .select("ts", "event_id", _k().alias("k"))
    )
    rows = {(r["event_id"], r["value"]) for r in got.collect()}
    want = set()
    for r in base.collect():
        want.add((r["event_id"] * 2, r["k"]))
        want.add((r["event_id"] * 2 + 1, -r["k"]))
    assert rows == want and rows


def test_multi_emission_downstream_stages(spark, tagged):
    # emissions rebind `_`; FILTER sees each emission; FIRST folds over
    # the packed order (first emission of the first event wins)
    got = run_aql(
        tagged,
        "FROM 'type:view' FILTER _.k >= 99"
        " SELECT { v: _.k * 1 }, { v: _.k * 2 }"
        " FILTER _.v >= 100 AGGREGATE FIRST(_.v)",
    ).collect()
    base = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .filter(_k() >= 99)
        .select("ts", "event_id", _k().alias("k"))
        .orderBy("ts", "event_id")
    )
    first = base.collect()[0]
    # v=k fails the >=100 filter for k=99; v=2k passes — so the first
    # surviving emission of the first event is 2k (pos 1 in pack order)
    want = first["k"] * 2 if first["k"] < 100 else first["k"]
    assert got[0]["value"] == want

    # LIMIT counts emitted rows in packed order (k >= 97 matches 3
    # events in sf0.001 → 6 emissions; the prefix cuts mid-event)
    lim = run_aql(
        tagged,
        "FROM 'type:view' FILTER _.k >= 97"
        " SELECT _.k * 1, 0 - _.k * 1 LIMIT 3 AGGREGATE COUNT()",
    ).collect()
    assert lim[0]["value"] == 3


def test_multi_emission_shape_mismatch_rejected(spark, tagged):
    with pytest.raises(ValueError, match="same-shaped"):
        run_aql(tagged, "FROM 'type:view' SELECT _.k * 1, 'x'")
    with pytest.raises(ValueError, match="same-shaped"):
        run_aql(tagged, "FROM 'type:view' SELECT { a: _.k }, { b: _.k }")


def test_interpolation_inside_subquery_binding(spark, tagged):
    """LET sub-queries re-parse from tokens — an interpolation inside
    one must survive the round trip with its backticks and escapes."""
    got = run_aql(
        tagged,
        "FROM 'type:view' FILTER _.k >= 99"
        " LET m := FROM 'type:purchase' FILTER _.k >= 99 LIMIT 1"
        "          SELECT `p\\{{_key}\\}` END"
        " SELECT { tag: m[0], k: _.k * 1 }",
    ).collect()
    assert got, "binding pipeline must produce rows"
    assert got[0]["tag"].startswith("p{") and got[0]["tag"].endswith("}")


def test_alternative_operator_and_isdefined(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:view' LIMIT 1"
        " SELECT { a: _.missing ?? 'fallback', b: _.k ?? 'x',"
        " c: IsDefined(_.k), d: IsDefined(_.missing) }",
    ).collect()[0]
    assert got["a"] == "fallback"
    assert got["b"] is not None and got["b"] != "x"
    assert got["c"] is True and got["d"] is False
    # ?? chains left-associatively
    got = run_aql(
        tagged,
        "FROM 'type:view' LIMIT 1"
        " SELECT _.m1 ?? _.m2 ?? 'third'",
    ).collect()[0]
    assert got["value"] == "third"


def test_array_literal(spark, tagged):
    got = run_aql(
        tagged,
        "FROM 'type:view' FILTER _.k >= 99 LIMIT 1"
        " SELECT { arr: [_.k * 1, _.k * 2, 0 - 1] }",
    ).collect()[0]
    assert got["arr"] == [99.0, 198.0, -1.0]
    # empty array and parse errors
    assert run_aql(
        tagged, "FROM 'type:view' LIMIT 1 SELECT { e: [] }"
    ).collect()[0]["e"] == []
    with pytest.raises(ValueError, match="missing ']'"):
        run_aql(tagged, "FROM 'type:view' SELECT [_.k")
    with pytest.raises(ValueError, match="unexpected end"):
        run_aql(tagged, "FROM 'type:view' SELECT [_.k, ")
    with pytest.raises(ValueError, match="IsDefined needs"):
        run_aql(tagged, "FROM 'type:view' SELECT IsDefined _.k")


def test_envelope_lamport_stream_offset(spark, tagged):
    """VERDICT r06 #4: `_lamport`/`_stream`/`_offset` address the
    completed envelope (with_envelope) from FILTER and SELECT —
    equivalence vs the hand-written plan on the synthesized columns,
    and offset is the 0-based per-stream rank in event order."""
    from pyspark.sql import Window

    from events_to_db_spark.functions.tags import with_envelope

    env = with_envelope(tagged)
    got = run_aql(
        env,
        "FROM 'type:purchase' FILTER _lamport % 2 = 0 & _stream != 'stream-3'"
        " SELECT { lam: _lamport, st: _stream, off: _offset }",
    )
    w = Window.partitionBy("stream_id").orderBy("event_id")
    want = (
        env.withColumn("off", F.row_number().over(w) - 1)
        .filter(F.array_contains("tags", "type:purchase"))
        .filter((F.col("lamport") % 2 == 0) & (F.col("stream_id") != "stream-3"))
        .select(
            F.col("lamport").alias("lam"),
            F.col("stream_id").alias("st"),
            F.col("off").cast("bigint"),
        )
    )
    assert sorted(
        map(tuple, got.select("lam", "st", "off").collect())
    ) == sorted(map(tuple, want.collect()))
    assert got.count() > 0
    # lamport is injective and monotone in the event order
    rows = env.select("event_id", "lamport").orderBy("event_id").collect()
    lams = [r["lamport"] for r in rows]
    assert lams == sorted(lams) and len(set(lams)) == len(lams)
    # offsets within each stream are exactly 0..n-1
    per = (
        env.groupBy("stream_id")
        .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"),
             F.count("*").alias("n"))
        .collect()
    )
    assert all(r["lo"] == 0 and r["hi"] == r["n"] - 1 for r in per)
    # envelope columns survive SELECT rebinds (the carry list)
    got2 = run_aql(
        env,
        "FROM 'type:purchase' SELECT { k2: _.k * 2 }"
        " FILTER _offset = 0 & _lamport >= 0 SELECT _stream",
    )
    n_first = (
        env.withColumn("off", F.row_number().over(w) - 1)
        .filter(F.array_contains("tags", "type:purchase") & (F.col("off") == 0))
        .count()
    )
    assert got2.count() == n_first
    # a frame without the columns: compile error, not NULL
    with pytest.raises(ValueError, match="_lamport"):
        run_aql(tagged, "FROM 'type:view' FILTER _lamport > 0 SELECT _.k")


def test_interpolation_brace_inside_string_literal(spark, tagged):
    """ADVICE r06: the splice scanner must skip '…'-quoted segments —
    a `}` (or `{`) inside a string literal within a splice is text,
    not nesting."""
    got = run_aql(
        tagged,
        "FROM 'type:view' FILTER _.k >= 99 LIMIT 1"
        " SELECT { m: `a{'}'}b`, n: `c{'{x}'}d` }",
    ).collect()[0]
    assert got["m"] == "a}b"
    assert got["n"] == "c{x}d"
    # escaped quote inside the literal inside the splice still scans
    got2 = run_aql(
        tagged,
        "FROM 'type:view' FILTER _.k >= 99 LIMIT 1"
        " SELECT { m: `q{'\\'}'}r` }",
    ).collect()[0]
    assert got2["m"] == "q'}r"


def test_time_bound_in_subquery_from(spark, tagged):
    """TIME bounds survive the sub-query re-parse (r7: stage bodies
    are re-tokenized and reassembled with spaces, so the tag grammar
    tolerates interior whitespace in instants)."""
    got = run_aql(
        tagged,
        "FROM 'type:purchase'"
        " LET thr := FROM 'type:view' & TIME >= 2024-01-10"
        " AGGREGATE COUNT() END"
        " LIMIT 1 SELECT { thr: thr }",
    ).collect()[0]["thr"]
    want = (
        tagged.filter(F.array_contains("tags", "type:view"))
        .filter(F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        .count()
    )
    assert got == want > 0
