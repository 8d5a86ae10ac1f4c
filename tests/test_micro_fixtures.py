"""Unit tests over hand-built micro-fixtures (FIXTURES.md): boundary
timestamps, nulls, ties, empty groups — the cases sf-scale data may
never hit but production data will."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- sessions

@pytest.fixture(scope="module")
def boundary_events(spark):
    """Gaps of exactly 30:00.000000, 29:59.999999, 30:00.000001."""
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 7),
        (2, _ts("2024-01-01 00:30:00"), 7),          # gap exactly 30:00 -> merges
        (3, _ts("2024-01-01 00:59:59.999999"), 7),   # 29:59.999999 -> merges
        (4, _ts("2024-01-01 01:30:00.000001"), 7),   # 30:00.000001 -> NEW session
        (5, _ts("2024-01-01 02:00:00"), 8),          # other user
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")


def test_session_window_boundary_semantics(spark, boundary_events):
    """Spark session_window: gap of exactly 30:00 MERGES (a new session
    needs gap > 30 min strictly) — pinned here because the SQL oracle
    must use the same strict comparison (SURVEY §7.3.6)."""
    out = (
        boundary_events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("user_id", "w.start")
        .collect()
    )
    assert [(r["user_id"], r["n"]) for r in out] == [(7, 3), (7, 1), (8, 1)]


def test_session_lag_oracle_formulation_matches(spark, boundary_events):
    """The lag/gap-flag/cumsum formulation (the DuckDB oracle's shape)
    must produce identical sessions to session_window on the boundary
    fixture."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = boundary_events.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = (
        flagged.withColumn("sid", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n"))
        .orderBy("user_id", "sid")
        .collect()
    )
    assert [(r["user_id"], r["n"]) for r in sessions] == [(7, 3), (7, 1), (8, 1)]


# ---------------------------------------------------------------- null joins

@pytest.fixture(scope="module")
def null_key_frames(spark):
    left = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "k int, lv string"
    )
    right = spark.createDataFrame(
        [(1, "x"), (None, "y"), (4, "z")], "k int, rv string"
    )
    return left, right


def test_null_keys_never_equi_match(spark, null_key_frames):
    left, right = null_key_frames
    assert left.join(right, "k").count() == 1  # only k=1; NULL != NULL


def test_full_outer_preserves_null_key_rows(spark, null_key_frames):
    left, right = null_key_frames
    rows = left.join(right, ["k"], "full").collect()
    # 1 match + unmatched: left NULL, left 3, right NULL, right 4
    assert len(rows) == 5


def test_except_and_intersect_null_semantics(spark):
    a = spark.createDataFrame([(1,), (None,), (2,)], "v int")
    b = spark.createDataFrame([(None,), (2,)], "v int")
    # set ops use null-safe grouping: NULL does intersect with NULL
    assert {r["v"] for r in a.intersect(b).collect()} == {None, 2}
    assert {r["v"] for r in a.exceptAll(b).collect()} == {1}


# ---------------------------------------------------------------- rank ties

def test_rank_family_tie_discipline(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 5.0)], "id long, v double"
    )
    w = Window.orderBy(F.col("v").desc(), "id")
    out = {
        r["id"]: (r["rk"], r["dr"], r["rn"])
        for r in df.select(
            "id",
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("dr"),
            F.row_number().over(w).alias("rn"),
        ).collect()
    }
    # unique tie-break key in the ordering => the three functions agree
    assert out == {1: (1, 1, 1), 2: (2, 2, 2), 3: (3, 3, 3)}
    # without the tie-break, rank/dense_rank expose the tie
    w2 = Window.orderBy(F.col("v").desc())
    out2 = {
        r["id"]: (r["rk"], r["dr"])
        for r in df.select(
            "id",
            F.rank().over(w2).alias("rk"),
            F.dense_rank().over(w2).alias("dr"),
        ).collect()
    }
    assert out2[1] == (1, 1) and out2[2] == (1, 1) and out2[3] == (3, 2)


# ---------------------------------------------------------------- empty input

def test_aggregates_on_empty_input(spark):
    df = spark.createDataFrame([], "k string, v double").filter(F.lit(False))
    # global agg on empty input: one row, null/zero semantics
    row = df.agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.avg("v").alias("a")
    ).collect()[0]
    assert (row["n"], row["s"], row["a"]) == (0, None, None)
    # grouped agg on empty input: zero rows
    assert df.groupBy("k").agg(F.sum("v")).count() == 0
    # window/session on empty input: zero rows, no error
    assert (
        df.withColumn("ts", F.current_timestamp())
        .groupBy(F.session_window("ts", "30 minutes"))
        .count()
        .count()
        == 0
    )


# ---------------------------------------------------------------- bad payloads

def test_malformed_json_payloads_become_null(spark):
    """Schema-on-read must absorb garbage payloads as NULLs, never
    errors — the dynamic-payload contract (§1.1)."""
    df = spark.createDataFrame(
        [
            (1, '{"k": 7}'),
            (2, "not json"),
            (3, '{"k": "str-not-int"}'),
            (4, None),
            (5, '{"other": 1}'),
        ],
        "event_id long, props string",
    )
    out = {
        r["event_id"]: (r["k1"], r["k2"])
        for r in df.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k1"),
            F.from_json("props", "k int").getField("k").alias("k2"),
        ).collect()
    }
    assert out[1] == ("7", 7)
    assert out[2] == (None, None)
    assert out[3][0] == "str-not-int" and out[3][1] is None  # try-cast to int
    assert out[4] == (None, None)
    assert out[5] == (None, None)


# ---------------------------------------------------------------- float edge

def test_round4_collapses_cross_engine_noise(spark, duck):
    """A 1e-10-relative disagreement (the accumulation-order scale)
    must vanish under round-4; a 1e-4 disagreement must not."""
    base = 12345.678949
    noisy = base + 1e-9
    r = spark.createDataFrame([(base,), (noisy,)], "v double").select(
        F.round("v", 4).alias("r")
    ).collect()
    assert r[0]["r"] == r[1]["r"] == 12345.6789
    assert (
        duck.sql(f"SELECT round(CAST({base!r} AS DOUBLE), 4)").fetchone()[0]
        == 12345.6789
    )
    assert (
        spark.createDataFrame([(base + 2e-4,)], "v double")
        .select(F.round("v", 4).alias("r"))
        .collect()[0]["r"]
        != 12345.6789
    )


# ------------------------------------------------- round-1 late operators

@pytest.fixture(scope="module")
def micro_sf(spark, tmp_path_factory):
    """A tiny sf-dir with hand-built events + documents tables, so the
    actual contract query functions run against boundary fixtures."""
    root = tmp_path_factory.mktemp("micro_sf")
    ev_rows = [
        # user 1: state runs A A B A  (collapse to A,B,A), 1-day gap on Jan 3
        (1, _ts("2024-01-01 00:00:00"), 1, "click", 10.0, "{}"),
        (2, _ts("2024-01-01 01:00:00"), 1, "click", 20.0, "{}"),
        (3, _ts("2024-01-02 00:00:00"), 1, "view", 30.0, "{}"),
        (4, _ts("2024-01-04 00:00:00"), 1, "click", 40.0, "{}"),
        # user 2: single event
        (5, _ts("2024-01-01 12:00:00"), 2, "view", 50.0, "{}"),
    ]
    spark.createDataFrame(
        ev_rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "events.parquet"))
    doc_rows = [
        # token-set chain by subset growth: 1-2 Jaccard 4/5=0.8, 2-3
        # Jaccard 5/6=0.833, but 1-3 only 4/6=0.667 — clustering must
        # still unite all three (transitivity), canonical = longest.
        (1, "a b c d", "en", "src0", 7),
        (2, "a b c d e", "en", "src0", 9),
        (3, "a b c d e f", "en", "src0", 11),
        (4, "x y z", "en", "src0", 5),  # isolated singleton
    ]
    spark.createDataFrame(
        doc_rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_scd2_collapses_runs_and_chains_intervals(spark, micro_sf):
    from events_to_db_spark.operators.events_ops import q_ev_scd2

    rows = sorted(
        q_ev_scd2(spark, micro_sf).collect(),
        key=lambda r: (r["user_id"], r["valid_from_us"]),
    )
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [r["state"] for r in u1] == ["click", "view", "click"]
    # intervals chain exactly: each valid_to equals the next valid_from
    assert u1[0]["valid_to_us"] == u1[1]["valid_from_us"]
    assert u1[1]["valid_to_us"] == u1[2]["valid_from_us"]
    assert u1[2]["valid_to_us"] is None and u1[2]["is_current"]
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]


def test_gapfill_emits_zero_rows_for_missing_days(spark, micro_sf):
    from events_to_db_spark.operators.events_ops import q_ev_gapfill

    rows = q_ev_gapfill(spark, micro_sf).collect()
    # span 2024-01-01..04, types {click, view}: full 4x2 grid
    assert len(rows) == 8
    by = {(r["event_type"], r["d"]): r for r in rows}
    assert by[("click", "2024-01-03")]["n"] == 0
    assert by[("click", "2024-01-03")]["is_gap"]
    assert by[("click", "2024-01-01")]["n"] == 2
    assert not by[("click", "2024-01-01")]["is_gap"]
    # a day inside the span with no events at all for a type still appears
    assert by[("view", "2024-01-04")]["n"] == 0


def test_cluster_transitive_closure_and_canonical(spark, micro_sf):
    from events_to_db_spark.operators.llm_ops import q_dedup_cluster

    rows = {r["cluster_id"]: r for r in q_dedup_cluster(spark, micro_sf).collect()}
    # docs 1-2 pair, 2-3 pair, 1-3 below threshold -> one cluster of 3 via
    # transitivity, labeled by min doc_id; canonical = longest text (doc 3)
    assert rows[1]["n_docs"] == 3 and rows[1]["canonical_doc"] == 3
    assert rows[4]["n_docs"] == 1 and rows[4]["canonical_doc"] == 4


def test_ewma_recurrence_exact(spark, micro_sf):
    from events_to_db_spark.operators.udfs import q_udf_ewma

    rows = {r["user_id"]: r for r in q_udf_ewma(spark, micro_sf).collect()}
    acc = 10.0
    for x in (20.0, 30.0, 40.0):
        acc = acc * 0.9 + x * 0.1
    assert rows[1]["n_events"] == 4 and rows[1]["ewma"] == round(acc, 4)
    assert rows[2]["n_events"] == 1 and rows[2]["ewma"] == 50.0


def test_transitions_order_and_tiebreak(spark, micro_sf):
    from events_to_db_spark.operators.events_ops import q_ev_transitions

    rows = q_ev_transitions(spark, micro_sf).collect()
    got = {(r["prev_type"], r["next_type"]): (r["n"], r["rnk"]) for r in rows}
    # user1 path: click->click->view->click
    assert got[("click", "click")] == (1, 1)  # n ties broken by type asc
    assert got[("click", "view")] == (1, 2)
    assert got[("view", "click")] == (1, 1)
