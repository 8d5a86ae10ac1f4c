"""Offset-map introspection + SQL entry-point parity tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from events_to_db_spark.session import load_sf
from events_to_db_spark.streaming import copy_to_db
from events_to_db_spark.streaming.offsets import (
    committed_batches,
    read_offset_log,
    resume_point,
)
from events_to_db_spark.streaming.sources import events_file_stream
from tests.conftest import SF_SMOKE


def test_offset_map_tracks_files_and_commits(spark, chunked_events, tmp_path):
    feed, ev, n = chunked_events
    ckpt = str(tmp_path / "ckpt")
    q = copy_to_db(
        events_file_stream(spark, feed), str(tmp_path / "s.db"), "t", ckpt
    )
    q.awaitTermination()
    log = read_offset_log(ckpt)
    commits = committed_batches(ckpt)
    assert log and commits
    assert commits == sorted(log)  # availableNow drained: all committed
    rp = resume_point(ckpt)
    assert rp["batch_id"] == max(commits)
    # file source's offset is a monotone log position
    log_offsets = [
        b["sources"][0]["logOffset"] for b in log.values() if b["sources"]
    ]
    assert log_offsets == sorted(log_offsets)
    # watermark was carried in the checkpoint metadata
    assert rp["watermark_ms"] and rp["watermark_ms"] > 0


def test_sql_entry_point_matches_dataframe_api(spark):
    """The engine's plans are reachable through spark.sql over the
    registered views with identical results — the SQL front door
    (SURVEY.md §3.2 entry point 2)."""
    load_sf(spark, SF_SMOKE)  # registers temp views
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()

    import __spark_entry__ as e

    df_rows = (
        e.queries()["q_agg_q1"](spark, SF_SMOKE)
        .select("l_returnflag", "l_linestatus", "sum_qty")
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    )
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in df_rows]


def test_sql_window_function_entry(spark):
    load_sf(spark, SF_SMOKE)
    rows = spark.sql(
        """
        SELECT user_id, event_id FROM (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
        """
    ).collect()
    import __spark_entry__ as e

    want = {
        (r["user_id"], r["event_id"])
        for r in e.queries()["q_ev_latest"](spark, SF_SMOKE).collect()
    }
    assert {(r["user_id"], r["event_id"]) for r in rows} == want
