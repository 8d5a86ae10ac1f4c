"""events-to-db config runner (etl.py): a declared {query → table}
config must land exactly the batch AQL answer in each target table,
resume from its checkpoint across runs (new files only), and stay
idempotent under redelivery — the reference lifecycle's catch-up /
follow / idempotent-insert loop (SURVEY §3.1 Path A)."""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from events_to_db_spark.etl import run_etl_config, validate_config
from events_to_db_spark.functions.aql import run_aql
from events_to_db_spark.functions.tags import with_tags
from events_to_db_spark.session import load_table
from events_to_db_spark.streaming.sink import read_sink_table
from tests.conftest import SF_SMOKE

PURCHASE_QUERY = (
    "FROM 'type:purchase' FILTER _.k >= 50"
    " SELECT { user: _.user_id, k: _.k * 1 }"
)


def _config(feed: str, tmp_path) -> dict:
    return {
        "events": feed,
        "db": str(tmp_path / "etl.db"),
        "checkpoints": str(tmp_path / "ckpt"),
        "tables": [
            {"table": "purchases", "query": PURCHASE_QUERY},
            {"table": "raw_copy"},
        ],
    }


def _drain(queries) -> None:
    for q in queries.values():
        q.awaitTermination()


def _batch_rows(spark, query: str) -> set[tuple]:
    batch = run_aql(with_tags(load_table(spark, SF_SMOKE, "events")), query)
    return {tuple(r) for r in batch.collect()}


def test_config_tables_match_batch(spark, chunked_events, tmp_path):
    feed, ev, n = chunked_events
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))

    got = read_sink_table(cfg["db"], "purchases")
    want = _batch_rows(spark, PURCHASE_QUERY)
    # sqlite stringifies timestamps — compare on the value columns
    assert set(got.columns) >= {"ts", "event_id", "user", "k"}
    got_rows = {
        (r.event_id, r.user, r.k) for r in got.itertuples(index=False)
    }
    assert got_rows == {(eid, user, k) for _ts, eid, user, k in want}
    assert len(got) == len(want)

    raw = read_sink_table(cfg["db"], "raw_copy")
    assert len(raw) == n
    assert sorted(raw["event_id"]) == sorted(
        r["event_id"] for r in ev.select("event_id").collect()
    )


def test_config_resume_and_idempotency(spark, chunked_events, tmp_path):
    feed, ev, n = chunked_events
    # first run over a COPY of the feed missing its last file
    part = tmp_path / "feed_part"
    part.mkdir()
    files = sorted(os.listdir(feed))
    for f in files[:-1]:
        shutil.copy(os.path.join(feed, f), part / f)
        os.utime(part / f, (time.time() - 600, time.time() - 600))
    cfg = _config(str(part), tmp_path)
    cfg["tables"] = [{"table": "raw_copy"}]
    _drain(run_etl_config(spark, cfg))
    first = read_sink_table(cfg["db"], "raw_copy")
    assert 0 < len(first) < n

    # the last file lands; re-run with the SAME checkpoints — only the
    # new file is read, and the keyed upsert keeps the table exact
    shutil.copy(os.path.join(feed, files[-1]), part / files[-1])
    _drain(run_etl_config(spark, cfg))
    second = read_sink_table(cfg["db"], "raw_copy")
    assert len(second) == n
    assert len(set(second["event_id"])) == n

    # a third run with nothing new is a no-op (still exactly n rows)
    _drain(run_etl_config(spark, cfg))
    assert len(read_sink_table(cfg["db"], "raw_copy")) == n


def test_config_rejects_aggregate_and_bad_shapes(spark, tmp_path):
    base = {
        "events": str(tmp_path),
        "db": str(tmp_path / "x.db"),
        "checkpoints": str(tmp_path / "c"),
    }
    with pytest.raises(ValueError, match="AGGREGATE"):
        validate_config(
            {**base, "tables": [{"table": "t", "query": "FROM allEvents AGGREGATE COUNT()"}]}
        )
    with pytest.raises(ValueError, match="duplicate"):
        validate_config({**base, "tables": [{"table": "t"}, {"table": "t"}]})
    with pytest.raises(ValueError, match="missing key"):
        validate_config({"tables": [{"table": "t"}]})
    with pytest.raises(ValueError, match="no tables"):
        validate_config({**base, "tables": []})
    with pytest.raises(ValueError, match="without 'table'"):
        validate_config({**base, "tables": [{"query": "FROM allEvents"}]})
    # ADVICE r06: names splice into checkpoint paths and quoted SQL
    # identifiers — path-escape and quote-breaking names must be
    # rejected at validate time, before any stream starts.
    for bad in ("a/b", "..", "a..b/", 'a"b', "über", "a b", "."):
        with pytest.raises(ValueError, match="must match"):
            validate_config({**base, "tables": [{"table": bad}]})
    for ok in ("raw_copy", "t-2", "schema.table", "A_1."):
        validate_config({**base, "tables": [{"table": ok}]})


def _total_input_rows(queries) -> int:
    """Sum numInputRows over the DISTINCT underlying StreamingQuery
    objects (multiplexed tables share one)."""
    seen = {}
    for q in queries.values():
        seen[q.id] = q
    return int(
        sum(
            p["numInputRows"]
            for q in seen.values()
            for p in q.recentProgress
        )
    )


def test_multiplex_reads_log_once(spark, chunked_events, tmp_path):
    """VERDICT r06 #3: a 3-table config must read the event log ONCE
    per micro-batch, not once per table — measured on the source's own
    numInputRows metric — while landing exactly the per-table answers
    the per-stream runner lands."""
    feed, ev, n = chunked_events
    tables = [
        {"table": "purchases", "query": PURCHASE_QUERY},
        {"table": "views", "query": "FROM 'type:view' SELECT _.k * 2"},
        {"table": "raw_copy"},
    ]

    cfg = {
        "events": feed, "db": str(tmp_path / "multi.db"),
        "checkpoints": str(tmp_path / "ckpt_multi"), "tables": tables,
    }
    qs = run_etl_config(spark, cfg)  # multiplex default
    _drain(qs)
    assert len({q.id for q in qs.values()}) == 1  # one shared stream
    multiplex_rows = _total_input_rows(qs)

    legacy = {
        "events": feed, "db": str(tmp_path / "legacy.db"),
        "checkpoints": str(tmp_path / "ckpt_legacy"), "tables": tables,
    }
    qs2 = run_etl_config(spark, legacy, multiplex=False)
    _drain(qs2)
    legacy_rows = _total_input_rows(qs2)

    assert multiplex_rows == n
    assert legacy_rows == 3 * n  # the scan amplification multiplex kills

    # identical per-table content either way
    for t in ("purchases", "views", "raw_copy"):
        a = read_sink_table(cfg["db"], t)
        b = read_sink_table(legacy["db"], t)
        key = sorted(a.columns)
        assert sorted(map(tuple, a[key].values.tolist())) == sorted(
            map(tuple, b[key].values.tolist())
        )
    assert len(read_sink_table(cfg["db"], "raw_copy")) == n


def test_multiplex_rejects_limit_with_pointer(spark, tmp_path):
    base = {
        "events": str(tmp_path), "db": str(tmp_path / "x.db"),
        "checkpoints": str(tmp_path / "c"),
    }
    cfg = {**base, "tables": [
        {"table": "t", "query": "FROM allEvents LIMIT 5 SELECT _.k"}
    ]}
    with pytest.raises(ValueError, match="multiplex=False"):
        validate_config(cfg)
    validate_config(cfg, multiplex=False)  # per-table streams allow it


AGG_QUERY = (
    "FROM 'type:purchase' FILTER _.k >= 50"
    " AGGREGATE { n: COUNT(), total: SUM(_.k) }"
)


def test_aggregate_mode_materializes_fold(spark, chunked_events, tmp_path):
    """VERDICT r06 #6 (Path C): a {"mode": "aggregate"} entry
    materializes the complete-mode fold exactly-once — resumes from
    its checkpoint across runs and converges to the batch AGGREGATE
    answer; a redelivered/no-op run leaves the table unchanged."""
    feed, ev, n = chunked_events
    part = tmp_path / "feed_part"
    part.mkdir()
    files = sorted(os.listdir(feed))
    for f in files[:-1]:
        shutil.copy(os.path.join(feed, f), part / f)
        os.utime(part / f, (time.time() - 600, time.time() - 600))
    cfg = {
        "events": str(part), "db": str(tmp_path / "agg.db"),
        "checkpoints": str(tmp_path / "ckpt_agg"),
        "tables": [
            {"table": "purchase_fold", "query": AGG_QUERY,
             "mode": "aggregate"},
            {"table": "raw_copy"},
        ],
    }
    _drain(run_etl_config(spark, cfg))
    partial = read_sink_table(cfg["db"], "purchase_fold")
    assert len(partial) == 1

    # the last file lands; resume from the checkpoint
    shutil.copy(os.path.join(feed, files[-1]), part / files[-1])
    _drain(run_etl_config(spark, cfg))
    got = read_sink_table(cfg["db"], "purchase_fold")
    want = run_aql(
        with_tags(load_table(spark, SF_SMOKE, "events")), AGG_QUERY
    ).collect()[0]
    assert len(got) == 1
    assert int(got["n"][0]) == want["n"]
    assert float(got["total"][0]) == pytest.approx(want["total"])
    assert int(got["n"][0]) > int(partial["n"][0])  # fold advanced

    # nothing new: the fold table is unchanged (replace is idempotent)
    _drain(run_etl_config(spark, cfg))
    again = read_sink_table(cfg["db"], "purchase_fold")
    assert again.values.tolist() == got.values.tolist()

    # a copy-mode AGGREGATE (no mode flag) is still rejected loudly
    bad = {**cfg, "tables": [{"table": "t", "query": AGG_QUERY}]}
    with pytest.raises(ValueError, match="AGGREGATE"):
        validate_config(bad)
    # and an aggregate-mode entry without a fold is rejected too
    bad2 = {**cfg, "tables": [
        {"table": "t", "query": "FROM allEvents", "mode": "aggregate"}
    ]}
    with pytest.raises(ValueError, match="no\\s+AGGREGATE"):
        validate_config(bad2)


def test_multiplex_added_table_fails_loudly(spark, chunked_events, tmp_path):
    """ADVICE r07 (medium): adding a table to an EXISTING multiplex
    checkpoint must error — committed offsets would never replay for
    the new table (silent missing history).  Same set and removals
    resume fine."""
    feed, _ev, n = chunked_events
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))
    assert len(read_sink_table(cfg["db"], "raw_copy")) == n

    # identical set: resumes (no-op) without complaint
    _drain(run_etl_config(spark, cfg))

    # removal: fine (the remaining table keeps its offsets)
    removed = {**cfg, "tables": [{"table": "raw_copy"}]}
    _drain(run_etl_config(spark, removed))

    # addition: loud failure naming the remedy
    added = {**cfg, "tables": cfg["tables"] + [
        {"table": "late_comer", "query": PURCHASE_QUERY}
    ]}
    with pytest.raises(ValueError, match="late_comer.*never be replayed"):
        run_etl_config(spark, added)

    # a FRESH checkpoint root accepts the enlarged set
    fresh = {**added, "checkpoints": str(tmp_path / "ckpt_fresh"),
             "db": str(tmp_path / "fresh.db")}
    _drain(run_etl_config(spark, fresh))
    assert len(read_sink_table(fresh["db"], "late_comer")) > 0


def test_reserved_and_limit_validation(tmp_path):
    """ADVICE r07: '__'-prefixed table names are runner-internal
    (checkpoint collision with __multiplex); an aggregate-mode entry
    may not carry the stateful LIMIT prefix."""
    base = {
        "events": str(tmp_path), "db": str(tmp_path / "x.db"),
        "checkpoints": str(tmp_path / "c"),
    }
    with pytest.raises(ValueError, match="reserved"):
        validate_config({**base, "tables": [{"table": "__multiplex"}]})
    with pytest.raises(ValueError, match="LIMIT"):
        validate_config({**base, "tables": [
            {"table": "f", "mode": "aggregate",
             "query": "FROM allEvents LIMIT 5 AGGREGATE COUNT()"}
        ]})
    with pytest.raises(ValueError, match="sink_mode"):
        validate_config({**base, "sink_mode": "jdbc",
                         "tables": [{"table": "t"}]})


def test_executor_sink_mode_matches_driver(spark, chunked_events, tmp_path):
    """VERDICT r07 #2 e2e: a config with sink_mode=executor produces
    the identical table state (the per-partition executor upserts
    compose to the same keyed idempotent copy)."""
    feed, _ev, n = chunked_events
    cfg = _config(feed, tmp_path)
    cfg["sink_mode"] = "executor"
    cfg["db"] = str(tmp_path / "exec.db")
    cfg["checkpoints"] = str(tmp_path / "ckpt_exec")
    _drain(run_etl_config(spark, cfg))
    got = read_sink_table(cfg["db"], "purchases")
    want = _batch_rows(spark, PURCHASE_QUERY)
    assert {(r.event_id, r.user, r.k) for r in got.itertuples(index=False)} \
        == {(eid, user, k) for _ts, eid, user, k in want}
    assert len(read_sink_table(cfg["db"], "raw_copy")) == n


def test_backfill_unblocks_added_table(spark, chunked_events, tmp_path):
    """The guard's sanctioned remedy: backfill_multiplex_table drains
    the FULL log for the new table through its own one-off checkpoint,
    registers it, and the enlarged config then resumes — new table
    carries complete history, old tables unaffected."""
    from events_to_db_spark.etl import backfill_multiplex_table

    feed, _ev, n = chunked_events
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))

    entry = {"table": "late_comer", "query": PURCHASE_QUERY}
    added = {**cfg, "tables": cfg["tables"] + [entry]}
    with pytest.raises(ValueError, match="backfill_multiplex_table"):
        run_etl_config(spark, added)

    backfill_multiplex_table(spark, cfg, entry)
    _drain(run_etl_config(spark, added))  # guard now accepts the set

    got = read_sink_table(cfg["db"], "late_comer")
    want = _batch_rows(spark, PURCHASE_QUERY)
    assert {(r.event_id, r.user, r.k) for r in got.itertuples(index=False)} \
        == {(eid, user, k) for _ts, eid, user, k in want}
    assert len(read_sink_table(cfg["db"], "raw_copy")) == n
    # a LIMIT entry cannot join the multiplexed scan via backfill either
    with pytest.raises(ValueError, match="LIMIT"):
        backfill_multiplex_table(
            spark, cfg,
            {"table": "lim", "query": "FROM allEvents LIMIT 5 SELECT _.k"},
        )


def test_failed_start_does_not_register_tables(spark, chunked_events, tmp_path):
    """The marker records a table set only AFTER its stream starts:
    a run that fails at start (unparseable source dir) must not mark
    new tables as having history, or a later run would silently skip
    their replay."""
    import json

    feed, _ev, _n = chunked_events
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))

    bad = {**cfg, "events": str(tmp_path / "nonexistent_dir"),
           "tables": cfg["tables"] + [
               {"table": "ghost", "query": PURCHASE_QUERY}]}
    # guard raises FIRST (added table) — ghost must not be registered
    with pytest.raises(ValueError, match="ghost"):
        run_etl_config(spark, bad)
    marker = json.loads(
        (tmp_path / "ckpt" / "__multiplex_tables.json").read_text()
    )
    assert "ghost" not in marker["union"]

    # aggregate entries are rejected by the backfill path
    from events_to_db_spark.etl import backfill_multiplex_table

    with pytest.raises(ValueError, match="row-copy"):
        backfill_multiplex_table(
            spark, cfg,
            {"table": "f", "mode": "aggregate",
             "query": "FROM allEvents AGGREGATE COUNT()"},
        )


# --- r9: re-add frontier detection, legacy adoption, backfill quiescence ---


def _two_phase_feed(tmp_path):
    """A feed where half the chunk files land now and half can be
    landed later (returns the add-second-half callback)."""
    import glob

    from tests.conftest import SF_SMOKE as _SF  # noqa: F401

    all_files = None

    def build(spark):
        nonlocal all_files
        ev = load_table(spark, SF_SMOKE, "events")
        w = tmp_path / "w_phase"
        a = ev.filter((ev.event_id % 2) == 0)
        b = ev.filter((ev.event_id % 2) == 1)
        a.coalesce(1).write.parquet(str(w / "a"))
        b.coalesce(1).write.parquet(str(w / "b"))
        feed = tmp_path / "feed2"
        feed.mkdir()
        base = time.time() - 600
        fa = sorted(glob.glob(str(w / "a" / "part-*.parquet")))[0]
        fb = sorted(glob.glob(str(w / "b" / "part-*.parquet")))[0]
        shutil.copy(fa, feed / "0_a.parquet")
        os.utime(feed / "0_a.parquet", (base, base))

        def land_rest():
            shutil.copy(fb, feed / "1_b.parquet")
            os.utime(feed / "1_b.parquet", (base + 10, base + 10))

        return str(feed), land_rest

    return build


def test_readded_table_with_interim_history_fails(spark, tmp_path):
    """ADVICE r08: drop a table from the config, drain NEW data while
    it is out, re-add it — the cumulative union alone would wave it
    through, but its last-active frontier is behind the shared log, so
    the guard must fail pointing at the backfill; after the backfill
    the re-add proceeds with complete history."""
    from events_to_db_spark.etl import backfill_multiplex_table

    feed, land_rest = _two_phase_feed(tmp_path)(spark)
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))  # both tables see phase 1

    # purchases is dropped; phase 2 lands and is drained WITHOUT it
    land_rest()
    removed = {**cfg, "tables": [{"table": "raw_copy"}]}
    _drain(run_etl_config(spark, removed))
    n_all = load_table(spark, SF_SMOKE, "events").count()
    assert len(read_sink_table(cfg["db"], "raw_copy")) == n_all

    # re-add: loud failure naming the backfill remedy
    with pytest.raises(ValueError, match="RE-ADDED.*purchases|purchases.*RE-ADDED"):
        run_etl_config(spark, cfg)

    # the sanctioned remedy restores full history
    backfill_multiplex_table(
        spark, cfg, {"table": "purchases", "query": PURCHASE_QUERY}
    )
    _drain(run_etl_config(spark, cfg))
    got = read_sink_table(cfg["db"], "purchases")
    want = _batch_rows(spark, PURCHASE_QUERY)
    assert {(r.event_id, r.user, r.k) for r in got.itertuples(index=False)} \
        == {(eid, user, k) for _ts, eid, user, k in want} != set()


def test_readd_without_interim_data_is_allowed(spark, tmp_path):
    """The frontier check is about MISSED BATCHES, not config churn: a
    table dropped and re-added while the log stood still has no gap
    and must resume without ceremony."""
    feed, _land_rest = _two_phase_feed(tmp_path)(spark)
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))
    removed = {**cfg, "tables": [{"table": "raw_copy"}]}
    _drain(run_etl_config(spark, removed))  # no new files -> no new commits
    _drain(run_etl_config(spark, cfg))  # re-add purchases: fine


def test_legacy_markerless_checkpoint_requires_adopt_flag(
    spark, tmp_path
):
    """VERDICT r08 #6: a pre-marker checkpoint (offsets, no
    __multiplex_tables.json) must not silently masquerade as
    verified-complete — adoption needs the config's explicit
    adopt_legacy, and records a loud warning."""
    import warnings as _warnings

    feed, _land_rest = _two_phase_feed(tmp_path)(spark)
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))
    # synthesize a legacy checkpoint: history present, marker gone
    os.remove(tmp_path / "ckpt" / "__multiplex_tables.json")

    with pytest.raises(ValueError, match="adopt_legacy"):
        run_etl_config(spark, cfg)

    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        _drain(run_etl_config(spark, {**cfg, "adopt_legacy": True}))
    assert any("adopting" in str(w.message) for w in rec)
    # adoption re-writes the marker; the next run needs no flag
    _drain(run_etl_config(spark, cfg))


def test_r8_list_marker_is_upgraded_in_place(spark, tmp_path):
    """The r8 marker (bare cumulative-union list) is adopted as
    union = last_active with settled frontiers, and the next register
    rewrites it in the r9 shape."""
    import json

    feed, _land_rest = _two_phase_feed(tmp_path)(spark)
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))
    marker = tmp_path / "ckpt" / "__multiplex_tables.json"
    marker.write_text(json.dumps(["purchases", "raw_copy"]))  # r8 shape
    _drain(run_etl_config(spark, cfg))
    data = json.loads(marker.read_text())
    assert data["union"] == ["purchases", "raw_copy"]
    assert data["last_active"] == ["purchases", "raw_copy"]
    assert set(data["frontier"]) == {"purchases", "raw_copy"}


def test_backfill_refuses_when_frontier_moves(spark, tmp_path, monkeypatch):
    """ADVICE r08: the backfill's gap-free argument needs the multiplex
    stream quiescent — if the shared frontier advances between the
    backfill's snapshot and its register, the marker must NOT be
    written and the error must say to re-run."""
    import json

    from events_to_db_spark import etl as etl_mod
    from events_to_db_spark.etl import backfill_multiplex_table

    feed, _land_rest = _two_phase_feed(tmp_path)(spark)
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))

    calls = {"n": 0}
    real = etl_mod._latest_committed_batch

    def moving(checkpoints):
        calls["n"] += 1
        # second read sees a frontier one batch ahead (a concurrent
        # multiplexed drain)
        return real(checkpoints) + (1 if calls["n"] > 1 else 0)

    monkeypatch.setattr(etl_mod, "_latest_committed_batch", moving)
    with pytest.raises(ValueError, match="frontier moved"):
        backfill_multiplex_table(
            spark, cfg, {"table": "late_comer", "query": PURCHASE_QUERY}
        )
    monkeypatch.undo()
    marker = json.loads(
        (tmp_path / "ckpt" / "__multiplex_tables.json").read_text()
    )
    assert "late_comer" not in marker["union"]


# --- r10: observability surface + upsert-sink schema refusal ---


def test_metrics_recorded_per_batch_and_survive_restart(
    spark, chunked_events, tmp_path
):
    """VERDICT r09 #4: every fan-out batch writes per-table metrics
    (rows in/out, duration) beside the checkpoint; etl_status() reads
    them plus the committed frontier and the source file lag, works
    with no stream running, and SURVIVES a restart (append-only log)."""
    from events_to_db_spark.etl import etl_status

    feed, ev, n = chunked_events
    # phase 1: feed missing its last file
    part = tmp_path / "feed_part"
    part.mkdir()
    files = sorted(os.listdir(feed))
    for f in files[:-1]:
        shutil.copy(os.path.join(feed, f), part / f)
        os.utime(part / f, (time.time() - 600, time.time() - 600))
    cfg = _config(str(part), tmp_path)
    _drain(run_etl_config(spark, cfg))

    st = etl_status(cfg)
    assert st["feed_files_pending"] == 0  # drained
    assert st["committed_multiplex_batch"] >= 0
    assert set(st["tables"]) == {"purchases", "raw_copy"}
    raw1 = len(read_sink_table(cfg["db"], "raw_copy"))
    t = st["tables"]["raw_copy"]
    assert t["total_rows_out"] == raw1 > 0
    assert t["n_batches"] >= 1
    assert t["last_rows_in"] is not None
    assert t["last_duration_s"] is not None

    # a new file lands: status shows SOURCE LAG before any drain
    shutil.copy(os.path.join(feed, files[-1]), part / files[-1])
    assert etl_status(cfg)["feed_files_pending"] == 1

    # restart drains it; metrics APPEND (restart-survival), lag clears
    _drain(run_etl_config(spark, cfg))
    st2 = etl_status(cfg)
    assert st2["feed_files_pending"] == 0
    t2 = st2["tables"]["raw_copy"]
    assert t2["n_batches"] > t["n_batches"]
    assert t2["total_rows_out"] == n
    assert t2["last_batch_id"] > t["last_batch_id"]
    assert st2["committed_multiplex_batch"] >= t2["last_batch_id"]


def test_upsert_sink_refuses_schema_change(spark, tmp_path):
    """VERDICT r09 #3 (sink stage): the keyed upsert must fail LOUDLY
    when the target table exists with a different column set — widened
    used to die in an opaque sqlite error, NARROWED silently upserted
    partial rows forever (the silent case this pins shut).  The
    replace sink (complete folds) keeps evolving via DROP+recreate."""
    from events_to_db_spark.streaming.sink import (
        replace_foreach_batch,
        upsert_foreach_batch,
    )

    db = str(tmp_path / "s.db")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "event_id bigint, v string"
    )
    upsert_foreach_batch(db, "t", ["event_id"])(base, 0)

    widened = base.withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="different column set"):
        upsert_foreach_batch(db, "t", ["event_id"])(widened, 1)

    narrowed = base.drop("v")
    with pytest.raises(ValueError, match="different column set"):
        upsert_foreach_batch(db, "t", ["event_id"])(narrowed, 1)

    # same columns still upsert fine (order-insensitive)
    upsert_foreach_batch(db, "t", ["event_id"])(
        base.select("v", "event_id"), 2
    )
    assert len(read_sink_table(db, "t")) == 2

    # the replace sink evolves by design (every batch = whole fold)
    replace_foreach_batch(db, "fold")(base, 0)
    replace_foreach_batch(db, "fold")(widened, 1)
    assert "extra" in read_sink_table(db, "fold").columns


def test_config_query_change_fails_loudly_end_to_end(
    spark, chunked_events, tmp_path
):
    """VERDICT r09 #3 (pipeline stage): editing a table's SELECT shape
    between runs of the same config (a schema change into an upsert
    table holding history) surfaces as a loud StreamingQueryException,
    not a silent partial write."""
    feed_shared, _ev, _n = chunked_events
    # PRIVATE copy — this test appends a file, and chunked_events is a
    # session-scoped fixture shared with later test files
    feed = str(tmp_path / "feed_own")
    os.mkdir(feed)
    for f in sorted(os.listdir(feed_shared)):
        shutil.copy(os.path.join(feed_shared, f), os.path.join(feed, f))
        os.utime(
            os.path.join(feed, f), (time.time() - 600, time.time() - 600)
        )
    cfg = _config(feed, tmp_path)
    _drain(run_etl_config(spark, cfg))

    cfg2 = dict(cfg)
    cfg2["tables"] = [
        {
            "table": "purchases",  # same table, WIDER select
            "query": "FROM 'type:purchase' FILTER _.k >= 50"
            " SELECT { user: _.user_id, k: _.k * 1, k2: _.k * 2 }",
        },
        {"table": "raw_copy"},
    ]
    # force a redeliverable batch so the sink sees the new shape
    from events_to_db_spark.etl import backfill_multiplex_table  # noqa: F401
    from pyspark.errors.exceptions.captured import StreamingQueryException

    newfile = tmp_path / "one_more"
    load_table(spark, SF_SMOKE, "events").limit(5).select(
        (F.col("event_id") + 5_000_000).alias("event_id"),
        "ts",
        "user_id",
        F.lit("purchase").alias("event_type"),
        F.lit(99.0).alias("value"),
        F.lit('{"k": 99}').alias("props"),
    ).coalesce(1).write.parquet(str(newfile))
    for f in os.listdir(newfile):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(newfile, f), os.path.join(feed, f"zz_{f}"))
    with pytest.raises(StreamingQueryException, match="different column set"):
        _drain(run_etl_config(spark, cfg2))


def test_cli_catchup_and_status(spark, chunked_events, tmp_path, capsys):
    """r10 CLI: the namesake invocation — config in, catch-up drain,
    etl_status JSON out; --status reads the same surface with no
    Spark work at all."""
    import json

    from events_to_db_spark.etl import main

    feed, _ev, n = chunked_events
    cfg = _config(feed, tmp_path)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    assert main([str(cfg_path)]) == 0
    out = capsys.readouterr().out
    st = json.loads(out[out.find("{"):])
    assert st["feed_files_pending"] == 0
    assert st["tables"]["raw_copy"]["total_rows_out"] == n
    assert len(read_sink_table(cfg["db"], "raw_copy")) == n

    assert main([str(cfg_path), "--status"]) == 0
    out = capsys.readouterr().out
    st2 = json.loads(out[out.find("{"):])
    assert st2["committed_multiplex_batch"] >= 0
    assert st2["tables"]["purchases"]["total_rows_out"] == len(
        read_sink_table(cfg["db"], "purchases")
    )


def test_metrics_log_rotates_at_size_cap(tmp_path, monkeypatch):
    """The metrics log is bounded: past the rotation threshold the
    writer keeps the newest half, and etl_status still reads the
    survivors (a months-old deployment must not grow the log forever)."""
    import json

    from events_to_db_spark import etl as etl_mod
    from events_to_db_spark.etl import _record_metric, etl_status

    ck = str(tmp_path / "ckpt")
    monkeypatch.setattr(etl_mod, "_METRICS_ROTATE_BYTES", 4000)
    for b in range(100):
        _record_metric(ck, {"table": "t", "batch_id": b, "rows_out": b})
    log = tmp_path / "ckpt" / "__metrics.jsonl"
    assert log.stat().st_size < 8000  # rotated at least once
    recs = [json.loads(ln) for ln in log.read_text().splitlines()]
    assert recs[-1]["batch_id"] == 99  # newest records survive
    assert recs[0]["batch_id"] > 0  # oldest were dropped
    st = etl_status({"checkpoints": ck, "events": str(tmp_path)})
    assert st["tables"]["t"]["last_batch_id"] == 99


def test_config_expectations_gate_and_quarantine(
    spark, chunked_events, tmp_path
):
    """r10 declarative DQ in the config runner: per-table
    'expectations' fold exactly-once counters into <table>__dq on the
    TRANSFORMED rows, 'quarantine' routes violating rows aside in the
    same transaction, and 'drop_violations' excludes them from the
    target — counters, quarantine, and the landed set must agree with
    the batch suite exactly, and a no-op re-run must change nothing."""
    from events_to_db_spark.expectations import run_expectations

    feed, _ev, _n = chunked_events
    rules = [{"id": "k_cap", "type": "range", "col": "k", "hi": 80}]
    cfg = _config(feed, tmp_path)
    cfg["tables"] = [
        {
            "table": "purchases",
            "query": PURCHASE_QUERY,
            "expectations": rules,
            "quarantine": True,
            "drop_violations": True,
        },
        {"table": "raw_copy"},
    ]
    _drain(run_etl_config(spark, cfg))

    batch_out = run_aql(
        with_tags(load_table(spark, SF_SMOKE, "events")), PURCHASE_QUERY
    )
    want = {
        r["rule_id"]: (r["n_rows"], r["violations"])
        for r in run_expectations(batch_out, rules).collect()
    }
    n_all, n_viol = want["k_cap"]
    assert 0 < n_viol < n_all, "fixture must have a real partial violation"

    dq = read_sink_table(cfg["db"], "purchases__dq").set_index("rule_id")
    assert (dq.loc["k_cap", "n_rows"], dq.loc["k_cap", "violations"]) == (
        n_all,
        n_viol,
    )
    quar = read_sink_table(cfg["db"], "purchases__dq__quarantine")
    assert len(quar) == n_viol

    landed = read_sink_table(cfg["db"], "purchases")
    assert len(landed) == n_all - n_viol  # the gate dropped violators
    assert (landed["k"] <= 80).all()
    want_kept = {
        r["event_id"]
        for r in batch_out.filter("k <= 80").select("event_id").collect()
    }
    assert set(landed["event_id"]) == want_kept

    # the status surface exposes the violation trend per table
    from events_to_db_spark.etl import etl_status

    assert etl_status(cfg)["tables"]["purchases"]["dq"] == {
        "k_cap": n_viol
    }

    # no-op re-run: counters, quarantine, and the table all unchanged
    _drain(run_etl_config(spark, cfg))
    assert len(read_sink_table(cfg["db"], "purchases")) == n_all - n_viol
    dq2 = read_sink_table(cfg["db"], "purchases__dq").set_index("rule_id")
    assert dq2.loc["k_cap", "violations"] == n_viol
    assert len(read_sink_table(cfg["db"], "purchases__dq__quarantine")) == (
        n_viol
    )


def test_config_expectations_validation(tmp_path):
    """DQ config misuse fails at validate time, before any stream."""
    base = {
        "events": str(tmp_path),
        "db": str(tmp_path / "x.db"),
        "checkpoints": str(tmp_path / "c"),
    }
    with pytest.raises(ValueError, match="without 'expectations'"):
        validate_config(
            {**base, "tables": [{"table": "t", "drop_violations": True}]}
        )
    with pytest.raises(ValueError, match="not additive"):
        validate_config(
            {
                **base,
                "tables": [
                    {
                        "table": "t",
                        "expectations": [
                            {"id": "u", "type": "unique", "col": "event_id"}
                        ],
                    }
                ],
            }
        )
    with pytest.raises(ValueError, match="complete-mode fold"):
        validate_config(
            {
                **base,
                "tables": [
                    {
                        "table": "t",
                        "mode": "aggregate",
                        "query": "FROM allEvents AGGREGATE COUNT()",
                        "expectations": [
                            {"id": "r", "type": "not_null", "col": "value"}
                        ],
                    }
                ],
            }
        )
    with pytest.raises(ValueError, match="needs 'col'"):
        validate_config(
            {
                **base,
                "tables": [
                    {
                        "table": "t",
                        "expectations": [{"id": "r", "type": "not_null"}],
                    }
                ],
            }
        )


def test_config_expectations_per_table_streams(
    spark, chunked_events, tmp_path
):
    """The DQ gate composes identically on the NON-multiplexed
    per-table path (LIMIT-style configs)."""
    feed, _ev, _n = chunked_events
    rules = [{"id": "k_cap", "type": "range", "col": "k", "hi": 80}]
    cfg = _config(feed, tmp_path)
    cfg["tables"] = [
        {
            "table": "purchases",
            "query": PURCHASE_QUERY,
            "expectations": rules,
            "drop_violations": True,
        },
    ]
    _drain(run_etl_config(spark, cfg, multiplex=False))
    landed = read_sink_table(cfg["db"], "purchases")
    assert len(landed) > 0 and (landed["k"] <= 80).all()
    dq = read_sink_table(cfg["db"], "purchases__dq").set_index("rule_id")
    assert dq.loc["k_cap", "violations"] > 0


def test_cli_compact_verb(spark, tmp_path, capsys):
    """r10 CLI --compact: compacts the config's landing layout (flat
    configs refused) and prints the report JSON."""
    import json

    from events_to_db_spark.etl import main, maintain_landing_layout

    ev = load_table(spark, SF_SMOKE, "events")
    feed = tmp_path / "feed"
    feed.mkdir()
    w = tmp_path / "w"
    ev.coalesce(1).write.parquet(str(w))
    for f in os.listdir(w):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(w, f), feed / f)
    dst = str(tmp_path / "landing")
    maintain_landing_layout(
        spark, str(feed), dst, str(tmp_path / "ckpt_m")
    ).awaitTermination()

    cfg = {
        "events": dst,
        "events_layout": "landing",
        "db": str(tmp_path / "x.db"),
        "checkpoints": str(tmp_path / "ckpt"),
        "tables": [{"table": "raw_copy"}],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path), "--compact", "--incremental"]) == 0
    out = capsys.readouterr().out
    rep = json.loads(out[out.find("{"):])
    assert rep["rows"] == ev.count()
    assert rep["partitions_rewritten"] + rep["partitions_linked"] > 0

    flat = dict(cfg)
    flat.pop("events_layout")
    flat_path = tmp_path / "flat.json"
    flat_path.write_text(json.dumps(flat))
    with pytest.raises(SystemExit, match="FLAT"):
        main([str(flat_path), "--compact"])


def test_record_metric_concurrent_writers_lose_nothing(tmp_path, monkeypatch):
    """ADVICE r10: the metrics log has MANY driver-thread writers (the
    multiplex fan-out plus every aggregate-fold stream), and a rotation
    racing a concurrent append used to silently drop that append.
    Invariant under the module lock: every surviving line is valid
    JSON, and each writer's surviving batch_ids form a contiguous
    SUFFIX of its sequence (rotation may trim old lines, but a race-
    dropped append would leave a hole)."""
    import json
    import threading

    from events_to_db_spark import etl as etl_mod
    from events_to_db_spark.etl import _metrics_file, _record_metric

    # tiny threshold → rotation fires constantly during the run
    monkeypatch.setattr(etl_mod, "_METRICS_ROTATE_BYTES", 2048)
    ck = str(tmp_path / "ck")
    n_threads, n_recs = 6, 120

    def writer(t: int) -> None:
        for i in range(n_recs):
            _record_metric(ck, {"table": f"t{t}", "batch_id": i})

    threads = [
        threading.Thread(target=writer, args=(t,)) for t in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    seen: dict[str, list[int]] = {}
    for line in _metrics_file(ck).read_text().splitlines():
        rec = json.loads(line)  # no torn lines
        seen.setdefault(rec["table"], []).append(rec["batch_id"])
    assert seen  # the log survived the churn
    # Rotation trims a strict PREFIX of the file, so each writer's
    # survivors must be a contiguous SUFFIX of its own sequence ending
    # at its final id — a race-dropped append would leave a hole (or a
    # missing final id with earlier ids surviving).  A thread whose
    # lines were ALL legitimately rotated out is fine.
    for t in range(n_threads):
        ids = seen.get(f"t{t}", [])
        if ids:
            assert max(ids) == n_recs - 1, sorted(ids)
            assert sorted(ids) == list(range(min(ids), n_recs))


def test_compaction_not_refused_by_sibling_prefix_sink(
    spark, chunked_events, tmp_path
):
    """ADVICE r10: the live-sink mutual-exclusion check must compare
    NORMALIZED PATH EQUALITY — substring containment spuriously
    refused compacting <root>/land while an unrelated stream was
    writing <root>/land2."""
    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )
    from tests.conftest import stop_query

    # layout under compaction: batch-partitioned, no manifest/owner
    land = tmp_path / "land"
    ev = load_table(spark, SF_SMOKE, "events").limit(200)
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date", "event_type"
    ).parquet(str(land))
    n = spark.read.parquet(str(land)).count()

    # unrelated CONTINUOUS maintenance stream on the sibling whose
    # path has ours as a strict prefix (feed read-only from the shared
    # fixture — never mutated)
    feed, _ev2, _n2 = chunked_events
    q = maintain_landing_layout(
        spark,
        feed,
        str(tmp_path / "land2"),
        str(tmp_path / "ckpt_land2"),
        available_now=False,
    )
    try:
        deadline = time.time() + 60
        while q.lastProgress is None and time.time() < deadline:
            time.sleep(0.3)
        assert q.lastProgress is not None, "sibling stream never progressed"
        rep = compact_landing_layout(spark, str(land))
        assert rep["rows"] == n
    finally:
        stop_query(q)


def test_etl_status_pending_resolves_symlinked_feed(
    spark, chunked_events, tmp_path
):
    """ADVICE r10: with a SYMLINKED events dir the offset-log paths
    (recorded through the symlink) never intersected the resolved
    on-disk census, so every seen file counted as pending forever."""
    from events_to_db_spark.etl import etl_status

    feed, _ev, _n = chunked_events
    real = tmp_path / "events_real"
    real.mkdir()
    for f in sorted(os.listdir(feed)):
        shutil.copy(os.path.join(feed, f), real / f)
        os.utime(real / f, (time.time() - 600, time.time() - 600))
    link = tmp_path / "events_ln"
    os.symlink(real, link)

    cfg = _config(str(link), tmp_path)
    cfg["tables"] = [{"table": "raw_copy"}]
    _drain(run_etl_config(spark, cfg))
    st = etl_status(cfg)
    assert st["feed_files_seen"] == st["feed_files_present"] > 0
    assert st["feed_files_pending"] == 0


def test_upsert_sink_type_check_and_optin_widening(spark, tmp_path):
    """ADVICE r10 + VERDICT r10 #3 (sink stage): the evolution guard
    compares TYPES too (a name-preserving BIGINT→STRING change used to
    slip through into SQLite's dynamic typing forever), and pure
    column ADDS are applied via ALTER TABLE ADD COLUMN — but only
    under the explicit allow_add_columns opt-in (the etl config's
    "allow_widening"); accidental widening still refuses loudly."""
    from events_to_db_spark.streaming.sink import upsert_foreach_batch

    db = str(tmp_path / "t.db")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "event_id bigint, v string, k bigint"
    )
    upsert_foreach_batch(db, "t", ["event_id"])(base, 0)

    # name-preserving TYPE change: k bigint -> string must refuse
    retyped = base.withColumn("k", F.col("k").cast("string"))
    with pytest.raises(ValueError, match="column type changed"):
        upsert_foreach_batch(db, "t", ["event_id"])(retyped, 1)

    # widening without the opt-in still refuses (r9 guard intact)
    widened = base.withColumn("extra", F.col("k") * 2)
    with pytest.raises(ValueError, match="different column set"):
        upsert_foreach_batch(db, "t", ["event_id"])(widened, 1)

    # the opt-in evolves: history rows read NULL, new rows carry values
    upsert_foreach_batch(db, "t", ["event_id"], allow_add_columns=True)(
        widened.filter(F.col("event_id") == 2), 2
    )
    got = read_sink_table(db, "t").set_index("event_id")
    assert set(got.columns) == {"v", "k", "extra"}
    assert got.loc[2, "extra"] == 40
    assert got.loc[1, "extra"] is None or got.loc[1, "extra"] != got.loc[1, "extra"]  # NULL/NaN

    # drops refuse even WITH the opt-in
    with pytest.raises(ValueError, match="different column set"):
        upsert_foreach_batch(db, "t", ["event_id"], allow_add_columns=True)(
            base.drop("v"), 3
        )
