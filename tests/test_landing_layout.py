"""Date-partitioned landing layout (etl.build_landing_layout): the
FROM-clause ``TIME`` atom must PARTITION-PRUNE over it — the opt-in
that makes the namesake's per-table scan story true at 100 TB — while
answers stay byte-identical to the flat layout (the redundant
``event_date`` bound is lossless by construction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from events_to_db_spark.etl import build_landing_layout, load_landing
from events_to_db_spark.functions.aql import run_aql
from events_to_db_spark.functions.tags import filter_by_tags, with_tags
from events_to_db_spark.session import load_table
from tests.conftest import SF_SMOKE

QUERY = (
    "FROM 'type:purchase' & TIME >= 2024-01-10 & TIME < 2024-01-20"
    " FILTER _.k >= 10 SELECT { k: _.k * 1 }"
)


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("landing") / "events_by_date")
    n = build_landing_layout(spark, SF_SMOKE, dst)
    assert n == load_table(spark, SF_SMOKE, "events").count()
    return dst


def test_time_bound_prunes_partitions(spark, landing):
    ev = with_tags(load_landing(spark, landing))
    out = run_aql(ev, QUERY)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the date bound must reach the scan as a PARTITION filter (whole
    # date directories skipped), not only a data filter
    pf = [
        line for line in plan.splitlines() if "PartitionFilters" in line
    ]
    assert pf, "no PartitionFilters in the physical plan"
    assert any("event_date" in line for line in pf), plan
    # and the pruned scan must read strictly fewer partitions/files
    # than the full date range
    n_dates = load_landing(spark, landing).select("event_date").distinct().count()
    in_range = (
        load_landing(spark, landing)
        .filter(
            (F.col("event_date") >= F.lit("2024-01-10").cast("date"))
            & (F.col("event_date") <= F.lit("2024-01-20").cast("date"))
        )
        .select("event_date")
        .distinct()
        .count()
    )
    assert 0 < in_range < n_dates


def test_landing_answers_match_flat(spark, landing):
    flat = with_tags(load_table(spark, SF_SMOKE, "events"))
    part = with_tags(load_landing(spark, landing))
    got = sorted(
        (r["event_id"], r["k"]) for r in run_aql(part, QUERY).collect()
    )
    want = sorted(
        (r["event_id"], r["k"]) for r in run_aql(flat, QUERY).collect()
    )
    assert got == want and got
    # the combinator/filter path strengthens identically
    a = filter_by_tags(part, "'type:view' & TIME >= 2024-01-15").count()
    b = filter_by_tags(flat, "'type:view' & TIME >= 2024-01-15").count()
    assert a == b > 0


def test_flat_layout_unaffected(spark):
    """No event_date column → TimeBound compiles exactly as before
    (no dangling reference, no behavior change)."""
    ev = with_tags(load_table(spark, SF_SMOKE, "events"))
    out = run_aql(ev, "FROM TIME >= 2024-01-10 AGGREGATE COUNT()")
    want = ev.filter(F.col("ts") >= "2024-01-10").count()
    assert out.collect()[0]["value"] == want > 0


def test_tag_atom_prunes_type_partitions(spark, landing):
    """VERDICT r07 #3: over the date×type landing layout a
    'type:purchase' FROM atom must reach the scan as a PARTITION
    filter on event_type (directory pruning), alongside TimeBound's
    event_date bound — no DataFilters-only scan for the compiled
    config predicate."""
    ev = with_tags(load_landing(spark, landing))
    out = run_aql(ev, QUERY)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert pf, "no PartitionFilters in the physical plan"
    assert any("event_type" in line for line in pf), plan
    assert any("event_date" in line for line in pf), plan
    # every parquet scan in this plan carries a non-empty partition
    # filter (zero DataFilters-only scans for the config predicate)
    assert all("PartitionFilters: []" not in line for line in pf), plan


def test_landing_stream_prunes_at_source(spark, landing, tmp_path):
    """events_layout=landing (r8): a per-table ETL stream over the
    date×type layout reads ONLY the partitions its compiled FROM
    predicate selects — numInputRows is bounded by the matching slice,
    strictly below the log size — while the sink state equals the
    batch answer over the same layout.  At 100 TB this is the
    difference between following the log and following the slice."""
    import json

    from pyspark.sql import functions as F

    from events_to_db_spark.etl import run_etl_config
    from events_to_db_spark.streaming.sink import read_sink_table

    cfg = {
        "events": landing,
        "events_layout": "landing",
        "db": str(tmp_path / "land.db"),
        "checkpoints": str(tmp_path / "ckpt_land"),
        "max_files_per_trigger": 100000,
        "tables": [{"table": "purch", "query": QUERY}],
    }
    qs = run_etl_config(spark, cfg, multiplex=False)
    in_rows = 0
    for q in set(qs.values()):
        q.awaitTermination()
        in_rows += sum(
            json.loads(p.json)["numInputRows"] for p in q.recentProgress
        )

    land = load_landing(spark, landing)
    total = land.count()
    slice_rows = land.filter(
        (F.col("event_type") == "purchase")
        & (F.col("event_date") >= F.lit("2024-01-10").cast("date"))
        & (F.col("event_date") <= F.lit("2024-01-20").cast("date"))
    ).count()
    assert 0 < in_rows <= slice_rows < total

    got = read_sink_table(cfg["db"], "purch")
    want = run_aql(with_tags(land), QUERY).collect()
    assert {(r.event_id, r.k) for r in got.itertuples(index=False)} == {
        (r["event_id"], r["k"]) for r in want
    } != set()


def test_multiplex_shared_scan_prunes_to_union(spark, landing, tmp_path):
    """r8 shared-scan pruning: a multiplexed config over the landing
    layout filters the ONE shared stream by the OR of each table's
    partition-only weakening — input rows equal the union slice, not
    the log — while every table's state still matches its batch
    answer (the exact predicates run per-table in the fan-out)."""
    import json

    from pyspark.sql import functions as F

    from events_to_db_spark.etl import run_etl_config
    from events_to_db_spark.streaming.sink import read_sink_table

    t_purch = (
        "FROM 'type:purchase' & TIME >= 2024-01-10 & TIME < 2024-01-20"
        " SELECT { k: _.k * 1 }"
    )
    t_err = "FROM 'type:error' SELECT { u: _.user_id }"
    cfg = {
        "events": landing,
        "events_layout": "landing",
        "db": str(tmp_path / "mx.db"),
        "checkpoints": str(tmp_path / "ckpt_mx"),
        "max_files_per_trigger": 100000,
        "tables": [
            {"table": "purch", "query": t_purch},
            {"table": "errs", "query": t_err},
        ],
    }
    qs = run_etl_config(spark, cfg)
    in_rows = 0
    for q in set(qs.values()):
        q.awaitTermination()
        in_rows += sum(
            json.loads(p.json)["numInputRows"] for p in q.recentProgress
        )

    land = load_landing(spark, landing)
    total = land.count()
    union_slice = land.filter(
        (
            (F.col("event_type") == "purchase")
            & (F.col("event_date") >= F.lit("2024-01-10").cast("date"))
            & (F.col("event_date") <= F.lit("2024-01-20").cast("date"))
        )
        | (F.col("event_type") == "error")
    ).count()
    assert 0 < in_rows <= union_slice < total

    for table, query, cols in (
        ("purch", t_purch, ("event_id", "k")),
        ("errs", t_err, ("event_id", "u")),
    ):
        got = read_sink_table(cfg["db"], table)
        want = run_aql(with_tags(land), query).collect()
        assert {tuple(getattr(r, c) for c in cols)
                for r in got.itertuples(index=False)} == {
            tuple(r[c] for c in cols) for r in want
        } != set()


def test_partition_bound_weakening_rules(spark):
    """partition_bound is a WEAKENING: NOT subtrees, non-type tags and
    source atoms collapse to TRUE; type/TIME atoms map to partition
    predicates; and it never excludes a row its exact predicate
    accepts (checked on the smoke corpus for a nested expression)."""
    from events_to_db_spark.functions.tags import (
        parse_tag_expr,
        partition_bound,
        with_tags,
    )
    from events_to_db_spark.session import load_table

    avail = {"event_type", "event_date"}
    # NOT weakens to TRUE (the negation of a weakening is not one)
    assert "true" in str(
        partition_bound("!'type:error'", avail)
    ).lower()
    assert "true" in str(partition_bound("'user:7'", avail)).lower()
    assert "event_type" in str(partition_bound("'type:view'", avail))
    # no partition columns available -> TRUE
    assert "true" in str(partition_bound("'type:view'", set())).lower()

    from events_to_db_spark.etl import build_landing_layout, load_landing
    import tempfile

    dst = tempfile.mkdtemp() + "/land_pb"
    build_landing_layout(spark, SF_SMOKE, dst)
    land = with_tags(load_landing(spark, dst))
    expr = "('type:purchase' | 'type:error') & TIME >= 2024-01-12 & !'user:3'"
    exact = land.filter(
        parse_tag_expr(expr).to_column("tags", set(land.columns))
    )
    weak = land.filter(partition_bound(expr, set(land.columns)))
    assert exact.exceptAll(weak).count() == 0  # weakening covers exact
    assert weak.count() < land.count()  # and still prunes


def test_landing_schema_does_not_mutate_events_schema():
    """StructType.add MUTATES its receiver — the landing schema must be
    built fresh, or every landing stream would append event_date to the
    module-level EVENTS_SCHEMA and corrupt later FLAT streams (caught
    live in r8: two calls left EVENTS_SCHEMA with event_date twice)."""
    from events_to_db_spark.streaming.sources import (
        EVENTS_SCHEMA,
        _landing_schema,
    )

    n = len(EVENTS_SCHEMA.fields)
    a = _landing_schema()
    b = _landing_schema()
    assert len(EVENTS_SCHEMA.fields) == n
    assert [f.name for f in a.fields] == [f.name for f in b.fields]
    assert a.fields[-1].name == "event_date"
    assert "event_date" not in [f.name for f in EVENTS_SCHEMA.fields]


def test_maintained_landing_layout_matches_batch(spark, tmp_path):
    """r8 streaming maintenance: the landing layout can be FOLLOWED
    from the flat feed — incremental appends through the native
    parquet sink's commit log equal the one-shot batch rewrite, resume
    picks up only new files, and a no-op re-run adds nothing (the
    _spark_metadata manifest is the exactly-once guarantee)."""
    import os
    import shutil
    import time

    from events_to_db_spark.etl import maintain_landing_layout
    from events_to_db_spark.session import load_table

    # replayable 2-chunk feed with increasing mtimes
    ev = load_table(spark, SF_SMOKE, "events")
    feed = tmp_path / "feed"
    chunks = tmp_path / "chunks"
    ev.coalesce(1).write.parquet(str(chunks / "all"))
    n = ev.count()
    half = ev.filter(F.col("event_id") % 2 == 0)
    rest = ev.filter(F.col("event_id") % 2 == 1)
    feed.mkdir()
    half.coalesce(1).write.parquet(str(tmp_path / "h1"))
    rest.coalesce(1).write.parquet(str(tmp_path / "h2"))
    files = []
    for i, src in enumerate(("h1", "h2")):
        for f in os.listdir(tmp_path / src):
            if f.endswith(".parquet"):
                dst = feed / f"chunk{i}_{f}"
                shutil.copy(tmp_path / src / f, dst)
                files.append(dst)
    os.utime(files[0], (time.time() - 600, time.time() - 600))

    dst = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt_maint")
    # first drain with only chunk 0 visible
    solo = tmp_path / "feed_solo"
    solo.mkdir()
    shutil.copy(files[0], solo / files[0].name)
    os.utime(solo / files[0].name, (time.time() - 600, time.time() - 600))
    maintain_landing_layout(spark, str(solo), dst, ckpt).awaitTermination()
    first = load_landing(spark, dst).count()
    assert 0 < first < n

    # chunk 1 lands; resume appends only the new file
    shutil.copy(files[1], solo / files[1].name)
    maintain_landing_layout(spark, str(solo), dst, ckpt).awaitTermination()
    land = load_landing(spark, dst)
    assert land.count() == n
    assert land.select("event_id").distinct().count() == n

    # no-op re-run: nothing new, still exactly n (no double-append)
    maintain_landing_layout(spark, str(solo), dst, ckpt).awaitTermination()
    assert load_landing(spark, dst).count() == n

    # the maintained layout prunes exactly like the batch-built one
    got = run_aql(with_tags(load_landing(spark, dst)), QUERY)
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("event_type" in ln for ln in pf)
    want = run_aql(
        with_tags(load_table(spark, SF_SMOKE, "events")), QUERY
    ).collect()
    assert sorted((r["event_id"], r["k"]) for r in got.collect()) == sorted(
        (r["event_id"], r["k"]) for r in want
    )


# --- r9: lifecycle (compaction + retention + single-writer ownership) ---


def _drip_feed(spark, tmp_path, n_chunks=3):
    """A replayable n-chunk feed with increasing mtimes; returns
    (feed_dir, per-chunk files, total rows)."""
    import os
    import shutil
    import time

    from events_to_db_spark.session import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    n = ev.count()
    feed = tmp_path / "feed"
    feed.mkdir()
    files = []
    for i in range(n_chunks):
        part = ev.filter(F.col("event_id") % n_chunks == i)
        w = tmp_path / f"w{i}"
        part.coalesce(1).write.parquet(str(w))
        for f in os.listdir(w):
            if f.endswith(".parquet"):
                files.append((w / f, f"chunk{i}_{f}"))
    # stamp strictly increasing mtimes as chunks land
    base_t = time.time() - 600
    return feed, files, n, base_t


def _land_chunk(feed, files, i, base_t):
    import os
    import shutil

    src, name = files[i]
    shutil.copy(src, feed / name)
    os.utime(feed / name, (base_t + i, base_t + i))


def test_mixed_writer_guards(spark, tmp_path):
    """VERDICT r08 #2 / ADVICE r08 (medium): a layout is owned by
    exactly one writer.  The stream refuses a data-bearing
    manifest-less directory (batch-built); the batch rewrite refuses a
    manifest-bearing one (stream-maintained)."""
    import pytest as _pytest

    from events_to_db_spark.etl import (
        build_landing_layout,
        maintain_landing_layout,
    )

    batch_dst = str(tmp_path / "batch_built")
    build_landing_layout(spark, SF_SMOKE, batch_dst)
    with _pytest.raises(ValueError, match="no _spark_metadata manifest"):
        maintain_landing_layout(
            spark, SF_SMOKE, batch_dst, str(tmp_path / "ckpt_refused")
        )

    feed, files, _n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    maint_dst = str(tmp_path / "maintained")
    maintain_landing_layout(
        spark, str(feed), maint_dst, str(tmp_path / "ckpt_m")
    ).awaitTermination()
    with _pytest.raises(ValueError, match="STREAM-MAINTAINED"):
        build_landing_layout(spark, SF_SMOKE, maint_dst)


def test_compaction_preserves_both_reader_classes(spark, tmp_path):
    """VERDICT r08 #1 (a): batch AND streaming readers see identical
    rows before/after compaction, the file count genuinely drops, and
    the maintenance stream RESUMES on its existing checkpoint without
    duplication (the seeded manifest ends at the old latest batch id)."""
    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )
    from events_to_db_spark.etl import _landing_data_files
    from events_to_db_spark.streaming.sources import landing_events_stream

    feed, files, n, base_t = _drip_feed(spark, tmp_path, n_chunks=3)
    dst = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    for i in range(2):
        _land_chunk(feed, files, i, base_t)
        maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    before_rows = sorted(
        r["event_id"] for r in load_landing(spark, dst).select("event_id").collect()
    )
    files_before = len(_landing_data_files(dst))

    rep = compact_landing_layout(spark, dst)
    assert rep["files_after"] < files_before == rep["files_before"]
    assert rep["rows"] == len(before_rows)

    after_rows = sorted(
        r["event_id"] for r in load_landing(spark, dst).select("event_id").collect()
    )
    assert after_rows == before_rows  # batch reader identical

    s = landing_events_stream(spark, dst, max_files_per_trigger=100000)
    q = (
        s.writeStream.format("memory")
        .queryName("t_compact_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_reader"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["event_id"]
        for r in spark.sql("select event_id from t_compact_stream").collect()
    )
    assert got == before_rows  # streaming reader identical

    # resume on the SAME checkpoint: only the new chunk is appended
    _land_chunk(feed, files, 2, base_t)
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    land = load_landing(spark, dst)
    assert land.count() == n
    assert land.select("event_id").distinct().count() == n


def test_retention_cut_drops_date_partitions(spark, tmp_path):
    """VERDICT r08 #1 (b): a retention cut genuinely removes aged
    ``event_date=`` directories and the manifest lists only retained
    files (manifest-trusting readers agree with the directory)."""
    import os

    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )

    feed, files, _n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    for i in range(2):
        _land_chunk(feed, files, i, base_t)
    dst = str(tmp_path / "landing_ret")
    ckpt = str(tmp_path / "ckpt_ret")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    cut = "2024-01-15"
    want = load_landing(spark, dst).filter(
        F.col("event_date") >= F.lit(cut).cast("date")
    )
    want_rows = sorted(r["event_id"] for r in want.select("event_id").collect())
    assert want_rows and len(want_rows) < load_landing(spark, dst).count()

    rep = compact_landing_layout(spark, dst, retain_min_date=cut)
    assert rep["rows"] == len(want_rows)
    date_dirs = [
        d for d in os.listdir(dst) if d.startswith("event_date=")
    ]
    assert date_dirs and all(
        d.split("=")[1] >= cut for d in date_dirs
    ), date_dirs
    got = sorted(
        r["event_id"]
        for r in load_landing(spark, dst).select("event_id").collect()
    )
    assert got == want_rows

    import pytest as _pytest

    with _pytest.raises(ValueError, match="retain_min_date"):
        compact_landing_layout(spark, dst, retain_min_date="not-a-date")


def test_downstream_etl_consumer_survives_compaction(spark, tmp_path):
    """The documented compaction contract for DOWNSTREAM streaming
    consumers: an `events_layout: landing` config that had already
    consumed part of the layout sees the compacted files as new input
    on its next run (bounded full redelivery) and its keyed upsert
    absorbs the overlap — the table ends exactly equal to the batch
    answer over everything, no duplicates, including rows that landed
    only AFTER the compaction."""
    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
        run_etl_config,
    )
    from events_to_db_spark.session import load_table
    from events_to_db_spark.streaming.sink import read_sink_table

    feed, files, n, base_t = _drip_feed(spark, tmp_path, n_chunks=3)
    dst = str(tmp_path / "landing_ds")
    ckpt = str(tmp_path / "ckpt_ds")
    for i in range(2):
        _land_chunk(feed, files, i, base_t)
        maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    cfg = {
        "events": dst,
        "events_layout": "landing",
        "db": str(tmp_path / "ds.db"),
        "checkpoints": str(tmp_path / "ckpt_ds_etl"),
        "max_files_per_trigger": 100000,
        "tables": [{"table": "copy_all", "query": "FROM allEvents"}],
    }
    for q in set(run_etl_config(spark, cfg).values()):
        q.awaitTermination()
    assert len(read_sink_table(cfg["db"], "copy_all")) == load_landing(
        spark, dst
    ).count()

    compact_landing_layout(spark, dst)
    _land_chunk(feed, files, 2, base_t)
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    for q in set(run_etl_config(spark, cfg).values()):
        q.awaitTermination()
    got = read_sink_table(cfg["db"], "copy_all")
    assert len(got) == n  # redelivery absorbed, new chunk included
    assert len(set(got["event_id"])) == n
    want = sorted(
        r["event_id"]
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_id")
        .collect()
    )
    assert sorted(got["event_id"]) == want


def test_compaction_failure_leaves_old_root_untouched(
    spark, tmp_path, monkeypatch
):
    """VERDICT r08 #1 (c): a failure during the rewrite (simulated at
    the tmp-root write) leaves the old root byte-identical — the swap
    only happens after a fully-committed tmp write."""
    from pyspark.sql.readwriter import DataFrameWriter

    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )
    from events_to_db_spark.etl import _landing_data_files

    feed, files, _n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    dst = str(tmp_path / "landing_fail")
    maintain_landing_layout(
        spark, str(feed), dst, str(tmp_path / "ckpt_fail")
    ).awaitTermination()
    snapshot = sorted(str(p) for p in _landing_data_files(dst))
    n_before = load_landing(spark, dst).count()

    def boom(self, path, *a, **kw):
        raise RuntimeError("simulated write failure")

    monkeypatch.setattr(DataFrameWriter, "parquet", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated"):
        compact_landing_layout(spark, dst)
    monkeypatch.undo()

    assert sorted(str(p) for p in _landing_data_files(dst)) == snapshot
    assert load_landing(spark, dst).count() == n_before
    # r10: a SOFT failure self-cleans (tmp + lock removed) so an
    # immediate retry succeeds with no manual cleanup — only a hard
    # crash leaves artifacts for the refuse-with-remedy path
    assert not (tmp_path / "landing_fail.compact-tmp").exists()
    assert not (tmp_path / "landing_fail" / "_compaction.lock").exists()
    rep = compact_landing_layout(spark, dst)
    assert rep["rows"] == n_before


def test_feed_schema_guard_refuses_evolution(spark, tmp_path):
    """r9 schema-evolution guard: a feed file with an EXTRA column is
    refused (the fixed-schema stream would silently drop it), a feed
    file MISSING an envelope column is refused (silent NULLs), and
    allow_feed_extra_columns=True starts anyway — with the extra
    column demonstrably dropped from the landed layout (the
    acknowledged behavior, pinned so it stays acknowledged)."""
    import os
    import pytest as _pytest

    from events_to_db_spark.etl import (
        load_landing,
        maintain_landing_layout,
    )
    from events_to_db_spark.session import load_table

    ev = load_table(spark, SF_SMOKE, "events").limit(50)

    evolved = tmp_path / "feed_extra"
    ev.withColumn("new_col", F.lit(1)).coalesce(1).write.parquet(
        str(evolved)
    )
    with _pytest.raises(ValueError, match="new_col"):
        maintain_landing_layout(
            spark, str(evolved), str(tmp_path / "d1"), str(tmp_path / "c1")
        )

    shrunk = tmp_path / "feed_missing"
    ev.drop("props").coalesce(1).write.parquet(str(shrunk))
    with _pytest.raises(ValueError, match="missing envelope column"):
        maintain_landing_layout(
            spark, str(shrunk), str(tmp_path / "d2"), str(tmp_path / "c2")
        )

    dst = str(tmp_path / "d3")
    maintain_landing_layout(
        spark,
        str(evolved),
        dst,
        str(tmp_path / "c3"),
        allow_feed_extra_columns=True,
    ).awaitTermination()
    landed = load_landing(spark, dst)
    assert "new_col" not in landed.columns
    assert landed.count() == 50


def test_feed_schema_guard_checks_newest_files(spark, tmp_path):
    """Evolution arriving LATER in a healthy feed is still caught on
    the next (re)start: the guard reads the newest footers by mtime —
    the same ordering the streaming source consumes in."""
    import os
    import time
    import pytest as _pytest

    from events_to_db_spark.etl import maintain_landing_layout
    from events_to_db_spark.session import load_table

    ev = load_table(spark, SF_SMOKE, "events").limit(20)
    feed = tmp_path / "feed"
    feed.mkdir()
    w0 = tmp_path / "w0"
    ev.coalesce(1).write.parquet(str(w0))
    base_t = time.time() - 600
    for f in os.listdir(w0):
        if f.endswith(".parquet"):
            (feed / f"ok_{f}").write_bytes((w0 / f).read_bytes())
            os.utime(feed / f"ok_{f}", (base_t, base_t))

    dst, ckpt = str(tmp_path / "dst"), str(tmp_path / "ckpt")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    w1 = tmp_path / "w1"
    ev.withColumn("surprise", F.lit("x")).coalesce(1).write.parquet(str(w1))
    for f in os.listdir(w1):
        if f.endswith(".parquet"):
            (feed / f"evolved_{f}").write_bytes((w1 / f).read_bytes())
            os.utime(feed / f"evolved_{f}", (base_t + 60, base_t + 60))

    with _pytest.raises(ValueError, match="surprise"):
        maintain_landing_layout(spark, str(feed), dst, ckpt)

# --- r10: hot-partition splitting + enforced mutual exclusion ---


def _hot_feed(spark, tmp_path, mult=12, hot_mod=10):
    """A one-file feed whose rows are ~90% concentrated on ONE
    (event_date, event_type) — the skewed day×type shape VERDICT r09
    #1 says is the norm at 100 TB.  Returns (feed_dir, n_rows)."""
    from events_to_db_spark.session import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    dup = spark.range(mult).select(F.col("id").alias("dup"))
    wide = (
        ev.crossJoin(F.broadcast(dup))
        .withColumn("event_id", F.col("event_id") * mult + F.col("dup"))
        .drop("dup")
    )
    hot = wide.select(
        "event_id",
        F.expr(
            f"IF(event_id % {hot_mod} != 0,"
            " timestamp'2024-01-05 12:00:00', ts)"
        ).alias("ts"),
        "user_id",
        F.expr(
            f"IF(event_id % {hot_mod} != 0, 'purchase', event_type)"
        ).alias("event_type"),
        "value",
        "props",
    )
    feed = tmp_path / "hot_feed"
    feed.mkdir()
    w = tmp_path / "hot_w"
    hot.coalesce(1).write.parquet(str(w))
    import os
    import shutil

    for f in os.listdir(w):
        if f.endswith(".parquet"):
            shutil.copy(w / f, feed / f)
    return feed, hot.count()


def test_compaction_splits_hot_partition(spark, tmp_path):
    """VERDICT r09 #1: a Hive partition whose bytes ≫ target_bytes
    must come out of compaction as MULTIPLE bounded files (salted
    repartition + maxRecordsPerFile), not one single-task multi-GB
    file; rows stay identical through the re-seeded manifest and the
    maintenance stream still resumes cleanly."""
    import os

    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )
    from events_to_db_spark.etl import _landing_data_files

    feed, n = _hot_feed(spark, tmp_path)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    before_ids = sorted(
        r["event_id"]
        for r in load_landing(spark, dst).select("event_id").collect()
    )
    assert len(before_ids) == n

    hot_dir = (
        tmp_path / "landing" / "event_date=2024-01-05" / "event_type=purchase"
    )
    hot_bytes = sum(
        p.stat().st_size for p in hot_dir.glob("*.parquet")
    )
    target = 16 * 1024
    assert hot_bytes > 3 * target, "fixture not hot enough to prove splitting"

    rep = compact_landing_layout(spark, dst, target_bytes=target)
    assert rep["max_salt"] >= 2  # the hot partition WAS salted

    hot_files = sorted(hot_dir.glob("*.parquet"))
    assert len(hot_files) > 1, (
        "hot partition collapsed to one file — repartition on the "
        "partitionBy keys alone cannot split within a key"
    )
    # every data file stays bounded (~target; 2x slack for parquet
    # footer overhead + salt-hash imbalance)
    for p in _landing_data_files(dst):
        assert p.stat().st_size <= 2 * target, (
            f"{p} is {p.stat().st_size}B > 2x target_bytes={target}"
        )

    after_ids = sorted(
        r["event_id"]
        for r in load_landing(spark, dst).select("event_id").collect()
    )
    assert after_ids == before_ids  # manifest-trusting reader identical

    # maintenance resumes on its existing checkpoint after the split
    import time

    extra = tmp_path / "hot_w2"
    from events_to_db_spark.session import load_table

    load_table(spark, SF_SMOKE, "events").limit(7).select(
        (F.col("event_id") + 10_000_000).alias("event_id"),
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.parquet(str(extra))
    for f in os.listdir(extra):
        if f.endswith(".parquet"):
            dst_f = feed / f"late_{f}"
            dst_f.write_bytes((extra / f).read_bytes())
            os.utime(dst_f, (time.time() + 5, time.time() + 5))
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    assert load_landing(spark, dst).count() == n + 7


def test_compaction_refuses_while_maintenance_runs(spark, tmp_path):
    """VERDICT r09 #2 (enforced, not documented): a compaction started
    while the maintenance stream is ACTIVE must refuse loudly — a
    running maintainer would write into the moved-aside root or race
    the manifest re-seed.  After the stream stops, the same call
    succeeds."""
    import pytest as _pytest

    from events_to_db_spark.etl import (
        compact_landing_layout,
        maintain_landing_layout,
    )

    feed, files, _n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    # prime the layout so the live-stream compact attempt sees a layout
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    q = maintain_landing_layout(
        spark, str(feed), dst, ckpt, available_now=False
    )
    try:
        assert q.isActive
        with _pytest.raises(ValueError, match="STILL ACTIVE"):
            compact_landing_layout(spark, dst)
    finally:
        from tests.conftest import stop_query

        stop_query(q)

    rep = compact_landing_layout(spark, dst)  # stopped → allowed
    assert rep["rows"] > 0
    # no stale lock left behind in the live root
    assert not (tmp_path / "landing" / "_compaction.lock").exists()


def test_maintenance_refuses_while_compaction_in_flight(spark, tmp_path):
    """The reverse exclusion: the stream must not start over a layout
    whose compaction is in flight (lock file) or unfinished
    (.compact-tmp / .pre-compact leftovers)."""
    import shutil

    import pytest as _pytest

    from events_to_db_spark.etl import maintain_landing_layout

    feed, files, _n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    lock = tmp_path / "landing" / "_compaction.lock"
    lock.write_text("{}")
    with _pytest.raises(ValueError, match="in flight or did not finish"):
        maintain_landing_layout(spark, str(feed), dst, ckpt)
    lock.unlink()

    leftover = tmp_path / "landing.compact-tmp"
    leftover.mkdir()
    with _pytest.raises(ValueError, match="in flight or did not finish"):
        maintain_landing_layout(spark, str(feed), dst, ckpt)
    shutil.rmtree(leftover)

    # a kept .pre-compact (SUCCESSFUL compaction artifact) must NOT
    # block the resumed stream — test_compaction_preserves_both_reader_
    # classes resumes with it on disk; pinned here too
    kept = tmp_path / "landing.pre-compact"
    kept.mkdir()
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    shutil.rmtree(kept)

    # cleared → resumes normally
    _land_chunk(feed, files, 1, base_t)
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()


def test_foreign_pid_owner_blocks_compaction(spark, tmp_path):
    """A LIVE foreign-process maintainer (per _maintenance_owner.json)
    blocks compaction; a dead one is stale and ignored."""
    import json
    import os

    import pytest as _pytest

    from events_to_db_spark.etl import (
        compact_landing_layout,
        maintain_landing_layout,
    )

    feed, files, _n, base_t = _drip_feed(spark, tmp_path, n_chunks=1)
    _land_chunk(feed, files, 0, base_t)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    owner = tmp_path / "landing" / "_maintenance_owner.json"
    # pid 1 (init) is alive and not ours → refuse
    owner.write_text(
        json.dumps({"query_id": "x", "pid": 1, "checkpoint": ckpt})
    )
    with _pytest.raises(ValueError, match="still alive"):
        compact_landing_layout(spark, dst)

    # a certainly-dead pid → stale, compaction proceeds
    dead = os.fork()
    if dead == 0:
        os._exit(0)
    os.waitpid(dead, 0)
    owner.write_text(
        json.dumps({"query_id": "x", "pid": dead, "checkpoint": ckpt})
    )
    rep = compact_landing_layout(spark, dst)
    assert rep["rows"] > 0


def test_continuous_maintenance_stops_on_midrun_evolution(spark, tmp_path):
    """VERDICT r09 #3 (landing stage, mid-run): a widened feed file
    landing WHILE a continuous maintenance stream runs must stop the
    stream loudly (_schema_violation.json recorded, query stopped) —
    the fixed-schema source would otherwise drop the new column from
    every batch forever with no signal.  The next start then refuses
    via the start-time guard until the feed is fixed, and a clean
    restart clears the violation record."""
    import json
    import os
    import time

    import pytest as _pytest

    from events_to_db_spark.etl import (
        load_landing,
        maintain_landing_layout,
    )
    from events_to_db_spark.session import load_table

    ev = load_table(spark, SF_SMOKE, "events").limit(40)
    feed = tmp_path / "feed"
    feed.mkdir()
    w0 = tmp_path / "w0"
    ev.coalesce(1).write.parquet(str(w0))
    base_t = time.time() - 600
    for f in os.listdir(w0):
        if f.endswith(".parquet"):
            (feed / f"ok_{f}").write_bytes((w0 / f).read_bytes())
            os.utime(feed / f"ok_{f}", (base_t, base_t))

    dst, ckpt = str(tmp_path / "dst"), str(tmp_path / "ckpt")
    q = maintain_landing_layout(
        spark, str(feed), dst, ckpt, available_now=False
    )
    try:
        deadline = time.time() + 60
        while q.lastProgress is None and time.time() < deadline:
            time.sleep(0.3)
        assert q.lastProgress is not None, "stream never progressed"

        # evolution lands mid-run
        w1 = tmp_path / "w1"
        ev.withColumn("surprise", F.lit("x")).coalesce(1).write.parquet(
            str(w1)
        )
        for f in os.listdir(w1):
            if f.endswith(".parquet"):
                (feed / f"evolved_{f}").write_bytes((w1 / f).read_bytes())
                os.utime(
                    feed / f"evolved_{f}",
                    (time.time() + 2, time.time() + 2),
                )

        deadline = time.time() + 90
        while q.isActive and time.time() < deadline:
            time.sleep(0.5)
        assert not q.isActive, (
            "stream kept running after mid-run schema evolution"
        )
    finally:
        if q.isActive:
            from tests.conftest import stop_query

            stop_query(q)

    viol = tmp_path / "dst" / "_schema_violation.json"
    assert viol.is_file()
    assert "surprise" in json.loads(viol.read_text())["error"]

    # restart refuses while the bad file is still in the feed
    with _pytest.raises(ValueError, match="surprise"):
        maintain_landing_layout(spark, str(feed), dst, ckpt)
    assert viol.is_file()  # refusal does not clear the record

    # fix the feed → clean start clears the violation record
    for f in os.listdir(feed):
        if f.startswith("evolved_"):
            os.unlink(feed / f)
    maintain_landing_layout(
        spark, str(feed), dst, ckpt
    ).awaitTermination()
    assert not viol.exists()
    assert load_landing(spark, dst).count() >= 40


def test_landing_status_reports_lifecycle(spark, tmp_path):
    """r10 observability (maintenance side): landing_status reads the
    layout's lifecycle entirely from disk — maintained flag, sink
    frontier, file census, owner liveness, violation record, and
    in-flight/kept compaction artifacts — at every stage of the
    maintain → run-continuous → compact cycle."""
    from events_to_db_spark.etl import (
        compact_landing_layout,
        landing_status,
        maintain_landing_layout,
    )

    dst = str(tmp_path / "landing")
    assert landing_status(dst) == {"exists": False}

    feed, files, n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    ckpt = str(tmp_path / "ckpt")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    st = landing_status(dst, spark)
    assert st["exists"] and st["maintained"]
    assert st["latest_sink_batch"] >= 0
    assert st["n_data_files"] > 0 and st["total_bytes"] > 0
    assert st["n_hive_partitions"] > 0
    assert st["latest_event_date"] is not None
    assert st["latest_event_date"].startswith("2024-")
    assert st["fragmented_partitions"] == 0  # one file per partition
    # with a tiny target every multi-KB partition reads as fragmented
    assert landing_status(dst, target_bytes=64)[
        "fragmented_partitions"
    ] > 0
    assert st["owner"]["live"] is False  # availableNow run finished
    assert st["schema_violation"] is None
    assert not st["compaction_in_flight"]
    assert not st["pre_compact_kept"]

    # a RUNNING continuous maintainer reports live=True
    q = maintain_landing_layout(
        spark, str(feed), dst, ckpt, available_now=False
    )
    try:
        assert landing_status(dst, spark)["owner"]["live"] is True
        # without a session the same-process owner is honest: unknown
        assert landing_status(dst)["owner"]["live"] is None
    finally:
        from tests.conftest import stop_query

        stop_query(q)
    assert landing_status(dst, spark)["owner"]["live"] is False

    before_batch = landing_status(dst)["latest_sink_batch"]
    rep = compact_landing_layout(spark, dst)
    st2 = landing_status(dst, spark)
    assert st2["maintained"]
    assert st2["latest_sink_batch"] == before_batch == rep["latest_batch_id"]
    assert st2["pre_compact_kept"]  # the verify-then-delete artifact
    assert not st2["compaction_in_flight"]
    assert st2["owner"] is None  # owner file traveled into the aside root


def test_compaction_retention_and_hot_split_compose(spark, tmp_path):
    """Retention cut + hot-partition salting in ONE compaction call:
    aged dates drop, the retained hot partition still splits into
    bounded files, and the manifest lists exactly the retained set."""
    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )
    from events_to_db_spark.etl import _landing_data_files

    feed, n = _hot_feed(spark, tmp_path)  # hot on 2024-01-05
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    land = load_landing(spark, dst)
    keep_ids = sorted(
        r["event_id"]
        for r in land.filter(
            F.col("event_date") >= F.lit("2024-01-05").cast("date")
        )
        .select("event_id")
        .collect()
    )
    assert 0 < len(keep_ids) < n  # the cut is real

    target = 16 * 1024
    rep = compact_landing_layout(
        spark, dst, retain_min_date="2024-01-05", target_bytes=target
    )
    assert rep["max_salt"] >= 2
    assert rep["rows"] == len(keep_ids)

    after = load_landing(spark, dst)
    assert sorted(
        r["event_id"] for r in after.select("event_id").collect()
    ) == keep_ids
    assert after.agg(F.min("event_date")).collect()[0][0].isoformat() >= (
        "2024-01-05"
    )
    hot_dir = (
        tmp_path / "landing" / "event_date=2024-01-05" / "event_type=purchase"
    )
    assert len(list(hot_dir.glob("*.parquet"))) > 1
    for p in _landing_data_files(dst):
        assert p.stat().st_size <= 2 * target


def test_incremental_compaction_links_untouched_partitions(spark, tmp_path):
    """r10 incremental compaction — the 100 TB invocation: only
    FRAGMENTED partitions are rewritten (partition-pruned read); the
    already-compact ones move by HARD LINK (same inode — zero bytes
    copied), committed files only (a planted orphan in a linked
    partition must NOT come through), rows identical end-to-end, and
    the maintenance stream still resumes."""
    import os
    import shutil
    import time

    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )
    from events_to_db_spark.session import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    n = ev.count()
    early = ev.filter(F.col("ts") < "2024-01-16")
    late = ev.filter(F.col("ts") >= "2024-01-16")
    feed = tmp_path / "feed"
    feed.mkdir()
    base_t = time.time() - 600

    def land(df, tag, t):
        w = tmp_path / f"w_{tag}"
        df.coalesce(1).write.parquet(str(w))
        for f in os.listdir(w):
            if f.endswith(".parquet"):
                shutil.copy(w / f, feed / f"{tag}_{f}")
                os.utime(feed / f"{tag}_{f}", (t, t))

    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    # phase 1: EARLY dates land in 3 sub-chunks -> fragmented partitions
    for i in range(3):
        land(early.filter(F.col("event_id") % 3 == i), f"a{i}", base_t + i)
        maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    rep1 = compact_landing_layout(spark, dst, incremental=True)
    assert rep1["partitions_rewritten"] > 0
    shutil.rmtree(rep1["aside_dir"])  # operator's verify-then-delete
    n_early = load_landing(spark, dst).count()
    assert n_early == early.count()

    # phase 2: LATE dates land in 3 sub-chunks; early partitions are
    # untouched (1 compacted file each) and must be LINKED, not read
    for i in range(3):
        land(late.filter(F.col("event_id") % 3 == i), f"b{i}", base_t + 10 + i)
        maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    # capture an early partition's file inode to prove the zero-copy
    early_dirs = sorted(
        d
        for d in (tmp_path / "landing").glob("event_date=2024-01-0*")
        if d.is_dir()
    )
    assert early_dirs
    sample = sorted(early_dirs[0].rglob("*.parquet"))[0]
    sample_rel = sample.relative_to(tmp_path / "landing")
    sample_ino = sample.stat().st_ino

    # plant an ORPHAN (on disk, not in the manifest) in that partition
    orphan = sample.parent / "orphan-not-committed.parquet"
    shutil.copy(sample, orphan)

    rep2 = compact_landing_layout(spark, dst, incremental=True)
    shutil.rmtree(rep2["aside_dir"])
    assert rep2["partitions_linked"] > 0
    assert rep2["partitions_rewritten"] > 0
    assert rep2["bytes_linked"] > 0
    # linked file is the SAME inode (hard link, zero bytes moved)
    linked = tmp_path / "landing" / sample_rel
    assert linked.is_file() and linked.stat().st_ino == sample_ino
    # the orphan did not come through
    assert not (tmp_path / "landing" / sample_rel.parent
                / "orphan-not-committed.parquet").exists()

    land_df = load_landing(spark, dst)
    assert land_df.count() == n
    assert land_df.select("event_id").distinct().count() == n

    # steady state: a third incremental run links (almost) everything
    rep3 = compact_landing_layout(spark, dst, incremental=True)
    shutil.rmtree(rep3["aside_dir"])
    assert rep3["partitions_rewritten"] == 0
    assert rep3["partitions_linked"] == rep2["partitions_linked"] + (
        rep2["partitions_rewritten"]
    )
    assert rep3["bytes_rewritten"] == 0
    assert load_landing(spark, dst).count() == n

    # the maintenance stream still resumes on its checkpoint
    land(ev.limit(0), "noop", base_t + 30)  # header-only file: no rows
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    assert load_landing(spark, dst).count() == n


def test_build_landing_layout_splits_hot_partition(spark, tmp_path):
    """r10: the one-shot batch build gets the same write-side skew fix
    as the compactor — a hot (date, type) comes out as multiple
    bounded files (not one single-task file, not tasks×partitions
    confetti), sized by one cheap counting aggregate + the source's
    bytes/row."""
    from events_to_db_spark.etl import build_landing_layout, load_landing
    from events_to_db_spark.etl import _landing_data_files
    from events_to_db_spark.session import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    dup = spark.range(12).select(F.col("id").alias("dup"))
    hot = (
        ev.crossJoin(F.broadcast(dup))
        .withColumn("event_id", F.col("event_id") * 12 + F.col("dup"))
        .drop("dup")
        .select(
            "event_id",
            F.expr(
                "IF(event_id % 10 != 0,"
                " timestamp'2024-01-05 12:00:00', ts)"
            ).alias("ts"),
            "user_id",
            F.expr(
                "IF(event_id % 10 != 0, 'purchase', event_type)"
            ).alias("event_type"),
            "value",
            "props",
        )
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    hot.coalesce(2).write.parquet(str(sf / "events.parquet"))
    n_src = hot.count()

    dst = str(tmp_path / "landing")
    target = 16 * 1024
    n = build_landing_layout(spark, str(sf), dst, target_bytes=target)
    assert n == n_src

    hot_dir = (
        tmp_path / "landing" / "event_date=2024-01-05" / "event_type=purchase"
    )
    hot_files = sorted(hot_dir.glob("*.parquet"))
    assert len(hot_files) > 1, "hot partition collapsed to one file"
    for p in _landing_data_files(dst):
        assert p.stat().st_size <= 2 * target, (
            f"{p} is {p.stat().st_size}B > 2x target_bytes={target}"
        )
    land = load_landing(spark, dst)
    assert sorted(
        r["event_id"] for r in land.select("event_id").collect()
    ) == sorted(r["event_id"] for r in hot.select("event_id").collect())


def test_sparse_manifest_seed_supports_sink_log_compaction(spark, tmp_path):
    """r10: the re-seeded manifest is SPARSE — one full-union entry
    (the latest interval-aligned .compact) + empty deltas up to the
    old latest batch id, NOT a contiguous-from-zero rebuild (O(total
    stream batches) files per compaction: a year-old 1-batch/min
    stream would rewrite ~500k manifest files per run).  Proven
    against the consumer that matters: the maintenance stream resumes
    on the sparse seed, crosses the NEXT compact boundary, and the
    sink's OWN log compaction (which re-reads every delta since the
    last compact) succeeds; batch readers stay exact throughout."""
    import os
    import shutil
    import time

    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )
    from events_to_db_spark.session import load_table

    interval = int(
        spark.conf.get("spark.sql.streaming.fileSink.log.compactInterval")
    )
    assert interval == 10  # Spark default; the math below assumes it

    ev = load_table(spark, SF_SMOKE, "events")
    n = ev.count()
    feed = tmp_path / "feed"
    feed.mkdir()
    base_t = time.time() - 600

    def land_slices(lo, hi, tag, t0):
        for i in range(lo, hi):
            w = tmp_path / f"w_{tag}{i}"
            ev.filter(F.col("event_id") % 22 == i).coalesce(1).write.parquet(
                str(w)
            )
            for f in os.listdir(w):
                if f.endswith(".parquet"):
                    shutil.copy(w / f, feed / f"{tag}{i:02d}_{f}")
                    os.utime(feed / f"{tag}{i:02d}_{f}", (t0 + i, t0 + i))

    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    # 12 files, ONE availableNow run at max_files_per_trigger=1:
    # batches 0..11 -> the sink's own 9.compact exists + deltas 10, 11
    land_slices(0, 12, "a", base_t)
    maintain_landing_layout(
        spark, str(feed), dst, ckpt, max_files_per_trigger=1
    ).awaitTermination()
    mdir = tmp_path / "landing" / "_spark_metadata"
    assert "9.compact" in {p.name for p in mdir.iterdir()}

    rep = compact_landing_layout(spark, dst)
    assert rep["latest_batch_id"] == 11
    # SPARSE seed: exactly {9.compact, 10, 11} — no 0..8 rebuild
    assert {p.name for p in mdir.iterdir()} == {"9.compact", "10", "11"}
    part_rows = load_landing(spark, dst).count()
    assert part_rows == ev.filter(F.col("event_id") % 22 < 12).count()

    # resume: 10 more files at 1 file/batch -> batches 12..21 cross
    # the NEXT boundary; the sink's own log compaction writes
    # 19.compact by re-reading the deltas since 9 (incl. our seeds)
    land_slices(12, 22, "b", base_t + 100)
    maintain_landing_layout(
        spark, str(feed), dst, ckpt, max_files_per_trigger=1
    ).awaitTermination()
    names = {p.name for p in mdir.iterdir()}
    assert "19.compact" in names, names
    land = load_landing(spark, dst)
    assert land.count() == n
    assert land.select("event_id").distinct().count() == n


def test_compaction_cluster_by_sorts_within_files(spark, tmp_path):
    """r10 cluster_by: the rewrite sorts each task's rows by the
    cluster columns within (date, type), so every output file is
    user_id-monotonic — the property that makes parquet row-group
    min/max stats prune point lookups inside files.  Rows identical
    with or without clustering."""
    import pyarrow.parquet as pq

    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )
    from events_to_db_spark.etl import _landing_data_files

    feed, files, n, base_t = _drip_feed(spark, tmp_path, n_chunks=3)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    for i in range(3):
        _land_chunk(feed, files, i, base_t)
        maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    before_ids = sorted(
        r["event_id"]
        for r in load_landing(spark, dst).select("event_id").collect()
    )

    rep = compact_landing_layout(spark, dst, cluster_by=["user_id"])
    assert rep["partitions_rewritten"] > 0

    checked = 0
    for p in _landing_data_files(dst):
        if not p.name.endswith(".parquet"):
            continue
        col = pq.read_table(str(p), columns=["user_id"])["user_id"]
        vals = col.to_pylist()
        assert vals == sorted(vals), f"{p} is not user_id-monotonic"
        checked += 1
    assert checked > 0

    after_ids = sorted(
        r["event_id"]
        for r in load_landing(spark, dst).select("event_id").collect()
    )
    assert after_ids == before_ids


def test_fragmentation_criterion_never_churns():
    """Hypothesis pin for the incremental compactor's stability: the
    compactor's own output — up to 2×⌈bytes/target⌉ files (salt +
    maxRecordsPerFile over-splitting), each ≤ target — must NEVER be
    reclassified as fragmented (else hot partitions rewrite every
    run), while one file beyond that bound always is."""
    import os

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from events_to_db_spark.etl import _fragmented_files

    class _F:
        def __init__(self, size):
            self._s = int(size)

        def stat(self):
            return os.stat_result((0, 0, 0, 0, 0, 0, self._s, 0, 0, 0))

    @settings(max_examples=300, deadline=None)
    @given(
        # k (files a fresh compaction would produce) bounded so the
        # synthetic file LISTS stay small — the invariant is about
        # counts and sizes, not about materializing 10^12 entries
        k=st.integers(1, 64),
        target=st.integers(1024, 10**9),
        over=st.floats(1.0, 2.0),
        frac=st.floats(0.001, 1.0),
    )
    def prop(k, target, over, frac):
        # total bytes that yield exactly k = ceil(total/target)
        total = max(1, (k - 1) * target + int(max(1, frac * target)))
        assert (total + target - 1) // target == k
        def split_exact(n):
            # n files summing EXACTLY to total (like the real writer)
            per, rem = divmod(total, n)
            return [_F(per + 1)] * rem + [_F(per)] * (n - rem)

        n_files = max(1, min(int(k * over), 2 * k))
        fs = split_exact(n_files)
        assert not _fragmented_files(fs, target), (
            total,
            target,
            n_files,
        )
        # …but the SAME bytes split one file past the 2x bound always
        # reclassifies (more files for the same data = fragmentation)
        worse = split_exact(max(2, 2 * k) + 1)
        assert _fragmented_files(worse, target)

    prop()


def test_compaction_refuses_on_census_manifest_divergence(
    spark, tmp_path, monkeypatch
):
    """r10 guard: if the manifest's committed paths match NONE of the
    on-disk files (path-normalization divergence — symlinked or
    relative roots), compaction must refuse loudly instead of
    rewriting an EMPTY layout and stranding all data in .pre-compact."""
    import pytest as _pytest

    from events_to_db_spark import etl as etl_mod
    from events_to_db_spark.etl import (
        compact_landing_layout,
        load_landing,
        maintain_landing_layout,
    )

    feed, files, _n, base_t = _drip_feed(spark, tmp_path, n_chunks=1)
    _land_chunk(feed, files, 0, base_t)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    n = load_landing(spark, dst).count()

    monkeypatch.setattr(
        etl_mod, "_committed_files", lambda d: {"/nowhere/else.parquet"}
    )
    with _pytest.raises(ValueError, match="match NONE"):
        compact_landing_layout(spark, dst)
    monkeypatch.undo()

    # untouched layout; the real census still compacts fine
    assert load_landing(spark, dst).count() == n
    rep = compact_landing_layout(spark, dst)
    assert rep["rows"] == n


def test_compaction_unescapes_hive_partition_names(spark, tmp_path):
    """ADVICE r10 (medium): Spark Hive-escapes special characters in
    partition dir names (space → %20, ':' → %3A, …).  The incremental
    compactor's rewrite predicate and salt map are built from parsed
    dir strings — with the RAW (escaped) value the predicate matches
    zero rows: the partition is classified rewrite yet none of its
    rows are rewritten, and after the swap those committed rows exist
    only in .pre-compact.  Pin: every row of an escaped-type partition
    survives an incremental compaction, rewritten AND hard-linked
    classes both, with the on-disk escaping preserved."""
    from events_to_db_spark.etl import compact_landing_layout
    from events_to_db_spark.session import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .limit(400)
        .withColumn(
            "event_type", F.concat(F.col("event_type"), F.lit(" v:2"))
        )
        .withColumn("event_date", F.to_date("ts"))
    )
    n = ev.count()
    dst = tmp_path / "escaped_layout"
    # fragmented: many round-robin tasks → many files per partition
    ev.repartition(8).write.partitionBy("event_date", "event_type").parquet(
        str(dst)
    )
    # one extra ALREADY-COMPACT partition (single file) to exercise the
    # hard-link class under escaping too
    extra = (
        load_table(spark, SF_SMOKE, "events")
        .limit(30)
        .withColumn("event_id", F.col("event_id") + 9_000_000)
        .withColumn("event_type", F.lit("linked type"))
        .withColumn("event_date", F.lit("2030-01-01").cast("date"))
    )
    n_extra = extra.count()
    extra.coalesce(1).write.mode("append").partitionBy(
        "event_date", "event_type"
    ).parquet(str(dst))

    # the escaping is real on disk (Spark 4 escapes ':' → %3A; spaces
    # stay literal — both classes are covered by the value " v:2")
    assert any(
        "%3A" in str(p) for p in dst.rglob("event_type=*") if p.is_dir()
    ), sorted(str(p) for p in dst.rglob("event_type=*"))

    before_ids = {
        r["event_id"] for r in spark.read.parquet(str(dst)).collect()
    }
    assert len(before_ids) == n + n_extra

    rep = compact_landing_layout(
        spark, str(dst), incremental=True, target_bytes=256 * 1024
    )
    assert rep["partitions_rewritten"] > 0
    assert rep["partitions_linked"] >= 1

    after = spark.read.parquet(str(dst))
    after_ids = {r["event_id"] for r in after.collect()}
    # THE pin: zero silent loss — every committed row is still visible
    assert after_ids == before_ids
    # values round-trip unescaped through the rewrite
    assert (
        after.filter(F.col("event_type").contains(" v:2")).count() == n
    )
    # the linked partition kept its (escaped) dir name readable
    assert (
        after.filter(F.col("event_type") == "linked type").count()
        == n_extra
    )


def test_aggregate_consumer_gates_compaction(spark, tmp_path):
    """VERDICT r10 #1 (top item): compaction's full redelivery is only
    absorbed by KEYED upserts — an aggregate-mode table over
    events_layout: landing would ADD every redelivered row to its
    complete-mode fold, silently double-counting the table.  Pin the
    whole contract: the fold registers itself beside the layout,
    compaction REFUSES while its checkpoint (= fold state) exists,
    deleting the checkpoint is the acknowledgement, and the recomputed
    fold over the compacted layout EQUALS the batch recompute."""
    import shutil
    from pathlib import Path

    from events_to_db_spark.etl import (
        compact_landing_layout,
        deregister_aggregate_consumer,
        landing_status,
        maintain_landing_layout,
        run_etl_config,
    )
    from events_to_db_spark.streaming.sink import read_sink_table

    AGG_QUERY = (
        "FROM 'type:purchase' FILTER _.k >= 50"
        " AGGREGATE { n: COUNT(), total: SUM(_.k) }"
    )

    feed, files, n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    dst, ckpt_m = str(tmp_path / "landing"), str(tmp_path / "ckpt_m")
    maintain_landing_layout(spark, str(feed), dst, ckpt_m).awaitTermination()

    cfg = {
        "events": dst,
        "events_layout": "landing",
        "db": str(tmp_path / "agg.db"),
        "checkpoints": str(tmp_path / "ckpt_cfg"),
        "tables": [
            {"table": "purchase_fold", "query": AGG_QUERY,
             "mode": "aggregate"},
        ],
    }

    def drain():
        for q in run_etl_config(spark, cfg).values():
            q.awaitTermination()

    drain()
    partial = read_sink_table(cfg["db"], "purchase_fold")
    assert len(partial) == 1 and int(partial["n"][0]) > 0
    assert landing_status(dst)["aggregate_consumers"] == ["purchase_fold"]

    # the refusal, both before and after the fold advances
    with pytest.raises(ValueError, match="DOUBLE-COUNT"):
        compact_landing_layout(spark, dst)

    _land_chunk(feed, files, 1, base_t)
    maintain_landing_layout(spark, str(feed), dst, ckpt_m).awaitTermination()
    drain()
    got = read_sink_table(cfg["db"], "purchase_fold")
    want = run_aql(with_tags(load_landing(spark, dst)), AGG_QUERY).collect()[0]
    assert int(got["n"][0]) == want["n"]
    with pytest.raises(ValueError, match="DOUBLE-COUNT"):
        compact_landing_layout(spark, dst)

    # deleting the fold's checkpoint IS the acknowledgement: the entry
    # self-cleans and compaction proceeds
    shutil.rmtree(Path(cfg["checkpoints"]) / "purchase_fold")
    rep = compact_landing_layout(spark, dst)
    assert rep["rows"] == n
    assert landing_status(dst)["aggregate_consumers"] == []

    # the recomputed fold over the compacted layout equals the batch
    # recompute — the redelivery was NOT double-counted
    drain()
    after = read_sink_table(cfg["db"], "purchase_fold")
    want2 = run_aql(with_tags(load_landing(spark, dst)), AGG_QUERY).collect()[0]
    assert int(after["n"][0]) == want2["n"] == want["n"]
    assert float(after["total"][0]) == pytest.approx(want2["total"])

    # retired-consumer path: the next run re-registered the fold;
    # deregistering removes the entry without touching its state
    assert landing_status(dst)["aggregate_consumers"] == ["purchase_fold"]
    deregister_aggregate_consumer(dst, "purchase_fold")
    assert landing_status(dst)["aggregate_consumers"] == []


def test_lifecycle_refuses_non_local_roots(spark, tmp_path):
    """VERDICT r10 #2: the lifecycle module's census/lock/swap/link
    primitives are POSIX-local — none exist on object storage (S3 has
    no rename atomicity or inodes; a bucket is not iterdir-able).
    Every lifecycle verb must refuse a non-file: scheme LOUDLY with
    the remedy, and normalize a file: URI to its local path."""
    from events_to_db_spark.etl import (
        build_landing_layout,
        compact_landing_layout,
        landing_status,
        maintain_landing_layout,
    )

    for call in (
        lambda: compact_landing_layout(spark, "s3://bucket/layout"),
        lambda: compact_landing_layout(spark, "hdfs://nn/layout"),
        lambda: maintain_landing_layout(
            spark, "s3a://bucket/feed", str(tmp_path / "d"), str(tmp_path / "c")
        ),
        lambda: maintain_landing_layout(
            spark, str(tmp_path), "abfs://c@a.dfs/layout", str(tmp_path / "c")
        ),
        lambda: build_landing_layout(spark, SF_SMOKE, "gs://bucket/layout"),
        lambda: landing_status("s3://bucket/layout"),
    ):
        with pytest.raises(ValueError, match="not a local filesystem path"):
            call()

    # file: URIs normalize to the local path (Spark interop)
    land = tmp_path / "file_uri_layout"
    ev = load_table(spark, SF_SMOKE, "events").limit(50)
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date", "event_type"
    ).parquet(str(land))
    st = landing_status(land.as_uri())  # file:///…
    assert st["exists"] and st["n_data_files"] > 0
    rep = compact_landing_layout(spark, "file:" + str(land))
    assert rep["rows"] == 50


def test_evolve_landing_schema_end_to_end(spark, tmp_path):
    """VERDICT r10 #3: r10 made schema evolution LOUD everywhere; this
    pins the supported path to actually EVOLVE.  Widen the feed by one
    nullable column → the guard refuses with the remedy → run
    evolve_landing_schema → maintenance resumes on its EXISTING
    checkpoint with the widened read schema → the layout and every
    reader carry the column (old rows NULL) → the downstream config
    table gains it via ALTER TABLE ADD COLUMN under allow_widening —
    zero rows lost at any stage."""
    import os
    import shutil
    import time

    from events_to_db_spark.etl import (
        evolve_landing_schema,
        landing_status,
        maintain_landing_layout,
        run_etl_config,
    )
    from events_to_db_spark.streaming.sink import read_sink_table

    feed, files, n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt_m")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    n0 = load_landing(spark, dst).count()
    assert 0 < n0 < n

    cfg = {
        "events": dst,
        "events_layout": "landing",
        "db": str(tmp_path / "evo.db"),
        "checkpoints": str(tmp_path / "ckpt_cfg"),
        "tables": [
            {
                "table": "raw_copy",
                "allow_widening": True,
                "query": "FROM allEvents SELECT { v: _.k }",
            }
        ],
    }

    def drain():
        for q in run_etl_config(spark, cfg).values():
            q.awaitTermination()

    drain()
    t0 = read_sink_table(cfg["db"], "raw_copy")
    assert len(t0) == n0 and "score" not in t0.columns

    # the feed WIDENS: chunk 1 lands carrying a new payload column
    wide = (
        spark.read.parquet(str(files[1][0].parent))
        .withColumn("score", F.col("value") * 2)
    )
    wdir = tmp_path / "wide_chunk"
    wide.coalesce(1).write.parquet(str(wdir))
    for f in os.listdir(wdir):
        if f.endswith(".parquet"):
            p = os.path.join(str(feed), f"chunk1_wide_{f}")
            shutil.copy(os.path.join(wdir, f), p)
            os.utime(p, (base_t + 1, base_t + 1))

    # pre-evolution: the guard refuses, naming the verb as the remedy
    with pytest.raises(ValueError, match="evolve_landing_schema"):
        maintain_landing_layout(spark, str(feed), dst, ckpt)

    # invalid adds refuse at registration
    for bad in (
        {"event_id": "bigint"},   # envelope column
        {"event_date": "date"},   # partition column
        {"bad-name": "bigint"},   # not an identifier
        {"score": "not a type"},  # unparseable DDL
    ):
        with pytest.raises(ValueError):
            evolve_landing_schema(spark, dst, bad)

    got = evolve_landing_schema(spark, dst, {"score": "double"})
    assert got["extra_columns"] == [("score", "double")]
    # idempotent re-registration; type migration refuses
    evolve_landing_schema(spark, dst, {"score": "double"})
    with pytest.raises(ValueError, match="TYPE MIGRATION"):
        evolve_landing_schema(spark, dst, {"score": "string"})
    assert landing_status(dst)["extra_columns"] == [("score", "double")]

    # the stream RESUMES on its existing checkpoint with the widened
    # schema — only the new file is read
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    land = load_landing(spark, dst)
    assert "score" in land.columns
    assert land.count() == n  # zero rows lost
    assert land.filter(F.col("score").isNull()).count() == n0
    new_rows = land.filter(F.col("score").isNotNull())
    assert new_rows.count() == n - n0
    assert (
        new_rows.filter(F.col("score") != F.col("value") * 2).count() == 0
    )

    # downstream: the operator edits the table's SELECT to pick up the
    # evolved column (addressed as a frame column via the registered
    # name — run_aql column_fields); the config stream widens and the
    # upsert sink ALTERs under allow_widening
    cfg["tables"][0]["query"] = (
        "FROM allEvents SELECT { v: _.k, score: _.score }"
    )
    drain()
    t1 = read_sink_table(cfg["db"], "raw_copy")
    assert "score" in t1.columns
    assert len(t1) == n and t1["event_id"].nunique() == n
    assert int(t1["score"].notna().sum()) == n - n0


def test_rotate_aside_closes_the_compaction_loop(spark, tmp_path):
    """VERDICT r10 #5: repeated --compact runs used to refuse until
    the operator hand-deleted .pre-compact.  rotate_compaction_aside
    verifies (footer row counts: live layout >= aside committed) and
    deletes it; the CLI's --rotate-aside runs that first, so a cron
    loop of incremental compactions needs no manual step.  When rows
    exist ONLY in the aside, rotation refuses and keeps it."""
    import json

    from events_to_db_spark.etl import (
        compact_landing_layout,
        main,
        maintain_landing_layout,
        rotate_compaction_aside,
    )

    feed, files, n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt_m")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    rep1 = compact_landing_layout(spark, dst)
    aside = tmp_path / "landing.pre-compact"
    assert aside.is_dir()

    # more feed lands; maintenance resumes over the kept aside
    _land_chunk(feed, files, 1, base_t)
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    # a bare re-compaction still refuses on the kept aside
    with pytest.raises(ValueError, match="already exists"):
        compact_landing_layout(spark, dst)

    # the CLI loop: rotate (verify+delete run-1 aside), then compact
    cfg = {
        "events": dst,
        "events_layout": "landing",
        "db": str(tmp_path / "x.db"),
        "checkpoints": str(tmp_path / "ckpt_cfg"),
        "tables": [{"table": "raw_copy"}],
    }
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps(cfg))
    rc = main([str(cfgp), "--compact", "--incremental", "--rotate-aside"])
    assert rc == 0
    assert aside.is_dir()  # the NEW aside from this run
    assert load_landing(spark, dst).count() == n
    rep2 = rotate_compaction_aside(dst)  # and it verifies clean
    assert not aside.exists()
    assert rep2["rows_current"] == n >= rep2["rows_aside_committed"]

    # rows-only-in-aside refuses: build a richer aside by hand
    import shutil as _sh

    land2 = tmp_path / "l2"
    ev = load_table(spark, SF_SMOKE, "events").limit(100)
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date", "event_type"
    ).parquet(str(land2))
    _sh.copytree(land2, tmp_path / "l2.pre-compact")
    victim = next(p for p in land2.rglob("*.parquet"))
    victim.unlink()
    with pytest.raises(ValueError, match="ONLY in the aside"):
        rotate_compaction_aside(str(land2))
    assert (tmp_path / "l2.pre-compact").is_dir()  # kept for forensics


def test_compaction_materializes_evolution_and_keeps_marker(spark, tmp_path):
    """r11 follow-through: a compaction of an EVOLVED layout reads
    through load_landing (mergeSchema + typed-NULL fill), so its
    rewrite materializes the evolved column into EVERY data file, and
    the _layout_schema.json registration survives the atomic swap
    (columns evolved later still need it).  Also drives the CLI
    --evolve-schema verb end-to-end."""
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    from events_to_db_spark.etl import (
        compact_landing_layout,
        main,
        maintain_landing_layout,
    )

    feed, files, n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt_m")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    n0 = load_landing(spark, dst).count()

    cfg = {
        "events": dst,
        "events_layout": "landing",
        "db": str(tmp_path / "x.db"),
        "checkpoints": str(tmp_path / "c"),
        "tables": [{"table": "raw_copy"}],
    }
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps(cfg))
    assert main([str(cfgp), "--evolve-schema", "score:double"]) == 0

    # widened chunk 1 lands and is maintained in
    wide = (
        spark.read.parquet(str(files[1][0].parent))
        .withColumn("score", F.col("value") * 3)
    )
    wdir = tmp_path / "wide"
    wide.coalesce(1).write.parquet(str(wdir))
    for f in os.listdir(wdir):
        if f.endswith(".parquet"):
            p = os.path.join(str(feed), f"c1w_{f}")
            shutil.copy(os.path.join(wdir, f), p)
            os.utime(p, (base_t + 1, base_t + 1))
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()

    # pre-compaction: files are MIXED (old ones lack the column)
    from events_to_db_spark.etl import _landing_data_files

    with_col = [
        p
        for p in _landing_data_files(dst)
        if "score" in pq.read_schema(str(p)).names
    ]
    assert 0 < len(with_col) < len(_landing_data_files(dst))

    rep = compact_landing_layout(spark, dst)
    assert rep["rows"] == n
    # post-compaction: EVERY data file carries the evolved column
    after = _landing_data_files(dst)
    assert after and all(
        "score" in pq.read_schema(str(p)).names for p in after
    )
    # and a PLAIN read (no mergeSchema) now sees it, values intact
    plain = spark.read.parquet(dst)
    assert "score" in plain.columns
    assert plain.filter(F.col("score").isNotNull()).count() == n - n0

    # the registration survived the swap: a later evolution stacks
    assert main([str(cfgp), "--evolve-schema", "label:string"]) == 0
    from events_to_db_spark.etl import _layout_extra_columns

    assert _layout_extra_columns(dst) == [
        ("score", "double"),
        ("label", "string"),
    ]
    land = load_landing(spark, dst)
    assert "label" in land.columns and land.count() == n


def test_feed_guard_type_checks_evolved_columns(spark, tmp_path):
    """r11 follow-through: a feed file carrying a REGISTERED evolved
    column with the wrong physical type would fail the widened stream
    read mid-batch (opaque Py4J error); the feed guard refuses at
    START, naming the file and both types."""
    import os
    import shutil

    from events_to_db_spark.etl import (
        evolve_landing_schema,
        maintain_landing_layout,
    )

    feed, files, _n, base_t = _drip_feed(spark, tmp_path, n_chunks=2)
    _land_chunk(feed, files, 0, base_t)
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt_m")
    maintain_landing_layout(spark, str(feed), dst, ckpt).awaitTermination()
    evolve_landing_schema(spark, dst, {"score": "double"})

    # a feed file lands with score as STRING
    bad = (
        spark.read.parquet(str(files[1][0].parent))
        .withColumn("score", F.lit("oops"))
    )
    bdir = tmp_path / "bad"
    bad.coalesce(1).write.parquet(str(bdir))
    for f in os.listdir(bdir):
        if f.endswith(".parquet"):
            p = os.path.join(str(feed), f"bad_{f}")
            shutil.copy(os.path.join(bdir, f), p)
            os.utime(p, (base_t + 1, base_t + 1))

    with pytest.raises(ValueError, match="registered it as 'double'"):
        maintain_landing_layout(spark, str(feed), dst, ckpt)
