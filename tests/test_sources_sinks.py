"""Source/sink round-trip tests — SURVEY.md §2.1 sink surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from events_to_db_spark.session import load_table
from events_to_db_spark.sources.readers import read_csv, read_json, read_parquet
from events_to_db_spark.sources.writers import (
    upsert_table,
    write_csv,
    write_json,
    write_parquet,
)
from events_to_db_spark.streaming.sink import read_sink_table
from tests.conftest import SF_SMOKE


def _nation(spark):
    return load_table(spark, SF_SMOKE, "nation")


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    src = _nation(spark)
    write_parquet(src, str(tmp_path / "p"), partition_by=["n_regionkey"])
    back = read_parquet(spark, str(tmp_path / "p"))
    assert back.count() == src.count()
    # partition pruning: filtering on the partition column reads 1 dir
    plan = (
        back.filter(F.col("n_regionkey") == 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(n_regionkey" in plan


def test_events_daily_partition_layout_prunes(spark, tmp_path):
    """The tag-index analogue at rest: events written partitioned by
    day; a day filter prunes to one directory at planning time (the
    scan's PartitionFilters, not a post-read filter)."""
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "d", F.to_date("ts")
    )
    write_parquet(ev, str(tmp_path / "ev_daily"), partition_by=["d"])
    back = read_parquet(spark, str(tmp_path / "ev_daily"))
    one_day = back.filter(F.col("d") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "d#" in plan
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == want > 0


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    src = _nation(spark)
    write_csv(src, str(tmp_path / "c"))
    back = read_csv(
        spark,
        str(tmp_path / "c"),
        "n_nationkey int, n_name string, n_regionkey int",
    )
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in src.collect()
    )


def test_json_roundtrip_explicit_schema(spark, tmp_path):
    src = _nation(spark)
    write_json(src, str(tmp_path / "j"))
    back = read_json(
        spark,
        str(tmp_path / "j"),
        "n_nationkey int, n_name string, n_regionkey int",
    )
    assert back.count() == src.count()


def test_batch_upsert_idempotent(spark, tmp_path):
    src = _nation(spark)
    db = str(tmp_path / "t.db")
    upsert_table(src, db, "nation", ["n_nationkey"])
    upsert_table(src, db, "nation", ["n_nationkey"])  # replay
    assert len(read_sink_table(db, "nation")) == src.count()


def test_batch_upsert_updates_changed_rows(spark, tmp_path):
    src = _nation(spark)
    db = str(tmp_path / "t.db")
    upsert_table(src, db, "nation", ["n_nationkey"])
    changed = src.withColumn(
        "n_name", F.when(F.col("n_nationkey") == 0, "RENAMED").otherwise(F.col("n_name"))
    )
    upsert_table(changed, db, "nation", ["n_nationkey"])
    state = read_sink_table(db, "nation")
    assert len(state) == src.count()
    assert state.set_index("n_nationkey").loc[0, "n_name"] == "RENAMED"


def test_compaction_preserves_rows_and_shrinks_file_count(spark, tmp_path):
    """64 tiny files -> few target-sized files, byte-identical content
    (count + per-row hash), source left untouched."""
    from pyspark.sql import functions as F

    from events_to_db_spark.session import load_table
    from events_to_db_spark.sources.compaction import (
        compact,
        dir_bytes,
        n_data_files,
    )
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(64).write.parquet(src)
    assert n_data_files(src) == 64

    n = compact(spark, src, dst, target_bytes=dir_bytes(src) // 2)
    assert n == 2
    assert n_data_files(dst) <= 4  # ~target-sized, far from 64

    def sig(path):
        df = spark.read.parquet(path)
        return (
            df.count(),
            df.agg(
                # xor-fold: order-independent and cannot overflow (a
                # SUM of 64-bit hashes trips ANSI overflow)
                F.expr(
                    "bit_xor(xxhash64("
                    + ", ".join(sorted(df.columns))
                    + "))"
                ).alias("h")
            ).collect()[0]["h"],
        )

    assert sig(src) == sig(dst)
    assert n_data_files(src) == 64  # source untouched


def test_dynamic_partition_overwrite_rewrites_only_touched_day(spark, tmp_path):
    """partitionOverwriteMode=dynamic: re-running one day's job replaces
    that partition only — the idempotent daily-batch contract (static
    mode would truncate the whole table)."""
    from pyspark.sql import functions as F

    from events_to_db_spark.session import load_table
    from tests.conftest import SF_SMOKE

    tgt = str(tmp_path / "by_day")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "d", F.col("ts").cast("date").cast("string")
    )
    ev.write.partitionBy("d").parquet(tgt)
    days = [r["d"] for r in ev.select("d").distinct().collect()]
    one_day = sorted(days)[0]
    before_total = spark.read.parquet(tgt).count()
    day_rows = ev.where(F.col("d") == one_day)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # re-run the day with one row dropped: only that partition changes
        day_rows.orderBy("event_id").limit(day_rows.count() - 1).write.mode(
            "overwrite"
        ).partitionBy("d").parquet(tgt)
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")

    after = spark.read.parquet(tgt)
    assert after.count() == before_total - 1
    assert after.select("d").distinct().count() == len(days)


def test_executor_upsert_no_driver_collect_and_idempotent(spark, tmp_path):
    """VERDICT r07 #2: mode="executor" writes from foreachPartition on
    the executors — the micro-batch contains NO driver collect (pinned
    by poisoning DataFrame.collect/toLocalIterator for the duration),
    is idempotent under replay, and matches the driver path's state."""
    import pytest as _pytest
    from pyspark.sql import DataFrame

    from events_to_db_spark.streaming.sink import upsert_foreach_batch

    src = _nation(spark).repartition(6)
    db_exec = str(tmp_path / "exec.db")
    db_drv = str(tmp_path / "drv.db")

    write_exec = upsert_foreach_batch(
        db_exec, "nation", ["n_nationkey"], mode="executor"
    )

    def _poisoned(self, *a, **k):  # pragma: no cover - must not run
        raise AssertionError("driver collect in executor-mode sink")

    real_collect = DataFrame.collect
    real_tli = DataFrame.toLocalIterator
    DataFrame.collect = _poisoned
    DataFrame.toLocalIterator = _poisoned
    try:
        write_exec(src, 0)
        write_exec(src, 0)  # redelivery: keyed upsert is a no-op
    finally:
        DataFrame.collect = real_collect
        DataFrame.toLocalIterator = real_tli

    upsert_foreach_batch(db_drv, "nation", ["n_nationkey"])(src, 0)
    got = read_sink_table(db_exec, "nation").sort_values("n_nationkey")
    want = read_sink_table(db_drv, "nation").sort_values("n_nationkey")
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
    assert len(got) == src.count()

    with _pytest.raises(ValueError, match="driver|executor"):
        upsert_foreach_batch(db_drv, "nation", ["n_nationkey"], mode="jdbc")


def test_replace_sink_survives_schema_change(spark, tmp_path):
    """ADVICE r07: a complete-mode fold whose output schema changes
    across restarts must REPLACE the table (drop + recreate), not die
    with an opaque column-count INSERT error."""
    from events_to_db_spark.streaming.sink import replace_foreach_batch

    db = str(tmp_path / "fold.db")
    write = replace_foreach_batch(db, "fold")
    write(spark.createDataFrame([(1, 10.0)], "g int, total double"), 0)
    assert list(read_sink_table(db, "fold").columns) == ["g", "total"]

    # restarted fold now also emits a count column
    write(
        spark.createDataFrame([(1, 10.0, 3)], "g int, total double, n int"),
        0,
    )
    state = read_sink_table(db, "fold")
    assert list(state.columns) == ["g", "total", "n"]
    assert state.loc[0, "n"] == 3 and len(state) == 1
