"""SnapshotTable (manifest-pinned time travel) semantics."""

import os

import pytest

from events_to_db_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "snap"))


def _rows(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "k long")


def _keys(df):
    return sorted(r.k for r in df.collect())


def test_append_chain_and_time_travel(spark, table):
    v0 = table.commit(_rows(spark, [1, 2]))
    v1 = table.commit(_rows(spark, [3]))
    v2 = table.commit(_rows(spark, [4, 5]))
    assert (v0, v1, v2) == (0, 1, 2)
    assert _keys(table.read(spark)) == [1, 2, 3, 4, 5]
    # historical versions are pinned, not re-listed from the directory
    assert _keys(table.read(spark, version=0)) == [1, 2]
    assert _keys(table.read(spark, version=1)) == [1, 2, 3]


def test_overwrite_starts_fresh_but_keeps_history(spark, table):
    table.commit(_rows(spark, [1, 2]))
    table.commit(_rows(spark, [9]), mode="overwrite")
    assert _keys(table.read(spark)) == [9]
    # the pre-overwrite version still reads its original files
    assert _keys(table.read(spark, version=0)) == [1, 2]


def test_manifest_is_the_source_of_truth(spark, table):
    """Orphan data files (a crashed commit that never published its
    manifest) must be invisible to every reader."""
    table.commit(_rows(spark, [1]))
    orphan_dir = os.path.join(table.base, "data", "v999999")
    _rows(spark, [42]).write.parquet(orphan_dir)
    assert _keys(table.read(spark)) == [1]
    assert table.versions() == [0]


def test_empty_table_and_bad_mode(spark, table):
    with pytest.raises(ValueError):
        table.read(spark)
    with pytest.raises(ValueError):
        table.commit(_rows(spark, [1]), mode="merge")
