"""Reliable-checkpoint mode (VERDICT r02 #3): with
SPARK_GRAFT_RELIABLE_CHECKPOINT set, every iterative operator truncates
lineage via a fault-tolerant checkpoint() into that directory instead of
executor-local blocks — same results, and the directory actually
receives checkpoint data."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE

ITERATIVE = ["q_dedup_cluster", "q_graph_pagerank", "q_graph_kcore", "q_graph_bfs"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ITERATIVE)
def test_reliable_mode_matches_default(spark, monkeypatch, tmp_path, name):
    import __spark_entry__ as e

    # Force the DISTRIBUTED iteration (r11 opt): the small-graph /
    # small-pair driver folds never truncate lineage, so this test --
    # which pins that reliable-checkpoint mode actually writes files --
    # must exercise the loop the checkpoints belong to.  Driver-vs-
    # distributed output parity is pinned separately in
    # tests/test_graph_driver_fold.py.
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_DRIVER_MAX_NODES", "0")
    monkeypatch.setenv("SPARK_GRAFT_CLUSTER_DRIVER_MAX_PAIRS", "0")
    fn = e.queries()[name]
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    expected = _rows(fn(spark, SF_SMOKE))

    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", str(ckpt))
    got = _rows(fn(spark, SF_SMOKE))
    assert got == expected

    # The reliable path must have actually written checkpoint data.
    written = [
        os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "reliable mode set but no checkpoint files written"


def test_default_mode_stays_local(spark, monkeypatch):
    """Without the env var, truncation must not require (or set) a
    checkpoint directory."""
    from events_to_db_spark.plans import checkpoints

    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    assert checkpoints.reliable_dir() is None
    df = spark.range(10)
    out = checkpoints.truncate_lineage(df)
    assert out.count() == 10
