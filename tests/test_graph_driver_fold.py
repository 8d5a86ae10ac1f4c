"""r11 opt: the bounded-graph driver folds (pagerank / absorption /
BFS on the event-type graph; union-find clustering on the near-dup
pair graph) must be output-identical to the distributed iteration they
bypass — a gate may never change what the query computes.  All folded
arithmetic is non-negative integers, so Python // == Spark div; these
tests pin it empirically on the smoke corpus."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

FOLDED = ["q_graph_pagerank", "q_graph_absorption", "q_graph_bfs"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", FOLDED)
def test_driver_fold_matches_distributed(spark, monkeypatch, name):
    import __spark_entry__ as e

    fn = e.queries()[name]
    monkeypatch.delenv("SPARK_GRAFT_GRAPH_DRIVER_MAX_NODES", raising=False)
    folded = _rows(fn(spark, SF_SMOKE))
    assert folded, "smoke corpus should produce rows"

    monkeypatch.setenv("SPARK_GRAFT_GRAPH_DRIVER_MAX_NODES", "0")
    distributed = _rows(fn(spark, SF_SMOKE))
    assert folded == distributed


def test_cluster_union_find_matches_distributed(spark, monkeypatch):
    """q_dedup_cluster's driver union-find vs the distributed
    min-label propagation — identical clusters either way."""
    import __spark_entry__ as e

    fn = e.queries()["q_dedup_cluster"]
    monkeypatch.delenv("SPARK_GRAFT_CLUSTER_DRIVER_MAX_PAIRS", raising=False)
    folded = _rows(fn(spark, SF_SMOKE))
    assert folded, "smoke corpus should produce clusters"

    monkeypatch.setenv("SPARK_GRAFT_CLUSTER_DRIVER_MAX_PAIRS", "0")
    distributed = _rows(fn(spark, SF_SMOKE))
    assert folded == distributed
