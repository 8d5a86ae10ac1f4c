"""r12 opt: the driver-side numpy graph kernel (linkpred / triangles /
local_cluster on the co-purchase graph) must be output-identical to
the distributed wedge sweep it bypasses — a gate may never change what
the query computes.  Parity is pinned on the smoke corpus by forcing
the distributed branch via SPARK_GRAFT_GRAPH_KERNEL_MAX_EDGES=0; the
r11 ADVICE item (the never-exercised above-gate linkpred anti-join
branch) is covered the same way: SPARK_GRAFT_LINKPRED_BCAST_MAX_EDGES=0
forces the shuffled anti join and the answer must not move."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE

KERNELED = ["q_graph_linkpred", "q_graph_triangles", "q_graph_local_cluster"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", KERNELED)
def test_kernel_matches_distributed(spark, monkeypatch, name):
    import __spark_entry__ as e

    fn = e.queries()[name]
    monkeypatch.delenv("SPARK_GRAFT_GRAPH_KERNEL_MAX_EDGES", raising=False)
    kerneled = _rows(fn(spark, SF_SMOKE))
    assert kerneled, "smoke corpus should produce rows"

    monkeypatch.setenv("SPARK_GRAFT_GRAPH_KERNEL_MAX_EDGES", "0")
    distributed = _rows(fn(spark, SF_SMOKE))
    assert kerneled == distributed


def test_pair_gate_falls_back(spark, monkeypatch):
    """A tiny MAX_PAIRS forces the post-collect bail-out: the edge list
    is collected, the wedge budget exceeds the gate, and the
    distributed plan must still produce the identical answer."""
    import __spark_entry__ as e

    fn = e.queries()["q_graph_linkpred"]
    monkeypatch.delenv("SPARK_GRAFT_GRAPH_KERNEL_MAX_EDGES", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_GRAPH_KERNEL_MAX_PAIRS", raising=False)
    kerneled = _rows(fn(spark, SF_SMOKE))
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_KERNEL_MAX_PAIRS", "0")
    fallback = _rows(fn(spark, SF_SMOKE))
    assert kerneled == fallback


def test_linkpred_shuffled_anti_join_branch(spark, monkeypatch):
    """r11 ADVICE: the above-gate (non-broadcast) anti-join branch was
    never exercised at test scales.  Force it and pin answer equality
    against the broadcast-path result."""
    import __spark_entry__ as e

    fn = e.queries()["q_graph_linkpred"]
    # distributed + broadcast anti join
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_KERNEL_MAX_EDGES", "0")
    monkeypatch.delenv("SPARK_GRAFT_LINKPRED_BCAST_MAX_EDGES", raising=False)
    broadcast_rows = _rows(fn(spark, SF_SMOKE))
    # distributed + shuffled anti join
    monkeypatch.setenv("SPARK_GRAFT_LINKPRED_BCAST_MAX_EDGES", "0")
    shuffled_rows = _rows(fn(spark, SF_SMOKE))
    assert broadcast_rows == shuffled_rows


def test_pairs_within_groups_enumeration():
    """The vectorized pair generator against itertools on a ragged
    adjacency — keys packed (a<<32)|c with a<c, apex ids aligned."""
    import itertools

    from events_to_db_spark.operators.graphkernel import (
        _csr,
        _pairs_within_groups,
    )

    rng = np.random.default_rng(11)
    n = 9
    src_l, dst_l = [], []
    for g in range(n):
        nbrs = rng.choice(50, size=rng.integers(0, 7), replace=False)
        for x in nbrs:
            src_l.append(g)
            dst_l.append(int(x))
    src = np.array(src_l, dtype=np.int32)
    dst = np.array(dst_l, dtype=np.int32)
    indptr, indices = _csr(src, dst, n)
    keys, groups = _pairs_within_groups(indptr, indices, with_groups=True)
    got = sorted(zip(groups.tolist(), keys.tolist()))
    ref = []
    for g in range(n):
        nbrs = sorted(indices[indptr[g]: indptr[g + 1]].tolist())
        for a, c in itertools.combinations(nbrs, 2):
            ref.append((g, (a << 32) | c))
    assert got == sorted(ref)
