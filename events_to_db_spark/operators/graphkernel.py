"""Driver-side numpy kernel for the bounded co-purchase-graph family
(r12 opt — VERDICT r11 "Next round" #1/#7).

q_graph_linkpred / q_graph_triangles / q_graph_local_cluster all reduce
a fact table to a *catalog-bounded* part co-purchase graph (|E| ~1.2 M
at sf0.1, two BIGINTs per edge ≈ 19 MB) and then run a wedge
enumeration over it.  The distributed form materializes Σd²/2 wedge
rows (148 M at sf0.1) through a shuffle + 101 M-group hash aggregate —
correct at any scale, but when the *edge list itself* is driver-sized,
shuffling 2.4 GB of pair rows between 32 (or 1000) executors to count
common neighbors of a 20 k-node graph is pure overhead (guide §1.2:
fix the distributed algorithm first; §5: a bounded graph is not "data
work").  This module does the same exact integer computation as one
vectorized numpy pass: sorted-adjacency (degree-ordered where the
query orients) pair generation + one int64 sort — the merge-
intersection kernel in array form.

Gates (both env-overridable, distributed plan unchanged above them,
parity pinned by tests/test_graph_kernel.py):

* ``SPARK_GRAFT_GRAPH_KERNEL_MAX_EDGES`` (default 8 M): collect bound —
  checked with a scalar ``count()`` BEFORE any collect (the r11
  verdict's gate-order lesson: never ship rows to the driver just to
  decide not to use them).
* ``SPARK_GRAFT_GRAPH_KERNEL_MAX_PAIRS`` (default 400 M): wedge-pair
  bound Σ d(d−1)/2 computed from the collected degree histogram — a
  star-shaped 1 M-edge graph has 5e11 wedges and must stay distributed
  even though its edge list is tiny.  Checked after the (cheap) edge
  collect, before any pair array is allocated.

Exactness: everything here is int64 arithmetic on exact counts; numpy
``//`` on non-negative ints ≡ Spark ``div`` ≡ DuckDB ``//``.  Floats
never appear — callers push the few float expressions (clustering
coefficients, rounding) back into Spark so the engine-side expression
strings stay byte-identical to the distributed branch.
"""

from __future__ import annotations

import os

import numpy as np

GRAPH_KERNEL_MAX_EDGES = 8_000_000
GRAPH_KERNEL_MAX_PAIRS = 400_000_000


def kernel_max_edges() -> int:
    return int(
        os.environ.get(
            "SPARK_GRAFT_GRAPH_KERNEL_MAX_EDGES", str(GRAPH_KERNEL_MAX_EDGES)
        )
    )


def kernel_max_pairs() -> int:
    return int(
        os.environ.get(
            "SPARK_GRAFT_GRAPH_KERNEL_MAX_PAIRS", str(GRAPH_KERNEL_MAX_PAIRS)
        )
    )


def collect_edges(edges_df, max_edges: int | None = None):
    """Collect a distinct (u, v) edge frame to two int64 arrays when it
    is gate-small, else ``None``.  The scalar ``count()`` runs FIRST
    (it doubles as the materialization of the caller's lazily
    checkpointed edge frame); rows only move to the driver under the
    gate.  Returns ``(u, v, n_edges)`` so callers above the gate can
    reuse the count (e.g. for a broadcast decision) without a second
    job."""
    n_edges = edges_df.count()
    limit = kernel_max_edges() if max_edges is None else max_edges
    if not (0 < n_edges <= limit):
        return None, None, n_edges
    pdf = edges_df.toPandas()  # Arrow path — two int64 columns
    cols = list(pdf.columns)
    u = pdf[cols[0]].to_numpy(dtype=np.int64, copy=False)
    v = pdf[cols[1]].to_numpy(dtype=np.int64, copy=False)
    return u, v, n_edges


def _compress(u: np.ndarray, v: np.ndarray):
    """Map node ids to dense indices 0..n−1.  ``np.unique`` returns the
    ids sorted ascending, so compressed-index order == id order and
    every ``a < c`` / tie-break comparison downstream is unchanged."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui = inv[: len(u)].astype(np.int32)
    vi = inv[len(u):].astype(np.int32)
    return nodes, ui, vi


def _csr(src: np.ndarray, dst: np.ndarray, n: int):
    """Sorted-adjacency CSR: neighbors of each src, ascending."""
    order = np.lexsort((dst, src))
    indices = dst[order]
    counts = np.bincount(src, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, indices


def _pairs_within_groups(
    indptr: np.ndarray, indices: np.ndarray, with_groups: bool = False
):
    """All (a, c) pairs with a < c inside each CSR group, as packed
    int64 keys ``a<<32 | c`` (plus the per-pair group id when
    ``with_groups``).  Adjacency is sorted ascending, so for the
    element at local position L its L earlier group-mates are exactly
    its ``a < c`` partners — the whole enumeration is repeats + one
    gather, no Python loop."""
    sizes = np.diff(indptr)
    nnz = int(indices.shape[0])
    loc = np.arange(nnz, dtype=np.int64) - np.repeat(indptr[:-1], sizes)
    total = int(loc.sum())
    if total == 0:
        empty = np.empty(0, dtype=np.int64)
        return (empty, np.empty(0, dtype=np.int32)) if with_groups else (
            empty,
            None,
        )
    c_arr = np.repeat(indices, loc)
    starts = np.concatenate(([0], np.cumsum(loc)))
    within = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], loc)
    group_start = np.repeat(np.repeat(indptr[:-1], sizes), loc)
    a_arr = indices[group_start + within]
    del within, group_start
    keys = (a_arr.astype(np.int64) << 32) | c_arr.astype(np.int64)
    if not with_groups:
        return keys, None
    group_of_elem = np.repeat(np.arange(len(sizes), dtype=np.int32), sizes)
    group_per_pair = np.repeat(group_of_elem, loc)
    return keys, group_per_pair


def _edge_keys(ui: np.ndarray, vi: np.ndarray) -> np.ndarray:
    """Sorted packed keys of the undirected edge set (lower id first)."""
    lo = np.minimum(ui, vi).astype(np.int64)
    hi = np.maximum(ui, vi).astype(np.int64)
    keys = (lo << 32) | hi
    keys.sort()
    return keys


def _member(sorted_keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Boolean membership of ``probe`` in ``sorted_keys``."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=bool)
    pos = np.searchsorted(sorted_keys, probe)
    pos[pos == len(sorted_keys)] = len(sorted_keys) - 1
    return sorted_keys[pos] == probe


def sym_pair_budget(ui: np.ndarray, vi: np.ndarray, n: int) -> int:
    """Σ d(d−1)/2 over the symmetric adjacency — the exact wedge-pair
    count the linkpred enumeration would materialize."""
    deg = np.bincount(
        np.concatenate([ui, vi]), minlength=n
    ).astype(np.int64)
    return int((deg * (deg - 1) // 2).sum())


def linkpred_topk(u: np.ndarray, v: np.ndarray, k: int = 20):
    """Exact top-k non-edges by (common desc, jacc_bp desc, a, c) —
    the driver form of q_graph_linkpred's wedge aggregate + anti-join +
    degree joins.  Returns a list of (a, c, common, jacc_bp) int rows
    already in output order, or ``None`` when the wedge budget exceeds
    the pair gate (caller falls back to the distributed plan)."""
    nodes, ui, vi = _compress(u, v)
    n = len(nodes)
    if sym_pair_budget(ui, vi, n) > kernel_max_pairs():
        return None
    src = np.concatenate([ui, vi])
    dst = np.concatenate([vi, ui])
    deg = np.bincount(src, minlength=n).astype(np.int64)
    indptr, indices = _csr(src, dst, n)
    keys, _ = _pairs_within_groups(indptr, indices)
    if len(keys) == 0:
        return []
    keys.sort()
    boundary = np.empty(len(keys), dtype=bool)
    boundary[0] = True
    np.not_equal(keys[1:], keys[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    uniq = keys[starts]
    cnt = np.diff(np.append(starts, len(keys))).astype(np.int64)
    del keys, boundary, starts
    # drop existing edges (the anti-join)
    not_edge = ~_member(_edge_keys(ui, vi), uniq)
    uniq, cnt = uniq[not_edge], cnt[not_edge]
    if len(uniq) == 0:
        return []
    idx = _select_topk(uniq, cnt, deg, k)
    a = (uniq[idx] >> 32).astype(np.int64)
    c = (uniq[idx] & 0xFFFFFFFF).astype(np.int64)
    common = cnt[idx]
    jacc = common * 10000 // (deg[a] + deg[c] - common)
    rows = sorted(
        zip(
            nodes[a].tolist(),
            nodes[c].tolist(),
            common.tolist(),
            jacc.tolist(),
        ),
        key=lambda r: (-r[2], -r[3], r[0], r[1]),
    )
    return rows[:k]


def _select_topk(uniq, cnt, deg, k):
    """Indices of the top-k candidates by (cnt desc, jacc desc, packed
    key asc) WITHOUT sorting the full (possibly 1e8-row) candidate
    array: hierarchical np.partition cuts — cnt threshold, then jacc
    among cnt-ties, then smallest packed keys among (cnt, jacc)-ties
    (keys are unique per pair, so the last cut is exact)."""
    m = len(cnt)
    if m <= k:
        return np.arange(m)
    thr = np.partition(cnt, m - k)[m - k]  # kth-largest cnt
    greater = np.flatnonzero(cnt > thr)  # < k rows by construction
    ties = np.flatnonzero(cnt == thr)
    need = k - len(greater)
    if len(ties) <= need:
        return np.concatenate([greater, ties])
    tie_keys = uniq[ties]
    a = (tie_keys >> 32).astype(np.int64)
    c = (tie_keys & 0xFFFFFFFF).astype(np.int64)
    jacc = thr * 10000 // (deg[a] + deg[c] - thr)
    jthr = np.partition(jacc, len(jacc) - need)[len(jacc) - need]
    jgreater = ties[jacc > jthr]  # < need rows
    jties = ties[jacc == jthr]
    need2 = need - len(jgreater)
    if len(jties) > need2:
        kth_key = np.partition(uniq[jties], need2 - 1)[need2 - 1]
        jties = jties[uniq[jties] <= kth_key]  # exactly need2: keys unique
    return np.concatenate([greater, jgreater, jties])


def _oriented_csr(ui: np.ndarray, vi: np.ndarray, n: int):
    """Degree-(then id-)oriented CSR — each undirected edge points from
    its lower-(degree, id) endpoint, exactly the distributed plan's
    ``lower_first`` expression."""
    deg = np.bincount(
        np.concatenate([ui, vi]), minlength=n
    ).astype(np.int64)
    du, dv = deg[ui], deg[vi]
    lower_first = (du < dv) | ((du == dv) & (ui < vi))
    src = np.where(lower_first, ui, vi).astype(np.int32)
    dst = np.where(lower_first, vi, ui).astype(np.int32)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    budget = int((outdeg * (outdeg - 1) // 2).sum())
    return deg, src, dst, budget


def triangle_stats(u: np.ndarray, v: np.ndarray):
    """(n_nodes, n_edges, n_triangles, wedge_sum) as exact ints — the
    driver form of q_graph_triangles' oriented wedge sweep.  ``None``
    above the pair gate."""
    nodes, ui, vi = _compress(u, v)
    n = len(nodes)
    deg, src, dst, budget = _oriented_csr(ui, vi, n)
    if budget > kernel_max_pairs():
        return None
    indptr, indices = _csr(src, dst, n)
    wkeys, _ = _pairs_within_groups(indptr, indices)
    tri = int(_member(_edge_keys(ui, vi), wkeys).sum())
    wedge_sum = int((deg * (deg - 1) // 2).sum())
    return n, len(u), tri, wedge_sum


def local_cluster_topk(u: np.ndarray, v: np.ndarray, k: int = 10):
    """[(node, degree, triangle_count)] for the k highest-(degree,
    node-asc) nodes — the driver form of q_graph_local_cluster's
    triangle-corner unpivot.  ``None`` above the pair gate."""
    nodes, ui, vi = _compress(u, v)
    n = len(nodes)
    deg, src, dst, budget = _oriented_csr(ui, vi, n)
    if budget > kernel_max_pairs():
        return None
    indptr, indices = _csr(src, dst, n)
    wkeys, apex = _pairs_within_groups(indptr, indices, with_groups=True)
    hit = _member(_edge_keys(ui, vi), wkeys)
    a = (wkeys[hit] >> 32).astype(np.int64)
    c = (wkeys[hit] & 0xFFFFFFFF).astype(np.int64)
    corners = np.concatenate([apex[hit].astype(np.int64), a, c])
    t = np.bincount(corners, minlength=n).astype(np.int64)
    order = np.lexsort((nodes, -deg))[:k]
    return [
        (int(nodes[i]), int(deg[i]), int(t[i])) for i in order
    ]
