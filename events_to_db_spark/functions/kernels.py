"""Arrow-vectorized numeric kernels — SURVEY.md §2.10 / §7.3.3.

Dense vector math (cosine similarity against a reference matrix) is the
one place where built-in higher-order functions lose badly: evaluating
``aggregate(zip_with(...))`` per pair is a per-element Catalyst
expression walk, measured at 27 s for 2 k×2 k pairs (BASELINE.md B10).
The kernels here move the same math into NumPy matmuls over Arrow
batches (``mapInPandas``), which is the idiomatic Spark shape for this:

* the small side (reference matrix / centroids) is a **broadcast**
  variable — each executor gets one copy, no shuffle;
* the big side streams through in Arrow record batches, each batch
  processed as one BLAS call;
* everything stays partition-parallel — no driver-side loops, no
  ``collect`` of the big side — so the same code runs on a
  1000-executor cluster against a billion vectors.

100 TB posture: brute-force NN against a *broadcastable* reference set
scales linearly in the big side (this file).  When the reference set
itself is huge, the scale path is candidate pruning via LSH bucketing
(see ``operators/pipeline_ops.py``) so the matmul only sees per-bucket
blocks.

All kernels compute in float64: float32 accumulation drifts ~1e-7,
which flips round-4 hash digits; float64 disagreement with DuckDB's
sequential summation is ~1e-15 and cannot move a rounded digit except
on exact real-arithmetic ties.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


def stack_embeddings(series: pd.Series) -> np.ndarray:
    """Arrow ``list<float>`` pandas column -> (n, dim) float64 matrix."""
    return np.stack(series.to_numpy()).astype(np.float64)


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    """Row-normalize; zero rows stay zero (cosine vs zero vector = 0)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


#: Per-chunk budget for a (rows × n_ref) float64 sims matrix.  A
#: per-task working-set bound (the simproj._PACK_CAP class, not a
#: data-size gate): with the boolean masks the broadcast kernels carry,
#: transient memory per worker stays ≈ 3× this, so 32 workers ≈ 12 GiB
#: — Arrow's default 10k-row batches are sized for TRANSFER, and at a
#: 200k-row reference a single one means a 16 GB matmul output per
#: worker (the m100 embed sweep OOM-killed the host twice before this
#: — PERF.md r6).
_SIMS_CHUNK_BYTES = 128 * 1024 * 1024


def rechunk(
    batches: Iterator[pd.DataFrame], n_ref: int
) -> Iterator[pd.DataFrame]:
    """Re-slice incoming Arrow batches so each kernel chunk's sims
    matrix fits ``_SIMS_CHUNK_BYTES``.  Every broadcast kernel emits
    per-row results or additive partials, so re-chunking never changes
    the answer — only the transient footprint."""
    step = max(1, _SIMS_CHUNK_BYTES // max(1, n_ref * 8))
    for pdf in batches:
        if pdf.empty:
            continue
        if len(pdf) <= step:
            yield pdf
            continue
        for lo in range(0, len(pdf), step):
            yield pdf.iloc[lo : lo + step]


def make_nn_map_fn(ref_bc):
    """Build a ``mapInPandas`` fn: for each input vector, its nearest
    neighbour in the broadcast reference set by cosine (self excluded,
    ties broken by lowest candidate id).

    ``ref_bc`` is a Spark broadcast of ``(ids: int64[n], unit: float64
    [n, dim])`` with ``ids`` sorted ascending — ``argmax`` returns the
    first (= lowest-id) winner on exact ties, matching the oracle's
    ``ORDER BY cos DESC, vec_id`` tie-break.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, unit = ref_bc.value
        for pdf in rechunk(batches, len(ids)):
            q = l2_normalize(stack_embeddings(pdf["embedding"]))
            sims = q @ unit.T  # (chunk, n_ref) — one BLAS call
            # exclude self-matches by id (not by position: the batch is
            # an arbitrary slice of the same table)
            self_mask = pdf["vec_id"].to_numpy()[:, None] == ids[None, :]
            sims[self_mask] = -np.inf
            best = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "nn_id": ids[best],
                    "cos": np.round(sims[np.arange(len(best)), best], 4),
                }
            )

    return fn


def make_threshold_map_fn(ref_bc, threshold: float):
    """Build a ``mapInPandas`` fn emitting per-batch pair counts at
    ``cos >= threshold`` split by same-vs-cross label, counting each
    unordered pair once (target id < candidate id)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, unit, labels = ref_bc.value
        for pdf in rechunk(batches, len(ids)):
            q = l2_normalize(stack_embeddings(pdf["embedding"]))
            sims = q @ unit.T
            qid = pdf["vec_id"].to_numpy()[:, None]
            hit = (sims >= threshold) & (qid < ids[None, :])
            same = pdf["label"].to_numpy()[:, None] == labels[None, :]
            n_same = int(np.count_nonzero(hit & same))
            n_cross = int(np.count_nonzero(hit & ~same))
            yield pd.DataFrame(
                {"same_label": [True, False], "n_pairs_part": [n_same, n_cross]}
            )

    return fn


def make_classify_map_fn(cent_bc):
    """Build a ``mapInPandas`` fn assigning each vector its nearest
    centroid label by cosine (ties -> lowest label; centroid rows are
    sorted by label so ``argmax`` picks it)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cl_labels, cl_unit = cent_bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q = l2_normalize(stack_embeddings(pdf["embedding"]))
            best = np.argmax(q @ cl_unit.T, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "clabel": cl_labels[best],
                }
            )

    return fn


def _unpack_pair_row(row) -> tuple:
    """One block-nested-loop pair row -> (q_ids, q_unit, r_ids, r_unit).
    Each side is a packed chunk: an id vector plus the row-major
    flattened embedding matrix (dim inferred from flat length)."""
    q_ids = np.asarray(row["q_ids"], dtype=np.int64)
    r_ids = np.asarray(row["r_ids"], dtype=np.int64)
    q_mat = np.asarray(row["q_flat"], dtype=np.float64).reshape(len(q_ids), -1)
    r_mat = np.asarray(row["r_flat"], dtype=np.float64).reshape(len(r_ids), -1)
    return q_ids, l2_normalize(q_mat), r_ids, l2_normalize(r_mat)


def make_block_nn_fn():
    """Block-nested-loop partial-kNN ``mapInPandas`` fn over chunk×block
    pair rows: for each query vector, its best cosine match *within this
    reference block* (self excluded), emitted UNROUNDED so the global
    struct-max argmax across blocks reproduces the broadcast kernel's
    tie-break (highest cos, then lowest nn_id).  This is the exact-NN
    path when the reference set exceeds broadcast size: no driver
    collect anywhere — both sides are packed by aggregation and paired
    by a chunk-level cross join."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                q_ids, q_unit, r_ids, r_unit = _unpack_pair_row(row)
                sims = q_unit @ r_unit.T
                sims[q_ids[:, None] == r_ids[None, :]] = -np.inf
                # ids sorted asc within the pack -> argmax picks lowest id on ties
                best = np.argmax(sims, axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": q_ids,
                        "nn_id": r_ids[best],
                        "cos": sims[np.arange(len(best)), best],
                    }
                )

    return fn


def make_block_dup_fn(threshold: float):
    """Block-nested-loop partial dup flag: within this reference block,
    does a smaller-id vector sit at cosine >= threshold?  OR-reduced
    across blocks by ``bool_or`` in the final aggregation."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                q_ids, q_unit, r_ids, r_unit = _unpack_pair_row(row)
                sims = q_unit @ r_unit.T
                smaller = r_ids[None, :] < q_ids[:, None]
                yield pd.DataFrame(
                    {
                        "vec_id": q_ids,
                        "label": np.asarray(row["q_labels"], dtype=np.int64),
                        "is_dup_part": ((sims >= threshold) & smaller).any(axis=1),
                    }
                )

    return fn


def make_block_threshold_fn(threshold: float):
    """Block-nested-loop partial pair counts at cos >= threshold, split
    same/cross label; each unordered pair lands in exactly one
    chunk×block pair row and is counted once via ``q_id < r_id``."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                q_ids, q_unit, r_ids, r_unit = _unpack_pair_row(row)
                sims = q_unit @ r_unit.T
                hit = (sims >= threshold) & (q_ids[:, None] < r_ids[None, :])
                q_lab = np.asarray(row["q_labels"], dtype=np.int64)
                r_lab = np.asarray(row["r_labels"], dtype=np.int64)
                same = q_lab[:, None] == r_lab[None, :]
                yield pd.DataFrame(
                    {
                        "same_label": [True, False],
                        "n_pairs_part": [
                            int(np.count_nonzero(hit & same)),
                            int(np.count_nonzero(hit & ~same)),
                        ],
                    }
                )

    return fn


def make_block_hist_fn():
    """Block-nested-loop partial cosine histogram (bin width 0.1), each
    unordered pair once via ``q_id < r_id``; partial (bin, count) rows
    sum in the final aggregation."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                q_ids, q_unit, r_ids, r_unit = _unpack_pair_row(row)
                sims = q_unit @ r_unit.T
                mask = q_ids[:, None] < r_ids[None, :]
                binned = np.floor(sims[mask] * 10).astype(np.int64)
                vals, counts = np.unique(binned, return_counts=True)
                yield pd.DataFrame({"bin": vals, "n_part": counts})

    return fn


def make_dup_flag_map_fn(ref_bc, threshold: float):
    """Build a ``mapInPandas`` fn implementing the keep-lowest-id
    dedup rule: a vector is a duplicate iff some reference vector with
    a *smaller* id has cosine ≥ threshold with it.  One matmul per
    Arrow batch; the smaller-id mask is a broadcast comparison against
    the (sorted) reference id vector."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, unit = ref_bc.value
        for pdf in rechunk(batches, len(ids)):
            q = l2_normalize(stack_embeddings(pdf["embedding"]))
            sims = q @ unit.T  # (chunk, n_ref)
            qid = pdf["vec_id"].to_numpy()
            smaller = ids[None, :] < qid[:, None]
            is_dup = ((sims >= threshold) & smaller).any(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": qid,
                    "label": pdf["label"],
                    "is_dup": is_dup,
                }
            )

    return fn


def make_min_match_map_fn(ref_bc, threshold: float):
    """Bipartite batch-vs-corpus dedup probe: for each input vector,
    the MINIMUM reference id within cosine ≥ threshold plus the match
    count — one matmul per Arrow batch against the broadcast corpus;
    rows with no match emit nothing (the caller's semantics is "new
    unless matched")."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, unit = ref_bc.value
        if len(ids) == 0:
            return
        big = np.iinfo(np.int64).max
        for pdf in rechunk(batches, len(ids)):
            q = l2_normalize(stack_embeddings(pdf["embedding"]))
            hit = (q @ unit.T) >= threshold
            n = hit.sum(axis=1)
            keep = n > 0
            if not keep.any():
                continue
            masked = np.where(hit[keep], ids[None, :], big)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[keep],
                    "near_id": masked.min(axis=1),
                    "n_matches": n[keep].astype(np.int64),
                }
            )

    return fn


def make_block_min_match_fn(threshold: float):
    """Blocked bipartite twin of :func:`make_min_match_map_fn` for a
    non-broadcastable corpus: per chunk×block pair row, the partial
    (min matching reference id, match count) per query vector; the
    caller min/sums the partials per vec_id."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        big = np.iinfo(np.int64).max
        for pdf in batches:
            for _, row in pdf.iterrows():
                q_ids, q_unit, r_ids, r_unit = _unpack_pair_row(row)
                hit = (q_unit @ r_unit.T) >= threshold
                n = hit.sum(axis=1)
                keep = n > 0
                if not keep.any():
                    continue
                masked = np.where(hit[keep], r_ids[None, :], big)
                yield pd.DataFrame(
                    {
                        "vec_id": q_ids[keep],
                        "near_part": masked.min(axis=1),
                        "n_part": n[keep].astype(np.int64),
                    }
                )

    return fn
