"""Lossless projection-cell candidates for cosine-threshold joins
(VERDICT r04 #1 / r05 #1 — the escalation path for the sim family's
last all-pairs O(N·M) component).

Geometry.  On L2-normalized vectors, ``cos(a, b) >= tau`` is exactly
``||a - b|| <= r`` with ``r = sqrt(2 - 2*tau)``.  For ANY unit
direction ``p``, ``|p.a - p.b| <= ||a - b||``, so bucketing each
vector by ``floor((p.v) / r)`` guarantees every qualifying pair sits
in the same or an adjacent cell — a 3-cell 1-D probe per projection
is recall-LOSSLESS, and ``k`` independent projections intersect
multiplicatively (a pair must be cell-adjacent in every projection).

Verification (rewritten round 6 after VERDICT r05 measured the per-
pair path at ~50× a BLAS all-pairs dot).  Candidates are verified per
CELL-PAIR BLOCK, never as pair rows:

* the cell histogram (one row per occupied cell) self-probes with the
  (3^k+1)/2 half-neighborhood offsets — a skinny 16-byte-row join
  that yields each unordered adjacent occupied cell pair exactly once
  (the ``q_join_grid`` invariant lifted to k-D);
* each cell's vectors are PACKED into one row (sorted ids + one flat
  float64 matrix, cells above ``_PACK_CAP`` rows split into uniform
  chunks), and the packed rows join onto the cell-pair list — each
  vector is shuffled once per occupied neighbor cell, NOT once per
  candidate pair;
* one ``A @ B.T`` dgemm per block emits only the qualifying
  (lo_id, hi_id) pairs — the same BLAS kernel family as the quad
  path, so per-candidate work is a few flops plus amortized Arrow.

Direction choice.  Any directions are lossless, so the engine picks
the ones that PRUNE best: the top principal components of the unit
vectors (covariance is d×d = 64×64 — one distributed Gram pass, then
a driver-side eigh on 4 KiB of floats; scale-free).  ``k`` is chosen
from the spectrum: only components whose std exceeds the cell width
``r`` can discriminate (a projection with spread under one cell maps
everything to the same bucket), and unit-norm rows bound total
variance by 1, so at most ~1/r² components are ever informative.  k
is capped at :data:`PROJ_K_CAP` because candidate pruning saturates
while block fragmentation (tiny cells → many near-empty block joins)
keeps growing — measured in PERF.md r6.  ``SPARK_GRAFT_SIM_PROJ_K``
overrides the choice exactly.

When it cannot win — and how the gate knows.  Cells have width ``r``
and unit-vector projections live in [-1, 1], so the scheme only
discriminates when ``r`` is well under the projection spread; the
work gate in llm_ops first computes the EXACT candidate-pair count
from the histogram (:func:`estimate_candidate_pairs` — O(3^k ×
#cells), negligible) and escalates only when the measured candidate
work beats the quadratic kernel under plans/gates.py's calibrated
cost model.  When the qualifying-pair ANSWER is itself Θ(N²) (low
tau on clustered data — e.g. the driver corpus at tau = 0.3), no
lossless candidate scheme can beat the BLAS all-pairs kernel, and
the gate correctly keeps it.  The projection path wins in the regime
it was built for: high-tau near-duplicate screens over LARGE
anisotropic corpora — from the m10 tier (200k rows) up, where the
candidate prune dwarfs the planning probe and the block overheads
(tools/synthgen.generate_aniso; timed by tools/scaling.py --aniso;
forced-gate equality pinned by tests/test_simproj_escalate.py).  At
20k rows the post-`_spread` quad kernel finishes before planning
would, and the r7 size floor (gates.proj_min_quad_pairs) makes auto
refuse there without running a single job.

Everything here is deterministic-by-construction where it matters:
the PCA directions inherit float-sum nondeterminism from the
distributed Gram reduction, but losslessness holds for ANY
directions, so the VERIFIED output is identical run to run; only the
(unverified) candidate set may shift at cell boundaries.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per packed cell coordinate (signed range ±511 after offset).
_CELL_BITS = 10
_CELL_OFF = 1 << (_CELL_BITS - 1)

#: Smallest usable cell width: 2/r cells per projection must fit the
#: packed coordinate range.  Radii below this (tau extremely close to
#: 1) fall back to the quad kernels rather than risk the range guard.
MIN_RADIUS = 2.0 / (_CELL_OFF - 2)

#: Exploration cap for the cost-based k choice.  More projections
#: prune more candidates but fragment the blocks (#cells grows
#: multiplicatively with k, so packed blocks shrink toward one row
#: and replication grows); the planner evaluates every prefix k ≤
#: this cap against the calibrated cost model and picks the argmin
#: (PERF.md r6 records the measured sweep: on the aniso tier k=3
#: beats k=4 despite half the pruning).  3^k probe fan-out also
#: bounds this.
PROJ_K_CAP = 6

#: Histogram rows above which the prefix-k planner falls back from
#: the driver-side exact sweep to a distributed estimate at the
#: spectrum-chosen k (collecting the histogram would dominate).
_HIST_COLLECT_MAX = 1_000_000

#: Max vectors packed into one block row (one side of one dgemm).
#: 2048 × 64-dim float64 = 1 MiB per side, ≤ 32 MiB score matrix.
_PACK_CAP = 2048


def proj_k_override() -> int | None:
    """Exact projection-count override (``SPARK_GRAFT_SIM_PROJ_K``),
    else None → spectrum-driven choice in :func:`principal_dirs`."""
    env = os.environ.get("SPARK_GRAFT_SIM_PROJ_K")
    return int(env) if env is not None else None


def unit_frame(e: DataFrame, with_labels: bool) -> DataFrame:
    """(vec_id[, label], uvec) with uvec L2-normalized float64 — one
    linear mapInPandas pass, matching kernels.l2_normalize exactly."""
    import pandas as pd

    from events_to_db_spark.functions import kernels

    cols = ["vec_id", "embedding"] + (["label"] if with_labels else [])
    schema = "vec_id long" + (
        ", label long" if with_labels else ""
    ) + ", uvec array<double>"

    def norm_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            unit = kernels.l2_normalize(
                kernels.stack_embeddings(pdf["embedding"])
            )
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            if with_labels:
                out["label"] = pdf["label"].to_numpy()
            out["uvec"] = list(unit)
            yield pd.DataFrame(out)

    return e.select(*cols).mapInPandas(norm_fn, schema)


def principal_dirs(u: DataFrame, r: float, k_req: int | None = None):
    """Principal directions that can discriminate at cell width ``r``.

    Distributed part: per-Arrow-batch partial (n, Σv, ΣvvT) flattened
    to (idx, val) rows and hash-aggregated — the shuffle carries
    O(#batches × d²) skinny rows (d = 64 → 4 KiB per batch), never
    vectors.  Driver part: assemble the d×d covariance and ``eigh`` it
    (4 KiB of floats — bounded by dimension, not data).

    Returns ``(dirs, k)`` with ``dirs`` a (k, d) ndarray; k = number
    of components with std ≥ r (a narrower projection collapses into
    one cell and only inflates probe fan-out), clamped to
    [1, :data:`PROJ_K_CAP`]; ``SPARK_GRAFT_SIM_PROJ_K`` overrides
    exactly.  Returns ``(None, 0)`` on an empty frame (ADVICE r05:
    the quad kernels handle empty gracefully; so must this path)."""
    import numpy as np
    import pandas as pd

    def gram_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["uvec"].to_numpy())
            gram = mat.T @ mat  # (d, d)
            mean = mat.sum(axis=0)  # (d,)
            vals = np.concatenate(
                [[float(len(mat))], mean, gram.ravel()]
            )
            yield pd.DataFrame(
                {"idx": np.arange(len(vals), dtype=np.int64), "val": vals}
            )

    parts = (
        u.select("uvec")
        .mapInPandas(gram_fn, "idx long, val double")
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    flat = {row["idx"]: row["val"] for row in parts}
    n_idx = len(flat)
    if n_idx == 0:
        return None, 0
    # layout: [0] = n, [1..d] = Σv, [d+1..] = ΣvvT
    d = int(round((-1 + (1 + 4 * (n_idx - 1)) ** 0.5) / 2))
    n = flat[0]
    mean = np.array([flat[1 + j] for j in range(d)]) / n
    gram = np.array(
        [[flat[1 + d + i * d + j] for j in range(d)] for i in range(d)]
    )
    cov = gram / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    w = w[::-1]
    dirs_all = v[:, ::-1].T  # (d, d) rows = components, top-variance first
    k = k_req if k_req is not None else proj_k_override()
    if k is None:
        informative = int(np.sum(np.sqrt(np.maximum(w, 0.0)) >= r))
        k = max(1, min(PROJ_K_CAP, informative))
    k = max(1, min(d, k))
    return np.ascontiguousarray(dirs_all[:k]), k


def _dot_lit(col: str, direction) -> Column:
    """JVM-side dot product of an array<double> column with a literal
    direction — a fixed-order Catalyst fold, no Python in the path."""
    lit_arr = F.array(*[F.lit(float(x)) for x in direction])
    return F.aggregate(
        F.zip_with(F.col(col), lit_arr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cell_frame(u: DataFrame, dirs, r: float) -> DataFrame:
    """Adds ``ckey``: the k per-projection cells floor(p·uvec / r)
    packed into one BIGINT (``_CELL_BITS`` bits each, offset to stay
    positive) — one shuffle key instead of k join columns."""
    key = F.lit(0).cast("long")
    for j, p in enumerate(dirs):
        c = F.floor(_dot_lit("uvec", p) / F.lit(float(r)))
        guarded = (
            F.when(
                (c >= -(_CELL_OFF - 1)) & (c <= _CELL_OFF - 2), c
            ).otherwise(
                F.raise_error(
                    F.lit("simproj: cell id out of packed range")
                )
            )
        )
        key = key + F.shiftleft(
            (guarded + F.lit(_CELL_OFF)).cast("long"), _CELL_BITS * j
        )
    return u.withColumn("ckey", key)


def _half_deltas(k: int) -> list[int]:
    """The (3^k - 1)/2 packed-key offsets whose FIRST nonzero field is
    +1 — exactly one of each ±δ pair, so probing home → home+δ visits
    every unordered adjacent cell pair once (self handled separately).
    ±1 per 10-bit field never carries: cell ids are guarded to
    [-(off-1), off-2] by :func:`cell_frame`."""
    deltas = [0]
    for j in range(k):
        step = 1 << (_CELL_BITS * j)
        deltas = [d + s * step for d in deltas for s in (-1, 0, 1)]
    # the most-significant nonzero field dominates the packed value
    # (lower fields contribute < one step), so "first nonzero field is
    # +1" is exactly "packed delta > 0"
    return [d for d in deltas if d > 0]


def cell_histogram(cells: DataFrame) -> DataFrame:
    """(ckey, n) — one row per occupied cell."""
    return cells.groupBy("ckey").agg(F.count("*").alias("n"))


def estimate_candidate_pairs(
    hist: DataFrame, k: int
) -> tuple[int, int, int, int]:
    """EXACT size of the unordered candidate-pair set the block join
    would verify, the max single-cell count (drives chunking), the
    packed-row replication the block join would shuffle (Σ over
    occupied adjacent cell pairs of n_a + n_b, plus self cells), and
    the block count — all from the (ckey, n) histogram alone.  The
    histogram has one row per occupied cell, so this probe is
    O(3^k × #cells / 2) skinny rows — negligible next to either real
    path.  Returns ``(pairs, max_cell, repl_rows, blocks)``."""
    half = _half_deltas(k)
    probe = hist.select(
        F.col("n").alias("na"),
        F.explode(F.array(*[F.lit(d) for d in half])).alias("delta"),
        (F.col("ckey") + F.col("delta")).alias("tkey"),
    )
    cross_row = (
        probe.join(hist, probe["tkey"] == hist["ckey"])
        .agg(
            F.sum(F.col("na") * F.col("n")).alias("cross"),
            F.sum(F.col("na") + F.col("n")).alias("cross_repl"),
            F.count("*").alias("cross_blocks"),
        )
        .collect()[0]
    )
    self_row = hist.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("self_pairs"),
        F.max("n").alias("max_cell"),
        F.sum(F.when(F.col("n") >= 2, F.col("n"))).alias("self_repl"),
        F.sum(F.when(F.col("n") >= 2, 1)).alias("self_blocks"),
    ).collect()[0]
    cross = cross_row["cross"] or 0
    repl = int((cross_row["cross_repl"] or 0) + (self_row["self_repl"] or 0))
    blocks = int(
        (cross_row["cross_blocks"] or 0) + (self_row["self_blocks"] or 0)
    )
    return (
        int(cross + (self_row["self_pairs"] or 0)),
        int(self_row["max_cell"] or 0),
        repl,
        blocks,
    )


def _packed_cells(cells: DataFrame, n_chunks: int) -> DataFrame:
    """One row per (ckey, chunk): ids ascending, labels aligned, and
    the unit vectors flattened into a single float64 array — the
    dgemm-ready block side.  ``n_chunks`` uniformly splits every cell
    (``pmod(vec_id, n_chunks)``) so no block side exceeds ~max_cell /
    n_chunks rows; 1 for the common case."""
    packed = (
        cells.select(
            "ckey",
            F.pmod(F.col("vec_id"), F.lit(n_chunks)).alias("chunk"),
            F.struct("vec_id", F.col("uvec").alias("v"), "label").alias("s"),
        )
        .groupBy("ckey", "chunk")
        .agg(F.array_sort(F.collect_list("s")).alias("pack"))
    )
    return packed.select(
        "ckey",
        "chunk",
        F.col("pack.vec_id").alias("ids"),
        F.col("pack.label").alias("labels"),
        F.flatten(F.col("pack.v")).alias("flat"),
    )


def _make_block_verify_fn(tau: float):
    """mapInPandas kernel: per block row, one ``A @ B.T`` dgemm and a
    thresholded emit of canonical (lo, hi) id pairs with labels.
    ``selfpair`` rows (same cell, same chunk, A is B) keep only the
    strict upper triangle — ids are packed ascending, so i < j ⇔
    id_i < id_j."""
    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            outs = {"a_id": [], "la": [], "b_id": [], "lb": []}
            for row in pdf.itertuples(index=False):
                a_ids = np.asarray(row.a_ids, dtype=np.int64)
                b_ids = np.asarray(row.b_ids, dtype=np.int64)
                a = np.asarray(row.a_flat, dtype=np.float64).reshape(
                    len(a_ids), -1
                )
                b = np.asarray(row.b_flat, dtype=np.float64).reshape(
                    len(b_ids), -1
                )
                cos = a @ b.T
                hit = cos >= tau
                if row.selfpair:
                    hit &= np.tri(len(a_ids), len(b_ids), k=-1, dtype=bool).T
                ii, jj = np.nonzero(hit)
                if len(ii) == 0:
                    continue
                ai = a_ids[ii]
                bi = b_ids[jj]
                al = np.asarray(row.a_labels, dtype=np.int64)[ii]
                bl = np.asarray(row.b_labels, dtype=np.int64)[jj]
                swap = ai > bi
                lo = np.where(swap, bi, ai)
                hi = np.where(swap, ai, bi)
                lol = np.where(swap, bl, al)
                hil = np.where(swap, al, bl)
                outs["a_id"].append(lo)
                outs["la"].append(lol)
                outs["b_id"].append(hi)
                outs["lb"].append(hil)
            if outs["a_id"]:
                yield pd.DataFrame(
                    {c: np.concatenate(v) for c, v in outs.items()}
                )

    return fn


def verified_pairs_blocked(
    cells: DataFrame,
    k: int,
    tau: float,
    max_cell: int,
    hist: DataFrame | None = None,
) -> DataFrame:
    """All qualifying unordered pairs (a_id < b_id, cosine >= tau)
    via the cell-pair block path: (a_id, la, b_id, lb).

    Plan shape: the histogram self-probe (16-byte rows, (3^k+1)/2
    offsets) enumerates occupied adjacent cell pairs; two equi-joins
    attach the packed block sides — each vector is shuffled once per
    occupied neighbor cell (≤ (3^k+1)/2, usually far fewer), never
    per candidate; one dgemm per block verifies."""
    n_chunks = max(1, -(-max_cell // _PACK_CAP))
    if hist is None:
        hist = cell_histogram(cells)
    half = _half_deltas(k)
    probe = hist.select(
        F.col("ckey").alias("ca"),
        F.explode(F.array(*[F.lit(d) for d in half])).alias("delta"),
    ).select("ca", (F.col("ca") + F.col("delta")).alias("cb"))
    cross = probe.join(
        hist.select(F.col("ckey").alias("cb")), "cb"
    ).select("ca", "cb")
    selfp = hist.filter(F.col("n") >= 2).select(
        F.col("ckey").alias("ca"), F.col("ckey").alias("cb")
    )
    pairs = selfp.unionByName(cross)

    packed = _packed_cells(cells, n_chunks)
    a_side = packed.select(
        F.col("ckey").alias("ca"),
        F.col("chunk").alias("ia"),
        F.col("ids").alias("a_ids"),
        F.col("labels").alias("a_labels"),
        F.col("flat").alias("a_flat"),
    )
    b_side = packed.select(
        F.col("ckey").alias("cb"),
        F.col("chunk").alias("ib"),
        F.col("ids").alias("b_ids"),
        F.col("labels").alias("b_labels"),
        F.col("flat").alias("b_flat"),
    )
    blocks = (
        pairs.join(a_side, "ca")
        .join(b_side, "cb")
        # same cell: each unordered chunk pair once (ia ≤ ib); the
        # ia == ib diagonal keeps only the strict upper triangle
        .filter((F.col("ca") != F.col("cb")) | (F.col("ia") <= F.col("ib")))
        .select(
            ((F.col("ca") == F.col("cb")) & (F.col("ia") == F.col("ib"))
             ).alias("selfpair"),
            "a_ids", "a_labels", "a_flat",
            "b_ids", "b_labels", "b_flat",
        )
    )
    return blocks.mapInPandas(
        _make_block_verify_fn(tau),
        "a_id long, la long, b_id long, lb long",
    )


def prefix_plans(hist_rows, k_hi: int):
    """Driver-side exact sweep of every prefix-k plan from the full-k
    histogram.  The packed key's low ``10·k`` bits ARE the k-prefix
    cell key (fields pack low-to-high and are offset-positive, so
    ``ckey mod 2^(10k)`` re-buckets losslessly), so one collected
    histogram yields the exact (candidates, max_cell, repl_rows) of
    EVERY k without touching the data again.  NumPy searchsorted per
    probe offset: O(Σ_k 3^k/2 × #cells(k) log #cells) — milliseconds
    next to either execution path.  Returns
    ``{k: (pairs, max_cell, repl, blocks)}``."""
    import numpy as np

    keys_full = np.array([row["ckey"] for row in hist_rows], dtype=np.int64)
    ns_full = np.array([row["n"] for row in hist_rows], dtype=np.int64)
    out = {}
    for k in range(1, k_hi + 1):
        mask = (1 << (_CELL_BITS * k)) - 1
        masked = keys_full & mask
        cells, inv = np.unique(masked, return_inverse=True)
        ns = np.zeros(len(cells), dtype=np.int64)
        np.add.at(ns, inv, ns_full)
        pairs = int((ns * (ns - 1) // 2).sum())
        repl = int(ns[ns >= 2].sum())
        blocks = int((ns >= 2).sum())
        for delta in _half_deltas(k):
            t = cells + delta
            idx = np.searchsorted(cells, t)
            idx[idx >= len(cells)] = 0
            hit = cells[idx] == t
            pairs += int((ns[hit] * ns[idx[hit]]).sum())
            repl += int((ns[hit] + ns[idx[hit]]).sum())
            blocks += int(hit.sum())
        out[k] = (pairs, int(ns.max()) if len(ns) else 0, repl, blocks)
    return out


def plan_cost(pairs: int, repl: int, blocks: int) -> float:
    """Modeled cost of one prefix-k block plan in quad-kernel
    BLAS-pair units (constants calibrated in plans/gates.py)."""
    from events_to_db_spark.plans import gates

    return (
        pairs * gates.PROJ_CAND_VS_BLAS
        + repl * gates.PROJ_ROW_VS_BLAS
        + blocks * gates.PROJ_BLOCK_VS_BLAS
    )


def escalated_pairs(
    e: DataFrame,
    tau: float,
    force: bool,
    k_req: int | None = None,
    n: int | None = None,
) -> DataFrame | None:
    """The full projection-cell escalation: normalize → top-PC dirs →
    pack cells at the explore-k → cost-plan every prefix k → verify
    the argmin plan per cell-pair block.

    Returns the qualifying unordered pairs (a_id, la, b_id, lb;
    a_id < b_id, cosine >= tau), or ``None`` when ``force`` is False
    and no prefix-k plan beats the quad kernel's N(N-1)/2 BLAS pairs
    under the calibrated cost model — the caller then keeps the
    all-pairs path.  An empty input returns an empty frame (ADVICE
    r05)."""
    from events_to_db_spark.plans.checkpoints import truncate_lineage

    r = (2.0 - 2.0 * tau) ** 0.5
    with_labels = "label" in e.columns
    u = unit_frame(
        e if with_labels else e.withColumn("label", F.lit(0)),
        with_labels=True,
    )
    dirs, k_hi = principal_dirs(u, r, k_req=k_req)
    if dirs is None:
        return e.sparkSession.createDataFrame(
            [], "a_id long, la long, b_id long, lb long"
        )
    cells = truncate_lineage(cell_frame(u, dirs, r), eager=False)
    hist = truncate_lineage(cell_histogram(cells), eager=False)
    pinned = k_req is not None or proj_k_override() is not None
    sample = hist.limit(_HIST_COLLECT_MAX + 1).collect()
    if len(sample) > _HIST_COLLECT_MAX:
        # histogram too wide to collect: single distributed estimate
        # at the explore-k (prefix sweep would cost more than it saves)
        plans = {k_hi: estimate_candidate_pairs(hist, k_hi)}
    else:
        plans = prefix_plans(sample, k_hi)
        if pinned:
            plans = {k_hi: plans[k_hi]}
    k_best = min(
        plans, key=lambda k: plan_cost(plans[k][0], plans[k][2], plans[k][3])
    )
    est, max_cell, repl, blocks = plans[k_best]
    if not force:
        from events_to_db_spark.plans import gates

        if n is None:
            n = e.count()
        # the planning probe is charged too (sunk by now, but the
        # decision must reflect the TOTAL auto-mode cost the harness
        # measures — VERDICT r06 #1)
        total = plan_cost(est, repl, blocks) + gates.PROJ_PLAN_PAIRS
        if total >= n * (n - 1) / 2.0:
            return None
    if k_best != k_hi:
        mask = (1 << (_CELL_BITS * k_best)) - 1
        cells = cells.withColumn(
            "ckey", F.col("ckey").bitwiseAND(F.lit(mask))
        )
        hist = (
            hist.withColumn("ckey", F.col("ckey").bitwiseAND(F.lit(mask)))
            .groupBy("ckey")
            .agg(F.sum("n").alias("n"))
        )
    return verified_pairs_blocked(cells, k_best, tau, max_cell, hist=hist)


def threshold_pairs_proj(
    e: DataFrame, tau: float, k: int | None = None
) -> DataFrame:
    """All qualifying unordered pairs (a_id < b_id, cosine >= tau) via
    the projection-cell path: (a_id, la, b_id, lb) — the escalated
    twin of the BLAS all-pairs kernels in llm_ops, unconditionally
    (no cost gate; see :func:`escalated_pairs`)."""
    return escalated_pairs(e, tau, force=True, k_req=k)
