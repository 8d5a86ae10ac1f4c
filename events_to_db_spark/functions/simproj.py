"""Lossless projection-cell candidates for cosine-threshold joins
(VERDICT r04 #1 — the escalation path for the sim family's last
all-pairs O(N·M) component).

Geometry.  On L2-normalized vectors, ``cos(a, b) >= tau`` is exactly
``||a - b|| <= r`` with ``r = sqrt(2 - 2*tau)``.  For ANY unit
direction ``p``, ``|p.a - p.b| <= ||a - b||``, so bucketing each
vector by ``floor((p.v) / r)`` guarantees every qualifying pair sits
in the same or an adjacent cell — a 3-cell 1-D probe per projection
is recall-LOSSLESS, and ``k`` independent projections intersect
multiplicatively (a pair must be cell-adjacent in every projection).
The probe offset from a vector's home cell to its partner's home cell
is unique, so each unordered pair is generated at most once (the
``q_join_grid`` invariant, joins.py, lifted from 2-D to k-D).

Direction choice.  Any directions are lossless, so the engine picks
the ones that PRUNE best: the top-k principal components of the unit
vectors (covariance is d×d = 64×64 — one distributed Gram pass, then
a driver-side eigh on 4 KiB of floats; scale-free).  Real embedding
corpora are strongly anisotropic (a few PCs carry most variance), so
top-PC cells spread candidates out; on an isotropic corpus every
projection concentrates in ±1/sqrt(d) and the cells collapse into
one bucket — which the work gate detects and refuses (see below).

When it cannot win — and how the gate knows.  Cells have width ``r``
and unit-vector projections live in [-1, 1], so the scheme only
discriminates when ``r`` is well under the projection spread:
``tau = 0.95`` gives r = 0.316 (~6 cells per projection);
``tau = 0.3`` gives r = 1.183 (two cells — hopeless, and the geometry
pre-gate skips the machinery without paying for it).  Even past the
pre-gate the engine first builds the cell HISTOGRAM and computes the
exact candidate-join size (a 3^k-offset self-join of (cell, count) —
tiny), then escalates only when that measured candidate count beats
the quadratic kernel's work under the cost model in plans/gates.py.
The important honesty note: when the qualifying-pair ANSWER is itself
Θ(N²) (low tau on clustered data — e.g. the driver corpus at
tau = 0.3), no lossless candidate scheme can beat the BLAS all-pairs
kernel, and this gate correctly keeps it.  The projection path wins
in the regime it was built for: high-tau near-duplicate screens over
anisotropic embeddings, where candidates ≈ answers ≈ O(N).

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


def proj_k(default: int = 3) -> int:
    """Number of projections (3^k probe offsets; k=3 → 27, the same
    fan-out as the 3-D grid join).  SPARK_GRAFT_SIM_PROJ_K overrides."""
    return int(os.environ.get("SPARK_GRAFT_SIM_PROJ_K", str(default)))


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


def top_principal_dirs(u: DataFrame, k: int):
    """Top-k principal directions of the unit vectors.

    Distributed part: per-Arrow-batch partial (n, Σv, ΣvvT) flattened
    to (idx, val) rows and hash-aggregated — the shuffle carries
    O(#batches × d²) skinny rows (d = 64 → 4 KiB per batch), never
    vectors.  Driver part: assemble the d×d covariance and ``eigh`` it
    (4 KiB of floats — bounded by dimension, not data)."""
    import numpy as np
    import pandas as pd

    def gram_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["uvec"].to_numpy())
            d = mat.shape[1]
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
    flat = {r["idx"]: r["val"] for r in parts}
    n_idx = len(flat)
    # layout: [0] = n, [1..d] = Σv, [d+1..] = ΣvvT
    d = int(round((-1 + (1 + 4 * (n_idx - 1)) ** 0.5) / 2))
    n = flat[0]
    mean = np.array([flat[1 + j] for j in range(d)]) / n
    gram = np.array(
        [[flat[1 + d + i * d + j] for j in range(d)] for i in range(d)]
    )
    cov = gram / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    dirs = v[:, ::-1][:, :k].T  # (k, d), top-k by variance
    return np.ascontiguousarray(dirs)


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


def _probe_deltas(k: int) -> list[int]:
    """All 3^k packed-key offsets of the ±1 cell neighborhood."""
    deltas = [0]
    for j in range(k):
        step = 1 << (_CELL_BITS * j)
        deltas = [d + s * step for d in deltas for s in (-1, 0, 1)]
    return deltas


def estimate_candidate_pairs(cells: DataFrame, k: int) -> int:
    """EXACT size of the unordered candidate-pair set the probe join
    would generate, from the (ckey, count) histogram alone — Σ over
    adjacent cell pairs of n_a·n_b, self-pairs removed, halved.  The
    histogram has one row per occupied cell, so this probe is O(3^k ×
    #cells) — negligible next to either real path."""
    hist = cells.groupBy("ckey").agg(F.count("*").alias("n"))
    deltas = _probe_deltas(k)
    probe = hist.select(
        F.col("n").alias("na"),
        F.explode(
            F.array(*[F.lit(d) for d in deltas])
        ).alias("delta"),
        (F.col("ckey") + F.col("delta")).alias("tkey"),
    )
    row = (
        probe.join(hist, probe["tkey"] == hist["ckey"])
        .agg(
            F.sum(F.col("na") * F.col("n")).alias("directed"),
            F.sum(F.when(F.col("delta") == 0, F.col("n"))).alias("self_n"),
        )
        .collect()[0]
    )
    directed = row["directed"] or 0
    self_n = row["self_n"] or 0
    return int((directed - self_n) // 2)


def candidate_pairs(cells: DataFrame, k: int) -> DataFrame:
    """Unordered candidate pairs (a_id < b_id) with both unit vectors
    and labels, via the one-sided 3^k-offset probe join.

    The probe side is SKINNY (a_id, target key — 16 bytes) so the 3^k
    fan-out never replicates vectors; the a-side vector is fetched by
    one equi-join after the candidate set is known.  Requires a
    ``label`` column (callers synthesize a zero literal when unused).
    """
    deltas = _probe_deltas(k)
    probe = cells.select(
        F.col("vec_id").alias("a_id"),
        "ckey",
        F.explode(F.array(*[F.lit(d) for d in deltas])).alias("delta"),
    ).select("a_id", (F.col("ckey") + F.col("delta")).alias("tkey"))
    build = cells.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("lb"),
        F.col("uvec").alias("b_uvec"),
        "ckey",
    )
    cand = (
        probe.join(build, probe["tkey"] == build["ckey"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "lb", "b_uvec")
    )
    a_side = cells.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("la"),
        F.col("uvec").alias("a_uvec"),
    )
    return cand.join(a_side, "a_id").select(
        "a_id", "la", "a_uvec", "b_id", "lb", "b_uvec"
    )


def verify_pairs(cand: DataFrame, tau: float) -> DataFrame:
    """Exact cosine check on candidate pairs — vectorized einsum per
    Arrow batch; emits only the qualifying (a_id, la, b_id, lb)."""
    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            a = np.stack(pdf["a_uvec"].to_numpy())
            b = np.stack(pdf["b_uvec"].to_numpy())
            cos = np.einsum("ij,ij->i", a, b)
            keep = cos >= tau
            yield pd.DataFrame(
                {
                    "a_id": pdf["a_id"].to_numpy()[keep],
                    "la": pdf["la"].to_numpy()[keep],
                    "b_id": pdf["b_id"].to_numpy()[keep],
                    "lb": pdf["lb"].to_numpy()[keep],
                }
            )

    return cand.mapInPandas(fn, "a_id long, la long, b_id long, lb long")


def threshold_pairs_proj(
    e: DataFrame, tau: float, k: int | None = None
) -> DataFrame:
    """All qualifying unordered pairs (a_id < b_id, cosine >= tau) via
    the projection-cell path: (a_id, la, b_id, lb) — the escalated
    twin of the BLAS all-pairs kernels in llm_ops."""
    from events_to_db_spark.plans.checkpoints import truncate_lineage

    k = proj_k() if k is None else k
    r = (2.0 - 2.0 * tau) ** 0.5
    with_labels = "label" in e.columns
    u = unit_frame(
        e if with_labels else e.withColumn("label", F.lit(0)),
        with_labels=True,
    )
    dirs = top_principal_dirs(u, k)
    cells = truncate_lineage(cell_frame(u, dirs, r), eager=False)
    return verify_pairs(candidate_pairs(cells, k), tau)
