"""Adaptive-plan gates derived from cluster configuration (VERDICT
r03 #7).

Two families of data-size gates guard the engine's adaptive operators:

* **Broadcast gates** (sim/embedding family): how many reference rows
  may be collected + broadcast as a packed ndarray before the operator
  switches to its distributed blocked path.  Derived from
  ``spark.sql.autoBroadcastJoinThreshold`` — the cluster operator's
  single knob for "how much data may be broadcast" — times a
  documented multiplier: a packed primitive float64 matrix has no
  per-row hash-table/object overhead, so it can safely be ~100× the
  byte budget Catalyst allows for a broadcast HASH table.  At the
  10 MiB default this yields 100 × 10 MiB / 512 B = 2,048,000 rows of
  64-dim float64 ≈ 1 GiB — the long-standing fixed default, now
  conf-responsive.  Setting the threshold to ``-1`` (broadcast ban)
  forces every gated operator onto its distributed path.

* **Block gates** (quadratic in-block candidate joins): the largest
  key block the blocked self-join may handle before escalating to an
  inverted-index candidate engine.  A block's pairs land in ONE task
  (equi-join on the block key), so the bound is per-task compute, not
  cluster size: ``rows = sqrt(2 × pair_budget × spark.task.cpus)``.
  The per-task pair budgets reproduce the proven defaults (5e11 →
  1M rows for Jaccard verify, 2e10 → 200k for the costlier banded
  Levenshtein verify).

Every gate keeps its env override (tests force escalation with it;
operators pin behavior with it), which always wins over derivation.
"""

from __future__ import annotations

import math
import os
import re

from pyspark.sql import SparkSession

_BYTES_SUFFIX = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
}


def parse_byte_conf(text: str) -> int:
    """Spark byte-string conf → bytes (``10485760``, ``10m``, ``1g``,
    ``-1`` …); mirrors Spark's JavaUtils suffix set."""
    t = str(text).strip().lower()
    m = re.fullmatch(r"(-?\d+)\s*([a-z]*)", t)
    if not m:
        raise ValueError(f"unparseable byte conf: {text!r}")
    n, suffix = int(m.group(1)), m.group(2)
    if suffix and suffix not in _BYTES_SUFFIX:
        raise ValueError(f"unknown byte suffix in conf: {text!r}")
    return n * (_BYTES_SUFFIX[suffix] if suffix else 1)


def _conf(key: str, default: str) -> str:
    spark = SparkSession.getActiveSession()
    if spark is None:
        return default
    try:
        return spark.conf.get(key, default)
    except Exception:
        return default


#: Packed-ndarray broadcast may be this many times the broadcast-hash-
#: table byte threshold (no per-row JVM object/hash overhead).
BROADCAST_MULT = 100

_AUTO_BCAST_DEFAULT = str(10 * 1024 * 1024)


def broadcast_rows_gate(
    env_key: str,
    bytes_per_row: int = 512,
    lo: int = 0,
    hi: int = 50_000_000,
) -> int:
    """Max reference rows to collect + broadcast for the sim family.

    Env override wins; otherwise derived from the session's
    ``spark.sql.autoBroadcastJoinThreshold`` (×\\ :data:`BROADCAST_MULT`,
    ÷ packed row bytes).  A non-positive threshold (broadcast ban)
    yields 0 — the gated operators then always take their distributed
    blocked path."""
    env = os.environ.get(env_key)
    if env is not None:
        return int(env)
    thr = parse_byte_conf(
        _conf("spark.sql.autoBroadcastJoinThreshold", _AUTO_BCAST_DEFAULT)
    )
    if thr <= 0:
        return 0
    return max(lo, min(hi, BROADCAST_MULT * thr // bytes_per_row))


#: Measured cost ratio between one banded-MinHash row (64-signature
#: NumPy kernel + 32-band shuffle + bucket join + verify, amortized)
#: and one in-block Jaccard pair verify (array_intersect/union on
#: ~40-token arrays).  On the 50k-doc realistic synthetic tier
#: (PERF.md round 4): band 8.9 s ≈ 178 µs·cores/row, quadratic 28.4 s
#: over 1.25e7 pairs ≈ 2.3 µs·cores/pair → equal cost at ~80
#: candidate pairs per row.  Worst case on the WRONG side: the
#: degenerate 31-token-vocab driver corpus at sf0.1 (banding
#: selectivity ≈ 1, so the band path degenerates to quad + banding
#: overhead) measures band 4.4 s vs quad 2.2 s — a bounded 2× — while
#: staying quadratic past the crossover on a realistic corpus costs
#: 3.2× and grows with block size.  Both sides scale with cores, so
#: the ratio is hardware-stable and needs no conf derivation.
#: RE-MEASURED r11 after the verify kernel changed (derived-union
#: Jaccard, llm_ops.near_dup_pairs): quad 28.0 s / 1.25e7 pairs =
#: 2.24 µs·cores/pair, band 9.10 s / 50k rows = 182 µs·cores/row →
#: crossover 81.1 — the constant stands (on realistic ~50-token docs
#: array_intersect dominates the per-pair cost; the union saving
#: mostly benefits the degenerate short-vocab corpus).  PERF.md r11.
QUAD_VS_BAND_PAIRS_PER_ROW = 80.0


def pairs_per_row_gate(env_key: str) -> float:
    """Average in-block candidate pairs per row (Σ block²/2N) above
    which a blocked quadratic Jaccard join escalates onto the banded-
    MinHash candidate engine.

    This compares the TOTAL work of the two strategies — Σ block²
    pair verifies vs N banded rows — so one hot block in a huge
    corpus escalates only when the quadratic work actually dominates
    (a max-block-rows criterion can neither see that nor avoid paying
    whole-corpus banding for one modest block).  Env override wins
    (tests force escalation with it)."""
    env = os.environ.get(env_key)
    if env is not None:
        return float(env)
    return QUAD_VS_BAND_PAIRS_PER_ROW


#: Cost model for the projection-cell block plan, in units of one
#: quad-kernel BLAS pair.  Since round 6 candidates are verified per
#: cell-pair block with one dgemm per block (functions/simproj.py
#: verified_pairs_blocked) — the same kernel family as the quad path —
#: so the model is three measured terms: per verified candidate (a
#: dgemm element), per replicated packed vector row (512 B of float64
#: through the pack groupBy + cell-pair join + Arrow), and per block
#: (join-row + kernel dispatch overhead — the term that punishes
#: fragmentation at high k).
#:
#: THE UNIT IS A MEASUREMENT, NOT A PROPERTY (VERDICT r06 #1): r6's
#: `_spread`/`rechunk` made the quad kernel ~3-6x faster and silently
#: invalidated the r6 calibration — the gate then escalated into a
#: 0.33-0.7x LOSS on its own showcase tier.  Re-calibrated r7 against
#: the post-`_spread` kernel (tools/simcal.py, aniso m1, per-k forced
#: sweep at tau 0.95/0.98 with the per-candidate cost floored at the
#: measured quad rate of ~9 ns/pair): candidate ~1.0, row ~114,
#: block ~574, planning overhead ~2.7 s ≈ 3.0e8 pair units (PERF.md
#: r7).  Shipped values round UP so the gate only escalates on a
#: decisive prune.  Re-run simcal.py + `scaling.py --aniso` after ANY
#: change to kernels.py / _spread / simproj.py / these constants.
PROJ_CAND_VS_BLAS = 1.5
PROJ_ROW_VS_BLAS = 150.0
PROJ_BLOCK_VS_BLAS = 800.0

#: Planning overhead (unit frame + distributed PCA + cell histogram +
#: collect + prefix sweep) in BLAS-pair units — measured 2.7 s at
#: ~9 ns/pair (simcal.py r7), rounded up.  Charged to the plan cost in
#: the escalate decision, and the basis of the size floor below.
PROJ_PLAN_PAIRS = 4.0e8


def proj_min_quad_pairs(
    env_key: str = "SPARK_GRAFT_SIM_PROJ_MIN_PAIRS",
) -> float:
    """Quadratic-pair floor below which auto mode refuses WITHOUT
    paying any planning job: at 10x the measured planning overhead the
    probe itself costs >10% of simply running the quad kernel, so no
    prune can win decisively (at the r6 aniso m1 tier — 20k rows,
    2e8 pairs — the quad kernel finishes in ~2 s while planning alone
    costs ~2.7 s; the win regime starts around the m10 tier, 200k
    rows / 2e10 pairs, where planning is ~2% of quad).  Env override
    for tests."""
    env = os.environ.get(env_key)
    if env is not None:
        return float(env)
    return 10.0 * PROJ_PLAN_PAIRS

#: Geometry pre-gate: cells have width r = sqrt(2 - 2*tau) and unit-
#: vector projections span at most [-1, 1], so once r exceeds this
#: fraction of the full span the 3-cell probe covers everything and
#: the machinery cannot prune — skip it without paying the PCA/
#: histogram probe.  r <= 0.7 ⇔ tau >= 0.755.
PROJ_MAX_RADIUS = 0.7


def sim_proj_mode(env_key: str = "SPARK_GRAFT_SIM_PROJ") -> str:
    """Projection-cell escalation mode for the cosine-threshold family:
    ``auto`` (measured work gate decides), ``force`` (always escalate —
    tests pin hash-equality with it), ``off`` (always quad)."""
    mode = os.environ.get(env_key, "auto").lower()
    if mode not in ("auto", "force", "off"):
        raise ValueError(f"{env_key} must be auto|force|off, got {mode!r}")
    return mode


def chunk_rows_gate(
    env_key: str,
    bytes_per_row: int,
    lo: int = 1_000,
    hi: int = 10_000_000,
) -> int:
    """Rows per PACKED chunk for block-nested-loop paths (the r6
    answer to the `_SIM_BLOCK_ROWS` fixed constant, VERDICT r04 #7):
    one packed chunk is one task-side build row, so its byte size
    should track the cluster's partition-size comfort zone —
    ``spark.sql.files.maxPartitionBytes`` (the operator's knob for
    "how much data may one task hold"), halved because two packed
    sides meet in a join task.  At the 128 MiB default and 512 B/row
    this yields 131,072 rows (~64 MiB) — the same order as the
    long-standing 100k constant, now conf-responsive.  Env override
    wins (tests pin chunk counts with it)."""
    env = os.environ.get(env_key)
    if env is not None:
        return int(env)
    part = parse_byte_conf(
        _conf("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    return max(lo, min(hi, part // (2 * bytes_per_row)))


def block_rows_gate(env_key: str, pair_budget: float) -> int:
    """Max rows in the largest key block before a quadratic in-block
    self-join escalates to its inverted-index candidate engine.

    Env override wins; otherwise ``sqrt(2 × pair_budget × task_cpus)``
    — one block's pair space runs in one task, so the bound scales
    with per-task compute only."""
    env = os.environ.get(env_key)
    if env is not None:
        return int(env)
    cpus = int(_conf("spark.task.cpus", "1"))
    return int(math.sqrt(2.0 * pair_budget * max(cpus, 1)))
