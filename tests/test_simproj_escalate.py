"""Projection-cell escalation for the cosine-threshold family
(VERDICT r04 #1 / r05 #1, gate recalibrated r7 — VERDICT r06 #1): the
lossless top-PC cell candidate scheme (functions/simproj.py) must give
byte-identical answers to the BLAS all-pairs kernels under
SPARK_GRAFT_SIM_PROJ=force, on the driver corpus AND on the
anisotropic near-dup tier; and the auto gate must engage exactly where
the measured candidate/replication work says it pays — which since the
r7 recalibration against the post-`_spread` quad kernel is the LARGE
aniso tiers only (m10: 4.1-4.9×, PERF.md r7; `scaling.py --aniso`
measures the execution win).  At small N the gate must REFUSE without
running any job (size floor), and never at the driver corpus's low
thresholds (geometry)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from events_to_db_spark.functions import simproj
from events_to_db_spark.operators import llm_ops
from tests.conftest import SF_SMOKE


def _counts(spark, e, tau):
    return sorted(
        (r["same_label"], r["n_pairs"])
        for r in llm_ops.sim_threshold_counts(spark, e, tau).collect()
    )


@pytest.fixture(scope="module")
def driver_emb(spark):
    from events_to_db_spark.session import load_table

    return load_table(spark, SF_SMOKE, "embeddings").cache()


@pytest.fixture(scope="module")
def aniso_emb(spark, tmp_path_factory):
    """A small (2000-row) instance of the anisotropic near-dup tier —
    same generator as tools/scaling.py --aniso, shrunk for test
    runtime (the planted structure and latent geometry are size-
    independent)."""
    import tools.synthgen as sg

    out = tmp_path_factory.mktemp("aniso")
    orig = sg.ANISO_BASE
    sg.ANISO_BASE = 2000
    try:
        sg.generate_aniso(spark, str(out), 1)
    finally:
        sg.ANISO_BASE = orig
    return spark.read.parquet(str(out / "embeddings_aniso.parquet")).cache()


def test_force_matches_off_driver_corpus(spark, driver_emb, monkeypatch):
    """tau=0.3 is the only non-trivial threshold on the driver corpus
    (max pairwise cosine 0.513); higher taus pin the empty case."""
    for tau in (0.3, 0.5):
        monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "off")
        expected = _counts(spark, driver_emb, tau)
        monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "force")
        assert _counts(spark, driver_emb, tau) == expected
    assert expected == []  # tau=0.5 > max cosine: both paths empty


def test_force_matches_off_aniso(spark, aniso_emb, monkeypatch):
    """The design regime: high-tau near-dup screen on anisotropic
    embeddings, planted dups present."""
    for tau in (0.95, 0.98):
        monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "off")
        expected = _counts(spark, aniso_emb, tau)
        assert expected, "aniso tier must contain qualifying pairs"
        monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "force")
        assert _counts(spark, aniso_emb, tau) == expected


def test_force_matches_off_aniso_every_k(spark, aniso_emb, monkeypatch):
    """Losslessness holds for ANY projection count — pin k across the
    whole packed-key range (k=6 exercises multi-field probe deltas)."""
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "off")
    expected = _counts(spark, aniso_emb, 0.95)
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "force")
    for k in (1, 2, 4, 6):
        monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ_K", str(k))
        assert _counts(spark, aniso_emb, 0.95) == expected, f"k={k}"


def test_auto_size_floor_refuses_small(spark, aniso_emb, monkeypatch):
    """r7 recalibration (VERDICT r06 #1): below the size floor the
    planning probe alone (~2.7 s measured) costs more than the
    post-`_spread` quad kernel, so auto must refuse WITHOUT running a
    single Spark job — and therefore match the quad answer exactly."""
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "auto")
    e = aniso_emb.select(
        "vec_id", "embedding", F.col("label").cast("long").alias("label")
    )
    with monkeypatch.context() as m:
        m.setattr(
            simproj,
            "unit_frame",
            lambda *a, **k: pytest.fail(
                "size floor must refuse before any planning job"
            ),
        )
        assert llm_ops._sim_proj_verified(e, 2000, 0.95) is None
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "off")
    expected = _counts(spark, aniso_emb, 0.95)
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "auto")
    assert _counts(spark, aniso_emb, 0.95) == expected


def test_auto_cost_model_refuses_even_past_floor(spark, aniso_emb, monkeypatch):
    """With the floor overridden to 0 the model still refuses at 2000
    rows: the planning charge (PROJ_PLAN_PAIRS) alone exceeds the 2e6
    quadratic pairs — defense in depth behind the floor."""
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "auto")
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ_MIN_PAIRS", "0")
    e = aniso_emb.select(
        "vec_id", "embedding", F.col("label").cast("long").alias("label")
    )
    assert llm_ops._sim_proj_verified(e, 2000, 0.95) is None


def test_cost_model_crossover_at_m10_scale():
    """The r7-calibrated constants place the crossover between the
    aniso tiers: on the MEASURED m1 plan shapes (tools/simcal.py r7,
    20k rows) every prefix-k plan costs more than the 2e8 quad pairs
    (refuse), while at m10 (candidates ×100 by the fixed-latent-
    support density law, replication ×10, blocks ~flat) the best plan
    costs under half the 2e10 quad pairs (escalate decisively).  The
    real m10 execution win is measured by `scaling.py --aniso`
    (PERF.md r7); this pins the DECISION arithmetic."""
    from events_to_db_spark.functions.simproj import plan_cost
    from events_to_db_spark.plans import gates

    m1_plans = {  # k: (pairs, repl, blocks) — simcal r7, tau=0.95
        1: (111676778, 59976, 15),
        2: (61510089, 172875, 182),
        3: (33307392, 472318, 2082),
        4: (17982970, 1228802, 23149),
        5: (9792359, 2881395, 218734),
        6: (5463605, 4259052, 841274),
    }
    n1 = 20_000
    quad_m1 = n1 * (n1 - 1) / 2.0
    best_m1 = min(
        plan_cost(p, r, b) + gates.PROJ_PLAN_PAIRS
        for p, r, b in m1_plans.values()
    )
    assert best_m1 >= quad_m1, "gate must refuse at m1"
    assert quad_m1 < gates.proj_min_quad_pairs(), "floor refuses at m1 too"

    n10 = 200_000
    quad_m10 = n10 * (n10 - 1) / 2.0
    best_m10 = min(
        plan_cost(100 * p, 10 * r, b) + gates.PROJ_PLAN_PAIRS
        for p, r, b in m1_plans.values()
    )
    assert best_m10 < 0.5 * quad_m10, "gate must escalate decisively at m10"
    assert quad_m10 >= gates.proj_min_quad_pairs()


def test_auto_geometry_gate_refuses_low_tau(spark, driver_emb, monkeypatch):
    """r = sqrt(2-2*tau) > PROJ_MAX_RADIUS (tau < 0.755): a 3-cell
    probe covers everything, so auto must skip without paying for
    PCA — no Spark job may run."""
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "auto")
    monkeypatch.setattr(
        simproj,
        "unit_frame",
        lambda *a, **k: pytest.fail("geometry gate must refuse before PCA"),
    )
    e = driver_emb.select("vec_id", "embedding", "label")
    for tau in (0.3, 0.4, 0.7):
        assert llm_ops._sim_proj_verified(e, 1000, tau) is None


def test_min_radius_falls_back(spark, driver_emb, monkeypatch):
    """tau so close to 1 that 2/r exceeds the packed cell range must
    fall back to the quad kernels in every mode (no raise_error)."""
    tau = 1.0 - simproj.MIN_RADIUS**2 / 4.0  # r = MIN_RADIUS/sqrt(2)
    e = driver_emb.select("vec_id", "embedding", "label")
    for mode in ("auto", "force"):
        monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", mode)
        assert llm_ops._sim_proj_verified(e, 1000, tau) is None


def test_empty_frame(spark, monkeypatch):
    """ADVICE r05: force-mode on an empty embeddings frame must return
    empty, not crash in the eigendecomposition."""
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label long"
    )
    out = simproj.escalated_pairs(empty, 0.95, force=True)
    assert out.collect() == []
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "force")
    assert _counts(spark, empty, 0.95) == []


def test_prefix_plans_match_distributed_estimate(spark, aniso_emb):
    """The driver-side prefix-k sweep and the distributed histogram
    probe are two implementations of the same exact count — they must
    agree for every k, and the k-prefix masking must equal cells built
    at that k directly."""
    tau = 0.95
    r = (2.0 - 2.0 * tau) ** 0.5
    u = simproj.unit_frame(
        aniso_emb.select(
            "vec_id", "embedding", F.col("label").cast("long").alias("label")
        ),
        with_labels=True,
    )
    dirs, k_hi = simproj.principal_dirs(u, r, k_req=4)
    assert k_hi == 4
    cells = simproj.cell_frame(u, dirs, r)
    hist = simproj.cell_histogram(cells).cache()
    plans = simproj.prefix_plans(hist.collect(), 4)
    for k in (1, 2, 4):
        sub = simproj.cell_frame(u, dirs[:k], r)
        est = simproj.estimate_candidate_pairs(
            simproj.cell_histogram(sub), k
        )
        assert plans[k] == est, f"k={k}"
    hist.unpersist()


def test_half_deltas_partition_neighborhood():
    """Half-deltas must be exactly half of the nonzero 3^k offsets,
    closed under negation with no overlap (each unordered adjacent
    cell pair probed exactly once)."""
    for k in (1, 2, 3, 6):
        half = simproj._half_deltas(k)
        assert len(half) == (3**k - 1) // 2
        assert len(set(half)) == len(half)
        assert all(d > 0 for d in half)
        full = set(half) | {-d for d in half}
        assert len(full) == 3**k - 1


def test_planner_prefers_prune_over_fragmentation(spark, aniso_emb):
    """The cost model must pick an interior k on the 20k-row measured
    plan shapes (not the minimum 1, which barely prunes, and not the
    explore cap 6, whose fragmentation loses — the r7 simcal sweep:
    k=6 measured 10.5 s vs k=2's 3.0 s); and the execution-path argmin
    on the live 2000-row tier must match a driver-side recomputation
    (planner consistency)."""
    m1_plans = {  # simcal r7, tau=0.95, 20k rows
        1: (111676778, 59976, 15),
        2: (61510089, 172875, 182),
        3: (33307392, 472318, 2082),
        4: (17982970, 1228802, 23149),
        5: (9792359, 2881395, 218734),
        6: (5463605, 4259052, 841274),
    }
    k_best_m1 = min(
        m1_plans, key=lambda k: simproj.plan_cost(
            m1_plans[k][0], m1_plans[k][1], m1_plans[k][2]
        )
    )
    assert 2 <= k_best_m1 <= 5

    tau = 0.95
    r = (2.0 - 2.0 * tau) ** 0.5
    u = simproj.unit_frame(
        aniso_emb.select(
            "vec_id", "embedding", F.col("label").cast("long").alias("label")
        ),
        with_labels=True,
    )
    dirs, k_hi = simproj.principal_dirs(u, r)
    assert k_hi >= 3, "spectrum must see the latent manifold"
    cells = simproj.cell_frame(u, dirs, r)
    plans = simproj.prefix_plans(
        simproj.cell_histogram(cells).collect(), k_hi
    )
    costs = {
        k: simproj.plan_cost(p, rl, b) for k, (p, _mc, rl, b) in plans.items()
    }
    # at 2000 rows fragmentation dominates — low k must win there
    assert min(costs, key=costs.get) <= 2


def test_embed_inc_paths_agree(spark, monkeypatch):
    """q_dedup_embed_inc (r6): broadcast kernel ≡ forced projection
    path ≡ forced blocked chunk×block path — same rows exactly."""
    import __spark_entry__ as e

    fn = e.queries()["q_dedup_embed_inc"]

    def rows():
        return sorted(tuple(r) for r in fn(spark, SF_SMOKE).collect())

    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "off")
    base = rows()
    assert base, "smoke corpus must contain cross-side matches"
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "force")
    assert rows() == base
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "off")
    monkeypatch.setenv("SPARK_GRAFT_SIM_BROADCAST_MAX", "0")
    monkeypatch.setenv("SPARK_GRAFT_SIM_BLOCK_ROWS", "37")
    assert rows() == base


def test_proj_decision_record(spark, aniso_emb, driver_emb, monkeypatch):
    """VERDICT r07 #1: the gate's decision is OBSERVABLE
    (llm_ops.LAST_PROJ_DECISION), so harnesses assert the decision
    itself — scaling.py --aniso's m1 tier pins refuse_floor/zero_jobs
    instead of a wall-clock band narrower than host noise."""
    e = aniso_emb.select(
        "vec_id", "embedding", F.col("label").cast("long").alias("label")
    )
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "auto")
    assert llm_ops._sim_proj_verified(e, 2000, 0.95) is None
    d = llm_ops.LAST_PROJ_DECISION
    assert d["outcome"] == "refuse_floor" and d["zero_jobs"]
    assert d["mode"] == "auto" and d["n"] == 2000 and d["tau"] == 0.95

    # geometry refusal (low tau, radius > PROJ_MAX_RADIUS) — also free
    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ_MIN_PAIRS", "0")
    assert llm_ops._sim_proj_verified(e, 2000, 0.3) is None
    assert llm_ops.LAST_PROJ_DECISION["outcome"] == "refuse_radius"
    assert llm_ops.LAST_PROJ_DECISION["zero_jobs"]

    # cost-model refusal PAST the floor runs planning jobs: not free
    assert llm_ops._sim_proj_verified(e, 2000, 0.95) is None
    d = llm_ops.LAST_PROJ_DECISION
    assert d["outcome"] == "refuse_work" and not d["zero_jobs"]

    monkeypatch.setenv("SPARK_GRAFT_SIM_PROJ", "off")
    llm_ops.sim_threshold_counts(spark, e, 0.95).collect()
    assert llm_ops.LAST_PROJ_DECISION["outcome"] == "off"
