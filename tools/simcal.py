"""Calibrate the simproj cost-model constants against the CURRENT
quad kernel (VERDICT r06 #1).

The 3-term gate model (plans/gates.py PROJ_*) prices a projection-cell
block plan in units of "one quad-kernel BLAS pair".  That unit is a
MEASURED quantity and r6 proved it is not a property: `_spread` +
`rechunk` made the quad kernel ~3-6x faster and silently invalidated
the shipped constants (the gate then escalated into a LOSS on its own
showcase regime).  This tool re-derives the constants from scratch;
run it — and `tools/scaling.py --aniso` — after ANY change to
functions/kernels.py, llm_ops._spread, plans/gates.py, or
functions/simproj.py.

Method, per tau in (0.95, 0.98) on the aniso m1 tier (20k rows):

* quad rate: median-of-3 warm `sim_threshold_counts` with
  SPARK_GRAFT_SIM_PROJ=off → seconds per BLAS pair (pairs = N(N-1)/2);
* plan shapes: ONE full-k histogram collect → `prefix_plans` exact
  (candidates, max_cell, repl_rows, blocks) for every k;
* forced runs: median-of-2 warm runs at every k (SIM_PROJ=force +
  SIM_PROJ_K=k) — each includes the planning overhead (unit frame,
  PCA, histogram collect), which the fit absorbs as an intercept;
* least squares over all (tau, k) points:
  t = t_plan + C·pairs + R·repl + B·blocks  (seconds), then divide
  C/R/B by the measured seconds-per-pair to get the gate's pair-unit
  constants, and t_plan by it to get the planning-overhead floor
  (gates.PROJ_PLAN_PAIRS).

Prints one JSON line with the measured rates, the fitted constants,
and suggested shipped values (rounded UP so auto only escalates on a
decisive win).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import numpy as np

    from events_to_db_spark.functions import simproj
    from events_to_db_spark.operators.llm_ops import sim_threshold_counts
    from events_to_db_spark.session import get_spark
    from tools.synthgen import generate_aniso

    base = Path(
        os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")
    )
    spark = get_spark("simcal")
    spark.sparkContext.setLogLevel("ERROR")
    tier = base / "aniso_m1"
    if not (tier / "embeddings_aniso.parquet").exists():
        print(f"generating aniso tier at {tier} ...", flush=True)
        generate_aniso(spark, str(tier), 1)
    e = spark.read.parquet(str(tier / "embeddings_aniso.parquet")).cache()
    n = e.count()
    quad_pairs = n * (n - 1) / 2.0

    def timed(mode: str, k: int | None, runs: int) -> float:
        os.environ["SPARK_GRAFT_SIM_PROJ"] = mode
        if k is not None:
            os.environ["SPARK_GRAFT_SIM_PROJ_K"] = str(k)
        try:
            sim_threshold_counts(spark, e, tau).collect()  # warm
            samples = []
            for _ in range(runs):
                t0 = time.time()
                sim_threshold_counts(spark, e, tau).collect()
                samples.append(time.time() - t0)
            return statistics.median(samples)
        finally:
            os.environ.pop("SPARK_GRAFT_SIM_PROJ", None)
            os.environ.pop("SPARK_GRAFT_SIM_PROJ_K", None)

    rows = []  # (pairs, repl, blocks, seconds)
    out = {"n": n, "quad_pairs": quad_pairs, "taus": {}}
    for tau in (0.95, 0.98):
        r = (2.0 - 2.0 * tau) ** 0.5
        quad_s = timed("off", None, 3)
        sec_per_pair = quad_s / quad_pairs
        u = simproj.unit_frame(e.select("vec_id", "embedding", "label"), True)
        dirs, k_hi = simproj.principal_dirs(u, r)
        cells = simproj.cell_frame(u, dirs, r)
        hist_rows = simproj.cell_histogram(cells).collect()
        plans = simproj.prefix_plans(hist_rows, k_hi)
        per_k = {}
        for k, (pairs, max_cell, repl, blocks) in sorted(plans.items()):
            fs = timed("force", k, 2)
            rows.append((pairs, repl, blocks, fs))
            per_k[k] = {
                "pairs": pairs, "repl": repl, "blocks": blocks,
                "force_s": round(fs, 2),
            }
            print(
                f"tau={tau} k={k} pairs={pairs:.3g} repl={repl:.3g} "
                f"blocks={blocks} force={fs:.2f}s",
                flush=True,
            )
        out["taus"][str(tau)] = {
            "quad_s": round(quad_s, 2),
            "sec_per_pair": sec_per_pair,
            "per_k": per_k,
        }
        print(f"tau={tau} quad={quad_s:.2f}s "
              f"({sec_per_pair*1e9:.2f} ns/pair)", flush=True)

    a = np.array([[1.0, p, rl, b] for p, rl, b, _ in rows])
    t = np.array([s for *_, s in rows])
    coef, *_ = np.linalg.lstsq(a, t, rcond=None)
    spp = statistics.median(
        v["sec_per_pair"] for v in out["taus"].values()
    )
    fitted = {
        "t_plan_s": coef[0],
        "cand_s": coef[1],
        "row_s": coef[2],
        "block_s": coef[3],
        "sec_per_pair": spp,
        "cand_units": coef[1] / spp,
        "row_units": coef[2] / spp,
        "block_units": coef[3] / spp,
        "plan_units": coef[0] / spp,
    }
    out["fit"] = {k: float(v) for k, v in fitted.items()}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
