#!/usr/bin/env python
"""Benchmark runner — driver contract (SURVEY.md §6 / BASELINE.md).

Runs the headline query set (B1–B12 of BASELINE.md, by contract query
id) at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total warm sec>, "unit": "sec",
     "queries": {"q_agg_q1": sec, ...}, "sf": 0.1}

Per query: one cold run then THREE warm runs (VERDICT r04 #4 — this
host's run-to-run swing on an unchanged plan measured ±30%, so a
single warm sample is noise); the reported per-query number is the
warm MEDIAN, fully collected to the driver, with per-query
``spread`` = (max−min)/median of the warm runs alongside so a drifted
round can be told from a noisy one.  Queries not yet implemented are
skipped (so the bench is runnable from the first milestone on).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

#: BASELINE.md B1..B12, in order.
BENCH_IDS = [
    "q_scan_pushdown",   # B1
    "q_agg_q1",          # B2
    "q_join_inner",      # B3
    "q_join_multiway",   # B4
    "q_win_rank",        # B5
    "q_agg_distinct",    # B6
    "q_ev_tumbling",     # B7
    "q_ev_session",      # B8
    "q_topk_group",      # B9
    "q_sim_cosine_knn",  # B10
    "q_text_wordcount",  # B11
    "q_agg_rollup",      # B12
]

#: N-set (VERDICT r06 #7): the LLM-data family's headline queries, so
#: family-level perf regressions (a gate mis-fire, a kernel slowdown)
#: show up in BENCH_r{N}.json rather than only in ad-hoc scaling runs.
#: The measured PySpark-naive bar lives in BASELINE.md §N-set
#: (tools/nbaseline.py).
NSET_IDS = [
    "q_dedup_minhash",   # N1
    "q_sim_hamming",     # N2
    "q_text_tfidf",      # N3
    "q_dedup_near",      # N4
]

WARM_RUNS = 3

#: Queries whose COLD run exceeds this get ONE warm run instead of
#: three: the median-of-3 exists to see through ±30% host swing on
#: sub-second queries (VERDICT r04 #4), where the absolute noise is
#: tens of ms; on a ~90 s query (N1 on the degenerate corpus) the
#: swing is visible in the single number and three runs would triple
#: the driver's per-round bench cost for no added signal.  Spread is
#: reported as null (None) for such queries — "not measured", which a
#: reader must not confuse with "perfectly stable" (VERDICT r07 #2).
SLOW_QUERY_CUTOFF_S = 30.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    except ValueError:  # basename not of the form sf<number>
        sf = None

    import __spark_entry__ as e
    from events_to_db_spark.session import get_spark

    qs = e.queries()
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    spreads: dict[str, float | None] = {}
    rows: dict[str, int] = {}

    def run_set(ids: list[str]) -> float:
        total = 0.0
        for name in ids:
            fn = qs.get(name)
            if fn is None:
                continue
            t0 = time.time()
            fn(spark, sf_dir).collect()  # cold (plan + JIT settling)
            cold = time.time() - t0
            n_runs = 1 if cold > SLOW_QUERY_CUTOFF_S else WARM_RUNS
            samples = []
            for _ in range(n_runs):
                t0 = time.time()
                collected = fn(spark, sf_dir).collect()
                samples.append(time.time() - t0)
            med = statistics.median(samples)
            timings[name] = round(med, 4)
            spreads[name] = (
                None
                if len(samples) < 2
                else round((max(samples) - min(samples)) / med, 3)
            )
            rows[name] = len(collected)
            total += med
        return round(total, 4)

    total_b = run_set(BENCH_IDS)
    total_n = run_set(NSET_IDS)
    print(
        json.dumps(
            {
                "metric": "median-of-3 warm wall-clock total, BASELINE.md B-set",
                "value": total_b,
                "unit": "sec",
                "value_nset": total_n,
                "queries": timings,
                "spread": spreads,
                "rows": rows,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
