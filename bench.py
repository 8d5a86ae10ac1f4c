#!/usr/bin/env python
"""Benchmark runner — driver contract (SURVEY.md §6 / BASELINE.md).

Runs the headline query set (B1–B12 of BASELINE.md, by contract query
id) at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total warm sec>, "unit": "sec",
     "queries": {"q_agg_q1": sec, ...}, "sf": 0.1}

Per query: one cold run then one warm run (the BASELINE.md method);
the reported number is the warm run, fully collected to the driver.
Queries not yet implemented are skipped (so the bench is runnable from
the first milestone on).
"""

from __future__ import annotations

import json
import os
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
    rows: dict[str, int] = {}
    for name in BENCH_IDS:
        fn = qs.get(name)
        if fn is None:
            continue
        best = None
        for _ in range(2):  # cold, then warm
            t0 = time.time()
            collected = fn(spark, sf_dir).collect()
            best = time.time() - t0
        timings[name] = round(best, 4)
        rows[name] = len(collected)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "warm wall-clock total, BASELINE.md B-set",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": rows,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
