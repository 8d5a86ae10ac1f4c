#!/usr/bin/env python
"""Whole-registry plan + timing audit.

Runs EVERY contract query at a given sf-dir, collects the executed
physical plan, flags scale smells, and prints a per-query line plus a
JSON summary:

* ``CartesianProduct`` anywhere it is not the declared intent
  (only ``q_join_cross`` may cartesian) → hard failure, exit 1.
* counts of Exchange / BroadcastHashJoin / SortMergeJoin /
  BroadcastNestedLoopJoin nodes and the warm wall-clock, so plan
  regressions (a new shuffle, a broadcast that stopped broadcasting)
  show up as diffs in this output between rounds.

Usage: python tools/audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: queries whose *declared semantics* is a cartesian product
CARTESIAN_OK = {"q_join_cross"}


def main() -> int:
    import __spark_entry__ as e
    from events_to_db_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(e.queries())

    spark = get_spark("audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    bad: list[str] = []
    rows = []
    for name in names:
        qs[name](spark, sf_dir).collect()  # cold run
        t0 = time.time()
        df = qs[name](spark, sf_dir)  # fresh plan: no memoized-RDD stage skip
        n = len(df.collect())
        warm = time.time() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = {
            k: plan.count(k)
            for k in (
                "CartesianProduct",
                "Exchange",
                "BroadcastHashJoin",
                "SortMergeJoin",
                "BroadcastNestedLoopJoin",
                "HashAggregate",
            )
        }
        cart_bad = counts["CartesianProduct"] > 0 and name not in CARTESIAN_OK
        if cart_bad:
            bad.append(name)
        rows.append({"name": name, "rows": n, "warm_s": round(warm, 3), **counts})
        print(
            f"{'!! ' if cart_bad else ''}{name:26s} {warm:7.2f}s {n:8d} rows  "
            f"Ex={counts['Exchange']} BHJ={counts['BroadcastHashJoin']} "
            f"SMJ={counts['SortMergeJoin']} BNLJ={counts['BroadcastNestedLoopJoin']} "
            f"CART={counts['CartesianProduct']}"
        )
    total = sum(r["warm_s"] for r in rows)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(rows),
                "total_warm_s": round(total, 2),
                "unexpected_cartesian": bad,
            }
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
