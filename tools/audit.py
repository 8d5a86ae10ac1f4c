#!/usr/bin/env python
"""Whole-registry plan + timing audit, with a plan-shape golden gate.

Runs contract queries at a given sf-dir, collects the executed physical
plan, flags scale smells, and prints a per-query line plus a JSON
summary:

* ``CartesianProduct`` anywhere it is not the declared intent
  (only ``q_join_cross`` may cartesian) → hard failure, exit 1.
* counts of Exchange / join nodes / SortAggregate and the warm
  wall-clock, so plan regressions (a new shuffle, a broadcast that
  stopped broadcasting, a hash-agg degrading to sort-agg) show up as
  diffs in this output between rounds.

Plan-shape golden gate (VERDICT r03 #2 — the round-3 traps were caught
by *timing*, not by an invariant; this makes plan shape regression-
guarded):

* ``python tools/audit.py --record-plans``  → snapshot every query's
  fingerprint at sf0.01 into ``tools/plan_golden.json`` (check it in).
* ``python tools/audit.py --plans [name ...]`` → re-fingerprint and
  exit 1 on ANY diff vs the golden file, printing per-key deltas.

Fingerprints count plan nodes only (no timings, no row counts), so
they are deterministic at a fixed sf-dir; adaptive gates (broadcast /
block-size probes) resolve the same way every run on the same data.

Usage: python tools/audit.py [--plans|--record-plans] [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: queries whose *declared semantics* is a cartesian product
CARTESIAN_OK = {"q_join_cross"}

GOLDEN_PATH = Path(__file__).resolve().parent / "plan_golden.json"

#: Substring-counted plan nodes forming the fingerprint.  Note
#: "Exchange" also matches BroadcastExchange/ReusedExchange — the
#: combined count is deterministic and kept for continuity with the
#: per-round audit logs; the specific keys break it down.
FINGERPRINT_KEYS = (
    "CartesianProduct",
    "Exchange",
    "BroadcastExchange",
    "ReusedExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "HashAggregate",
    "SortAggregate",
)


def plan_fingerprint(df) -> dict:
    """Node-count fingerprint of the EXECUTED plan.  Call after an
    action so AQE has finalized (pre-execution the adaptive plan is
    still the unresolved logical shell)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {k: plan.count(k) for k in FINGERPRINT_KEYS}


def diff_fingerprint(golden: dict, got: dict) -> list[str]:
    """Human-readable per-key deltas; empty list = plans match."""
    out = []
    for k in FINGERPRINT_KEYS:
        g, n = golden.get(k, 0), got.get(k, 0)
        if g != n:
            out.append(f"{k}: golden={g} now={n}")
    return out


def _run_fingerprint(qs, name, spark, sf_dir) -> tuple[dict, int, float]:
    df = qs[name](spark, sf_dir)
    t0 = time.time()
    n = len(df.collect())
    return plan_fingerprint(df), n, time.time() - t0


def plans_mode(record: bool, sf_dir: str, names: list[str]) -> int:
    import __spark_entry__ as e
    from events_to_db_spark.session import get_spark

    spark = get_spark("audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = names or sorted(qs)
    golden = (
        json.loads(GOLDEN_PATH.read_text()) if GOLDEN_PATH.exists() else {}
    )
    failures: list[str] = []
    for name in names:
        fp, _, _ = _run_fingerprint(qs, name, spark, sf_dir)
        if record:
            golden[name] = fp
            print(f"rec  {name}")
            continue
        if name not in golden:
            failures.append(name)
            print(f"MISS {name}: not in golden (run --record-plans)")
            continue
        deltas = diff_fingerprint(golden[name], fp)
        if deltas:
            failures.append(name)
            print(f"DIFF {name}: " + "; ".join(deltas))
        else:
            print(f"ok   {name}")
    if record:
        GOLDEN_PATH.write_text(
            json.dumps({k: golden[k] for k in sorted(golden)}, indent=1) + "\n"
        )
        print(f"recorded {len(names)} fingerprints -> {GOLDEN_PATH}")
        return 0
    print(f"{len(names) - len(failures)} ok, {len(failures)} diff/missing")
    return 1 if failures else 0


def main() -> int:
    args = sys.argv[1:]
    mode = None
    if args and args[0] in ("--plans", "--record-plans"):
        mode = args.pop(0)
    sf_dir = (
        args.pop(0) if args and not args[0].startswith("q_") else "/root/testdata/sf0.01"
    )
    names = list(args)
    if mode:
        return plans_mode(mode == "--record-plans", sf_dir, names)

    import __spark_entry__ as e
    from events_to_db_spark.session import get_spark

    names = names or sorted(e.queries())
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
        counts = plan_fingerprint(df)
        cart_bad = counts["CartesianProduct"] > 0 and name not in CARTESIAN_OK
        if cart_bad:
            bad.append(name)
        rows.append({"name": name, "rows": n, "warm_s": round(warm, 3), **counts})
        print(
            f"{'!! ' if cart_bad else ''}{name:26s} {warm:7.2f}s {n:8d} rows  "
            f"Ex={counts['Exchange']} BHJ={counts['BroadcastHashJoin']} "
            f"SMJ={counts['SortMergeJoin']} BNLJ={counts['BroadcastNestedLoopJoin']} "
            f"SortAgg={counts['SortAggregate']} CART={counts['CartesianProduct']}"
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
