#!/usr/bin/env python
"""N-set drift gate (VERDICT r07 #5) — make BASELINE.md's documented
drift rule EXECUTABLE, so an LLM-family perf regression fails the
round battery instead of relying on a human reading BENCH JSON.

Checks, for the N-set queries (bench.py NSET_IDS):

1. **Round-over-round drift**: new/old > ``DRIFT_RATIO`` (1.5, the
   threshold BASELINE.md §N-set names for N1) AND the absolute move
   exceeds ``DRIFT_ABS_FLOOR_S`` — the floor exists because a
   sub-second query's 1.5× is inside this host's measured same-plan
   swing (BENCH_r07 recorded spread 0.645 on q_sim_hamming; a gate
   that flips on host noise trains rounds to ignore it, VERDICT r07
   "what's wrong" #1).
2. **Absolute bar vs the measured PySpark-naive column** (BASELINE.md
   §N-set, warm): engine median must stay within ``NAIVE_BAR`` (2×)
   of naive for N2–N4.  N1 is excluded from the absolute bar by
   BASELINE's own note (answer-size-bound on the degenerate corpus —
   drift is its signal), but still gets check 1.

Usage::

    python tools/benchdrift.py                  # two latest BENCH_r*.json
    python tools/benchdrift.py OLD.json NEW.json

Accepts either the driver's wrapper ({"n":…, "parsed": {...}} or with
the JSON line embedded in "tail") or a raw bench line ({"queries":…}).
Exit 0 when green, 2 when a threshold is crossed, 0-with-notice when
there is no prior round to compare (first round is vacuously green).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import NSET_IDS  # noqa: E402

DRIFT_RATIO = 1.5
DRIFT_ABS_FLOOR_S = 1.0
NAIVE_BAR = 2.0

#: BASELINE.md §N-set "PySpark naive warm" column (measured r7,
#: tools/nbaseline.py) in seconds.  N1 deliberately absent: its
#: absolute is answer-size-bound, drift-only per BASELINE's note.
NAIVE_WARM_S = {
    "q_sim_hamming": 0.873,
    "q_text_tfidf": 0.786,
    "q_dedup_near": 1.699,
}


def load_bench(path: Path) -> dict:
    """Return the inner bench record ({"queries": {...}, ...})."""
    d = json.loads(path.read_text())
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    tail = d.get("tail", "")
    i = tail.rfind('{"metric"')
    if i >= 0:
        return json.loads(tail[i:])
    raise ValueError(f"{path}: no bench record found")


def main(argv: list[str]) -> int:
    if len(argv) == 2:
        old_p, new_p = Path(argv[0]), Path(argv[1])
    else:
        benches = sorted(
            Path(__file__).resolve().parent.parent.glob("BENCH_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
        )
        if len(benches) < 2:
            print("benchdrift: <2 BENCH_r*.json files — nothing to compare")
            return 0
        old_p, new_p = benches[-2], benches[-1]

    old = load_bench(old_p)["queries"]
    new = load_bench(new_p)["queries"]
    failures: list[str] = []
    report = {}
    for q in NSET_IDS:
        if q not in new:
            failures.append(f"{q}: missing from {new_p.name}")
            continue
        entry = {"new_s": new[q]}
        if q in old:
            ratio = new[q] / old[q] if old[q] else float("inf")
            entry.update(old_s=old[q], drift=round(ratio, 2))
            if ratio > DRIFT_RATIO and (new[q] - old[q]) > DRIFT_ABS_FLOOR_S:
                failures.append(
                    f"{q}: drifted {ratio:.2f}x round-over-round "
                    f"({old[q]:.2f}s -> {new[q]:.2f}s)"
                )
        if q in NAIVE_WARM_S:
            vs = new[q] / NAIVE_WARM_S[q]
            entry["vs_naive"] = round(vs, 2)
            if vs > NAIVE_BAR:
                failures.append(
                    f"{q}: {vs:.2f}x the PySpark-naive bar "
                    f"({new[q]:.2f}s vs {NAIVE_WARM_S[q]:.2f}s naive)"
                )
        report[q] = entry

    print(
        json.dumps(
            {
                "old": old_p.name,
                "new": new_p.name,
                "nset": report,
                "failures": failures,
            }
        )
    )
    if failures:
        for f in failures:
            print(f"FAIL {f}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
