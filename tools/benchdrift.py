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

#: N1 is excluded from the absolute naive bar by BASELINE.md §N-set's
#: own note (answer-size-bound on the degenerate 31-token corpus —
#: drift is its signal); it still gets the round-over-round check.
DRIFT_ONLY = {"q_dedup_minhash"}

#: S-set (VERDICT r08 #5): per-stage THROUGHPUT of the end-to-end
#: streaming path (bench.run_sset) — a drop past the same 1.5× bar
#: fails (the stages are multi-second drains, so the ratio needs no
#: sub-second absolute floor).  Benches from before the S-set existed
#: compare vacuously green, like a missing prior round.
SSET_KEYS = ("landing_rows_s", "fanout_rows_s")
SSET_DROP_RATIO = 1.5

BASELINE_MD = Path(__file__).resolve().parent.parent / "BASELINE.md"

#: Matches a §N-set table row, e.g.
#:   | N3 `q_text_tfidf` — explode + aggs | 2,059 | 1,072 ms | 786 ms |
#: capturing the query id and the LAST cell (PySpark naive warm, ms).
_NSET_ROW = re.compile(
    r"^\|\s*N\d+\s+`(q_\w+)`[^|]*\|[^|]*\|[^|]*\|\s*([\d,]+)\s*ms\s*\|",
    re.M,
)


def naive_warm_s(baseline_text: str | None = None) -> dict[str, float]:
    """The §N-set "PySpark naive warm" bar, parsed from BASELINE.md —
    the single source of truth (VERDICT r08 #3: hardcoded literals here
    silently kept enforcing a stale bar if nbaseline.py re-measured).
    N1 stays drift-only per BASELINE's note (``DRIFT_ONLY``)."""
    text = (
        baseline_text if baseline_text is not None else BASELINE_MD.read_text()
    )
    out = {
        q: int(ms.replace(",", "")) / 1000.0
        for q, ms in _NSET_ROW.findall(text)
        if q not in DRIFT_ONLY
    }
    if not out:
        raise ValueError("BASELINE.md: no §N-set naive-warm rows parsed")
    return out


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
        # raw_decode tolerates log text AFTER the JSON line (Spark
        # progress output, trailing notes) — json.loads would raise
        # 'Extra data' and error the gate instead of comparing (ADVICE
        # r08).
        obj, _end = json.JSONDecoder().raw_decode(tail[i:])
        return obj
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

    old_rec = load_bench(old_p)
    new_rec = load_bench(new_p)
    old = old_rec["queries"]
    new = new_rec["queries"]
    naive = naive_warm_s()
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
        if q in naive:
            vs = new[q] / naive[q]
            entry["vs_naive"] = round(vs, 2)
            if vs > NAIVE_BAR:
                failures.append(
                    f"{q}: {vs:.2f}x the PySpark-naive bar "
                    f"({new[q]:.2f}s vs {naive[q]:.2f}s naive)"
                )
        report[q] = entry

    sset_report: dict = {}
    new_sset = new_rec.get("sset") or {}
    old_sset = old_rec.get("sset") or {}
    if "error" in new_sset:
        failures.append(f"sset: errored — {new_sset['error']}")
        sset_report = new_sset
    else:
        for k in SSET_KEYS:
            if k not in new_sset:
                continue  # pre-S-set bench file: vacuously green
            entry = {"new": new_sset[k]}
            if old_sset.get(k):
                ratio = old_sset[k] / new_sset[k] if new_sset[k] else float("inf")
                entry.update(old=old_sset[k], slowdown=round(ratio, 2))
                if ratio > SSET_DROP_RATIO:
                    failures.append(
                        f"sset {k}: throughput dropped {ratio:.2f}x "
                        f"({old_sset[k]:.0f} -> {new_sset[k]:.0f} rows/s)"
                    )
            sset_report[k] = entry

    print(
        json.dumps(
            {
                "old": old_p.name,
                "new": new_p.name,
                "nset": report,
                "sset": sset_report,
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
