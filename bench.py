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
    sset = run_sset(spark, sf_dir)
    print(
        json.dumps(
            {
                "metric": "median-of-3 warm wall-clock total, BASELINE.md B-set",
                "value": total_b,
                "unit": "sec",
                "value_nset": total_n,
                "value_sset": sset.get("total_s"),
                "sset": sset,
                "queries": timings,
                "spread": spreads,
                "rows": rows,
                "sf": sf,
            }
        )
    )


def run_sset(spark, sf_dir: str) -> dict:
    """S-set (VERDICT r08 #5): the namesake END-TO-END streaming path —
    flat feed → maintained date×type landing layout → multiplexed
    3-table fan-out with executor-parallel upserts — measured as one
    catch-up of the sf events log, rows/s per stage.  Correctness is
    pytest's job (test_etl_config / test_landing_layout); this exists
    so a regression in the landing sink, the shared-scan fan-out, or
    the executor upsert shows up in BENCH_r{N}.json (and fails
    tools/benchdrift.py) instead of only slowing a test.

    Method = the B-set's cold-then-warm: the whole path runs TWICE
    over fresh dirs and the SECOND pass is reported (measured: a cold
    JVM's first landing drain ran 1.9× its warm repeat — a cold-only
    number would trip the 1.5× drift gate on JIT state, not on
    regressions).  The cold pass rides along as ``*_cold_s``.  Errors
    are captured (not raised) so a broken S-set cannot lose the whole
    bench record."""
    try:
        cold = _sset_once(spark, sf_dir)
        warm = _sset_once(spark, sf_dir)
        warm["landing_cold_s"] = cold["landing_s"]
        warm["fanout_cold_s"] = cold["fanout_s"]
        return warm
    except Exception as exc:  # noqa: BLE001 — never lose the bench line
        return {"error": f"{type(exc).__name__}: {exc}"}


def _sset_once(spark, sf_dir: str) -> dict:
    import shutil
    import tempfile

    from events_to_db_spark.etl import (
        load_landing,
        maintain_landing_layout,
        run_etl_config,
    )

    work = tempfile.mkdtemp(prefix="bench_sset_")
    try:
        # stage the events log as a feed DIRECTORY (the file source
        # follows a directory; testdata ships events as one file)
        feed = Path(work) / "feed"
        feed.mkdir()
        src = Path(sf_dir) / "events.parquet"
        parts = (
            sorted(src.glob("*.parquet")) if src.is_dir() else [src]
        )
        for i, f in enumerate(parts):
            try:
                os.link(f, feed / f"{i:04d}.parquet")
            except OSError:  # cross-device: fall back to a copy
                import shutil as _sh

                _sh.copy(f, feed / f"{i:04d}.parquet")

        dst = f"{work}/landing"
        t0 = time.time()
        maintain_landing_layout(
            spark, str(feed), dst, f"{work}/ckpt_landing"
        ).awaitTermination()
        landing_s = time.time() - t0
        n = load_landing(spark, dst).count()

        cfg = {
            "events": dst,
            "events_layout": "landing",
            "db": f"{work}/sset.db",
            "checkpoints": f"{work}/ckpt_etl",
            "max_files_per_trigger": 100000,
            "sink_mode": "executor",
            "tables": [
                {
                    "table": "purchases",
                    "query": "FROM 'type:purchase' & TIME >= 2024-01-10"
                    " FILTER _.k >= 10 SELECT { user: _.user_id, k: _.k * 1 }",
                },
                {
                    "table": "errors",
                    "query": "FROM 'type:error' SELECT { u: _.user_id }",
                },
                {"table": "raw_copy"},
            ],
        }
        t0 = time.time()
        qs = run_etl_config(spark, cfg)
        for q in {q.id: q for q in qs.values()}.values():
            q.awaitTermination()
        fanout_s = time.time() - t0
        # the r10 observability surface, reported alongside throughput
        # (VERDICT r09 #4): per-table rows from the metrics log +
        # source lag — a drained S-set must show zero pending files
        from events_to_db_spark.etl import etl_status

        status = etl_status(cfg)
        return {
            "rows": n,
            "landing_s": round(landing_s, 2),
            "fanout_s": round(fanout_s, 2),
            "landing_rows_s": round(n / landing_s, 1),
            "fanout_rows_s": round(n / fanout_s, 1),
            "total_s": round(landing_s + fanout_s, 2),
            "tables_rows_out": {
                t: d.get("total_rows_out")
                for t, d in sorted(status["tables"].items())
            },
            "feed_files_pending": status["feed_files_pending"],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
