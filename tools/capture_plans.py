#!/usr/bin/env python
"""Capture ``explain("formatted")`` for a set of queries into files.

Optimization-round evidence tool: writes
``plans/<tag>/<query>_<suffix>.txt`` for each named query (default: the
bench B-set + N-set) so plan claims in OPTIMIZATION_r*.md are checkable
without running Spark.

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [name ...]
e.g.   python tools/capture_plans.py r11 before /root/testdata/sf0.1
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BENCH_DEFAULT = [
    "q_scan_pushdown",
    "q_agg_q1",
    "q_join_inner",
    "q_join_multiway",
    "q_win_rank",
    "q_agg_distinct",
    "q_ev_tumbling",
    "q_ev_session",
    "q_topk_group",
    "q_sim_cosine_knn",
    "q_text_wordcount",
    "q_agg_rollup",
    "q_dedup_minhash",
    "q_sim_hamming",
    "q_text_tfidf",
    "q_dedup_near",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or BENCH_DEFAULT

    import __spark_entry__ as e
    from events_to_db_spark.session import get_spark

    qs = e.queries()
    spark = get_spark("capture_plans")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"skip {name}: not registered")
            continue
        df = fn(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} bytes)")


if __name__ == "__main__":
    main()
