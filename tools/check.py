#!/usr/bin/env python
"""Local differential-oracle harness — mirror of the driver's t2 check.

Runs every registered query through PySpark AND its oracle SQL through
DuckDB on the same parquet tables, then compares row-count + sorted
column names + an order-insensitive canonical value multiset.  Use while
iterating so the per-round CORRECTNESS_r{N}.json holds no surprises.

Usage:
    python tools/check.py                 # all queries at sf0.01
    python tools/check.py q_agg_q1 ...    # subset
    python tools/check.py --sf /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import sys
import time
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v, strict: bool):
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return "<NULL>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "<NaN>"
        if f == 0.0:
            f = 0.0  # collapse -0.0
        return repr(f) if strict else f"{f:.8g}"
    if isinstance(v, (np.integer, int, np.bool_, bool)):
        return repr(int(v))
    if isinstance(v, Decimal):
        # DuckDB sums of integers come back DECIMAL/HUGEINT; the driver
        # may not normalize these — prefer casting to BIGINT in oracle
        # SQL.  Normalized here anyway so the diff shows values, not types.
        return repr(int(v)) if v == v.to_integral_value() else repr(float(v))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_cell(x, strict) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k], strict)}" for k in sorted(v)) + "}"
    if pd.isna(v):
        return "<NULL>"
    return str(v)


def canon(df: pd.DataFrame, strict: bool) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(norm_cell(row[c], strict) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"schema spark={s_cols} duck={d_cols}")
        return problems
    strict_match = canon(spark_pdf, True) == canon(duck_pdf, True)
    if not strict_match:
        s_rows, d_rows = canon(spark_pdf, False), canon(duck_pdf, False)
        if s_rows == d_rows:
            problems.append("STRICT float mismatch (approx-8sig matches) — tighten rounding")
        else:
            s_only = [r for r in s_rows if r not in d_rows][:3]
            d_only = [r for r in d_rows if r not in s_rows][:3]
            problems.append(f"values differ; spark-only={s_only} duck-only={d_only} (cols={s_cols})")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as e
    from events_to_db_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, args.sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(spark_pdf)} rows, {t_spark:.2f}s spark)")
            n_pass += 1
            continue
        t0 = time.time()
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        t_duck = time.time() - t0
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(
                f"pass {name}: {len(spark_pdf)} rows hash-match "
                f"({t_spark:.2f}s spark, {t_duck:.2f}s duck)"
            )
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed, {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
