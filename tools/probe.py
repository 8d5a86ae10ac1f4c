"""Round-start testdata probe (VERDICT r02 #4).

The driver regenerates /root/testdata each round and the physical type
of ``events.parquet``'s ``ts`` column has flipped every round so far
(r1: TIMESTAMP(NANOS) -> long-of-ns under nanosAsLong; r2/r3:
TIMESTAMP(MICROS, isAdjustedToUTC=false) -> TIMESTAMP_NTZ).  Run this
FIRST each round, before trusting any sweep:

    python tools/probe.py

It prints the parquet footer type per scale factor, then asserts that
``session.load_table`` normalizes whatever arrived into a session-TZ
(LTZ) ``timestamp`` whose unix microseconds equal pyarrow's reading of
the same file — i.e. the ingest shim still covers this round's flavor.
Exit 0 = safe to sweep; non-zero = extend ``load_table`` first.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def probe_events(spark, sf_dir: str) -> tuple[str, str]:
    """Return (parquet_footer_type, normalized_spark_type) for events.ts
    and assert the normalized values are exactly pyarrow's micros."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from events_to_db_spark.session import load_table

    path = os.path.join(sf_dir, "events.parquet")
    footer = str(pq.read_schema(path).field("ts").type)

    df = load_table(spark, sf_dir, "events")
    spark_type = dict(df.dtypes)["ts"]
    assert spark_type == "timestamp", (
        f"{sf_dir}: load_table left ts as {spark_type!r}, want LTZ 'timestamp' "
        f"(parquet footer: {footer}) — extend the ingest shim in session.py"
    )

    # Full-column checksum: count/min/max plus an exact decimal sum
    # (int64 sum of epoch-µs overflows past ~5k rows).
    got = df.agg(
        F.count("*").alias("n"),
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
        F.sum(F.unix_micros("ts").cast("decimal(38,0)")).alias("s"),
    ).first()
    t = pq.read_table(path, columns=["ts"])["ts"].cast("int64")
    import numpy as np
    import pyarrow.compute as pc

    arr = t.combine_chunks().to_numpy(zero_copy_only=False)
    exp = (
        len(t),
        pc.min(t).as_py(),
        pc.max(t).as_py(),
        int(arr.astype(object).sum()),
    )
    assert (got["n"], got["lo"], got["hi"], int(got["s"])) == exp, (
        f"{sf_dir}: normalized micros diverge from pyarrow "
        f"(spark {tuple(got)} vs arrow {exp})"
    )
    return footer, spark_type


def main() -> int:
    from events_to_db_spark.session import get_spark

    spark = get_spark("schema-probe", cpus=8)
    ok = True
    for sf in sorted(os.listdir(TESTDATA)):
        sf_dir = os.path.join(TESTDATA, sf)
        if not os.path.isdir(sf_dir):
            continue
        try:
            footer, spark_type = probe_events(spark, sf_dir)
            print(f"ok   {sf}: parquet ts={footer} -> load_table ts={spark_type}")
        except AssertionError as exc:
            ok = False
            print(f"FAIL {sf}: {exc}")
    print("probe", "passed" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
