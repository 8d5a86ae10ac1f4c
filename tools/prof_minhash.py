#!/usr/bin/env python
"""Stage-by-stage breakdown of q_dedup_minhash at a given sf-dir.

Optimization-round measurement harness (guide §1): times each pipeline
stage with the noop sink so the computation is isolated from the
collect, and labels jobs so the UI/event log stays readable.  Prints a
JSON line of stage seconds.

Usage: python tools/prof_minhash.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from events_to_db_spark.operators.pipeline_ops import (  # noqa: E402
    minhash_candidate_pairs,
)
from events_to_db_spark.session import get_spark, load_table  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_minhash")
    sc = spark.sparkContext
    out: dict[str, float] = {}

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )

    sc.setJobDescription("minhash: corpus stats")
    n_docs = d.count()
    n_vocab = d.select(F.explode("toks").alias("t")).distinct().count()
    out["n_docs"] = n_docs
    out["n_vocab"] = n_vocab

    # A: signatures only (pandas_udf kernel)
    from events_to_db_spark.operators import pipeline_ops as P

    sc.setJobDescription("minhash: A signatures")
    sig = d.select(
        "doc_id", F.expr("transform(toks, t -> xxhash64(t))").alias("th")
    )
    out["A_tokenhash_s"] = round(noop(sig), 2)

    # B: candidate pairs (sig + band explode + self-join + groupBy)
    sc.setJobDescription("minhash: B candidates")
    cand = minhash_candidate_pairs(d)
    t0 = time.time()
    n_cand = cand.count()
    out["B_cand_s"] = round(time.time() - t0, 2)
    out["n_cand"] = n_cand

    # C: size-prefiltered candidates
    hashed = d.select(
        "doc_id", F.expr("transform(toks, t -> xxhash64(t))").alias("toks_h")
    )
    sizes = hashed.select("doc_id", F.size("toks_h").alias("n"))
    slim = (
        cand.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(
            5 * F.least(F.col("na"), F.col("nb"))
            >= 4 * F.greatest(F.col("na"), F.col("nb"))
        )
        .select("doc_a", "doc_b")
    )
    sc.setJobDescription("minhash: C slim")
    t0 = time.time()
    n_slim = slim.count()
    out["C_slim_s"] = round(time.time() - t0, 2)
    out["n_slim"] = n_slim

    # D: full query, noop sink (whole computation, no driver collect)
    from events_to_db_spark.operators.pipeline_ops import q_dedup_minhash

    sc.setJobDescription("minhash: D full noop")
    full = q_dedup_minhash(spark, sf_dir)
    out["D_full_noop_s"] = round(noop(full), 2)
    out["D_full_noop2_s"] = round(noop(q_dedup_minhash(spark, sf_dir)), 2)

    # E: full query with collect (the bench action)
    sc.setJobDescription("minhash: E full collect")
    t0 = time.time()
    n_rows = len(q_dedup_minhash(spark, sf_dir).collect())
    out["E_full_collect_s"] = round(time.time() - t0, 2)
    out["n_rows"] = n_rows

    print(json.dumps(out))


if __name__ == "__main__":
    main()
