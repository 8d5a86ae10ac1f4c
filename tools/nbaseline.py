"""Measure the PySpark-NAIVE baseline for the N-set (VERDICT r06 #7).

The B-set (BASELINE.md) benchmarks the relational core; the engine's
north star is the LLM-data family, so BENCH needs a measured bar there
too.  This script times the obvious hand-written PySpark a user would
first write for each N-set task — same answers, none of the engine's
candidate pruning / packing / codegen discipline:

* N1 ``q_dedup_minhash`` — brute-force all-pairs token-set Jaccard
  self-join (the O(n²) plan MinHash-LSH exists to avoid);
* N2 ``q_sim_hamming`` — the same probe→hamming→rerank cascade but on
  per-element array higher-order functions (transform/aggregate per
  bit) instead of packed-BIGINT ``bit_count(xor)`` codegen;
* N3 ``q_text_tfidf`` — explode + two aggregations + joins with no
  broadcast hints (tf-idf's naive plan is already near-optimal: the
  honest bar here is ~1x and that is the point of recording it);
* N4 ``q_dedup_near`` — blocked all-pairs Jaccard join with no
  escalation gate.

Method mirrors BASELINE.md exactly: one cold run then ONE warm run
(the naive quadratic members run minutes per pass — the B-set method,
not bench.py's median-of-3, is the affordable and like-for-like
protocol here), results fully collected; row counts are asserted
equal to the engine's answers.  Prints one JSON line for the
BASELINE.md N-set table.  Run DEDICATED (host alone) at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs_toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from events_to_db_spark.session import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )


def naive_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs token-set Jaccard (no banding, no size prefilter)."""
    t = _docs_toks(spark, sf_dir).select("doc_id", "toks")
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    jac = F.size(F.array_intersect("ta", "tb")) / F.size(
        F.array_union("ta", "tb")
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.8)
        .select("doc_a", "doc_b", F.round("jac", 4).alias("jac"))
    )


def naive_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked all-pairs Jaccard (equi-join on (lang, source), no
    escalation gate)."""
    t = _docs_toks(spark, sf_dir)
    a = t.select(
        "lang", "source",
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"),
    )
    b = t.select(
        "lang", "source",
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"),
    )
    jac = F.size(F.array_intersect("ta", "tb")) / F.size(
        F.array_union("ta", "tb")
    )
    return (
        a.join(b, ["lang", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.8)
        .select("doc_a", "doc_b", F.round("jac", 4).alias("jac"))
    )


def naive_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode + aggregate + plain joins (no broadcast hints)."""
    from pyspark.sql import Window

    from events_to_db_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    idf = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(idf, "term")
        .crossJoin(n_docs)
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "term", F.round("tfidf", 4).alias("tfidf"))
    )


def naive_sim_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same cascade, per-bit higher-order functions (no packed words,
    no integer bit_count codegen)."""
    from events_to_db_spark.session import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bits = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)"
        ).alias("bits"),
        F.col("embedding"),
    )
    probes = bits.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("probe_id"),
        F.col("bits").alias("pbits"),
        F.col("embedding").alias("pemb"),
    )
    ham = (
        probes.crossJoin(
            bits.select(
                F.col("vec_id").alias("cand_id"),
                F.col("bits").alias("cbits"),
                F.col("embedding").alias("cemb"),
            )
        )
        .filter(F.col("cand_id") != F.col("probe_id"))
        .withColumn(
            "hamming",
            F.expr(
                "aggregate(zip_with(pbits, cbits, (a, b) ->"
                " CASE WHEN a <> b THEN 1 ELSE 0 END), 0L, (acc, x) ->"
                " acc + x)"
            ),
        )
    )
    from pyspark.sql import Window

    wh = Window.partitionBy("probe_id").orderBy("hamming", "cand_id")
    top = ham.withColumn("hrk", F.row_number().over(wh)).filter(
        F.col("hrk") <= 16
    )
    rerank = top.withColumn(
        "dot_q",
        F.expr(
            "aggregate(zip_with(pemb, cemb, (x, y) ->"
            " cast(round(cast(x as double) * 10000) as bigint)"
            " * cast(round(cast(y as double) * 10000) as bigint)),"
            " 0L, (acc, v) -> acc + v)"
        ),
    )
    wr = Window.partitionBy("probe_id").orderBy(F.col("dot_q").desc(), "cand_id")
    return (
        rerank.withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rk") <= 4)
        .select("probe_id", "cand_id", "hamming", "dot_q", "rk")
    )


NAIVE = {
    "q_dedup_minhash": naive_dedup_minhash,
    "q_sim_hamming": naive_sim_hamming,
    "q_text_tfidf": naive_text_tfidf,
    "q_dedup_near": naive_dedup_near,
}


def main() -> int:
    import __spark_entry__ as entry
    from events_to_db_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("nbaseline")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = {}
    for name, naive_fn in NAIVE.items():
        engine_rows = len(qs[name](spark, sf_dir).collect())
        t0 = time.time()
        got = naive_fn(spark, sf_dir).collect()
        cold = time.time() - t0
        assert len(got) == engine_rows, (
            f"{name}: naive {len(got)} rows != engine {engine_rows}"
        )
        t0 = time.time()
        naive_fn(spark, sf_dir).collect()
        warm = time.time() - t0
        out[name] = {
            "rows": engine_rows,
            "naive_cold_s": round(cold, 3),
            "naive_warm_s": round(warm, 3),
        }
        print(f"{name}: rows={engine_rows} cold={cold:.2f}s "
              f"warm={warm:.2f}s", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "naive": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
