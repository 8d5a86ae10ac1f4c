"""Deterministic sampling and dataset splitting — training-pipeline
staples (north-star N).

Production corpora are sampled and split by *content- or key-hash*,
never by ``rand()``: the assignment must be reproducible across runs,
engines, and re-shards, and joining two tables sampled the same way
must keep matching rows together.  Both operators here hash with the
md5-derived integer used across the engine (identical in Spark and
DuckDB), so the oracle checks the exact membership, not just counts of
a statistical sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table

_SPARK_BUCKET = (
    "pmod(cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15),"
    " 16, 10) as bigint), 10)"
)
_DUCK_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10)"


@query(
    "q_sample_hash",
    oracle=f"""
    SELECT lang, count(*) AS n, count(DISTINCT source) AS n_sources
    FROM documents
    WHERE {_DUCK_BUCKET} = 0
    GROUP BY lang
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10 % sample by key hash (bucket 0 of 10): stable
    across runs and engines, filter pushes to the scan, and any other
    table sampled with the same key stays aligned."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.expr(_SPARK_BUCKET) == 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.countDistinct("source").alias("n_sources"))
    )


@query(
    "q_split_train_test",
    oracle=f"""
    SELECT lang,
           CASE WHEN {_DUCK_BUCKET} < 8 THEN 'train'
                WHEN {_DUCK_BUCKET} = 8 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by key hash — reproducible,
    leakage-free (a doc_id lands in the same split everywhere), and
    computable without a shuffle or a stored assignment table."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_BUCKET)
    return d.select(
        "lang",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    ).groupBy("lang", "split").agg(F.count("*").alias("n"))
