"""Corpus curation pipeline — the end-to-end training-data story.

Composes the engine's operator families into the standard pretraining
curation sequence, each stage a lazy DataFrame transform (one job when
the result is written, Catalyst optimizing across stage boundaries):

    quality gate → exact dedup → near-dedup (blocked Jaccard)
        → deterministic split → (write partitioned by split)

Every decision is content- or key-hash-derived — re-running on a
re-sharded copy of the corpus keeps every verdict, which is what makes
incremental curation of a growing 100 TB corpus possible: new shards
join, old verdicts stand.

The per-stage drop counts come back in a ``report`` DataFrame rather
than driver-side counters, so the accounting itself scales.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Stopword list shared with q_text_quality (pipeline_ops.STOPWORDS).
from events_to_db_spark.operators.pipeline_ops import STOPWORDS

_BUCKET = (
    "pmod(cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15),"
    " 16, 10) as bigint), 10)"
)


@dataclass(frozen=True)
class CurationConfig:
    min_tokens: int = 30
    max_tokens: int = 90
    max_stop_ratio: float = 0.5
    near_dup_jaccard: float = 0.8
    train_buckets: int = 8  # of 10: 80/10/10


def quality_gate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stage 1: drop too-short/too-long/stopword-heavy docs."""
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_toks = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double")
        / n_toks
    )
    return docs.filter(
        n_toks.between(cfg.min_tokens, cfg.max_tokens)
        & (stop_ratio < cfg.max_stop_ratio)
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Stage 2: one survivor per content hash (lowest doc_id wins —
    deterministic, not first-seen)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def near_dedup(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stage 3: within (lang, source) blocks, drop the higher doc_id of
    every pair with token-set Jaccard ≥ threshold.  Blocked exact
    Jaccard here; swap in the MinHash-LSH candidate generator
    (operators.pipeline_ops) when blocks outgrow quadratic."""
    t = docs.select(
        F.col("doc_id").alias("a_id"),
        "lang",
        "source",
        F.array_distinct(F.split("text", " ")).alias("a_toks"),
    )
    u = docs.select(
        F.col("doc_id").alias("b_id"),
        "lang",
        "source",
        F.array_distinct(F.split("text", " ")).alias("b_toks"),
    )
    jac = F.size(F.array_intersect("a_toks", "b_toks")).cast("double") / F.size(
        F.array_union("a_toks", "b_toks")
    )
    losers = (
        t.join(u, ["lang", "source"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(jac >= cfg.near_dup_jaccard)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    return docs.join(losers, "doc_id", "left_anti")


def assign_split(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stage 4: deterministic hash split (train/val/test)."""
    bucket = F.expr(_BUCKET)
    return docs.withColumn(
        "split",
        F.when(bucket < cfg.train_buckets, "train")
        .when(bucket == cfg.train_buckets, "val")
        .otherwise("test"),
    )


def curate(docs: DataFrame, cfg: CurationConfig | None = None) -> tuple[DataFrame, DataFrame]:
    """Run the full pipeline; returns ``(curated, report)``.

    ``report`` is a tiny DataFrame of per-stage surviving counts —
    computed distributed, collected only when the caller looks."""
    cfg = cfg or CurationConfig()
    staged = {
        "0_input": docs,
        "1_quality": quality_gate(docs, cfg),
    }
    staged["2_exact_dedup"] = exact_dedup(staged["1_quality"])
    staged["3_near_dedup"] = near_dedup(staged["2_exact_dedup"], cfg)
    curated = assign_split(staged["3_near_dedup"], cfg)
    staged["4_split"] = curated

    spark = docs.sparkSession
    report = None
    for stage, df in staged.items():
        row = df.agg(F.count("*").alias("n")).select(
            F.lit(stage).alias("stage"), "n"
        )
        report = row if report is None else report.unionByName(row)
    return curated, report
