"""End-to-end curation pipeline integration test."""

from __future__ import annotations

from pyspark.sql import functions as F

from events_to_db_spark.curate import CurationConfig, curate, exact_dedup
from events_to_db_spark.session import load_table
from tests.conftest import SF_SMOKE


def test_curate_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    curated, report = curate(docs)
    rep = {r["stage"]: r["n"] for r in report.collect()}

    # monotone shrinkage through the funnel, nothing vanishes entirely
    assert rep["0_input"] == docs.count()
    assert rep["0_input"] >= rep["1_quality"] >= rep["2_exact_dedup"] >= rep["3_near_dedup"] > 0
    assert rep["4_split"] == rep["3_near_dedup"]

    out = curated.collect()
    # split covers everything, deterministically
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    again = {r["doc_id"]: r["split"] for r in curate(docs)[0].collect()}
    assert {r["doc_id"]: r["split"] for r in out} == again

    # surviving docs respect the quality gate
    for r in out[:20]:
        n = len(r["text"].split(" "))
        assert 30 <= n <= 90

    # no exact duplicates survive
    texts = [r["text"] for r in out]
    assert len(texts) == len(set(texts))

    # writing partitioned by split gives the prunable layout
    curated.write.mode("overwrite").partitionBy("split").parquet(
        str(tmp_path / "curated")
    )
    back = spark.read.parquet(str(tmp_path / "curated"))
    assert back.count() == len(out)


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "other")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["text"]) for r in exact_dedup(df).collect()}
    assert got == {(1, "same"), (2, "other")}


def test_near_dedup_threshold_respected(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    cfg = CurationConfig(near_dup_jaccard=1.01)  # impossible threshold
    curated, report = curate(docs, cfg)
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["3_near_dedup"] == rep["2_exact_dedup"]  # nothing dropped
