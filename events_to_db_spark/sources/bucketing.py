"""Bucketed-table layout — shuffle-free co-located joins (SURVEY.md §4,
100 TB posture).

A fact⋈fact equi-join on a 100 TB table shuffles both sides unless the
data is laid out pre-partitioned by the join key.  Spark's bucketing is
that layout: ``bucketBy(n, key)`` hash-partitions rows into a fixed
bucket count at write time; a join of two tables bucketed on the same
key with the same count reads bucket-aligned splits and skips the
Exchange on both sides (verified by plan assertion in
tests/test_bucketing.py).

Bucketed tables must go through the session catalog (``saveAsTable``) —
the bucket metadata lives there, not in the Parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.

    ``sort_cols`` additionally sorts within buckets, letting sort-merge
    joins skip the per-task sort as well."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata applies automatically)."""
    return spark.table(table)
