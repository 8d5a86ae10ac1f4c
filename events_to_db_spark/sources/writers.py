"""Batch sink writers — SURVEY.md §2.1 sink surface.

Parquet/CSV/JSON writers plus the batch twin of the streaming keyed
upsert.  All writers are partition-parallel (every task writes its own
file); the upsert reuses the streaming sink's ``INSERT … ON CONFLICT``
so batch backfill and live copy share one idempotency mechanism — the
events-to-db pattern where a replay and the live feed land in the same
table without duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from events_to_db_spark.streaming.sink import upsert_foreach_batch


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        # Partitioned layout => partition pruning for readers filtering
        # on these columns (the batch analogue of the tag index).
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def upsert_table(df: DataFrame, db_path: str, table: str, key_cols: list[str]) -> None:
    """Batch idempotent upsert into a SQL table, keyed like the stream
    sink (swap the connection factory for JDBC in production)."""
    upsert_foreach_batch(db_path, table, key_cols)(df, -1)
