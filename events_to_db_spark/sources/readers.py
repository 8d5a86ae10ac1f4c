"""Format readers — SURVEY.md §2.1 source surface.

Thin, declarative wrappers over ``spark.read``: each returns a lazy
DataFrame so Catalyst's predicate pushdown / column pruning apply to
whatever the caller composes on top.  Explicit schemas are required for
text formats — schema inference re-reads the data (a full extra pass at
100 TB) and types drift between runs; an engine never infers twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from events_to_db_spark.session import configure


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; filters/projections push into row-group stats."""
    return configure(spark).read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV with a mandatory explicit schema (no inference pass)."""
    return (
        configure(spark)
        .read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, **options
) -> DataFrame:
    """JSON-lines with a mandatory explicit schema.  For schema-on-read
    payload access *within* a column, prefer ``from_json`` /
    ``get_json_object`` over whole-file inference (§2.8)."""
    return configure(spark).read.schema(schema).options(**options).json(path)
