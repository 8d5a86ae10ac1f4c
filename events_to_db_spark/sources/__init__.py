"""Batch source readers — one place that knows formats and schemas."""

from events_to_db_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
)
