"""Data-layout operators: multi-dimensional clustering (SURVEY §2.12).

Companion to :mod:`events_to_db_spark.plans.zorder` — the contract
query proves the Morton-code arithmetic is engine-exact (the same
interleave produces the same codes in Spark and DuckDB), and the
zorder test in ``tests/test_zorder.py`` proves the layout actually
shrinks per-file bounding boxes (= file skipping on BOTH dimensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.plans.zorder import z_value, z_value_sql
from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table

_Z_SQL = z_value_sql(
    "user_id", "date_diff('day', DATE '1995-01-01', CAST(ts AS DATE))", bits=16
)


@query(
    "q_layout_zorder",
    oracle=f"""
    WITH z AS (
        SELECT user_id,
               date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS day_idx,
               {_Z_SQL} AS zv
        FROM events
    )
    SELECT zv >> 8 AS tile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(user_id) AS BIGINT) AS min_u,
           CAST(max(user_id) AS BIGINT) AS max_u,
           CAST(min(day_idx) AS BIGINT) AS min_d,
           CAST(max(day_idx) AS BIGINT) AS max_d,
           CAST((max(user_id) - min(user_id) + 1)
                * (max(day_idx) - min(day_idx) + 1) AS BIGINT) AS bbox_area
    FROM z
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code tiling of the event log on (user_id, day): each
    tile (z >> 8, a 16-user × 16-day rectangle) reports its row count
    and exact bounding box.

    The z-value is 32 unrolled shift/mask/OR terms — one codegen'd
    projection, no UDF, no shuffle before the per-tile aggregate.
    ``bbox_area ≤ 256`` for every tile is the locality invariant that
    makes z-range file pruning work on either predicate dimension;
    the oracle recomputes the identical interleave in DuckDB, so a
    single bit of drift in the arithmetic hash-fails.
    """
    ev = load_table(spark, sf_dir, "events")
    day_idx = F.datediff(F.to_date("ts"), F.lit("1995-01-01").cast("date"))
    z = ev.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        day_idx.cast("bigint").alias("day_idx"),
        z_value(F.col("user_id"), day_idx, bits=16).alias("zv"),
    )
    return (
        z.groupBy(F.shiftright("zv", 8).alias("tile"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("user_id").alias("min_u"),
            F.max("user_id").alias("max_u"),
            F.min("day_idx").alias("min_d"),
            F.max("day_idx").alias("max_d"),
            ((F.max("user_id") - F.min("user_id") + 1)
             * (F.max("day_idx") - F.min("day_idx") + 1))
            .cast("bigint")
            .alias("bbox_area"),
        )
        .orderBy("tile")
    )


@query(
    "q_layout_bitwidth",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id,
               event_id - lag(event_id) OVER (
                   PARTITION BY user_id ORDER BY event_id) AS delta
        FROM events
    ),
    d AS (
        SELECT user_id,
               CASE WHEN delta = 0 THEN 1
                    ELSE length(printf('%b', delta)) END AS bits
        FROM s WHERE delta IS NOT NULL
    ),
    per AS (
        SELECT user_id, CAST(max(bits) AS BIGINT) AS max_bits,
               CAST(count(*) AS BIGINT) AS n_deltas
        FROM d GROUP BY 1
    )
    SELECT max_bits AS block_bit_width,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(n_deltas) AS BIGINT) AS n_values,
           CAST(sum(max_bits * n_deltas) AS BIGINT) AS packed_bits,
           CAST(sum(64 * n_deltas) AS BIGINT) AS raw_bits
    FROM per
    GROUP BY max_bits
    """,
)
def q_layout_bitwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-bitpacking width audit: per user block, the bit width a
    delta-encoded event_id column would need (max ⌊log₂Δ⌋+1), and per
    width class the packed-vs-raw bit cost — the storage-planning
    readout behind parquet's DELTA_BINARY_PACKED choice and the sort
    order that makes it work.

    Bit width uses the exact binary-length identity (`length(conv(…
    ,2))` ≡ DuckDB `printf('%b')` — float log2 is wrong at powers of
    two, the documented trap); deltas are per-user lag over the sorted
    id, every aggregate exact.  One keyed window + two aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    s = ev.select(
        "user_id",
        (F.col("event_id") - F.lag("event_id").over(w)).alias("delta"),
    ).where(F.col("delta").isNotNull())
    d = s.select(
        "user_id",
        F.when(F.col("delta") == 0, 1)
        .otherwise(F.expr("length(conv(delta, 10, 2))"))
        .alias("bits"),
    )
    per = d.groupBy("user_id").agg(
        F.max("bits").cast("long").alias("max_bits"),
        F.count("*").alias("n_deltas"),
    )
    return per.groupBy(
        F.col("max_bits").alias("block_bit_width")
    ).agg(
        F.count("*").alias("n_blocks"),
        F.sum("n_deltas").cast("long").alias("n_values"),
        F.sum(F.col("max_bits") * F.col("n_deltas"))
        .cast("long")
        .alias("packed_bits"),
        F.sum(64 * F.col("n_deltas")).cast("long").alias("raw_bits"),
    )
