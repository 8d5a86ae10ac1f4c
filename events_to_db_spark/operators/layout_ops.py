"""Data-layout operators: multi-dimensional clustering (SURVEY §2.12).

Companion to :mod:`events_to_db_spark.plans.zorder` — the contract
query proves the Morton-code arithmetic is engine-exact (the same
interleave produces the same codes in Spark and DuckDB), and the
zorder test in ``tests/test_zorder.py`` proves the layout actually
shrinks per-file bounding boxes (= file skipping on BOTH dimensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
