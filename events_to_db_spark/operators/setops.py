"""Set operators — SURVEY.md §2.7.

UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT over event-derived row
sets.  Spark's ``intersect``/``subtract`` are the DISTINCT variants,
matching the SQL operators in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


def _typed(spark, sf_dir, event_type, extra=None):
    ev = load_table(spark, sf_dir, "events")
    df = ev.filter(F.col("event_type") == event_type)
    return df.filter(extra) if extra is not None else df


@query(
    "q_union_all",
    oracle="""
    WITH u AS (
        SELECT event_type, user_id, value FROM events
        WHERE event_type = 'purchase' AND value > 250
        UNION ALL
        SELECT event_type, user_id, value FROM events WHERE event_type = 'error'
    )
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_v
    FROM u GROUP BY event_type
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — duplicates preserved) of two
    same-shape event subsets, then aggregate."""
    hi_purch = _typed(spark, sf_dir, "purchase", F.col("value") > 250)
    errors = _typed(spark, sf_dir, "error")
    u = hi_purch.select("event_type", "user_id", "value").unionByName(
        errors.select("event_type", "user_id", "value")
    )
    return u.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v")
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics): distinct user ids across two subsets."""
    p = _typed(spark, sf_dir, "purchase").select("user_id")
    s = _typed(spark, sf_dir, "signup").select("user_id")
    return p.unionByName(s).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): users appearing in both subsets."""
    p = _typed(spark, sf_dir, "purchase").select("user_id")
    e = _typed(spark, sf_dir, "error").select("user_id")
    return p.intersect(e)


@query(
    "q_except",
    oracle="""
    SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
    FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): (user, day) pairs with a view but no purchase
    that day."""
    d = F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d")
    v = _typed(spark, sf_dir, "view").select("user_id", d)
    p = _typed(spark, sf_dir, "purchase").select("user_id", d)
    return v.subtract(p)


@query(
    "q_unpivot",
    oracle="""
    SELECT measure, count(*) AS n,
           round(sum(v), 4) AS total,
           round(avg(v), 4) AS mean
    FROM (
        SELECT 'quantity' AS measure, l_quantity AS v FROM lineitem
        UNION ALL
        SELECT 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT 'tax', l_tax FROM lineitem
    )
    GROUP BY measure
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: the four lineitem measures reshaped wide→long,
    then profiled per measure — the inverse of ``q_pivot`` and the
    standard first step of a column-profiling pass.  Uses the native
    ``DataFrame.unpivot`` (Spark 3.4+ ``Unpivot`` logical node —
    expand, not a 4-way self-union: one scan of the table).  The
    oracle states the same relation as a portable UNION ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="v",
    ).select(
        F.regexp_replace(F.col("measure"), "^l_", "").alias("measure"), "v"
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.round(F.sum("v"), 4).alias("total"),
        F.round(F.avg("v"), 4).alias("mean"),
    )


@query(
    "q_except_all",
    oracle="""
    WITH d AS (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'view'
    )
    SELECT user_id, count(*) AS surplus FROM d GROUP BY user_id
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): each user_id survives
    max(clicks − views, 0) times — the multiset difference that
    DISTINCT-based EXCEPT cannot express.  Spark ``exceptAll`` lowers
    to a count-difference aggregate + generate (no join explosion);
    the surviving bag is re-aggregated to (user, surplus)."""
    c = _typed(spark, sf_dir, "click").select("user_id")
    v = _typed(spark, sf_dir, "view").select("user_id")
    return c.exceptAll(v).groupBy("user_id").agg(
        F.count("*").alias("surplus")
    )


@query(
    "q_intersect_all",
    oracle="""
    WITH d AS (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT ALL
        SELECT user_id FROM events WHERE event_type = 'error'
    )
    SELECT user_id, count(*) AS common FROM d GROUP BY user_id
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each user_id survives
    min(purchases, errors) times.  Spark ``intersectAll`` is the
    min-of-counts aggregate; re-aggregated to (user, common)."""
    p = _typed(spark, sf_dir, "purchase").select("user_id")
    e = _typed(spark, sf_dir, "error").select("user_id")
    return p.intersectAll(e).groupBy("user_id").agg(
        F.count("*").alias("common")
    )
