"""Window-function operators — SURVEY.md §2.5 + §2.6 (sorts/limits/top-k).

Ranking, lead/lag, ROWS and RANGE frames, running totals, distribution
functions, multi-key sorts, and top-k per group.

Determinism (SURVEY.md §7.5.2): every window order includes a unique
tie-break key (`o_orderkey`, `event_id`) so rank/frame contents are a
pure function of the data in both engines.

Scale notes: all windows partition by a high-cardinality key (customer,
user) — one hash shuffle, per-partition sort, no global sort.  The two
deliberately-global windows (`q_win_distribution` over 1.5 M customers
at sf1, `q_sort_multi`'s total order) are flagged in docstrings: the
ranked-limit variants compile to TakeOrderedAndProject (per-partition
top-k + driver merge of k·partitions rows — safe at any scale); the
ntile/percent_rank query is the one truly single-partition plan, kept
because its semantics require a total frame (DuckDB does the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@query(
    "q_win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(row_number() OVER w AS BIGINT) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY row_number() OVER w <= 3
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per customer by price desc,
    keep top 3 (BASELINE.md B5)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_leadlag",
    oracle="""
    SELECT event_id, user_id,
           lag(value)  OVER w AS prev_v,
           lead(value) OVER w AS next_v,
           round(value - lag(value) OVER w, 4) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user in event-time order + delta vs previous
    (NULL at partition edges)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


@query(
    "q_win_frame_rows",
    oracle="""
    WITH daily AS (
        SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS d,
               sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem GROUP BY 1
    )
    SELECT d,
           round(avg(rev) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4)
             AS ma7
    FROM daily
    """,
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row centered moving average of daily revenue
    (ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING; partial frames at the
    edges use available rows in both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_format(F.to_date("l_shipdate"), "yyyy-MM-dd").alias("d")
    ).agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    w = Window.orderBy("d").rowsBetween(-3, 3)
    return daily.select("d", F.round(F.avg("rev").over(w), 4).alias("ma7"))


@query(
    "q_win_frame_range",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_nr,
           round(sum(o_totalprice) OVER
                 (PARTITION BY o_custkey
                  ORDER BY CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INTEGER)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS rev30
    FROM orders
    """,
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running 30-day revenue per customer — a true RANGE frame over an
    epoch-day key (portable formulation of
    ``RANGE BETWEEN INTERVAL 30 DAYS PRECEDING``); same-day orders are
    peers and always share a frame."""
    o = load_table(spark, sf_dir, "orders")
    day_nr = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("day_nr"))
        .rangeBetween(-30, 0)
    )
    return o.withColumn("day_nr", day_nr).select(
        "o_orderkey",
        "o_custkey",
        "day_nr",
        F.round(F.sum("o_totalprice").over(w), 4).alias("rev30"),
    )


@query(
    "q_win_running",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_v
    FROM events
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user in event-time order (the event-log
    running-state materialization)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("cum_v"),
    )


@query(
    "q_win_distribution",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS BIGINT)      AS quartile,
           round(percent_rank() OVER w, 4)      AS pr,
           round(cume_dist() OVER w, 4)         AS cd
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over the full customer order.
    The unique ``c_custkey`` tie-break removes peer groups, so all
    three reduce to closed forms of the unique global rank r and total
    n: ntile = fill rule, percent_rank = (r−1)/(n−1), cume_dist = r/n.
    The rank comes from ``bucketed_running_sum`` (per-bucket windows +
    broadcast carry) instead of a single-partition total sort — exact
    same values, scales with partitions."""
    from events_to_db_spark.plans.prefix import bucketed_running_sum, ntile_from_rank

    c = load_table(spark, sf_dir, "customer")
    n_tot = c.agg(F.count("*").alias("n_tot"))
    ranked = bucketed_running_sum(
        c.select("c_custkey", "c_acctbal"),
        bucket=F.floor(F.col("c_acctbal") / F.lit(500.0)),
        order_cols=[F.col("c_acctbal"), F.col("c_custkey")],
        sums={"rank": F.lit(1)},
    )
    return ranked.crossJoin(F.broadcast(n_tot)).select(
        "c_custkey",
        ntile_from_rank(F.col("rank"), F.col("n_tot"), 4).cast("long").alias("quartile"),
        F.round(
            F.when(F.col("n_tot") > 1, (F.col("rank") - 1) / (F.col("n_tot") - 1))
            .otherwise(F.lit(0.0)),  # percent_rank of a single row is 0
            4,
        ).alias("pr"),
        F.round(F.col("rank") / F.col("n_tot"), 4).alias("cd"),
    )


# ---------------------------------------------------------------- §2.6


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit: the fully tie-broken first 100.
    Compiles to TakeOrderedAndProject — per-partition top-k then a
    k-way driver merge; no global sort materialization at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(100)
    )


@query(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 by price (AQL LIMIT over a total order)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(50)
    )


@query(
    "q_topk_group",
    oracle="""
    SELECT event_type, event_id, value,
           CAST(row_number() OVER w AS BIGINT) AS rn
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    QUALIFY row_number() OVER w <= 5
    """,
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 events by value per type (BASELINE.md B9) — the windowed
    top-k pattern: shuffle on the group key, per-partition sort, filter."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "q_win_firstlast",
    oracle="""
    SELECT user_id, event_id,
           first_value(value) OVER w  AS first_v,
           last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS last_v,
           nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS second_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value per user timeline.  The
    frame discipline is load-bearing: last/nth need an UNBOUNDED
    FOLLOWING frame (the default frame stops at CURRENT ROW, silently
    turning last_value into "value so far" — in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w_full).alias("last_v"),
        F.nth_value("value", 2).over(w_full).alias("second_v"),
    )


@query(
    "q_win_ratio",
    oracle="""
    SELECT event_type,
           CAST(d AS VARCHAR) AS d,
           round(sum_v / sum(sum_v) OVER (PARTITION BY event_type), 6) AS share
    FROM (
        SELECT event_type, CAST(ts AS DATE) AS d, sum(value) AS sum_v
        FROM events GROUP BY 1, 2
    )
    """,
)
def q_win_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each day's share of its event type's total —
    aggregate once, then a window over the (small) aggregate, not over
    raw events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.sum("value").alias("sum_v"))
    w = Window.partitionBy("event_type")
    return daily.select(
        "event_type",
        F.col("d").cast("string").alias("d"),
        F.round(F.col("sum_v") / F.sum("sum_v").over(w), 6).alias("share"),
    )


@query(
    "q_win_movmedian",
    oracle="""
    SELECT CAST(d AS VARCHAR) AS d,
           round(rev, 4) AS rev,
           round(median(rev) OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) AS med7
    FROM (
        SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS rev
        FROM orders GROUP BY 1
    )
    """,
)
def q_win_movmedian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row centered moving *median* of daily revenue — the robust
    counterpart of ``q_win_frame_rows``'s moving average (medians
    shrug off the spike days that drag a mean).  Both engines
    interpolate the even-count median, so the frames agree exactly
    under round-4.  The window runs over the per-day aggregate, not
    raw orders."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    return daily.select(
        F.col("d").cast("string").alias("d"),
        F.round(F.col("rev"), 4).alias("rev"),
        F.round(F.percentile("rev", F.lit(0.5)).over(w), 4).alias("med7"),
    )


@query(
    "q_win_time_range",
    oracle="""
    SELECT event_id,
           event_type,
           CAST(count(*) OVER (
               PARTITION BY event_type ORDER BY es
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_1h,
           CAST(sum(vc) OVER (
               PARTITION BY event_type ORDER BY es
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS sum_c_1h
    FROM (
        SELECT event_id, event_type,
               epoch_us(ts) // 1000000 AS es,
               CAST(round(value*100) AS BIGINT) AS vc
        FROM events
    )
    ORDER BY event_id
    """,
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per event, how many same-type events
    (and how much exact cent volume) landed in the trailing hour —
    the rolling-window-per-row shape (RANGE, not ROWS: peers at the
    same timestamp all see the same frame, so ties can't desync the
    engines).

    The frame is anchored on exact epoch *seconds* (integer-div of
    µs, per the µs-gap rule) rather than an interval literal, so both
    engines bound the frame with identical integer arithmetic.  One
    event_type-partitioned sort; frames evaluate incrementally with
    two pointers, never materializing the window.
    """
    ev = load_table(spark, sf_dir, "events")
    es = F.expr("(unix_micros(ts)) div 1000000")
    base = ev.select(
        "event_id",
        "event_type",
        es.alias("es"),
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("es")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        base.select(
            "event_id",
            "event_type",
            F.count("*").over(w).cast("bigint").alias("n_1h"),
            F.sum("vc").over(w).cast("bigint").alias("sum_c_1h"),
        )
        .orderBy("event_id")
    )


@query(
    "q_win_ignore_nulls",
    oracle="""
    WITH t AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT) END AS pv
        FROM events
    ),
    l AS (
        SELECT event_type,
               last_value(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS locf,
               first_value(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING
               ) AS first_purchase
        FROM t
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(locf) AS BIGINT) AS n_carrying,
           CAST(sum(locf) AS BIGINT) AS sum_locf_cents,
           CAST(sum(first_purchase) AS BIGINT) AS sum_first_cents
    FROM l
    GROUP BY event_type
    """,
)
def q_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window surface — the sparse-column carry rules SQL
    analytics needs for last-known-value semantics: ``last_value
    IGNORE NULLS`` over a running frame is exact LOCF (each event sees
    the user's most recent purchase amount), and ``first_value IGNORE
    NULLS`` over the full frame anchors every row to the user's first
    purchase.  Rows before a user's first purchase stay NULL under
    LOCF — that count (n − n_carrying) is part of the contract, which
    is precisely what a naive COALESCE-join reformulation gets wrong.

    All sums are exact cents BIGINTs; one user_id shuffle serves both
    frames.  The aggregate then reduces per event type.
    """
    ev = load_table(spark, sf_dir, "events")
    pv = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100).cast("bigint"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    l = ev.select(
        "event_type",
        F.last(pv, ignorenulls=True).over(run).alias("locf"),
        F.first(pv, ignorenulls=True).over(full).alias("first_purchase"),
    )
    return l.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("locf").alias("n_carrying"),
        F.sum("locf").alias("sum_locf_cents"),
        F.sum("first_purchase").alias("sum_first_cents"),
    )


@query(
    "q_sort_nulls",
    oracle="""
    WITH t AS (
        SELECT s_suppkey, s_name,
               CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS bal
        FROM supplier
    )
    SELECT s_suppkey, s_name,
           round(bal, 2) AS bal,
           CAST(row_number() OVER (
               ORDER BY bal DESC NULLS LAST, s_suppkey) AS BIGINT) AS rk_last,
           CAST(row_number() OVER (
               ORDER BY bal ASC NULLS FIRST, s_suppkey) AS BIGINT) AS rk_first
    FROM t
    """,
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL-ordering surface: the engines DISAGREE by default
    (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST), so any
    cross-engine ordered output over a nullable key silently diverges
    unless the placement is spelled out — this query pins both
    spellings (DESC NULLS LAST and ASC NULLS FIRST) by capturing each
    as a row_number.  Negative balances are nulled to create a real
    NULL population; suppkey breaks ties (§7.5).

    Scale note: the supplier dimension is rank-small here; over a fact
    table the same ranks go through plans/prefix.py's two-level scan —
    this query pins the NULL-placement semantics, not a sort strategy.
    """
    s = load_table(spark, sf_dir, "supplier")
    t = s.select(
        "s_suppkey",
        "s_name",
        F.when(F.col("s_acctbal") < 0, None)
        .otherwise(F.col("s_acctbal"))
        .alias("bal"),
    )
    w_last = Window.orderBy(F.col("bal").desc_nulls_last(), "s_suppkey")
    w_first = Window.orderBy(F.col("bal").asc_nulls_first(), "s_suppkey")
    return t.select(
        "s_suppkey",
        "s_name",
        F.round("bal", 2).alias("bal"),
        F.row_number().over(w_last).cast("bigint").alias("rk_last"),
        F.row_number().over(w_first).cast("bigint").alias("rk_first"),
    )


@query(
    "q_win_reset_sum",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, ts, event_type,
               CAST(round(value * 100) AS BIGINT) AS vc,
               count(CASE WHEN event_type = 'signup' THEN 1 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS epoch
        FROM events
    )
    SELECT event_id, user_id,
           CAST(epoch AS BIGINT) AS epoch,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN vc ELSE 0 END)
                OVER (PARTITION BY user_id, epoch ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS run_cents
    FROM e
    """,
)
def q_win_reset_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionally-resetting running total: each user's cumulative
    purchase spend since their most recent signup (a signup zeroes the
    counter) — the "session-scoped accumulator" window pattern that
    plain frames can't express directly.

    Two chained partitioned windows: the signup count up to each row
    numbers the reset epochs (the classic count-the-markers trick, the
    same shape as gaps-and-islands), then the running sum re-partitions
    by (user, epoch) so every reset starts a fresh frame.  Exact cents
    throughout; both shuffles are keyed by user (the second adds the
    derived epoch), so the plan scales as two ordinary sort-windows.
    """
    ev = load_table(spark, sf_dir, "events")
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.count(F.when(F.col("event_type") == "signup", 1))
        .over(w1)
        .alias("epoch"),
    )
    w2 = (
        Window.partitionBy("user_id", "epoch")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.col("epoch").cast("long").alias("epoch"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("vc")).otherwise(
                0
            )
        )
        .over(w2)
        .cast("long")
        .alias("run_cents"),
    )


@query(
    "q_page_keyset",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
    WHERE (o_orderdate, o_orderkey)
          > (TIMESTAMP '1997-03-01 00:00:00', 0)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20
    """,
)
def q_page_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination: the page after cursor
    ``(1997-03-01, 0)`` in ``(o_orderdate, o_orderkey)`` order — the
    O(page) replacement for OFFSET pagination (q_page_offset), which
    re-scans and discards every earlier row.

    The row-value comparison compiles to a sargable range predicate,
    so parquet min/max stats skip every file entirely before the
    cursor date — the seek actually *prunes I/O*, not just rows — and
    the LIMIT is a TakeOrderedAndProject, never a global sort.  The
    cursor key includes the unique orderkey, so pages are
    deterministic and gap-free under ties.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(
            F.struct("o_orderdate", "o_orderkey")
            > F.struct(
                F.lit("1997-03-01 00:00:00")
                .cast("timestamp")
                .alias("o_orderdate"),
                F.lit(0).cast("long").alias("o_orderkey"),
            )
        )
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
                "price_cents"
            ),
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
    )


@query(
    "q_win_ulcer",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    pk AS (
        SELECT day, x,
               max(x) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
        FROM d
    ),
    dd AS (
        SELECT day, (10000 * (peak - x)) // peak AS dd_bp
        FROM pk WHERE peak > 0
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(dd_bp * dd_bp) AS BIGINT) AS sum_dd2,
               CAST(max(dd_bp) AS BIGINT) AS max_dd_bp
        FROM dd
    )
    SELECT n_days, sum_dd2, max_dd_bp,
           round(sqrt(CAST(sum_dd2 AS DOUBLE) / n_days), 4) AS ulcer_bp
    FROM s
    """,
)
def q_win_ulcer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer Index of the daily purchase-revenue series — the
    DURATION-weighted drawdown risk measure (Martin 1987):
    UI = √(mean dd²) over per-day percentage drawdowns from the
    running peak.  q_win_drawdown reports the single worst dip; UI
    punishes long shallow underwater stretches the max statistic
    cannot see — the pair is the standard risk panel.

    Determinism: the running peak is exact integer cents; each day's
    drawdown is the FLOORED basis-point integer ⌊10⁴·(peak−x)/peak⌋
    (non-negative operands — floor ≡ truncate in both engines), so
    Σdd² is pure integer arithmetic and the final √ is the only
    float.  peak > 0 always holds for a revenue series (guarded
    anyway — a zero-revenue first day must not divide).

    Scale shape: one keyed date aggregate; the running peak is a
    broadcast θ-join over the calendar-bounded day series (days² ≤
    ~900 pairs — deliberately NOT the single-partition global window,
    whose tiny AQE shuffle proved plan-unstable across session
    contexts in the r9 audit; at an unbounded grain the peak goes
    through plans/prefix.bucketed_running_max)."""
    ev = load_table(spark, sf_dir, "events")
    # `value IS NOT NULL` is semantically inert (SUM skips NULLs) but
    # keeps this aggregate canonically DISTINCT from the identical
    # daily-revenue frame q_stat_mannkendall `.cache()`s: without it,
    # any session where mannkendall ran first substitutes the
    # InMemoryRelation into THIS plan (CacheManager sameResult match)
    # and the plan fingerprint flips between session contexts —
    # caught live by the r9 --plans gate.
    d = (
        ev.where(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("x")
        )
    )
    from events_to_db_spark.plans.checkpoints import truncate_lineage

    # the broadcast side is lineage-truncated so the θ-join does NOT
    # carry two copies of the same agg subtree: AQE's runtime exchange
    # reuse on identical twins is timing-dependent and flipped the
    # fingerprint the same way; a pinned 30-row side has no reuse
    # question.
    b = truncate_lineage(
        d.select(F.col("day").alias("bday"), F.col("x").alias("bx")),
        eager=False,
    )
    pk = (
        d.join(F.broadcast(b), F.col("bday") <= F.col("day"))
        .groupBy("day", "x")
        .agg(F.max("bx").alias("peak"))
    )
    dd = pk.where(F.col("peak") > 0).select(
        F.expr("(10000 * (peak - x)) div peak").alias("dd_bp")
    )
    s = dd.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.col("dd_bp") * F.col("dd_bp"))
        .cast("long")
        .alias("sum_dd2"),
        F.max("dd_bp").cast("long").alias("max_dd_bp"),
    )
    return s.select(
        "n_days",
        "sum_dd2",
        "max_dd_bp",
        F.round(
            F.sqrt(F.col("sum_dd2").cast("double") / F.col("n_days")), 4
        ).alias("ulcer_bp"),
    )


@query(
    "q_win_sortino",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events
        WHERE event_type = 'purchase' AND event_id IS NOT NULL
        GROUP BY 1
    ),
    ch AS (
        SELECT day, x,
               x - lag(x) OVER (ORDER BY day) AS dx,
               max(x) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
        FROM d
    ),
    s AS (
        SELECT CAST(count(dx) AS BIGINT) AS n,
               CAST(coalesce(sum(dx), 0) AS BIGINT) AS sdx,
               CAST(coalesce(sum(CASE WHEN dx < 0 THEN dx * dx END), 0)
                    AS BIGINT) AS dd2,
               CAST(max(peak - x) AS BIGINT) AS max_dd
        FROM ch
    )
    SELECT n AS n_changes, sdx AS sum_change_cents, dd2 AS downside_sq,
           max_dd AS max_drawdown_cents,
           CASE WHEN dd2 > 0 THEN
               round((CAST(sdx AS DOUBLE) / n)
                     / sqrt(CAST(dd2 AS DOUBLE) / n), 4) END
               AS sortino,
           CASE WHEN max_dd > 0 THEN
               round(CAST(sdx AS DOUBLE) / n / max_dd, 6) END
               AS calmar
    FROM s
    """,
)
def q_win_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sortino and Calmar ratios of the daily purchase-revenue
    series — the downside-risk panel beside q_win_ulcer/q_win_drawdown:
    Sortino divides mean daily change by the DOWNSIDE deviation only
    (σ of negative changes — symmetric σ punishes good days), Calmar
    by the maximum drawdown.

    Determinism: daily changes, the downside sum-of-squares, and the
    running-peak drawdown are all exact integer cents (dd² is
    quadratic in value scale — at 1000-day × 1e8-cent series move it
    to DECIMAL(38,0), noted); both ratios are single final DOUBLE
    expressions, NULL-guarded when the series never falls.  The daily
    frame adds an inert `event_id IS NOT NULL` so it stays
    cache-canonical vs q_stat_mannkendall's cached twin (the r9
    --plans lesson on q_win_ulcer); the oracle carries the SAME
    predicate (ADVICE r09 — a regenerated corpus with NULL event_ids
    must not silently diverge the engines).

    Scale: one keyed date aggregate; lag + running max live on the
    calendar-bounded day table (allowlisted)."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(
            (F.col("event_type") == "purchase")
            & F.col("event_id").isNotNull()
        )
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    w = Window.orderBy("day")
    w_peak = w.rowsBetween(Window.unboundedPreceding, 0)
    ch = d.select(
        "x",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        F.max("x").over(w_peak).alias("peak"),
    )
    s = ch.agg(
        F.count("dx").cast("long").alias("n"),
        F.coalesce(F.sum("dx"), F.lit(0)).cast("long").alias("sdx"),
        F.coalesce(
            F.sum(
                F.when(F.col("dx") < 0, F.col("dx") * F.col("dx"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("dd2"),
        F.max(F.col("peak") - F.col("x")).cast("long").alias("max_dd"),
    )
    return s.select(
        F.col("n").alias("n_changes"),
        F.col("sdx").alias("sum_change_cents"),
        F.col("dd2").alias("downside_sq"),
        F.col("max_dd").alias("max_drawdown_cents"),
        F.when(
            F.col("dd2") > 0,
            F.round(
                (F.col("sdx").cast("double") / F.col("n"))
                / F.sqrt(F.col("dd2").cast("double") / F.col("n")),
                4,
            ),
        ).alias("sortino"),
        F.when(
            F.col("max_dd") > 0,
            F.round(
                F.col("sdx").cast("double")
                / F.col("n")
                / F.col("max_dd"),
                6,
            ),
        ).alias("calmar"),
    )


@query(
    "q_win_twr",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
              AND ts IS NOT NULL
        GROUP BY 1
    ),
    f AS (
        SELECT x, lag(x) OVER (ORDER BY day) AS xp
        FROM d
    ),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(1000000e0
                       * ln(CAST(x AS DOUBLE) / xp)) AS BIGINT))
                    AS BIGINT) AS l6
        FROM f WHERE xp IS NOT NULL AND xp > 0 AND x > 0
    )
    SELECT n AS n_periods, l6 AS lnsum6,
           round(exp(CAST(l6 AS DOUBLE) / 1000000e0) - 1, 6)
               AS twr,
           CASE WHEN n > 0 THEN
               round(exp(CAST(l6 AS DOUBLE) / 1000000e0 / n) - 1, 6)
           END AS geo_daily_growth
    FROM t
    """,
)
def q_win_twr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted return of the daily purchase-revenue series: the
    chain-linked product Π(x_t/x_{t−1}) − 1 — the growth measure
    that, unlike a simple end/start ratio, is well-defined when the
    chain is later split by period (its log is additive), and the
    finance-standard companion to q_win_sortino's risk panel.

    Determinism: each daily log growth factor ln(x_t/x_{t−1}) is a
    shared DOUBLE expression on exact integer cents FLOORED at 10⁶
    fixed-point into a BIGINT (the q_ml_logloss trick — the integer
    sum is then order-free, no prefix needed); the chained return
    exp(L/10⁶) − 1 and the geometric daily rate are single shared
    expressions.  Zero-revenue endpoints are excluded exactly (a
    zero day makes the chain product degenerate — documented).  The
    floor biases each factor down < 1e-6 — spec.

    Scale: one keyed date aggregate + one lag over the
    calendar-bounded day table (allowlisted), one 1-row aggregate.
    The daily frame carries inert `value IS NOT NULL` and
    `ts IS NOT NULL` predicates to stay cache-canonical vs
    q_stat_mannkendall's cached twin — the oracle mirrors BOTH
    (ADVICE r09: a regenerated corpus with NULLs there must not
    silently diverge the engines)."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.where(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
            & F.col("ts").isNotNull()
        )
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    w = Window.orderBy("day")
    f = d.select("x", F.lag("x").over(w).alias("xp"))
    t = f.where(
        F.col("xp").isNotNull() & (F.col("xp") > 0) & (F.col("x") > 0)
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.floor(
                F.lit(1000000.0)
                * F.log(F.col("x").cast("double") / F.col("xp"))
            ).cast("long")
        )
        .cast("long")
        .alias("l6"),
    )
    return t.select(
        F.col("n").alias("n_periods"),
        F.col("l6").alias("lnsum6"),
        F.round(
            F.exp(F.col("l6").cast("double") / 1000000.0) - 1, 6
        ).alias("twr"),
        F.when(
            F.col("n") > 0,
            F.round(
                F.exp(
                    F.col("l6").cast("double") / 1000000.0 / F.col("n")
                )
                - 1,
                6,
            ),
        ).alias("geo_daily_growth"),
    )
