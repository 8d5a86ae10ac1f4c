"""Aggregation operators — SURVEY.md §2.4.

Covers the full hash-aggregate family the AQL ``AGGREGATE`` stage and
any downstream SQL consumer of an events-to-db copy would run: grouped
sums/averages, distinct counts, statistical moments, HAVING,
conditional aggregation, ROLLUP / CUBE / GROUPING SETS, ordered array
collection, and pivot.

Scale notes (SURVEY.md §7.4): every query here is a pure
``groupBy().agg()`` plan — Catalyst plans it as partial (map-side)
HashAggregate → shuffle on the group keys → final HashAggregate, so the
shuffle carries only per-partition partial states, not rows.  Distinct
aggregates expand to the standard two-phase plan; approx variants use
HyperLogLog++ sketches that merge associatively (cluster-safe).  Float
outputs are rounded to 4 decimals for oracle hash-parity (SURVEY §7.5.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


def _r(col, alias):
    """round-4 + alias — the §7.5.1 hash-parity idiom."""
    return F.round(col, 4).alias(alias)


@query(
    "q_agg_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — Catalyst's two-phase expand plan
    (BASELINE.md B6)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@query(
    "q_agg_multidistinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)          AS n_users,
           count(DISTINCT CAST(ts AS DATE)) AS n_days
    FROM events GROUP BY event_type
    """,
)
def q_agg_multidistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates over different columns in one pass
    (Expand multiplies input once per distinct group)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT event_type,
           round(min(value), 4)                 AS min_v,
           round(max(value), 4)                 AS max_v,
           round(avg(value), 4)                 AS avg_v,
           round(stddev_samp(value), 4)         AS std_v,
           round(var_samp(value), 4)            AS var_v,
           round(quantile_cont(value, 0.5), 4)  AS median_v
    FROM events GROUP BY event_type
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moment family + interpolated median (Spark
    ``percentile`` ↔ DuckDB ``quantile_cont`` — both interpolate,
    validated in SURVEY.md §7.5)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        _r(F.min("value"), "min_v"),
        _r(F.max("value"), "max_v"),
        _r(F.avg("value"), "avg_v"),
        _r(F.stddev_samp("value"), "std_v"),
        _r(F.var_samp("value"), "var_v"),
        _r(F.percentile("value", F.lit(0.5)), "median_v"),
    )


@query("q_agg_approx")  # rows-only: HLL estimates differ across engines by design
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global approximate distinct count (HyperLogLog++).  The sketch
    merges associatively across partitions — the 100 TB path for
    cardinality estimation.  No value oracle (estimate is
    engine-specific); driver records the rows-only check."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.approx_count_distinct("user_id").alias("approx_users"))


@query("q_agg_approx_quantile")  # rows-only: sketch estimates are engine-specific
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles per event type (Greenwald–Khanna sketch,
    relative error 1e-4): p50/p95/p99 of ``value``.  Like HLL, the
    sketch merges associatively across partitions — the scale path for
    percentile dashboards where exact ``percentile()`` would shuffle
    every value.  Rows-only check (estimates are engine-specific).
    Emitted as three scalar DOUBLE columns (not one ARRAY) so the
    driver harness can canonicalize the output."""
    ev = load_table(spark, sf_dir, "events")
    pcts = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(10000)
    )
    return ev.groupBy("event_type").agg(
        F.element_at(pcts, 1).alias("p50"),
        F.element_at(pcts, 2).alias("p95"),
        F.element_at(pcts, 3).alias("p99"),
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) >= 20
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING) — a filter above the final
    HashAggregate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 20)
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT c_nationkey,
           count(CASE WHEN c_acctbal < 0 THEN 1 END)                     AS n_neg,
           CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT)
                                                                         AS n_rich,
           round(sum(CASE WHEN c_acctbal > 5000 THEN c_acctbal ELSE 0 END), 4)
                                                                         AS sum_rich
    FROM customer GROUP BY c_nationkey
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if / sum(CASE WHEN …) per nation."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count_if(F.col("c_acctbal") < 0).alias("n_neg"),
        F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0))
        .cast("long")
        .alias("n_rich"),
        _r(
            F.sum(F.when(F.col("c_acctbal") > 5000, F.col("c_acctbal")).otherwise(0.0)),
            "sum_rich",
        ),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           count(*)                  AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (flag,status) → (flag) → grand total
    (BASELINE.md B12; 10 rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _r(F.sum("l_quantity"), "sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d, count(*) AS n
    FROM events
    GROUP BY CUBE (event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d'))
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type × day): all four grouping-set combinations.
    Day emitted as ISO string (date-output parity rule)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("d", F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
        .cube("event_type", "d")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_agg_groupingsets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INTEGER)  AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER)  AS g_status,
           round(sum(l_quantity), 4)                AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_groupingsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() null-vs-group markers."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT)  AS g_flag,
               CAST(grouping(l_linestatus) AS INT)  AS g_status,
               round(sum(l_quantity), 4)            AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT event_type, rk, round(v, 4) AS v
    FROM (
        SELECT event_type, value AS v,
               row_number() OVER (PARTITION BY event_type ORDER BY value DESC) AS rk
        FROM events
    )
    WHERE rk <= 5
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array collection: top-5 values per type collected as a
    sorted array, then exploded to (event_type, rk, v) scalar rows so
    the driver harness can canonicalize the output (no ARRAY columns in
    contract outputs).  Ties are value-equal, so row_number vs
    sort_array positioning cannot diverge on emitted values (§7.5.5)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.slice(F.sort_array(F.collect_list("value"), asc=False), 1, 5).alias("top5"))
        .select("event_type", F.posexplode("top5").alias("pos", "val"))
        .select(
            "event_type",
            (F.col("pos") + 1).cast("long").alias("rk"),
            F.round("val", 4).alias("v"),
        )
    )


@query(
    "q_pivot",
    oracle="""
    SELECT user_id % 10 AS decile,
           count(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
           count(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           count(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
           count(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view
    FROM events GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into five count columns per user decile.  The
    pivot value list is pinned (no discovery pass); empty cells are
    coalesced to 0 to match the conditional-aggregation oracle."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        ev.withColumn("decile", F.col("user_id") % 10)
        .groupBy("decile")
        .pivot("event_type", types)
        .count()
    )
    return piv.select(
        "decile",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


@query(
    "q_agg_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (flagship query).

    Grouped full-scan aggregation over the fact table: the canonical
    partial+final HashAggregate plan.  Only 4 of 11 lineitem columns are
    read (column pruning) and the shipdate predicate is pushed to the
    Parquet row-group stats.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity"), "sum_qty"),
            _r(F.sum("l_extendedprice"), "sum_base_price"),
            _r(F.sum(disc_price), "sum_disc_price"),
            _r(F.sum(disc_price * (1 + F.col("l_tax"))), "sum_charge"),
            _r(F.avg("l_quantity"), "avg_qty"),
            _r(F.avg("l_extendedprice"), "avg_price"),
            _r(F.avg("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_agg_stringagg",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT c_name, ',' ORDER BY c_name) AS top_names
    FROM customer
    WHERE c_acctbal > 9900
    GROUP BY c_mktsegment
    """,
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/GROUP_CONCAT class): names
    of very-high-balance customers per segment, sorted and joined —
    deterministic because the element order is explicit (§7.5.5)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") > 9900)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_name")), ","
            ).alias("top_names")
        )
    )


@query(
    "q_agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)       AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp,
           round(covar_pop(l_quantity, l_extendedprice), 4)  AS covp_qp,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_pq,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept_pq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample and
    population covariance, and OLS slope/intercept of price on
    quantity.  All are single-pass co-moment aggregates — Catalyst
    plans the usual partial/final HashAggregate pair, so the shuffle
    carries six co-moment states per group, not rows (cluster-safe at
    any scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        _r(F.corr(q, p), "corr_qp"),
        _r(F.covar_samp(q, p), "covs_qp"),
        _r(F.covar_pop(q, p), "covp_qp"),
        _r(F.regr_slope(p, q), "slope_pq"),
        _r(F.regr_intercept(p, q), "icept_pq"),
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT c_mktsegment,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           bool_or(c_acctbal > 9990)   AS any_near_cap,
           bool_and(c_nationkey < 25)  AS all_valid_nation
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (EVERY / ANY class): per market segment,
    whether every balance clears the floor and whether any sits near
    the cap.  AND/OR fold associatively, so partial aggregation ships
    one boolean per partition per group."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9990).alias("any_near_cap"),
        F.bool_and(F.col("c_nationkey") < 25).alias("all_valid_nation"),
    )


@query(
    "q_agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY count(*) DESC, o_orderpriority) AS rn
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE(): most frequent order priority per status.
    Built-in ``mode()`` is tie-arbitrary in both engines (§7.5.6), so
    the engine uses the portable argmax formulation — grouped count,
    then a window over the (tiny) per-group count table with an
    explicit tie-break on the value itself."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@query(
    "q_agg_bitwise",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS band_uid,
           bit_or(user_id)  AS bor_uid,
           bit_xor(user_id) AS bxor_uid
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND / OR / XOR aggregates over user ids per event type
    — commutative-associative folds (XOR doubles as a cheap set
    checksum for reconciliation between an event log and its DB copy,
    the events-to-db integrity use-case)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band_uid"),
        F.bit_or("user_id").alias("bor_uid"),
        F.bit_xor("user_id").alias("bxor_uid"),
    )


@query(
    "q_agg_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 10) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(value), 4) AS bin_min,
           round(max(value), 4) AS bin_max
    FROM events
    GROUP BY event_type, bin
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``value`` per event type (bin width
    10) with per-bin extrema — the distribution profile a monitoring
    consumer of an event-log copy renders.  Binning by ``floor`` is a
    pure projection, so the whole query is one hash-aggregate on
    (type, bin); bins are bounded by the value domain, not row count."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 10).cast("long").alias("bin"),
    ).agg(
        F.count("*").alias("n"),
        _r(F.min("value"), "bin_min"),
        _r(F.max("value"), "bin_max"),
    )


@query(
    "q_agg_weighted",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_discount) / sum(l_extendedprice), 6)
               AS wavg_disc,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS wavg_price_per_unit
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted averages: price-weighted discount and quantity-
    weighted unit price per return flag — the ratio-of-sums shape
    (never avg-of-ratios) that stays exact under partial aggregation:
    both numerator and denominator are plain SUMs, so map-side combine
    applies and the division happens once, at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    p, d, q = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(p * d) / F.sum(p), 6).alias("wavg_disc"),
        F.round(F.sum(p * q) / F.sum(q), 4).alias("wavg_price_per_unit"),
    )


@query(
    "q_agg_percentile_disc",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           list_sort(list(value))[CAST(ceil(0.5 * count(*)) AS BIGINT)] AS p50_disc,
           list_sort(list(value))[CAST(ceil(0.9 * count(*)) AS BIGINT)] AS p90_disc
    FROM events GROUP BY event_type
    """,
)
def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (PERCENTILE_DISC class): the smallest
    actual data value at cumulative rank ≥ p — unlike the
    interpolating `percentile` of ``q_agg_stats``, the answer is an
    existing row value, so the cross-engine match is exact with no
    rounding.  Both engines use the identical explicit order-statistic
    (index ⌈p·n⌉ of the group's sort order) rather than their built-in
    ``*_disc`` variants, whose index conventions differ.

    Scale shape: rank-based — a partitioned row_number over the sorted
    group plus a broadcast join of per-group counts, then filter on
    the two target indexes.  Sort-based and spillable; no per-group
    ``collect_list`` array ever materializes in executor memory (the
    VERDICT r01 scale fix).  The value at a sorted index is unique
    regardless of how row_number permutes tied values."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    ranked = ev.select(
        "event_type", "value", F.row_number().over(w).alias("rn")
    ).join(F.broadcast(counts), "event_type")
    idx50 = F.ceil(0.5 * F.col("n"))
    idx90 = F.ceil(0.9 * F.col("n"))
    return (
        ranked.filter((F.col("rn") == idx50) | (F.col("rn") == idx90))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("rn") == idx50, F.col("value"))).alias("p50_disc"),
            F.max(F.when(F.col("rn") == idx90, F.col("value"))).alias("p90_disc"),
        )
    )


@query(
    "q_agg_gini",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(2.0 * sum(rnk * spend) / (count(*) * sum(spend))
                 - (count(*) + 1.0) / count(*), 4) AS gini
    FROM (
        SELECT c_mktsegment, spend,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY spend, c_custkey) AS rnk
        FROM (
            SELECT c.c_mktsegment, c.c_custkey,
                   coalesce(sum(o.o_totalprice), 0.0) AS spend
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment, c.c_custkey
        )
    )
    GROUP BY c_mktsegment
    """,
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-spend concentration per segment —
    the inequality metric (0 = uniform, →1 = winner-takes-all) a
    marketplace watches; computed with the rank formulation
    ``G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n`` over per-customer spend
    (zero-order customers included via left join).  Equal spends give
    the same Σ i·xᵢ under any tie order, so the custkey tie-break
    makes ranks — and the result — fully deterministic.  Plan: one
    join-aggregate, one window over per-customer rows, one final
    aggregate; all keyed on the segment."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("spend", "c_custkey")
    ranked = spend.withColumn("rnk", F.row_number().over(w))
    n = F.count("*")
    return ranked.groupBy("c_mktsegment").agg(
        n.alias("n_customers"),
        F.round(
            2.0 * F.sum(F.col("rnk") * F.col("spend")) / (n * F.sum("spend"))
            - (n + 1.0) / n,
            4,
        ).alias("gini"),
    )


@query(
    "q_agg_moments",
    oracle="""
    WITH s AS (
        SELECT event_type,
               count(*) AS n,
               sum(value) AS s1,
               sum(value * value) AS s2,
               sum(value * value * value) AS s3,
               sum(value * value * value * value) AS s4
        FROM events GROUP BY event_type
    ),
    m AS (
        SELECT event_type, n,
               s1 / n AS mean,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - 3 * (s1 / n) * (s2 / n)
                   + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4 / n - 4 * (s1 / n) * (s3 / n)
                   + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                   - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM s
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(mean, 4) AS mean,
           round(m2, 4) AS m2,
           round(m3 / pow(m2, 1.5), 4) AS skewness,
           round(m4 / (m2 * m2) - 3, 4) AS excess_kurtosis
    FROM m
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments per group — skewness and excess
    kurtosis derived algebraically from raw power sums (Σv, Σv², Σv³,
    Σv⁴).  Built-in ``skewness``/``kurtosis`` are NOT used on purpose:
    Spark computes population moments while DuckDB applies sample
    bias-correction, so the built-ins can never hash-match; the raw
    power sums are engine-neutral, one-pass, partial-aggregate-safe,
    and mergeable across shards (the same property q_ev_incremental
    certifies for count/sum).  One scan, one hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = (
        F.col("s3") / F.col("n")
        - 3 * mean * (F.col("s2") / F.col("n"))
        + 2 * mean * mean * mean
    )
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mean * (F.col("s3") / F.col("n"))
        + 6 * mean * mean * (F.col("s2") / F.col("n"))
        - 3 * mean * mean * mean * mean
    )
    return s.select(
        "event_type",
        "n",
        F.round(mean, 4).alias("mean"),
        F.round(m2, 4).alias("m2"),
        F.round(m3 / F.pow(m2, 1.5), 4).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 4).alias("excess_kurtosis"),
    )


@query(
    "q_agg_percentile_cont",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value_c, 0.25), 4) AS p25,
           round(quantile_cont(value_c, 0.50), 4) AS p50,
           round(quantile_cont(value_c, 0.75), 4) AS p75,
           round(quantile_cont(value_c, 0.99), 4) AS p99
    FROM (
        SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_c
        FROM events
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linearly-interpolated percentiles (PERCENTILE_CONT class)
    per event type, computed on exact value cents.

    Both engines interpolate at rank (n−1)·p over the sorted exact
    integers, so the one float each produces comes from the identical
    (lo, hi, frac) triple — deterministic across engines (§7.5).
    Spark's `percentile` is the sort-based exact aggregate: per-group
    state is a value→count map, not a row list, so executor memory is
    bounded by distinct values (~40k cents here), not group size.
    """
    ev = load_table(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100).cast("bigint")
    agg = [
        F.round(F.percentile(F.col("value_c"), F.lit(p)), 4).alias(name)
        for p, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.99, "p99")]
    ]
    return (
        ev.select("event_type", vc.alias("value_c"))
        .groupBy("event_type")
        .agg(*agg)
        .orderBy("event_type")
    )


@query(
    "q_agg_bitmap",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via Spark 4's bitmap aggregate family:
    user ids are bucketed (32 768 bits per bucket), each
    (type, bucket) group ORs its positions into one bitmap with
    ``bitmap_construct_agg``, and ``bitmap_count`` + a sum rolls the
    buckets up — the roaring-bitmap-style pattern warehouses use to
    make COUNT(DISTINCT) mergeable and re-aggregatable (per-shard
    bitmaps OR together losslessly, unlike raw distinct sets that must
    reshuffle).  The oracle is plain COUNT(DISTINCT): the bitmap path
    must agree exactly, which is the property that separates it from
    the HLL/KMV sketches next door.

    Two hash aggregations, both map-side combinable; state per group
    is one 4 KB bitmap regardless of row count.
    """
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))"
        ).alias("cnt")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_users")
    )


@query(
    "q_agg_hhi",
    oracle="""
    WITH rev AS (
        SELECT r.r_name, l.l_suppkey,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey  = l.l_suppkey
        JOIN nation  n  ON n.n_nationkey = s.s_nationkey
        JOIN region  r  ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    )
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(CAST(sum(cents * cents) AS DOUBLE)
                 / (CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)),
                 6) AS hhi,
           round(CAST(max(cents) AS DOUBLE) / CAST(sum(cents) AS DOUBLE), 6)
               AS top_share
    FROM rev
    GROUP BY r_name
    """,
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue per
    region — the market-concentration metric (1/n = perfectly even,
    → 1 = monopoly) computed as ``Σ revᵢ² / (Σ revᵢ)²``, which is
    algebraically Σ shareᵢ² but needs no per-row division: revenues are
    exact cents (BIGINT), squares are summed as DECIMAL(38,0) (a
    supplier's revenue crosses the int64-squared line around 3e9
    cents), and the single float division happens once per region on
    identical integers in both engines.  ``top_share`` (largest
    supplier's share) rides along from the same aggregate.

    Two hash aggregates: per-(region, supplier) revenue — map-side
    combinable, keyed by the join-enriched region — then a 5-row
    region rollup.  Dimension joins (supplier/nation/region) broadcast;
    the lineitem scan reads two columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    rev = (
        li.select(
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
        )
        .join(F.broadcast(sup.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat.select("n_nationkey", "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "l_suppkey")
        .agg(F.sum("c").alias("cents"))
    )
    tot = F.sum(F.col("cents").cast("decimal(38,0)"))
    return rev.groupBy("r_name").agg(
        F.count("*").alias("n_suppliers"),
        F.round(
            F.sum(
                (F.col("cents").cast("decimal(38,0)") * F.col("cents"))
            ).cast("double")
            / (tot.cast("double") * tot.cast("double")),
            6,
        ).alias("hhi"),
        F.round(
            F.max("cents").cast("double") / tot.cast("double"), 6
        ).alias("top_share"),
    )


@query(
    "q_agg_trimmed",
    oracle="""
    WITH s AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    r AS (
        SELECT event_type, vc,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY vc, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM s
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(n) // 10 AS BIGINT) AS k_trimmed_each_side,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(vc) AS BIGINT) AS kept_cents,
           round(CAST(sum(vc) AS DOUBLE) / count(*) / 100, 4)
               AS trimmed_mean
    FROM r
    WHERE rk > n // 10 AND rk <= n - n // 10
    GROUP BY event_type
    """,
)
def q_agg_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% trimmed mean of ``value`` per event type — the
    outlier-robust location estimate, computed exactly: rank rows per
    group (unique (vc, event_id) tie-break), drop the bottom and top
    ⌊n/10⌋, sum the surviving exact cents.

    The rank is a *partitioned* window (group key = event_type), the
    kept-range predicate is pure integer arithmetic, and the mean is
    the one final double over exact BIGINTs — so unlike a float
    trimmed-mean UDF this hash-matches across engines and scales as an
    ordinary sort-based window + hash aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
    )
    w = Window.partitionBy("event_type").orderBy("vc", "event_id")
    wn = Window.partitionBy("event_type")
    r = s.select(
        "event_type",
        "vc",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    kept = r.where(
        (F.col("rk") > F.expr("n div 10"))
        & (F.col("rk") <= F.col("n") - F.expr("n div 10"))
    )
    return kept.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.expr("max(n) div 10").cast("long").alias("k_trimmed_each_side"),
        F.count("*").alias("n_kept"),
        F.sum("vc").cast("long").alias("kept_cents"),
        F.round(
            F.sum("vc").cast("double") / F.count("*") / 100, 4
        ).alias("trimmed_mean"),
    )


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS vc,
               CAST(round(l_quantity) AS BIGINT) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    r AS (
        SELECT l_returnflag, vc, w,
               sum(w) OVER (PARTITION BY l_returnflag
                            ORDER BY vc, l_orderkey, l_linenumber
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cumw,
               sum(w) OVER (PARTITION BY l_returnflag) AS totw
        FROM s
    )
    SELECT l_returnflag,
           CAST(max(totw) AS BIGINT) AS total_weight,
           CAST(min(vc) AS BIGINT) AS median_cents,
           round(min(vc) / 100e0, 2) AS median_price
    FROM r
    WHERE 2 * cumw >= totw
    GROUP BY l_returnflag
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: the
    smallest price whose cumulative quantity weight reaches half the
    group total — the exact order statistic, not an interpolation.

    Weights are exact integers (quantities are whole by construction),
    the cumulative scan is a *partitioned* window with a unique
    ``(price, orderkey, linenumber)`` tie-break, and the crossing row
    is found by an integer predicate (2·cumw ≥ totw — no division), so
    the result hash-matches.  One keyed sort-window + one hash agg;
    the group count bounds every post-scan structure.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("vc"),
        F.expr("cast(round(l_quantity) as bigint)").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("vc", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    r = s.select(
        "l_returnflag",
        "vc",
        F.sum("w").over(wc).alias("cumw"),
        F.sum("w").over(wt).alias("totw"),
    )
    return (
        r.where(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            F.max("totw").cast("long").alias("total_weight"),
            F.min("vc").cast("long").alias("median_cents"),
            F.round(F.min("vc") / 100.0, 2).alias("median_price"),
        )
    )


@query(
    "q_agg_grouping_id",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS rf,
           coalesce(l_linestatus, '<all>') AS ls,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           CAST(2 * grouping(l_returnflag) + grouping(l_linestatus)
                AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS total_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPING()/GROUPING_ID() disambiguation surface on a ROLLUP:
    a NULL group key can mean "subtotal row" OR "the key really was
    NULL" — the grouping flags are the only reliable way to tell, and
    every BI tool consuming rollups depends on them.

    Spark's grouping_id() numbers bits in the opposite column order
    from the per-column composition, so both engines emit the
    composed ``2·g(rf) + g(ls)`` form — a surface-semantics detail
    worth pinning.  Exact counts/sums; one rollup aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("cast(round(l_quantity) as bigint)")).alias(
                "total_qty"
            ),
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("ls"),
            "g_rf",
            "g_ls",
            (2 * F.col("g_rf") + F.col("g_ls")).cast("long").alias("gid"),
            "n",
            "total_qty",
        )
    )


@query(
    "q_agg_theil",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE event_type = 'purchase' AND value > 0
    ),
    pv AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY vc
    ),
    tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(c * vc) AS BIGINT) AS sv
        FROM pv
    ),
    terms AS (
        SELECT p.c, p.vc,
               CAST(floor(1000000 * ln(CAST(t.n * p.vc AS DOUBLE)
                                       / t.sv)) AS BIGINT) AS ln_fp
        FROM pv p CROSS JOIN tot t
    ),
    agg AS (
        SELECT CAST(sum(c * vc * ln_fp) AS BIGINT) AS t_sum_fp
        FROM terms
    )
    SELECT t.n, t.sv AS total_cents, a.t_sum_fp,
           round(CAST(a.t_sum_fp AS DOUBLE) / t.sv / 1000000, 6)
               AS theil_t
    FROM agg a CROSS JOIN tot t
    """,
)
def q_agg_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of purchase values — the
    DECOMPOSABLE inequality measure (between-group + within-group
    Theil sum exactly, which Gini does not) completing the
    concentration family next to q_agg_gini / q_ev_lorenz / q_agg_hhi.

    Determinism: T = (1/n)Σ(xᵢ/μ)ln(xᵢ/μ) is regrouped as
    (1/S)·Σ_distinct c·v·ln(n·v/S), so each distinct cent value
    contributes ONE floor(10⁶·ln)-fixed-point BIGINT term weighted by
    the exact integer c·v — the whole sum is integer arithmetic
    (order-free), one final scale-out division.  Magnitudes:
    Σc·v·ln_fp ≤ S·2e7 ≈ 6e15 at sf0.1 — BIGINT-safe (DECIMAL switch
    noted past ~3e11 total cents).

    Scale shape: per-distinct-value hash agg (the q_stat_levene scan
    shape), broadcast 1-row total, terms at value grain — linear, no
    windows."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"))
    pv = s.groupBy("vc").agg(F.count("*").cast("long").alias("c"))
    tot = pv.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("vc")).cast("long").alias("sv"),
    )
    terms = pv.crossJoin(F.broadcast(tot)).select(
        "c",
        "vc",
        F.expr(
            "CAST(floor(1000000 * ln(CAST(n * vc AS DOUBLE) / sv))"
            " AS BIGINT)"
        ).alias("ln_fp"),
    )
    agg = terms.agg(
        F.sum(F.col("c") * F.col("vc") * F.col("ln_fp"))
        .cast("long")
        .alias("t_sum_fp")
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "n",
        F.col("sv").alias("total_cents"),
        "t_sum_fp",
        F.round(
            F.col("t_sum_fp").cast("double") / F.col("sv") / 1000000, 6
        ).alias("theil_t"),
    )


@query(
    "q_agg_hoover",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s
        FROM u
    ),
    dev AS (
        SELECT CAST(sum(abs(n * x - s)) AS BIGINT) AS num, n, s
        FROM u CROSS JOIN tot
        GROUP BY n, s
    )
    SELECT n AS n_users, s AS total_cents, num AS hoover_num,
           round(CAST(num AS DOUBLE) / (2e0 * n * s), 6) AS hoover
    FROM dev
    """,
)
def q_agg_hoover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index of per-user purchase revenue: the
    share of total revenue that would have to move between users to
    equalize them — Σ|x_i − mean|/(2·Σx), the third leg of the
    inequality family beside q_agg_gini's rank-based area and
    q_agg_theil's entropy form (Hoover answers "how much must move",
    Gini "how unequal are pairs", Theil "decomposable by group").

    Exactness: the cross-multiplied deviation |n·x_i − S| keeps every
    term an exact BIGINT (revenue is exact cents — no mean ever
    materializes as a float); the index is ONE final division by
    2nS.  Plan: one keyed aggregate, one 1-row total broadcast back,
    one scalar re-aggregate."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    tot = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = (
        u.crossJoin(F.broadcast(tot))
        .groupBy("n", "s")
        .agg(
            F.sum(F.abs(F.col("n") * F.col("x") - F.col("s")))
            .cast("long")
            .alias("num")
        )
    )
    return dev.select(
        F.col("n").alias("n_users"),
        F.col("s").alias("total_cents"),
        F.col("num").alias("hoover_num"),
        F.round(
            F.col("num").cast("double")
            / (F.lit(2.0) * F.col("n") * F.col("s")),
            6,
        ).alias("hoover"),
    )


@query(
    "q_agg_palma",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    rk AS (
        SELECT x, row_number() OVER (ORDER BY x, user_id) AS r
        FROM u
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s
        FROM u
    ),
    shares AS (
        SELECT n, s,
               CAST(coalesce(sum(CASE WHEN 10 * r > 9 * n THEN x END),
                             0) AS BIGINT) AS top10,
               CAST(coalesce(sum(CASE WHEN 10 * r <= 4 * n THEN x END),
                             0) AS BIGINT) AS bot40
        FROM rk CROSS JOIN tot
        GROUP BY n, s
    )
    SELECT n AS n_users, s AS total_cents, top10, bot40,
           CASE WHEN bot40 > 0
                THEN round(CAST(top10 AS DOUBLE) / bot40, 4) END
               AS palma
    FROM shares
    """,
)
def q_agg_palma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio of per-user purchase revenue: revenue share of the
    top 10% of users over the share of the bottom 40% — the
    inequality summary that ignores the stable middle 50% (Palma's
    observation) and so moves when Gini barely does.

    Exactness: the decile boundaries are exact integer
    cross-multiplications on the UNIQUE rank (10·r > 9·n for the top
    decile, 10·r ≤ 4·n for the bottom 40% — ties broken by user_id,
    so both engines slice identical user sets); the two region sums
    are exact cents and the ratio is ONE final division.  The global
    rank runs through the bucketed two-level scan on the Spark side —
    never a global window over the user keyspace."""
    from events_to_db_spark.plans.prefix import bucketed_running_sum

    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    rk = bucketed_running_sum(
        u,
        bucket=F.floor(F.col("x") / F.lit(100000)).cast("long"),
        order_cols=[F.col("x"), F.col("user_id")],
        sums={"r": F.lit(1)},
    )
    tot = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    shares = (
        rk.crossJoin(F.broadcast(tot))
        .groupBy("n", "s")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(10 * F.col("r") > 9 * F.col("n"), F.col("x"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("top10"),
            F.coalesce(
                F.sum(
                    F.when(10 * F.col("r") <= 4 * F.col("n"), F.col("x"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("bot40"),
        )
    )
    return shares.select(
        F.col("n").alias("n_users"),
        F.col("s").alias("total_cents"),
        "top10",
        "bot40",
        F.when(
            F.col("bot40") > 0,
            F.round(F.col("top10").cast("double") / F.col("bot40"), 4),
        ).alias("palma"),
    )


@query(
    "q_agg_atkinson",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(CAST(floor(1000000e0 * ln(CAST(x AS DOUBLE)))
                             AS BIGINT)) AS BIGINT) AS lsum6
        FROM u WHERE x > 0
    )
    SELECT n AS n_users, s AS total_cents, lsum6,
           round(1 - exp(CAST(lsum6 AS DOUBLE) / 1000000e0 / n)
                     / (CAST(s AS DOUBLE) / n), 4) AS atkinson_1
    FROM c
    """,
)
def q_agg_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index at epsilon = 1 for per-user purchase
    revenue: A = 1 − geometric_mean/arithmetic_mean — the welfare-
    theoretic member of the inequality family (its value IS the share
    of total income society could discard and be equally well off
    under log utility), completing Gini/Theil/Hoover/Palma.

    Determinism: each user's ln(x) is FLOORED at 10⁶ fixed-point into
    a BIGINT before summing (the q_ml_logloss trick — the floor
    absorbs sub-ulp libm drift and the integer sum is order-free);
    the geometric mean exp(L/10⁶/n) and the final ratio are one
    shared DOUBLE expression (exp-on-identical-argument parity per
    the q_ev_survival precedent).  The floor biases the geomean down
    by < 1e-6 relative — documented spec."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    c = u.where(F.col("x") > 0).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(
            F.floor(
                F.lit(1000000.0) * F.log(F.col("x").cast("double"))
            ).cast("long")
        )
        .cast("long")
        .alias("lsum6"),
    )
    return c.select(
        F.col("n").alias("n_users"),
        F.col("s").alias("total_cents"),
        "lsum6",
        F.round(
            F.lit(1)
            - F.exp(
                F.col("lsum6").cast("double") / 1000000.0 / F.col("n")
            )
            / (F.col("s").cast("double") / F.col("n")),
            4,
        ).alias("atkinson_1"),
    )
