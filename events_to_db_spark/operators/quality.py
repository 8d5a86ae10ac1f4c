"""Data-quality / copy-integrity operators.

An events-to-db copy is only trustworthy if the copied tables can be
audited: column profiles (the "what landed here" summary), referential
integrity between the copied tables, and uniqueness of the idempotency
key are the standard post-load checks a streaming-ETL pipeline runs
after every batch (the reference's effectively-once guarantee is
exactly "the event_id key stays unique in the target" — SURVEY §1.1).

Scale notes: every audit below is a single-pass aggregate or a
broadcast/shuffle anti-join on the key — no row-by-row validation, no
driver-side loops; the same plans run unchanged as a `foreachBatch`
post-commit hook on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.plans.prefix import bucketed_running_sum
from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@query(
    "q_profile_table",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_keys,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_custkey,
           count(DISTINCT o_orderstatus) AS card_status,
           count(DISTINCT o_orderpriority) AS card_priority,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price,
           round(avg(o_totalprice), 4) AS avg_price,
           CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS min_date,
           CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS max_date
    FROM orders
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of ``orders``: row/key counts, null
    tally, categorical cardinalities, numeric range/mean, date span —
    the landing-audit summary a copy pipeline logs per batch.  All
    metrics fold in a single HashAggregate (distincts expand to the
    usual two-phase plan); nothing touches the driver."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("null_custkey"),
        F.countDistinct("o_orderstatus").alias("card_status"),
        F.countDistinct("o_orderpriority").alias("card_priority"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.min(F.col("o_orderdate").cast("date")).cast("string").alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).cast("string").alias("max_date"),
    )


@query(
    "q_quality_constraints",
    oracle="""
    SELECT
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey))
            AS orphan_orders,
        (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey))
            AS orphan_lineitems,
        (SELECT count(*) FROM
            (SELECT o_orderkey FROM orders
             GROUP BY o_orderkey HAVING count(*) > 1))
            AS dup_orderkeys,
        (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
            AS nonpositive_prices
    """,
)
def q_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the copied schema: FK orphans
    (orders→customer, lineitem→orders via left-anti joins), duplicate
    primary keys (the idempotent-upsert invariant), and a domain check
    on prices.  Anti-joins broadcast the key side when small and
    degrade to shuffled joins at scale; each audit is independent so
    Spark runs the four sub-plans in parallel stages."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    orphan_orders = o.join(
        c, o.o_custkey == c.c_custkey, "left_anti"
    ).agg(F.count("*").alias("orphan_orders"))
    orphan_lineitems = li.join(
        o, li.l_orderkey == o.o_orderkey, "left_anti"
    ).agg(F.count("*").alias("orphan_lineitems"))
    dup_keys = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count("*").alias("dup_orderkeys"))
    )
    bad_price = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count("*").alias("nonpositive_prices")
    )
    return (
        orphan_orders.crossJoin(orphan_lineitems)
        .crossJoin(dup_keys)
        .crossJoin(bad_price)
    )


@query(
    "q_quality_drift",
    oracle="""
    WITH binned AS (
        SELECT event_type,
               least(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 1 ELSE 0 END AS in_a
        FROM events
    ),
    counts AS (
        SELECT event_type, bin,
               sum(in_a) AS ca, sum(1 - in_a) AS cb
        FROM binned GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, sum(ca) AS na, sum(cb) AS nb
        FROM counts GROUP BY 1
    ),
    grid AS (
        SELECT t.event_type, g.bin, t.na, t.nb
        FROM tot t
        CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) g
    ),
    dense AS (
        SELECT g.event_type, g.na, g.nb,
               coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
        FROM grid g
        LEFT JOIN counts c
            ON c.event_type = g.event_type AND c.bin = g.bin
    )
    SELECT event_type,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           round(sum(((ca + 1.0) / (na + 10) - (cb + 1.0) / (nb + 10))
                     * ln(((ca + 1.0) / (na + 10))
                          / ((cb + 1.0) / (nb + 10)))), 4) AS psi
    FROM dense GROUP BY event_type
    """,
)
def q_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit (Population Stability Index): compare
    the per-type histogram of ``value`` in the first half of the log
    against the second half over a fixed 10-bin grid, with Laplace
    smoothing so empty bins stay defined.  PSI > 0.2 is the classic
    "retrain / investigate" alarm; an event→DB copier runs this
    week-over-week to catch upstream schema or behavior changes that
    no row-level constraint catches.

    Determinism: all probabilities are ratios of integer counts
    (identical in both engines), ``ln`` applied to identical doubles;
    only the final PSI is rounded.  Plan: one scan → conditional
    count aggregate → dense (type × 10-bin) grid via broadcast
    cross join → one more aggregate.  Nothing grows with row count
    except the first hash-aggregate."""
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9)).alias(
            "bin"
        ),
        F.when(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("in_a"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("in_a").alias("ca"),
        F.sum(1 - F.col("in_a")).alias("cb"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    grid = tot.crossJoin(
        F.broadcast(
            spark.range(10).select(F.col("id").alias("bin"))
        )
    )
    dense = grid.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "na",
        "nb",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    pa = (F.col("ca") + 1.0) / (F.col("na") + 10)
    pb = (F.col("cb") + 1.0) / (F.col("nb") + 10)
    return dense.groupBy("event_type").agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.round(F.sum((pa - pb) * F.log(pa / pb)), 4).alias("psi"),
    )


@query(
    "q_quality_schema_drift",
    oracle="""
    WITH h AS (
        SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'a' ELSE 'b' END AS half,
               user_id, event_type, value, props
        FROM events
    ),
    prof AS (
        SELECT half,
               count(*) AS n_rows,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT event_type) AS n_types,
               round(avg(value), 4) AS avg_value,
               round(avg(CAST(length(props) AS DOUBLE)), 4) AS avg_props_len
        FROM h GROUP BY half
    )
    SELECT m.metric,
           max(CASE WHEN half = 'a' THEN m.v END) AS first_half,
           max(CASE WHEN half = 'b' THEN m.v END) AS second_half
    FROM (
        SELECT half, 'n_rows' AS metric, CAST(n_rows AS DOUBLE) AS v
            FROM prof
        UNION ALL
        SELECT half, 'n_users', CAST(n_users AS DOUBLE) FROM prof
        UNION ALL
        SELECT half, 'n_types', CAST(n_types AS DOUBLE) FROM prof
        UNION ALL
        SELECT half, 'avg_value', avg_value FROM prof
        UNION ALL
        SELECT half, 'avg_props_len', avg_props_len FROM prof
    ) m
    GROUP BY m.metric
    """,
)
def q_quality_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-diff audit: the one-pass column profile
    (q_profile_table's statistics) computed per half of the log and
    pivoted into metric rows — catches volume shifts, cardinality
    collapse, and payload-shape changes that value-histogram drift
    (q_quality_drift) does not see.  Two aggregate passes over one
    scan, a 10-row pivot; the metric long-format keeps the output
    schema stable as metrics are added."""
    ev = load_table(spark, sf_dir, "events")
    half = F.when(
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "a"
    ).otherwise("b")
    prof = ev.groupBy(half.alias("half")).agg(
        F.count("*").cast("double").alias("n_rows"),
        F.countDistinct("user_id").cast("double").alias("n_users"),
        F.countDistinct("event_type").cast("double").alias("n_types"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.avg(F.length("props").cast("double")), 4).alias(
            "avg_props_len"
        ),
    )
    metrics = ["n_rows", "n_users", "n_types", "avg_value", "avg_props_len"]
    long = prof.unpivot(
        ["half"], metrics, "metric", "v"
    )
    return long.groupBy("metric").agg(
        F.max(F.when(F.col("half") == "a", F.col("v"))).alias("first_half"),
        F.max(F.when(F.col("half") == "b", F.col("v"))).alias("second_half"),
    )


@query(
    "q_anon_k",
    oracle="""
    WITH qi AS (
        SELECT c_mktsegment,
               c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
        FROM customer
    ),
    classes AS (
        SELECT c_mktsegment, c_nationkey, bal_bucket, count(*) AS sz
        FROM qi GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(sz) AS BIGINT) AS min_class_size,
           CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_classes_below_k,
           CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
               AS n_records_at_risk
    FROM classes
    GROUP BY c_mktsegment
    """,
)
def q_anon_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the customer table: group records
    into equivalence classes on the quasi-identifier triple (market
    segment, nation, account-balance bucket) and report, per segment,
    how many classes fall below k and how many records they expose —
    the re-identification-risk check a privacy review runs before a
    dataset release (complement of q_gdpr_purge's erasure path).

    The balance bucket uses float ``floor(x/1000)`` identically in
    both engines (integer ``div`` truncates toward zero and would
    disagree on negative balances).  Pure two-level hash aggregation —
    scales as a pair of keyed shuffles, no windows.
    """
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    )
    classes = qi.groupBy("c_mktsegment", "c_nationkey", "bal_bucket").agg(
        F.count("*").alias("sz")
    )
    below = F.col("sz") < 5
    return classes.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_classes"),
        F.min("sz").cast("long").alias("min_class_size"),
        F.sum(below.cast("long")).alias("n_classes_below_k"),
        F.sum(F.when(below, F.col("sz")).otherwise(0)).alias(
            "n_records_at_risk"
        ),
    )


@query(
    "q_quality_benford",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT d, count(*) AS n_obs FROM digits GROUP BY d),
    tot AS (SELECT count(*) AS n FROM digits)
    SELECT obs.d AS leading_digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           round(ln(1 + 1e0 / obs.d) / ln(10e0), 4) AS benford_share,
           round(CAST(n_obs AS DOUBLE) / tot.n, 4) AS obs_share,
           CAST((n_obs * 10000) // tot.n
                - CAST(floor(10000 * ln(1 + 1e0 / obs.d) / ln(10e0))
                       AS BIGINT)
                AS BIGINT) AS excess_bp
    FROM obs CROSS JOIN tot
    """,
)
def q_quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: the observed leading-digit
    distribution against the log₁₀(1+1/d) expectation — the classic
    fabricated-data / unit-mixup screen a data-quality pass runs over
    any monetary column after a copy.  (TPC-H prices are synthetic-
    uniform, so they *fail* Benford — which is exactly what the excess
    column shows; the point of the audit is the deviation profile,
    not a pass flag.)

    Determinism: the leading digit goes through an exact integer/
    string path (floor → BIGINT → first character), shares are exact
    integer basis points or single identical float ops; one hash
    aggregate over 9 keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").alias("n_obs"))
    tot = digits.agg(F.count("*").alias("n"))
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("leading_digit"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(F.expr("ln(1 + 1e0 / d) / ln(10e0)"), 4).alias(
            "benford_share"
        ),
        F.round(F.col("n_obs").cast("double") / F.col("n"), 4).alias(
            "obs_share"
        ),
        F.expr(
            "cast((n_obs * 10000) div n"
            " - cast(floor(10000 * ln(1 + 1e0 / d) / ln(10e0)) as bigint)"
            " as bigint)"
        ).alias("excess_bp"),
    )


@query(
    "q_quality_freshness",
    oracle="""
    WITH per_type AS (
        SELECT event_type,
               max(epoch_us(ts)) AS mx_us,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    anchor AS (SELECT max(mx_us) AS global_us FROM per_type)
    SELECT event_type,
           strftime(make_timestamp(mx_us), '%Y-%m-%d %H:%M:%S') AS last_seen,
           CAST((global_us - mx_us) // 60000000 AS BIGINT) AS stale_min,
           n
    FROM per_type CROSS JOIN anchor
    ORDER BY event_type
    """,
)
def q_quality_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit: how stale is each event type's
    newest event relative to the newest event anywhere (the pipeline
    lag dashboard behind every "is the copy current" page).

    Anchoring on the global max — not wall-clock now() — keeps the
    query deterministic and engine-comparable; staleness is an exact
    integer-µs difference floored to minutes (integer division, per
    the µs-gap discipline).  One 5-row aggregate + 1-row broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    us = (F.unix_timestamp("ts") * 1_000_000 + F.date_format("ts", "SSSSSS").cast(
        "bigint"
    ))
    per_type = ev.groupBy("event_type").agg(
        F.max(us).alias("mx_us"), F.count("*").cast("bigint").alias("n")
    )
    anchor = per_type.agg(F.max("mx_us").alias("global_us"))
    return (
        per_type.crossJoin(F.broadcast(anchor))
        .select(
            "event_type",
            F.date_format(
                F.timestamp_micros(F.col("mx_us")), "yyyy-MM-dd HH:mm:ss"
            ).alias("last_seen"),
            F.expr("(global_us - mx_us) div 60000000").alias("stale_min"),
            "n",
        )
        .orderBy("event_type")
    )


@query(
    "q_anon_ldiv",
    oracle="""
    WITH classes AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
               count(*) AS sz,
               count(DISTINCT c_mktsegment) AS l
        FROM customer
        GROUP BY 1, 2
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_classes_below_l,
           CAST(sum(CASE WHEN l < 2 THEN sz ELSE 0 END) AS BIGINT)
               AS n_records_at_risk
    FROM classes
    GROUP BY c_nationkey
    """,
)
def q_anon_ldiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=2) — the attribute-disclosure complement of
    ``q_anon_k``: within each quasi-identifier equivalence class
    (nation, account-balance bucket), count the distinct values of the
    sensitive attribute (market segment).  A class with l = 1 leaks the
    sensitive value of every member even when it is k-anonymous, which
    is exactly the failure k-anonymity alone cannot see; the audit
    reports, per nation, how many classes and records sit below l.

    Same execution shape as q_anon_k — two keyed hash aggregations
    (the distinct count expands once per class, bounded by |segments| =
    5) — so it scales as a pair of shuffles with no windows.
    """
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    ).agg(
        F.count("*").alias("sz"),
        F.countDistinct("c_mktsegment").alias("l"),
    )
    below = F.col("l") < 2
    return classes.groupBy("c_nationkey").agg(
        F.count("*").alias("n_classes"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(below.cast("long")).alias("n_classes_below_l"),
        F.sum(F.when(below, F.col("sz")).otherwise(0)).alias(
            "n_records_at_risk"
        ),
    )


@query(
    "q_ord_reconcile",
    oracle="""
    WITH l AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) * 100) AS BIGINT))
                    AS BIGINT) AS line_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1
    ),
    j AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
               l.line_cents, l.n_lines
        FROM orders o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
    )
    SELECT CASE WHEN line_cents IS NULL THEN 'no_lines'
                WHEN abs(header_cents - line_cents) <= 1 THEN 'reconciled'
                ELSE 'mismatch' END AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(n_lines), 0) AS BIGINT) AS n_lines,
           CAST(coalesce(sum(abs(header_cents - coalesce(line_cents, 0))), 0)
                AS BIGINT) AS total_abs_diff_cents,
           CAST(coalesce(max(abs(header_cents - line_cents)), 0) AS BIGINT)
               AS max_abs_diff_cents
    FROM j
    GROUP BY 1
    """,
)
def q_ord_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation audit: does each order's header
    total equal the sum of its line extensions (price·(1−disc)·(1+tax))?
    The double-entry control every finance pipeline runs after load.

    Line extensions are rounded to cents *per line* with the identical
    double expression in both engines, then summed as exact BIGINTs —
    so the discrepancy buckets (reconciled within 1¢ / mismatch /
    orders with no lines at all) and their exact aggregate drift
    hash-match.  On this synthetic corpus the header is independent of
    the lines, so everything lands in mismatch/no_lines — the audit
    *finding* is the point.  Plan: one keyed line aggregate + one
    orderkey join, both on the same key, AQE-coalesced.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    l = li.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                "cast(round(l_extendedprice * (1 - l_discount)"
                " * (1 + l_tax) * 100) as bigint)"
            )
        ).alias("line_cents"),
        F.count("*").alias("n_lines"),
    )
    j = orders.join(
        l, F.col("l_orderkey") == F.col("o_orderkey"), "left"
    ).select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
            "header_cents"
        ),
        "line_cents",
        "n_lines",
    )
    diff = F.abs(F.col("header_cents") - F.col("line_cents"))
    return (
        j.withColumn(
            "status",
            F.when(F.col("line_cents").isNull(), "no_lines")
            .when(diff <= 1, "reconciled")
            .otherwise("mismatch"),
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n_orders"),
            F.coalesce(F.sum("n_lines"), F.lit(0))
            .cast("long")
            .alias("n_lines"),
            F.coalesce(
                F.sum(
                    F.abs(
                        F.col("header_cents")
                        - F.coalesce(F.col("line_cents"), F.lit(0))
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("total_abs_diff_cents"),
            F.coalesce(F.max(diff), F.lit(0))
            .cast("long")
            .alias("max_abs_diff_cents"),
        )
    )


@query(
    "q_quality_fd",
    oracle="""
    WITH fd1 AS (
        SELECT 'customer.c_nationkey->c_mktsegment' AS fd,
               CAST(count(*) AS BIGINT) AS n_lhs,
               CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(max(k) AS BIGINT) AS max_rhs
        FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS k
              FROM customer GROUP BY 1)
    ),
    fd2 AS (
        SELECT 'nation.n_nationkey->n_regionkey' AS fd,
               CAST(count(*) AS BIGINT) AS n_lhs,
               CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(max(k) AS BIGINT) AS max_rhs
        FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS k
              FROM nation GROUP BY 1)
    ),
    fd3 AS (
        SELECT 'orders.o_custkey->o_orderpriority' AS fd,
               CAST(count(*) AS BIGINT) AS n_lhs,
               CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(max(k) AS BIGINT) AS max_rhs
        FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS k
              FROM orders GROUP BY 1)
    ),
    fd4 AS (
        SELECT 'events.user_id->event_type' AS fd,
               CAST(count(*) AS BIGINT) AS n_lhs,
               CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(max(k) AS BIGINT) AS max_rhs
        FROM (SELECT user_id, count(DISTINCT event_type) AS k
              FROM events GROUP BY 1)
    )
    SELECT fd, n_lhs, n_violating, max_rhs,
           round(CAST(n_violating AS DOUBLE) / n_lhs, 6) AS violation_rate
    FROM (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
          UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4)
    """,
)
def q_quality_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling: for four candidate FDs across
    the schema, how many left-hand-side groups map to more than one
    right-hand-side value — the discovery pass schema-inference and
    data-contract tools run (n_nationkey→n_regionkey genuinely holds;
    the rest are expected findings).

    Each FD check is one keyed count-distinct aggregate followed by a
    tiny summary aggregate; the four run as a union of independent
    subplans (Spark schedules them concurrently), and nothing larger
    than four summary rows ever leaves the executors.
    """
    checks = [
        ("customer", "c_nationkey", "c_mktsegment"),
        ("nation", "n_nationkey", "n_regionkey"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("events", "user_id", "event_type"),
    ]
    out = None
    for table, lhs, rhs in checks:
        t = load_table(spark, sf_dir, table)
        g = t.groupBy(lhs).agg(F.countDistinct(rhs).alias("k"))
        s = g.agg(
            F.lit(f"{table}.{lhs}->{rhs}").alias("fd"),
            F.count("*").alias("n_lhs"),
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.max("k").cast("long").alias("max_rhs"),
        )
        out = s if out is None else out.unionByName(s)
    return out.select(
        "fd",
        "n_lhs",
        "n_violating",
        "max_rhs",
        F.round(
            F.col("n_violating").cast("double") / F.col("n_lhs"), 6
        ).alias("violation_rate"),
    )


@query(
    "q_ord_dupe_invoice",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(o_orderdate AS DATE) AS d
        FROM orders
    ),
    pairs AS (
        SELECT a.o_custkey, a.cents,
               date_diff('day', a.d, b.d) AS gap_days
        FROM o a JOIN o b
          ON a.o_custkey = b.o_custkey
         AND a.cents = b.cents
         AND b.o_orderkey > a.o_orderkey
         AND b.d >= a.d - INTERVAL 7 DAY
         AND b.d <= a.d + INTERVAL 7 DAY
    )
    SELECT CAST(count(*) AS BIGINT) AS n_suspect_pairs,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(coalesce(sum(cents), 0) AS BIGINT) AS exposure_cents,
           CAST(coalesce(min(abs(gap_days)), 0) AS BIGINT) AS min_gap_days,
           CAST(coalesce(max(abs(gap_days)), 0) AS BIGINT) AS max_gap_days
    FROM pairs
    """,
)
def q_ord_dupe_invoice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-invoice audit: pairs of orders from the same customer
    for the IDENTICAL cent amount within ±7 days — the classic
    accounts-payable double-billing detector.

    The self-join is equi-keyed on (customer, exact cents) — the date
    band is a residual predicate — so the pair search shuffles once on
    a compound key whose groups are tiny (duplicate exact amounts per
    customer), never a quadratic blow-up; `b.key > a.key` counts each
    pair once.  Day gaps are whole-day DATE arithmetic, identical in
    both engines.  Output is the exposure summary an auditor pulls
    first.
    """
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a = o.alias("a")
    b = o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.cents") == F.col("b.cents"))
        & (F.col("b.o_orderkey") > F.col("a.o_orderkey"))
        & (F.col("b.d") >= F.date_sub(F.col("a.d"), 7))
        & (F.col("b.d") <= F.date_add(F.col("a.d"), 7)),
    ).select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.col("a.cents").alias("cents"),
        F.datediff(F.col("b.d"), F.col("a.d")).alias("gap_days"),
    )
    return pairs.agg(
        F.count("*").alias("n_suspect_pairs"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias(
            "exposure_cents"
        ),
        F.coalesce(F.min(F.abs(F.col("gap_days"))), F.lit(0))
        .cast("long")
        .alias("min_gap_days"),
        F.coalesce(F.max(F.abs(F.col("gap_days"))), F.lit(0))
        .cast("long")
        .alias("max_gap_days"),
    )


@query(
    "q_ev_doublefire",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS vc,
               epoch_us(ts) AS us
        FROM events
    ),
    pairs AS (
        SELECT a.event_type, b.us - a.us AS gap_us
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND a.event_type = b.event_type
         AND a.vc = b.vc
         AND b.event_id > a.event_id
         AND b.us >= a.us AND b.us - a.us <= 5000000
    ),
    agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_suspect_pairs,
               CAST(min(gap_us) AS BIGINT) AS min_gap_us,
               CAST(max(gap_us) AS BIGINT) AS max_gap_us
        FROM pairs GROUP BY event_type
    )
    SELECT t.event_type,
           CAST(coalesce(a.n_suspect_pairs, 0) AS BIGINT)
               AS n_suspect_pairs,
           CAST(coalesce(a.min_gap_us, 0) AS BIGINT) AS min_gap_us,
           CAST(coalesce(a.max_gap_us, 0) AS BIGINT) AS max_gap_us
    FROM (SELECT DISTINCT event_type FROM events) t
    LEFT JOIN agg a USING (event_type)
    """,
)
def q_ev_doublefire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry double-fire audit: same user, same type, same exact
    amount, within 5 seconds but with DIFFERENT event ids — the
    client-retry duplicates that exact dedup (q_ev_dedup keys on
    identical timestamps) deliberately does not catch.

    Equi-join on (user, type, cents) with the 5 s µs band residual —
    exact integer µs, asymmetric b>a pairing.  Same bounded-group
    shuffle shape as q_ord_dupe_invoice; the findings left-join back
    onto the type dimension so a clean corpus reports explicit zero
    rows per type (an audit that can't be told from "didn't run" is
    no audit).
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        F.expr("unix_micros(ts)").alias("us"),
    )
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.vc") == F.col("b.vc"))
        & (F.col("b.event_id") > F.col("a.event_id"))
        & (F.col("b.us") >= F.col("a.us"))
        & (F.col("b.us") - F.col("a.us") <= 5_000_000),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.us") - F.col("a.us")).alias("gap_us"),
    )
    agg = pairs.groupBy("event_type").agg(
        F.count("*").alias("n_suspect_pairs"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )
    types = ev.select("event_type").distinct()
    return types.join(F.broadcast(agg), "event_type", "left").select(
        "event_type",
        F.coalesce(F.col("n_suspect_pairs"), F.lit(0))
        .cast("long")
        .alias("n_suspect_pairs"),
        F.coalesce(F.col("min_gap_us"), F.lit(0))
        .cast("long")
        .alias("min_gap_us"),
        F.coalesce(F.col("max_gap_us"), F.lit(0))
        .cast("long")
        .alias("max_gap_us"),
    )


@query(
    "q_quality_expectations",
    oracle="""
    SELECT 'custkey_not_null' AS rule_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
               AS violations,
           count(CASE WHEN o_custkey IS NULL THEN 1 END) = 0 AS ok
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST(count(*) AS BIGINT),
           CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT),
           count(o_orderkey) - count(DISTINCT o_orderkey) = 0
    FROM orders
    UNION ALL
    SELECT 'price_range',
           CAST(count(*) AS BIGINT),
           CAST(count(CASE WHEN o_totalprice < 0
                             OR o_totalprice > 400000 THEN 1 END) AS BIGINT),
           count(CASE WHEN o_totalprice < 0
                        OR o_totalprice > 400000 THEN 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'priority_known',
           CAST(count(*) AS BIGINT),
           CAST(count(CASE WHEN o_orderpriority NOT IN
                               ('1-URGENT', '2-HIGH', '3-MEDIUM', '5-LOW')
                             OR o_orderpriority IS NULL THEN 1 END)
                AS BIGINT),
           count(CASE WHEN o_orderpriority NOT IN
                          ('1-URGENT', '2-HIGH', '3-MEDIUM', '5-LOW')
                        OR o_orderpriority IS NULL THEN 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'price_positive',
           CAST(count(*) AS BIGINT),
           CAST(count(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
                           THEN 1 END) AS BIGINT),
           count(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
                 THEN 1 END) = 0
    FROM orders
    """,
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations suite (expectations.py): five rules —
    not-null, primary-key uniqueness, a numeric range with a
    DELIBERATELY tight ceiling (400k < the true max, so the suite
    reports real violations, proving the counter counts), a value-set
    membership missing '4-NOT SPECIFIED' (same reason), and a custom
    SQL predicate — compiled into ONE aggregation pass over orders and
    unpivoted to per-rule rows.  A 100-rule suite at 100 TB still
    costs one scan: every rule is a conditional count inside the same
    hash aggregate (the unique rule adds a distinct count, which Spark
    plans into the same aggregate via expand)."""
    from events_to_db_spark.expectations import run_expectations

    o = load_table(spark, sf_dir, "orders")
    rules = [
        {"id": "custkey_not_null", "type": "not_null", "col": "o_custkey"},
        {"id": "orderkey_unique", "type": "unique", "col": "o_orderkey"},
        {
            "id": "price_range",
            "type": "range",
            "col": "o_totalprice",
            "lo": 0,
            "hi": 400000,
        },
        {
            "id": "priority_known",
            "type": "in_set",
            "col": "o_orderpriority",
            "values": ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"],
        },
        {
            "id": "price_positive",
            "type": "custom",
            "expr": "o_totalprice > 0",
        },
    ]
    return run_expectations(o, rules)


#: Laplace inverse-CDF pieces for the ε-DP release demo, shared
#: verbatim: u = (h + 1/2)/10⁶ from the cell's md5 (deterministic —
#: see the docstring caveat), noise = −b·sign(u−½)·ln(1−2|u−½|) with
#: b = 1/ε = 2, carried at 10⁻⁶ fixed point via the floor-ln trick.
_DP_U_NUM = "(2 * h + 1 - 1000000)"  # 2·10⁶·(u − ½), exact int
_DP_LN_FP = (
    "CAST(floor(1000000 * ln(CAST(1000000 - abs(2 * h + 1 - 1000000)"
    " AS DOUBLE) / 1000000)) AS BIGINT)"
)


@query(
    "q_anon_dp",
    oracle=f"""
    WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
        FROM events GROUP BY event_type
    ),
    h AS (
        SELECT event_type, n_true,
               (('0x' || substr(md5(event_type), 1, 15))::BIGINT
                % 1000000) AS h
        FROM c
    ),
    nz AS (
        SELECT event_type, n_true, h,
               {_DP_LN_FP} AS ln_fp,
               CASE WHEN {_DP_U_NUM} >= 0 THEN 1 ELSE -1 END AS sgn
        FROM h
    )
    SELECT event_type, n_true,
           CAST(sgn * (-2) * ln_fp AS BIGINT) AS noise_fp,
           CAST(n_true + sgn * (((-2) * ln_fp) // 1000000) AS BIGINT)
               AS released_count
    FROM nz ORDER BY event_type
    """,
)
def q_anon_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism release surface for per-type counts at
    ε = 0.5 (sensitivity 1, scale b = 1/ε = 2): the inverse-CDF
    transform noise = −b·sign(u−½)·ln(1−2|u−½|) applied per released
    cell — the standard ε-DP counting-query mechanism (Dwork et al.
    2006) as a PIPELINE (hash-agg → per-cell noise → floored release).

    **Caveat, stated loudly: the u here is the cell's md5 hash, i.e.
    DETERMINISTIC — this exercises and differentially TESTS the
    mechanism's plumbing (inverse CDF, fixed-point ln, floor release)
    but is NOT differential privacy; a production release must draw u
    from a cryptographic RNG per release.**  The engine keeps the
    transform exact so swapping the u source is the ONLY production
    change.

    Determinism: u = (h+½)/10⁶ makes 1−2|u−½| the exact rational
    (10⁶−|2h+1−10⁶|)/10⁶ (never 0 — h+½ is never an integer), its ln
    is the floor(10⁶·ln) fixed-point BIGINT, and the released count is
    a floor division of exact integers.

    Scale shape: one hash agg to the released-cell grain; noise is a
    per-cell scalar expression — the mechanism costs nothing extra at
    100 TB."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_true")
    )
    h = c.select(
        "event_type",
        "n_true",
        F.expr(
            "pmod(cast(conv(substr(md5(cast(event_type as binary)), 1, 15),"
            " 16, 10) as bigint), 1000000)"
        ).alias("h"),
    )
    nz = h.select(
        "event_type",
        "n_true",
        F.expr(_DP_LN_FP).alias("ln_fp"),
        F.when(F.expr(_DP_U_NUM) >= 0, 1).otherwise(-1).alias("sgn"),
    )
    # sign-safe integer scaling (CLAUDE.md rule): (−2)·ln_fp ≥ 0
    # always (ln_fp ≤ −1 — the u rational is strictly < 1), so the
    # floor/truncate divide runs on a NON-NEGATIVE operand in both
    # engines and `div` ≡ `//` exactly; the sign multiplies after.
    noise = F.col("sgn") * F.lit(-2) * F.col("ln_fp")
    return nz.select(
        "event_type",
        "n_true",
        noise.cast("long").alias("noise_fp"),
        (F.col("n_true") + F.expr("sgn * (((-2) * ln_fp) div 1000000)"))
        .cast("long")
        .alias("released_count"),
    ).orderBy("event_type")


@query(
    "q_quality_mad",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE event_type = 'purchase'
    ),
    pv AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY vc
    ),
    cum AS (SELECT vc, sum(c) OVER (ORDER BY vc) AS cumc FROM pv),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pv),
    med AS (
        SELECT min(vc) AS m FROM cum CROSS JOIN tot
        WHERE 2 * cumc >= n
    ),
    dv AS (
        SELECT abs(vc - m.m) AS d, c FROM pv CROSS JOIN med m
    ),
    dpv AS (SELECT d, CAST(sum(c) AS BIGINT) AS c FROM dv GROUP BY d),
    dcum AS (SELECT d, sum(c) OVER (ORDER BY d) AS cumc FROM dpv),
    mad AS (
        SELECT min(d) AS mad FROM dcum CROSS JOIN tot
        WHERE 2 * cumc >= n
    ),
    flags AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN 10000 * abs(vc - med.m)
                                  > 3 * 14826 * mad.mad
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM s CROSS JOIN med CROSS JOIN mad
    )
    SELECT n_rows, med.m AS median_cents, mad.mad AS mad_cents,
           n_outliers,
           round(CAST(n_outliers AS DOUBLE) / n_rows, 6) AS outlier_rate
    FROM flags CROSS JOIN med CROSS JOIN mad
    """,
)
def q_quality_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier rate of purchase values via the MAD rule:
    |x − median| > 3·1.4826·MAD — the 50%-breakdown-point anomaly
    gate a data-quality monitor runs where a z-score rule (mean/σ)
    is itself dragged by the outliers it hunts.

    Exactness: BOTH order statistics (the median and the median of
    absolute deviations) are exact lower medians off the value-grain
    prefix scan (the q_stat_mood machinery, 2·cum ≥ n pick); the
    consistency constant 1.4826 enters as the exact rational
    14826/10000, so every outlier flag is the integer
    cross-multiplication 10⁴·|x−med| > 3·14826·MAD — no float ever
    decides a row.  One final division for the rate.

    Scale: two value-grain prefix scans (distinct-value space, not
    row space) + one conditional aggregate over the fact scan."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "purchase").select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc")
    )
    pv = s.groupBy("vc").agg(F.count("*").cast("long").alias("c"))
    # COARSE bucket for the prefix scan (r11 opt): value-grain
    # buckets made the carry theta-join |distinct values|^2 (a ~1e9-
    # comparison BNLJ measured seconds at sf0.1, quadratic at scale);
    # floor(vc/2500) ascends with vc (floor, not div: order-aligned
    # for negatives too), so the scan is unchanged semantically.
    cum = bucketed_running_sum(
        pv,
        F.floor(F.col("vc") / F.lit(2500)).cast("long"),
        [F.col("vc")],
        {"cumc": F.col("c")},
    )
    tot = pv.agg(F.sum("c").cast("long").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .where(2 * F.col("cumc") >= F.col("n"))
        .agg(F.min("vc").alias("m"))
    )
    dpv = (
        pv.crossJoin(F.broadcast(med))
        .select(F.abs(F.col("vc") - F.col("m")).alias("d"), "c")
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    dcum = bucketed_running_sum(
        dpv,
        F.floor(F.col("d") / F.lit(2500)).cast("long"),
        [F.col("d")],
        {"cumc": F.col("c")},
    )
    mad = (
        dcum.crossJoin(F.broadcast(tot))
        .where(2 * F.col("cumc") >= F.col("n"))
        .agg(F.min("d").alias("mad"))
    )
    flags = (
        s.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(
                F.when(
                    10000 * F.abs(F.col("vc") - F.col("m"))
                    > 3 * 14826 * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.first("m").alias("median_cents"),
            F.first("mad").alias("mad_cents"),
        )
    )
    return flags.select(
        "n_rows",
        "median_cents",
        "mad_cents",
        "n_outliers",
        F.round(
            F.col("n_outliers").cast("double") / F.col("n_rows"), 6
        ).alias("outlier_rate"),
    )


@query(
    "q_quality_heaping",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) % 10 AS d
        FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
        SELECT d, CAST(count(*) AS BIGINT) AS o FROM s GROUP BY d
    ),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    dev AS (
        SELECT n,
               CAST(sum((10 * o - n) * (10 * o - n)) AS BIGINT) AS ssq,
               CAST(max(o * 16 + (15 - d)) AS BIGINT) AS packed
        FROM cells CROSS JOIN tot
        GROUP BY n
    )
    SELECT n AS n_rows, ssq AS chi2_num,
           round(CAST(ssq AS DOUBLE) / (10e0 * n), 4) AS chi2,
           CAST(100000 * ssq >= 16918977 * n AS BOOLEAN) AS reject_05,
           CAST(15 - packed % 16 AS BIGINT) AS top_digit,
           round(CAST(packed // 16 AS DOUBLE) / n, 4) AS top_share
    FROM dev
    """,
)
def q_quality_heaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal-digit heaping audit of purchase amounts: χ² of the
    last cent digit against Uniform{0..9} — the data-forensics test
    for price points, hand-entry rounding, and synthetic-data tells
    (real prices heap on .99/.00; honestly random cents don't), the
    digit-level companion to q_quality_benford's leading-digit law.

    Determinism: with expected count n/10, the χ² clears to
    Σ(10·o_d − n)²/(10n) — numerator an exact BIGINT; the 5% decision
    is the integer cross-multiplication 10⁵·Σ ≥ χ²crit(9)·10⁶·n/10 =
    16918977·n; the modal digit + its share come from ONE packed max
    (o·16 + reversed digit — smallest digit wins ties, no struct
    SortAggregate).

    Scale: one scan, one 10-cell aggregate, one 1-row fold."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "purchase").select(
        (F.expr("CAST(round(value * 100) AS BIGINT)") % 10).alias("d")
    )
    cells = s.groupBy("d").agg(F.count("*").cast("long").alias("o"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    dev = (
        cells.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.sum(
                (10 * F.col("o") - F.col("n"))
                * (10 * F.col("o") - F.col("n"))
            )
            .cast("long")
            .alias("ssq"),
            F.max(F.col("o") * 16 + (15 - F.col("d")))
            .cast("long")
            .alias("packed"),
        )
    )
    return dev.select(
        F.col("n").alias("n_rows"),
        F.col("ssq").alias("chi2_num"),
        F.round(
            F.col("ssq").cast("double") / (F.lit(10.0) * F.col("n")), 4
        ).alias("chi2"),
        (
            F.lit(100000).cast("long") * F.col("ssq")
            >= F.lit(16918977).cast("long") * F.col("n")
        ).alias("reject_05"),
        (15 - F.col("packed") % 16).cast("long").alias("top_digit"),
        F.round(
            F.floor(F.col("packed") / 16).cast("double") / F.col("n"),
            4,
        ).alias("top_share"),
    )


@query(
    "q_quality_huber",
    oracle="""
    WITH s AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE event_type = 'purchase'
    ),
    pv AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY vc
    ),
    cum AS (SELECT vc, sum(c) OVER (ORDER BY vc) AS cumc FROM pv),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pv),
    med AS (
        SELECT min(vc) AS m FROM cum CROSS JOIN tot
        WHERE 2 * cumc >= n
    ),
    dv AS (
        SELECT abs(vc - m.m) AS d, c FROM pv CROSS JOIN med m
    ),
    dpv AS (SELECT d, CAST(sum(c) AS BIGINT) AS c FROM dv GROUP BY d),
    dcum AS (SELECT d, sum(c) OVER (ORDER BY d) AS cumc FROM dpv),
    mad AS (
        SELECT min(d) AS mad FROM dcum CROSS JOIN tot
        WHERE 2 * cumc >= n
    ),
    fold AS (
        SELECT n,
               CAST(sum(CASE WHEN 10000000 * abs(vc - med.m)
                                  <= 1345 * 14826 * mad.mad
                             THEN 10000000 * vc
                             WHEN vc > med.m
                             THEN 10000000 * med.m
                                  + 1345 * 14826 * mad.mad
                             ELSE 10000000 * med.m
                                  - 1345 * 14826 * mad.mad
                        END) AS BIGINT) AS s7,
               CAST(sum(CASE WHEN 10000000 * abs(vc - med.m)
                                  > 1345 * 14826 * mad.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        FROM s CROSS JOIN med CROSS JOIN mad CROSS JOIN tot
        GROUP BY n
    )
    SELECT n AS n_rows, med.m AS median_cents, mad.mad AS mad_cents,
           n_clipped,
           round(CAST(s7 AS DOUBLE) / (10000000e0 * n) / 100, 4)
               AS huber_mean,
           round(CAST(s7 AS DOUBLE) / (10000000e0 * n)
                 - CAST(med.m AS DOUBLE), 4) AS shift_cents
    FROM fold CROSS JOIN med CROSS JOIN mad
    """,
)
def q_quality_huber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step Huber M-estimate of the purchase mean: start at the
    exact median, clip every value to median ± 1.345·(1.4826·MAD),
    and average the clipped values — the robust location estimate
    between the median (throws away magnitude) and the mean (owned by
    outliers); the clipped count is the contamination readout beside
    q_quality_mad's flag rate.

    Determinism: the clip bound is the exact rational
    1345·14826·MAD/10⁷, so every clip decision is the integer
    cross-multiplication 10⁷·|x−med| ≤ 1345·14826·MAD and the clipped
    SUM stays an exact BIGINT at 10⁷ fixed-point (inliers contribute
    10⁷·x, outliers the exact rational bound); the estimate is ONE
    final division.  Reuses the q_quality_mad exact-order-statistic
    machinery for median and MAD.

    Scale: two value-grain prefix scans + one conditional fact
    aggregate — same shape as q_quality_mad."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "purchase").select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc")
    )
    pv = s.groupBy("vc").agg(F.count("*").cast("long").alias("c"))
    # COARSE bucket for the prefix scan (r11 opt): value-grain
    # buckets made the carry theta-join |distinct values|^2 (a ~1e9-
    # comparison BNLJ measured seconds at sf0.1, quadratic at scale);
    # floor(vc/2500) ascends with vc (floor, not div: order-aligned
    # for negatives too), so the scan is unchanged semantically.
    cum = bucketed_running_sum(
        pv,
        F.floor(F.col("vc") / F.lit(2500)).cast("long"),
        [F.col("vc")],
        {"cumc": F.col("c")},
    )
    tot = pv.agg(F.sum("c").cast("long").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .where(2 * F.col("cumc") >= F.col("n"))
        .agg(F.min("vc").alias("m"))
    )
    dpv = (
        pv.crossJoin(F.broadcast(med))
        .select(F.abs(F.col("vc") - F.col("m")).alias("d"), "c")
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    dcum = bucketed_running_sum(
        dpv,
        F.floor(F.col("d") / F.lit(2500)).cast("long"),
        [F.col("d")],
        {"cumc": F.col("c")},
    )
    mad = (
        dcum.crossJoin(F.broadcast(tot))
        .where(2 * F.col("cumc") >= F.col("n"))
        .agg(F.min("d").alias("mad"))
    )
    bound = F.lit(1345).cast("long") * 14826 * F.col("mad")
    within = (
        F.lit(10000000).cast("long") * F.abs(F.col("vc") - F.col("m"))
        <= bound
    )
    fold = (
        s.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.sum(
                F.when(
                    within, F.lit(10000000).cast("long") * F.col("vc")
                )
                .when(
                    F.col("vc") > F.col("m"),
                    F.lit(10000000).cast("long") * F.col("m") + bound,
                )
                .otherwise(
                    F.lit(10000000).cast("long") * F.col("m") - bound
                )
            )
            .cast("long")
            .alias("s7"),
            F.sum(F.when(~within, 1).otherwise(0))
            .cast("long")
            .alias("n_clipped"),
            F.first("m").alias("median_cents"),
            F.first("mad").alias("mad_cents"),
        )
    )
    return fold.select(
        F.col("n").alias("n_rows"),
        "median_cents",
        "mad_cents",
        "n_clipped",
        F.round(
            F.col("s7").cast("double")
            / (F.lit(10000000.0) * F.col("n"))
            / 100,
            4,
        ).alias("huber_mean"),
        F.round(
            F.col("s7").cast("double")
            / (F.lit(10000000.0) * F.col("n"))
            - F.col("median_cents").cast("double"),
            4,
        ).alias("shift_cents"),
    )
