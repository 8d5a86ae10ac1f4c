"""Join operators — SURVEY.md §2.3.

The relational surface a consumer of an events-to-db copy runs on the
target database, pulled into the engine: inner/outer/semi/anti/cross,
multiway, theta (non-equi residual), range (interval self-join), and
backward as-of.

Scale notes (SURVEY.md §7.4):

* Dimension joins (``nation``/``region``/literal lists) carry an
  explicit ``broadcast()`` hint → BroadcastHashJoin, no shuffle of the
  fact side.  At 100 TB the fact table streams through map tasks while
  the dim sits in every executor.
* Large equi-joins (orders⋈customer, lineitem⋈part) are left to
  Catalyst: shuffle hash / sort-merge on the key, AQE handles skew by
  splitting oversized partitions.
* The range self-join is an equi-join on ``user_id`` first (bounded
  groups), with the time predicate as a residual — never a cross
  product.  The as-of join is the union+window formulation: one shuffle
  on ``user_id``, no join at all — the classic scale-safe as-of plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@query(
    "q_join_inner",
    oracle="""
    SELECT c_mktsegment,
           count(*)                 AS n_orders,
           round(sum(o_totalprice), 4) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer equi-join + aggregate (BASELINE.md B3)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension join with an explicit broadcast hint →
    BroadcastHashJoin (plan asserted in tests/test_plans.py)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_name", "r_name"
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table join: revenue per ASIA nation from
    local suppliers (BASELINE.md B4).

    Plan shape: the fact (lineitem) is never shuffled — the selective
    side (date-filtered orders ⋈ customer, a bounded fraction of the
    order book) builds once and broadcasts onto the fact scan, then
    the true dims (supplier/nation/region) broadcast in turn; one
    pipeline, zero exchanges before the 5-row aggregate.  Measured
    0.93 s vs 1.4 s for the shuffle formulation at sf0.1.  AQE reaches
    the same all-broadcast plan from the unhinted chain but only after
    paying the shuffle *write* (1.67 s) — the hint skips that.  At a
    scale where the filtered orders side outgrows executor memory,
    drop the outer hint and the same code degrades gracefully to the
    shuffled plan AQE picks from runtime stats."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    co = F.broadcast(o.join(F.broadcast(c), c.c_custkey == o.o_custkey))
    return (
        li.join(co, li.l_orderkey == co.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_mktsegment,
           count(*)                                        AS n_rows,
           count(CASE WHEN o_orderkey IS NULL THEN 1 END)  AS n_custs_no_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers (each appears
    exactly once with NULL order columns)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("n_custs_no_orders"),
        )
    )


@query(
    "q_join_full",
    oracle="""
    SELECT coalesce(e.event_type, t.et) AS etype,
           e.n                          AS n_events,
           (t.et IS NOT NULL)           AS in_list
    FROM (SELECT event_type, count(*) AS n FROM events GROUP BY event_type) e
    FULL OUTER JOIN (VALUES ('purchase'), ('refund'), ('signup')) t(et)
      ON e.event_type = t.et
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of observed event types vs a literal watch-list —
    exercises null-extension on both sides ('refund' never occurs;
    'click'/'error'/'view' are off-list)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    watch = spark.createDataFrame(
        [("purchase",), ("refund",), ("signup",)], ["et"]
    )
    return (
        counts.join(F.broadcast(watch), counts.event_type == watch.et, "full")
        .select(
            F.coalesce("event_type", "et").alias("etype"),
            F.col("n").alias("n_events"),
            F.col("et").isNotNull().alias("in_list"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with ≥1 urgent order.
    Semi-join never duplicates the left side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, count(*) AS n_pairs
    FROM region CROSS JOIN nation
    GROUP BY r_name
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (both sides tiny → BroadcastNestedLoopJoin)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).groupBy("r_name").agg(
        F.count("*").alias("n_pairs")
    )


@query(
    "q_join_theta",
    oracle="""
    SELECT p_brand,
           count(*)                    AS n,
           round(sum(l_extendedprice), 4) AS sum_price
    FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_extendedprice > 20 * p_retailprice
    GROUP BY p_brand
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + non-equi residual.  The equi component
    keeps it a hash join (the residual is evaluated post-probe) — never
    a nested-loop over the full cross product."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey)
            & (li.l_extendedprice > 20 * p.p_retailprice),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )
    )


@query(
    "q_join_range",
    oracle="""
    SELECT a.user_id AS user_id, count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND
    GROUP BY a.user_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (band) self-join: pairs of events by the same user
    within 60 s.  Equi-join on ``user_id`` bounds each group; the time
    band is a residual predicate.  At scale: user_id hash-partitions the
    shuffle and AQE splits skewed users."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 60 SECONDS")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "q_join_asof",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, 0 AS kind FROM events
        WHERE event_type IN ('signup', 'click')
        UNION ALL
        SELECT user_id, ts, event_id, 1 AS kind FROM events
        WHERE event_type = 'purchase'
    ), w AS (
        SELECT user_id, ts, event_id, kind,
               last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_id,
               last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_ts
        FROM u
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, prior_id, prior_ts
    FROM w WHERE kind = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: for each purchase, the user's most recent
    signup/click at-or-before the purchase timestamp (ties: the
    reference row with the largest event_id).

    Implemented as the scale-safe union+window formulation (one shuffle
    on user_id, no join): interleave both sides ordered by
    ``(ts, kind, event_id)`` — kind=0 (reference events) sorts before
    kind=1 (purchases) at equal ts, giving at-or-before semantics — and
    carry the last non-null reference id/ts forward.  The oracle uses
    the identical formulation for hash parity (SURVEY.md §2.3 row
    q_join_asof)."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_type").isin("signup", "click")).select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = ref.unionByName(pur)
    marked = u.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last(F.when(F.col("kind") == 0, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("prior_id"),
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("prior_ts"),
    )
    return marked.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "prior_id",
        "prior_ts",
    )


@query(
    "q_join_nullsafe",
    oracle="""
    WITH lo AS (
        SELECT nullif(event_type, 'error') AS k, count(*) AS n_lo
        FROM events WHERE user_id < 75 GROUP BY 1
    ),
    hi AS (
        SELECT nullif(event_type, 'error') AS k, count(*) AS n_hi
        FROM events WHERE user_id >= 75 GROUP BY 1
    )
    SELECT lo.k, n_lo, n_hi
    FROM lo JOIN hi ON lo.k IS NOT DISTINCT FROM hi.k
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): the two
    user-population halves joined on a *nullable* key (``error``
    mapped to NULL) — under plain ``=`` the NULL bucket silently drops
    (q_join_inner semantics, pinned in test_micro_fixtures); null-safe
    equality pairs it.  Spark plans ``<=>`` as a hash join (the
    operator is still an equi-key), not a nested loop."""
    ev = load_table(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error")).alias("k")
    lo = (
        ev.filter(F.col("user_id") < 75)
        .select(k)
        .groupBy("k")
        .agg(F.count("*").alias("n_lo"))
    )
    hi = (
        ev.filter(F.col("user_id") >= 75)
        .select(k)
        .groupBy("k")
        .agg(F.count("*").alias("n_hi"))
    )
    return lo.join(hi, lo["k"].eqNullSafe(hi["k"])).select(
        lo["k"].alias("k"), "n_lo", "n_hi"
    )


@query(
    "q_join_salted",
    oracle="""
    SELECT e.event_type,
           count(*) AS n,
           round(sum(e.value), 4) AS sum_v,
           count(DISTINCT u.user_id) AS n_users
    FROM events e
    JOIN (
        SELECT user_id, count(*) AS user_events
        FROM events GROUP BY user_id HAVING count(*) >= 50
    ) u ON u.user_id = e.user_id
    GROUP BY e.event_type
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join as a contract query: the event fact side
    joins a per-user dimension through
    :func:`events_to_db_spark.functions.skew.salted_join` (salt from
    ``event_id``, k=8 — hot keys shuffle-split 8 ways, dimension
    replicated per salt), and the oracle is the *plain* join — proving
    salting is a pure physical rewrite with zero semantic footprint.
    AQE's skew-split covers sort-merge joins automatically; this is
    the deterministic fallback for hash joins (§7.5.6: hash salt,
    never rand())."""
    from events_to_db_spark.functions.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
        .filter(F.col("user_events") >= 50)
    )
    joined = salted_join(
        ev.select("user_id", "event_type", "value", "event_id"),
        dim,
        on=["user_id"],
        salt_from="event_id",
        k=8,
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_v"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q_join_grid",
    oracle="""
    WITH pts AS (
        SELECT vec_id, label,
               CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, label, x, y,
               CAST(floor(x / 0.05) AS BIGINT) AS cx,
               CAST(floor(y / 0.05) AS BIGINT) AS cy
        FROM pts
    ),
    pairs AS (
        SELECT a.label AS la, b.label AS lb,
               (a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) AS d2
        FROM (SELECT c.*, dx.dx, dy.dy
              FROM cells c
              CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dx
              CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy) a
        JOIN cells b
            ON b.cx = a.cx + a.dx AND b.cy = a.cy + a.dy
            AND a.vec_id < b.vec_id
        WHERE (a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y) <= 0.05 * 0.05
    )
    SELECT CAST(la = lb AS BOOLEAN) AS same_label,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(sqrt(d2)), 4) AS avg_dist,
           round(min(sqrt(d2)), 4) AS min_dist
    FROM pairs GROUP BY 1
    """,
)
def q_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked ε-neighborhood join (the 2-D spatial-join shape):
    points (first two embedding components) are bucketed into ε-sized
    grid cells; each point probes its 3×3 neighborhood, and the exact
    distance predicate runs only inside those blocks — candidate pairs
    are O(n·density), never the O(n²) cross product a naive distance
    join plans.  Every pair is found exactly once (the probe offset to
    the partner's home cell is unique), so no post-dedup is needed.
    The same cell/probe pattern is how geospatial joins, collision
    detection, and dense-region dedup scale on Spark: the shuffle is
    keyed by cell id, and AQE splits any hot cell.  Distances stay
    exact: both engines evaluate the identical double-precision
    expression on identical float32 inputs (deterministic compare —
    no rounding before the threshold test)."""
    emb = load_table(spark, sf_dir, "embeddings")
    eps = 0.05
    pts = emb.select(
        "vec_id",
        "label",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    cells = pts.select(
        "vec_id",
        "label",
        "x",
        "y",
        F.floor(F.col("x") / eps).alias("cx"),
        F.floor(F.col("y") / eps).alias("cy"),
    )
    probe = (
        cells.withColumn(
            "dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
        )
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("vec_id").alias("a_id"),
            F.col("label").alias("la"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            (F.col("cx") + F.col("dx")).alias("tcx"),
            (F.col("cy") + F.col("dy")).alias("tcy"),
        )
    )
    d2 = (F.col("ax") - F.col("x")) * (F.col("ax") - F.col("x")) + (
        F.col("ay") - F.col("y")
    ) * (F.col("ay") - F.col("y"))
    pairs = (
        probe.join(
            cells,
            (F.col("tcx") == F.col("cx")) & (F.col("tcy") == F.col("cy")),
        )
        .filter(F.col("a_id") < F.col("vec_id"))
        .filter(d2 <= eps * eps)
        .select(
            (F.col("la") == F.col("label")).alias("same_label"),
            F.sqrt(d2).alias("dist"),
        )
    )
    return pairs.groupBy("same_label").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg("dist"), 4).alias("avg_dist"),
        F.round(F.min("dist"), 4).alias("min_dist"),
    )


@query(
    "q_join_bucketed",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 4) AS revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join over *bucketed catalog tables* — the pre-shuffled
    layout that makes a repeated 100 TB join shuffle-free: both sides
    are written once with ``bucketBy(16, custkey)`` (hash-partitioned
    at write time, bucket metadata in the catalog), so the join reads
    bucket-aligned splits and Catalyst plans no Exchange under either
    side (plan-asserted in tests/test_bucketing_skew.py and
    test_plans.py; with default confs AQE may still prefer a broadcast
    for a dim this small — equally shuffle-free).

    The write-once step is the ingest-time layout decision; repeat
    runs hit ``tableExists`` and pay zero write cost.
    """
    import os

    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/sparkgraft_layouts/{sf_tag}/bucketed"
    specs = {
        f"bkt_orders_{sf_tag}": (
            load_table(spark, sf_dir, "orders"),
            "o_custkey",
        ),
        f"bkt_customer_{sf_tag}": (
            load_table(spark, sf_dir, "customer"),
            "c_custkey",
        ),
    }
    for tbl, (df, key) in specs.items():
        if not spark.catalog.tableExists(tbl):
            (
                df.write.mode("overwrite")
                .option("path", os.path.join(base, tbl))
                .bucketBy(16, key)
                .sortBy(key)
                .format("parquet")
                .saveAsTable(tbl)
            )
    o = spark.table(f"bkt_orders_{sf_tag}")
    c = spark.table(f"bkt_customer_{sf_tag}")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
    SELECT p.event_id,
           v.view_id,
           v.gap_s
    FROM events p
    LEFT JOIN LATERAL (
        SELECT v.event_id AS view_id,
               CASE WHEN (epoch_us(p.ts) - epoch_us(v.ts)) <= 7200000000
                    THEN (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 END
                   AS gap_s
        FROM events v
        WHERE v.user_id = p.user_id
          AND v.event_type = 'view'
          AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id))
        ORDER BY v.ts DESC, v.event_id DESC
        LIMIT 1
    ) v ON TRUE
    WHERE p.event_type = 'purchase'
      AND v.gap_s IS NOT NULL
    ORDER BY p.event_id
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF join with a match tolerance: each purchase matched to the
    same user's latest strictly-prior view, kept only when the gap is
    ≤ 2 hours — the "recent context" join (attribution windows, state
    lookups with TTL) that plain ASOF (``q_join_asof``) lacks.

    Scalable shape: NOT a per-row subquery — both streams interleave
    in one user-partitioned sort and the prior view arrives via
    last-ignorenulls over ROWS UNBOUNDED PRECEDING..-1 (strictly
    earlier in the (ts, event_id) total order, so same-µs ties
    resolve identically in both engines).  Tolerance compares exact
    µs; the reported gap uses integer-div seconds.  One shuffle on
    user_id; the oracle restates it as LATERAL top-1.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    tagged = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "event_type",
        us.alias("us"),
        F.when(
            F.col("event_type") == "view",
            F.struct(us.alias("v_us"), F.col("event_id").alias("view_id")),
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = tagged.withColumn("pv", F.last("v", ignorenulls=True).over(w))
    return (
        prior.where(
            (F.col("event_type") == "purchase")
            & F.col("pv").isNotNull()
            & ((F.col("us") - F.col("pv.v_us")) <= 7_200_000_000)
        )
        .select(
            "event_id",
            F.col("pv.view_id").alias("view_id"),
            F.expr("(us - pv.v_us) div 1000000").alias("gap_s"),
        )
        .orderBy("event_id")
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, 0 AS kind FROM events
        WHERE event_type IN ('signup', 'click')
        UNION ALL
        SELECT user_id, ts, event_id, 1 AS kind FROM events
        WHERE event_type = 'purchase'
    ), b AS (
        SELECT user_id, ts, event_id, kind,
               last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS back_id,
               last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS back_ts
        FROM u
    ), f AS (
        SELECT user_id, ts, event_id, kind, back_id, back_ts,
               last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY ts DESC, kind, event_id DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS fwd_id,
               last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY ts DESC, kind, event_id DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS fwd_ts
        FROM b
    )
    SELECT event_id AS purchase_id, user_id,
           CAST(CASE WHEN pick_back THEN back_id ELSE fwd_id END AS BIGINT)
               AS nearest_id,
           CAST(CASE WHEN pick_back
                     THEN epoch_us(ts) - epoch_us(back_ts)
                     ELSE epoch_us(fwd_ts) - epoch_us(ts) END AS BIGINT)
               AS gap_us,
           CASE WHEN pick_back THEN 'back' ELSE 'fwd' END AS direction
    FROM (
        SELECT *,
               fwd_id IS NULL OR (back_id IS NOT NULL
                   AND epoch_us(ts) - epoch_us(back_ts)
                       <= epoch_us(fwd_ts) - epoch_us(ts)) AS pick_back
        FROM f
    )
    WHERE kind = 1 AND (back_id IS NOT NULL OR fwd_id IS NOT NULL)
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join: for each purchase, the user's
    signup/click closest in time in *either* direction (ties prefer the
    backward match, matching pandas ``merge_asof(direction='nearest')``).

    Same scale-safe union+window shape as :func:`q_join_asof`, run
    twice — a forward carry in ``(ts, kind, event_id)`` order and a
    backward carry in descending order (at equal ts the reference
    still sorts before the purchase, so at-or-before/at-or-after
    semantics are symmetric) — then one comparison of the two µs gaps.
    Both gaps are exact integer microseconds (never a double quotient);
    one shuffle on user_id total, no join node at all.
    """
    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_type").isin("signup", "click")).select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    u = ref.unionByName(pur)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("kind"), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref_id = F.when(F.col("kind") == 0, F.col("event_id"))
    ref_ts = F.when(F.col("kind") == 0, F.col("ts"))
    marked = u.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last(ref_id, ignorenulls=True).over(wb).alias("back_id"),
        F.last(ref_ts, ignorenulls=True).over(wb).alias("back_ts"),
        F.last(ref_id, ignorenulls=True).over(wf).alias("fwd_id"),
        F.last(ref_ts, ignorenulls=True).over(wf).alias("fwd_ts"),
    )
    picked = marked.where(
        (F.col("kind") == 1)
        & (F.col("back_id").isNotNull() | F.col("fwd_id").isNotNull())
    ).withColumn(
        "pick_back",
        F.col("fwd_id").isNull()
        | (
            F.col("back_id").isNotNull()
            & (
                F.expr("unix_micros(ts) - unix_micros(back_ts)")
                <= F.expr("unix_micros(fwd_ts) - unix_micros(ts)")
            )
        ),
    )
    return picked.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(F.col("pick_back"), F.col("back_id"))
        .otherwise(F.col("fwd_id"))
        .cast("long")
        .alias("nearest_id"),
        F.when(
            F.col("pick_back"),
            F.expr("unix_micros(ts) - unix_micros(back_ts)"),
        )
        .otherwise(F.expr("unix_micros(fwd_ts) - unix_micros(ts)"))
        .cast("long")
        .alias("gap_us"),
        F.when(F.col("pick_back"), F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
    )


@query(
    "q_join_bloom_prune",
    oracle="""
    WITH buyers AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    bits AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                        || '#' || k), 1, 15)) AS BIGINT)
                   % 65536 AS bit
        FROM buyers CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
    ),
    clickers AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ),
    probe AS (
        SELECT c.user_id,
               CAST(('0x' || substr(md5(CAST(c.user_id AS VARCHAR)
                                        || '#' || k), 1, 15)) AS BIGINT)
                   % 65536 AS bit
        FROM clickers c CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
    ),
    cand AS (
        SELECT p.user_id
        FROM probe p JOIN bits b ON p.bit = b.bit
        GROUP BY p.user_id HAVING count(*) = 3
    ),
    tru AS (
        SELECT c.user_id FROM clickers c
        JOIN buyers b ON b.user_id = c.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM clickers) AS n_probe,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM tru) AS n_true,
           (SELECT CAST(count(*) AS BIGINT) FROM cand)
               - (SELECT CAST(count(*) AS BIGINT) FROM tru)
               AS n_false_positive,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_set_bits
    """,
)
def q_join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter join pruning: the purchase-side user set
    is folded into a 65536-slot / 3-hash Bloom membership (the same
    deterministic md5 family as q_sketch_bloom), clickers probe it,
    and only the candidates that pass every hash reach the exact join
    — the runtime-filter pattern that cuts shuffle volume when the
    probe side is enormous and the build side selective.

    The audit reports exactly what the optimizer would want to know:
    probe size, candidates passed, true matches, and the false-
    positive overhead the bitmap traded for its fixed size.  All
    counts exact; membership is a (bit)-keyed join + HAVING count =
    k, so even the filter itself is shuffle-bounded by set bits, not
    rows.  (Spark injects this pattern implicitly as runtime row-group
    pruning; making it explicit makes the cost model checkable.)
    """
    ev = load_table(spark, sf_dir, "events")
    ks = spark.range(0, 3).select(F.col("id").alias("k"))
    buyers = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    bits = (
        buyers.crossJoin(F.broadcast(ks))
        .select(
            (
                F.expr(
                    "cast(conv(substr(md5(cast(user_id as string)"
                    " || '#' || k), 1, 15), 16, 10) as bigint)"
                )
                % 65536
            ).alias("bit")
        )
        .distinct()
    )
    clickers = (
        ev.where(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
    )
    probe = clickers.crossJoin(F.broadcast(ks)).select(
        "user_id",
        (
            F.expr(
                "cast(conv(substr(md5(cast(user_id as string)"
                " || '#' || k), 1, 15), 16, 10) as bigint)"
            )
            % 65536
        ).alias("bit"),
    )
    cand = (
        probe.join(F.broadcast(bits), "bit")
        .groupBy("user_id")
        .agg(F.count("*").alias("hits"))
        .where(F.col("hits") == 3)
    )
    tru = clickers.join(buyers, "user_id", "left_semi")
    return (
        clickers.agg(F.count("*").alias("n_probe"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(tru.agg(F.count("*").alias("n_true")))
        .crossJoin(bits.agg(F.count("*").alias("n_set_bits")))
        .select(
            "n_probe",
            "n_candidates",
            "n_true",
            (F.col("n_candidates") - F.col("n_true")).alias(
                "n_false_positive"
            ),
            "n_set_bits",
        )
    )


@query(
    "q_join_nn",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
                   ::BIGINT % 10000 AS x,
               ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#y'),
                               1, 15))::BIGINT % 10000 AS y
        FROM customer
    ),
    s AS (
        SELECT s_suppkey,
               ('0x' || substr(md5('s' || CAST(s_suppkey AS VARCHAR)), 1, 15))
                   ::BIGINT % 10000 AS x,
               ('0x' || substr(md5('s' || CAST(s_suppkey AS VARCHAR) || '#y'),
                               1, 15))::BIGINT % 10000 AS y
        FROM supplier
    ),
    pairs AS (
        SELECT c.c_custkey, s.s_suppkey,
               (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS d2,
               row_number() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY (c.x - s.x) * (c.x - s.x)
                            + (c.y - s.y) * (c.y - s.y), s.s_suppkey
               ) AS rn
        FROM c CROSS JOIN s
    )
    SELECT c_custkey, s_suppkey AS nearest_supp, CAST(d2 AS BIGINT) AS d2
    FROM pairs WHERE rn = 1
    ORDER BY d2 DESC, c_custkey
    LIMIT 15
    """,
)
def q_join_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial nearest-neighbor join: every customer is matched to its
    closest supplier on a deterministic md5-synthesized integer grid,
    and the query returns the 15 WORST-SERVED customers (largest
    nearest-supplier distance) — the coverage-gap audit of a
    facility-location problem.

    Exactness: coordinates are integers, squared euclidean distance is
    an exact BIGINT (< 2·10⁸), and the per-customer argmin is a
    row_number over (d2, s_suppkey) — a total integer order, so no
    float argmin crosses the engines.  Plan: the small supplier side
    broadcasts under every customer partition (BroadcastNestedLoop —
    |C|·|S| pairs map-side, nothing shuffles but the per-customer
    winners); at 100 TB the same query grid-buckets the big side
    first (the q_join_grid pattern) to keep the pair count near-linear."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (
            F.expr(
                "cast(conv(substr(md5(cast(cast(c_custkey as string) as binary)),1,15),16,10) as bigint)"
            )
            % 10000
        ).alias("cx"),
        (
            F.expr(
                "cast(conv(substr(md5(cast(concat(cast(c_custkey as string), '#y') as binary)),1,15),16,10) as bigint)"
            )
            % 10000
        ).alias("cy"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (
            F.expr(
                "cast(conv(substr(md5(cast(concat('s', cast(s_suppkey as string)) as binary)),1,15),16,10) as bigint)"
            )
            % 10000
        ).alias("sx"),
        (
            F.expr(
                "cast(conv(substr(md5(cast(concat('s', cast(s_suppkey as string), '#y') as binary)),1,15),16,10) as bigint)"
            )
            % 10000
        ).alias("sy"),
    )
    # Materialize the two tiny coordinate tables BEFORE the pair
    # fan-out: CollapseProject would otherwise inline the md5/conv
    # coordinate expressions into the post-join stage and hash PER
    # PAIR (measured ~23 s for 60M md5 at sf0.1 vs ~1 s with the
    # projections pinned below the join by the lineage cut).
    from events_to_db_spark.plans.checkpoints import truncate_lineage

    c = truncate_lineage(c, eager=False)
    s = truncate_lineage(s, eager=False)
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    # Per-customer argmin as ONE HashAggregate: pack (d2, suppkey)
    # into a single BIGINT — d2 < 2·10⁸ and suppkey < 2²⁰, so
    # d2·2²⁰ + suppkey preserves the lexicographic (d2, suppkey)
    # order and min() of the packed long IS the argmin.  A struct-min
    # would force SortAggregate (Tungsten can't hash-agg struct
    # buffers — measured 26 s sorting 15M pair rows); the packed long
    # hash-aggs map-side.
    packed = F.shiftleft(F.col("d2"), 20) + F.col("s_suppkey")
    best = (
        c.crossJoin(F.broadcast(s))
        .withColumn("d2", d2)
        .groupBy("c_custkey")
        .agg(F.min(packed).alias("b"))
    )
    return (
        best.select(
            "c_custkey",
            (F.col("b") % (1 << 20)).alias("nearest_supp"),
            F.shiftright(F.col("b"), 20).cast("long").alias("d2"),
        )
        .orderBy(F.col("d2").desc(), "c_custkey")
        .limit(15)
    )
