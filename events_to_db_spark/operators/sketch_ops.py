"""Probabilistic-sketch operators with exact differential oracles
(SURVEY.md §2.12, round 2).

HyperLogLog (``q_agg_approx``) and the GK quantile sketch
(``q_agg_approx_quantile``) are engine built-ins and rows-only checked;
this module adds the two other workhorse sketches of a large-scale
pipeline — Count-Min (frequency estimation) and Bloom (membership) —
built from first principles on md5-derived hash functions that BOTH
engines compute bit-identically.  That makes these the rare sketch
queries whose outputs value-hash against the oracle: the sketch *is*
deterministic; only its error is probabilistic, and the queries report
that error against the exact answer, which is precisely what you want
audited before trusting a sketch at 100 TB.

Both sketches are pure aggregations (order- and partition-independent
sums / distincts), so the same code gives the same answer on any
cluster layout — the property that makes them mergeable across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


def _spark_h(expr: str) -> str:
    """60-bit md5-derived integer of a string expression (Spark SQL)."""
    return (
        f"cast(conv(substr(md5(cast({expr} as binary)), 1, 15), 16, 10)"
        " as bigint)"
    )


def _duck_h(expr: str) -> str:
    """The identical hash in DuckDB SQL."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


#: Count-Min geometry: d=4 hash rows × w=16 buckets — width chosen
#: so the 31-token corpus vocabulary actually collides (measured: 10 of
#: the top-20 terms overestimated), making the error column a real
#: measurement rather than a column of zeros.
_CM_D, _CM_W = 4, 16


@query(
    "q_sketch_countmin",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    exact AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    top20 AS (SELECT t, c FROM exact ORDER BY c DESC, t LIMIT 20),
    counters AS (
        SELECT j, {_duck_h("j || ':' || t")} % {_CM_W} AS bucket,
               count(*) AS cnt
        FROM tok CROSS JOIN (SELECT unnest(generate_series(0, {_CM_D - 1}))
                             AS j)
        GROUP BY 1, 2
    ),
    probe AS (
        SELECT top20.t, top20.c, j,
               {_duck_h("j || ':' || top20.t")} % {_CM_W} AS bucket
        FROM top20 CROSS JOIN (SELECT unnest(generate_series(0, {_CM_D - 1}))
                               AS j)
    )
    SELECT p.t AS term, CAST(max(p.c) AS BIGINT) AS true_c,
           CAST(min(c2.cnt) AS BIGINT) AS est_c,
           CAST(min(c2.cnt) - max(p.c) AS BIGINT) AS overestimate
    FROM probe p
    JOIN counters c2 ON c2.j = p.j AND c2.bucket = p.bucket
    GROUP BY p.t
    """,
)
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation, exactly reproducible: a
    4×16 counter matrix over md5-derived hash rows estimates every
    term's frequency as the min of its 4 counters; the query reports
    estimate vs exact count for the top-20 terms.  Count-Min never
    underestimates (est ≥ true is a theorem — the oracle hash-check
    would catch a violation), and the overestimate column *measures*
    the collision error the 16-bucket width buys at this cardinality.

    The counter matrix is a d×w=64-row aggregate regardless of corpus
    size — the reason Count-Min works at 100 TB: counters sum, so
    per-shard sketches merge by addition (same property the oracle
    exploits: both engines build the matrix independently and agree
    exactly)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("t"))
    exact = tok.groupBy("t").agg(F.count("*").alias("c"))
    top20 = exact.orderBy(F.col("c").desc(), "t").limit(20)
    js = F.explode(F.array(*[F.lit(j) for j in range(_CM_D)])).alias("j")
    counters = (
        tok.select("t", js)
        .select("j", (F.expr(_spark_h("concat(j, ':', t)")) % _CM_W).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    probe = top20.select("t", "c", js).select(
        "t",
        "c",
        "j",
        (F.expr(_spark_h("concat(j, ':', t)")) % _CM_W).alias("bucket"),
    )
    return (
        probe.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy(F.col("t").alias("term"))
        .agg(
            F.max("c").alias("true_c"),
            F.min("cnt").alias("est_c"),
            (F.min("cnt") - F.max("c")).alias("overestimate"),
        )
    )


#: Bloom geometry: k=3 hash functions into m=65536 bits; members are
#: the 3-token shingles of the train split (~14k at sf0.01 -> load
#: factor kn/m ≈ 0.64, predicted FP rate ≈ 10 %).
_BL_K, _BL_M = 3, 65536

_DUCK_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10)"
_SPARK_BUCKET = (
    "pmod(cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15),"
    " 16, 10) as bigint), 10)"
)


@query(
    "q_sketch_bloom",
    oracle=f"""
    WITH t AS (
        SELECT {_DUCK_BUCKET} AS bucket, string_split(text, ' ') AS toks
        FROM documents
    ),
    tri AS (
        SELECT bucket, concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g
        FROM (SELECT bucket, toks,
                     unnest(generate_series(1, len(toks) - 2)) AS i
              FROM t)
    ),
    train AS (SELECT DISTINCT g FROM tri WHERE bucket < 8),
    probe AS (SELECT DISTINCT g FROM tri WHERE bucket = 9),
    ks AS (SELECT unnest(generate_series(0, {_BL_K - 1})) AS k),
    bits AS (
        SELECT DISTINCT {_duck_h("k || ':' || g")} % {_BL_M} AS bit
        FROM train CROSS JOIN ks
    ),
    hits AS (
        SELECT p.g,
               count(b.bit) AS n_set,
               max(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS member
        FROM probe p
        CROSS JOIN ks
        LEFT JOIN bits b ON b.bit = {_duck_h("ks.k || ':' || p.g")} % {_BL_M}
        LEFT JOIN train tr ON tr.g = p.g
        GROUP BY p.g
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(member) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN n_set = {_BL_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_positive,
           CAST(sum(CASE WHEN n_set = {_BL_K} AND member = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
           CAST(sum(CASE WHEN n_set < {_BL_K} AND member = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negative
    FROM hits
    """,
)
def q_sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership, exactly reproducible: the train split's
    3-token shingles populate a 65536-bit filter via 3 md5-derived
    hash functions; the test split's shingles probe it.  The query
    reports the confusion counts — false positives are the filter's
    designed error (predicted ≈10 % at this load factor, measured by
    the n_false_positive column), false negatives must be ZERO (a
    Bloom theorem the differential check enforces).

    This is the contamination-check accelerator: at 100 TB the exact
    shingle semi-join (q_contamination) shuffles the probe corpus
    against the train vocabulary, while the Bloom filter is a
    64 KiB bitmask broadcast to every executor — probes never
    shuffle.  The filter build is a distinct-aggregate (idempotent
    OR), so per-shard filters merge for free."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.expr(_SPARK_BUCKET).alias("bucket"), F.split("text", " ").alias("toks")
    )
    tri = t.select(
        "bucket",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 2, 0)),"
                " (x, i) -> concat_ws(' ', x, toks[i + 1], toks[i + 2]))"
            )
        ).alias("g"),
    )
    train = tri.filter(F.col("bucket") < 8).select("g").distinct()
    probe = tri.filter(F.col("bucket") == 9).select("g").distinct()
    ks = F.explode(F.array(*[F.lit(k) for k in range(_BL_K)])).alias("k")
    bits = (
        train.select(ks, "g")
        .select((F.expr(_spark_h("concat(k, ':', g)")) % _BL_M).alias("bit"))
        .distinct()
    )
    probe_bits = probe.select(ks, "g").select(
        "g", (F.expr(_spark_h("concat(k, ':', g)")) % _BL_M).alias("bit")
    )
    member = probe.join(train, "g", "left_semi").select(
        "g", F.lit(1).alias("member")
    )
    hits = (
        probe_bits.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("g")
        .agg(F.count("*").alias("n_set"))
    )
    scored = (
        probe.join(hits, "g", "left")
        .join(member, "g", "left")
        .select(
            F.coalesce("n_set", F.lit(0)).alias("n_set"),
            F.coalesce("member", F.lit(0)).alias("member"),
        )
    )
    pos = F.col("n_set") == _BL_K
    mem = F.col("member") == 1
    return scored.agg(
        F.count("*").alias("n_probes"),
        F.sum("member").alias("n_members"),
        F.sum(pos.cast("long")).alias("n_bloom_positive"),
        F.sum((pos & ~mem).cast("long")).alias("n_false_positive"),
        F.sum((~pos & mem).cast("long")).alias("n_false_negative"),
    )


#: HyperLogLog geometry: m=16 registers (p=4, ~26 % standard error) —
#: small enough that the register table is human-checkable, large
#: enough that the estimate is a real measurement against the exact
#: distinct count the query reports alongside it.
_HLL_M = 16


@query(
    "q_sketch_hll",
    oracle=f"""
    WITH h AS (
        SELECT event_type, {_duck_h("CAST(user_id AS VARCHAR)")} AS hv
        FROM events
    ),
    parts AS (
        SELECT DISTINCT event_type,
               hv % {_HLL_M} AS bucket,
               hv // {_HLL_M} AS w
        FROM h
    ),
    rho AS (
        SELECT event_type, bucket,
               max(CASE WHEN w = 0 THEN 57
                        ELSE 57 - length(bin(w)) END) AS reg
        FROM parts GROUP BY 1, 2
    ),
    regs AS (
        SELECT event_type,
               sum((1::BIGINT) << (57 - reg)) AS s_present,
               count(*) AS n_buckets
        FROM rho GROUP BY 1
    ),
    est AS (
        SELECT event_type,
               s_present
               + ({_HLL_M} - n_buckets) * ((1::BIGINT) << 57) AS s_int,
               {_HLL_M} - n_buckets AS v_zero
        FROM regs
    ),
    raw AS (
        SELECT event_type, v_zero,
               (CAST(172.288 AS DOUBLE) * 144115188075855872) / s_int
                   AS e_raw
        FROM est
    ),
    fin AS (
        SELECT event_type,
               CASE WHEN e_raw <= 40 AND v_zero > 0
                    THEN 16e0 * ln(16e0 / v_zero)
                    ELSE e_raw END AS est
        FROM raw
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
    )
    SELECT f.event_type,
           CAST(x.n_exact AS BIGINT) AS n_exact,
           round(f.est, 4) AS hll_estimate,
           round((f.est - x.n_exact) / x.n_exact * 100, 4) AS rel_err_pct
    FROM fin f JOIN exact x ON f.event_type = x.event_type
    """,
)
def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog from first principles, exactly reproducible: per
    event type, hash every user_id to 60 md5-derived bits, split into
    (4-bit bucket, 56-bit suffix), keep per bucket the max leading-zero
    rank rho, and estimate the distinct count as alpha16·m²/Σ2^{-reg}.

    Spark's built-in ``approx_count_distinct`` (q_agg_approx) is
    rows-only checkable because its HLL++ internals are opaque; this
    sketch value-hashes against the oracle because every step is
    deterministic integer arithmetic: the register sum is carried as
    Σ 2^(57−reg) — an exact BIGINT (≤ 16·2^57 < 2^63), so the one
    float division at the end is bit-identical in both engines.
    The small-range linear-counting correction (E ≤ 2.5 m with empty
    registers) is implemented identically in both engines.

    Everything before the 16-row register fold is a pure distributed
    aggregation (DISTINCT + max + sum — order- and partition-
    independent), which is exactly the mergeability property that lets
    HLL registers combine across shards at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    hv = F.expr(_spark_h("cast(user_id as string)"))
    parts = (
        ev.select(
            "event_type",
            (hv % _HLL_M).alias("bucket"),
            F.expr(f"{_spark_h('cast(user_id as string)')} div {_HLL_M}").alias("w"),
        )
        .distinct()
    )
    rho = parts.groupBy("event_type", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(57)).otherwise(
                F.lit(57) - F.length(F.bin("w"))
            )
        ).alias("reg")
    )
    regs = rho.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 57 - reg)")).alias(
            "s_present"
        ),
        F.count("*").alias("n_buckets"),
    )
    est = regs.select(
        "event_type",
        (
            F.col("s_present")
            + (F.lit(_HLL_M) - F.col("n_buckets"))
            * F.expr("shiftleft(cast(1 as bigint), 57)")
        ).alias("s_int"),
        (F.lit(_HLL_M) - F.col("n_buckets")).alias("v_zero"),
    )
    raw = est.select(
        "event_type",
        "v_zero",
        F.expr(
            "(cast(172.288 as double) * 144115188075855872) / s_int"
        ).alias("e_raw"),
    )
    fin = raw.select(
        "event_type",
        F.when(
            (F.col("e_raw") <= 40) & (F.col("v_zero") > 0),
            F.expr("16e0 * ln(16e0 / v_zero)"),
        )
        .otherwise(F.col("e_raw"))
        .alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return fin.join(exact, "event_type").select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round("est", 4).alias("hll_estimate"),
        F.round((F.col("est") - F.col("n_exact")) / F.col("n_exact") * 100, 4)
            .alias("rel_err_pct"),
    )


#: KMV geometry: k = 8 minimum hash values (tiny on purpose — the
#: sf0.001 smoke corpus has only 15 distinct users per type, and the
#: estimator needs k ≤ n).  2^60 is the hash range of `_spark_h`.
_KMV_K = 8
_KMV_RANGE = 1 << 60


@query(
    "q_sketch_kmv",
    oracle=f"""
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
          FROM u GROUP BY 1),
    h AS (SELECT DISTINCT event_type,
                 {_duck_h("CAST(user_id AS VARCHAR)")} AS h
          FROM u),
    surv AS (
        SELECT h.event_type, h.h
        FROM h JOIN n ON h.event_type = n.event_type
        WHERE h.h <= ({_KMV_RANGE} // n.n_exact) * (4 * {_KMV_K})
    ),
    rk AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM surv
    )
    SELECT rk.event_type, n.n_exact,
           round(({_KMV_K} - 1) * {float(_KMV_RANGE)} / CAST(rk.h AS DOUBLE), 2)
               AS est_distinct,
           round((({_KMV_K} - 1) * {float(_KMV_RANGE)} / CAST(rk.h AS DOUBLE)
                  - n.n_exact) / n.n_exact * 100, 2) AS rel_err_pct
    FROM rk JOIN n ON rk.event_type = n.event_type
    WHERE rk.rn = {_KMV_K}
    ORDER BY rk.event_type
    """,
)
def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type,
    exactly reproducible: hash each distinct user to a 60-bit
    md5-derived integer, keep the k = 8 smallest hash values, and
    estimate |users| as ``(k−1)·2^60 / R_k`` where R_k is the k-th
    smallest hash — the bottom-k sketch whose union-merge (take the k
    smallest of the combined sets) gives distributed distinct counting
    with one tiny state per shard.  The query reports the estimate
    against the exact count, so the sketch's error is *measured*, not
    assumed.

    Scale shape: the naive formulation sorts every hash per type; here
    the exact per-type count (needed for the error column anyway)
    derives a threshold τ = 4k/n · 2^60 that pre-filters to an
    expected ~4k = 32 surviving hashes per type *before* the order
    statistic, so the window sort runs on a constant-size survivor
    set — the same two-pass trick that makes exact bottom-k viable at
    100 TB.  All arithmetic up to the final division is 64-bit
    integer; the one double division is bit-identical across engines.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    n = ev.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n_exact"))
    h = ev.select(
        "event_type",
        F.expr(_spark_h("cast(user_id as string)")).alias("h"),
    ).distinct()
    tau = F.expr(f"({_KMV_RANGE}L div n_exact) * {4 * _KMV_K}")
    surv = h.join(F.broadcast(n), "event_type").where(F.col("h") <= tau)
    from pyspark.sql import Window

    rk = (
        surv.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("h")
            ),
        )
        .where(F.col("rn") == _KMV_K)
    )
    est = F.lit(float(_KMV_K - 1)) * F.lit(float(_KMV_RANGE)) / F.col("h").cast(
        "double"
    )
    return rk.select(
        "event_type",
        "n_exact",
        F.round(est, 2).alias("est_distinct"),
        F.round(
            (est - F.col("n_exact")) / F.col("n_exact") * 100, 2
        ).alias("rel_err_pct"),
    ).orderBy("event_type")


_KMV_U_K = 32


@query(
    "q_sketch_kmv_union",
    oracle=f"""
    WITH flags AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS in_a,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS in_b
        FROM events
        WHERE event_type IN ('purchase', 'view')
        GROUP BY 1
    ),
    n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_union,
               CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_int
        FROM flags
    ),
    h AS (
        SELECT user_id, in_a, in_b,
               {_duck_h("CAST(user_id AS VARCHAR)")} AS h
        FROM flags
    ),
    surv AS (
        SELECT h.*, n.n_union, n.n_int
        FROM h CROSS JOIN n
        WHERE h.h <= ({_KMV_RANGE} // greatest(n.n_union, {4 * _KMV_U_K}))
                     * {4 * _KMV_U_K}
    ),
    rk AS (
        SELECT *, row_number() OVER (ORDER BY h) AS rn FROM surv
    ),
    bot AS (
        SELECT max(h) FILTER (rn = {_KMV_U_K})          AS rk_h,
               sum(CASE WHEN rn <= {_KMV_U_K} AND in_a = 1 AND in_b = 1
                        THEN 1 ELSE 0 END)              AS k_both,
               any_value(n_union)                       AS n_union,
               any_value(n_int)                         AS n_int
        FROM rk
    )
    SELECT n_union, n_int,
           round(({_KMV_U_K} - 1) * {float(_KMV_RANGE)}
                 / CAST(rk_h AS DOUBLE), 2)             AS est_union,
           round(CAST(k_both AS DOUBLE) / {_KMV_U_K}, 4) AS jacc_est,
           round(CAST(k_both AS DOUBLE) / {_KMV_U_K}
                 * (({_KMV_U_K} - 1) * {float(_KMV_RANGE)}
                    / CAST(rk_h AS DOUBLE)), 2)         AS est_int
    FROM bot
    """,
)
def q_sketch_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — the property that makes bottom-k
    sketches the distributed distinct-count workhorse: the union of
    two sets' sketches is the bottom-k of their combined hash sets
    (mergeable across shards with constant state), and the Jaccard
    similarity is estimated by the fraction of the union's bottom-k
    present in BOTH sets, giving |A∩B| ≈ J·|A∪B| by inclusion.
    Estimated union/intersection of purchase-users vs view-users are
    reported next to the exact counts, so the error is measured.
    Hashes are md5-derived (deterministic, engine-identical); the
    one float division happens on identical integers.

    Scale shape: same two-pass trick as q_sketch_kmv — the exact
    union count derives a threshold that pre-filters to an expected
    ~4k survivors BEFORE the order statistic (capped at 4k·RANGE/n ≤
    RANGE so tiny inputs can't overflow the int64 multiply), and the
    global bottom-k window runs on that constant-size survivor set.
    """
    ev = load_table(spark, sf_dir, "events")
    flags = (
        ev.where(F.col("event_type").isin("purchase", "view"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "in_a"
            ),
            F.max((F.col("event_type") == "view").cast("int")).alias("in_b"),
        )
    )
    n = flags.agg(
        F.count("*").cast("bigint").alias("n_union"),
        F.sum(
            ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("bigint")
        ).alias("n_int"),
    )
    h = flags.select(
        "in_a",
        "in_b",
        F.expr(_spark_h("cast(user_id as string)")).alias("h"),
    )
    tau = F.expr(
        f"({_KMV_RANGE}L div greatest(n_union, {4 * _KMV_U_K}L))"
        f" * {4 * _KMV_U_K}L"
    )
    surv = h.crossJoin(F.broadcast(n)).where(F.col("h") <= tau)
    from pyspark.sql import Window

    rk = surv.withColumn("rn", F.row_number().over(Window.orderBy("h")))
    bot = rk.agg(
        F.max(F.when(F.col("rn") == _KMV_U_K, F.col("h"))).alias("rk_h"),
        F.sum(
            (
                (F.col("rn") <= _KMV_U_K)
                & (F.col("in_a") == 1)
                & (F.col("in_b") == 1)
            ).cast("bigint")
        ).alias("k_both"),
        F.any_value("n_union").alias("n_union"),
        F.any_value("n_int").alias("n_int"),
    )
    est_union = (
        F.lit(float(_KMV_U_K - 1))
        * F.lit(float(_KMV_RANGE))
        / F.col("rk_h").cast("double")
    )
    jacc = F.col("k_both").cast("double") / F.lit(_KMV_U_K)
    return bot.select(
        "n_union",
        "n_int",
        F.round(est_union, 2).alias("est_union"),
        F.round(jacc, 4).alias("jacc_est"),
        F.round(jacc * est_union, 2).alias("est_int"),
    )


@query(
    "q_sketch_ams",
    oracle="""
    WITH f AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS c,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM events GROUP BY 1
    ),
    est AS (
        SELECT i,
               CAST(sum((1 - 2 * ((h >> i) & 1)) * c) AS BIGINT) AS s
        FROM f CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i)
        GROUP BY 1
    ),
    tru AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_true FROM f)
    SELECT f2_true,
           CAST(count(*) AS BIGINT) AS n_estimators,
           CAST(sum(s * s) AS BIGINT) AS sum_sq,
           CAST(sum(s * s) // count(*) AS BIGINT) AS f2_est,
           round(CAST(sum(s * s) // count(*) AS DOUBLE) / f2_true, 4)
               AS est_ratio
    FROM est CROSS JOIN tru
    GROUP BY f2_true
    """,
)
def q_sketch_ams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon–Matias–Szegedy) F₂ sketch: sixteen ±1-projection
    estimators of the second frequency moment of the per-user event
    counts, against the exact F₂ — the streaming join-size/self-join
    estimator, made fully deterministic by deriving each estimator's
    sign from bit i of the user's md5-prefix hash.

    Every S_i = Σ ±c_u and the mean of S_i² are exact BIGINTs (|S_i| ≤
    Σc = n, so S² ≤ n² — fine to ~3e9 rows), so the sketch itself
    value-hashes; only the est/true ratio is a rounded display float.
    Plan: one per-user count, a 16-row estimator spine broadcast onto
    it, two tiny aggregates — the sketch state is 16 integers no
    matter the key cardinality, which is the whole point.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.count("*").alias("c")).select(
        "c",
        F.expr(
            "cast(conv(substr(md5(cast(user_id as string)), 1, 15), 16, 10)"
            " as bigint)"
        ).alias("h"),
    )
    spine = spark.range(0, 16).select(F.col("id").alias("i"))
    est = (
        f.crossJoin(F.broadcast(spine))
        .groupBy("i")
        .agg(
            F.sum(
                (1 - 2 * F.expr("(h >> i) & 1")) * F.col("c")
            )
            .cast("long")
            .alias("s")
        )
    )
    tru = f.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_true"))
    j = est.crossJoin(F.broadcast(tru))
    return j.groupBy("f2_true").agg(
        F.count("*").alias("n_estimators"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("sum_sq"),
        F.expr("cast(sum(s * s) div count(*) as bigint)").alias("f2_est"),
        F.round(
            F.expr("cast(sum(s * s) div count(*) as double)")
            / F.col("f2_true"),
            4,
        ).alias("est_ratio"),
    )


@query(
    "q_sketch_bloom_algebra",
    oracle="""
    WITH pu AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    cu AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ),
    pb AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                        || '#' || k), 1, 15)) AS BIGINT)
                   % 65536 AS bit
        FROM pu CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
    ),
    cb AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                        || '#' || k), 1, 15)) AS BIGINT)
                   % 65536 AS bit
        FROM cu CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
    ),
    st AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM pb) AS x1,
               (SELECT CAST(count(*) AS BIGINT) FROM cb) AS x2,
               (SELECT CAST(count(*) AS BIGINT)
                FROM (SELECT bit FROM pb INTERSECT SELECT bit FROM cb))
                   AS xi,
               (SELECT CAST(count(*) AS BIGINT)
                FROM (SELECT bit FROM pb UNION SELECT bit FROM cb)) AS xu
    )
    SELECT x1 AS bits_a, x2 AS bits_b, xi AS bits_and, xu AS bits_or,
           round(-65536 / 3.0 * ln(1 - x1 / 65536.0), 2) AS est_a,
           round(-65536 / 3.0 * ln(1 - x2 / 65536.0), 2) AS est_b,
           round(-65536 / 3.0 * ln(1 - xu / 65536.0), 2) AS est_union,
           round(-65536 / 3.0 * ln(1 - x1 / 65536.0)
                 - 65536 / 3.0 * ln(1 - x2 / 65536.0)
                 + 65536 / 3.0 * ln(1 - xu / 65536.0), 2)
               AS est_intersection
    FROM st
    """,
)
def q_sketch_bloom_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter set algebra: the purchase-user and click-user
    Bloom bitmaps (the q_join_bloom_prune 65536/3 family) OR/AND'd
    together, with the swamidass–baldi cardinality estimates
    n̂ = −(m/k)·ln(1 − X/m) for each side, the union, and — by
    inclusion–exclusion on the estimates — the intersection.  The
    mergeability that makes Bloom filters a *distributive* sketch:
    bitmaps OR across partitions with no rescan.

    Every bit count is an exact integer (the bitmap is a distinct-set
    of positions, so OR = set union and AND = set intersect); the
    estimator is one identical log expression over those integers,
    rounded to 2.  Tiny keyed aggregates end-to-end.
    """
    ev = load_table(spark, sf_dir, "events")
    ks = spark.range(0, 3).select(F.col("id").alias("k"))

    def bits(event_type: str) -> DataFrame:
        users = (
            ev.where(F.col("event_type") == event_type)
            .select("user_id")
            .distinct()
        )
        return (
            users.crossJoin(F.broadcast(ks))
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

    pb = bits("purchase").cache()
    cb = bits("click").cache()
    x1 = pb.agg(F.count("*").cast("long").alias("bits_a"))
    x2 = cb.agg(F.count("*").cast("long").alias("bits_b"))
    xi = pb.join(cb, "bit", "left_semi").agg(
        F.count("*").cast("long").alias("bits_and")
    )
    xu = (
        pb.unionByName(cb)
        .distinct()
        .agg(F.count("*").cast("long").alias("bits_or"))
    )

    def est(col):
        return -65536 / 3.0 * F.log(1 - col / 65536.0)

    return (
        x1.crossJoin(x2)
        .crossJoin(xi)
        .crossJoin(xu)
        .select(
            "bits_a",
            "bits_b",
            "bits_and",
            "bits_or",
            F.round(est(F.col("bits_a")), 2).alias("est_a"),
            F.round(est(F.col("bits_b")), 2).alias("est_b"),
            F.round(est(F.col("bits_or")), 2).alias("est_union"),
            F.round(
                est(F.col("bits_a"))
                + est(F.col("bits_b"))
                - est(F.col("bits_or")),
                2,
            ).alias("est_intersection"),
        )
    )


@query(
    "q_sketch_hll_merge",
    oracle=f"""
    WITH h AS (
        SELECT event_type, date_trunc('week', ts) AS shard,
               {_duck_h("CAST(user_id AS VARCHAR)")} AS hv
        FROM events
    ),
    parts AS (
        SELECT DISTINCT event_type, shard,
               hv % {_HLL_M} AS bucket,
               hv // {_HLL_M} AS w
        FROM h
    ),
    rho_shard AS (
        SELECT event_type, shard, bucket,
               max(CASE WHEN w = 0 THEN 57
                        ELSE 57 - length(bin(w)) END) AS reg
        FROM parts GROUP BY 1, 2, 3
    ),
    rho_merged AS (
        SELECT event_type, bucket, max(reg) AS reg
        FROM rho_shard GROUP BY 1, 2
    ),
    rho_direct AS (
        SELECT event_type, bucket,
               max(CASE WHEN w = 0 THEN 57
                        ELSE 57 - length(bin(w)) END) AS reg
        FROM (SELECT DISTINCT event_type, bucket, w FROM parts)
        GROUP BY 1, 2
    ),
    s AS (
        SELECT m.event_type,
               sum((1::BIGINT) << (57 - m.reg))
                 + ({_HLL_M} - count(*)) * ((1::BIGINT) << 57) AS s_merged,
               {_HLL_M} - count(*) AS v_zero
        FROM rho_merged m GROUP BY 1
    ),
    sd AS (
        SELECT event_type,
               sum((1::BIGINT) << (57 - reg))
                 + ({_HLL_M} - count(*)) * ((1::BIGINT) << 57) AS s_direct
        FROM rho_direct GROUP BY 1
    ),
    est AS (
        SELECT s.event_type, s.v_zero, sd.s_direct, s.s_merged,
               (CAST(172.288 AS DOUBLE) * 144115188075855872) / s.s_merged
                   AS e_raw
        FROM s JOIN sd USING (event_type)
    ),
    fin AS (
        SELECT event_type, s_merged, s_direct,
               CASE WHEN e_raw <= 40 AND v_zero > 0
                    THEN 16e0 * ln(16e0 / v_zero)
                    ELSE e_raw END AS est
        FROM est
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
    )
    SELECT f.event_type,
           CAST(x.n_exact AS BIGINT)      AS n_exact,
           round(f.est, 4)                AS hll_merged,
           f.s_merged = f.s_direct        AS merged_equals_direct
    FROM fin f JOIN exact x ON f.event_type = x.event_type
    """,
)
def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-wise HLL with lossless register merge — the property that
    makes sketches work at 100 TB: each week's events build an
    independent 16-register HLL (what a thousand executors would emit
    per shard), the shards max-merge per bucket, and the merged
    register sum is PROVED equal to the direct whole-table sketch
    (`merged_equals_direct` — exact BIGINT register-sum comparison,
    not an estimate comparison).  Merge choice is shard-key-invariant:
    max is associative/commutative, so any partitioning gives the
    identical merged sketch.  Same deterministic md5 register pipeline
    as q_sketch_hll."""
    ev = load_table(spark, sf_dir, "events")
    hv = F.expr(_spark_h("cast(user_id as string)"))
    h = ev.select(
        "event_type",
        F.date_trunc("week", "ts").alias("shard"),
        hv.alias("hv"),
    )
    parts = h.select(
        "event_type",
        "shard",
        (F.col("hv") % _HLL_M).alias("bucket"),
        F.expr(f"hv div {_HLL_M}").alias("w"),
    ).distinct()
    rho = F.when(F.col("w") == 0, F.lit(57)).otherwise(
        F.lit(57) - F.length(F.bin("w"))
    )
    rho_shard = parts.groupBy("event_type", "shard", "bucket").agg(
        F.max(rho).alias("reg")
    )
    rho_merged = rho_shard.groupBy("event_type", "bucket").agg(
        F.max("reg").alias("reg")
    )
    rho_direct = (
        parts.select("event_type", "bucket", "w")
        .distinct()
        .groupBy("event_type", "bucket")
        .agg(F.max(rho).alias("reg"))
    )
    s_present = F.sum(F.expr("shiftleft(cast(1 as bigint), 57 - reg)"))
    pad = F.expr("shiftleft(cast(1 as bigint), 57)")
    s = rho_merged.groupBy("event_type").agg(
        (s_present + (F.lit(_HLL_M) - F.count("*")) * pad).alias("s_merged"),
        (F.lit(_HLL_M) - F.count("*")).alias("v_zero"),
    )
    sd = rho_direct.groupBy("event_type").agg(
        (s_present + (F.lit(_HLL_M) - F.count("*")) * pad).alias("s_direct")
    )
    est = s.join(sd, "event_type").select(
        "event_type",
        "v_zero",
        "s_merged",
        "s_direct",
        F.expr(
            "(cast(172.288 as double) * 144115188075855872) / s_merged"
        ).alias("e_raw"),
    )
    fin = est.select(
        "event_type",
        "s_merged",
        "s_direct",
        F.when(
            (F.col("e_raw") <= 40) & (F.col("v_zero") > 0),
            F.expr("16e0 * ln(16e0 / v_zero)"),
        )
        .otherwise(F.col("e_raw"))
        .alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return fin.join(exact, "event_type").select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round("est", 4).alias("hll_merged"),
        (F.col("s_merged") == F.col("s_direct")).alias(
            "merged_equals_direct"
        ),
    )


@query(
    "q_sketch_lc",
    oracle="""
    WITH b AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
             ::BIGINT % 1024) AS bucket
        FROM events
    ),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS occupied,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                FROM events) AS true_distinct
        FROM b
    )
    SELECT occupied, true_distinct,
           CAST(1024 - occupied AS BIGINT) AS empty_buckets,
           CASE WHEN occupied < 1024 THEN
               round(1024 * ln(1024e0 / (1024 - occupied)), 4) END
               AS lc_estimate
    FROM t
    """,
)
def q_sketch_lc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear Counting distinct-user estimate (Whang et al. 1990) on
    a 1024-bucket bitmap: n̂ = m·ln(m/z) with z = empty buckets —
    the small-cardinality sketch that beats HLL below ~m distinct
    (the regime HLL's own small-range correction falls back to LC
    for); completes the sketch family (HLL / KMV / CM / Bloom).

    Determinism: the bitmap is the engine's md5 bucket convention
    (identical in both engines); occupied/empty counts and the true
    distinct are exact BIGINTs, and the estimate is one shared
    ln expression on exact integers (ln parity precedent),
    NULL-guarded at saturation (z = 0 → LC undefined, use HLL).

    Scale: a 1024-value DISTINCT collapses map-side; the bitmap
    merge across executors is a trivial set union — the same
    shard-merge shape proven for HLL."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.expr(
            "pmod(cast(conv(substr(md5(cast(cast(user_id as string)"
            " as binary)), 1, 15), 16, 10) as bigint), 1024)"
        ).alias("bucket")
    ).distinct()
    t = b.agg(F.count("*").cast("long").alias("occupied")).crossJoin(
        F.broadcast(
            ev.agg(
                F.countDistinct("user_id")
                .cast("long")
                .alias("true_distinct")
            )
        )
    )
    return t.select(
        "occupied",
        "true_distinct",
        (F.lit(1024) - F.col("occupied")).cast("long").alias(
            "empty_buckets"
        ),
        F.when(
            F.col("occupied") < 1024,
            F.round(
                F.lit(1024)
                * F.log(
                    F.lit(1024.0) / (F.lit(1024) - F.col("occupied"))
                ),
                4,
            ),
        ).alias("lc_estimate"),
    )
