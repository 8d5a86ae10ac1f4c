"""Deterministic sampling and dataset splitting — training-pipeline
staples (north-star N).

Production corpora are sampled and split by *content- or key-hash*,
never by ``rand()``: the assignment must be reproducible across runs,
engines, and re-shards, and joining two tables sampled the same way
must keep matching rows together.  Both operators here hash with the
md5-derived integer used across the engine (identical in Spark and
DuckDB), so the oracle checks the exact membership, not just counts of
a statistical sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.plans.prefix import bucketed_running_sum
from events_to_db_spark.plans.checkpoints import truncate_lineage
from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table

_SPARK_BUCKET = (
    "pmod(cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15),"
    " 16, 10) as bigint), 10)"
)
_DUCK_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10)"


@query(
    "q_sample_hash",
    oracle=f"""
    SELECT lang, count(*) AS n, count(DISTINCT source) AS n_sources
    FROM documents
    WHERE {_DUCK_BUCKET} = 0
    GROUP BY lang
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10 % sample by key hash (bucket 0 of 10): stable
    across runs and engines, filter pushes to the scan, and any other
    table sampled with the same key stays aligned."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.expr(_SPARK_BUCKET) == 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.countDistinct("source").alias("n_sources"))
    )


@query(
    "q_split_train_test",
    oracle=f"""
    SELECT lang,
           CASE WHEN {_DUCK_BUCKET} < 8 THEN 'train'
                WHEN {_DUCK_BUCKET} = 8 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by key hash — reproducible,
    leakage-free (a doc_id lands in the same split everywhere), and
    computable without a shuffle or a stored assignment table."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_BUCKET)
    return d.select(
        "lang",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    ).groupBy("lang", "split").agg(F.count("*").alias("n"))


_SHINGLES = (
    "array_distinct(transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 4),"
    " (x, i) -> concat_ws(' ', x, split(text, ' ')[i + 1], split(text, ' ')[i + 2],"
    " split(text, ' ')[i + 3], split(text, ' ')[i + 4])))"
)

_DUCK_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(string_split(text,' ')) - 4),"
    " i -> concat_ws(' ', string_split(text,' ')[i], string_split(text,' ')[i+1],"
    " string_split(text,' ')[i+2], string_split(text,' ')[i+3],"
    " string_split(text,' ')[i+4])))"
)


@query(
    "q_contamination",
    oracle=f"""
    WITH labeled AS (
        SELECT doc_id, lang, {_DUCK_SHINGLES} AS sh,
               CASE WHEN {_DUCK_BUCKET} < 8 THEN 'train'
                    WHEN {_DUCK_BUCKET} = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    train_sh AS (
        SELECT DISTINCT t.s AS s FROM labeled, unnest(sh) AS t(s)
        WHERE split = 'train'
    ),
    test_docs AS (SELECT doc_id, lang, sh FROM labeled WHERE split = 'test'),
    hits AS (
        SELECT DISTINCT d.doc_id
        FROM test_docs d, unnest(d.sh) AS t(s)
        JOIN train_sh ON train_sh.s = t.s
    )
    SELECT lang,
           count(*) AS n_test,
           count(h.doc_id) AS n_contaminated
    FROM test_docs LEFT JOIN hits h USING (doc_id)
    GROUP BY lang
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test contamination check: test-split docs sharing any
    5-token shingle with the train split — the eval-integrity gate
    every pretraining pipeline runs after splitting.

    Plan: shingle arrays built row-side, train shingles deduplicated
    once, test shingles explode → semi-join on the shingle key →
    distinct contaminated doc set → per-lang counts.  One shuffle on
    the shingle hash; the train side is the dedup'd shingle vocabulary,
    not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_BUCKET)
    # Bind the token array ONCE per row before shingling: Catalyst does
    # not common-subexpression-eliminate `split(text)` inside a lambda,
    # so inlining it re-tokenizes the doc per shingle per reference
    # (measured 15.6 s -> ~1 s at sf0.1).  Shingles hash to int64 for
    # the joins — membership is what matters, not the string (the
    # oracle keeps string shingles; a cross-set 64-bit collision would
    # need ~1e-13 luck to flip a membership bit).
    toked = d.select(
        "doc_id",
        "lang",
        F.split("text", " ").alias("toks"),
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
    labeled = toked.select(
        "doc_id",
        "lang",
        "split",
        F.expr(
            "array_distinct(transform(slice(toks, 1, greatest(size(toks) - 4, 0)),"
            " (x, i) -> xxhash64(concat_ws(' ', x, toks[i + 1],"
            " toks[i + 2], toks[i + 3], toks[i + 4]))))"
        ).alias("sh"),
    )
    # Materialize the exploded shingle table once (it feeds both the
    # train vocabulary and the test probe; without this the scan +
    # shingle build runs per consumer — measured 3x).  localCheckpoint
    # stores blocks on executors WITHOUT lineage: losing an executor
    # aborts the query (availability, not correctness).  For cluster
    # deployments where that matters, swap for persist(MEMORY_AND_DISK_2)
    # or a reliable checkpoint; the table is (doc_id, split, int64) —
    # tiny relative to the corpus either way.
    sh_tbl = labeled.select(
        "doc_id", "split", F.explode("sh").alias("s")
    ).transform(truncate_lineage)
    train_sh = (
        sh_tbl.filter(F.col("split") == "train").select("s").distinct()
    )
    test_docs = toked.filter(F.col("split") == "test").select(
        "doc_id", "lang"
    )
    hits = (
        sh_tbl.filter(F.col("split") == "test")
        .select("doc_id", "s")
        .join(train_sh, "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        test_docs.join(hits, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_test"),
            F.count("hit").alias("n_contaminated"),
        )
    )


_SPARK_PCT = (
    "pmod(cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15),"
    " 16, 10) as bigint), 100)"
)
_DUCK_PCT = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100)"


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN {_DUCK_PCT} <
                    CASE WHEN lang = 'en' THEN 10 ELSE 50 END
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents
    GROUP BY lang
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash sampling: rebalance a corpus by keeping 10 % of
    the dominant language and 50 % of everything else — the
    class-rebalancing step of a training-data pipeline, but
    reproducible (content-hash membership, not ``rand()``), so the
    oracle checks the exact kept set per stratum.  The per-stratum
    rate is a CASE over the same hash bucket, so the whole query stays
    one scan + one aggregate with the filter evaluable at the scan."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 10).otherwise(50)
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(
            F.when(F.expr(_SPARK_PCT) < rate, 1).otherwise(0)
        ).alias("n_kept"),
    )


_SPARK_FOLD = (
    "pmod(cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15),"
    " 16, 10) as bigint), 5)"
)
_DUCK_FOLD = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5)"


@query(
    "q_split_kfold",
    oracle=f"""
    SELECT {_DUCK_FOLD} AS fold,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation assignment by key hash: every engine and
    every rerun places each doc_id in the same fold, so fold-held-out
    training jobs are reproducible and joinable.  The per-fold profile
    (count, language coverage, char mass) is what a pipeline audits
    before trusting the folds are balanced.  One hash aggregate; the
    fold expression composes with any downstream filter pushdown."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.expr(_SPARK_FOLD).alias("fold"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("fold")
    )


@query(
    "q_sample_topk_hash",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 100
    """,
)
def q_sample_topk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE uniform sample (k=100) by hash priority: order by
    md5(key) and take k.  Unlike a fixed-RATE bucket filter
    (q_sample_hash), this yields exactly k rows at any corpus size,
    stays reproducible across engines/runs, and needs no count-first
    pass.  Spark executes it as TakeOrderedAndProject — per-partition
    k-heaps, no global sort — the only scalable exact-top-k shape.
    md5 hex compares identically as text in both engines (lowercase
    hex, fixed 32 chars)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            F.md5(F.col("doc_id").cast("string")).alias("_pri"),
        )
        .orderBy("_pri", "doc_id")
        .limit(100)
        .drop("_pri")
    )


@query(
    "q_sample_weighted",
    oracle="""
    WITH s AS (
        SELECT event_id, event_type, value,
               -- deterministic uniform in (0, 1]: 60 md5 bits
               (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                    ::BIGINT + 1)
                   / CAST(1152921504606846976 AS DOUBLE) AS u
        FROM events
    ),
    k AS (
        SELECT event_id, event_type, value,
               ln(u) / (value + 1.0) AS score
        FROM s
    )
    SELECT event_id, event_type,
           round(value, 2) AS w,
           round(score * 1000000, 6) AS score_ppm
    FROM k
    ORDER BY score DESC, event_id
    LIMIT 100
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row draws a DETERMINISTIC uniform u from its own md5 (no RNG —
    reproducible across engines, runs, and cluster sizes) and is ranked
    by ``ln(u)/w``; the global top-k is a weighted sample without
    replacement with inclusion probability proportional to w.  This is
    the training-data-mixing primitive: up/down-weighting sources while
    keeping the sample a pure function of the data.  Ties broken by
    event_id; the score is emitted ×1e6 rounded (its raw magnitude is
    ~1e-3 — scaling keeps 6-decimal rounding meaningful).

    Plan: per-row expression work + ``TakeOrderedAndProject`` (per-
    partition top-k, then a k-row merge on the driver) — no global
    sort, no shuffle of the full table, the same plan at any scale.
    The 1-ulp libm-vs-JVM ``ln`` difference is far below the ~1e-5
    score gap at the k-th boundary, so the selected set is stable
    cross-engine (and the rounded outputs collapse any residual ulp).
    """
    ev = load_table(spark, sf_dir, "events")
    u = (
        (
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
                   16, 10).cast("bigint")
            + 1
        )
        / F.lit(float(1 << 60))
    )
    k = ev.select(
        "event_id",
        "event_type",
        "value",
        (F.log(u) / (F.col("value") + 1.0)).alias("score"),
    )
    return (
        k.orderBy(F.col("score").desc(), "event_id")
        .limit(100)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("w"),
            F.round(F.col("score") * 1_000_000, 6).alias("score_ppm"),
        )
    )


@query(
    "q_sample_systematic",
    oracle="""
    WITH r AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS vc,
               row_number() OVER (ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(vc) AS BIGINT) AS sum_cents,
           CAST(min(rn) AS BIGINT) AS first_rank,
           CAST(max(rn) AS BIGINT) AS last_rank,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM r WHERE rn % 97 = 3
    """,
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every k-th) sampling: rank the stream in event
    order and keep rank ≡ 3 (mod 97) — the design-based sampling
    scheme that guarantees even temporal coverage where Bernoulli/hash
    sampling only achieves it in expectation (and the right choice
    when the estimand is a time integral).

    The global rank comes from the two-level bucketed prefix scan
    (day buckets ascend with the (ts, event_id) order — no
    single-partition window); the selection predicate and every audit
    column are exact integers.  k = 97 (prime) avoids aliasing with
    any daily/hourly periodicity in the stream.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
        "ts",
        "event_id",
    )
    ranked = bucketed_running_sum(
        base,
        F.expr("cast(unix_date(cast(ts as date)) as long)"),
        [F.col("ts"), F.col("event_id")],
        {"rn": F.lit(1)},
    )
    sampled = ranked.where(F.col("rn") % 97 == 3)
    return sampled.agg(
        F.count("*").alias("n_sampled"),
        F.sum("vc").cast("long").alias("sum_cents"),
        F.min("rn").cast("long").alias("first_rank"),
        F.max("rn").cast("long").alias("last_rank"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


#: Neyman total budget and the md5-hash-order pick expressions (the
#: deterministic "random order" convention of this module, over
#: c_custkey).
_NEYMAN_N = 1000
_SPARK_CHASH = (
    "cast(conv(substr(md5(cast(cast(c_custkey as string) as binary)), 1, 15),"
    " 16, 10) as bigint)"
)
_DUCK_CHASH = "('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT"


@query(
    "q_sample_neyman",
    oracle=f"""
    WITH cents AS (
        SELECT c_mktsegment, c_custkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
    ),
    strata AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(bal_c) AS BIGINT) AS sc,
               CAST(sum(bal_c * bal_c) AS BIGINT) AS ssc
        FROM cents GROUP BY 1
    ),
    weighted AS (
        SELECT c_mktsegment, n_h,
               CAST(floor(sqrt(greatest(
                        CAST(ssc AS DOUBLE) / n_h
                        - (CAST(sc AS DOUBLE) / n_h)
                          * (CAST(sc AS DOUBLE) / n_h), 0)))
                    AS BIGINT) AS sd_cents
        FROM strata
    ),
    alloc AS (
        SELECT c_mktsegment, n_h, sd_cents,
               CAST({_NEYMAN_N} * (n_h * sd_cents)
                    // (SELECT sum(n_h * sd_cents) FROM weighted)
                    AS BIGINT) AS n_alloc
        FROM weighted
    ),
    picked AS (
        SELECT c.c_mktsegment, c.bal_c,
               row_number() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY {_DUCK_CHASH}, c.c_custkey)
                   AS rk
        FROM cents c
    )
    SELECT a.c_mktsegment, a.n_h, a.sd_cents, a.n_alloc,
           CAST(count(p.rk) AS BIGINT) AS n_sampled,
           CAST(coalesce(sum(p.bal_c), 0) AS BIGINT) AS sample_bal_cents
    FROM alloc a
    LEFT JOIN picked p
      ON p.c_mktsegment = a.c_mktsegment AND p.rk <= a.n_alloc
    GROUP BY 1, 2, 3, 4
    """,
)
def q_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling: a budget of {n} customers
    is split across market segments proportionally to N_h·σ_h (the
    variance-optimal allocation for estimating mean account balance),
    then each stratum's sample is drawn deterministically in
    md5-hash order — the survey-statistics sampler a metrics pipeline
    uses when strata differ in spread, reproducible end to end.

    Determinism: balances are exact cents, so Σx and Σx² are exact
    BIGINTs; σ̂² = Σx²/N − (Σx/N)² applies the identical IEEE
    division/multiply/subtract sequence to identical exact inputs in
    both engines (the N·Σx² form overflows BIGINT past ~40k rows ×
    1e6-cent balances — caught by the m100 scaling tier, PERF.md r6),
    and σ̂ = floor(sqrt(max(·,0))) is one correctly-rounded sqrt; the
    allocation is integer floor-division on exact
    weights (floor allocation — the ≤4-seat remainder is deliberately
    left unassigned, documented spec); membership is the module's
    md5-hash-order convention, so the sampled set (and its exact-cents
    balance sum) hash-matches.  Plan: two keyed aggregates + one
    partitioned rank — one scan of customer each, no global window.
    """.format(n=_NEYMAN_N)
    c = load_table(spark, sf_dir, "customer")
    cents = c.select(
        "c_mktsegment",
        "c_custkey",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("bal_c"),
    )
    strata = cents.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_h"),
        F.sum("bal_c").alias("sc"),
        F.sum(F.col("bal_c") * F.col("bal_c")).alias("ssc"),
    )
    weighted = strata.select(
        "c_mktsegment",
        "n_h",
        F.expr(
            "CAST(floor(sqrt(greatest("
            "CAST(ssc AS DOUBLE) / n_h"
            " - (CAST(sc AS DOUBLE) / n_h) * (CAST(sc AS DOUBLE) / n_h),"
            " 0))) AS BIGINT)"
        ).alias("sd_cents"),
    )
    total_w = weighted.agg(
        F.sum(F.col("n_h") * F.col("sd_cents")).alias("tw")
    )
    alloc = weighted.crossJoin(F.broadcast(total_w)).select(
        "c_mktsegment",
        "n_h",
        "sd_cents",
        F.expr(f"CAST({_NEYMAN_N} * (n_h * sd_cents) div tw AS BIGINT)").alias(
            "n_alloc"
        ),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.expr(_SPARK_CHASH), "c_custkey"
    )
    picked = cents.select(
        "c_mktsegment", "bal_c", F.row_number().over(w).alias("rk")
    )
    return (
        alloc.join(
            picked,
            (picked.c_mktsegment == alloc.c_mktsegment)
            & (picked.rk <= alloc.n_alloc),
            "left",
        )
        .groupBy(alloc.c_mktsegment, "n_h", "sd_cents", "n_alloc")
        .agg(
            F.count("rk").cast("long").alias("n_sampled"),
            F.coalesce(F.sum("bal_c"), F.lit(0))
            .cast("long")
            .alias("sample_bal_cents"),
        )
    )


_BAL_CAP = 60
#: Per-doc draw key for the balanced cap: the standard md5 60-bit
#: integer (identical in both engines), doc_id tie-break for a unique
#: total order inside each language.
_BAL_KEY_SPARK = (
    "cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15),"
    " 16, 10) as bigint)"
)
_BAL_KEY_DUCK = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"
)


@query(
    "q_sample_balance",
    oracle=f"""
    WITH keyed AS (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_BAL_KEY_DUCK}, doc_id) AS rk
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rk <= {_BAL_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rk <= {_BAL_CAP} THEN doc_id ELSE 0 END)
                AS BIGINT) AS kept_id_sum
    FROM keyed GROUP BY lang ORDER BY lang
    """,
)
def q_sample_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling — cap every language at
    {cap} documents, chosen by deterministic md5-hash order (the
    pipeline move that stops one dominant language from swamping a
    multilingual training mix; the testdata's 'en' is ~3× any other
    class, so the cap genuinely bites on it at every SF while small
    classes pass through intact).

    Determinism: the draw is the md5 60-bit key with a doc_id
    tie-break (a unique total order — never a float RNG), so the kept
    SET is identical in both engines; kept_id_sum (exact BIGINT sum of
    kept doc_ids) value-checks the set itself, not just its size.

    Scale shape: the rank window is partitioned BY CLASS (languages
    are few and bounded — this is the allowlisted bounded-partition
    case, not a global window); one scan, one shuffle on lang.""".format(
        cap=_BAL_CAP
    )
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.expr(_BAL_KEY_SPARK), F.col("doc_id")
    )
    keyed = d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
    return (
        keyed.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("rk") <= _BAL_CAP, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(
                F.when(F.col("rk") <= _BAL_CAP, F.col("doc_id")).otherwise(0)
            )
            .cast("long")
            .alias("kept_id_sum"),
        )
        .orderBy("lang")
    )


_SPARK_EV_PCT = (
    "pmod(cast(conv(substr(md5(cast(cast(event_id as string) as binary)),"
    " 1, 15), 16, 10) as bigint), 100)"
)
_DUCK_EV_PCT = (
    "(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 100)"
)

#: Per-type inclusion percentages for the unequal-probability design —
#: chosen so every Horvitz–Thompson weight 100/rate is an INTEGER
#: (purchase 100% → w=1, click 20% → w=5, view 10% → w=10, else 50%
#: → w=2): the HT estimator then never leaves BIGINT space.
_HT_RATE = (
    "CASE WHEN event_type = 'purchase' THEN 100"
    " WHEN event_type = 'click' THEN 20"
    " WHEN event_type = 'view' THEN 10 ELSE 50 END"
)


@query(
    "q_sample_horvitz",
    oracle=f"""
    WITH s AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS vc,
               {_DUCK_EV_PCT} AS pct,
               {_HT_RATE} AS rate
        FROM events
    ),
    agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_true,
               CAST(sum(vc) AS BIGINT) AS rev_true,
               CAST(sum(CASE WHEN pct < rate THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sampled,
               CAST(sum(CASE WHEN pct < rate THEN 100 // rate
                        ELSE 0 END) AS BIGINT) AS ht_count,
               CAST(sum(CASE WHEN pct < rate THEN (100 // rate) * vc
                        ELSE 0 END) AS BIGINT) AS ht_rev
        FROM s GROUP BY event_type
    )
    SELECT event_type, n_true, rev_true, n_sampled, ht_count, ht_rev,
           CASE WHEN n_true > 0 THEN
               CAST(10000 * abs(ht_count - n_true) // n_true AS BIGINT)
           END AS count_err_bp
    FROM agg ORDER BY event_type
    """,
)
def q_sample_horvitz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz–Thompson estimation under a deterministic
    unequal-probability design — the survey-sampling complement to
    q_sample_neyman's allocation: heavy event types are thinned hard
    (views at 10%, clicks at 20%), purchases kept whole, and the HT
    weights 1/πᵢ reinflate the sample to unbiased population totals.
    This is the read-10%-pay-10% pattern a 100 TB profiling job uses.

    Determinism: membership is the event_id md5-percent bucket (the
    module's draw convention — no RNG, identical in both engines);
    the rates are chosen so every weight 100/rate is an INTEGER, so
    both HT estimates (count and revenue cents) are exact BIGINT sums
    — the estimator never leaves integer space, and the reported
    basis-point count error is a floor division.

    Scale shape: one scan, one keyed hash aggregate — the sample is
    never materialized, the weights fold into the same pass."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
        F.expr(_SPARK_EV_PCT).alias("pct"),
        F.expr(_HT_RATE).alias("rate"),
    )
    samp = F.col("pct") < F.col("rate")
    w = F.expr("100 div rate")
    agg = s.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_true"),
        F.sum("vc").cast("long").alias("rev_true"),
        F.sum(F.when(samp, 1).otherwise(0)).cast("long").alias("n_sampled"),
        F.sum(F.when(samp, w).otherwise(0)).cast("long").alias("ht_count"),
        F.sum(F.when(samp, w * F.col("vc")).otherwise(0))
        .cast("long")
        .alias("ht_rev"),
    )
    return agg.select(
        "event_type",
        "n_true",
        "rev_true",
        "n_sampled",
        "ht_count",
        "ht_rev",
        F.when(
            F.col("n_true") > 0,
            F.expr("CAST(10000 * abs(ht_count - n_true) div n_true"
                   " AS BIGINT)"),
        ).alias("count_err_bp"),
    ).orderBy("event_type")


@query(
    "q_sample_kish",
    oracle="""
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS w
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(w) AS BIGINT) AS sw,
               CAST(sum(w * w) AS BIGINT) AS sw2
        FROM u
    )
    SELECT n AS n_users, sw AS sum_w, sw2 AS sum_w2,
           round(CAST(n AS DOUBLE) * sw2 / (CAST(sw AS DOUBLE) * sw),
                 4) AS kish_deff,
           round(CAST(sw AS DOUBLE) * sw / sw2, 2) AS n_effective
    FROM m
    """,
)
def q_sample_kish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish design effect for the activity-weighted user sample:
    deff = n·Σw²/(Σw)² with w = per-user event count — how much a
    weighted estimate's variance inflates versus equal weighting, and
    its companion n_eff = (Σw)²/Σw² (the survey-sampling number that
    tells a curation pipeline how many EFFECTIVE users its
    activity-weighted statistics really rest on).

    Exactness: n, Σw, Σw² are exact BIGINTs from one keyed aggregate;
    both outputs are single shared DOUBLE expressions (the squared
    sums are quadratic-in-corpus — overflow rule)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("w"))
    m = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sw2"),
    )
    return m.select(
        F.col("n").alias("n_users"),
        F.col("sw").alias("sum_w"),
        F.col("sw2").alias("sum_w2"),
        F.round(
            F.col("n").cast("double")
            * F.col("sw2")
            / (F.col("sw").cast("double") * F.col("sw")),
            4,
        ).alias("kish_deff"),
        F.round(
            F.col("sw").cast("double") * F.col("sw") / F.col("sw2"), 2
        ).alias("n_effective"),
    )
