"""LLM-data-pipeline operators — SURVEY.md §2.10 (north-star N).

Text analysis (word/bigram counts, tf-idf, language stats), exact and
near deduplication, embedding similarity (kNN / threshold pairs /
nearest-centroid), and a multimodal text⋈vector join — the operator
families a large-scale training-data pipeline needs, expressed over the
driver's ``documents`` and ``embeddings`` tables.

Scale design (100 TB posture, SURVEY.md §7.4):

* All text ops are explode→groupBy pipelines — one shuffle on the term
  key, map-side partial aggregation, no driver materialization.
* Near-dup runs inside ``(lang, source)`` blocks so the self-join is
  per-block quadratic, never global; the global-scale path (MinHash
  LSH banding, SimHash) lives in ``pipeline_ops.py``.
* Similarity kernels broadcast the small reference matrix and stream
  the big side through NumPy matmuls (``functions/kernels.py``) —
  27 s → sub-second vs higher-order functions at 2 k vectors
  (BASELINE.md B10), and linear in the big side on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.functions import kernels
from events_to_db_spark.plans.checkpoints import truncate_lineage
from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@query(
    "q_text_wordcount",
    oracle="""
    SELECT t.term AS term, count(*) AS n
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    GROUP BY 1
    ORDER BY n DESC, term
    LIMIT 20
    """,
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 terms by count (tie-break term asc) — the canonical
    explode→groupBy shape (BASELINE.md B11)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(20)
    )


@query(
    "q_text_langstats",
    oracle="""
    SELECT lang,
           count(*)                   AS n_docs,
           round(avg(n_chars), 4)     AS avg_chars,
           count(DISTINCT source)     AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q_text_langstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats: doc count, mean length, source spread."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "q_text_tfidf",
    oracle="""
    WITH en AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
    toks AS (
        SELECT doc_id, t.term AS term
        FROM en, unnest(string_split(text, ' ')) AS t(term)
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    idf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM en),
    scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * ln(CAST(n.n_docs AS DOUBLE) / idf.df) AS tfidf,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / idf.df) DESC,
                            tf.term
               ) AS rn
        FROM tf JOIN idf USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, round(tfidf, 4) AS tfidf
    FROM scored WHERE rn = 1
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-1 term by tf-idf over the English subset
    (tf = in-doc count, idf = ln(N/df), tie-break term asc).

    Plan shape: explode once, two hash aggregations (tf, df), broadcast
    the tiny df/N sides back onto tf, one window for the per-doc argmax
    — no cross join of the corpus with itself."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    idf = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "term", F.round("tfidf", 4).alias("tfidf"))
    )


@query(
    "q_text_ngram",
    oracle="""
    WITH en AS (
        SELECT string_split(text, ' ') AS toks
        FROM documents WHERE lang = 'en'
    ),
    b AS (
        SELECT concat(toks[i], ' ', toks[i + 1]) AS bigram
        FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM en)
    )
    SELECT bigram, count(*) AS n
    FROM b GROUP BY 1
    ORDER BY n DESC, bigram
    LIMIT 10
    """,
)
def q_text_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 space-token bigrams in English docs.  Bigrams are built
    array-side (indexed ``transform`` — 0-based subscripts) so each doc
    is one row until the single explode."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        d.select(F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " (x, i) -> concat(x, ' ', toks[i + 1]))"
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------

@query(
    "q_dedup_exact",
    oracle="""
    SELECT count(*)                                        AS n_docs,
           count(DISTINCT md5(text))                       AS n_hashes,
           count(*) - count(DISTINCT md5(text))            AS n_dup_docs
    FROM documents
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate detection by content hash: total docs, distinct
    hashes, and docs that would be dropped.  One hash-aggregate pass —
    the shape that holds at any scale (hash first, never compare raw
    text)."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_hashes"),
        (
            F.count("*") - F.countDistinct(F.md5(F.col("text").cast("binary")))
        ).alias("n_dup_docs"),
    )


def _dedup_ppr_max() -> float:
    """Escalation threshold for the blocked Jaccard family: average
    in-block candidate pairs per row (Σ block²/2N) above which the
    banded-MinHash engine does strictly less work than the quadratic
    in-block join (measured crossover ≈ 80 pairs/row, PERF.md round
    4 — the r3 max-block-rows gate sat ~500× above the true crossover
    once the NumPy signature kernel landed).
    ``SPARK_GRAFT_DEDUP_PPR_MAX`` overrides so tests can force either
    path."""
    from events_to_db_spark.plans.gates import pairs_per_row_gate

    return pairs_per_row_gate("SPARK_GRAFT_DEDUP_PPR_MAX")


#: Driver union-find gate for q_dedup_cluster (r11 opt): at or under
#: this many near-dup pairs the components are computed by one bounded
#: edge collect + union-find (16 B/row → ≤ ~32 MB at the default)
#: instead of the distributed min-label rounds; 0 forces the
#: distributed loop (tests / reliable-checkpoint mode).
CLUSTER_DRIVER_MAX_PAIRS = 2_000_000


def _cluster_driver_max_pairs() -> int:
    import os

    return int(
        os.environ.get(
            "SPARK_GRAFT_CLUSTER_DRIVER_MAX_PAIRS",
            str(CLUSTER_DRIVER_MAX_PAIRS),
        )
    )


@query(
    "q_dedup_near",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, source,
               list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jac
    FROM t a JOIN t b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
    """,
)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by token-set Jaccard ≥ 0.8 inside
    ``(lang, source)`` blocks.

    Adaptive plan (VERDICT r02 #1, gate recalibrated r4): a cheap
    per-block count probe compares the two strategies' TOTAL work.
    While the quadratic path's average candidate pairs per row
    (Σ block²/2N) stays under the measured band-engine cost ratio
    (``_dedup_ppr_max()`` ≈ 80), the blocked self-join runs as an
    equi-join on the block key (shuffle on the key, quadratic only
    within a block).  Above it, candidates come from the shared
    MinHash-LSH band engine (``pipeline_ops.minhash_candidate_pairs``
    with the block cols folded into the band join key) — linear in
    corpus size — so no (lang, source) hot block can re-introduce the
    all-pairs blowup.  Both paths end in the same exact-Jaccard verify,
    and banding is effectively lossless at 0.8 (P(miss) ≈ 6e-15), so
    the result — and the brute-force oracle — are identical either way
    (tests/test_dedup_escalate.py forces the threshold low and proves
    it)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    return near_dup_pairs(d)


#: Dedup operating-curve thresholds as exact rationals (num, den):
#: jac >= num/den  ⇔  den·|∩| >= num·|∪| — integer comparisons, no
#: float threshold can sit ambiguously on a ratio of small ints.
_CURVE_TAUS = (("0.5", 1, 2), ("0.7", 7, 10), ("0.8", 4, 5), ("0.9", 9, 10))


@query(
    "q_dedup_curve",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, source,
               list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ),
    p AS (
        SELECT b.doc_id AS doc_b,
               len(list_intersect(a.toks, b.toks)) AS i,
               len(list_distinct(list_concat(a.toks, b.toks))) AS u
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    ),
    agg AS (
        SELECT
          CAST(sum(CASE WHEN 2 * i >= u THEN 1 ELSE 0 END) AS BIGINT) AS p50,
          CAST(count(DISTINCT CASE WHEN 2 * i >= u THEN doc_b END) AS BIGINT) AS d50,
          CAST(sum(CASE WHEN 10 * i >= 7 * u THEN 1 ELSE 0 END) AS BIGINT) AS p70,
          CAST(count(DISTINCT CASE WHEN 10 * i >= 7 * u THEN doc_b END) AS BIGINT) AS d70,
          CAST(sum(CASE WHEN 5 * i >= 4 * u THEN 1 ELSE 0 END) AS BIGINT) AS p80,
          CAST(count(DISTINCT CASE WHEN 5 * i >= 4 * u THEN doc_b END) AS BIGINT) AS d80,
          CAST(sum(CASE WHEN 10 * i >= 9 * u THEN 1 ELSE 0 END) AS BIGINT) AS p90,
          CAST(count(DISTINCT CASE WHEN 10 * i >= 9 * u THEN doc_b END) AS BIGINT) AS d90
        FROM p
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT tau, n_pairs, n_dropped,
           CAST((n_docs - n_dropped) * 10000 // n_docs AS BIGINT)
               AS survive_bps
    FROM (
        SELECT '0.5' AS tau, p50 AS n_pairs, d50 AS n_dropped FROM agg
        UNION ALL SELECT '0.7', p70, d70 FROM agg
        UNION ALL SELECT '0.8', p80, d80 FROM agg
        UNION ALL SELECT '0.9', p90, d90 FROM agg
    ) CROSS JOIN n
    ORDER BY tau
    """,
)
def q_dedup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup OPERATING CURVE: near-dup pair count, documents that
    a keep-lowest-id policy would drop, and corpus survival rate at
    four Jaccard thresholds (0.5/0.7/0.8/0.9) — the table a pipeline
    owner reads BEFORE choosing the dedup threshold (how much corpus
    does 0.8 cost vs 0.9?), here over the same (lang, source) blocks
    as ``q_dedup_near``.

    Determinism: every threshold comparison is the exact rational form
    den·|∩| ≥ num·|∪| (integer cross-multiplication — a float ratio of
    small ints can sit exactly ON a threshold and round differently
    across engines); survival is floor-division basis points.  One
    blocked pair join feeds ALL four thresholds (conditional counts in
    one hash aggregate — the suite costs one scan like expectations).
    Scale: the quadratic is WORK-GATED (the r6 cluster lesson: no
    private ungated quadratic) — above ``SPARK_GRAFT_CURVE_MAX_PAIRS``
    in-block pairs the query refuses loudly and the caller reruns
    :func:`dedup_curve` on a deterministic 1/k hash-sample of blocks
    (the curve is a pre-flight DIAGNOSTIC, so a block sample is the
    honest 100 TB protocol; the τ ≥ 0.8 production dedup itself rides
    the gated band engine, which a curve must NOT use at τ = 0.5 —
    banding calibrated for 0.8 is lossy below it)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    return dedup_curve(d)


def dedup_curve(d: DataFrame, sample_mod: int | None = None) -> DataFrame:
    """The dedup operating curve on a (doc_id, lang, source, toks)
    frame; see :func:`q_dedup_curve`.  ``sample_mod=k`` restricts to
    the deterministic 1/k hash-sample of (lang, source) blocks (md5-h15
    bucket — the sampling.py convention, reproducible and restatable
    in an oracle); counts are then the curve OF THE SAMPLE, not scaled
    estimates — the caller owns the extrapolation."""
    import os

    if sample_mod is not None:
        from events_to_db_spark.functions.tags import _h15

        d = d.filter(
            _h15(F.concat_ws("|", "lang", "source")) % sample_mod == 0
        )
    # work gate (r6 cluster lesson): refuse an unbounded quadratic
    blocks = d.groupBy("lang", "source").agg(F.count("*").alias("n"))
    pair_work = blocks.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("w")
    ).collect()[0]["w"] or 0
    budget = float(os.environ.get("SPARK_GRAFT_CURVE_MAX_PAIRS", "1e9"))
    if pair_work > budget:
        raise ValueError(
            f"dedup_curve: {pair_work:.3g} in-block pairs exceed the "
            f"work budget {budget:.3g} (SPARK_GRAFT_CURVE_MAX_PAIRS) — "
            "rerun on a block sample: dedup_curve(d, sample_mod=k)"
        )
    a = d.select(
        F.col("doc_id").alias("doc_a"), "lang", "source",
        F.col("toks").alias("toks_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), "lang", "source",
        F.col("toks").alias("toks_b"),
    )
    # |∪| DERIVED from sizes (r11 opt, mirroring near_dup_pairs): toks
    # are array_distinct'd, so |A∪B| = |A|+|B|−|A∩B| exactly —
    # array_intersect is the one per-pair array op (the old form ran
    # array_union per pair for a number already in hand).  Identical
    # integers → identical threshold decisions.
    pairs = (
        a.join(b, ["lang", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_b",
            F.size(F.array_intersect("toks_a", "toks_b")).alias("i"),
            (F.size("toks_a") + F.size("toks_b")).alias("_s"),
        )
        .select("doc_b", "i", (F.col("_s") - F.col("i")).alias("u"))
    )
    aggs = []
    for label, num, den in _CURVE_TAUS:
        cond = F.col("i") * den >= F.col("u") * num
        key = label.replace(".", "")
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"p{key}"))
        aggs.append(
            F.countDistinct(F.when(cond, F.col("doc_b"))).cast("long").alias(f"d{key}")
        )
    one = pairs.agg(*aggs).crossJoin(
        F.broadcast(d.agg(F.count("*").cast("long").alias("n_docs")))
    )
    stack = ", ".join(
        f"'{label}', p{label.replace('.', '')}, d{label.replace('.', '')}"
        for label, _n, _d in _CURVE_TAUS
    )
    return (
        one.selectExpr(
            f"stack({len(_CURVE_TAUS)}, {stack}) AS (tau, n_pairs, n_dropped)",
            "n_docs",
        )
        .select(
            "tau",
            "n_pairs",
            "n_dropped",
            F.expr("(n_docs - n_dropped) * 10000 div n_docs")
            .cast("long")
            .alias("survive_bps"),
        )
        .orderBy("tau")
    )


def near_dup_pairs(d: DataFrame) -> DataFrame:
    """The gated same-(lang, source) Jaccard-≥0.8 pair engine behind
    ``q_dedup_near`` — shared with ``q_dedup_cluster``'s edge build
    (r6: cluster previously re-derived the pairs with an UNGATED
    in-block quadratic join carrying token arrays, which wedged the
    m100 deep-scaling tier; one engine, one gate).  Returns
    (doc_a, doc_b, jac), doc_a < doc_b.

    Small-vocabulary mask verify (r11 opt, guide §2.3/§4): when the
    global vocabulary fits 64 tokens (probed exactly, see
    ``pipeline_ops._minhash_small_vocab``) each token set is one
    64-bit mask, the per-pair verify becomes
    ``bit_count(mask_a & mask_b)`` — O(1) and allocation-free vs the
    O(|A|+|B|) ``array_intersect`` — and the pair join shuffles a
    16-byte (mask, size) pair per row instead of the token array.
    |A∪B| = |A|+|B|−|A∩B| exactly (sets are distinct), so the SAME
    integers feed the SAME double division and round(·, 4): output is
    bit-identical to the array verify on both the quadratic and the
    banded path (tests pin parity).  The join SHAPE is unchanged —
    blocked equi-join or band engine, still chosen by the measured
    ppr gate — only the verify kernel and the bytes per pair shrink.

    Probe-job fusion (r11 opt): the vocab approx pass and the ppr work
    probe are independent single-row aggregates, so they run as ONE
    Spark job via a two-branch union (each branch its own parallel
    stage) — the engine's adaptive machinery costs one fused job plus
    the exact vocab confirm (mask corpora) or just the fused job
    (realistic corpora, where the approx branch falls through)."""
    from .pipeline_ops import (
        _exact_small_vocab,
        _minhash_mask_vocab_max,
        _vocab_mask_col,
    )

    # Work probe: Σ block²/2N = the quadratic path's candidate pairs
    # per row over the (lang, source) block-count frame (driver-
    # bounded by construction), compared against the measured band-
    # engine cost ratio.  Fused with the vocab approx pass into one
    # collect.
    ppr_q = (
        d.groupBy("lang", "source")
        .count()
        .agg(
            (
                F.sum(F.col("count").cast("double") * F.col("count"))
                / (2 * F.sum("count"))
            ).alias("v")
        )
        .select(F.lit("ppr").alias("k"), "v")
    )
    vmax = _minhash_mask_vocab_max()
    if vmax > 0:
        probe_q = (
            d.select(F.explode("toks").alias("t"))
            .agg(F.approx_count_distinct("t").cast("double").alias("v"))
            .select(F.lit("vocab").alias("k"), "v")
            .unionAll(ppr_q)
        )
    else:
        probe_q = ppr_q
    probe = {r["k"]: r["v"] for r in probe_q.collect()}
    ppr = probe.get("ppr") or 0.0
    approx = probe.get("vocab")
    vocab = (
        _exact_small_vocab(d, vmax)
        if approx is not None and approx <= 2 * vmax
        else None
    )
    if vocab is not None:
        m = d.select(
            "doc_id",
            "lang",
            "source",
            _vocab_mask_col(vocab).alias("mask"),
            F.size("toks").alias("n"),
        )
        a = m.select(
            F.col("doc_id").alias("doc_a"),
            "lang",
            "source",
            F.col("mask").alias("mask_a"),
            F.col("n").alias("na"),
        )
        b = m.select(
            F.col("doc_id").alias("doc_b"),
            "lang",
            "source",
            F.col("mask").alias("mask_b"),
            F.col("n").alias("nb"),
        )
        _i = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b")))
        jac = _i.cast("double") / (F.col("na") + F.col("nb") - _i)
        size_ok = 5 * F.least(F.col("na"), F.col("nb")) >= 4 * F.greatest(
            F.col("na"), F.col("nb")
        )
    else:
        a = d.select(
            F.col("doc_id").alias("doc_a"),
            "lang",
            "source",
            F.col("toks").alias("toks_a"),
        )
        b = d.select(
            F.col("doc_id").alias("doc_b"),
            "lang",
            "source",
            F.col("toks").alias("toks_b"),
        )
        # |∪| DERIVED from sizes (r11): toks are array_distinct'd, so
        # |A∪B| = |A|+|B|−|A∩B| exactly — array_intersect is the one
        # per-pair array op left, halving the dominant cost of the
        # verify (measured 2.8 s → 2.0 s on the N4 bench pairs; the
        # old form ran array_union per pair for a number already in
        # hand).
        _i = F.size(F.array_intersect("toks_a", "toks_b"))
        jac = _i.cast("double") / (
            F.size("toks_a") + F.size("toks_b") - _i
        )
        # Lossless size prefilter (J ≥ 0.8 ⇒ 5·min ≥ 4·max on
        # distinct-token counts) — exact-integer, can never drop a
        # true pair.
        size_ok = 5 * F.least(
            F.size("toks_a"), F.size("toks_b")
        ) >= 4 * F.greatest(F.size("toks_a"), F.size("toks_b"))
    if ppr > _dedup_ppr_max():
        from .pipeline_ops import minhash_candidate_pairs

        # ids-only candidates; the size prefilter runs on two 8-byte
        # ints BEFORE token arrays attach (the r6 m100 lesson — the
        # pair×array join is the scale killer, see PERF.md r6)
        sizes = d.select("doc_id", F.size("toks").alias("n"))
        cand = (
            minhash_candidate_pairs(d, ["lang", "source"])
            .join(
                sizes.select(
                    F.col("doc_id").alias("doc_a"), F.col("n").alias("na")
                ),
                "doc_a",
            )
            .join(
                sizes.select(
                    F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")
                ),
                "doc_b",
            )
            .filter(
                5 * F.least(F.col("na"), F.col("nb"))
                >= 4 * F.greatest(F.col("na"), F.col("nb"))
            )
            .select("doc_a", "doc_b")
        )
        return (
            cand.join(a.drop("lang", "source"), "doc_a")
            .join(b.drop("lang", "source"), "doc_b")
            .withColumn("jac", jac)
            .filter(F.col("jac") >= 0.8)
            .select("doc_a", "doc_b", F.round("jac", 4).alias("jac"))
        )
    return (
        a.join(b, ["lang", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(size_ok)
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.8)
        .select("doc_a", "doc_b", F.round("jac", 4).alias("jac"))
    )


#: Deterministic 20% "incoming batch" membership: md5-hash bucket of
#: doc_id (identical in Spark and DuckDB — the sampling.py convention).
#: A plain modulo split would silently miss every duplicate here: the
#: corpus plants near-dups at id stride 20, so any modulus dividing 20
#: keeps each dup pair on ONE side of the split.
_INC_SPARK_BATCH = (
    "pmod(cast(conv(substr(md5(cast(cast({x} as string) as binary)), 1, 15),"
    " 16, 10) as bigint), 5) = 4"
)
_INC_DUCK_BATCH = (
    "(('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15))::BIGINT % 5) = 4"
)


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, source, md5(text) AS h,
               list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ),
    corp  AS (SELECT * FROM d WHERE NOT ({_INC_DUCK_BATCH.format(x='doc_id')})),
    batch AS (SELECT * FROM d WHERE {_INC_DUCK_BATCH.format(x='doc_id')}),
    exact AS (
        SELECT b.doc_id, min(c.doc_id) AS exact_id
        FROM batch b JOIN corp c ON b.h = c.h
        GROUP BY 1
    ),
    near AS (
        SELECT b.doc_id, min(c.doc_id) AS near_id
        FROM batch b
        JOIN corp c ON b.lang = c.lang AND b.source = c.source
        WHERE CAST(len(list_intersect(b.toks, c.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(b.toks, c.toks))) >= 0.8
        GROUP BY 1
    )
    SELECT b.doc_id,
           CASE WHEN e.exact_id IS NOT NULL THEN 'exact_dup'
                WHEN n.near_id  IS NOT NULL THEN 'near_dup'
                ELSE 'keep' END AS verdict,
           CASE WHEN e.exact_id IS NOT NULL THEN e.exact_id
                ELSE n.near_id END AS match_id
    FROM batch b
    LEFT JOIN exact e ON b.doc_id = e.doc_id
    LEFT JOIN near  n ON b.doc_id = n.doc_id
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: an incoming batch (md5-hash bucket of
    doc_id = 4 of 5 — a deterministic, structure-free 20% "today's
    crawl") is screened against the
    already-ingested corpus (the other 80%), never against itself —
    the shape every *continuously fed* training pipeline runs, where
    re-deduplicating the full corpus per batch would be quadratic in
    ingest history.  Per batch doc: ``exact_dup`` (content hash already
    ingested, min matching corpus id), else ``near_dup`` (token-set
    Jaccard ≥ 0.8 vs some same-(lang, source) corpus doc), else
    ``keep``.

    Scale shape: the exact screen is a hash equi-join against the
    corpus hash index (shuffle on md5, linear); the near screen is
    bipartite batch×corpus within (lang, source) blocks — cost
    |batch|·|block|, NOT |corpus|² — with a lossless size prefilter,
    and above the derived block gate it escalates onto the shared
    banded-MinHash candidate engine (cross-side band pairs selected by
    the same hash-bucket expression, same exact verify; forced-gate
    equality in
    tests/test_incremental_escalate.py).  The batch side of both joins
    is ~20% of a day's intake at production scale — broadcastable in
    the common case.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.col("text").cast("binary")).alias("h"),
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    corp = d.filter(~F.expr(_INC_SPARK_BATCH.format(x="doc_id")))
    batch = d.filter(F.expr(_INC_SPARK_BATCH.format(x="doc_id")))
    exact = (
        batch.select("doc_id", "h")
        .join(
            corp.select(F.col("doc_id").alias("cid"), "h"), "h"
        )
        .groupBy("doc_id")
        .agg(F.min("cid").alias("exact_id"))
    )
    jac = F.size(F.array_intersect("toks_b", "toks_c")).cast("double") / F.size(
        F.array_union("toks_b", "toks_c")
    )
    # The near screen only decides docs the exact screen passed (the
    # output reads near_id only when exact_id is NULL), so exact dups
    # are anti-joined out of the bipartite pair space first; and the
    # lossless Jaccard size prefilter (J ≥ 0.8 ⇒ 5·min(|A|,|B|) ≥
    # 4·max — same bound as q_dedup_minhash's verify) drops
    # mismatched-size pairs on two ints before any array op runs.
    nb, nc = F.size("toks_b"), F.size("toks_c")
    bnx = (
        batch.select("doc_id", "lang", "source", F.col("toks").alias("toks_b"))
        .join(exact.select("doc_id"), "doc_id", "left_anti")
    )
    corp_t = corp.select(
        F.col("doc_id").alias("cid"),
        "lang",
        "source",
        F.col("toks").alias("toks_c"),
    )
    # Same adaptive gate as q_dedup_near: the bipartite block join is
    # |batch_block|·|corp_block| — quadratic in block size — so when
    # the probe's avg pairs per row (Σ block²/2N, an upper proxy for
    # the bipartite 0.16·Σ block²) crosses the measured band-engine
    # cost ratio (~80 pairs/row measured), candidates come from the shared MinHash band engine
    # over the union of both sides; a pure hash-bucket expression
    # keeps only cross-side pairs (no side-map join), and the
    # identical prefilter + exact-Jaccard verify runs either way
    # (banding lossless at 0.8 — tests/test_incremental_escalate.py
    # forces the gate and proves equality).
    ppr = (
        d.groupBy("lang", "source")
        .count()
        .agg(
            (
                F.sum(F.col("count").cast("double") * F.col("count"))
                / (2 * F.sum("count"))
            ).alias("ppr")
        )
        .collect()[0][0]  # collect, not first(): r11, CollectLimit tax
        or 0.0
    )
    verify = (
        (5 * F.least(nb, nc) >= 4 * F.greatest(nb, nc)) & (jac >= 0.8)
    )
    if ppr > _dedup_ppr_max():
        from .pipeline_ops import minhash_candidate_pairs

        in_batch_a = F.expr(_INC_SPARK_BATCH.format(x="doc_a"))
        in_batch_b = F.expr(_INC_SPARK_BATCH.format(x="doc_b"))
        cross = (
            minhash_candidate_pairs(d, ["lang", "source"])
            .filter(in_batch_a != in_batch_b)
            .select(
                F.when(in_batch_a, F.col("doc_a"))
                .otherwise(F.col("doc_b"))
                .alias("doc_id"),
                F.when(in_batch_a, F.col("doc_b"))
                .otherwise(F.col("doc_a"))
                .alias("cid"),
            )
        )
        near = (
            cross.join(bnx.select("doc_id", "toks_b"), "doc_id")
            .join(corp_t.select("cid", "toks_c"), "cid")
            .filter(verify)
            .groupBy("doc_id")
            .agg(F.min("cid").alias("near_id"))
        )
    else:
        near = (
            bnx.join(corp_t, ["lang", "source"])
            .filter(verify)
            .groupBy("doc_id")
            .agg(F.min("cid").alias("near_id"))
        )
    return (
        batch.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_id").isNotNull(), "exact_dup")
            .when(F.col("near_id").isNotNull(), "near_dup")
            .otherwise("keep")
            .alias("verdict"),
            F.coalesce("exact_id", "near_id").alias("match_id"),
        )
    )


# --------------------------------------------------------------------------
# Embedding similarity
# --------------------------------------------------------------------------

def _load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


#: Packed bytes per 64-dim float64 reference row.
_SIM_BYTES_PER_ROW = 64 * 8


def _sim_broadcast_max() -> int:
    """Broadcast the reference side only below this row count.
    Derived from ``spark.sql.autoBroadcastJoinThreshold`` via
    plans/gates.broadcast_rows_gate (VERDICT r03 #7): at the 10 MiB
    default this is 2,048,000 64-dim float64 rows ≈ 1 GiB — the usual
    broadcast comfort zone; a cluster that raises/lowers the threshold
    (or bans broadcast with -1) moves every sim gate with it.  Above
    the gate the exact block-nested-loop path engages (no driver
    collect).  SPARK_GRAFT_SIM_BROADCAST_MAX overrides for tests."""
    from events_to_db_spark.plans.gates import broadcast_rows_gate

    return broadcast_rows_gate(
        "SPARK_GRAFT_SIM_BROADCAST_MAX", bytes_per_row=_SIM_BYTES_PER_ROW
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition the STREAMED side of a broadcast-kernel stage up to
    the session's default parallelism when the scan has fewer
    partitions.  Compute-heavy ``mapInPandas`` stages must not inherit
    FILE-count parallelism: a tier written as one parquet file
    serializes the whole O(N·M) matmul onto a single Python worker
    (PERF.md r6 — the m100 embed sweep sat at ~3 % CPU for 30+ min
    before this).  The shuffle moves only (id, vector) rows once and
    unlocks a cores-wide BLAS fan-out; when the scan already has
    enough partitions this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _sim_block_rows() -> int:
    """Rows per packed chunk on the blocked exact path — derived from
    ``spark.sql.files.maxPartitionBytes`` via plans/gates.
    chunk_rows_gate (VERDICT r04 #7: the last fixed data-size
    threshold in the sim family, now conf-responsive).
    SPARK_GRAFT_SIM_BLOCK_ROWS overrides for tests."""
    from events_to_db_spark.plans.gates import chunk_rows_gate

    return chunk_rows_gate(
        "SPARK_GRAFT_SIM_BLOCK_ROWS", bytes_per_row=_SIM_BYTES_PER_ROW
    )


def _ref_broadcast(spark: SparkSession, df: DataFrame, with_labels: bool):
    """Collect the reference side (ids asc) and broadcast it to the
    executors.  Only called below ``_sim_broadcast_max()`` rows — the
    same constraint as any broadcast join; beyond that the callers
    switch to the packed block-nested-loop path (``_pack_chunks`` +
    ``kernels.make_block_*``), which never collects to the driver."""
    import numpy as np

    cols = ["vec_id", "embedding"] + (["label"] if with_labels else [])
    rows = df.select(*cols).orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    # an empty reference must broadcast a well-shaped (0, 0) matrix —
    # np.array([]) is 1-D and l2_normalize would die on axis=1 (the
    # map kernels never run on an empty input side, so the dim is moot)
    emb = np.array([r["embedding"] for r in rows], dtype=np.float64)
    unit = kernels.l2_normalize(emb if len(rows) else emb.reshape(0, 0))
    if with_labels:
        labels = np.array([r["label"] for r in rows], dtype=np.int64)
        return spark.sparkContext.broadcast((ids, unit, labels))
    return spark.sparkContext.broadcast((ids, unit))


def _pack_chunks(
    df: DataFrame, n_chunks: int, with_labels: bool, prefix: str
) -> DataFrame:
    """Pack vectors into ``n_chunks`` rows of (ids asc, flattened
    matrix[, labels]) — executor-side aggregation only, no driver
    round-trip.  Two packed sides cross-join at chunk granularity, so
    the block-nested-loop shuffle volume is |Q|·n_ref_chunks +
    |R|·n_q_chunks — the classic BNL bound — instead of |Q|·|R|."""
    cols = [F.col("vec_id"), F.col("embedding").cast("array<double>").alias("emb")]
    if with_labels:
        cols.append(F.col("label").cast("long"))
    packed = (
        df.select(*cols)
        .withColumn("chunk", F.pmod(F.col("vec_id"), F.lit(n_chunks)).cast("int"))
        .groupBy("chunk")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("vec_id", "emb", *(["label"] if with_labels else []))
                )
            ).alias("pack")
        )
    )
    out = [
        F.col("pack.vec_id").alias(f"{prefix}_ids"),
        F.flatten(F.col("pack.emb")).alias(f"{prefix}_flat"),
    ]
    if with_labels:
        out.append(F.col("pack.label").alias(f"{prefix}_labels"))
    return packed.select(*out)


def _sim_pair_blocks(
    e: DataFrame, n_rows: int, with_labels: bool
) -> DataFrame:
    """Chunk×block pair rows for the exact blocked similarity path."""
    n_chunks = max(1, -(-n_rows // _sim_block_rows()))
    q = _pack_chunks(e, n_chunks, with_labels, "q")
    r = _pack_chunks(e, n_chunks, with_labels, "r")
    return q.crossJoin(r)


#: Telemetry for the last `_sim_proj_verified` gate decision — written
#: on every call so harnesses can assert the DECISION itself instead of
#: inferring it from wall-clock (VERDICT r07 #1: the m1 timing band was
#: narrower than host same-plan noise; the claim at m1 is "the gate
#: refuses with zero Spark jobs", which is a fact about this record,
#: not a duration).  Keys: outcome ∈ {off, refuse_floor,
#: refuse_min_radius, refuse_radius, refuse_work, escalate},
#: zero_jobs (True when the refusal was decided without running any
#: Spark job), n, tau, mode.
LAST_PROJ_DECISION: dict | None = None


def _proj_decision(outcome: str, *, zero_jobs: bool, n: int, tau: float,
                   mode: str) -> None:
    global LAST_PROJ_DECISION
    LAST_PROJ_DECISION = {
        "outcome": outcome,
        "zero_jobs": zero_jobs,
        "n": n,
        "tau": tau,
        "mode": mode,
    }


def _sim_proj_verified(e: DataFrame, n: int, tau: float) -> DataFrame | None:
    """Projection-cell escalation for the cosine-threshold family
    (VERDICT r04 #1): lossless top-PC cell candidates + exact verify
    (functions/simproj.py) instead of the all-pairs kernel, WHEN the
    measured work gate says the prune wins.

    Returns the verified qualifying pairs (a_id, la, b_id, lb;
    a_id < b_id, cosine >= tau) or None to keep the quad kernels.
    Four gates, cheapest first:

    * mode (``SPARK_GRAFT_SIM_PROJ`` = auto|force|off —
      tests/test_simproj_escalate.py pins hash-equality of the two
      paths with ``force``);
    * size floor (r7): below ``gates.proj_min_quad_pairs()`` quadratic
      pairs (default 4e9 ≈ 90k rows) auto refuses without running ANY
      Spark job — at small N the planning probe alone (~2.7 s
      measured) costs more than 10% of the quad kernel, so no prune
      can win decisively;
    * geometry: cell width r = sqrt(2-2·tau) against the [-1, 1]
      projection span — at the driver corpus thresholds (0.3/0.4,
      r > 1) a 3-cell probe covers everything, so auto mode skips the
      machinery without paying for PCA (gates.PROJ_MAX_RADIUS); radii
      below simproj.MIN_RADIUS (tau within ~8e-6 of 1) exceed the
      packed cell range and fall back in every mode;
    * measured work: simproj.escalated_pairs sweeps every prefix-k
      plan's EXACT candidate count, packed-row replication, and block
      count from one collected cell histogram (simproj.prefix_plans),
      prices them (PLUS the planning overhead already paid) with
      gates.py's r7-calibrated constants, and compares against
      N(N-1)/2 BLAS pairs (PERF.md r7 records the calibration and the
      r6 staleness lesson).  When the ANSWER is itself Θ(N²) — low
      tau on clustered data — no lossless candidate scheme can beat
      BLAS all-pairs and this gate correctly refuses; the win regime
      is the high-tau near-dup screen on LARGE anisotropic corpora
      (tools/synthgen.generate_aniso at m10: 200k rows, where
      `scaling.py --aniso` measures the auto win; at m1/20k rows the
      post-`_spread` quad kernel wins and auto correctly refuses).
    """
    from events_to_db_spark.functions import simproj
    from events_to_db_spark.plans import gates

    mode = gates.sim_proj_mode()
    if mode == "off" or n == 0:
        # empty frame: the quad kernels short-circuit to an empty result,
        # while principal_dirs has no rows to eigendecompose (ADVICE r05)
        _proj_decision("off", zero_jobs=True, n=n, tau=tau, mode=mode)
        return None
    if mode != "force" and n * (n - 1) / 2.0 < gates.proj_min_quad_pairs():
        _proj_decision(
            "refuse_floor", zero_jobs=True, n=n, tau=tau, mode=mode
        )
        return None
    r = (2.0 - 2.0 * tau) ** 0.5
    if r < simproj.MIN_RADIUS:
        _proj_decision(
            "refuse_min_radius", zero_jobs=True, n=n, tau=tau, mode=mode
        )
        return None
    if mode != "force" and r > gates.PROJ_MAX_RADIUS:
        _proj_decision(
            "refuse_radius", zero_jobs=True, n=n, tau=tau, mode=mode
        )
        return None
    out = simproj.escalated_pairs(e, tau, force=(mode == "force"), n=n)
    # escalated_pairs runs the planning probe (Spark jobs) before its
    # cost model can refuse — a refuse_work is NOT a zero-job refusal.
    _proj_decision(
        "refuse_work" if out is None else "escalate",
        zero_jobs=False,
        n=n,
        tau=tau,
        mode=mode,
    )
    return out


@query(
    "q_sim_cosine_knn",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    p AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
               list_cosine_similarity(a.v, b.v) AS cos,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id
               ) AS rn
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT vec_id, nn_id, round(cos, 4) AS cos
    FROM p WHERE rn = 1
    ORDER BY vec_id
    LIMIT 100
    """,
)
def q_sim_cosine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest neighbour by cosine for each vector (ties: lowest
    nn_id), first 100 vectors by vec_id (BASELINE.md B10).

    Kernel path: broadcast the L2-normalized reference matrix, stream
    the query side through one NumPy matmul per Arrow batch — replaces
    the 27 s higher-order-function formulation with a sub-second BLAS
    call, and on a cluster scales linearly in the query side.  Above
    ``_sim_broadcast_max()`` reference rows the exact block-nested-loop
    path engages instead (packed query chunk × reference block cross
    join, per-block partial argmax, global struct-max) — no driver
    collect at any reference size.

    The answer's LIMIT pushes into the QUERY side (r6): only the 100
    lowest-vec_id vectors are queried against the full reference — the
    kernels exclude self by id, so the result is identical while work
    drops from O(N²) to O(100·N).  Before this the m100 scaling tier
    computed 200k NNs to print 100 (PERF.md r6)."""
    e = _load_embeddings(spark, sf_dir)
    n = e.count()
    q100 = e.select("vec_id", "embedding").orderBy("vec_id").limit(100)
    if n <= _sim_broadcast_max():
        bc = _ref_broadcast(spark, e, with_labels=False)
        out = q100.mapInPandas(
            kernels.make_nn_map_fn(bc), "vec_id long, nn_id long, cos double"
        )
        return out.orderBy("vec_id").limit(100)
    q = _pack_chunks(q100, 1, False, "q")
    r = _pack_chunks(e, max(1, -(-n // _sim_block_rows())), False, "r")
    # truncate_lineage: parts feeds BOTH the max and the join-back —
    # without the pin the expensive kernel pass would run twice
    # (the CollapseProject/recompute trap, CLAUDE.md r3).
    parts = truncate_lineage(
        q.crossJoin(r).mapInPandas(
            kernels.make_block_nn_fn(), "vec_id long, nn_id long, cos double"
        ),
        eager=False,
    )
    # argmax as hash-agg + join-back instead of max(struct(...)):
    # struct-max buffers plan SortAggregate (VERDICT r06 #4 / r07 #3);
    # max(cos) then an equality join back to parts keeps every
    # aggregate a HashAggregate.  cos == best_cos is safe on doubles:
    # both sides are the SAME kernel-emitted values, and max() returns
    # one of them bit-for-bit.
    best = parts.groupBy("vec_id").agg(F.max("cos").alias("best_cos"))
    out = (
        parts.join(F.broadcast(best), "vec_id")
        .filter(F.col("cos") == F.col("best_cos"))
        .groupBy("vec_id")
        .agg(
            F.min("nn_id").alias("nn_id"),
            F.round(F.max("cos"), 4).alias("cos"),
        )
    )
    return out.orderBy("vec_id").limit(100)


@query(
    "q_sim_threshold",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT (a.label = b.label) AS same_label, count(*) AS n_pairs
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.3
    GROUP BY 1
    """,
)
def q_sim_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered pairs with cosine ≥ 0.3, split same-label vs
    cross-label.  Same broadcast-matmul kernel; each batch emits its
    partial counts and one tiny final aggregation sums them.

    Threshold is data-driven: the synthetic embeddings' max pairwise
    cosine is 0.513, so SURVEY's nominal 0.95 would make this a
    trivially-empty check; 0.3 keeps ~1 % of pairs (measured).  Above
    broadcast size, the blocked path emits the same partial counts from
    chunk×block pair rows — no driver collect.

    Scale escape (VERDICT r04 #1): at high thresholds the lossless
    projection-cell path (``_sim_proj_verified``) replaces the
    all-pairs kernel entirely — candidates from top-PC cells, exact
    verify, O(candidates) instead of O(N²).  At tau = 0.3 the geometry
    gate keeps the BLAS kernel (r = 1.18 — cells cannot discriminate,
    and the answer itself is ~1 % of all pairs, so quadratic verify
    work is inherent)."""
    return sim_threshold_counts(spark, _load_embeddings(spark, sf_dir), 0.3)


def sim_threshold_counts(
    spark: SparkSession, e: DataFrame, tau: float
) -> DataFrame:
    """The gated threshold-pair-count op behind ``q_sim_threshold``,
    callable on any (vec_id, embedding, label) frame at any threshold
    (tools/scaling.py times it on the anisotropic tier at tau=0.95,
    where the projection path engages)."""
    e = e.select("vec_id", "embedding", "label")
    n = e.count()
    verified = _sim_proj_verified(e, n, tau)
    if verified is not None:
        return (
            verified.select(
                (F.col("la") == F.col("lb")).alias("same_label")
            )
            .groupBy("same_label")
            .agg(F.count("*").alias("n_pairs"))
            .filter(F.col("n_pairs") > 0)
        )
    if n <= _sim_broadcast_max():
        bc = _ref_broadcast(spark, e, with_labels=True)
        parts = _spread(e.select("vec_id", "embedding", "label")).mapInPandas(
            kernels.make_threshold_map_fn(bc, tau),
            "same_label boolean, n_pairs_part long",
        )
    else:
        pairs = _sim_pair_blocks(e, n, with_labels=True)
        parts = pairs.mapInPandas(
            kernels.make_block_threshold_fn(tau),
            "same_label boolean, n_pairs_part long",
        )
    return (
        parts.groupBy("same_label")
        .agg(F.sum("n_pairs_part").alias("n_pairs"))
        .filter(F.col("n_pairs") > 0)
    )


@query(
    "q_sim_centroid",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    u AS (
        SELECT label, t.i AS i, avg(v[t.i]) AS c
        FROM e, generate_series(1, 64) AS t(i)
        GROUP BY label, t.i
    ),
    cents AS (SELECT label, list(c ORDER BY i) AS cv FROM u GROUP BY label),
    scored AS (
        SELECT e.vec_id, e.label, c.label AS clabel,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.label
               ) AS rn
        FROM e CROSS JOIN cents c
    )
    SELECT round(avg(CASE WHEN label = clabel THEN 1.0 ELSE 0.0 END), 4) AS acc
    FROM scored WHERE rn = 1
    """,
)
def q_sim_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid accuracy: per-label mean vector, then the share
    of vectors whose cosine-nearest centroid is their own label.

    Centroids come from a distributed posexplode→avg aggregation (the
    collect is of 10×64 aggregated values — bounded by |labels|·dim,
    not data size), then ride the classify kernel as a broadcast.
    Oracle note: dim is hard-coded 64 in the SQL (fixed by FIXTURES.md);
    the Spark side uses the actual array length."""
    import numpy as np

    e = _load_embeddings(spark, sf_dir)
    cent_rows = (
        e.select("label", F.posexplode("embedding").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("pairs"))
        .select("label", F.col("pairs.c").alias("cv"))
        .orderBy("label")
        .collect()
    )
    labels = np.array([r["label"] for r in cent_rows], dtype=np.int64)
    unit = kernels.l2_normalize(
        np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    )
    bc = spark.sparkContext.broadcast((labels, unit))
    classified = _spread(e.select("vec_id", "embedding", "label")).mapInPandas(
        kernels.make_classify_map_fn(bc), "vec_id long, label long, clabel long"
    )
    return classified.agg(
        F.round(
            F.avg(F.when(F.col("label") == F.col("clabel"), 1.0).otherwise(0.0)),
            4,
        ).alias("acc")
    )


# --------------------------------------------------------------------------
# Multimodal join
# --------------------------------------------------------------------------

@query(
    "q_multimodal",
    oracle="""
    SELECT d.lang,
           round(avg(d.n_chars), 4)                         AS avg_chars,
           round(avg(CAST(e.embedding[1] AS DOUBLE)), 4)    AS avg_e0
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    GROUP BY d.lang
    """,
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ vector ⋈ metadata in one query: per language, mean doc
    length and mean first embedding dimension (1-based element_at ↔
    DuckDB 1-based list index)."""
    d = load_table(spark, sf_dir, "documents")
    e = _load_embeddings(spark, sf_dir)
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang")
        .agg(
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(
                F.avg(F.element_at("embedding", 1).cast("double")), 4
            ).alias("avg_e0"),
        )
    )


@query(
    "q_dedup_cluster",
    oracle="""
    WITH RECURSIVE
    toks AS (
        SELECT doc_id, lang, source,
               list_distinct(string_split(text, ' ')) AS ts
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM toks a JOIN toks b
          ON a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
              / len(list_distinct(list_concat(a.ts, b.ts))) >= 0.8
    ),
    edges AS (
        SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
    ),
    walk(doc_id, label) AS (
        SELECT doc_id, doc_id AS label FROM documents
        UNION
        SELECT e.u AS doc_id, w.label
        FROM edges e JOIN walk w ON w.doc_id = e.v
    ),
    comp AS (
        SELECT doc_id, min(label) AS cluster_id FROM walk GROUP BY doc_id
    )
    SELECT cluster_id, count(*) AS n_docs, min(canon) AS canonical_doc
    FROM (
        SELECT c.cluster_id,
               CASE WHEN row_number() OVER (PARTITION BY c.cluster_id
                         ORDER BY d.n_chars DESC, d.doc_id) = 1
                    THEN d.doc_id END AS canon
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    GROUP BY cluster_id
    """,
)
def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate *clustering*: connected components over the
    ``q_dedup_near`` pair graph, then one canonical document per
    cluster (longest text, doc_id tie-break) — the step that turns
    pair detection into an actual keep/drop decision for a training
    corpus.

    Spark side: iterative min-label propagation — each round joins
    the current labels across the (symmetric) edge set and keeps the
    per-node minimum, with ``localCheckpoint`` truncating the lineage
    between rounds; converges in O(component diameter) rounds (≤ a
    few dozen joins even at extreme scale — the alternating
    star-contraction variant halves that if diameter ever bites).
    Everything per-round is a distributed join + hash-agg: the driver
    only counts changed labels.  The oracle states the same fixpoint
    as a recursive CTE — feasible because blocked components stay
    small (§0-corpus: 61 clusters, max size 11)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    # edge set = the SAME gated pair engine as q_dedup_near (r6: a
    # private ungated quadratic join here wedged the m100 tier).
    # Persisted once: the pair-count gate below and whichever
    # components path runs both read it without recomputing the
    # engine (unpersisted as soon as the path has its edges).
    pairs = (
        near_dup_pairs(d.drop("n_chars"))
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .persist()
    )
    n_pairs = pairs.count()
    if 0 < n_pairs <= _cluster_driver_max_pairs():
        # Driver union-find (r11 opt, guide §1.2/§5 — the same gated-
        # hybrid shape as the graph_ops driver folds): min-label
        # propagation converges to label(doc) = min doc_id of its
        # connected component, which union-find computes exactly from
        # one bounded edge collect (integers only — no arithmetic at
        # all, so parity with the distributed fixpoint is structural).
        # ~5 rounds x (join + agg + changed-count + checkpoint) of job
        # overhead collapse into one collect.  Docs in no pair keep
        # label = doc_id via the left-join coalesce.  Above the gate
        # the distributed loop below runs exactly as before.
        edge_rows = [(r["u"], r["v"]) for r in pairs.collect()]
        pairs.unpersist()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for u, v in edge_rows:
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min id keeps the representative the
                # component minimum as we go
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        touched = {x for uv in edge_rows for x in uv}
        label_rows = [(int(x), int(find(x))) for x in sorted(touched)]
        touched_labels = spark.createDataFrame(
            label_rows, "doc_id long, label long"
        )
        labels = (
            d.select("doc_id")
            .join(F.broadcast(touched_labels), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("label", "doc_id").alias("label"),
            )
        )
    else:
        edges = truncate_lineage(
            pairs.unionByName(
                pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
        )
        pairs.unpersist()

        labels = d.select("doc_id", F.col("doc_id").alias("label"))
        changed = -1
        for _ in range(20):  # >= max component diameter, with margin
            neigh = edges.join(
                labels, edges.v == labels.doc_id
            ).select(F.col("u").alias("doc_id"), "label")
            new_labels = truncate_lineage(
                labels.unionByName(neigh)
                .groupBy("doc_id")
                .agg(F.min("label").alias("label"))
            )
            changed = (
                labels.withColumnRenamed("label", "old")
                .join(new_labels, "doc_id")
                .filter(F.col("old") != F.col("label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        if changed != 0:
            # Non-convergence must fail loudly: a component with
            # diameter beyond the round cap would otherwise silently
            # yield split clusters (wrong cluster_id / n_docs).
            raise RuntimeError(
                "q_dedup_cluster: min-label propagation did not "
                f"converge within 20 rounds ({changed} labels still "
                "changing); raise the round cap or switch to star "
                "contraction"
            )

    comp = labels.withColumnRenamed("label", "cluster_id")
    ranked = comp.join(
        d.select("doc_id", "n_chars"), "doc_id"
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("n_chars").desc(), F.col("doc_id")
            )
        ),
    )
    return ranked.groupBy("cluster_id").agg(
        F.count("*").alias("n_docs"),
        F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
            "canonical_doc"
        ),
    )


@query(
    "q_dedup_embed",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.label,
           count(*) AS n_vecs,
           CAST(sum(CASE WHEN EXISTS (
                    SELECT 1 FROM e b
                    WHERE b.vec_id < a.vec_id
                      AND list_cosine_similarity(a.v, b.v) >= 0.4)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
    FROM e a
    GROUP BY a.label
    """,
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate removal with the keep-lowest-id
    rule: a vector is a duplicate iff an earlier (smaller vec_id)
    vector sits within cosine ≥ 0.4 — the semantic-dedup pass that
    catches paraphrases exact/MinHash text dedup cannot.  Threshold is
    corpus-calibrated like ``q_sim_threshold`` (max pairwise cosine
    here is 0.513; 0.4 keeps 59 genuine pairs).  Same broadcast-matmul
    kernel family: one BLAS call per Arrow batch plus a broadcast
    smaller-id mask; linear in the big side.  Beyond a broadcastable
    reference the exact blocked path ORs per-block flags (`bool_or`);
    the approximate alternative is LSH (``q_sim_ann_lsh``).

    Scale escape (VERDICT r04 #1): the same projection-cell gate as
    ``q_sim_threshold`` — a dup flag is exactly "appears as the larger
    id in a verified pair", so the escalated path is distinct(b_id)
    over the verified candidates.  At tau = 0.4 (r = 1.095) the
    geometry gate keeps the kernel on the driver corpus."""
    e = _load_embeddings(spark, sf_dir)
    n = e.count()
    verified = _sim_proj_verified(
        e.select("vec_id", "embedding", "label"), n, 0.4
    )
    if verified is not None:
        dups = (
            verified.select(F.col("b_id").alias("vec_id"))
            .distinct()
            .withColumn("is_dup", F.lit(True))
        )
        flags = (
            e.select("vec_id", "label")
            .join(dups, "vec_id", "left")
            .select(
                "vec_id",
                "label",
                F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
            )
        )
        return flags.groupBy("label").agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
        )
    if n <= _sim_broadcast_max():
        bc = _ref_broadcast(spark, e, with_labels=False)
        flags = _spread(e.select("vec_id", "embedding", "label")).mapInPandas(
            kernels.make_dup_flag_map_fn(bc, 0.4),
            "vec_id long, label int, is_dup boolean",
        )
    else:
        pairs = _sim_pair_blocks(e, n, with_labels=True)
        parts = pairs.mapInPandas(
            kernels.make_block_dup_fn(0.4),
            "vec_id long, label long, is_dup_part boolean",
        )
        flags = (
            parts.groupBy("vec_id", "label")
            .agg(F.bool_or("is_dup_part").alias("is_dup"))
            .select("vec_id", F.col("label").cast("int").alias("label"), "is_dup")
        )
    return flags.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
    )


@query(
    "q_dedup_embed_inc",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    b AS (SELECT * FROM e WHERE {_INC_DUCK_BATCH.format(x='vec_id')}),
    c AS (SELECT * FROM e WHERE NOT ({_INC_DUCK_BATCH.format(x='vec_id')}))
    SELECT b.vec_id,
           min(c.vec_id) AS near_id,
           CAST(count(*) AS BIGINT) AS n_matches
    FROM b JOIN c ON list_cosine_similarity(b.v, c.v) >= 0.4
    GROUP BY b.vec_id
    """,
)
def q_dedup_embed_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental *semantic* ingest dedup — the embedding twin of
    ``q_dedup_incremental``: an incoming batch (deterministic 20 %
    md5-hash bucket of vec_id, the sampling.py convention) is checked
    against the standing corpus; a batch vector is a near-duplicate
    iff some corpus vector sits within cosine ≥ 0.4 (the corpus-
    calibrated q_dedup_embed threshold), reporting the lowest matching
    corpus id (the canonical survivor) and the match count.  This is
    the pass an ingestion pipeline runs per shipment so the corpus
    never re-pairs with itself.

    Plan: bipartite, linear in the batch — the corpus broadcasts as a
    packed matrix and the batch streams through one matmul per Arrow
    batch (kernels.make_min_match_map_fn); above the broadcast gate
    the packed chunk×block path emits per-block partial (min id,
    count) and a hash-agg folds them (make_block_min_match_fn) — no
    driver collect at any corpus size.  Scale escape: under
    ``SPARK_GRAFT_SIM_PROJ`` the projection-cell engine supplies the
    verified cross pairs instead (same gate family as
    q_sim_threshold; tests/test_simproj_escalate.py pins equality on
    this query too)."""
    e = _load_embeddings(spark, sf_dir).select("vec_id", "embedding", "label")
    in_batch = F.expr(_INC_SPARK_BATCH.format(x="vec_id"))
    batch = e.filter(in_batch)
    corpus = e.filter(~in_batch)
    n = e.count()

    verified = _sim_proj_verified(e, n, 0.4)
    if verified is not None:
        in_a = F.expr(_INC_SPARK_BATCH.format(x="a_id"))
        in_b = F.expr(_INC_SPARK_BATCH.format(x="b_id"))
        cross = verified.filter(in_a != in_b).select(
            F.when(in_a, F.col("a_id")).otherwise(F.col("b_id")).alias(
                "vec_id"
            ),
            F.when(in_a, F.col("b_id")).otherwise(F.col("a_id")).alias(
                "cid"
            ),
        )
        return cross.groupBy("vec_id").agg(
            F.min("cid").alias("near_id"),
            F.count(F.lit(1)).alias("n_matches"),
        )

    n_corpus = corpus.count()
    if n_corpus <= _sim_broadcast_max():
        bc = _ref_broadcast(spark, corpus, with_labels=False)
        return _spread(batch.select("vec_id", "embedding")).mapInPandas(
            kernels.make_min_match_map_fn(bc, 0.4),
            "vec_id long, near_id long, n_matches long",
        )
    n_batch = batch.count()
    q = _pack_chunks(batch, max(1, -(-n_batch // _sim_block_rows())), False, "q")
    r = _pack_chunks(
        corpus, max(1, -(-n_corpus // _sim_block_rows())), False, "r"
    )
    parts = q.crossJoin(r).mapInPandas(
        kernels.make_block_min_match_fn(0.4),
        "vec_id long, near_part long, n_part long",
    )
    return parts.groupBy("vec_id").agg(
        F.min("near_part").alias("near_id"),
        F.sum("n_part").alias("n_matches"),
    )


@query(
    "q_sim_hist",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT CAST(floor(list_cosine_similarity(a.v, b.v) * 10) AS INT) AS bin,
           count(*) AS n_pairs
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    GROUP BY bin
    """,
)
def q_sim_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of all pairwise cosines (bin width 0.1) — the
    embedding-space health check (collapsed spaces pile mass near 1.0;
    healthy ones center near 0) run before any similarity threshold is
    trusted.  The kernel emits per-batch partial histograms — counts,
    never pairs — so shuffle volume is O(batches × bins) while the
    O(n²) similarity work stays inside BLAS.  Bin edges are exact
    (floor of a shared float64 product), matching DuckDB's sequential
    evaluation bit-for-bit everywhere except exact real-arithmetic
    ties."""
    import pandas as pd

    e = _load_embeddings(spark, sf_dir)
    n = e.count()
    if n > _sim_broadcast_max():
        pairs = _sim_pair_blocks(e, n, with_labels=False)
        parts = pairs.mapInPandas(kernels.make_block_hist_fn(), "bin int, n_part long")
        return parts.groupBy("bin").agg(F.sum("n_part").alias("n_pairs"))
    bc = _ref_broadcast(spark, e, with_labels=False)

    def hist_fn(batches):
        import numpy as np

        ids, unit = bc.value
        for pdf in kernels.rechunk(batches, len(ids)):
            q = kernels.l2_normalize(kernels.stack_embeddings(pdf["embedding"]))
            sims = q @ unit.T
            qid = pdf["vec_id"].to_numpy()
            mask = ids[None, :] < qid[:, None]  # each unordered pair once
            binned = np.floor(sims[mask] * 10).astype(np.int64)
            vals, counts = np.unique(binned, return_counts=True)
            yield pd.DataFrame({"bin": vals, "n_part": counts})

    parts = _spread(e.select("vec_id", "embedding")).mapInPandas(
        hist_fn, "bin int, n_part long"
    )
    return parts.groupBy("bin").agg(F.sum("n_part").alias("n_pairs"))


# --------------------------------------------------------------------------
# Binary-quantized ANN (sign-bit Hamming prefilter + exact rerank)
# --------------------------------------------------------------------------

#: 64 dims packed as two 32-bit words (kept in BIGINTs so the packed
#: values stay sign-free in both engines).
_HAM_WORDS = 2
_HAM_PROBES = 8
_HAM_PREFILTER = 16
_HAM_TOPK = 4


def _ham_pack_expr(word: int) -> F.Column:
    """Sign-bit packing of dims [32*word, 32*word+32) into one BIGINT:
    bit i set iff ``embedding[32*word + i] > 0``.  Pure Catalyst
    (aggregate over a literal 32-element sequence), so packing runs
    inside whole-stage codegen — no Python in the quantization scan."""
    off = 32 * word
    return F.expr(
        "aggregate(sequence(0, 31), 0L, (acc, i) -> acc + "
        f"IF(element_at(embedding, {off} + i + 1) > CAST(0 AS DOUBLE), "
        "shiftleft(1L, i), 0L))"
    )


_HAM_DOT_EXPR = (
    "aggregate(zip_with(p_emb, c_emb, (x, y) -> "
    "CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) * "
    "CAST(round(CAST(y AS DOUBLE) * 10000) AS BIGINT)), 0L, (acc, v) -> acc + v)"
)


@query(
    "q_sim_hamming",
    oracle="""
    WITH packed AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(range(0, 32), i ->
                   CASE WHEN embedding[i + 1] > 0
                        THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS w0,
               CAST(list_sum(list_transform(range(0, 32), i ->
                   CASE WHEN embedding[i + 33] > 0
                        THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS w1
        FROM embeddings
    ),
    probes AS (SELECT * FROM packed ORDER BY vec_id LIMIT 8),
    ham AS (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               CAST(bit_count(xor(p.w0, c.w0))
                  + bit_count(xor(p.w1, c.w1)) AS BIGINT) AS hamming
        FROM probes p JOIN packed c ON c.vec_id <> p.vec_id
    ),
    top AS (
        SELECT probe_id, cand_id, hamming,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY hamming, cand_id) AS hrk
        FROM ham
    ),
    rerank AS (
        SELECT t.probe_id, t.cand_id, t.hamming,
               CAST(list_sum(list_transform(range(1, 65), i ->
                   CAST(round(CAST(pe.embedding[i] AS DOUBLE) * 10000) AS BIGINT)
                 * CAST(round(CAST(ce.embedding[i] AS DOUBLE) * 10000) AS BIGINT)))
                 AS BIGINT) AS dot_q
        FROM top t
        JOIN embeddings pe ON pe.vec_id = t.probe_id
        JOIN embeddings ce ON ce.vec_id = t.cand_id
        WHERE t.hrk <= 16
    )
    SELECT probe_id, cand_id, hamming, dot_q,
           CAST(row_number() OVER (PARTITION BY probe_id
                                   ORDER BY dot_q DESC, cand_id) AS BIGINT) AS rk
    FROM rerank
    QUALIFY rk <= 4
    """,
)
def q_sim_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN: sign-bit Hamming prefilter + exact rerank.

    The modern embedding-compression retrieval cascade (binary
    quantization a la faiss/usearch): each 64-dim vector quantizes to
    its 64 sign bits packed into two BIGINT words (32x smaller than
    float64), the 8 lowest-id vectors probe the corpus with a Hamming
    scan (``bit_count(xor)`` on the packed words — pure integer ALU,
    whole-stage codegen), the top-16 Hamming candidates per probe are
    then reranked by the EXACT dot product and the top-4 survive.

    Determinism: Hamming distances are exact integers; the rerank score
    is the integer-quantized dot product Sum round(x*1e4)*round(y*1e4)
    (float32 -> double is exact, both engines round half away from
    zero), so every ordering is exact with vec_id tie-breaks.

    100 TB posture: quantization is a linear codegen scan; the probe
    side broadcasts (ids + 16 bytes per probe); the Hamming stage
    shuffles only (probe_id, cand_id, distance) triples — the embedding
    arrays are re-attached ONLY to the 128 surviving pairs (the
    bytes-per-candidate rule, PERF.md r6); rerank is O(probes * 16)."""
    e = _load_embeddings(spark, sf_dir).select("vec_id", "embedding")
    packed = e.select(
        "vec_id", _ham_pack_expr(0).alias("w0"), _ham_pack_expr(1).alias("w1")
    )
    probes = (
        packed.orderBy("vec_id")
        .limit(_HAM_PROBES)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("w0").alias("pw0"),
            F.col("w1").alias("pw1"),
        )
    )
    ham = (
        packed.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            (
                F.bit_count(F.col("pw0").bitwiseXOR(F.col("w0")))
                + F.bit_count(F.col("pw1").bitwiseXOR(F.col("w1")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    hw = Window.partitionBy("probe_id").orderBy("hamming", "cand_id")
    top = ham.withColumn("hrk", F.row_number().over(hw)).filter(
        F.col("hrk") <= _HAM_PREFILTER
    )
    pe = e.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb"))
    ce = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"))
    rerank = (
        F.broadcast(top.drop("hrk"))
        .join(pe, "probe_id")
        .join(ce, "cand_id")
        .withColumn("dot_q", F.expr(_HAM_DOT_EXPR))
        .drop("p_emb", "c_emb")
    )
    rw = Window.partitionBy("probe_id").orderBy(F.col("dot_q").desc(), "cand_id")
    return (
        rerank.withColumn("rk", F.row_number().over(rw).cast("long"))
        .filter(F.col("rk") <= _HAM_TOPK)
        .select("probe_id", "cand_id", "hamming", "dot_q", "rk")
    )


@query(
    "q_text_rouge2",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT doc_id, concat(t[i], ' ', t[i + 1]) AS bigram,
               count(*) AS c
        FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks)
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT doc_id // 2 AS pair_id, bigram, c
        FROM bg WHERE doc_id % 2 = 0
    ),
    ref AS (
        SELECT doc_id // 2 AS pair_id, bigram, c
        FROM bg WHERE doc_id % 2 = 1
    ),
    ov AS (
        SELECT cand.pair_id,
               CAST(sum(least(cand.c, ref.c)) AS BIGINT) AS o
        FROM cand JOIN ref ON ref.pair_id = cand.pair_id
                          AND ref.bigram = cand.bigram
        GROUP BY 1
    ),
    ctot AS (SELECT pair_id, CAST(sum(c) AS BIGINT) AS nc
             FROM cand GROUP BY 1),
    rtot AS (SELECT pair_id, CAST(sum(c) AS BIGINT) AS nr
             FROM ref GROUP BY 1),
    pairs AS (
        SELECT ctot.pair_id, nc, nr, coalesce(o, 0) AS o
        FROM ctot JOIN rtot ON rtot.pair_id = ctot.pair_id
        LEFT JOIN ov ON ov.pair_id = ctot.pair_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(o) AS BIGINT) AS overlap_bigrams,
           CAST(sum(nc) AS BIGINT) AS cand_bigrams,
           CAST(sum(nr) AS BIGINT) AS ref_bigrams,
           round(CAST(sum(o) AS DOUBLE) / sum(nc), 4) AS rouge2_p,
           round(CAST(sum(o) AS DOUBLE) / sum(nr), 4) AS rouge2_r,
           round(CAST(2 * sum(o) AS DOUBLE) / (sum(nc) + sum(nr)), 4)
               AS rouge2_f1
    FROM pairs
    """,
)
def q_text_rouge2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-averaged ROUGE-2 between adjacent document pairs (even
    doc_id = candidate, next odd doc_id = reference) — the n-gram
    overlap metric a summarization/distillation pipeline runs over a
    (candidate, reference) corpus, here exercised on the id-adjacent
    pairing so both engines see identical pairs.  Counts are CLIPPED
    per the ROUGE definition: overlap = Σ_g min(count_cand(g),
    count_ref(g)).

    Exactness: per-doc bigram counts, the clipped overlap, and all
    three corpus totals are exact BIGINTs; micro P/R/F1 are single
    final divisions (F1 = 2·ov/(cand+ref) — the harmonic mean folds
    exactly under micro-averaging).  Pairs where either side has no
    shared bigram keep overlap 0 through the LEFT join.

    Scale: bigrams are built array-side (one row per doc until the
    single explode — the q_text_ngram construction); the pair join is
    keyed on (pair_id, bigram) — linear shuffle, no all-pairs
    anywhere."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> concat(x, ' ', t[i + 1]))"
                )
            ).alias("bigram"),
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
    )
    pair_id = F.expr("doc_id div 2")
    cand = bg.where(F.col("doc_id") % 2 == 0).select(
        pair_id.alias("pair_id"), "bigram", F.col("c").alias("cc")
    )
    ref = bg.where(F.col("doc_id") % 2 == 1).select(
        pair_id.alias("pair_id"), "bigram", F.col("c").alias("cr")
    )
    ov = (
        cand.join(ref, ["pair_id", "bigram"])
        .groupBy("pair_id")
        .agg(F.sum(F.least("cc", "cr")).cast("long").alias("o"))
    )
    ctot = cand.groupBy("pair_id").agg(
        F.sum("cc").cast("long").alias("nc")
    )
    rtot = ref.groupBy("pair_id").agg(
        F.sum("cr").cast("long").alias("nr")
    )
    pairs = (
        ctot.join(rtot, "pair_id")
        .join(ov, "pair_id", "left")
        .select("nc", "nr", F.coalesce("o", F.lit(0)).alias("o"))
    )
    return pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("o").cast("long").alias("overlap_bigrams"),
        F.sum("nc").cast("long").alias("cand_bigrams"),
        F.sum("nr").cast("long").alias("ref_bigrams"),
        F.round(
            F.sum("o").cast("double") / F.sum("nc"), 4
        ).alias("rouge2_p"),
        F.round(
            F.sum("o").cast("double") / F.sum("nr"), 4
        ).alias("rouge2_r"),
        F.round(
            (2 * F.sum("o")).cast("double")
            / (F.sum("nc") + F.sum("nr")),
            4,
        ).alias("rouge2_f1"),
    )


@query(
    "q_text_distinct_n",
    oracle="""
    WITH toks AS (
        SELECT lang, doc_id, string_split(text, ' ') AS t
        FROM documents
    ),
    uni AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS tot1,
               CAST(count(DISTINCT tok) AS BIGINT) AS d1
        FROM (SELECT lang, unnest(t) AS tok FROM toks)
        GROUP BY lang
    ),
    bi AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS tot2,
               CAST(count(DISTINCT bigram) AS BIGINT) AS d2
        FROM (SELECT lang, concat(t[i], ' ', t[i + 1]) AS bigram
              FROM (SELECT lang, t,
                           unnest(generate_series(1, len(t) - 1)) AS i
                    FROM toks WHERE len(t) >= 2))
        GROUP BY lang
    )
    SELECT uni.lang, tot1, d1, tot2, d2,
           round(CAST(d1 AS DOUBLE) / tot1, 6) AS distinct_1,
           round(CAST(d2 AS DOUBLE) / tot2, 6) AS distinct_2
    FROM uni JOIN bi ON bi.lang = uni.lang
    """,
)
def q_text_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1 / Distinct-2 per language (Li et al.'s generation-
    diversity metrics): unique unigrams over total unigrams and
    unique bigrams over total bigrams — the corpus-diversity numbers
    a synthetic-data pipeline watches for mode collapse (distinct-n
    craters when a generator loops).

    Exactness: all four counts are exact BIGINTs (distinct counts
    over the bounded token/bigram space); the two ratios are single
    final divisions.  Plan: one explode each for unigrams/bigrams,
    two hash aggregates keyed by the 5-value lang dimension, one tiny
    join — linear in corpus tokens."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.split("text", " ").alias("t"))
    uni = (
        toks.select("lang", F.explode("t").alias("tok"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("tot1"),
            F.countDistinct("tok").cast("long").alias("d1"),
        )
    )
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> concat(x, ' ', t[i + 1]))"
                )
            ).alias("bigram"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("tot2"),
            F.countDistinct("bigram").cast("long").alias("d2"),
        )
    )
    return uni.join(bi, "lang").select(
        "lang",
        "tot1",
        "d1",
        "tot2",
        "d2",
        F.round(F.col("d1").cast("double") / F.col("tot1"), 6).alias(
            "distinct_1"
        ),
        F.round(F.col("d2").cast("double") / F.col("tot2"), 6).alias(
            "distinct_2"
        ),
    )
