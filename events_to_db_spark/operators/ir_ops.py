"""Information-retrieval operators over ``documents`` (SURVEY.md §2.12).

BM25 relevance ranking and a readability profile — the retrieval /
quality-filter layer of a training-data pipeline.  Determinism
discipline (SURVEY §7.5): BM25 is normally float-heavy (ln idf, k1/b
fractions); here the *rational variant* is specified so every per-term
score is exact BIGINT arithmetic:

* idf_s   = (N − df)·10⁶ // df          (rational idf, no ln)
* tf part = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with k1 = 6/5,
  b = 3/4, avgdl = L/N; multiplying through by 10·L clears every
  denominator:  22·L·tf  /  (10·L·tf + 3·L + 9·dl·N)
* score_s = idf_s · 22·L·tf // (10·L·tf + 3·L + 9·dl·N), summed over
  query terms per doc — all BIGINT (max ≈ 2e15 at sf0.1; move the
  product to DECIMAL(38,0) beyond ~1e12 corpus tokens).

The ranking is therefore bit-identical across engines with a unique
(score desc, doc_id asc) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table

#: Fixed query terms: one rare ('dup' — the corpus's only low-df
#: token) and two common, so idf separation is visible on this corpus.
_BM25_TERMS = ("dup", "hash", "join")
_IDF_SCALE = 10**6


@query(
    "q_text_bm25",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, t.term,
               len(string_split(text, ' ')) AS dl
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    ),
    corpus AS (
        SELECT count(DISTINCT doc_id) AS n,
               CAST(count(*) AS BIGINT) AS l
        FROM toks
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
        FROM toks
        WHERE term IN ('dup', 'hash', 'join')
        GROUP BY 1, 2
    ),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY 1
    ),
    scored AS (
        SELECT tf.doc_id,
               sum(((corpus.n - df.df) * {_IDF_SCALE} // df.df)
                   * (22 * corpus.l * tf.tf)
                   // (10 * corpus.l * tf.tf + 3 * corpus.l
                       + 9 * tf.dl * corpus.n)) AS score_s
        FROM tf JOIN df USING (term) CROSS JOIN corpus
        GROUP BY 1
    )
    SELECT doc_id, CAST(score_s AS BIGINT) AS score_scaled,
           round(score_s / 1000000e0, 4) AS bm25
    FROM scored
    ORDER BY score_s DESC, doc_id
    LIMIT 20
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 (rational variant, exact integers) for
    the fixed query ``dup hash join``.

    Plan: one explode → (doc,term) tf aggregate filtered to the three
    query terms (the filter lands *before* the aggregate, so the
    shuffle carries only matching tokens), df and corpus stats as two
    tiny broadcast sides, TakeOrderedAndProject for the top-k.  At
    100 TB the only growing shuffle is the (doc_id, term) tf aggregate
    — everything else is O(|terms|) or a scalar.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split("text", " ")).alias("term"),
        F.size(F.split("text", " ")).alias("dl"),
    )
    corpus = toks.agg(
        F.countDistinct("doc_id").alias("n"),
        F.count("*").alias("l"),
    )
    tf = (
        toks.where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr(
                    f"((n - df) * {_IDF_SCALE} div df)"
                    " * (22 * l * tf)"
                    " div (10 * l * tf + 3 * l + 9 * dl * n)"
                )
            ).alias("score_s")
        )
    )
    return (
        scored.select(
            "doc_id",
            F.col("score_s").cast("long").alias("score_scaled"),
            F.round(F.col("score_s") / F.lit(1000000.0), 4).alias("bm25"),
        )
        .orderBy(F.col("score_scaled").desc(), "doc_id")
        .limit(20)
    )


@query(
    "q_text_readability",
    oracle="""
    WITH per_doc AS (
        SELECT lang,
               len(string_split(text, ' ')) AS w,
               len(regexp_extract_all(text, '[aeiou]+')) AS v,
               greatest(n_chars // 80, 1) AS s
        FROM documents
    ),
    scored AS (
        SELECT lang,
               CAST(floor((206.835
                           - 1.015 * (CAST(w AS DOUBLE) / s)
                           - 84.6 * (CAST(v AS DOUBLE) / w)) / 10)
                    AS BIGINT) AS band
        FROM per_doc
    )
    SELECT lang, band, count(*) AS n_docs
    FROM scored GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability banding per language: score =
    206.835 − 1.015·(W/S) − 84.6·(V/W) with W = whitespace tokens,
    V = vowel groups (syllable proxy), S = max(n_chars//80, 1)
    (synthetic-sentence proxy — this corpus has no punctuation;
    documented spec, not an approximation bug).

    Per-doc inputs are exact integers; the score is one float
    expression and only its band ``floor(score/10)`` (identical on
    identical doubles) enters the aggregate — no cross-row float sums.
    Plan: stateless per-row map + one small hash aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.size(F.split("text", " ")).alias("w"),
        F.size(F.regexp_extract_all("text", F.lit("[aeiou]+"), F.lit(0))).alias(
            "v"
        ),
        F.greatest(F.expr("n_chars div 80"), F.lit(1)).alias("s"),
    )
    scored = per_doc.select(
        "lang",
        F.floor(
            (
                F.lit(206.835)
                - F.lit(1.015) * (F.col("w").cast("double") / F.col("s"))
                - F.lit(84.6) * (F.col("v").cast("double") / F.col("w"))
            )
            / 10
        )
        .cast("long")
        .alias("band"),
    )
    return (
        scored.groupBy("lang", "band")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "band")
    )


# --------------------------------------------------------------------------
# Ranking-quality evaluation: nDCG@10 and reciprocal rank / recall@10
# --------------------------------------------------------------------------

#: 1/log2(r+1) for ranks 1..10, rounded to 6 decimals and embedded as
#: LITERALS in both engines: every DCG term is then a product of a
#: small int and an identical double literal, and the sum is written in
#: one fixed left-associative expression — bit-identical cross-engine
#: (the Levene/Cramér fixed-order-literal-float pattern, SURVEY §7.5;
#: live log2 calls would risk 1-ulp libm drift instead).
_DCG_D = (
    "1.0", "0.63093", "0.5", "0.430677", "0.386853",
    "0.356207", "0.333333", "0.315465", "0.30103", "0.289065",
)
_IR_EVAL_PROBES = 5


def _dcg_expr(rel_fmt: str) -> str:
    """Fixed-order literal sum Σ_r d_r · rel_r (rel_fmt has one {r}).
    The literals are cast to DOUBLE explicitly — BOTH engines parse
    bare decimal literals as DECIMAL (CLAUDE.md), which would change
    the arithmetic and leak a forbidden DECIMAL output type."""
    return " + ".join(
        f"CAST({d} AS DOUBLE) * ({rel_fmt.format(r=r)})"
        for r, d in enumerate(_DCG_D, 1)
    )


_IR_RANKED_SQL = """
    probes AS (
        SELECT doc_id AS probe_id, lang AS p_lang, source AS p_src
        FROM documents ORDER BY doc_id LIMIT {k}
    ),
    ptok AS (
        SELECT DISTINCT p.probe_id, t.tok
        FROM probes p JOIN documents d ON d.doc_id = p.probe_id,
             unnest(string_split(d.text, ' ')) AS t(tok)
    ),
    ctok AS (
        SELECT DISTINCT doc_id AS cand_id, t.tok
        FROM documents, unnest(string_split(text, ' ')) AS t(tok)
    ),
    scored AS (
        SELECT p.probe_id, c.cand_id, count(*) AS shared
        FROM ptok p JOIN ctok c ON c.tok = p.tok
        WHERE c.cand_id <> p.probe_id
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT s.probe_id, s.cand_id, s.shared,
               CASE WHEN d.lang = p.p_lang AND d.source = p.p_src THEN 2
                    WHEN d.lang = p.p_lang THEN 1 ELSE 0 END AS rel,
               row_number() OVER (PARTITION BY s.probe_id
                                  ORDER BY s.shared DESC, s.cand_id) AS rk
        FROM scored s
        JOIN documents d ON d.doc_id = s.cand_id
        JOIN probes p ON p.probe_id = s.probe_id
    )
""".format(k=_IR_EVAL_PROBES)


def _ranked_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per probe (the {k} lowest doc_ids), every other document ranked
    by shared-distinct-token count (exact ints, doc_id tie-break) with
    its graded relevance: 2 = same (lang, source), 1 = same lang.

    100 TB posture: the probe token set is tiny and broadcasts; the
    candidate side is one explode→distinct→join→count pipeline —
    linear in corpus tokens, shuffling (probe, cand, count) triples
    only.""".format(k=_IR_EVAL_PROBES)
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    probes = (
        d.orderBy("doc_id")
        .limit(_IR_EVAL_PROBES)
        .select(
            F.col("doc_id").alias("probe_id"),
            F.col("lang").alias("p_lang"),
            F.col("source").alias("p_src"),
            "text",
        )
    )
    ptok = probes.select(
        "probe_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    ctok = d.select(
        F.col("doc_id").alias("cand_id"),
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
    )
    scored = (
        ctok.join(F.broadcast(ptok), "tok")
        .filter(F.col("cand_id") != F.col("probe_id"))
        .groupBy("probe_id", "cand_id")
        .agg(F.count("*").alias("shared"))
    )
    rel = (
        scored.join(
            d.select(
                F.col("doc_id").alias("cand_id"),
                F.col("lang").alias("c_lang"),
                F.col("source").alias("c_src"),
            ),
            "cand_id",
        )
        .join(F.broadcast(probes.drop("text")), "probe_id")
        .withColumn(
            "rel",
            F.when(
                (F.col("c_lang") == F.col("p_lang"))
                & (F.col("c_src") == F.col("p_src")),
                2,
            )
            .when(F.col("c_lang") == F.col("p_lang"), 1)
            .otherwise(0),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("shared").desc(), "cand_id"
    )
    return rel.withColumn("rk", F.row_number().over(w)).select(
        "probe_id", "cand_id", "shared", "rel", "rk"
    )


@query(
    "q_ir_ndcg",
    oracle="WITH "
    + _IR_RANKED_SQL
    + """,
    pivoted AS (
        SELECT probe_id,
               {rel_cols},
               count(CASE WHEN rel = 2 THEN 1 END) AS n2,
               count(CASE WHEN rel = 1 THEN 1 END) AS n1
        FROM ranked GROUP BY probe_id
    )
    SELECT probe_id,
           round({dcg}, 4) AS dcg10,
           round({idcg}, 4) AS idcg10,
           CASE WHEN ({idcg}) > 0
                THEN round(({dcg}) / ({idcg}), 4) END AS ndcg10
    FROM pivoted
    """.format(
        rel_cols=", ".join(
            f"coalesce(max(CASE WHEN rk = {r} THEN rel END), 0) AS rel_{r}"
            for r in range(1, 11)
        ),
        dcg=_dcg_expr("rel_{r}"),
        idcg=_dcg_expr(
            "CASE WHEN {r} <= n2 THEN 2 WHEN {r} <= n2 + n1 THEN 1 ELSE 0 END"
        ),
    ),
)
def q_ir_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per probe — the graded ranking-quality metric every
    retrieval / rerank pipeline reports.  Candidates are ranked by an
    exact-integer overlap score; relevance grades (2 = same lang +
    source, 1 = same lang) come from the corpus metadata, so DCG's
    only floats are the ten literal discounts 1/log2(r+1) — embedded
    pre-rounded in BOTH engines and summed in one fixed-order
    expression (cross-engine bit-identical; live log2 would risk libm
    drift).  IDCG re-uses the same literals over the ideal grade
    layout (n2 twos, then n1 ones), so ndcg needs no second sort."""
    r = _ranked_candidates(spark, sf_dir)
    pivot = r.groupBy("probe_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("rk") == rr, F.col("rel"))), F.lit(0)
            ).alias(f"rel_{rr}")
            for rr in range(1, 11)
        ],
        F.count(F.when(F.col("rel") == 2, 1)).alias("n2"),
        F.count(F.when(F.col("rel") == 1, 1)).alias("n1"),
    )
    dcg = F.expr(_dcg_expr("rel_{r}"))
    idcg = F.expr(
        _dcg_expr(
            "CASE WHEN {r} <= n2 THEN 2 WHEN {r} <= n2 + n1 THEN 1 ELSE 0 END"
        )
    )
    return pivot.select(
        "probe_id",
        F.round(dcg, 4).alias("dcg10"),
        F.round(idcg, 4).alias("idcg10"),
        F.when(idcg > 0, F.round(dcg / idcg, 4)).alias("ndcg10"),
    )


@query(
    "q_ir_mrr",
    oracle="WITH "
    + _IR_RANKED_SQL
    + """
    SELECT probe_id,
           min(CASE WHEN rel = 2 THEN rk END) AS first_rel,
           round(1.0 / min(CASE WHEN rel = 2 THEN rk END), 4) AS rr,
           CAST(count(CASE WHEN rel = 2 AND rk <= 10 THEN 1 END) AS BIGINT)
               AS found10,
           CASE WHEN count(CASE WHEN rel = 2 THEN 1 END) > 0
                THEN round(
                    CAST(count(CASE WHEN rel = 2 AND rk <= 10 THEN 1 END)
                         AS DOUBLE)
                    / least(count(CASE WHEN rel = 2 THEN 1 END), 10), 4)
           END AS recall10
    FROM ranked GROUP BY probe_id
    """,
)
def q_ir_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank + recall@10 per probe — the binary companions
    to q_ir_ndcg (rel = 2, the same-(lang, source) grade, is the
    "relevant" class).  Every statistic is a per-row division of two
    exact integers (rank / counts), so there is no cross-row float
    sum to drift; the aggregated MRR is the mean of the rr column,
    left to the consumer exactly like the reference's per-query eval
    tables."""
    r = _ranked_candidates(spark, sf_dir)
    first_rel = F.min(F.when(F.col("rel") == 2, F.col("rk")))
    n_rel = F.count(F.when(F.col("rel") == 2, 1))
    found10 = F.count(F.when((F.col("rel") == 2) & (F.col("rk") <= 10), 1))
    return r.groupBy("probe_id").agg(
        first_rel.alias("first_rel"),
        F.round(F.lit(1.0) / first_rel, 4).alias("rr"),
        found10.cast("long").alias("found10"),
        F.when(
            n_rel > 0,
            F.round(found10.cast("double") / F.least(n_rel, F.lit(10)), 4),
        ).alias("recall10"),
    )


@query(
    "q_ir_expand",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, t.term,
               len(string_split(text, ' ')) AS dl
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    ),
    corpus AS (
        SELECT count(DISTINCT doc_id) AS n,
               CAST(count(*) AS BIGINT) AS l
        FROM toks
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
        FROM toks
        WHERE term IN ('dup', 'hash', 'join')
        GROUP BY 1, 2
    ),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY 1
    ),
    scored AS (
        SELECT tf.doc_id,
               sum(((corpus.n - df.df) * {_IDF_SCALE} // df.df)
                   * (22 * corpus.l * tf.tf)
                   // (10 * corpus.l * tf.tf + 3 * corpus.l
                       + 9 * tf.dl * corpus.n)) AS score_s
        FROM tf JOIN df USING (term) CROSS JOIN corpus
        GROUP BY 1
    ),
    top10 AS (
        SELECT doc_id FROM scored ORDER BY score_s DESC, doc_id LIMIT 10
    ),
    alltf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dfall AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM alltf GROUP BY 1
    )
    SELECT a.term,
           CAST(sum(a.tf * ((corpus.n - dfall.df) * {_IDF_SCALE}
                            // dfall.df)) AS BIGINT) AS exp_score,
           CAST(any_value(dfall.df) AS BIGINT) AS df
    FROM alltf a
    JOIN top10 USING (doc_id)
    JOIN dfall USING (term)
    CROSS JOIN corpus
    WHERE a.term NOT IN ('dup', 'hash', 'join')
    GROUP BY a.term
    ORDER BY exp_score DESC, a.term
    LIMIT 15
    """,
)
def q_ir_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM3 shape): run the
    fixed BM25 query, take the top-10 feedback documents, and score
    every term they contain by Sum tf(term, d) x rational-idf(term) —
    the top-15 non-query terms are the expansion the second retrieval
    round would add.  All-integer (the q_text_bm25 rational variant's
    idf), so the expansion list is bit-identical cross-engine.

    Scale: the only corpus-sized shuffles are the (doc, term) tf
    aggregate and the df aggregate it already shares with BM25; the
    feedback side is 10 broadcast doc ids pruning alltf BEFORE the
    expansion aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split("text", " ")).alias("term"),
        F.size(F.split("text", " ")).alias("dl"),
    )
    corpus = toks.agg(
        F.countDistinct("doc_id").alias("n"), F.count("*").alias("l")
    )
    tf = (
        toks.where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr(
                    f"((n - df) * {_IDF_SCALE} div df)"
                    " * (22 * l * tf)"
                    " div (10 * l * tf + 3 * l + 9 * dl * n)"
                )
            ).alias("score_s")
        )
    )
    top10 = (
        scored.orderBy(F.col("score_s").desc(), "doc_id")
        .limit(10)
        .select("doc_id")
    )
    alltf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfall = alltf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        alltf.join(F.broadcast(top10), "doc_id")
        .filter(~F.col("term").isin(*_BM25_TERMS))
        .join(dfall, "term")
        .crossJoin(F.broadcast(corpus))
        .groupBy("term")
        .agg(
            F.sum(
                F.expr(f"tf * ((n - df) * {_IDF_SCALE} div df)")
            )
            .cast("long")
            .alias("exp_score"),
            F.first("df").cast("long").alias("df"),
        )
        .orderBy(F.col("exp_score").desc(), "term")
        .limit(15)
    )


#: RBO persistence p = 0.9 — the ten literal weights p^(d-1), exact
#: decimals (9^k/10^k), CAST AS DOUBLE in both engines (bare decimal
#: literals are DECIMAL in both — the r6 trap).
_RBO_W = (
    "1.0", "0.9", "0.81", "0.729", "0.6561", "0.59049", "0.531441",
    "0.4782969", "0.43046721", "0.387420489",
)
#: (1 - p) * Σ_d p^(d-1) · o_d / d — ONE fixed-order expression shared
#: verbatim by both engines (no cross-row float sum; o_d are BIGINT).
_RBO_EXPR = "CAST(0.1 AS DOUBLE) * (" + " + ".join(
    f"CAST(o_{d} AS DOUBLE) * CAST({w} AS DOUBLE) / {d}"
    for d, w in enumerate(_RBO_W, start=1)
) + ")"
_RBO_O_COLS = ", ".join(
    f"CAST(coalesce(sum(CASE WHEN m <= {d} THEN 1 ELSE 0 END), 0)"
    f" AS BIGINT) AS o_{d}"
    for d in range(1, 11)
)


@query(
    "q_ir_rbo",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, t.term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    ),
    stats AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY term
    ),
    a AS (
        SELECT term, row_number() OVER (ORDER BY df DESC, term) AS ra
        FROM stats ORDER BY df DESC, term LIMIT 10
    ),
    b AS (
        SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS rb
        FROM stats ORDER BY tf DESC, term LIMIT 10
    ),
    pairs AS (
        SELECT greatest(a.ra, b.rb) AS m FROM a JOIN b USING (term)
    ),
    o AS (SELECT {_RBO_O_COLS} FROM pairs)
    SELECT o_1 AS overlap1, o_10 AS overlap10,
           round({_RBO_EXPR}, 4) AS rbo_at_10
    FROM o
    """,
)
def q_ir_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap (Webber et al. 2010) at p = 0.9, TRUNCATED
    at depth 10 — the prefix sum (1-p)·Σ_{d≤10} p^(d-1)·o_d/d, i.e.
    the RBO@k partial ("extrapolation base"), NOT the paper's RBO_MIN
    lower bound, which additionally subtracts the X_k residual term
    (ADVICE r08: the output column is named rbo_at_10 accordingly) —
    between two term rankings of the same corpus — ranking by DOCUMENT
    frequency vs ranking by raw OCCURRENCE count (the two "systems"
    every index tuner compares: does df-weighting reorder the head?).
    RBO is the top-weighted rank-similarity measure retrieval teams
    report where Kendall's tau over-weights the tail.

    Determinism: both top-10 lists use the exact-integer score with a
    unique (score desc, term asc) tie-break; per-depth overlaps o_d
    are exact BIGINT counts of max(ra, rb) ≤ d over the joined lists;
    the only float work is the ONE fixed-order literal-weight sum
    (p^(d-1) embedded as exact decimal literals, CAST AS DOUBLE —
    _RBO_EXPR is shared verbatim by both engines).

    Scale shape: term stats are one explode→hash-agg; each ranking is
    TakeOrderedAndProject (top-10 of any vocabulary size, no global
    sort); the row_number windows run over the 10-row LIMIT outputs
    (k-bounded, allowlisted)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    stats = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count("*").cast("long").alias("tf"),
        )
    )
    a10 = stats.orderBy(F.col("df").desc(), "term").limit(10)
    b10 = stats.orderBy(F.col("tf").desc(), "term").limit(10)
    a = a10.select(
        "term",
        F.row_number()
        .over(Window.orderBy(F.col("df").desc(), "term"))
        .alias("ra"),
    )
    b = b10.select(
        "term",
        F.row_number()
        .over(Window.orderBy(F.col("tf").desc(), "term"))
        .alias("rb"),
    )
    pairs = a.join(b, "term").select(
        F.greatest("ra", "rb").alias("m")
    )
    o = pairs.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("m") <= dd, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"o_{dd}")
            for dd in range(1, 11)
        ]
    )
    return o.select(
        F.col("o_1").alias("overlap1"),
        F.col("o_10").alias("overlap10"),
        F.round(F.expr(_RBO_EXPR), 4).alias("rbo_at_10"),
    )


@query(
    "q_ir_tau",
    oracle="""
    WITH toks AS (
        SELECT doc_id, t.term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    ),
    stats AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY term
    ),
    a AS (
        SELECT term, row_number() OVER (ORDER BY df DESC, term) AS ra
        FROM stats ORDER BY df DESC, term LIMIT 10
    ),
    b AS (
        SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS rb
        FROM stats ORDER BY tf DESC, term LIMIT 10
    ),
    m AS (SELECT a.ra, b.rb FROM a JOIN b USING (term)),
    pairs AS (
        SELECT CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS np
        FROM m x JOIN m y ON x.ra < y.ra
    )
    SELECT c AS concordant, d AS discordant, np AS n_pairs,
           CASE WHEN np > 0
                THEN round(CAST(c - d AS DOUBLE) / np, 4) END AS tau
    FROM pairs
    """,
)
def q_ir_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ (tau-a) between the q_ir_rbo ranking pair — the
    FULL-list rank-correlation companion: RBO answers "do the heads
    agree?" (top-weighted), τ answers "is the overall order
    consistent?" — retrieval teams report both before swapping a
    ranker.  Computed on the terms present in BOTH top-10 lists
    (the joint set; ranks are unique by construction so there are no
    ties and tau-a ≡ tau-b).

    Determinism: concordant/discordant are exact BIGINT counts of the
    sign of (Δra)·(Δrb) over the ≤45 matched pairs; τ = (C−D)/n_pairs
    is the single final division.  The pair join is over the ≤10-row
    matched set — constant work at any corpus size; everything heavy
    (term stats) is the same explode→hash-agg + TakeOrdered top-10 as
    q_ir_rbo."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    stats = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count("*").cast("long").alias("tf"),
        )
    )
    a = stats.orderBy(F.col("df").desc(), "term").limit(10).select(
        "term",
        F.row_number()
        .over(Window.orderBy(F.col("df").desc(), "term"))
        .alias("ra"),
    )
    b = stats.orderBy(F.col("tf").desc(), "term").limit(10).select(
        "term",
        F.row_number()
        .over(Window.orderBy(F.col("tf").desc(), "term"))
        .alias("rb"),
    )
    m = a.join(b, "term").select("ra", "rb")
    x = m.select(F.col("ra").alias("xra"), F.col("rb").alias("xrb"))
    y = m.select(F.col("ra").alias("yra"), F.col("rb").alias("yrb"))
    sign = (F.col("xra") - F.col("yra")) * (F.col("xrb") - F.col("yrb"))
    pairs = (
        x.join(y, F.col("xra") < F.col("yra"))
        .agg(
            F.sum(F.when(sign > 0, 1).otherwise(0)).cast("long").alias("c"),
            F.sum(F.when(sign < 0, 1).otherwise(0)).cast("long").alias("d"),
            F.count("*").cast("long").alias("np"),
        )
    )
    return pairs.select(
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("np").alias("n_pairs"),
        F.when(
            F.col("np") > 0,
            F.round((F.col("c") - F.col("d")).cast("double") / F.col("np"), 4),
        ).alias("tau"),
    )


#: AP@10 exact-rational coefficients: lcm(1..10) = 2520, so every
#: precision-at-k term b_k·relcnt(k)/k scales to the BIGINT
#: b_k·relcnt(k)·(2520/k) and the numerator sums exactly.
_AP_L = 2520
_AP_NUM = " + ".join(
    "b_{k} * ({cum}) * {c}".format(
        k=k,
        cum=" + ".join(f"b_{j}" for j in range(1, k + 1)),
        c=_AP_L // k,
    )
    for k in range(1, 11)
)
_AP_B_COLS = ", ".join(
    f"CAST(coalesce(max(CASE WHEN rk = {k} AND rel = 2 THEN 1 END), 0)"
    f" AS BIGINT) AS b_{k}"
    for k in range(1, 11)
)


@query(
    "q_ir_ap",
    oracle="WITH "
    + _IR_RANKED_SQL
    + f""",
    pivoted AS (
        SELECT probe_id, {_AP_B_COLS},
               CAST(count(CASE WHEN rel = 2 THEN 1 END) AS BIGINT) AS n_rel
        FROM ranked GROUP BY probe_id
    )
    SELECT probe_id, n_rel,
           CAST({_AP_NUM} AS BIGINT) AS ap_num,
           CASE WHEN n_rel > 0
                THEN round(CAST({_AP_NUM} AS DOUBLE)
                           / ({_AP_L} * least(n_rel, 10)), 4) END AS ap10
    FROM pivoted
    """,
)
def q_ir_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average Precision @ 10 per probe — the PR-curve companion to
    q_ir_ndcg/q_ir_mrr that completes the standard IR-eval trio
    (AP is what MAP averages; rel = 2, the same-(lang, source) grade,
    is the binary relevant class exactly as in q_ir_mrr).

    Exact-rational discipline: AP@10 = Σ_k [rel@k]·P@k / min(R,10)
    has per-depth precisions with denominators 1..10, so the numerator
    is carried as the exact BIGINT Σ b_k·relcnt(k)·(2520/k)
    (lcm(1..10) = 2520) in ONE fixed-order expression shared verbatim
    by both engines; the only float op is the final division.

    Scale shape: shares q_ir_ndcg's ranked-candidate pipeline (probe
    tokens broadcast, one explode→join→count), then a 10-flag pivot
    per probe — constant work per probe at any corpus size."""
    r = _ranked_candidates(spark, sf_dir)
    pivot = r.groupBy("probe_id").agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("rk") == k) & (F.col("rel") == 2), 1
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"b_{k}")
            for k in range(1, 11)
        ],
        F.count(F.when(F.col("rel") == 2, 1)).cast("long").alias("n_rel"),
    )
    ap_num = F.expr(_AP_NUM)
    return pivot.select(
        "probe_id",
        "n_rel",
        ap_num.cast("long").alias("ap_num"),
        F.when(
            F.col("n_rel") > 0,
            F.round(
                ap_num.cast("double")
                / (_AP_L * F.least(F.col("n_rel"), F.lit(10))),
                4,
            ),
        ).alias("ap10"),
    )


#: ERR@10 exact-rational machinery (Chapelle et al., CIKM 2009).  With
#: grades g ∈ {0,1,2} the stop probability is R_g = (2^g − 1)/2^gmax =
#: n_g/4 with n_g ∈ {0,1,3}, so every term (1/k)·R_k·Π_{i<k}(1−R_i)
#: is the exact rational (2520/k)·4^(10−k)·n_k·Π_{i<k}(4−n_i) over the
#: common denominator 2520·4^10 (lcm(1..10)·4^10).  Max term ≈ 2.0e9,
#: sum ≤ 2642411520 — BIGINT-safe with 9 digits to spare.
_ERR_DEN = 2520 * 4**10
_ERR_NUM = " + ".join(
    "{c} * n_{k}".format(c=(2520 // k) * 4 ** (10 - k), k=k)
    + "".join(f" * (4 - n_{i})" for i in range(1, k))
    for k in range(1, 11)
)
_ERR_N_COLS = ", ".join(
    f"CAST(coalesce(max(CASE WHEN rk = {k} THEN"
    f" CASE rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END END), 0)"
    f" AS BIGINT) AS n_{k}"
    for k in range(1, 11)
)


@query(
    "q_ir_err",
    oracle="WITH "
    + _IR_RANKED_SQL
    + f""",
    pivoted AS (
        SELECT probe_id, {_ERR_N_COLS}
        FROM ranked GROUP BY probe_id
    )
    SELECT probe_id,
           CAST({_ERR_NUM} AS BIGINT) AS err_num,
           round(CAST({_ERR_NUM} AS DOUBLE) / {_ERR_DEN}, 4) AS err10
    FROM pivoted
    """,
)
def q_ir_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Reciprocal Rank @ 10 per probe (Chapelle et al. 2009)
    — the cascade-model ranking metric that, unlike nDCG's static
    discounts, discounts each rank by the probability the user was
    already satisfied ABOVE it: ERR = Σ_k (1/k)·R_k·Π_{i<k}(1−R_i)
    with stop probability R_g = (2^g−1)/2^gmax over the same graded
    relevance (2 = same lang+source, 1 = same lang) as q_ir_ndcg.

    Exact-rational discipline: R ∈ {0, 1/4, 3/4}, so the whole sum is
    carried as ONE exact-BIGINT numerator over 2520·4^10 — numerator
    terms (2520/k)·4^(10−k)·n_k·Π_{i<k}(4−n_i) with n ∈ {0,1,3} — in
    a fixed-order expression shared verbatim by both engines; the only
    float op is the final division.  No live pow(), no float products.

    Scale shape: shares q_ir_ndcg's ranked-candidate pipeline (probe
    tokens broadcast, one explode→join→count), then a 10-column pivot
    per probe — constant work per probe at any corpus size."""
    r = _ranked_candidates(spark, sf_dir)
    pivot = r.groupBy("probe_id").agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        F.col("rk") == k,
                        F.when(F.col("rel") == 2, 3)
                        .when(F.col("rel") == 1, 1)
                        .otherwise(0),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"n_{k}")
            for k in range(1, 11)
        ]
    )
    num = F.expr(_ERR_NUM)
    return pivot.select(
        "probe_id",
        num.cast("long").alias("err_num"),
        F.round(num.cast("double") / F.lit(_ERR_DEN), 4).alias("err10"),
    )


#: RBP p = 0.8 exact-rational weights: (1−p)·p^(k−1) = 2·8^(k−1)/10^k,
#: so over the common denominator 10^10 the rank-k weight is the exact
#: BIGINT 2·8^(k−1)·10^(10−k) (k=1 → 2e9, k=10 → 268435456; the sum of
#: all ten is < 10^10).  The unseen-tail residual p^10 = 8^10/10^10.
_RBP_W = tuple(2 * 8 ** (k - 1) * 10 ** (10 - k) for k in range(1, 11))
_RBP_NUM = " + ".join(f"{w} * b_{k}" for k, w in enumerate(_RBP_W, 1))
_RBP_RESID = 8**10
_RBP_DEN = 10**10


@query(
    "q_ir_rbp",
    oracle="WITH "
    + _IR_RANKED_SQL
    + f""",
    pivoted AS (
        SELECT probe_id, {_AP_B_COLS}
        FROM ranked GROUP BY probe_id
    )
    SELECT probe_id,
           CAST({_RBP_NUM} AS BIGINT) AS rbp_num,
           round(CAST({_RBP_NUM} AS DOUBLE) / {_RBP_DEN}, 4) AS rbp10,
           round((CAST({_RBP_NUM} AS DOUBLE) + {_RBP_RESID})
                 / {_RBP_DEN}, 4) AS rbp10_max
    FROM pivoted
    """,
)
def q_ir_rbp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Precision @ 10, p = 0.8 (Moffat & Zobel, TOIS 2008)
    — the persistence-model precision metric: RBP = (1−p)·Σ_k b_k·
    p^(k−1), reported WITH its unseen-tail residual p^10 (rbp10 is the
    lower bound from the evaluated prefix, rbp10_max = rbp10 + p^10 the
    upper bound if every unjudged deeper rank were relevant — the
    honest pair the paper specifies for truncated evaluation, the same
    honesty ADVICE r08 asked of q_ir_rbo).  Binary relevance is
    rel = 2 (same lang+source), exactly as q_ir_mrr/q_ir_ap.

    Exact-rational discipline: (1−p)·p^(k−1) at p = 4/5 is the exact
    rational 2·8^(k−1)/10^k, so the sum is ONE exact-BIGINT numerator
    over 10^10 (integer weights 2·8^(k−1)·10^(10−k), fixed order,
    shared verbatim by both engines); the residual 8^10 is an integer
    literal.  The only float ops are the two final divisions.

    Scale shape: shares q_ir_ndcg's ranked-candidate pipeline, then a
    10-flag pivot per probe — constant work per probe at any corpus
    size."""
    r = _ranked_candidates(spark, sf_dir)
    pivot = r.groupBy("probe_id").agg(
        *[
            F.coalesce(
                F.max(
                    F.when((F.col("rk") == k) & (F.col("rel") == 2), 1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"b_{k}")
            for k in range(1, 11)
        ]
    )
    num = F.expr(_RBP_NUM)
    return pivot.select(
        "probe_id",
        num.cast("long").alias("rbp_num"),
        F.round(num.cast("double") / F.lit(_RBP_DEN), 4).alias("rbp10"),
        F.round(
            (num.cast("double") + F.lit(_RBP_RESID)) / F.lit(_RBP_DEN), 4
        ).alias("rbp10_max"),
    )


_BPREF_POOL = 100


@query(
    "q_ir_bpref",
    oracle="WITH "
    + _IR_RANKED_SQL
    + f""",
    pool AS (
        SELECT probe_id, rk,
               CASE WHEN rel >= 1 THEN 1 ELSE 0 END AS is_rel
        FROM ranked WHERE rk <= {_BPREF_POOL}
    ),
    run AS (
        SELECT probe_id, is_rel,
               CAST(coalesce(sum(1 - is_rel) OVER (
                   PARTITION BY probe_id ORDER BY rk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS n_above
        FROM pool
    ),
    tot AS (
        SELECT probe_id,
               CAST(sum(is_rel) AS BIGINT) AS r_cnt,
               CAST(sum(1 - is_rel) AS BIGINT) AS n_cnt
        FROM pool GROUP BY probe_id
    ),
    terms AS (
        SELECT r.probe_id,
               CAST(sum(CASE WHEN r.is_rel = 1
                        THEN least(r.n_above, t.r_cnt)
                        ELSE 0 END) AS BIGINT) AS sum_min
        FROM run r JOIN tot t USING (probe_id)
        GROUP BY r.probe_id
    )
    SELECT t.probe_id, t.r_cnt, t.n_cnt,
           CAST(t.r_cnt * least(t.r_cnt, t.n_cnt) - s.sum_min
                AS BIGINT) AS bpref_num,
           CAST(t.r_cnt * least(t.r_cnt, t.n_cnt) AS BIGINT) AS bpref_den,
           CASE WHEN t.r_cnt > 0 AND t.n_cnt > 0 THEN
               round(CAST(t.r_cnt * least(t.r_cnt, t.n_cnt) - s.sum_min
                          AS DOUBLE)
                     / (t.r_cnt * least(t.r_cnt, t.n_cnt)), 4)
           END AS bpref
    FROM tot t JOIN terms s USING (probe_id)
    ORDER BY t.probe_id
    """,
)
def q_ir_bpref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bpref over the shared ranked-candidate pipeline (Buckley &
    Voorhees 2004): the judged-pool preference metric — unlike AP/nDCG
    it scores only HOW OFTEN relevant documents rank above judged
    non-relevant ones, so it is the metric of choice when judgments
    are incomplete (here the judged pool is the top-{k} ranked
    candidates per probe; graded rel ≥ 1 binarizes to relevant).

    Exact arithmetic: bpref = (1/R)·Σ_rel (1 − min(n_above, R) /
    min(R, N)) is put over the common denominator R·min(R,N):
    num = R·min(R,N) − Σ min(n_above, R) — every term an exact BIGINT
    (n_above = judged non-relevant ranked above, a bounded running
    count), ONE final division.  R=0 or N=0 pools yield NULL bpref
    with the exact 0/0 pair visible, never a crash.

    Scale shape: the candidate ranking is the shared linear pipeline;
    the pool filter caps every per-probe window at {k} rows
    (k-bounded), and the probe count is fixed — the metric costs a
    constant on top of the ranking at any corpus size.""".format(
        k=_BPREF_POOL
    )
    from pyspark.sql import Window

    r = _ranked_candidates(spark, sf_dir)
    pool = r.where(F.col("rk") <= _BPREF_POOL).select(
        "probe_id",
        "rk",
        F.when(F.col("rel") >= 1, 1).otherwise(0).alias("is_rel"),
    )
    w = (
        Window.partitionBy("probe_id")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = pool.select(
        "probe_id",
        "is_rel",
        F.coalesce(F.sum(1 - F.col("is_rel")).over(w), F.lit(0))
        .cast("long")
        .alias("n_above"),
    )
    tot = pool.groupBy("probe_id").agg(
        F.sum("is_rel").cast("long").alias("r_cnt"),
        F.sum(1 - F.col("is_rel")).cast("long").alias("n_cnt"),
    )
    terms = (
        run.join(F.broadcast(tot), "probe_id")
        .groupBy("probe_id")
        .agg(
            F.sum(
                F.when(
                    F.col("is_rel") == 1,
                    F.least(F.col("n_above"), F.col("r_cnt")),
                ).otherwise(0)
            )
            .cast("long")
            .alias("sum_min")
        )
    )
    den = F.col("r_cnt") * F.least(F.col("r_cnt"), F.col("n_cnt"))
    num = den - F.col("sum_min")
    return (
        tot.join(terms, "probe_id")
        .select(
            "probe_id",
            "r_cnt",
            "n_cnt",
            num.cast("long").alias("bpref_num"),
            den.cast("long").alias("bpref_den"),
            F.when(
                (F.col("r_cnt") > 0) & (F.col("n_cnt") > 0),
                F.round(num.cast("double") / den, 4),
            ).alias("bpref"),
        )
        .orderBy("probe_id")
    )


@query(
    "q_ir_rprec",
    oracle="WITH "
    + _IR_RANKED_SQL
    + """,
    nrel AS (
        SELECT probe_id,
               CAST(count(CASE WHEN rel = 2 THEN 1 END) AS BIGINT)
                   AS n_rel
        FROM ranked GROUP BY probe_id
    ),
    hits AS (
        SELECT r.probe_id,
               CAST(count(CASE WHEN r.rel = 2 AND r.rk <= n.n_rel
                          THEN 1 END) AS BIGINT) AS n_hits,
               min(n.n_rel) AS n_rel
        FROM ranked r JOIN nrel n ON n.probe_id = r.probe_id
        GROUP BY r.probe_id
    )
    SELECT probe_id, n_rel, n_hits,
           CASE WHEN n_rel > 0
                THEN round(CAST(n_hits AS DOUBLE) / n_rel, 4)
           END AS r_precision
    FROM hits
    """,
)
def q_ir_rprec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-precision over the shared ranked-candidate pipeline:
    precision at rank R where R = the probe's total number of
    strictly-relevant candidates (rel = 2) — the break-even point
    where precision equals recall, the depth-free companion to the
    fixed-k metrics (P@10 flatters probes with few relevant docs;
    R-precision adapts the cutoff per probe).

    Determinism: R and the hit count inside the top-R window are
    exact BIGINTs off the deterministically tie-broken ranking (score
    DESC, cand_id ASC); the single division is the final float.  The
    rank filter rk <= R rides the same partitioned row_number as the
    other IR metrics — per-probe work, no global window."""
    ranked = _ranked_candidates(spark, sf_dir)
    nrel = ranked.groupBy("probe_id").agg(
        F.count(F.when(F.col("rel") == 2, 1)).cast("long").alias("n_rel")
    )
    hits = (
        ranked.join(F.broadcast(nrel), "probe_id")
        .groupBy("probe_id")
        .agg(
            F.count(
                F.when(
                    (F.col("rel") == 2) & (F.col("rk") <= F.col("n_rel")),
                    1,
                )
            )
            .cast("long")
            .alias("n_hits"),
            F.min("n_rel").alias("n_rel"),
        )
    )
    return hits.select(
        "probe_id",
        "n_rel",
        "n_hits",
        F.when(
            F.col("n_rel") > 0,
            F.round(F.col("n_hits").cast("double") / F.col("n_rel"), 4),
        ).alias("r_precision"),
    )
