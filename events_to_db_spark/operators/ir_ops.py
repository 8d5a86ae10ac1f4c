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
