"""Extended training-data-pipeline operators — SURVEY.md §2.10 scale
paths + the driver's north-star additions beyond the 71-query core.

Families:

* **Text analysis**: language-ID (unigram frequency model), quality
  scoring (length/punct/stopword ratios), token counting (whitespace +
  regex), document fingerprinting (shingle min-hash).
* **Scalable dedup**: MinHash-LSH banding (the 100 TB path whose
  candidates are verified exactly and hash-checked against a
  brute-force oracle) and 60-bit SimHash with banded Hamming search.
* **Similarity scale path**: random-hyperplane LSH bucketed ANN
  (approximate by design → rows-only check; recall asserted in tests).
* **Multimodal plumbing**: opaque binary columns with typed metadata
  and a partition-parallel decode stub (real decoder gated behind an
  optional import, deterministic fake otherwise).

Cross-engine determinism strategy: every hash is md5-derived
(identical in Spark, DuckDB, and Python's hashlib); every score that
feeds an argmax is exact integer or single-division rational (IEEE
division of identical ints is bit-identical across engines), never a
float sum whose accumulation order could differ.

Scale notes per operator inline.  None of these collect unbounded data
to the driver; all shuffles are on bounded keys (band hash, bucket id,
lang).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.plans.checkpoints import truncate_lineage
from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


def _spread_scan(df: DataFrame) -> DataFrame:
    """Repartition a scan up to the session's default parallelism when
    it has fewer partitions (same contract as ``llm_ops._spread``,
    duplicated here because llm_ops imports this module).  The
    documents table ships as ONE parquet file, so any expression-heavy
    derivation (per-doc shingle construction) otherwise runs on a
    single task regardless of core count (guide §2.5 input skew)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

#: Frequent function words in the synthetic corpus (measured top terms)
#: standing in for a stopword list.
STOPWORDS = ("the", "a", "key", "value", "row")

#: md5-hex-prefix → BIGINT, identical in Spark and DuckDB.
#: 15 hex digits = 60 bits, safely inside a signed 64-bit range.
_SPARK_H15 = "cast(conv(substr(md5(cast({x} as binary)), 1, 15), 16, 10) as bigint)"
_DUCK_H15 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@query(
    "q_text_langid",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, t.term AS term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    ),
    freq AS (SELECT lang AS l, term, count(*) AS n FROM toks GROUP BY 1, 2),
    tot AS (SELECT l, sum(n) AS total FROM freq GROUP BY 1),
    scored AS (
        SELECT toks.doc_id, toks.lang, freq.l AS cand,
               CAST(sum(freq.n) AS DOUBLE) / any_value(tot.total) AS score
        FROM toks
        JOIN freq ON freq.term = toks.term
        JOIN tot ON tot.l = freq.l
        GROUP BY toks.doc_id, toks.lang, freq.l
    ),
    pred AS (
        SELECT doc_id, lang, cand AS pred_lang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rn
        FROM scored
    )
    SELECT lang, pred_lang, count(*) AS n
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification by unigram frequency model: score each
    doc against every language's corpus-derived token distribution,
    predict the argmax, report the confusion matrix.

    Determinism: the score is ``(Σ integer counts) / total_l`` — one
    IEEE division of exact ints, bit-identical across engines, so the
    argmax (tie-break lang asc) cannot flip.  A log-likelihood variant
    would hit libm ulp differences; deliberately avoided (§7.5).

    Scale: token→freq join is a broadcast (|vocab|×|langs| rows);
    one shuffle on doc_id for the per-doc score aggregation."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    freq = toks.groupBy(F.col("lang").alias("l"), "term").agg(
        F.count("*").alias("n")
    )
    tot = freq.groupBy("l").agg(F.sum("n").alias("total"))
    scored = (
        toks.join(F.broadcast(freq), "term")
        .join(F.broadcast(tot), "l")
        .groupBy("doc_id", "lang", F.col("l").alias("cand"))
        .agg(
            (F.sum("n").cast("double") / F.first("total")).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("lang", F.col("cand").alias("pred_lang"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_text_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars,
               string_split(text, ' ') AS toks,
               len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct
        FROM documents
    )
    SELECT doc_id,
           len(toks)                                            AS n_toks,
           round(CAST(n_chars - len(toks) + 1 AS DOUBLE)
                 / len(toks), 4)                                AS avg_tok_len,
           round(CAST(n_punct AS DOUBLE) / n_chars, 4)          AS punct_ratio,
           round(CAST(len(list_filter(toks,
                 x -> list_contains({list(STOPWORDS)!r}, x))) AS DOUBLE)
                 / len(toks), 4)                                AS stop_ratio,
           CAST(len(toks) BETWEEN 30 AND 90
                AND CAST(len(list_filter(toks,
                    x -> list_contains({list(STOPWORDS)!r}, x))) AS DOUBLE)
                    / len(toks) < 0.5 AS BOOLEAN)               AS keep
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: token count, mean token length,
    punctuation ratio, stopword ratio, and a keep/drop gate — the
    filter stage of a pretraining data pipeline.  Pure columnar
    expressions; one scan, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = n_stop.cast("double") / n_toks
    return d.select(
        "doc_id",
        n_toks.alias("n_toks"),
        F.round(
            (F.col("n_chars") - n_toks + 1).cast("double") / n_toks, 4
        ).alias("avg_tok_len"),
        F.round(
            F.size(F.expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)")).cast(
                "double"
            )
            / F.col("n_chars"),
            4,
        ).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        (n_toks.between(30, 90) & (stop_ratio < 0.5)).alias("keep"),
    )


@query(
    "q_text_tokencount",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                    AS n_ws,
           len(regexp_extract_all(text, '[a-z0-9]+'))      AS n_word,
           len(regexp_extract_all(text,
               '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 ]'))        AS n_bpeish
    FROM documents
    """,
)
def q_text_tokencount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, word regex, and a
    BPE-ish bounded-piece regex (caps sub-token length like a BPE vocab
    does) — the unit-economics column every corpus report needs."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws"),
        F.size(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).alias(
            "n_word"
        ),
        F.size(
            F.expr(
                "regexp_extract_all(text, '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 ]', 0)"
            )
        ).alias("n_bpeish"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (
        SELECT doc_id,
               concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]) AS shingle
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 2)) AS i
              FROM t)
    )
    SELECT doc_id, min(md5(shingle)) AS fp
    FROM sh GROUP BY doc_id
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: minimum md5 over 3-token shingles (the
    1-hash core of MinHash; doubles as a content-defined id robust to
    small edits).  Shingles are built array-side, hashed and min-folded
    per row — no explode, no shuffle beyond the final projection."""
    d = load_table(spark, sf_dir, "documents")
    # toks bound once per row: Catalyst does not CSE split() inside
    # the lambda (PERF.md note 6) — inlining re-tokenizes per shingle.
    return (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.expr(
                "array_min(transform(slice(toks, 1, greatest(size(toks) - 2, 0)),"
                " (x, i) -> md5(cast(concat(x, ' ', toks[i + 1],"
                "                           ' ', toks[i + 2]) as binary))))"
            ).alias("fp"),
        )
        .filter(F.col("fp").isNotNull())
    )


# --------------------------------------------------------------------------
# Scalable deduplication
# --------------------------------------------------------------------------

#: MinHash parameters: 64 hashes, 32 bands × 2 rows.  P(miss) for a
#: true-Jaccard-0.8 pair = (1 − 0.8²)³² ≈ 6e-15 — the banding is
#: effectively lossless at the 0.8 threshold, so the exact-verified
#: output hash-matches a brute-force oracle.
MINHASH_K = 64
MINHASH_BANDS = 32
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS

#: Candidate rule: a pair must share at least this many band buckets
#: (r6, after the m100 deep-scaling run measured Θ(N²) background
#: candidates — PERF.md r6).  At the 0.8 verify threshold the band-
#: match probability is p = 0.8² = 0.64, so P(a true pair shares ≤ 1
#: of 32 bands) = 0.36³² + 32·0.64·0.36³¹ ≈ 2.5e-13 — still
#: effectively lossless — while background pairs (J ≈ 0.1–0.3,
#: p ≈ 0.01–0.09) mostly collide in exactly one bucket and drop,
#: cutting the candidate set ~3–7× before any token array moves.
#: Counting shared bands costs nothing extra: the ids-only band join
#: already groups by pair to deduplicate.
MINHASH_MIN_BANDS = 2


def _minhash_min_bands() -> int:
    """SPARK_GRAFT_MINHASH_MIN_BANDS overrides (1 restores the any-
    shared-bucket rule; property tests pin recall at both)."""
    import os

    return int(
        os.environ.get("SPARK_GRAFT_MINHASH_MIN_BANDS", str(MINHASH_MIN_BANDS))
    )


def minhash_candidate_pairs(d: DataFrame, block_cols: list | None = None) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs from 32-band MinHash LSH banding.

    ``d`` must carry ``doc_id`` plus a distinct-token array ``toks`` (and
    any ``block_cols``).  Returns doc-id pairs (doc_a < doc_b) that share
    at least one (band, band-hash) bucket — and, when ``block_cols`` is
    given, also agree on every block column (the band join key simply
    includes them, so cross-block pairs never materialize and the
    shuffle stays (doc_id, block, band, hash)-sized).

    This is the shared 100 TB candidate engine: `q_dedup_minhash` calls
    it unblocked; `q_dedup_near` auto-escalates onto it (with its
    (lang, source) blocks) when a block is too large for the in-block
    quadratic join.  P(missing a true Jaccard-0.8 pair) = (1-0.8^2)^32
    ~= 6e-15 — effectively lossless at the 0.8 verify threshold, which
    is why both callers can keep brute-force oracles.
    """
    block_cols = list(block_cols or [])
    # Signature kernel (r4, second pass): tokens are hashed to int64
    # ONCE JVM-side (one cheap transform), then ALL 64 min-hashes are
    # computed in a single Arrow-vectorized NumPy kernel — 64
    # multiply-add universal hashes over the batch's concatenated
    # token-hash vector + segment-min per doc (`minimum.reduceat`).
    # Rationale: Spark's higher-order-function lambdas are interpreted
    # per element, so the pure-Catalyst fold spent 44 s of the 50k-doc
    # tier's ~100 s band path on K×|toks| lambda evaluations; the
    # NumPy kernel does the same 128M multiply-mins in ~2 s (the
    # SimHash precedent: vectorize the per-doc fold, keep hashing and
    # banding JVM-side).  The signature function needs determinism
    # only — the oracle is brute-force all-pairs and the banding-
    # recall property test re-validates losslessness — so fixed
    # odd-multiplier wrap-around hashes are fine.  Empty/null token
    # sets get the int64 max sentinel — such docs bucket together and
    # the exact-Jaccard verify drops them.
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def minhash_sigs(th: pd.Series) -> pd.Series:
        rs = np.random.RandomState(0x5EED)
        mult = (
            rs.randint(0, 2**63, MINHASH_K, dtype=np.uint64) * 2 + 1
        )  # odd multipliers, full-width wrap
        addc = rs.randint(0, 2**63, MINHASH_K, dtype=np.uint64)
        sent = np.iinfo(np.int64).max
        arrs = [
            np.asarray(a if a is not None else [], dtype=np.int64)
            for a in th
        ]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        out = np.full((len(arrs), MINHASH_K), sent, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            # Segment-reduce over NON-EMPTY docs only: their starts are
            # strictly increasing and in-bounds, which reduceat
            # requires (an empty segment would silently read its
            # neighbour's element); empty docs keep the sentinel row.
            flat = np.concatenate([a for a in arrs if len(a)]).view(
                np.uint64
            )
            lens_nz = lens[nz]
            starts = np.zeros(len(lens_nz), dtype=np.int64)
            np.cumsum(lens_nz[:-1], out=starts[1:])
            res = np.empty((len(lens_nz), MINHASH_K), dtype=np.int64)
            with np.errstate(over="ignore"):
                for k in range(MINHASH_K):
                    hk = (mult[k] * flat + addc[k]).view(np.int64)
                    res[:, k] = np.minimum.reduceat(hk, starts)
            out[nz] = res
        return pd.Series(list(out))

    sig = d.select(
        "doc_id",
        *block_cols,
        F.expr("transform(toks, t -> xxhash64(t))").alias("th"),
    ).select("doc_id", *block_cols, minhash_sigs("th").alias("sig"))
    # Shuffle ONLY (doc_id, blocks, band, band-hash) — token arrays
    # would multiply the band-join shuffle by the doc length; callers
    # rejoin them after the pair set is deduplicated.
    bands = sig.select(
        "doc_id",
        *block_cols,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {MINHASH_BANDS - 1}), b ->"
                f" xxhash64(concat_ws(',', slice(sig, b * {MINHASH_ROWS} + 1,"
                f" {MINHASH_ROWS}))))"
            )
        ).alias("band", "bh"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), *block_cols, "band", "bh")
    b = bands.select(F.col("doc_id").alias("doc_b"), *block_cols, "band", "bh")
    # pair dedup doubles as the shared-band counter: requiring ≥2
    # shared buckets (MINHASH_MIN_BANDS) drops the single-collision
    # background pairs that dominate at scale, at a ~2.5e-13 miss
    # probability per true 0.8-Jaccard pair
    return (
        a.join(b, block_cols + ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("__nb"))
        .filter(F.col("__nb") >= _minhash_min_bands())
        .select("doc_a", "doc_b")
    )


#: Per-task pair budget for the in-block quadratic edit-distance
#: self-join: 2e10 comparisons (the banded-Levenshtein verify is ~25×
#: a Jaccard set op) ⇒ a 200k-row largest block at spark.task.cpus=1 —
#: past where the PassJoin segment index wins.  Derived via
#: plans/gates.block_rows_gate; SPARK_GRAFT_EDITDIST_BLOCK_MAX
#: overrides so tests can force escalation.
_EDITDIST_PAIR_BUDGET = 2e10


def _editdist_block_max() -> int:
    from events_to_db_spark.plans.gates import block_rows_gate

    return block_rows_gate(
        "SPARK_GRAFT_EDITDIST_BLOCK_MAX", _EDITDIST_PAIR_BUDGET
    )


def editdist_candidate_pairs(
    d: DataFrame,
    block_cols: list,
    key_col: str = "key",
    str_col: str = "name",
    k: int = 3,
) -> DataFrame:
    """Candidate key pairs for edit-distance-≤ *k* join via the
    PassJoin segment pigeonhole (Li/Deng/Feng, SIGMOD'11 — public
    algorithm): partition every string into ``k+1`` contiguous
    segments; if ``ed(a, b) ≤ k`` then at least one of *a*'s segments
    is untouched by all edits, so it appears in *b* verbatim, starting
    within ``±k`` of its position in *a*.  Candidates are therefore a
    join of

    * **index side** — each string's ``k+1`` segments, keyed by
      ``(blocks…, seg_idx, source_len, seg_text)``;
    * **probe side** — each string's substrings at the segment
      positions (±k) it *would* match for every plausible source
      length ``L ∈ [len−k, len+k]`` (|len diff| > k already implies
      ed > k, so other lengths can't pair).

    This is **lossless**: every true pair surfaces with the shorter
    enumeration budget of O((2k+1)²·(k+1)) ≈ 200 probe keys per row —
    linear in corpus size — replacing the O(Σ block²) blocked
    self-join.  Empty segments (strings shorter than ``k+1``) emit
    ``''`` keys and still match trivially, so short-string pairs are
    never lost; the exact banded-Levenshtein verify downstream discards
    false candidates either way.

    Returns ``(block_cols…, key_a, key_b)`` with ``key_a < key_b``,
    deduplicated.  Shuffle is (key, blocks, seg keys)-sized; the only
    quadratic residue is within a single ``(seg_idx, len, text)``
    bucket — ~10-char exact substrings, vastly more selective than a
    25-value brand block."""
    nseg = k + 1
    d = d.select(
        *block_cols,
        F.col(key_col).alias("key"),
        F.col(str_col).alias("name"),
    )
    # Index side: the k+1 exact segments of each string (integer `div`
    # so both bounds are exact floors; source length in the key keeps
    # probe enumeration honest about which partition it is matching).
    index = d.select(
        *block_cols,
        F.col("key").alias("key_a"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {k}), i -> struct("
                f" i AS seg, length(name) AS slen,"
                f" substring(name, cast((i * length(name)) div {nseg} as int) + 1,"
                f"  cast(((i + 1) * length(name)) div {nseg}"
                f"   - (i * length(name)) div {nseg} as int)) AS txt))"
            )
        ).alias("sk"),
    ).select(*block_cols, "key_a", "sk.seg", "sk.slen", "sk.txt")
    # Probe side: for every plausible source length L and segment i,
    # the substrings of this string at positions p_i(L) + d, d ∈ [-k,k]
    # (clamped to valid ranges) — the complete set of places an
    # untouched segment could land after ≤ k edits.
    probe = d.select(
        *block_cols,
        F.col("key").alias("key_b"),
        F.explode(
            F.expr(
                f"array_distinct(transform(filter(flatten(transform("
                f" sequence(greatest(length(name) - {k}, 0), length(name) + {k}), L ->"
                f" flatten(transform(sequence(0, {k}), i ->"
                f"  transform(sequence(-{k}, {k}), dd -> named_struct("
                f"   'seg', i, 'slen', L,"
                f"   'pos', (i * L) div {nseg} + dd,"
                f"   'len', ((i + 1) * L) div {nseg} - (i * L) div {nseg})))))),"
                f" x -> x.pos >= 0 AND x.pos + x.len <= length(name)),"
                f" x -> struct(x.seg AS seg, x.slen AS slen,"
                f"  substring(name, cast(x.pos as int) + 1, cast(x.len as int)) AS txt)))"
            )
        ).alias("sk"),
    ).select(*block_cols, "key_b", "sk.seg", "sk.slen", "sk.txt")
    pairs = (
        index.join(probe, block_cols + ["seg", "slen", "txt"])
        .filter(F.col("key_a") != F.col("key_b"))
        .select(
            *block_cols,
            F.least("key_a", "key_b").alias("key_a"),
            F.greatest("key_a", "key_b").alias("key_b"),
        )
    )
    return pairs.dropDuplicates(block_cols + ["key_a", "key_b"])


#: Small-vocabulary exact-mask gate (r11): vocabularies at or under
#: this many distinct tokens take the bitmask pair path in
#: q_dedup_minhash (a token set becomes one 64-bit mask; Jaccard is
#: two popcounts).  Hard-capped at 64 — the mask is a single BIGINT.
#: SPARK_GRAFT_MINHASH_MASK_MAX=0 forces the band engine (tests pin
#: path parity).
MINHASH_MASK_VOCAB_MAX = 64

#: Doc-count bound for broadcasting the build side of the mask path's
#: size-key join (≈28 B/row → ~28 MB at the default; guide §3.1's "a
#: few hundred MB is fine" with 10× headroom).  Above it the band
#: engine keeps the job shuffle-based rather than risking an
#: oversized broadcast.  SPARK_GRAFT_MINHASH_MASK_DOCS_MAX overrides.
MINHASH_MASK_DOCS_MAX = 1_000_000


def _minhash_mask_vocab_max() -> int:
    import os

    return min(
        int(
            os.environ.get(
                "SPARK_GRAFT_MINHASH_MASK_MAX", str(MINHASH_MASK_VOCAB_MAX)
            )
        ),
        64,
    )


def _minhash_mask_docs_max() -> int:
    import os

    return int(
        os.environ.get(
            "SPARK_GRAFT_MINHASH_MASK_DOCS_MAX", str(MINHASH_MASK_DOCS_MAX)
        )
    )


def _minhash_small_vocab(
    d: DataFrame, docs_gate: bool = True
) -> list | None:
    """The global token vocabulary, sorted, IF it fits the mask gate —
    else None (take the band engine).

    Probe discipline: one ``approx_count_distinct`` aggregation first
    (HLL sketch — no wide shuffle however large the vocabulary), the
    exact distinct-and-collect only when the sketch says ≤ 2× the gate
    (±2 % standard error makes 2× a safe margin), and a bounded
    ``limit(max+1)`` so a sketch undercount can never collect an
    unbounded vocabulary.  A realistic corpus pays exactly one extra
    cheap aggregation and falls through.

    ``docs_gate=False`` skips the doc-count bound — for callers whose
    mask path keeps the original join shape (no broadcast of all docs,
    e.g. ``llm_ops.near_dup_pairs``'s blocked/banded joins) the vocab
    size alone decides.

    Probe-job fusion (r11 opt, guide §1.2 "per-task work" applied to
    the DRIVER's job count): the approx pass and the doc-count gate
    are independent single-row aggregates, so they run as ONE Spark
    job via a two-branch union (each branch its own parallel stage) —
    the probe costs one job + the exact confirm instead of three
    driver round-trips.  The doc count is a plain ``count(*)`` (the
    aggregate prunes every column, so parquet answers it from footer
    row counts — cheaper than the old ``limit(n+1).count()``, which
    materialized rows through a LocalLimit)."""
    vmax = _minhash_mask_vocab_max()
    if vmax <= 0:
        return None
    toks_e = d.select(F.explode("toks").alias("t"))
    approx_q = toks_e.agg(
        F.approx_count_distinct("t").cast("double").alias("v")
    ).select(F.lit("vocab").alias("k"), "v")
    if docs_gate:
        approx_q = approx_q.unionAll(
            d.agg(F.count("*").cast("double").alias("v")).select(
                F.lit("docs").alias("k"), "v"
            )
        )
    probe = {r["k"]: r["v"] for r in approx_q.collect()}
    approx = probe.get("vocab")
    if approx is None or approx > 2 * vmax:
        return None
    if docs_gate and (probe.get("docs") or 0.0) > _minhash_mask_docs_max():
        return None
    return _exact_small_vocab(d, vmax)


def _exact_small_vocab(d: DataFrame, vmax: int) -> list | None:
    """The bounded exact confirm behind the approx probe: collect at
    most ``vmax + 1`` distinct tokens (a sketch undercount can never
    collect an unbounded vocabulary to the driver) and return the
    sorted FULL vocabulary, or None when it exceeds the gate.

    Shaped as ONE single-row aggregate — ``slice(sort_array(
    collect_set))`` — rather than ``distinct().limit()``: CollectLimit
    executes as an incremental partition sweep (1, 4, 16, … partitions
    = several job launches when matches are spread out), measured
    0.45–0.8 s vs ~0.3 s for the one-job form at sf0.1.  collect_set's
    partial buffers hold each partition's LOCAL vocabulary — the same
    bound the old distinct's partial hash-agg had — and this only runs
    once the sketch said the global vocabulary is ≤ 2·vmax."""
    rows = (
        d.select(F.explode("toks").alias("t"))
        .agg(
            F.slice(
                F.sort_array(F.collect_set("t")), 1, vmax + 1
            ).alias("v")
        )
        # .collect(), NOT .first(): first() plans a CollectLimit whose
        # incremental executeTake costs ~0.4 s of extra job launches on
        # a SINGLE-ROW aggregate (measured r11; collect() is 0.06 s).
        .collect()
    )
    row = rows[0] if rows else None
    vocab = list(row["v"]) if row and row["v"] is not None else []
    if not vocab or len(vocab) > vmax:
        return None
    return sorted(vocab)


def _vocab_mask_col(vocab: list):
    """Column: the 64-bit set mask of ``toks`` under ``vocab`` (≤ 64
    entries; bit *i* = membership of ``vocab[i]``).  Shared by the
    minhash mask path and ``near_dup_pairs``'s mask verify — popcount
    identities over these masks are exact because vocab→bit is a
    bijection over the COMPLETE vocabulary.

    Built as ONE ``F.expr`` string, not a ``create_map`` of column
    objects: the Column form issues 2 py4j round-trips per vocab entry
    (measured ~0.14 s of driver-side construction per call at 31
    tokens; the expr form is ~1 ms).  Bit values use
    ``shiftleft(1L, i)`` — a literal ``1 << 63`` would overflow the
    signed-long lit for a full 64-token vocabulary."""

    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    entries = ", ".join(
        f"'{esc(t)}', shiftleft(1L, {i})" for i, t in enumerate(vocab)
    )
    return F.expr(
        f"aggregate(toks, 0L, (acc, t) -> acc | element_at(map({entries}), t))"
    )


def _minhash_mask_pairs(d: DataFrame, vocab: list) -> DataFrame:
    """Exact Jaccard-≥0.8 pairs for a ≤64-token vocabulary: token set →
    64-bit mask, candidates from the lossless size prefilter turned
    equi-join key, verify = ``bit_count``.

    Candidate enumeration: J ≥ 0.8 forces 4·|A| ≤ 5·|B| ∧ 4·|B| ≤ 5·|A|
    (the same prefilter the band path applies) — so doc *a* emits every
    compatible partner size k ∈ [⌈4·na/5⌉, ⌊5·na/4⌋] and partners join
    on their exact size.  The predicate is symmetric in (na, k), so
    each qualifying unordered pair surfaces exactly twice and the
    ``doc_a < doc_b`` filter keeps exactly one — no dedup aggregation.
    The build side is all docs as (id, mask, size) ≈ 28 B/row,
    broadcast under the docs gate: the whole query is one broadcast
    hash join, zero shuffles of pair rows, zero Python stages.

    Exactness: vocab→bit is a bijection (the probe collected the FULL
    vocabulary), so popcount(mask_a & mask_b) = |A∩B| and
    |A∪B| = na + nb − |A∩B| (sets are distinct by construction).  The
    same integers feed the same double division and round(·, 4) as the
    band path's verify — bit-identical output."""
    m = d.select(
        "doc_id", _vocab_mask_col(vocab).alias("mask"), F.size("toks").alias("n")
    )
    a = m.select(
        F.col("doc_id").alias("doc_a"),
        F.col("mask").alias("mask_a"),
        F.col("n").alias("na"),
        F.explode(
            F.sequence(F.expr("(4 * n + 4) div 5"), F.expr("(5 * n) div 4"))
        ).alias("nk"),
    )
    b = m.select(
        F.col("doc_id").alias("doc_b"),
        F.col("mask").alias("mask_b"),
        F.col("n").alias("nb"),
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("nk") == F.col("nb")) & (F.col("doc_a") < F.col("doc_b")),
    )
    _i = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b")))
    jac = _i.cast("double") / (F.col("na") + F.col("nb") - _i)
    return (
        pairs.withColumn("jac", jac)
        .filter(F.col("jac") >= 0.8)
        .select("doc_a", "doc_b", F.round("jac", 4).alias("jac"))
    )


@query(
    "q_dedup_minhash",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jac
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
    """,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate detection — the 100 TB dedup path.

    Pipeline: token sets → 64 xxhash64-seeded min-hashes → 32 LSH bands →
    shuffle on (band, band-hash) → candidate pairs from shared buckets
    → exact Jaccard verification ≥ 0.8.  Cost is linear in corpus size
    + quadratic only within buckets; contrast with the brute-force
    oracle, which is the all-pairs O(n²) this query exists to avoid.
    The oracle comparison also proves the banding missed nothing
    (P(miss) ≈ 6e-15 at the threshold — see module constants).

    Honest caveat, measured at sf0.01: the synthetic corpus draws ~60
    tokens from a 31-word vocabulary, so *every* doc resembles every
    doc — 123,723 of 124,750 possible pairs survive banding and LSH
    degenerates to brute force plus overhead.  On a realistic corpus
    (large vocab, rare near-dups) bucket occupancy is near-uniform and
    the candidate set is a vanishing fraction of n²; the plan shape —
    shuffle on (band, band-hash), ids-only candidates, verify-after —
    is the one that scales.

    Small-vocabulary fast path (r11, guide §2.4 "remove shuffles
    outright"): when the corpus's global vocabulary fits in 64 distinct
    tokens — probed with one ``approx_count_distinct`` pass, confirmed
    exactly — every distinct-token set IS a 64-bit mask, and the
    lossless size prefilter (5·min ≥ 4·max) becomes an enumerable
    equi-join key: each doc explodes into its ≤ ⌈0.45·n⌉+1 compatible
    partner sizes and joins partners on exact size.  One broadcast
    hash join, ``bit_count(mask_a & mask_b)`` verify, zero banding,
    zero Python, zero pair-dedup aggregation — exact by construction
    (every size-compatible pair is enumerated; the same Jaccard
    integers feed the same double division).  Banding on this corpus
    was pure overhead (measured: 11.9M band candidates from 12.5M
    possible pairs at sf0.1 — see OPTIMIZATION_r11.md); the band
    engine stays the path for every corpus with a real vocabulary,
    and ``SPARK_GRAFT_MINHASH_MASK_MAX=0`` forces it for tests."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    vocab = _minhash_small_vocab(d)
    if vocab is not None:
        return _minhash_mask_pairs(d, vocab)
    # Signatures are built without explode — per row, transform the 64
    # seeds over the token array and min-fold with xxhash64 (JVM-side,
    # no string md5 round-trip).  The signature function needs
    # determinism only, not cross-engine parity: the oracle is
    # brute-force all-pairs, so banding quality is what is being
    # proven, not the hash values (10x cheaper than md5-conv).
    cand = minhash_candidate_pairs(d)
    # Verify ships int64 token hashes, not string arrays: ~5x smaller
    # pair shuffle and integer set-intersections (collision inside one
    # pair's <=100-token sets needs a 64-bit collision: ~1e-15).
    hashed = d.select(
        "doc_id",
        F.expr("transform(toks, t -> xxhash64(t))").alias("toks_h"),
    )
    toks_a = hashed.select(
        F.col("doc_id").alias("doc_a"), F.col("toks_h").alias("toks_a")
    )
    toks_b = hashed.select(
        F.col("doc_id").alias("doc_b"), F.col("toks_h").alias("toks_b")
    )
    # Lossless size prefilter BEFORE any token array moves (r6: the
    # m100 deep-scaling run measured the pair×array join as the scale
    # killer — ~640 B per candidate): J(A,B) ≥ 0.8 forces
    # 5·min(|A|,|B|) ≥ 4·max(|A|,|B|) (since |A∩B| ≤ min and
    # |A∪B| ≥ max), so mismatched-size pairs drop on two 8-byte ints
    # and only the survivors pay for arrays.  Exact-integer
    # comparison — can never drop a true pair.
    sizes = hashed.select("doc_id", F.size("toks_h").alias("n"))
    slim = (
        cand.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(
            5 * F.least(F.col("na"), F.col("nb"))
            >= 4 * F.greatest(F.col("na"), F.col("nb"))
        )
        .select("doc_a", "doc_b", "na", "nb")
    )
    # |∪| DERIVED from sizes (r11, mirroring near_dup_pairs): toks are
    # array_distinct'd, so |A∪B| = |A|+|B|−|A∩B| exactly — the sizes
    # are already in hand from the prefilter, array_intersect is the
    # one per-pair array op left (the old form ran array_union per
    # pair for a number already known).  Same integers → the same
    # double division → identical round(·, 4) as before.
    _i = F.size(F.array_intersect("toks_a", "toks_b"))
    jac = _i.cast("double") / (F.col("na") + F.col("nb") - _i)
    return (
        slim.join(toks_a, "doc_a")
        .join(toks_b, "doc_b")
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.8)
        .select("doc_a", "doc_b", F.round("jac", 4).alias("jac"))
    )


#: Exact-substring dedup window: 8 tokens.  Real pipelines use ~50
#: (Lee et al. 2022, "Deduplicating Training Data Makes Language
#: Models Better" — public arXiv:2107.06499); 8 suits this corpus's
#: 10–99-token docs while exercising the identical plan shape.
SUBSTR_W = 8


@query(
    "q_dedup_substring",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    w AS (
        SELECT doc_id, len(toks) AS n_toks,
               unnest(generate_series(1, greatest(len(toks) - {SUBSTR_W - 1}, 0))) AS s,
               toks
        FROM t
    ),
    w2 AS (
        SELECT doc_id, n_toks, s,
               concat_ws(' ', list_slice(toks, s, s + {SUBSTR_W - 1})) AS win
        FROM w
    ),
    hits AS (
        SELECT doc_id, n_toks, s FROM (
            SELECT doc_id, n_toks, s, count(*) OVER (PARTITION BY win) AS occ
            FROM w2
        ) WHERE occ > 1
    ),
    isl AS (
        SELECT doc_id, n_toks, s,
               CASE WHEN s > coalesce(max(s) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        + {SUBSTR_W - 1}, -1)
                    THEN 1 ELSE 0 END AS new_span
        FROM hits
    ),
    isl2 AS (
        SELECT doc_id, n_toks, s,
               sum(new_span) OVER (PARTITION BY doc_id ORDER BY s) AS span_id
        FROM isl
    ),
    spans AS (
        SELECT doc_id, n_toks, span_id,
               max(s) + {SUBSTR_W - 1} - min(s) + 1 AS cov
        FROM isl2 GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
           CAST(sum(cov) AS BIGINT)       AS dup_tokens,
           count(*)                       AS n_spans,
           round(CAST(sum(cov) AS DOUBLE) / n_toks, 4) AS dup_share
    FROM spans GROUP BY doc_id, n_toks
    """,
)
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. 2022 ExactSubstr
    dedup, re-expressed relationally): any SUBSTR_W(=8)-token window whose
    text occurs more than once in the corpus (within OR across docs)
    marks its token span as duplicated; overlapping marked windows merge
    into maximal spans, and each doc reports its duplicated-token count,
    span count, and duplicated share — the per-doc "cut list" an LLM
    ingest pipeline feeds to span removal.

    Plan (the 100 TB shape): one explode to (doc, start, window-hash) —
    windows travel as xxhash64 int64s, never as W-token strings —
    then a partial-agg `groupBy(wh)` occurrence count (map-side combine
    absorbs the boilerplate hot keys), an AQE-splittable equi-join to
    mark duplicated starts, and per-doc interval merging with
    doc-partitioned windows (gaps-and-islands, no global order).  The
    oracle groups by the raw window text instead — a hash-vs-text
    disagreement needs a 64-bit collision (~1e-11 at this corpus's
    24k windows).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    # sequence(1, n-W+1) DESCENDS when n < W (Spark trap) — guard with
    # an explicit empty array for short docs.
    wins = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.explode(
            F.expr(
                f"if(size(toks) >= {SUBSTR_W},"
                f" transform(sequence(1, size(toks) - {SUBSTR_W} + 1),"
                f" s -> struct(cast(s as bigint) as s,"
                f" xxhash64(concat_ws(' ', slice(toks, s, {SUBSTR_W}))) as wh)),"
                f" array())"
            )
        ).alias("w"),
    ).select("doc_id", "n_toks", F.col("w.s").alias("s"), F.col("w.wh").alias("wh"))
    dup = wins.groupBy("wh").count().filter(F.col("count") > 1).select("wh")
    hits = wins.join(dup, "wh").select("doc_id", "n_toks", "s")
    w_doc = Window.partitionBy("doc_id").orderBy("s")
    prev_end = (
        F.max("s").over(w_doc.rowsBetween(Window.unboundedPreceding, -1))
        + SUBSTR_W
        - 1
    )
    spans = (
        hits.withColumn(
            "new_span",
            F.when(F.col("s") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
        )
        .withColumn("span_id", F.sum("new_span").over(w_doc))
        .groupBy("doc_id", "n_toks", "span_id")
        .agg((F.max("s") + SUBSTR_W - 1 - F.min("s") + 1).alias("cov"))
    )
    return (
        spans.groupBy("doc_id", "n_toks")
        .agg(F.sum("cov").alias("dup_tokens"), F.count("*").alias("n_spans"))
        .select(
            "doc_id",
            "n_toks",
            "dup_tokens",
            "n_spans",
            F.round(F.col("dup_tokens") / F.col("n_toks"), 4).alias("dup_share"),
        )
    )


#: SimHash: 60 bits (15 md5 hex digits), banded 4×15 for Hamming ≤ 3
#: search — pigeonhole guarantees any pair within distance 3 shares at
#: least one intact band, so banded recall is exactly 100 %.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → 60-bit md5-based SimHash (distinct-token weighting).

    Token hashes are md5-derived JVM-side (cross-engine identical);
    the bit-balance fold runs as one vectorized pandas UDF over the
    per-doc hash array — integer-exact, so it matches the oracle's
    per-bit SQL formulation while avoiding the 60×-row bit explode
    (measured 5.6 s → sub-second at sf0.1)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def simhash_of(hashes: pd.Series) -> pd.Series:
        shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
        out = np.empty(len(hashes), dtype=np.int64)
        for i, hs in enumerate(hashes):
            v = np.asarray(hs, dtype=np.int64)
            bits = (v[:, None] >> shifts[None, :]) & 1  # (n_toks, 60)
            bal = (2 * bits - 1).sum(axis=0)
            out[i] = int(((bal > 0).astype(np.int64) << shifts).sum())
        return pd.Series(out)

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    hashes = (
        d.select("doc_id", F.explode("toks").alias("t"))
        .select("doc_id", F.expr(_SPARK_H15.format(x="t")).alias("v"))
        .groupBy("doc_id")
        .agg(F.collect_list("v").alias("vs"))
    )
    return hashes.select("doc_id", simhash_of("vs").alias("sh"))


@query(
    "q_dedup_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, t.term AS term
        FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS lt
              FROM documents), unnest(lt) AS t(term)
    ),
    bits AS (
        SELECT doc_id, j,
               CASE WHEN ({_DUCK_H15.format(x='term')} >> j) % 2 != 0
                    THEN 1 ELSE -1 END AS s
        FROM toks, unnest(generate_series(0, {SIMHASH_BITS - 1})) AS u(j)
    ),
    sh AS (
        SELECT doc_id,
               sum(CASE WHEN bal > 0 THEN (1::BIGINT << j) ELSE 0 END) AS sh
        FROM (SELECT doc_id, j, sum(s) AS bal FROM bits GROUP BY 1, 2)
        GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate detection: 60-bit signature per doc,
    banded candidate generation (4 × 15-bit bands — lossless for
    Hamming ≤ 3 by pigeonhole), exact Hamming verification.

    The oracle recomputes the identical md5-based signature in SQL and
    brute-forces all pairs, so the check covers the signature math AND
    the banding's completeness."""
    sh = _simhash_df(spark, sf_dir)
    bands = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {SIMHASH_BANDS - 1}), b ->"
                f" (sh >> (b * {SIMHASH_BAND_BITS}))"
                f" % {1 << SIMHASH_BAND_BITS})"
            )
        ).alias("band", "bv"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), "band", "bv")
    b = bands.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), "band", "bv")
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
        )
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "q_dedup_ngram",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> concat(string_split(text, ' ')[i], ' ',
                               string_split(text, ' ')[i + 1], ' ',
                               string_split(text, ' ')[i + 2]))) AS grams
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jac
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.2
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram (3-token shingle) Jaccard near-dup — order-sensitive
    where token-set Jaccard (``q_dedup_near``) is order-blind: two
    docs that permute the same words share tokens but few shingles.
    Blocked by ``lang``; threshold 0.2 because shingle-level overlap
    is intrinsically sparser than token overlap (measured: the 0.8
    token-Jaccard pairs land around 0.15–0.35 shingle-Jaccard on this
    corpus).  xxhash64-hashed shingles keep the inverted-index
    shuffle rows at 16 bytes; hash collisions across *distinct*
    shingles of one doc pair would need a 64-bit collision inside a
    ≤100-shingle set — probability ~1e-15, far below float round-4
    noise."""
    # Spread the one-file scan before the string-heavy shingle build,
    # and materialize the built grams once: the same frame feeds the
    # sizes lookup and BOTH sides of the posting join — without
    # truncation the per-doc concat/array_distinct (the measured cost:
    # 6.2 s single-task, vs a 0.9M-row posting join) replays 3×.
    d = truncate_lineage(
        _spread_scan(
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "lang", F.split("text", " ").alias("toks")
            )
        ).select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 2, 0)),"
                    " (x, i) -> concat(x, ' ', toks[i + 1],"
                    "                  ' ', toks[i + 2]))"
                )
            ).alias("grams"),
        ),
        eager=False,
    )
    # Inverted-index formulation: |∩| arrives from a join on the
    # shingle hash (shuffle ∝ Σ shared shingles — pairs that share
    # nothing are never materialized), |∪| = n_a + n_b − |∩|.  This
    # replaces the blocked quadratic join whose per-pair 60-element
    # string-array intersections dominated (82 s → ~3 s at sf0.1).
    sizes = d.select("doc_id", F.size("grams").alias("n_grams"))
    posts = d.select(
        "doc_id", "lang", F.explode("grams").alias("g")
    ).select("doc_id", "lang", F.xxhash64("g").alias("gh"))
    a = posts.select(
        F.col("doc_id").alias("doc_a"), "lang", "gh"
    )
    b = posts.select(F.col("doc_id").alias("doc_b"), "lang", "gh")
    shared = (
        a.join(b, ["lang", "gh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    na = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("n_a")
    )
    nb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("n_b")
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return (
        shared.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.2)
        .select("doc_a", "doc_b", F.round("jac", 4).alias("jac"))
    )


# --------------------------------------------------------------------------
# ANN scale path (approximate by design — rows-only check)
# --------------------------------------------------------------------------

@query("q_sim_ann_lsh")  # no oracle: approximate by design (driver rows-only)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbour via multi-probe random-hyperplane
    LSH — the IVF shape that scales when the reference set itself is
    too big to broadcast.

    Plan: sign bits of fixed-seed hyperplane projections bucket every
    vector (residents); each query vector probes its own bucket plus
    every 1-bit-flip neighbour (the standard multi-probe recall fix —
    a true neighbour near a hyperplane lands one bit away).  Probes
    shuffle on bucket id, ``applyInPandas`` brute-forces each bucket's
    residents against the probes that landed there, and a final
    max-struct aggregation picks the global best per query (tie-break
    lowest nn_id via negated id in the struct).  Cost: |probes|/bucket
    ≈ (bits+1)·n/2^bits residents scanned per query vs n for exact.

    Deterministic (fixed-seed planes, no rand at query time); no SQL
    oracle by construction — tests assert recall@1 vs the exact
    kernel (uniform random embeddings are LSH's worst case)."""
    import math

    import numpy as np
    import pandas as pd

    from events_to_db_spark.functions import kernels

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # IVF-style sizing: target ~32 vectors per bucket so buckets stay
    # dense enough to contain true neighbours (2^bits ≈ n/32).
    n = e.count()
    n_bits = max(2, min(16, int(math.log2(max(n, 64) / 32))))
    dim = len(e.select("embedding").first()["embedding"])
    planes = np.random.default_rng(42).standard_normal((n_bits, dim))
    planes_bc = spark.sparkContext.broadcast(planes)

    def bucketize(batches):
        """residents: one row per vector, its home bucket."""
        pl = planes_bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = kernels.stack_embeddings(pdf["embedding"])
            bits = (mat @ pl.T) > 0
            bucket = bits @ (1 << np.arange(n_bits))
            out = pdf[["vec_id", "embedding"]].copy()
            out["bucket"] = bucket.astype(np.int64)
            yield out

    def probeize(batches):
        """probes: one row per (vector, home ∪ 1-bit-flip buckets)."""
        pl = planes_bc.value
        flips = np.concatenate([[0], 1 << np.arange(n_bits)])
        for pdf in batches:
            if pdf.empty:
                continue
            mat = kernels.stack_embeddings(pdf["embedding"])
            bits = (mat @ pl.T) > 0
            home = (bits @ (1 << np.arange(n_bits))).astype(np.int64)
            k = len(flips)
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(pdf["vec_id"].to_numpy(), k),
                    "q_emb": np.repeat(pdf["embedding"].to_numpy(), k),
                    "bucket": (home[:, None] ^ flips[None, :]).ravel(),
                }
            )

    residents = e.mapInPandas(
        bucketize, "vec_id long, embedding array<float>, bucket long"
    )
    probes = e.mapInPandas(
        probeize, "q_id long, q_emb array<float>, bucket long"
    )

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        res = pdf[pdf["vec_id"].notna()]
        qs = pdf[pdf["q_id"].notna()]
        if res.empty or qs.empty:
            return pd.DataFrame(columns=["q_id", "nn_id", "cos"])
        rid = res["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(rid)
        rid = rid[order]
        r_unit = kernels.l2_normalize(
            kernels.stack_embeddings(res["embedding"].iloc[order])
        )
        q_unit = kernels.l2_normalize(kernels.stack_embeddings(qs["q_emb"]))
        qid = qs["q_id"].to_numpy(dtype=np.int64)
        sims = q_unit @ r_unit.T
        sims[qid[:, None] == rid[None, :]] = -np.inf  # exclude self
        best = np.argmax(sims, axis=1)
        best_cos = sims[np.arange(len(best)), best]
        keep = np.isfinite(best_cos)
        return pd.DataFrame(
            {
                "q_id": qid[keep],
                "nn_id": rid[best][keep],
                "cos": np.round(best_cos[keep], 4),
            }
        )

    # outer-union residents and probes so one grouped pass sees both
    both = residents.unionByName(
        probes.select(
            F.lit(None).cast("long").alias("vec_id"),
            F.lit(None).cast("array<float>").alias("embedding"),
            "bucket",
            "q_id",
            "q_emb",
        ),
        allowMissingColumns=True,
    )
    local_best = both.groupBy("bucket").applyInPandas(
        per_bucket, "q_id long, nn_id long, cos double"
    )
    # global best per query: max on (cos, -nn_id) = highest cosine,
    # ties to the lowest candidate id
    return (
        local_best.groupBy("q_id")
        .agg(F.max(F.struct(F.col("cos"), (-F.col("nn_id")).alias("neg_id"))).alias("b"))
        .select(
            F.col("q_id").alias("vec_id"),
            (-F.col("b.neg_id")).alias("nn_id"),
            F.col("b.cos").alias("cos"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Multimodal binary-column plumbing
# --------------------------------------------------------------------------

@query(
    "q_mm_binary",
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           md5(text)                        AS content_md5,
           ord(substr(text, 1, 1))          AS first_byte
    FROM documents
    """,
)
def q_mm_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary column with typed metadata: payload size, content
    hash, leading byte — the schema shape multimodal blobs (image /
    audio / video bytes) ride through the engine.  All metadata derives
    from the binary column itself, JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        F.ascii(F.substring("text", 1, 1)).alias("first_byte"),
    )


def decode_image_stub(data: bytes) -> dict:
    """Decode an image payload to (format, width, height, n_frames).

    STUB: real decoding needs an image library that is not installed in
    this environment.  If PIL ever becomes available the real path
    engages; otherwise a deterministic fake parses our synthetic
    8-byte header (magic 'MM01' + uint16 width + uint16 height).  The
    Spark-side plumbing (binary column in, typed struct out, Arrow
    batching, partition parallelism) is real and tested either way.
    """
    try:  # pragma: no cover - library absent in this environment
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(data))
        return {
            "fmt": img.format or "UNKNOWN",
            "width": img.width,
            "height": img.height,
            "n_frames": getattr(img, "n_frames", 1),
        }
    except ImportError:
        if len(data) >= 8 and data[:4] == b"MM01":
            return {
                "fmt": "FAKE",
                "width": int.from_bytes(data[4:6], "big"),
                "height": int.from_bytes(data[6:8], "big"),
                "n_frames": 1 + data[-1] % 4,
            }
        raise NotImplementedError(
            "no image library available and payload has no MM01 header"
        )


@query("q_mm_decode")  # no oracle: decode stub is engine-external (rows-only)
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode / feature-extract over binary payloads via
    ``mapInPandas``: synthesize an image-like payload per document
    (deterministic MM01 header derived from doc_id), then run the
    decode stub partition-parallel over Arrow batches.

    The shape is the production one — binary in, typed metadata struct
    out, no driver involvement; swap the stub for PIL/ffmpeg on a real
    cluster and nothing else changes."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit(b"MM01"),
        # uint16 width/height derived from doc_id — deterministic fake pixels
        F.expr("unhex(lpad(hex(16 + doc_id % 97), 4, '0'))"),
        F.expr("unhex(lpad(hex(16 + doc_id % 53), 4, '0'))"),
        F.col("text").cast("binary"),
    ).alias("payload")
    src = d.select("doc_id", payload)

    def decode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            meta = [decode_image_stub(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [m["fmt"] for m in meta],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "n_frames": [m["n_frames"] for m in meta],
                }
            )

    return src.mapInPandas(
        decode, "doc_id long, fmt string, width int, height int, n_frames int"
    )


@query(
    "q_text_entropy",
    oracle="""
    SELECT doc_id,
           n_toks,
           round(ln(n_toks) - sum_nlogn / n_toks, 4) AS entropy_nats
    FROM (
        SELECT doc_id,
               CAST(sum(cnt) AS BIGINT) AS n_toks,
               sum(cnt * ln(cnt)) AS sum_nlogn
        FROM (
            SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS cnt
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            ) WHERE tok <> ''
            GROUP BY doc_id, tok
        )
        GROUP BY doc_id
    )
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level Shannon entropy per document (nats) — the lexical-
    diversity signal a curation pipeline thresholds on (repetitive /
    boilerplate docs score low).  Uses the algebraic form
    ``H = ln(N) - Σ c·ln(c) / N`` so both engines sum the same exact
    per-term values; only the final expression is rounded (§7.5.1).
    Plan: one explode, two hash-aggregates keyed by doc_id — explode
    and both aggs share the doc_id shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("double").alias("cnt")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_toks"),
        F.sum(F.col("cnt") * F.log(F.col("cnt"))).alias("sum_nlogn"),
    )
    return per_doc.select(
        "doc_id",
        "n_toks",
        F.round(
            F.log(F.col("n_toks")) - F.col("sum_nlogn") / F.col("n_toks"), 4
        ).alias("entropy_nats"),
    )


@query(
    "q_text_redact",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           count(DISTINCT masked) AS n_shapes,
           min(masked) AS sample_masked,
           CAST(sum(CASE WHEN CAST(extracted AS BIGINT) = c_custkey
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_id_roundtrip
    FROM (
        SELECT c_mktsegment, c_custkey,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
               regexp_extract(c_name, '([0-9]+)$', 1) AS extracted
        FROM customer
    )
    GROUP BY c_mktsegment
    """,
)
def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction: mask every digit of the customer
    identifier, keeping only the structural shape, and verify the
    numeric id extracted *before* masking round-trips to the primary
    key — the scrub-then-audit step of a training-data pipeline.
    Dialect parity: DuckDB ``regexp_replace`` is first-match unless
    the ``'g'`` flag is passed; Spark's is always global.  Pure
    columnar regex → one small aggregate; the regex runs inside
    codegen, no Python."""
    c = load_table(spark, sf_dir, "customer")
    masked = c.select(
        "c_mktsegment",
        "c_custkey",
        F.regexp_replace(F.col("c_name"), "[0-9]", "#").alias("masked"),
        F.regexp_extract(F.col("c_name"), r"([0-9]+)$", 1).alias("extracted"),
    )
    return masked.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("masked").alias("n_shapes"),
        F.min("masked").alias("sample_masked"),
        F.sum(
            F.when(
                F.col("extracted").cast("long") == F.col("c_custkey"), 1
            ).otherwise(0)
        ).alias("n_id_roundtrip"),
    )


@query(
    "q_embed_norm",
    oracle="""
    SELECT vec_id,
           round(l2, 4) AS l2_norm,
           round(embedding[1] / l2, 4) AS e0_unit,
           CAST(round(embedding[1] / l2 * 127) AS INT) AS e0_q7
    FROM (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
        FROM embeddings
    )
    """,
)
def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding normalization + int8-style quantization plumbing:
    per vector its L2 norm, the unit-normalized first component, and
    that component quantized to a 7-bit signed scale — the
    preprocessing step before ANN indexing / storage compression.
    Float32 elements are widened to float64 *before* squaring in both
    engines so the sums agree bit-for-bit under round-4.  Pure
    higher-order array exprs — no shuffle at all, embarrassingly
    parallel at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    l2 = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    e0 = F.element_at(F.col("embedding"), 1).cast("double")
    return emb.select(
        "vec_id",
        F.round(l2, 4).alias("l2_norm"),
        F.round(e0 / l2, 4).alias("e0_unit"),
        F.round(e0 / l2 * 127, 0).cast("int").alias("e0_q7"),
    )


@query(
    "q_dedup_editdist",
    oracle="""
    SELECT p_brand,
           count(*) AS n_pairs,
           min(name_a || '|' || name_b) AS sample_pair
    FROM (
        SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE a.p_name <> b.p_name
          AND abs(length(a.p_name) - length(b.p_name)) <= 3
          AND levenshtein(a.p_name, b.p_name) <= 3
    )
    GROUP BY p_brand
    """,
)
def q_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate detection by edit distance: near-identical part
    names within a brand block (Levenshtein ≤ 3, distinct strings) —
    the typo-level record-linkage pass that complements token-set
    Jaccard (``q_dedup_near``: reorderings) and MinHash (scale).

    Two-level adaptive plan (VERDICT r03 #1 + the r4 scaling-curve
    fix): (1) EXACT collapse to distinct (brand, name) groups — one
    linear shuffle; the r4 10× measurement showed the row-level pair
    space scaling ×105, and collapsing first makes the fuzzy level
    vocabulary-bounded instead of row-bounded.  (2) Fuzzy pairs over
    distinct names, with a block-size probe on the collapsed level:
    below ``_editdist_block_max()`` distinct names in the largest
    brand, the blocked self-join runs; above it, candidates come from
    ``editdist_candidate_pairs`` — the PassJoin (k+1)-segment
    pigeonhole inverted index, linear in distinct-name count — so
    name-cardinality growth can't re-introduce the quadratic blowup.
    Row-pair counts and the key-oriented sample string are recovered
    arithmetically from group multiplicities and key ranges.  All
    paths end in the identical length-prefilter + banded-JVM-
    Levenshtein verify, and the segment index is lossless at k=3, so
    the result (and the brute-force row-level oracle) are
    byte-identical every way (tests/test_editdist_escalate.py forces
    the threshold low and proves it)."""
    p = load_table(spark, sf_dir, "part")
    # Level 1 — EXACT collapse (the classic record-linkage preprocessing
    # step): one linear groupBy to distinct (brand, name) groups with
    # their multiplicity and key range.  The fuzzy pair space then runs
    # over DISTINCT strings only — vocabulary-bounded, not row-bounded —
    # and row-pair counts are recovered arithmetically (cnt_a × cnt_b
    # cross pairs per name pair; a key-orientation exists iff
    # min_key < other's max_key).  Measured: the row-level pair space
    # scaled ×105 for ×10 rows (tools/scaling.py, r4); this plan is
    # ~linear because the collapsed level doesn't grow with row count.
    g = p.groupBy("p_brand", "p_name").agg(
        F.count("*").alias("cnt"),
        F.min("p_partkey").alias("kmin"),
        F.max("p_partkey").alias("kmax"),
    )
    a = g.select(
        "p_brand",
        F.col("p_name").alias("name_a"),
        F.col("cnt").alias("cnt_a"),
        F.col("kmin").alias("kmin_a"),
        F.col("kmax").alias("kmax_a"),
    )
    b = g.select(
        "p_brand",
        F.col("p_name").alias("name_b"),
        F.col("cnt").alias("cnt_b"),
        F.col("kmin").alias("kmin_b"),
        F.col("kmax").alias("kmax_b"),
    )
    verify = (
        F.abs(F.length("name_a") - F.length("name_b")) <= 3
    ) & (  # lossless: |len diff| > k implies lev > k
        F.levenshtein("name_a", "name_b", 3) >= 0
    )  # banded DP, -1 = over threshold
    # Level 2 — fuzzy pairs over distinct names.  Block-size probe on
    # the COLLAPSED level (distinct names per brand); above the gate,
    # candidates come from the PassJoin segment index instead of the
    # in-block self-join (names are unique per block, so the name is
    # its own candidate key and key order == name order).
    max_block = (
        # collect, not first(): r11, CollectLimit tax on 1-row aggs
        g.groupBy("p_brand").count().agg(F.max("count")).collect()[0][0]
        or 0
    )
    if max_block > _editdist_block_max():
        base = g.select(
            "p_brand", F.col("p_name").alias("key"), F.col("p_name").alias("name")
        )
        cand = editdist_candidate_pairs(
            base, ["p_brand"], k=3
        ).select(
            "p_brand",
            F.col("key_a").alias("name_a"),
            F.col("key_b").alias("name_b"),
        )
        pairs = (
            cand.join(a, ["p_brand", "name_a"])
            .join(b, ["p_brand", "name_b"])
            .filter(verify)
        )
    else:
        pairs = a.join(b, "p_brand").filter(
            (F.col("name_a") < F.col("name_b")) & verify
        )
    # Row-pair expansion: every cross pair of the two exact groups is a
    # qualifying (key_a < key_b) pair; the sample string takes the
    # lower-key row's name first, so an orientation exists iff some key
    # of that name precedes some key of the other.
    sample = F.least(
        F.when(
            F.col("kmin_a") < F.col("kmax_b"),
            F.concat_ws("|", "name_a", "name_b"),
        ),
        F.when(
            F.col("kmin_b") < F.col("kmax_a"),
            F.concat_ws("|", "name_b", "name_a"),
        ),
    )
    return pairs.groupBy("p_brand").agg(
        F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("n_pairs"),
        F.min(sample).alias("sample_pair"),
    )


@query(
    "q_text_zipf",
    oracle="""
    WITH freqs AS (
        SELECT tok, count(*) AS freq
        FROM (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ) WHERE tok <> ''
        GROUP BY tok
    ),
    ranked AS (
        SELECT tok, freq,
               row_number() OVER (ORDER BY freq DESC, tok) AS rnk
        FROM freqs
    )
    SELECT tok, freq, rnk,
           round((SELECT regr_slope(ln(freq), ln(rnk)) FROM ranked), 4)
               AS zipf_slope
    FROM ranked
    WHERE rnk <= 20
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank–frequency profile of the corpus vocabulary: the top
    20 terms with their ranks plus the global log–log OLS slope (a
    natural-language corpus sits near −1; this synthetic 31-token
    vocabulary measurably doesn't — the kind of distribution-shift
    check a curation pipeline alarms on).  One explode + hash-agg
    builds the frequency table; rank and the slope both run over the
    (vocabulary-sized) aggregate, so the expensive side is a single
    shuffle of (token, partial-count) pairs."""
    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    ranked = freqs.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("freq").desc(), "tok")),
    )
    slope = ranked.agg(
        F.round(F.regr_slope(F.log("freq"), F.log("rnk")), 4).alias(
            "zipf_slope"
        )
    )
    return (
        ranked.filter(F.col("rnk") <= 20)
        .crossJoin(F.broadcast(slope))
        .select("tok", "freq", "rnk", "zipf_slope")
    )


@query(
    "q_text_pmi",
    oracle="""
    WITH doc_toks AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
        FROM documents
    ),
    n_docs AS (SELECT count(*) AS n FROM doc_toks),
    tok_df AS (
        SELECT tok, count(*) AS n_t
        FROM (SELECT doc_id, unnest(ts) AS tok FROM doc_toks)
        GROUP BY tok
    ),
    pair_df AS (
        SELECT a_tok, b_tok, count(*) AS n_ab
        FROM (
            SELECT x.doc_id, x.tok AS a_tok, y.tok AS b_tok
            FROM (SELECT doc_id, unnest(ts) AS tok FROM doc_toks) x
            JOIN (SELECT doc_id, unnest(ts) AS tok FROM doc_toks) y
              ON x.doc_id = y.doc_id AND x.tok < y.tok
        )
        GROUP BY a_tok, b_tok
    )
    SELECT a_tok, b_tok, CAST(n_ab AS BIGINT) AS n_ab,
           round(ln(CAST(n_ab AS DOUBLE) * n / (ta.n_t * tb.n_t)), 4) AS pmi
    FROM pair_df
    JOIN tok_df ta ON ta.tok = a_tok
    JOIN tok_df tb ON tb.tok = b_tok
    CROSS JOIN n_docs
    WHERE n_ab >= 20
    """,
)
def q_text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token co-occurrence at the
    document level (collocation mining): PMI = ln(N·n_ab /(n_a·n_b))
    over distinct-token document sets, for pairs seen in ≥20 docs.
    The ratio inside ``ln`` is a ratio of exact integers, so both
    engines evaluate ``ln`` of identical doubles (§7.5.1 round-4 on
    top).  Plan: distinct-token explode → within-doc pair join (the
    quadratic side is bounded by per-doc vocabulary, not corpus
    size) → two broadcast joins against the (vocabulary-sized)
    document-frequency table."""
    docs = load_table(spark, sf_dir, "documents")
    doc_toks = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ts")
    )
    exploded = doc_toks.select(
        "doc_id", F.explode("ts").alias("tok")
    )
    n_docs = doc_toks.agg(F.count("*").alias("n"))
    tok_df = exploded.groupBy("tok").agg(F.count("*").alias("n_t"))
    x = exploded.select("doc_id", F.col("tok").alias("a_tok"))
    y = exploded.select("doc_id", F.col("tok").alias("b_tok"))
    pair_df = (
        x.join(y, "doc_id")
        .filter(F.col("a_tok") < F.col("b_tok"))
        .groupBy("a_tok", "b_tok")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 20)
    )
    ta = tok_df.select(
        F.col("tok").alias("a_tok"), F.col("n_t").alias("na")
    )
    tb = tok_df.select(
        F.col("tok").alias("b_tok"), F.col("n_t").alias("nb")
    )
    return (
        pair_df.join(F.broadcast(ta), "a_tok")
        .join(F.broadcast(tb), "b_tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "a_tok",
            "b_tok",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("n")
                    / (F.col("na") * F.col("nb"))
                ),
                4,
            ).alias("pmi"),
        )
    )


@query(
    "q_mm_framesample",
    oracle="""
    SELECT doc_id,
           n_frames,
           CAST((n_frames + 1) // 2 AS INT) AS n_sampled,
           CAST(((n_frames + 1) // 2) * frame_len AS BIGINT) AS sampled_bytes,
           CAST((SELECT sum((doc_id * 31 + i * 7) % 251)
                 FROM unnest(generate_series(0, n_frames - 1, 2)) t(i))
                AS BIGINT) AS checksum
    FROM (
        SELECT doc_id,
               CAST(2 + doc_id % 7 AS INT) AS n_frames,
               CAST(64 + doc_id % 5 AS INT) AS frame_len
        FROM documents
    )
    """,
)
def q_mm_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-like binary payloads: a synthetic
    MM02 container (header + frame count + fixed-size frames, all
    bytes a deterministic function of doc_id) is *parsed from the
    actual binary* partition-parallel in ``mapInPandas``, keeping
    every 2nd frame — the stride-sampling step of a video training
    pipeline.  The oracle predicts the sampled byte count and a
    first-byte checksum arithmetically, so the differential check
    proves the binary round-trip (build → parse → sample) is exact,
    not just that the plumbing runs.  Swap the synthesizer for real
    mp4 bytes and the parse stub for ffmpeg and nothing else changes
    (same discipline as ``q_mm_decode``)."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth_and_sample(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n_frames = 2 + doc_id % 7
                frame_len = 64 + doc_id % 5
                payload = b"MM02" + bytes([n_frames])
                for i in range(n_frames):
                    first = (doc_id * 31 + i * 7) % 251
                    payload += bytes([first]) + b"\x00" * (frame_len - 1)
                # ---- parse back from the bytes (the real plumbing) ----
                assert payload[:4] == b"MM02"
                got_frames = payload[4]
                body = payload[5:]
                flen = len(body) // got_frames
                sampled = [
                    body[i * flen : (i + 1) * flen]
                    for i in range(0, got_frames, 2)
                ]
                out.append(
                    (
                        doc_id,
                        got_frames,
                        len(sampled),
                        sum(len(s) for s in sampled),
                        sum(s[0] for s in sampled),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_sampled",
                    "sampled_bytes",
                    "checksum",
                ],
            )

    return d.mapInPandas(
        synth_and_sample,
        "doc_id long, n_frames int, n_sampled int,"
        " sampled_bytes long, checksum long",
    )


@query(
    "q_mm_resize",
    oracle="""
    SELECT doc_id,
           CAST(w // 2 AS INT) AS out_w,
           CAST(h // 2 AS INT) AS out_h,
           CAST((w // 2) * (h // 2) AS BIGINT) AS out_bytes,
           round((SELECT avg((doc_id * 131 + (2 * y * w + 2 * x) * 17) % 256)
                  FROM unnest(generate_series(0, h // 2 - 1)) t1(y),
                       unnest(generate_series(0, w // 2 - 1)) t2(x)), 4)
               AS brightness
    FROM (
        SELECT doc_id,
               CAST(8 + (doc_id % 5) * 2 AS INT) AS w,
               CAST(6 + (doc_id % 3) * 2 AS INT) AS h
        FROM documents
    )
    """,
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize + feature-extract plumbing: a synthetic grayscale
    image (w×h bytes, pixel value a deterministic function of
    (doc_id, offset)) is built, then **nearest-neighbor downscaled 2×
    from the actual pixel buffer** (stride-2 row/col sampling in
    NumPy) and reduced to a brightness feature (mean sampled pixel) —
    decode → resize → feature-extract, the remaining verbs of the
    multimodal contract (``q_mm_decode`` / ``q_mm_framesample`` cover
    the others).  The oracle recomputes the sampled-pixel mean
    arithmetically, so the buffer round-trip is value-checked, not
    just schema-checked.  Arrow-batched `mapInPandas`; swap the
    synthesizer for real decoders and the kernel for PIL on a real
    cluster."""
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def resize(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 8 + (doc_id % 5) * 2
                h = 6 + (doc_id % 3) * 2
                offs = np.arange(w * h, dtype=np.int64)
                img = ((doc_id * 131 + offs * 17) % 256).astype(
                    np.uint8
                ).reshape(h, w)
                small = img[::2, ::2]  # nearest-neighbor 2x downscale
                out.append(
                    (
                        doc_id,
                        small.shape[1],
                        small.shape[0],
                        int(small.size),
                        float(small.astype(np.float64).mean()),
                    )
                )
            pdf_out = pd.DataFrame(
                out,
                columns=["doc_id", "out_w", "out_h", "out_bytes", "brightness"],
            )
            pdf_out["brightness"] = pdf_out["brightness"].round(4)
            yield pdf_out

    return d.mapInPandas(
        resize,
        "doc_id long, out_w int, out_h int, out_bytes long,"
        " brightness double",
    )


@query(
    "q_dedup_containment",
    oracle="""
    WITH g AS (
        SELECT doc_id, lang,
               list_distinct([s[1] || ' ' || s[2] || ' ' || s[3]
                              FOR s IN [[toks[i], toks[i+1], toks[i+2]]
                              FOR i IN range(1, greatest(len(toks) - 1, 1))]])
                   AS grams
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
              FROM documents)
    ),
    x AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS inter,
               CAST(len(a.grams) AS BIGINT) AS na,
               CAST(len(b.grams) AS BIGINT) AS nb
        FROM g a JOIN g b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, inter, na, nb
    FROM x
    WHERE inter * 10 >= 8 * least(na, nb) AND inter > 0
    ORDER BY id_a, id_b
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: |A∩B| / min(|A|,|B|) ≥ 0.8 on
    3-token shingles — the subset-duplicate detector.  Symmetric
    Jaccard misses a short doc fully embedded in a long one (union is
    dominated by the long side); containment is the curation measure
    for exactly that case (quote extraction, header-wrapped reposts).

    Same inverted-index shape as ``q_dedup_ngram`` — the intersection
    count arrives from a join on xxhash64(shingle), shuffling only
    (hash, doc_id) pairs, and docs sharing zero shingles never
    materialize a pair.  The threshold is the exact rational
    ``inter·10 ≥ 8·min(na, nb)`` — no float enters the keep/drop
    decision (§7.5).
    """
    # Same spread + single-materialization as q_dedup_ngram: the
    # shingle build is the measured cost and d feeds sizes + both
    # posting sides.
    d = truncate_lineage(
        _spread_scan(
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "lang", F.split("text", " ").alias("toks")
            )
        ).select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 2, 0)),"
                    " (x, i) -> concat(x, ' ', toks[i + 1],"
                    "                  ' ', toks[i + 2]))"
                )
            ).alias("grams"),
        ),
        eager=False,
    )
    sizes = d.select("doc_id", "lang", F.size("grams").cast("bigint").alias("n"))
    inv = d.select(
        "doc_id", "lang", F.explode("grams").alias("g")
    ).select("doc_id", "lang", F.xxhash64("g").alias("h"))
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(
            (F.col("inter") * 10 >= 8 * F.least("na", "nb")) & (F.col("inter") > 0)
        )
        .select("id_a", "id_b", "inter", "na", "nb")
        .orderBy("id_a", "id_b")
    )


@query(
    "q_ml_eval",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, t.term AS term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    ),
    freq AS (SELECT lang AS l, term, count(*) AS n FROM toks GROUP BY 1, 2),
    tot AS (SELECT l, sum(n) AS total FROM freq GROUP BY 1),
    scored AS (
        SELECT toks.doc_id, toks.lang, freq.l AS cand,
               CAST(sum(freq.n) AS DOUBLE) / any_value(tot.total) AS score
        FROM toks
        JOIN freq ON freq.term = toks.term
        JOIN tot ON tot.l = freq.l
        GROUP BY toks.doc_id, toks.lang, freq.l
    ),
    pred AS (
        SELECT doc_id, lang, cand AS pred_lang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rn
        FROM scored
    ),
    conf AS (
        SELECT lang, pred_lang, count(*) AS n
        FROM pred WHERE rn = 1 GROUP BY 1, 2
    ),
    tt AS (SELECT lang AS c, sum(n) AS true_tot FROM conf GROUP BY 1),
    pt AS (SELECT pred_lang AS c, sum(n) AS pred_tot FROM conf GROUP BY 1),
    tp AS (SELECT lang AS c, sum(n) AS tp FROM conf
           WHERE lang = pred_lang GROUP BY 1)
    SELECT tt.c AS lang,
           CAST(coalesce(tp.tp, 0) AS BIGINT)                AS tp,
           CAST(coalesce(pt.pred_tot, 0) - coalesce(tp.tp, 0)
                AS BIGINT)                                   AS fp,
           CAST(tt.true_tot - coalesce(tp.tp, 0) AS BIGINT)  AS fn,
           round(CAST(coalesce(tp.tp, 0) AS DOUBLE)
                 / CAST(coalesce(pt.pred_tot, 0) AS DOUBLE), 6)
               AS precision,
           round(CAST(coalesce(tp.tp, 0) AS DOUBLE)
                 / CAST(tt.true_tot AS DOUBLE), 6)           AS recall,
           round(CAST(2 * coalesce(tp.tp, 0) AS DOUBLE)
                 / CAST(2 * coalesce(tp.tp, 0)
                        + (coalesce(pt.pred_tot, 0) - coalesce(tp.tp, 0))
                        + (tt.true_tot - coalesce(tp.tp, 0)) AS DOUBLE), 6)
               AS f1
    FROM tt
    LEFT JOIN pt ON pt.c = tt.c
    LEFT JOIN tp ON tp.c = tt.c
    """,
)
def q_ml_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation metrics: per-class precision / recall /
    F1 of the q_text_langid predictor, derived from its confusion
    matrix by COMPOSING the registered query (operators are reusable
    pipeline stages, not one-off scripts).  All three ratios are one
    IEEE division of exact integer counts (tp, pred-total, true-total
    — §7.5: never a float-sum intermediate), so they hash-match the
    oracle, which restates the same fixpoint in SQL.

    The confusion matrix is |langs|² ≤ 25 rows — everything after the
    langid aggregate is broadcast-sized bookkeeping.
    """
    from events_to_db_spark.registry import QUERIES

    conf = QUERIES["q_text_langid"](spark, sf_dir)
    tt = conf.groupBy(F.col("lang").alias("c")).agg(
        F.sum("n").alias("true_tot")
    )
    pt = conf.groupBy(F.col("pred_lang").alias("c")).agg(
        F.sum("n").alias("pred_tot")
    )
    tp = (
        conf.where(F.col("lang") == F.col("pred_lang"))
        .groupBy(F.col("lang").alias("c"))
        .agg(F.sum("n").alias("tp"))
    )
    j = (
        tt.join(pt, "c", "left")
        .join(tp, "c", "left")
        .select(
            F.col("c").alias("lang"),
            F.coalesce("tp", F.lit(0)).alias("tp_"),
            F.coalesce("pred_tot", F.lit(0)).alias("pred_tot"),
            F.col("true_tot"),
        )
    )
    tp_, pred_tot, true_tot = F.col("tp_"), F.col("pred_tot"), F.col("true_tot")
    return j.select(
        "lang",
        tp_.cast("bigint").alias("tp"),
        (pred_tot - tp_).cast("bigint").alias("fp"),
        (true_tot - tp_).cast("bigint").alias("fn"),
        F.round(tp_.cast("double") / pred_tot.cast("double"), 6).alias(
            "precision"
        ),
        F.round(tp_.cast("double") / true_tot.cast("double"), 6).alias(
            "recall"
        ),
        F.round(
            (2 * tp_).cast("double")
            / (2 * tp_ + (pred_tot - tp_) + (true_tot - tp_)).cast("double"),
            6,
        ).alias("f1"),
    )


@query(
    "q_mm_riff",
    oracle="""
    WITH p AS (
        SELECT event_id,
               1 + CAST(event_id % 2 AS BIGINT) AS channels,
               8000 + (CAST(event_id % 8 AS BIGINT)) * 4000 AS sample_rate,
               100 + CAST(event_id % 50 AS BIGINT) AS n_samples
        FROM events
    ),
    d AS (
        SELECT event_id, channels, sample_rate, n_samples,
               sample_rate * channels * 2 AS byte_rate,
               channels * 2 AS block_align,
               n_samples * channels * 2 AS data_size
        FROM p
    ),
    hdr AS (
        SELECT *, concat('52494646', lpad(to_hex((36 + data_size) // 1 % 256), 2, '0'), lpad(to_hex((36 + data_size) // 256 % 256), 2, '0'), lpad(to_hex((36 + data_size) // 65536 % 256), 2, '0'), lpad(to_hex((36 + data_size) // 16777216 % 256), 2, '0'), '57415645', '666D7420', lpad(to_hex((16) // 1 % 256), 2, '0'), lpad(to_hex((16) // 256 % 256), 2, '0'), lpad(to_hex((16) // 65536 % 256), 2, '0'), lpad(to_hex((16) // 16777216 % 256), 2, '0'), lpad(to_hex((1) // 1 % 256), 2, '0'), lpad(to_hex((1) // 256 % 256), 2, '0'), lpad(to_hex((channels) // 1 % 256), 2, '0'), lpad(to_hex((channels) // 256 % 256), 2, '0'), lpad(to_hex((sample_rate) // 1 % 256), 2, '0'), lpad(to_hex((sample_rate) // 256 % 256), 2, '0'), lpad(to_hex((sample_rate) // 65536 % 256), 2, '0'), lpad(to_hex((sample_rate) // 16777216 % 256), 2, '0'), lpad(to_hex((byte_rate) // 1 % 256), 2, '0'), lpad(to_hex((byte_rate) // 256 % 256), 2, '0'), lpad(to_hex((byte_rate) // 65536 % 256), 2, '0'), lpad(to_hex((byte_rate) // 16777216 % 256), 2, '0'), lpad(to_hex((block_align) // 1 % 256), 2, '0'), lpad(to_hex((block_align) // 256 % 256), 2, '0'), lpad(to_hex((16) // 1 % 256), 2, '0'), lpad(to_hex((16) // 256 % 256), 2, '0'), '64617461', lpad(to_hex((data_size) // 1 % 256), 2, '0'), lpad(to_hex((data_size) // 256 % 256), 2, '0'), lpad(to_hex((data_size) // 65536 % 256), 2, '0'), lpad(to_hex((data_size) // 16777216 % 256), 2, '0')) AS hdr FROM d
    )
    SELECT event_id,
           CAST(((('0x' || substr(hdr, 9, 2))::BIGINT) * 1 + (('0x' || substr(hdr, 11, 2))::BIGINT) * 256 + (('0x' || substr(hdr, 13, 2))::BIGINT) * 65536 + (('0x' || substr(hdr, 15, 2))::BIGINT) * 16777216) AS BIGINT) AS riff_size,
           CAST(((('0x' || substr(hdr, 33, 2))::BIGINT) * 1 + (('0x' || substr(hdr, 35, 2))::BIGINT) * 256 + (('0x' || substr(hdr, 37, 2))::BIGINT) * 65536 + (('0x' || substr(hdr, 39, 2))::BIGINT) * 16777216) AS BIGINT) AS fmt_len,
           CAST(((('0x' || substr(hdr, 41, 2))::BIGINT) * 1 + (('0x' || substr(hdr, 43, 2))::BIGINT) * 256) AS BIGINT) AS audio_fmt,
           CAST(((('0x' || substr(hdr, 45, 2))::BIGINT) * 1 + (('0x' || substr(hdr, 47, 2))::BIGINT) * 256) AS BIGINT) AS p_channels,
           CAST(((('0x' || substr(hdr, 49, 2))::BIGINT) * 1 + (('0x' || substr(hdr, 51, 2))::BIGINT) * 256 + (('0x' || substr(hdr, 53, 2))::BIGINT) * 65536 + (('0x' || substr(hdr, 55, 2))::BIGINT) * 16777216) AS BIGINT) AS p_rate,
           CAST(((('0x' || substr(hdr, 57, 2))::BIGINT) * 1 + (('0x' || substr(hdr, 59, 2))::BIGINT) * 256 + (('0x' || substr(hdr, 61, 2))::BIGINT) * 65536 + (('0x' || substr(hdr, 63, 2))::BIGINT) * 16777216) AS BIGINT) AS p_byte_rate,
           CAST(((('0x' || substr(hdr, 65, 2))::BIGINT) * 1 + (('0x' || substr(hdr, 67, 2))::BIGINT) * 256) AS BIGINT) AS p_block,
           CAST(((('0x' || substr(hdr, 69, 2))::BIGINT) * 1 + (('0x' || substr(hdr, 71, 2))::BIGINT) * 256) AS BIGINT) AS p_bits,
           CAST(((('0x' || substr(hdr, 81, 2))::BIGINT) * 1 + (('0x' || substr(hdr, 83, 2))::BIGINT) * 256 + (('0x' || substr(hdr, 85, 2))::BIGINT) * 65536 + (('0x' || substr(hdr, 87, 2))::BIGINT) * 16777216) AS BIGINT) AS p_data,
           CAST(p_data // p_block AS BIGINT) AS parsed_samples,
           md5(hdr) AS hdr_md5
    FROM hdr
    ORDER BY event_id
    LIMIT 100
    """,
)
def q_mm_riff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIFF/WAV header round-trip — real multimodal BINARY plumbing
    with an exact oracle: per event, synthesize the canonical 44-byte
    WAV header (little-endian chunk sizes, fmt block, data block) as
    bytes, then PARSE every field back out of the byte string and
    prove the round trip (the oracle recomputes the identical header
    and parse in hex-string space, so the hash-match certifies the
    byte layout end-to-end, including the md5 of the full header).

    Spark side genuinely exercises the binary layer: the hex header is
    ``unhex``-ed to a BINARY column and re-hexed before parsing —
    construction, storage, and field extraction all happen on bytes.
    DuckDB 1.0 cannot substr BLOBs, so the oracle stays in hex-string
    space (two chars per byte, same arithmetic).  All field math is
    exact integers; this is the pattern for reading container headers
    (WAV/RIFF, PNG chunks, TLV metadata) distributed, without ever
    shipping payloads to the driver."""
    # Every synthesized/parsed field is a pure function of event_id and
    # the output is the 100 smallest event_ids: take the top-100 FIRST
    # (a TakeOrdered over the id column alone — the scan prunes to one
    # column) and run the header synthesis + byte round-trip on 100
    # rows instead of the whole table (guide §1.2: don't compute what
    # you throw away).  event_id is unique, so the kept set — and every
    # derived value — is identical.  3.2 s -> 2.0 s warm at sf0.1 (the
    # rest is the id TakeOrdered + per-query session floor).
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id")
        .orderBy("event_id")
        .limit(100)
    )
    d = ev.select(
        "event_id",
        (1 + F.col("event_id") % 2).alias("channels"),
        (8000 + (F.col("event_id") % 8) * 4000).alias("sample_rate"),
        (100 + F.col("event_id") % 50).alias("n_samples"),
    ).select(
        "*",
        (F.col("sample_rate") * F.col("channels") * 2).alias("byte_rate"),
        (F.col("channels") * 2).alias("block_align"),
        (F.col("n_samples") * F.col("channels") * 2).alias("data_size"),
    )
    hdr = d.withColumn("hdr_hex", F.expr("concat('52494646', lpad(hex((36 + data_size) div 1 % 256), 2, '0'), lpad(hex((36 + data_size) div 256 % 256), 2, '0'), lpad(hex((36 + data_size) div 65536 % 256), 2, '0'), lpad(hex((36 + data_size) div 16777216 % 256), 2, '0'), '57415645', '666D7420', lpad(hex((16) div 1 % 256), 2, '0'), lpad(hex((16) div 256 % 256), 2, '0'), lpad(hex((16) div 65536 % 256), 2, '0'), lpad(hex((16) div 16777216 % 256), 2, '0'), lpad(hex((1) div 1 % 256), 2, '0'), lpad(hex((1) div 256 % 256), 2, '0'), lpad(hex((channels) div 1 % 256), 2, '0'), lpad(hex((channels) div 256 % 256), 2, '0'), lpad(hex((sample_rate) div 1 % 256), 2, '0'), lpad(hex((sample_rate) div 256 % 256), 2, '0'), lpad(hex((sample_rate) div 65536 % 256), 2, '0'), lpad(hex((sample_rate) div 16777216 % 256), 2, '0'), lpad(hex((byte_rate) div 1 % 256), 2, '0'), lpad(hex((byte_rate) div 256 % 256), 2, '0'), lpad(hex((byte_rate) div 65536 % 256), 2, '0'), lpad(hex((byte_rate) div 16777216 % 256), 2, '0'), lpad(hex((block_align) div 1 % 256), 2, '0'), lpad(hex((block_align) div 256 % 256), 2, '0'), lpad(hex((16) div 1 % 256), 2, '0'), lpad(hex((16) div 256 % 256), 2, '0'), '64617461', lpad(hex((data_size) div 1 % 256), 2, '0'), lpad(hex((data_size) div 256 % 256), 2, '0'), lpad(hex((data_size) div 65536 % 256), 2, '0'), lpad(hex((data_size) div 16777216 % 256), 2, '0'))"))
    # The real binary round trip: hex -> BINARY -> hex.
    hdr = hdr.withColumn("blob", F.unhex("hdr_hex")).withColumn(
        "hdr_rt", F.hex("blob")
    )
    return (
        hdr.select(
            "event_id",
            F.expr("(cast(conv(substr(hdr_rt, 9, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 11, 2), 16, 10) as bigint) * 256 + cast(conv(substr(hdr_rt, 13, 2), 16, 10) as bigint) * 65536 + cast(conv(substr(hdr_rt, 15, 2), 16, 10) as bigint) * 16777216)").cast("long").alias("riff_size"),
        F.expr("(cast(conv(substr(hdr_rt, 33, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 35, 2), 16, 10) as bigint) * 256 + cast(conv(substr(hdr_rt, 37, 2), 16, 10) as bigint) * 65536 + cast(conv(substr(hdr_rt, 39, 2), 16, 10) as bigint) * 16777216)").cast("long").alias("fmt_len"),
        F.expr("(cast(conv(substr(hdr_rt, 41, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 43, 2), 16, 10) as bigint) * 256)").cast("long").alias("audio_fmt"),
        F.expr("(cast(conv(substr(hdr_rt, 45, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 47, 2), 16, 10) as bigint) * 256)").cast("long").alias("p_channels"),
        F.expr("(cast(conv(substr(hdr_rt, 49, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 51, 2), 16, 10) as bigint) * 256 + cast(conv(substr(hdr_rt, 53, 2), 16, 10) as bigint) * 65536 + cast(conv(substr(hdr_rt, 55, 2), 16, 10) as bigint) * 16777216)").cast("long").alias("p_rate"),
        F.expr("(cast(conv(substr(hdr_rt, 57, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 59, 2), 16, 10) as bigint) * 256 + cast(conv(substr(hdr_rt, 61, 2), 16, 10) as bigint) * 65536 + cast(conv(substr(hdr_rt, 63, 2), 16, 10) as bigint) * 16777216)").cast("long").alias("p_byte_rate"),
        F.expr("(cast(conv(substr(hdr_rt, 65, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 67, 2), 16, 10) as bigint) * 256)").cast("long").alias("p_block"),
        F.expr("(cast(conv(substr(hdr_rt, 69, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 71, 2), 16, 10) as bigint) * 256)").cast("long").alias("p_bits"),
        F.expr("(cast(conv(substr(hdr_rt, 81, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 83, 2), 16, 10) as bigint) * 256 + cast(conv(substr(hdr_rt, 85, 2), 16, 10) as bigint) * 65536 + cast(conv(substr(hdr_rt, 87, 2), 16, 10) as bigint) * 16777216)").cast("long").alias("p_data"),
            F.expr("((cast(conv(substr(hdr_rt, 81, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 83, 2), 16, 10) as bigint) * 256 + cast(conv(substr(hdr_rt, 85, 2), 16, 10) as bigint) * 65536 + cast(conv(substr(hdr_rt, 87, 2), 16, 10) as bigint) * 16777216)) div ((cast(conv(substr(hdr_rt, 65, 2), 16, 10) as bigint) * 1 + cast(conv(substr(hdr_rt, 67, 2), 16, 10) as bigint) * 256))").cast("long").alias("parsed_samples"),
            F.md5(F.col("hdr_rt")).alias("hdr_md5"),
        )
        .orderBy("event_id")
        .limit(100)
    )
