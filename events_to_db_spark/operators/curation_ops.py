"""Training-data curation operators, round 2 (SURVEY.md §2.12).

Four additions to the LLM-pipeline surface, each picked to close a gap
in the round-1 inventory:

* ``q_text_perplexity`` — statistical quality scoring with a unigram
  language model (the model-based sibling of ``q_text_quality``'s
  heuristics; CCNet-style corpora gate on exactly this number);
* ``q_dedup_snm`` — Sorted-Neighborhood dedup, the classic third
  blocking strategy next to MinHash-LSH and SimHash banding: one global
  sort, candidates limited to a fixed window of neighbors;
* ``q_sim_ivf`` — IVF (inverted-file) approximate nearest neighbor:
  coarse-quantize vectors into cells, probe the top-``nprobe`` cells,
  exact search inside — the other canonical ANN layout next to
  ``q_sim_ann_lsh``'s random hyperplanes, here built on *integer*
  arithmetic so even the oracle can value-check it exactly;
* ``q_mm_audio`` — audio-modality plumbing: PCM16 byte buffers built,
  round-tripped, framed, and reduced to per-frame energies inside
  ``mapInPandas``, with an arithmetic oracle proving the byte-exact
  round trip (same discipline as ``q_mm_resize``).

Scale posture: SNM's global rank uses the two-level bucketed prefix sum
(plans/prefix.py) instead of an unpartitioned window; IVF shuffles only
(cell, id, vector) tuples and searches per-cell; the audio kernel is
embarrassingly partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.plans.prefix import bucketed_running_sum
from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@query(
    "q_text_perplexity",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
        FROM documents
    ),
    cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    g AS (SELECT sum(c) AS n, count(*) AS v FROM cnt),
    scored AS (
        SELECT tok.doc_id, tok.lang,
               ln((cnt.c + 1.0) / (g.n + g.v)) AS lp
        FROM tok JOIN cnt ON tok.t = cnt.t CROSS JOIN g
    ),
    doc AS (
        SELECT doc_id, lang, -avg(lp) AS xent
        FROM scored GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(xent), 4) AS avg_xent,
           round(min(xent), 4) AS min_xent,
           round(max(xent), 4) AS max_xent
    FROM doc GROUP BY lang
    """,
)
def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: train add-one-smoothed token
    probabilities on the whole corpus (p = (c+1)/(N+V)), then score
    each document by its cross-entropy -mean(ln p) — the ln of
    perplexity.  Corpora like CCNet keep the low-perplexity tail and
    drop gibberish on exactly this statistic; here it lands per-lang
    so the answer is a 5-row profile.

    Plan: one explode → token-count aggregate (the model, |V| rows,
    broadcast), token stream re-joined to the model, per-doc then
    per-lang aggregation.  The model is tiny relative to the corpus at
    any scale; the only big shuffles are keyed by token and doc_id.
    Determinism: probabilities are ratios of identical integers; only
    final columns are rounded (§7.5.1)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("t")
    )
    cnt = tok.groupBy("t").agg(F.count("*").alias("c"))
    g = cnt.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    )
    scored = (
        tok.join(F.broadcast(cnt), "t")
        .crossJoin(F.broadcast(g))
        .select(
            "doc_id",
            "lang",
            F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v"))).alias("lp"),
        )
    )
    doc = scored.groupBy("doc_id", "lang").agg((-F.avg("lp")).alias("xent"))
    return doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("xent"), 4).alias("avg_xent"),
        F.round(F.min("xent"), 4).alias("min_xent"),
        F.round(F.max("xent"), 4).alias("max_xent"),
    )


@query(
    "q_dedup_snm",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               list_distinct(string_split(text, ' ')) AS toks,
               row_number() OVER (ORDER BY lang, text, doc_id) AS rk
        FROM documents
    ),
    pairs AS (
        SELECT a.lang,
               len(list_intersect(a.toks, b.toks)) AS i,
               len(a.toks) + len(b.toks)
                   - len(list_intersect(a.toks, b.toks)) AS u
        FROM ranked a
        JOIN ranked b ON a.lang = b.lang AND (b.rk - a.rk) IN (1, 2)
    ),
    agg AS (
        SELECT lang, count(*) AS n_cand,
               sum(CASE WHEN 10 * i >= 7 * u THEN 1 ELSE 0 END) AS n_matches
        FROM pairs GROUP BY lang
    )
    SELECT d.lang, CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(a.n_cand, 0) AS BIGINT) AS n_cand,
           CAST(coalesce(a.n_matches, 0) AS BIGINT) AS n_matches
    FROM (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang) d
    LEFT JOIN agg a ON a.lang = d.lang
    """,
)
def q_dedup_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-Neighborhood dedup: sort the corpus once by
    (lang, text, doc_id), then compare each document only against its
    next w=2 neighbors in that order — candidates are O(n·w) instead of
    O(n²), the classic alternative blocking to MinHash banding for
    corpora whose duplicates share prefixes.  A pair is a duplicate at
    token-set Jaccard ≥ 0.7, tested with the exact integer
    cross-multiplication ``10·|∩| ≥ 7·|∪|`` (no float compare —
    §7.5).

    Scale shape: the global rank comes from the two-level bucketed
    prefix sum over order-aligned buckets (lang + 2-char text prefix),
    not a single-partition window; neighbor pairing is an equi-join on
    ``rank + offset``, a keyed shuffle.  At 100 TB the same plan holds:
    ranks are computed per range-partition with carried offsets, and
    the neighbor join stays local after a range partition on rank."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    ranked = bucketed_running_sum(
        d,
        bucket=F.concat_ws("|", "lang", F.substring("text", 1, 2)),
        order_cols=[F.col("lang"), F.col("text"), F.col("doc_id")],
        sums={"rk": F.lit(1)},
    )
    a = ranked.select(
        F.col("lang").alias("a_lang"),
        F.col("toks").alias("a_toks"),
        F.col("rk").alias("a_rk"),
    ).withColumn("off", F.explode(F.array(F.lit(1), F.lit(2))))
    b = ranked.select(
        F.col("lang").alias("b_lang"),
        F.col("toks").alias("b_toks"),
        F.col("rk").alias("b_rk"),
    )
    pairs = a.join(
        b,
        (F.col("a_rk") + F.col("off") == F.col("b_rk"))
        & (F.col("a_lang") == F.col("b_lang")),
    )
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    uni = F.size("a_toks") + F.size("b_toks") - inter
    agg = pairs.groupBy(F.col("a_lang").alias("lang")).agg(
        F.count("*").alias("n_cand"),
        F.sum(F.when(10 * inter >= 7 * uni, 1).otherwise(0)).alias(
            "n_matches"
        ),
    )
    n_docs = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    return n_docs.join(agg, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
        F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
    )


#: Integer quantization scale for the IVF kernel: float32 components ∈
#: (-0.6, 0.6) (measured) map to exact integers round(x·1000) — both
#: engines compute the identical value, so every downstream dot product
#: is exact 64-bit arithmetic and the whole ANN result value-hashes.
_IVF_CELLS = 8
_IVF_NPROBE = 2


@query(
    "q_sim_ivf",
    oracle=f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                   AS qv
        FROM embeddings
    ),
    e0 AS (SELECT vec_id, vec_id % {_IVF_CELLS} AS cell, qv FROM q),
    ex0 AS (
        SELECT cell,
               unnest(generate_series(1, len(qv))) AS pos,
               unnest(qv) AS v
        FROM e0
    ),
    cd0 AS (
        SELECT cell, pos,
               CAST(floor(sum(v) / CAST(count(*) AS DOUBLE)) AS BIGINT)
                   AS cdim
        FROM ex0 GROUP BY cell, pos
    ),
    cv0 AS (SELECT cell, list(cdim ORDER BY pos) AS cvec
            FROM cd0 GROUP BY cell),
    a1 AS (
        SELECT vec_id, c AS cell FROM (
            SELECT e0.vec_id, cv0.cell AS c, row_number() OVER
                       (PARTITION BY e0.vec_id
                        ORDER BY list_inner_product(e0.qv, cv0.cvec) DESC,
                                 cv0.cell) AS rn
            FROM e0 CROSS JOIN cv0
        ) WHERE rn = 1
    ),
    e AS (SELECT q.vec_id, a1.cell, q.qv
          FROM q JOIN a1 ON a1.vec_id = q.vec_id),
    ex AS (
        SELECT cell,
               unnest(generate_series(1, len(qv))) AS pos,
               unnest(qv) AS v
        FROM e
    ),
    cd AS (
        SELECT cell, pos,
               CAST(floor(sum(v) / CAST(count(*) AS DOUBLE)) AS BIGINT)
                   AS cdim
        FROM ex GROUP BY cell, pos
    ),
    cv AS (SELECT cell, list(cdim ORDER BY pos) AS cvec FROM cd GROUP BY cell),
    scores AS (
        SELECT e.vec_id, cv.cell AS c,
               CAST(list_inner_product(e.qv, cv.cvec) AS BIGINT) AS score
        FROM e CROSS JOIN cv
    ),
    assign AS (
        SELECT vec_id, c, row_number() OVER
                   (PARTITION BY vec_id ORDER BY score DESC, c) AS rn
        FROM scores
    ),
    own AS (SELECT vec_id, c AS cell FROM assign WHERE rn = 1),
    cand AS (
        SELECT o.cell, q.vec_id AS cand_id, q.qv AS cqv
        FROM q JOIN own o ON q.vec_id = o.vec_id
    ),
    probe AS (
        SELECT a.vec_id, q.qv, a.c AS cell
        FROM assign a JOIN q ON q.vec_id = a.vec_id
        WHERE a.rn <= {_IVF_NPROBE}
    ),
    pair AS (
        SELECT p.vec_id, c.cand_id,
               CAST(list_inner_product(p.qv, c.cqv) AS BIGINT) AS score
        FROM probe p
        JOIN cand c ON p.cell = c.cell AND c.cand_id <> p.vec_id
    ),
    nn AS (
        SELECT vec_id, cand_id, score, row_number() OVER
                   (PARTITION BY vec_id ORDER BY score DESC, cand_id) AS rn
        FROM pair
    )
    SELECT vec_id, cand_id AS nn_id, score FROM nn WHERE rn = 1
    ORDER BY vec_id LIMIT 100
    """,
)
def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate nearest neighbor, exactly value-checkable:
    vectors are quantized to integers (round(x·1000) — identical in
    both engines), coarse centroids are trained from a deterministic
    seed partition (vec_id mod 8) plus one Lloyd reassignment —
    floor-averaged integer centroids throughout — then each query
    probes its top-2 cells by integer inner product and runs exact
    search inside: the inverted-file layout every production vector
    store uses, with `nlist`/`nprobe`/train iterations as the
    recall/cost dials.

    All scores are exact 64-bit integer dot products: assignment
    argmax, probe choice, and final neighbor are all decided on
    integers with id tie-breaks, so this ANN query hash-matches its
    oracle — unlike float formulations where cross-engine ulps could
    flip an argmax (§7.5: no float argmax).

    Scale shape: centroids are |cells|×dim (broadcast); the only data
    shuffles are keyed by cell; per-cell search is one exact int64
    NumPy matmul per cell via cogrouped ``applyInPandas`` (batch
    arithmetic identical to the oracle's per-pair SQL — integer matmul
    has no rounding).  At 100 TB: nlist grows to √n, centroids come
    from a real k-means fit (q_dedup_cluster shows the iterative
    harness), and nothing else changes."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> cast(round(cast(x as double) * 1000) as bigint))"
        ).alias("qv"),
    )

    dot_qc = F.expr(
        "aggregate(zip_with(qv, cvec, (x, y) -> x * y), 0L,"
        " (acc, v) -> acc + v)"
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("c")
    )

    def centroids(cells: DataFrame) -> DataFrame:
        """Floor-averaged integer centroid per cell (|cells|×dim)."""
        ex = cells.select("cell", F.posexplode("qv").alias("pos", "v"))
        cd = ex.groupBy("cell", "pos").agg(
            F.floor(F.sum("v") / F.count("*").cast("double"))
            .cast("long")
            .alias("cdim")
        )
        return cd.groupBy("cell").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cdim))),"
                " s -> s.cdim)"
            ).alias("cvec")
        )

    def cell_scores(vectors: DataFrame, cv: DataFrame) -> DataFrame:
        """Ranked integer inner-product of every vector × centroid."""
        return (
            vectors.crossJoin(F.broadcast(cv.withColumnRenamed("cell", "c")))
            .select("vec_id", "qv", "c", dot_qc.alias("score"))
            .withColumn("rn", F.row_number().over(w_assign))
        )

    # Train: seed partition -> centroids -> one Lloyd reassignment ->
    # refined centroids (recall 0.35 -> 0.51 on this structureless
    # corpus; more iterations = q_dedup_cluster's loop harness).
    e0 = q.withColumn("cell", F.col("vec_id") % _IVF_CELLS)
    cv0 = centroids(e0)
    a1 = (
        cell_scores(q, cv0)
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("c").alias("cell"))
    )
    e = q.join(a1, "vec_id").select("vec_id", "cell", "qv")
    cv = centroids(e)

    assign = cell_scores(e.drop("cell"), cv)
    own = assign.filter(F.col("rn") == 1).select(
        "vec_id", F.col("c").alias("cell")
    )
    cand = q.join(own, "vec_id").select(
        "cell", F.col("vec_id").alias("cand_id"), F.col("qv").alias("cqv")
    )
    probe = assign.filter(F.col("rn") <= _IVF_NPROBE).select(
        "vec_id", "qv", F.col("c").alias("cell")
    )

    # Per-cell exact search as ONE int64 matmul per cell (numpy integer
    # matmul is exact, so the arithmetic is identical to the per-pair
    # SQL formulation the oracle runs — just 20x faster than walking a
    # zip_with expression tree per pair: 9.8 s -> sub-second at sf0.1).
    import numpy as np
    import pandas as pd

    def cell_search(key, probes_pdf, cand_pdf):
        if probes_pdf.empty or cand_pdf.empty:
            return pd.DataFrame(
                columns=["vec_id", "cand_id", "score"]
            ).astype({"vec_id": "int64", "cand_id": "int64", "score": "int64"})
        Q = np.array(probes_pdf["qv"].tolist(), dtype=np.int64)
        C = np.array(cand_pdf["cqv"].tolist(), dtype=np.int64)
        qids = probes_pdf["vec_id"].to_numpy()
        cids = cand_pdf["cand_id"].to_numpy()
        # Candidates sorted by id => np.argmax's first-max IS the
        # lowest-cand_id tie-break.
        order = np.argsort(cids, kind="stable")
        C, cids = C[order], cids[order]
        S = Q @ C.T
        S[qids[:, None] == cids[None, :]] = np.iinfo(np.int64).min  # self
        best = S.argmax(axis=1)
        return pd.DataFrame(
            {
                "vec_id": qids,
                "cand_id": cids[best],
                "score": S[np.arange(len(qids)), best],
            }
        )

    per_cell = (
        probe.groupBy("cell")
        .cogroup(cand.groupBy("cell"))
        .applyInPandas(cell_search, "vec_id long, cand_id long, score long")
    )
    w_nn = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("cand_id")
    )
    return (
        per_cell.withColumn("rn", F.row_number().over(w_nn))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cand_id").alias("nn_id"), "score")
        .orderBy("vec_id")
        .limit(100)
    )


@query(
    "q_mm_audio",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(200 + (doc_id % 4) * 40 AS INT) AS n
        FROM documents
    ),
    samp AS (
        SELECT doc_id, unnest(generate_series(0, n - 1)) AS i
        FROM base
    ),
    f AS (
        SELECT doc_id, i // 40 AS frame,
               sum(abs((doc_id * 31 + i * 7) % 2003 - 1001)) AS energy
        FROM samp GROUP BY doc_id, i // 40
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_frames, max(energy) AS peak_energy,
               sum(energy) AS total_energy
        FROM f GROUP BY doc_id
    ),
    peak AS (
        SELECT f.doc_id, min(f.frame) AS peak_frame
        FROM f JOIN agg USING (doc_id)
        WHERE f.energy = agg.peak_energy
        GROUP BY f.doc_id
    )
    SELECT a.doc_id, CAST(a.n_frames AS INT) AS n_frames,
           CAST(p.peak_frame AS INT) AS peak_frame,
           CAST(a.peak_energy AS BIGINT) AS peak_energy,
           CAST(a.total_energy AS BIGINT) AS total_energy
    FROM agg a JOIN peak p ON p.doc_id = a.doc_id
    """,
)
def q_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality plumbing: a synthetic PCM16 waveform per doc
    (sample values a deterministic function of (doc_id, i)) is packed
    to little-endian int16 **bytes**, parsed back from the buffer,
    split into 40-sample frames, and reduced to per-frame absolute
    energies — the windowing + feature-extract step of an audio
    training pipeline (VAD, loudness normalization, silence trimming
    all start here).  The oracle recomputes the frame energies
    arithmetically, so the differential check proves the byte-level
    round trip (synth → pack → parse → frame) is exact.  Energies are
    integer sums — no float anywhere.  Swap the synthesizer for real
    WAV/FLAC bytes and the parser for soundfile/ffmpeg and nothing
    else changes (same discipline as ``q_mm_framesample``)."""
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def frame_energy(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 200 + (doc_id % 4) * 40
                i = np.arange(n, dtype=np.int64)
                pcm = ((doc_id * 31 + i * 7) % 2003 - 1001).astype("<i2")
                buf = pcm.tobytes()  # ---- the byte boundary ----
                got = np.frombuffer(buf, dtype="<i2").astype(np.int64)
                frames = got.reshape(-1, 40)
                energy = np.abs(frames).sum(axis=1)
                out.append(
                    (
                        doc_id,
                        int(energy.size),
                        int(energy.argmax()),  # first max = lowest frame
                        int(energy.max()),
                        int(energy.sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_frames",
                    "peak_frame",
                    "peak_energy",
                    "total_energy",
                ],
            )

    return d.mapInPandas(
        frame_energy,
        "doc_id long, n_frames int, peak_frame int,"
        " peak_energy long, total_energy long",
    )


@query("q_text_compress", oracle=None)
def q_text_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: deflate each document at a
    fixed level and report compressed/raw size per language — the
    Gopher/FineWeb-style repetition heuristic (highly compressible ⇒
    repetitive/templated text; incompressible ⇒ possibly binary junk).
    zlib at a pinned level is bit-deterministic for a given input, so
    the per-doc ratio is reproducible run-to-run, but no SQL engine
    exposes deflate — hence a rows-only contract entry with the
    invariants pinned by unit test (ratio bounds, monotonicity under
    repetition) in tests/test_round2_ops.py.

    Plan: embarrassingly parallel ``mapInPandas`` over Arrow batches
    (no shuffle before the per-lang aggregate); the kernel is the
    plumbing slot where a real pipeline hangs language-model-based
    quality scoring too."""
    import zlib

    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def ratios(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "lang": pdf["lang"],
                    "ratio": comp / raw.map(len),
                }
            )

    r = d.mapInPandas(ratios, "lang string, ratio double")
    return r.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("ratio"), 4).alias("avg_ratio"),
        F.round(F.min("ratio"), 4).alias("min_ratio"),
        F.round(F.max("ratio"), 4).alias("max_ratio"),
    )


#: Product-quantization geometry: 8 subspaces × 8 dims, 16-entry
#: codebooks seeded by vec_id mod 16 (same integer-exact discipline as
#: q_sim_ivf: quantized inputs, floor-averaged centroids, integer
#: squared distances — the whole encoding value-hashes).
_PQ_M, _PQ_D, _PQ_K = 8, 8, 16


@query(
    "q_embed_pq",
    oracle=f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                   AS qv
        FROM embeddings
    ),
    ex AS (
        SELECT vec_id, vec_id % {_PQ_K} AS seed_cell,
               (unnest(generate_series(1, len(qv))) - 1) // {_PQ_D} AS s,
               (unnest(generate_series(1, len(qv))) - 1) % {_PQ_D} AS j,
               unnest(qv) AS v
        FROM q
    ),
    cd AS (
        SELECT s, seed_cell AS cell, j,
               CAST(floor(sum(v) / CAST(count(*) AS DOUBLE)) AS BIGINT)
                   AS cdim
        FROM ex GROUP BY s, seed_cell, j
    ),
    dist AS (
        SELECT e.vec_id, e.s, c.cell, sum((e.v - c.cdim) * (e.v - c.cdim))
                   AS d2
        FROM ex e JOIN cd c ON c.s = e.s AND c.j = e.j
        GROUP BY e.vec_id, e.s, c.cell
    ),
    best AS (
        SELECT vec_id, s, cell, d2, row_number() OVER
                   (PARTITION BY vec_id, s ORDER BY d2, cell) AS rn
        FROM dist
    )
    SELECT s AS subspace,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(d2), 4) AS avg_sqerr,
           CAST(max(d2) AS BIGINT) AS max_sqerr,
           CAST(count(DISTINCT cell) AS BIGINT) AS codes_used
    FROM best WHERE rn = 1
    GROUP BY s
    """,
)
def q_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: each 64-d vector is split into 8
    subvectors of 8 dims, and each subvector is encoded as its nearest
    entry in a per-subspace 16-entry codebook — the compression layout
    (8 bytes per vector instead of 256) behind every large-scale
    vector index; the query reports per-subspace reconstruction error
    and codebook utilization, the two numbers that size a PQ deploy.
    Codebooks are floor-averaged integer centroids over a
    deterministic seed partition; distances are exact integer squared
    norms — the full encode path value-hashes against the oracle
    (same no-float-argmax discipline as q_sim_ivf).

    Scale shape: codebooks are m×k×d' = 1 024 tiny rows (broadcast);
    the encode is a per-(vector, subspace) aggregate keyed by vec_id —
    no shuffle grows faster than the input."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> cast(round(cast(x as double) * 1000) as bigint))"
        ).alias("qv"),
    )
    ex = q.select(
        "vec_id",
        (F.col("vec_id") % _PQ_K).alias("seed_cell"),
        F.posexplode("qv").alias("pos", "v"),
    ).select(
        "vec_id",
        "seed_cell",
        (F.col("pos") / _PQ_D).cast("long").alias("s"),
        (F.col("pos") % _PQ_D).alias("j"),
        "v",
    )
    cd = ex.groupBy("s", F.col("seed_cell").alias("cell"), "j").agg(
        F.floor(F.sum("v") / F.count("*").cast("double"))
        .cast("long")
        .alias("cdim")
    )
    dist = (
        ex.join(F.broadcast(cd), ["s", "j"])
        .groupBy("vec_id", "s", "cell")
        .agg(
            F.sum(
                (F.col("v") - F.col("cdim")) * (F.col("v") - F.col("cdim"))
            ).alias("d2")
        )
    )
    w_best = Window.partitionBy("vec_id", "s").orderBy("d2", "cell")
    best = dist.withColumn("rn", F.row_number().over(w_best)).filter(
        F.col("rn") == 1
    )
    return best.groupBy(F.col("s").alias("subspace")).agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg("d2"), 4).alias("avg_sqerr"),
        F.max("d2").alias("max_sqerr"),
        F.countDistinct("cell").alias("codes_used"),
    )


@query(
    "q_text_logodds",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    lt AS (SELECT lang, t, count(*) AS a FROM tok GROUP BY 1, 2),
    ltot AS (SELECT lang, count(*) AS at FROM tok GROUP BY 1),
    gtot AS (SELECT t, count(*) AS g FROM tok GROUP BY 1),
    alltot AS (SELECT count(*) AS tt FROM tok),
    scored AS (
        SELECT lt.lang, lt.t,
               CAST(lt.a AS BIGINT) AS n_in_lang,
               CAST(gtot.g - lt.a AS BIGINT) AS n_elsewhere,
               -- exact rational odds ratio: every factor is an exact
               -- integer (2x+1 clears the 0.5 smoothing), the single
               -- division is the only float op
               CAST((2 * lt.a + 1)
                    * (2 * (alltot.tt - ltot.at) - 2 * (gtot.g - lt.a) + 1)
                    AS DOUBLE)
               / CAST((2 * ltot.at - 2 * lt.a + 1)
                      * (2 * (gtot.g - lt.a) + 1) AS DOUBLE) AS odds
        FROM lt
        JOIN ltot ON ltot.lang = lt.lang
        JOIN gtot ON gtot.t = lt.t
        CROSS JOIN alltot
    ),
    ranked AS (
        SELECT lang, t, n_in_lang, n_elsewhere, odds,
               row_number() OVER (
                   PARTITION BY lang ORDER BY odds DESC, t) AS rk
        FROM scored
    )
    SELECT lang, t AS term, n_in_lang, n_elsewhere,
           CAST(rk AS BIGINT) AS rk,
           round(ln(odds), 4) AS log_odds
    FROM ranked WHERE rk <= 3
    """,
)
def q_text_logodds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per language by smoothed log-odds ratio
    (Monroe et al.'s "Fightin' Words" with a flat +0.5 prior): for
    each (lang, term), the odds of the term inside the language
    against its odds in the rest of the corpus; top-3 per language.

    This is the keyword-extraction / corpus-comparison primitive of a
    curation pipeline (what makes this source different?).  Ranking
    floats across engines is banned (SURVEY §7.5), so the sort key is
    the odds ratio assembled from exact integers: 2x+1 clears the 0.5
    smoothing, all four factors are BIGINT (≤ 2·|tokens| + 1, products
    < 2^53 ⇒ the DOUBLE conversions and the one division are exact and
    bit-identical), and ties break on the term.  ``ln`` is applied
    only to the already-agreed value for display.

    Plan: one explode, three hash aggregates (two of them over the
    tiny (lang) / (term) key spaces → broadcast back), one window over
    per-lang candidate terms.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("t")
    )
    lt = tok.groupBy("lang", "t").agg(F.count("*").alias("a"))
    ltot = tok.groupBy("lang").agg(F.count("*").alias("at"))
    gtot = tok.groupBy("t").agg(F.count("*").alias("g"))
    alltot = tok.agg(F.count("*").alias("tt"))
    scored = (
        lt.join(F.broadcast(ltot), "lang")
        .join(gtot, "t")
        .crossJoin(F.broadcast(alltot))
        .select(
            "lang",
            "t",
            F.col("a").cast("long").alias("n_in_lang"),
            (F.col("g") - F.col("a")).cast("long").alias("n_elsewhere"),
            F.expr(
                "cast((2 * a + 1)"
                " * (2 * (tt - at) - 2 * (g - a) + 1) as double)"
                " / cast((2 * at - 2 * a + 1)"
                " * (2 * (g - a) + 1) as double)"
            ).alias("odds"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("odds").desc(), F.col("t"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "lang",
            F.col("t").alias("term"),
            "n_in_lang",
            "n_elsewhere",
            F.col("rk").cast("long").alias("rk"),
            F.round(F.log("odds"), 4).alias("log_odds"),
        )
    )


@query(
    "q_text_boilerplate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] || ' '
                      || tok[i+3] || ' ' || tok[i+4] AS gram
        FROM toks
        CROSS JOIN (SELECT unnest(generate_series(1, 2000)) AS i)
        WHERE i + 4 <= len(tok)
    ),
    df AS (SELECT gram, count(*) AS n_docs_with FROM sh GROUP BY 1),
    nd AS (SELECT count(*) AS n FROM documents)
    SELECT gram, CAST(n_docs_with AS BIGINT) AS n_docs_with,
           CAST((n_docs_with * 10000) // nd.n AS BIGINT) AS share_bp
    FROM df CROSS JOIN nd
    ORDER BY n_docs_with DESC, gram
    LIMIT 10
    """,
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: the 5-gram phrases shared by the most
    documents (document frequency over distinct per-doc shingles) —
    the template/navigation-chrome sweep (FineWeb-style) a curation
    pipeline runs to strip repeated furniture before training.

    All-integer output (doc counts + basis-point share via integer
    floor division); ties on the phrase text.  Plan: explode to
    per-doc distinct shingles (the DISTINCT bounds each doc's
    contribution), one hash aggregate, top-10 — at 100 TB the gram
    key space is trimmed by the same hash-partition aggregate; no
    driver-side state.  The oracle's fixed 1..200 position series is
    an upper bound on the corpus's ~60-token docs; the Spark side
    derives positions from each doc's actual length.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("tok"))
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                # size < 5 must yield array(), not sequence(1, 0):
                # Spark's sequence DESCENDS when stop < start, so the
                # greatest(...,0) guard alone still emits i=0,1 and the
                # ANSI array index throws on 1-token docs.
                F.expr(
                    "transform(if(size(tok) >= 5,"
                    " sequence(1, size(tok) - 4), array()),"
                    " i -> concat_ws(' ', tok[i-1], tok[i], tok[i+1],"
                    " tok[i+2], tok[i+3]))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    df = sh.groupBy("gram").agg(F.count("*").alias("n_docs_with"))
    nd = docs.agg(F.count("*").alias("n"))
    return (
        df.crossJoin(F.broadcast(nd))
        .select(
            "gram",
            F.col("n_docs_with").cast("long").alias("n_docs_with"),
            F.expr("(n_docs_with * 10000) div n").cast("long").alias(
                "share_bp"
            ),
        )
        .orderBy(F.col("n_docs_with").desc(), "gram")
        .limit(10)
    )


@query(
    "q_dedup_cross_source",
    oracle="""
    WITH fp AS (
        SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                   AS h,
               source, doc_id
        FROM documents
    ),
    spread AS (
        SELECT h,
               count(DISTINCT source) AS n_sources,
               count(*) AS n_copies,
               min(doc_id) AS exemplar
        FROM fp GROUP BY 1
    )
    SELECT h AS text_md5, n_sources, n_copies,
           CAST(exemplar AS BIGINT) AS exemplar
    FROM spread
    WHERE n_sources > 1
    ORDER BY n_copies DESC, text_md5
    """,
)
def q_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shared-prefix sweep: documents whose first-8-token
    fingerprint appears under more than one source — the syndicated
    header / boilerplate-preamble leak a curation pipeline must catch
    BEFORE per-source dedup (it inflates a source's apparent
    originality and leaks eval data between splits drawn by source).
    Full-text md5 is the strict variant; the 8-token prefix is the
    boilerplate-sensitive one (this corpus has no byte-exact
    cross-source copies but plenty of shared openings).

    One hash aggregate over (md5, source) partials; fingerprints are
    computed engine-side (identical lowercase hex), no text shuffled —
    only 32-byte hashes move.  Exemplar = min doc_id for determinism.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
        ).alias("h"),
        "source",
        "doc_id",
    )
    return (
        fp.groupBy("h")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count("*").alias("n_copies"),
            F.min("doc_id").cast("long").alias("exemplar"),
        )
        .where(F.col("n_sources") > 1)
        .select(
            F.col("h").alias("text_md5"),
            "n_sources",
            "n_copies",
            "exemplar",
        )
        .orderBy(F.col("n_copies").desc(), "text_md5")
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, lang,
               t[g.i] || ' ' || t[g.i + 1] || ' ' || t[g.i + 2] AS tri
        FROM toks,
             (SELECT unnest(generate_series(1, 2000)) AS i) g
        WHERE g.i + 2 <= len(t)
    ),
    per_doc AS (
        SELECT doc_id, lang,
               count(*) AS n_grams,
               count(DISTINCT tri) AS n_distinct
        FROM grams GROUP BY 1, 2
    )
    SELECT lang,
           CAST((10 * (n_grams - n_distinct)) // n_grams AS BIGINT)
               AS rep_decile,
           count(*) AS n_docs
    FROM per_doc
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (Gopher-style quality rule): the
    fraction of a doc's 3-gram occurrences that are repeats of an
    earlier 3-gram in the SAME doc, deciled — high deciles flag
    template spam and stuck-generator text; the within-doc companion
    to the cross-doc boilerplate sweep.

    The decile is an exact integer floor (10·dups // total), never a
    float ratio.  Spark builds trigrams with ``transform`` over the
    token array (no explode of raw tokens — one array expression per
    row, then one explode of the gram list); the oracle unnests an
    index series capped at 200 (docs are ~60 tokens; the cap is
    documented slack, not truncation).
    """
    d = load_table(spark, sf_dir, "documents")
    # if() guard, not greatest(...,0): sequence(1, 0) DESCENDS in Spark
    # and the resulting i=0,1 indexes throw on sub-3-token docs.
    # Bind the token array ONCE per row before the lambda: Catalyst
    # does not CSE split() inside transform(), so the inlined form
    # re-tokenized the doc 3x PER GRAM (the q_contamination lesson;
    # 4.9 s -> 2.4 s warm at sf0.1).  A no-explode variant
    # (size/array_distinct per row) was A/B-measured SLOWER (5-7 s):
    # without the explode shuffle the whole build stays on the
    # one-file scan's single task, and spreading the scan first just
    # traded the win back for an array shuffle.
    grams_arr = F.expr(
        "transform(if(size(toks) >= 3,"
        " sequence(1, size(toks) - 2), array()),"
        " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
    )
    grams = d.select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    ).select("doc_id", "lang", F.explode(grams_arr).alias("tri"))
    per_doc = grams.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_grams"),
        F.countDistinct("tri").alias("n_distinct"),
    )
    return (
        per_doc.groupBy(
            "lang",
            F.expr("(10 * (n_grams - n_distinct)) div n_grams")
            .cast("long")
            .alias("rep_decile"),
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "rep_decile")
    )


@query("q_ml_kmeans", oracle=None)
def q_ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding table (k = 8,
    3 iterations, centroids seeded from the 8 lowest ``vec_id``
    vectors) — the clustering primitive under corpus topic-balancing
    and IVF coarse quantizers.

    Scale shape: the per-iteration state that moves is only the k×dim
    centroid matrix (bounded, driver-collected and rebroadcast — the
    same contract as ``q_sim_centroid``); assignment is pure Catalyst:
    per-centroid squared distance via ``aggregate(zip_with(...))``,
    argmin via ``array_min`` over (dist, cid) structs so ties break to
    the lowest cluster id deterministically (§7.5 — struct comparison
    is field-order lexicographic).  New centroids come from one
    posexplode + (cluster, dim) hash aggregate — one shuffle per
    iteration, never a row collect.

    Iterative float maths has no SQL-expressible oracle → rows-only
    contract entry; the invariants (partition sizes sum to N, inertia
    monotone non-increasing) are pinned in tests/test_round2_ops.py.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    k, iters = 8, 3

    seeds = (
        emb.orderBy("vec_id").limit(k).select("embedding").collect()
    )
    centroids = [list(map(float, r.embedding)) for r in seeds]

    def dist2(cid: int) -> F.Column:
        c = F.array(*[F.lit(v) for v in centroids[cid]])
        return F.aggregate(
            F.zip_with(F.col("embedding"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    assigned = None
    for _ in range(iters):
        pairs = F.array(
            *[F.struct(dist2(i).alias("d"), F.lit(i).alias("cid")) for i in range(k)]
        )
        assigned = emb.withColumn("best", F.array_min(pairs)).select(
            "vec_id",
            "embedding",
            F.col("best.cid").alias("cluster_id"),
            F.col("best.d").alias("d2"),
        )
        new_c = (
            assigned.select("cluster_id", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in new_c:
            by_cid.setdefault(r.cluster_id, {})[r.pos] = r.m
        centroids = [
            [by_cid[c][p] for p in range(len(centroids[0]))] if c in by_cid
            else centroids[c]
            for c in range(k)
        ]

    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.round(F.avg("d2"), 3).alias("avg_dist2"),
        )
        .orderBy("cluster_id")
    )


@query(
    "q_text_winnowing",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    grams AS (
        SELECT doc_id, i AS pos,
               ('0x' || substr(md5(tok[i] || ' ' || tok[i+1] || ' '
                               || tok[i+2] || ' ' || tok[i+3]), 1, 15)
               )::BIGINT AS h,
               len(tok) - 3 AS n_grams
        FROM toks,
             (SELECT unnest(generate_series(1, 2000)) AS i)
        WHERE len(tok) >= 4 AND i <= len(tok) - 3
    ),
    wins AS (
        SELECT doc_id, pos, n_grams,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)
                   AS fp
        FROM grams
    ),
    fps AS (
        SELECT DISTINCT doc_id, fp
        FROM wins WHERE pos <= greatest(n_grams - 4, 1)
    )
    SELECT fp,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM fps
    GROUP BY fp
    ORDER BY n_docs DESC, fp
    LIMIT 10
    """,
)
def q_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every 4-token shingle, then keep the minimum
    hash of each sliding window of 5 consecutive shingles — a position-
    robust fingerprint set that guarantees any shared run of ≥ 8 tokens
    between two documents shares at least one fingerprint.  Output: the
    10 most widely shared fingerprints (the corpus's boilerplate spine).

    Determinism: md5-derived 60-bit integer hashes (same derivation in
    both engines), windowed min per doc (partitioned by doc — scales),
    DISTINCT bounds each doc's vote to 1, count ties broken by fp.
    The oracle's fixed 1..200 position series upper-bounds this
    corpus's ~60-token docs; the Spark side derives positions from each
    document's actual length (sequence guarded for < 4-token docs)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("tok"))
        .select(
            "doc_id",
            (F.size("tok") - 3).alias("n_grams"),
            F.explode(
                F.expr(
                    "transform(if(size(tok) >= 4,"
                    " sequence(1, size(tok) - 3), array()),"
                    " i -> struct(i AS pos,"
                    " CAST(conv(substr(md5(concat_ws(' ', tok[i-1], tok[i],"
                    " tok[i+1], tok[i+2])), 1, 15), 16, 10) AS BIGINT)"
                    " AS h))"
                )
            ).alias("g"),
        )
        .select("doc_id", "n_grams", F.col("g.pos").alias("pos"),
                F.col("g.h").alias("h"))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, 4)
    )
    fps = (
        grams.select(
            "doc_id", "pos", "n_grams", F.min("h").over(w).alias("fp")
        )
        .where(F.col("pos") <= F.greatest(F.col("n_grams") - 4, F.lit(1)))
        .select("doc_id", "fp")
        .distinct()
    )
    return (
        fps.groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "fp")
        .limit(10)
    )


@query(
    "q_text_chunk",
    oracle="""
    WITH d AS (
        SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
        FROM documents
    ),
    nn AS (SELECT doc_id, toks, len(toks) AS n FROM d),
    st AS (
        SELECT doc_id, toks, n,
               unnest(generate_series(
                   0, CASE WHEN n > 32 THEN (n - 9) // 24 ELSE 0 END)) AS s
        FROM nn
    ),
    ch AS (
        SELECT doc_id, s, n,
               array_to_string(
                   list_slice(toks, s * 24 + 1, least(s * 24 + 32, n)),
                   ' ') AS chunk
        FROM st
    )
    SELECT doc_id,
           CAST(s AS INT) AS chunk_idx,
           CAST(s * 24 AS BIGINT) AS start_tok,
           CAST(least(32, n - s * 24) AS BIGINT) AS n_tok,
           CAST(('0x' || substr(md5(chunk), 1, 15)) AS BIGINT) AS chunk_hash,
           CAST(count(*) OVER (
               PARTITION BY ('0x' || substr(md5(chunk), 1, 15))::BIGINT
           ) AS BIGINT) AS n_occurrences
    FROM ch
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: fixed 32-token windows with stride
    24 (8-token overlap), one output row per chunk with its corpus-wide
    occurrence count — the splitter stage every retrieval pipeline runs
    before embedding.

    Start offsets come from ``sequence`` guarded by an ``if`` (Spark's
    ``sequence(1, 0)`` DESCENDS — the guard is load-bearing for short
    docs, cf. the q_text_fingerprint edge-corpus lesson); the final
    chunk is allowed to run short (min 9 tokens by construction of the
    stride).  Chunk identity is the usual md5-prefix BIGINT.  Plan:
    one explode (fan-out ≤ n/24 per doc) + one partitioned window over
    the hash — fully keyed, no global order anywhere, so the same plan
    chunks a 100 TB corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    ch = (
        docs.select(
            "doc_id",
            F.expr("split(coalesce(text, ''), ' ')").alias("toks"),
        )
        .withColumn("n", F.expr("size(toks)"))
        .withColumn(
            "s",
            F.explode(
                F.expr(
                    "if(n > 32,"
                    " sequence(0, (n - 9) div 24),"
                    " array(0))"
                )
            ),
        )
        .withColumn(
            "chunk",
            F.expr(
                "concat_ws(' ',"
                " slice(toks, s * 24 + 1, least(32, n - s * 24)))"
            ),
        )
        .withColumn(
            "chunk_hash",
            F.expr("conv(substr(md5(chunk), 1, 15), 16, 10)").cast("long"),
        )
    )
    w = Window.partitionBy("chunk_hash")
    return ch.select(
        "doc_id",
        F.col("s").cast("int").alias("chunk_idx"),
        (F.col("s") * 24).cast("long").alias("start_tok"),
        F.expr("least(32, n - s * 24)").cast("long").alias("n_tok"),
        "chunk_hash",
        F.count("*").over(w).cast("long").alias("n_occurrences"),
    )


@query(
    "q_embed_int8",
    oracle="""
    WITH a AS (
        SELECT vec_id,
               list_max(list_transform(embedding, v -> abs(v::DOUBLE)))
                   AS amax,
               embedding
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, amax,
               CASE WHEN amax = 0
                    THEN list_transform(embedding, v -> CAST(0 AS BIGINT))
                    ELSE list_transform(
                        embedding,
                        v -> CAST(round((v::DOUBLE * 127.0) / amax)
                                  AS BIGINT))
               END AS qv
        FROM a
    )
    SELECT vec_id,
           round(amax, 6) AS amax_r,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT)
               AS q_l1,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max,
           CAST(len(list_filter(qv, x -> x = 0)) AS BIGINT) AS n_zero
    FROM q
    """,
)
def q_embed_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    compression step vector stores apply before indexing (scale =
    max|x|/127 per vector, q = round(x·127/max|x|)).

    The quantized codes are exact integers, so the per-vector audit
    columns (sum, L1 mass, min/max code, dead-zero count) value-hash
    between engines with no float-summation hazard; the only floats
    are the per-element divide — the identical ``(x·127)/amax``
    expression tree in both engines — and the reported scale, rounded
    to 6.  Zero-vector guard keeps the map total.  Embarrassingly
    row-parallel: no shuffle at all after the scan.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        "vec_id",
        F.expr(
            "array_max(transform(embedding, v -> abs(cast(v as double))))"
        ).alias("amax"),
        "embedding",
    )
    q = a.withColumn(
        "qv",
        F.expr(
            "case when amax = 0"
            " then transform(embedding, v -> cast(0 as bigint))"
            " else transform(embedding,"
            "   v -> cast(round((cast(v as double) * 127.0) / amax)"
            "        as bigint)) end"
        ),
    )
    return q.select(
        "vec_id",
        F.round("amax", 6).alias("amax_r"),
        F.expr("aggregate(qv, cast(0 as bigint), (acc, x) -> acc + x)")
        .alias("q_sum"),
        F.expr(
            "aggregate(qv, cast(0 as bigint), (acc, x) -> acc + abs(x))"
        ).alias("q_l1"),
        F.expr("array_min(qv)").alias("q_min"),
        F.expr("array_max(qv)").alias("q_max"),
        F.expr("size(filter(qv, x -> x = 0))").cast("long").alias("n_zero"),
    )


@query(
    "q_text_simpson",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2
    ),
    d AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(c * (c - 1)) AS BIGINT) AS simpson_num
        FROM tf GROUP BY 1
    )
    SELECT doc_id, n_tokens, simpson_num,
           CASE WHEN n_tokens >= 2
                THEN round(CAST(simpson_num AS DOUBLE)
                           / (n_tokens * (n_tokens - 1)), 6)
           END AS simpson_index
    FROM d
    """,
)
def q_text_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson lexical-diversity index per document: the probability
    two tokens drawn without replacement are the same word, Σn_i(n_i−1)
    / (N(N−1)) — the repetition-sensitive cousin of q_text_heaps'
    type-token curve (high Simpson = degenerate, low-diversity text, a
    standard corpus-quality gate).

    Numerator and denominator are exact BIGINTs from one explode + two
    keyed aggregates; the index is the only float, rounded to 6; docs
    under 2 tokens surface NULL rather than dividing by zero.  Fully
    keyed by (doc, word) then doc — no window, no global order.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' ')")).alias("w")
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    d = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias(
            "simpson_num"
        ),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "simpson_num",
        F.when(
            F.col("n_tokens") >= 2,
            F.round(
                F.col("simpson_num").cast("double")
                / (F.col("n_tokens") * (F.col("n_tokens") - 1)),
                6,
            ),
        ).alias("simpson_index"),
    )


@query(
    "q_curate_mix",
    oracle="""
    WITH per AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY 1
    ),
    tgt AS (
        SELECT lang, n_docs, chars,
               CASE lang WHEN 'en' THEN 4000 WHEN 'zh' THEN 2000
                         WHEN 'de' THEN 1500 WHEN 'es' THEN 1500
                         ELSE 1000 END AS target_bps
        FROM per
    ),
    tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total_chars FROM per)
    SELECT lang, n_docs, chars, CAST(target_bps AS BIGINT) AS target_bps,
           CAST((target_bps * total_chars * 1000000)
                // (10000 * chars) AS BIGINT) AS rate_ppm,
           CAST(CASE WHEN target_bps * total_chars > 10000 * chars
                     THEN (target_bps * total_chars + 10000 * chars - 1)
                          // (10000 * chars)
                     ELSE 1 END AS BIGINT) AS epochs_needed
    FROM tgt CROSS JOIN tot
    """,
)
def q_curate_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture math: given target language weights (bps), the
    per-language sampling rate (ppm of natural frequency) and the
    number of epochs needed to hit the target without truncating other
    languages — the static computation behind weighted data mixing
    (DoReMi-style reweighting reduces to exactly this table).

    rate_ppm = target_share / natural_share in parts-per-million, all
    integer floor arithmetic (identical in both engines on these
    positive operands); epochs = ceil of the same rational via the
    (a+b−1)//b trick.  One keyed aggregate + one scalar total — the
    mixture table is |langs| rows at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    tgt = per.withColumn(
        "target_bps",
        F.when(F.col("lang") == "en", 4000)
        .when(F.col("lang") == "zh", 2000)
        .when(F.col("lang") == "de", 1500)
        .when(F.col("lang") == "es", 1500)
        .otherwise(1000)
        .cast("long"),
    )
    tot = per.agg(F.sum("chars").cast("long").alias("total_chars"))
    j = tgt.crossJoin(F.broadcast(tot))
    want = F.col("target_bps") * F.col("total_chars")
    have = 10000 * F.col("chars")
    return j.select(
        "lang",
        "n_docs",
        "chars",
        "target_bps",
        F.expr(
            "cast((target_bps * total_chars * 1000000)"
            " div (10000 * chars) as bigint)"
        ).alias("rate_ppm"),
        F.when(want > have, F.expr(
            "cast((target_bps * total_chars + 10000 * chars - 1)"
            " div (10000 * chars) as bigint)"
        ))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("epochs_needed"),
    )


_SHARD_CAP = 2000


@query(
    "q_mm_shard_pack",
    oracle=f"""
    WITH RECURSIVE d AS (
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               row_number() OVER (PARTITION BY source ORDER BY doc_id)
                   AS rn
        FROM documents
    ),
    rec AS (
        SELECT source, doc_id, n_chars, rn,
               CAST(1 AS BIGINT) AS shard_no, n_chars AS fill
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.source, d.doc_id, d.n_chars, d.rn,
               CASE WHEN r.fill + d.n_chars > {_SHARD_CAP}
                    THEN r.shard_no + 1 ELSE r.shard_no END,
               CASE WHEN r.fill + d.n_chars > {_SHARD_CAP}
                    THEN d.n_chars ELSE r.fill + d.n_chars END
        FROM rec r JOIN d ON d.source = r.source AND d.rn = r.rn + 1
    )
    SELECT source, doc_id, shard_no, CAST(fill AS BIGINT) AS fill_after
    FROM rec
    """,
)
def q_mm_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy training-shard packing: within each source, documents in
    doc_id order fill {cap}-char shards first-fit (a doc that would
    overflow starts the next shard; an oversized doc gets its own) —
    the sequential fold every dataset writer runs before emitting
    tfrecord/parquet shards.

    The fold is genuinely order-dependent state, so the Spark side is
    ``applyInPandas`` per source (deterministic doc_id sort inside the
    group, exact integer fill counters) — the documented custom-
    operator tier (b) — while the oracle replays the identical
    recursion as a recursive CTE stepping one rank per round.  Scale:
    groups shuffle by source; each group's fold is O(docs-per-source)
    with integer state, and shard numbering is per-source so no global
    coordination exists at all.
    """.format(cap=_SHARD_CAP)
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        shard, fill = 1, 0
        shards, fills = [], []
        first = True
        for nc in pdf["n_chars"]:
            nc = int(nc)
            if first:
                shard, fill, first = 1, nc, False
            elif fill + nc > _SHARD_CAP:
                shard, fill = shard + 1, nc
            else:
                fill += nc
            shards.append(shard)
            fills.append(fill)
        out = pdf[["source", "doc_id"]].copy()
        out["shard_no"] = pd.Series(shards, dtype="int64")
        out["fill_after"] = pd.Series(fills, dtype="int64")
        return out

    return docs.groupBy("source").applyInPandas(
        pack,
        schema="source string, doc_id long, shard_no long, fill_after long",
    )


@query(
    "q_embed_matryoshka",
    oracle="""
    WITH c AS (
        SELECT vec_id,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT)
                   AS q
        FROM embeddings
    ),
    d64 AS (
        SELECT a.vec_id AS qa, b.vec_id AS qb,
               CAST(sum(a.q * b.q) AS BIGINT) AS dot
        FROM c a JOIN c b ON a.d = b.d AND a.vec_id <> b.vec_id
        GROUP BY 1, 2
    ),
    d16 AS (
        SELECT a.vec_id AS qa, b.vec_id AS qb,
               CAST(sum(a.q * b.q) AS BIGINT) AS dot
        FROM c a JOIN c b ON a.d = b.d AND a.vec_id <> b.vec_id
        WHERE a.d <= 16
        GROUP BY 1, 2
    ),
    t64 AS (
        SELECT qa, qb FROM (
            SELECT qa, qb, row_number() OVER (
                PARTITION BY qa ORDER BY dot DESC, qb) AS rn
            FROM d64) WHERE rn = 1
    ),
    t16 AS (
        SELECT qa, qb FROM (
            SELECT qa, qb, row_number() OVER (
                PARTITION BY qa ORDER BY dot DESC, qb) AS rn
            FROM d16) WHERE rn = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN t64.qb = t16.qb THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           round(CAST(sum(CASE WHEN t64.qb = t16.qb THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS agree_rate
    FROM t64 JOIN t16 USING (qa)
    """,
)
def q_embed_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation evaluation: does max-inner-product
    retrieval with only the FIRST 16 dimensions return the same top-1
    neighbour as the full 64 dimensions?  The measurement behind
    shipping truncated (MRL-style) embeddings to cut index cost 4×.

    Both retrievals run on 1e-6-quantized int64 vectors, so every dot
    product is exact (int64 matmul; ≤ 64·(6e5)² ≈ 2.3e13 per pair) and
    the top-1 argmax (ties → lower id) hash-matches the oracle's
    join-aggregate replay.  Below the sim-family broadcast gate the
    kernel is one NumPy int-matmul per Arrow batch; above it, the
    exact exploded-cells join path engages — same shape as the oracle,
    fully distributed, no driver collect.
    """
    import numpy as np
    import pandas as pd

    from events_to_db_spark.operators.llm_ops import (
        _load_embeddings,
        _sim_broadcast_max,
    )

    e = _load_embeddings(spark, sf_dir).select("vec_id", "embedding")
    n = e.count()
    if n <= _sim_broadcast_max():
        rows = e.orderBy("vec_id").collect()
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        mat = np.rint(
            np.array([r["embedding"] for r in rows], dtype=np.float64)
            * 1_000_000
        ).astype(np.int64)
        bc = spark.sparkContext.broadcast((ids, mat))

        def top1(batches):
            ref_ids, ref = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                q = np.rint(
                    np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                    * 1_000_000
                ).astype(np.int64)
                d64 = q @ ref.T
                d16 = q[:, :16] @ ref[:, :16].T
                out16, out64 = [], []
                for i, vid in enumerate(pdf["vec_id"].to_numpy()):
                    # negate FIRST, then mask self to +inf-equivalent:
                    # negating int64.min wraps back to int64.min and
                    # would sort the self row to the front.
                    mask = ref_ids == vid
                    n64 = -d64[i]
                    n16 = -d16[i]
                    n64[mask] = np.iinfo(np.int64).max
                    n16[mask] = np.iinfo(np.int64).max
                    out64.append(ref_ids[np.lexsort((ref_ids, n64))[0]])
                    out16.append(ref_ids[np.lexsort((ref_ids, n16))[0]])
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "nn16": np.array(out16, dtype=np.int64),
                        "nn64": np.array(out64, dtype=np.int64),
                    }
                )

        pairs = e.mapInPandas(top1, "vec_id long, nn16 long, nn64 long")
    else:
        cells = e.select(
            "vec_id", F.posexplode("embedding").alias("p", "x")
        ).select(
            "vec_id",
            (F.col("p") + 1).alias("d"),
            F.expr(
                "cast(round(cast(x as double) * 1000000) as bigint)"
            ).alias("q"),
        )
        a = cells.alias("a")
        b = cells.alias("b")
        joined = a.join(
            b,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        d64 = joined.groupBy(
            F.col("a.vec_id").alias("qa"), F.col("b.vec_id").alias("qb")
        ).agg(F.sum(F.col("a.q") * F.col("b.q")).alias("dot"))
        d16 = (
            joined.where(F.col("a.d") <= 16)
            .groupBy(
                F.col("a.vec_id").alias("qa"), F.col("b.vec_id").alias("qb")
            )
            .agg(F.sum(F.col("a.q") * F.col("b.q")).alias("dot"))
        )

        def best(df, out):
            w = Window.partitionBy("qa").orderBy(F.desc("dot"), "qb")
            return (
                df.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(F.col("qa").alias("vec_id"), F.col("qb").alias(out))
            )

        pairs = best(d64, "nn64").join(best(d16, "nn16"), "vec_id")
    return pairs.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("nn16") == F.col("nn64"), 1).otherwise(0))
        .cast("long")
        .alias("n_agree"),
        F.round(
            F.sum(
                F.when(F.col("nn16") == F.col("nn64"), 1).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("agree_rate"),
    )


@query(
    "q_text_burstiness",
    oracle="""
    WITH dd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2
    ),
    per AS (
        SELECT w,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS s2
        FROM tf GROUP BY 1
    )
    SELECT w AS word, df, s AS total_count,
           CAST(n_docs * s2 - s * s AS BIGINT) AS var_num,
           CASE WHEN n_docs * s2 - s * s > n_docs * s THEN 1 ELSE 0 END
               AS overdispersed,
           round(CAST(n_docs * s2 - s * s AS DOUBLE) / (n_docs * s), 6)
               AS dispersion_index
    FROM per CROSS JOIN dd
    """,
)
def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness: the variance-to-mean (dispersion) index of each
    word's per-document count over the WHOLE corpus (zero-count docs
    included via the global doc count) — bursty words (index > 1)
    cluster in few docs, the content/function-word split used for
    stop-listing and keyword weighting.

    Dispersion = var/mean = (D·Σc² − S²)/(D·S): the numerator and the
    over-dispersion verdict are exact integer cross-products, the index
    itself one rounded display division.  One explode + two keyed
    aggregates + a scalar doc count — output is |vocabulary| rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    dd = docs.agg(F.count("*").cast("long").alias("n_docs"))
    tf = (
        docs.select(
            "doc_id", F.explode(F.expr("split(text, ' ')")).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    per = tf.groupBy("w").agg(
        F.count("*").alias("df"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    j = per.crossJoin(F.broadcast(dd))
    varnum = F.col("n_docs") * F.col("s2") - F.col("s") * F.col("s")
    return j.select(
        F.col("w").alias("word"),
        "df",
        F.col("s").alias("total_count"),
        varnum.cast("long").alias("var_num"),
        F.when(varnum > F.col("n_docs") * F.col("s"), 1)
        .otherwise(0)
        .alias("overdispersed"),
        F.round(
            varnum.cast("double") / (F.col("n_docs") * F.col("s")), 6
        ).alias("dispersion_index"),
    )


@query(
    "q_mm_vad",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(200 + (doc_id % 4) * 40 AS INT) AS n
        FROM documents
    ),
    samp AS (
        SELECT doc_id, unnest(generate_series(0, n - 1)) AS i
        FROM base
    ),
    f AS (
        SELECT doc_id, i // 40 AS frame,
               sum(abs((doc_id * 31 + i * 7) % 2003 - 1001)) AS energy
        FROM samp GROUP BY doc_id, i // 40
    ),
    act AS (
        SELECT doc_id, frame,
               frame - row_number() OVER (
                   PARTITION BY doc_id ORDER BY frame) AS grp
        FROM f WHERE energy > 20000
    ),
    seg AS (
        SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS seg_len
        FROM act GROUP BY 1, 2
    ),
    per AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(max(seg_len) AS BIGINT) AS longest_run
        FROM seg GROUP BY 1
    ),
    tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
               CAST(count(CASE WHEN energy > 20000 THEN 1 END) AS BIGINT)
                   AS n_active,
               CAST(min(CASE WHEN energy > 20000 THEN frame END) AS BIGINT)
                   AS first_active
        FROM f GROUP BY 1
    )
    SELECT t.doc_id, t.n_frames, t.n_active,
           CAST(coalesce(p.n_segments, 0) AS BIGINT) AS n_segments,
           CAST(coalesce(p.longest_run, 0) AS BIGINT) AS longest_run,
           t.first_active
    FROM tot t LEFT JOIN per p USING (doc_id)
    """,
)
def q_mm_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold voice-activity detection on the q_mm_audio
    byte pipeline: frames above the energy gate are "speech", and the
    detector reports the segment structure (count, longest run, first
    onset) per clip — the silence-trimming pass an audio curation
    pipeline runs before transcription.

    Same byte-boundary discipline as q_mm_audio: synth → pack to
    little-endian int16 → parse → frame → integer energies, then the
    VAD logic runs on exact integers in NumPy while the oracle replays
    it as gaps-and-islands SQL over the arithmetic energies — a hash
    match proves both the byte round trip AND the segmenter.  Swap in
    real PCM and a real energy gate and nothing else changes.
    """
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def vad(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 200 + (doc_id % 4) * 40
                i = np.arange(n, dtype=np.int64)
                pcm = ((doc_id * 31 + i * 7) % 2003 - 1001).astype("<i2")
                buf = pcm.tobytes()
                got = np.frombuffer(buf, dtype="<i2").astype(np.int64)
                energy = np.abs(got.reshape(-1, 40)).sum(axis=1)
                active = energy > 20000
                idx = np.flatnonzero(active)
                if idx.size:
                    breaks = np.flatnonzero(np.diff(idx) > 1)
                    seg_lens = np.diff(
                        np.concatenate(([0], breaks + 1, [idx.size]))
                    )
                    n_seg = int(seg_lens.size)
                    longest = int(seg_lens.max())
                    first = int(idx[0])
                else:
                    n_seg, longest, first = 0, 0, None
                out.append(
                    (
                        doc_id,
                        int(energy.size),
                        int(active.sum()),
                        n_seg,
                        longest,
                        first,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_active",
                    "n_segments",
                    "longest_run",
                    "first_active",
                ],
            )

    return d.mapInPandas(
        vad,
        "doc_id long, n_frames long, n_active long,"
        " n_segments long, longest_run long, first_active long",
    )


@query(
    "q_text_hapax",
    oracle="""
    WITH tf AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS n_hapax,
           round(CAST(count(CASE WHEN c = 1 THEN 1 END) AS DOUBLE)
                 / count(*), 6) AS hapax_rate
    FROM tf
    GROUP BY source
    """,
)
def q_text_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena rate per source: the fraction of vocabulary
    types occurring exactly once — the lexical-richness signal that
    complements Heaps (growth) and Zipf (shape); a near-zero hapax
    rate on a large corpus is the signature of templated/spun text.

    (On this 31-word synthetic vocabulary the rate is ~0 by
    construction — the degenerate reading is itself the quality
    finding.)  Exact counts; explode + two keyed aggregates.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(F.expr("split(text, ' ')")).alias("w")
        )
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    return tf.groupBy("source").agg(
        F.count("*").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.when(F.col("c") == 1, 1)).cast("long").alias("n_hapax"),
        F.round(
            F.count(F.when(F.col("c") == 1, 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("hapax_rate"),
    )


@query(
    "q_sim_cascade",
    oracle="""
    WITH c AS (
        SELECT vec_id,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT)
                   AS q
        FROM embeddings
    ),
    d64 AS (
        SELECT a.vec_id AS qa, b.vec_id AS qb,
               CAST(sum(a.q * b.q) AS BIGINT) AS dot,
               CAST(sum(CASE WHEN a.d <= 16 THEN a.q * b.q ELSE 0 END)
                    AS BIGINT) AS dot16
        FROM c a JOIN c b ON a.d = b.d AND a.vec_id <> b.vec_id
        GROUP BY 1, 2
    ),
    stage1 AS (
        SELECT qa, qb, dot,
               row_number() OVER (PARTITION BY qa
                                  ORDER BY dot16 DESC, qb) AS r16
        FROM d64
    ),
    cascade AS (
        SELECT qa, qb FROM (
            SELECT qa, qb, row_number() OVER (
                PARTITION BY qa ORDER BY dot DESC, qb) AS rr
            FROM stage1 WHERE r16 <= 20) WHERE rr = 1
    ),
    exact AS (
        SELECT qa, qb FROM (
            SELECT qa, qb, row_number() OVER (
                PARTITION BY qa ORDER BY dot DESC, qb) AS rr
            FROM d64) WHERE rr = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN cascade.qb = exact.qb THEN 1 ELSE 0 END)
                AS BIGINT) AS n_match,
           round(CAST(sum(CASE WHEN cascade.qb = exact.qb THEN 1 ELSE 0
                          END) AS DOUBLE) / count(*), 6) AS recall_at_1
    FROM cascade JOIN exact USING (qa)
    """,
)
def q_sim_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve-then-rerank cascade evaluation: stage 1 ranks by the
    cheap 16-dim prefix dot product and keeps 20 candidates, stage 2
    reranks those with the full 64-dim product — the production
    two-stage retrieval shape — and the query reports recall@1
    against single-stage exact search.

    Everything is the exact int64 dot-product algebra of
    q_embed_matryoshka (the 16-dim score is a conditional sum inside
    the same pair aggregate, so one pass feeds both stages); both
    stage cuts tie-break on candidate id.  The cascade's win is that
    stage 2 touches 20 candidates instead of n — the measured recall
    is the price, and on this uniform-random corpus it is the honest
    (low) number LSH also shows.

    Below the sim-family broadcast gate the whole cascade is one int64
    NumPy matmul per Arrow batch (both stage scores from the same
    quantized matrix — measured 117 s → ~4 s at sf0.1); above it, the
    exact exploded-cells join path engages, same shape as the oracle.
    """
    import numpy as np
    import pandas as pd

    from events_to_db_spark.operators.llm_ops import _sim_broadcast_max

    emb = load_table(spark, sf_dir, "embeddings")
    n_rows = emb.count()
    if n_rows <= _sim_broadcast_max():
        rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        mat = np.rint(
            np.array([r["embedding"] for r in rows], dtype=np.float64)
            * 1_000_000
        ).astype(np.int64)
        bc = spark.sparkContext.broadcast((ids, mat))

        def cascade_top1(batches):
            ref_ids, ref = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                q = np.rint(
                    np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                    * 1_000_000
                ).astype(np.int64)
                d64m = q @ ref.T
                d16m = q[:, :16] @ ref[:, :16].T
                out_c, out_e = [], []
                for i, vid in enumerate(pdf["vec_id"].to_numpy()):
                    mask = ref_ids == vid
                    n64 = -d64m[i]
                    n16 = -d16m[i]
                    n64[mask] = np.iinfo(np.int64).max
                    n16[mask] = np.iinfo(np.int64).max
                    top20 = np.lexsort((ref_ids, n16))[:20]
                    best = top20[
                        np.lexsort((ref_ids[top20], n64[top20]))[0]
                    ]
                    out_c.append(ref_ids[best])
                    out_e.append(ref_ids[np.lexsort((ref_ids, n64))[0]])
                yield pd.DataFrame(
                    {
                        "qa": pdf["vec_id"].to_numpy(),
                        "nn_cascade": np.array(out_c, dtype=np.int64),
                        "nn_exact": np.array(out_e, dtype=np.int64),
                    }
                )

        j = emb.select("vec_id", "embedding").mapInPandas(
            cascade_top1, "qa long, nn_cascade long, nn_exact long"
        )
        match = F.when(
            F.col("nn_cascade") == F.col("nn_exact"), 1
        ).otherwise(0)
        return j.agg(
            F.count("*").alias("n"),
            F.sum(match).cast("long").alias("n_match"),
            F.round(
                F.sum(match).cast("double") / F.count("*"), 6
            ).alias("recall_at_1"),
        )
    cells = emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "x")
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("d"),
        F.expr(
            "cast(round(cast(x as double) * 1000000) as bigint)"
        ).alias("q"),
    )
    a = cells.alias("a")
    b = cells.alias("b")
    d64 = (
        a.join(
            b,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("qa"), F.col("b.vec_id").alias("qb")
        )
        .agg(
            F.sum(F.col("a.q") * F.col("b.q")).alias("dot"),
            F.sum(
                F.when(
                    F.col("a.d") <= 16, F.col("a.q") * F.col("b.q")
                ).otherwise(0)
            ).alias("dot16"),
        )
    ).cache()
    w16 = Window.partitionBy("qa").orderBy(F.desc("dot16"), "qb")
    wdot = Window.partitionBy("qa").orderBy(F.desc("dot"), "qb")
    cascade = (
        d64.withColumn("r16", F.row_number().over(w16))
        .where(F.col("r16") <= 20)
        .withColumn("rr", F.row_number().over(wdot))
        .where(F.col("rr") == 1)
        .select("qa", F.col("qb").alias("nn_cascade"))
    )
    exact = (
        d64.withColumn("rr", F.row_number().over(wdot))
        .where(F.col("rr") == 1)
        .select("qa", F.col("qb").alias("nn_exact"))
    )
    j = cascade.join(exact, "qa")
    return j.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("nn_cascade") == F.col("nn_exact"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_match"),
        F.round(
            F.sum(
                F.when(
                    F.col("nn_cascade") == F.col("nn_exact"), 1
                ).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("recall_at_1"),
    )


#: RRF smoothing constant (the k=60 of the original TREC formulation,
#: public: Cormack/Clarke/Buettcher 2009) and per-signal rank window.
_RRF_K = 60
_RRF_WINDOW = 20


@query(
    "q_sim_rrf",
    oracle=f"""
    WITH qv AS (
        SELECT unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT)
                   AS ql
        FROM embeddings
        WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
    ),
    xc AS (
        SELECT vec_id,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT)
                   AS xq
        FROM embeddings
        WHERE vec_id <> (SELECT min(vec_id) FROM embeddings)
    ),
    dots AS (
        SELECT x.vec_id,
               CAST(sum(x.xq * q.ql) AS BIGINT) AS dot_full,
               CAST(sum(CASE WHEN x.d <= 16 THEN x.xq * q.ql ELSE 0 END)
                    AS BIGINT) AS dot_16
        FROM xc x JOIN qv q USING (d) GROUP BY 1
    ),
    ta AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY dot_full DESC, vec_id)
                   AS rank_full
        FROM dots ORDER BY dot_full DESC, vec_id LIMIT {_RRF_WINDOW}
    ),
    tb AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY dot_16 DESC, vec_id) AS rank_16
        FROM dots ORDER BY dot_16 DESC, vec_id LIMIT {_RRF_WINDOW}
    ),
    f AS (
        SELECT coalesce(ta.vec_id, tb.vec_id) AS vec_id,
               ta.rank_full, tb.rank_16,
               coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + ta.rank_full),
                        CAST(0 AS DOUBLE))
               + coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + tb.rank_16),
                          CAST(0 AS DOUBLE)) AS rrf
        FROM ta FULL JOIN tb ON ta.vec_id = tb.vec_id
    )
    SELECT vec_id, rank_full, rank_16, round(rrf, 6) AS rrf
    FROM f ORDER BY rrf DESC, vec_id LIMIT 10
    """,
)
def q_sim_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval signals (the hybrid-
    search merge step, k=60 TREC formulation): full-64-dim max-inner-
    product ranking fused with the 4×-cheaper 16-dim Matryoshka-
    truncated ranking for one query vector (min vec_id); a candidate
    scores Σ 1/(60+rank) over the top-20 windows it appears in, and
    the fused top-10 is returned with both source ranks (NULL = outside
    that signal's window — exactly how production RRF treats a doc one
    retriever missed).

    Scale shape: both signals are TakeOrderedAndProject top-20s off a
    single broadcast-query projection (dots via zip_with/aggregate on
    int64-quantized arrays — exact, one pass, no explode); everything
    after the take is ≤ 40 rows, so the unpartitioned rank windows and
    the full-outer fuse are k-bounded, not data-bounded.  At 100 TB the
    per-signal candidate generation would swap to the IVF/LSH queries'
    bucketed form; the fusion stage is unchanged.
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qv = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("qid"),
            F.expr(
                "transform(embedding,"
                " x -> cast(round(cast(x as double) * 1000000) as bigint))"
            ).alias("ql"),
        )
    )
    dots = (
        e.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "vec_id",
            F.expr(
                "aggregate(zip_with(transform(embedding,"
                " x -> cast(round(cast(x as double) * 1000000) as bigint)),"
                " ql, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"
            ).alias("dot_full"),
            F.expr(
                "aggregate(zip_with(transform(slice(embedding, 1, 16),"
                " x -> cast(round(cast(x as double) * 1000000) as bigint)),"
                " slice(ql, 1, 16), (a, b) -> a * b),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("dot_16"),
        )
    )
    ta = (
        dots.orderBy(F.desc("dot_full"), "vec_id")
        .limit(_RRF_WINDOW)
        .withColumn(
            "rank_full",
            F.row_number()
            .over(Window.orderBy(F.desc("dot_full"), "vec_id"))
            .cast("long"),
        )
        .select("vec_id", "rank_full")
    )
    tb = (
        dots.orderBy(F.desc("dot_16"), "vec_id")
        .limit(_RRF_WINDOW)
        .withColumn(
            "rank_16",
            F.row_number()
            .over(Window.orderBy(F.desc("dot_16"), "vec_id"))
            .cast("long"),
        )
        .select("vec_id", "rank_16")
    )
    rrf = F.coalesce(
        F.lit(1.0) / (_RRF_K + F.col("rank_full")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("rank_16")), F.lit(0.0))
    return (
        ta.join(tb, "vec_id", "full")
        .select("vec_id", "rank_full", "rank_16", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), "vec_id")
        .limit(10)
        .select("vec_id", "rank_full", "rank_16", F.round("rrf", 6).alias("rrf"))
    )


@query(
    "q_text_mattr",
    oracle="""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    wins AS (
        SELECT doc_id, n,
               unnest(generate_series(
                   1, CASE WHEN n >= 20 THEN n - 19 ELSE 1 END)) AS s,
               toks
        FROM d
    ),
    per AS (
        SELECT doc_id, n,
               CAST(len(list_distinct(
                   list_slice(toks, s, least(s + 19, n)))) AS BIGINT)
                   AS dct
        FROM wins
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(dct) AS BIGINT) AS sum_distinct,
           round(CAST(sum(dct) AS DOUBLE)
                 / (count(*) * least(max(n), 20)), 6) AS mattr
    FROM per
    GROUP BY doc_id
    """,
)
def q_text_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR — moving-average type-token ratio, window 20: the
    length-independent lexical-diversity measure (plain TTR falls
    with doc length, which is why Heaps' K and MATTR replaced it).

    Every 20-token window's distinct-type count is an exact integer
    (array_distinct size on the slice; shorter docs get one clipped
    window and a matching clipped denominator), so only the final
    ratio is a rounded float.  One generator explode (≤ n−19 windows
    per doc) + one keyed aggregate — embarrassingly doc-parallel.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("toks"),
        F.expr("size(split(text, ' '))").alias("n"),
    )
    wins = d.select(
        "doc_id",
        "n",
        "toks",
        F.explode(
            F.expr(
                "if(n >= 20, sequence(1, n - 19), array(1))"
            )
        ).alias("s"),
    )
    per = wins.select(
        "doc_id",
        "n",
        F.expr(
            "cast(size(array_distinct("
            " slice(toks, s, least(20, n - s + 1)))) as bigint)"
        ).alias("dct"),
    )
    return per.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.count("*").alias("n_windows"),
        F.sum("dct").cast("long").alias("sum_distinct"),
        F.round(
            F.sum("dct").cast("double")
            / (F.count("*") * F.least(F.max("n"), F.lit(20))),
            6,
        ).alias("mattr"),
    )


@query(
    "q_dedup_blockaudit",
    oracle="""
    WITH b AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    t AS (
        SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS total_pairs,
               CAST(max(n * (n - 1) / 2) AS BIGINT) AS max_pairs,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(n) AS BIGINT) AS n_docs,
               CAST(max(n) AS BIGINT) AS max_block
        FROM b
    )
    SELECT n_blocks, n_docs, total_pairs, max_block, max_pairs,
           round(CAST(max_pairs AS DOUBLE) / total_pairs, 6)
               AS top_block_pair_share,
           round(CAST(total_pairs AS DOUBLE)
                 / (CAST(n_docs AS DOUBLE) * (n_docs - 1) / 2), 6)
               AS pruning_ratio
    FROM t
    """,
)
def q_dedup_blockaudit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-skew audit for the (lang, source) dedup blocking that
    q_dedup_near shuffles on: per-block candidate-pair costs n(n−1)/2,
    the straggler block's share of total work, and the pruning ratio
    against all-pairs — the cost model you check BEFORE launching a
    quadratic-within-block job at 100 TB (a 0.9 top-block share means
    one reducer does the corpus; re-block or salt first).

    All pair counts are exact integers (n even ⟹ n(n−1)/2 exact in
    both engines' integer division); the two ratios are display
    floats.  One keyed count + one 5-column scalar aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    pairs = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    t = b.agg(
        F.count("*").alias("n_blocks"),
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(pairs).cast("long").alias("total_pairs"),
        F.max("n").cast("long").alias("max_block"),
        F.max(pairs).cast("long").alias("max_pairs"),
    )
    return t.select(
        "n_blocks",
        "n_docs",
        "total_pairs",
        "max_block",
        "max_pairs",
        F.round(
            F.col("max_pairs").cast("double") / F.col("total_pairs"), 6
        ).alias("top_block_pair_share"),
        F.round(
            F.col("total_pairs").cast("double")
            / (
                F.col("n_docs").cast("double")
                * (F.col("n_docs") - 1)
                / 2
            ),
            6,
        ).alias("pruning_ratio"),
    )


@query(
    "q_mm_phash",
    oracle="""
    WITH px AS (
        SELECT d.doc_id, r.r, c.c,
               (d.doc_id * 7 + r.r * 13 + c.c * 17) % 251 AS p
        FROM (SELECT doc_id FROM documents) d
        CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS r) r
        CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS c) c
    ),
    blk AS (
        SELECT doc_id, r // 2 AS br, c // 2 AS bc,
               CAST(sum(p) AS BIGINT) AS s
        FROM px GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT doc_id, CAST(sum(s) AS BIGINT) AS total FROM blk GROUP BY 1
    ),
    bits AS (
        SELECT b.doc_id, b.br * 8 + b.bc AS i,
               CASE WHEN 64 * b.s > t.total THEN 1 ELSE 0 END AS bit
        FROM blk b JOIN tot t USING (doc_id)
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN i < 32 THEN bit * (1::BIGINT << i)
                         ELSE 0 END) AS BIGINT) AS sig_lo,
           CAST(sum(CASE WHEN i >= 32 THEN bit * (1::BIGINT << (i - 32))
                         ELSE 0 END) AS BIGINT) AS sig_hi,
           CAST(sum(bit) AS BIGINT) AS popcount
    FROM bits
    GROUP BY doc_id
    """,
)
def q_mm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (aHash) on the image-modality byte
    pipeline: a deterministic 16×16 grayscale per doc is packed to
    bytes, parsed back, 2×2-mean downsampled to 8×8, and thresholded
    against the image mean into a 64-bit signature — the near-dup
    fingerprint image dedup pipelines bucket on before Hamming
    verification.

    The mean threshold is the exact cross-multiplication 64·block >
    total (no division), and the signature is carried as two 32-bit
    integer halves (bit 63 would overflow a signed BIGINT power sum).
    Same byte-boundary discipline as q_mm_audio/q_mm_vad: swap the
    synthesizer for a real decoder and ONLY the synth line changes.
    """
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def phash(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                r = np.arange(16).reshape(-1, 1)
                c = np.arange(16).reshape(1, -1)
                img = ((doc_id * 7 + r * 13 + c * 17) % 251).astype(
                    np.uint8
                )
                buf = img.tobytes()  # ---- the byte boundary ----
                got = (
                    np.frombuffer(buf, dtype=np.uint8)
                    .reshape(16, 16)
                    .astype(np.int64)
                )
                blocks = got.reshape(8, 2, 8, 2).sum(axis=(1, 3))
                total = int(blocks.sum())
                bits = (64 * blocks.reshape(-1) > total).astype(np.int64)
                sig_lo = int((bits[:32] << np.arange(32)).sum())
                sig_hi = int((bits[32:] << np.arange(32)).sum())
                out.append((doc_id, sig_lo, sig_hi, int(bits.sum())))
            yield pd.DataFrame(
                out, columns=["doc_id", "sig_lo", "sig_hi", "popcount"]
            )

    return d.mapInPandas(
        phash, "doc_id long, sig_lo long, sig_hi long, popcount long"
    )


@query(
    "q_text_quality_votes",
    oracle="""
    WITH tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2
    ),
    sig AS (
        SELECT t.doc_id,
               CAST(max(d.n_chars) AS BIGINT) AS n_chars,
               CAST(sum(t.c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(max(t.c) AS BIGINT) AS top_count
        FROM tf t JOIN documents d ON d.doc_id = t.doc_id
        GROUP BY 1
    ),
    votes AS (
        SELECT doc_id,
               CASE WHEN n_chars < 100 THEN 1 ELSE 0 END AS v_short,
               CASE WHEN 3 * n_types < n_tokens THEN 1 ELSE 0 END
                   AS v_lowdiv,
               CASE WHEN 5 * top_count > n_tokens THEN 1 ELSE 0 END
                   AS v_repeat
        FROM sig
    )
    SELECT CAST(v_short + v_lowdiv + v_repeat AS BIGINT) AS n_votes,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(v_short) AS BIGINT) AS n_short,
           CAST(sum(v_lowdiv) AS BIGINT) AS n_lowdiv,
           CAST(sum(v_repeat) AS BIGINT) AS n_repeat
    FROM votes
    GROUP BY 1
    """,
)
def q_text_quality_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble quality gating: three independent integer-exact
    heuristics vote on every document — too short (< 100 chars), low
    type diversity (types < tokens/3), dominant-token repetition (top
    token > 20% of mass) — and the corpus is histogrammed by vote
    count, the "how aggressive can the filter be" curve a curation
    run consults before picking its cut (FineWeb-style multi-signal
    gating, reduced to its exact-arithmetic core).

    Every gate is an integer cross-multiplication, so the vote
    histogram hash-matches; one explode + two keyed aggregates.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            "n_chars",
            F.explode(F.expr("split(text, ' ')")).alias("w"),
        )
        .groupBy("doc_id", "n_chars", "w")
        .agg(F.count("*").alias("c"))
    )
    sig = tf.groupBy("doc_id").agg(
        F.max("n_chars").cast("long").alias("n_chars"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.max("c").cast("long").alias("top_count"),
    )
    votes = sig.select(
        F.when(F.col("n_chars") < 100, 1).otherwise(0).alias("v_short"),
        F.when(3 * F.col("n_types") < F.col("n_tokens"), 1)
        .otherwise(0)
        .alias("v_lowdiv"),
        F.when(5 * F.col("top_count") > F.col("n_tokens"), 1)
        .otherwise(0)
        .alias("v_repeat"),
    )
    return votes.groupBy(
        (F.col("v_short") + F.col("v_lowdiv") + F.col("v_repeat"))
        .cast("long")
        .alias("n_votes")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("v_short").cast("long").alias("n_short"),
        F.sum("v_lowdiv").cast("long").alias("n_lowdiv"),
        F.sum("v_repeat").cast("long").alias("n_repeat"),
    )


@query(
    "q_text_source_overlap",
    oracle="""
    WITH tri AS (
        SELECT DISTINCT source,
               CAST(('0x' || substr(md5(
                   array_to_string(list_slice(toks, s, s + 2), ' ')),
                   1, 15)) AS BIGINT) AS h
        FROM (
            SELECT source, string_split(text, ' ') AS toks,
                   unnest(generate_series(
                       1, greatest(len(string_split(text, ' ')) - 2, 1)))
                       AS s
            FROM documents
        )
        WHERE s + 2 <= len(toks)
    ),
    sz AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n FROM tri GROUP BY 1
    ),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS inter
        FROM tri a JOIN tri b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, sa.n AS n_a, sb.n AS n_b, i.inter,
           round(CAST(i.inter AS DOUBLE)
                 / (sa.n + sb.n - i.inter), 6) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.source = i.src_a
    JOIN sz sb ON sb.source = i.src_b
    """,
)
def q_text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relatedness matrix: trigram-set Jaccard between every
    source pair — the contamination/provenance map you build before
    mixing corpora (two "independent" sources with Jaccard near 1 are
    one crawl wearing two names; on this shared-vocabulary synthetic
    corpus every pair is near 1, which is the finding).

    Trigram identity is the md5-prefix BIGINT of the joined window
    (short docs contribute what they have; the slice guard keeps
    sub-3-token docs from crashing — the q_text_chunk lesson); the
    pair counts come from a hash-keyed self-join of the DISTINCT
    per-source trigram sets, so the work is set-sized, not corpus-
    sized, and the output is |sources|²/2 rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    tri = (
        docs.select(
            "source",
            F.expr("split(text, ' ')").alias("toks"),
        )
        .withColumn("n", F.expr("size(toks)"))
        .withColumn(
            "s",
            F.explode(
                F.expr(
                    "if(n >= 3, sequence(1, n - 2), array())"
                )
            ),
        )
        .select(
            "source",
            F.expr(
                "cast(conv(substr(md5("
                "concat_ws(' ', slice(toks, s, 3))), 1, 15), 16, 10)"
                " as bigint)"
            ).alias("h"),
        )
        .distinct()
    ).cache()
    sz = tri.groupBy("source").agg(F.count("*").alias("n"))
    a = tri.alias("a")
    b = tri.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sz.select(
        F.col("source").alias("src_a"), F.col("n").alias("n_a")
    )
    sb = sz.select(
        F.col("source").alias("src_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "inter",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "q_text_dup_mass",
    oracle="""
    WITH d AS (
        SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
        FROM documents
    ),
    nn AS (SELECT doc_id, toks, len(toks) AS n FROM d),
    st AS (
        SELECT doc_id, toks, n,
               unnest(generate_series(
                   0, CASE WHEN n > 32 THEN (n - 9) // 24 ELSE 0 END)) AS s
        FROM nn
    ),
    ch AS (
        SELECT least(32, n - s * 24) AS n_tok,
               CAST(('0x' || substr(md5(array_to_string(
                   list_slice(toks, s * 24 + 1, least(s * 24 + 32, n)),
                   ' ')), 1, 15)) AS BIGINT) AS h
        FROM st
    ),
    per AS (
        SELECT h, CAST(count(*) AS BIGINT) AS occ,
               CAST(sum(n_tok) AS BIGINT) AS mass
        FROM ch GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           CAST(sum(occ) AS BIGINT) AS n_chunks,
           CAST(sum(mass) AS BIGINT) AS total_token_mass,
           CAST(sum(CASE WHEN occ > 1 THEN mass ELSE 0 END) AS BIGINT)
               AS duplicated_mass,
           CAST(sum(CASE WHEN occ > 1 THEN mass - mass // occ
                         ELSE 0 END) AS BIGINT) AS removable_mass,
           round(CAST(sum(CASE WHEN occ > 1 THEN mass ELSE 0 END)
                      AS DOUBLE) / sum(mass), 6) AS dup_mass_share
    FROM per
    """,
)
def q_text_dup_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication mass accounting over the q_text_chunk windows: how
    much of the corpus's token mass sits in chunks that occur more
    than once, and how much a keep-one dedup would actually delete
    (mass − mass/occ) — the number that decides whether chunk-level
    dedup is worth a 100 TB pass (on this 31-word corpus the share is
    near 1, which is the honest degenerate reading).

    Same chunk identity as q_text_chunk (md5-prefix of the 32/24
    window); all masses exact integers; the share divides once.
    Explode + one hash-keyed aggregate + one scalar row.
    """
    docs = load_table(spark, sf_dir, "documents")
    ch = (
        docs.select(
            F.expr("split(coalesce(text, ''), ' ')").alias("toks"),
        )
        .withColumn("n", F.expr("size(toks)"))
        .withColumn(
            "s",
            F.explode(
                F.expr(
                    "if(n > 32, sequence(0, (n - 9) div 24), array(0))"
                )
            ),
        )
        .select(
            F.expr("least(32, n - s * 24)").alias("n_tok"),
            F.expr(
                "cast(conv(substr(md5(concat_ws(' ',"
                " slice(toks, s * 24 + 1, least(32, n - s * 24)))),"
                " 1, 15), 16, 10) as bigint)"
            ).alias("h"),
        )
    )
    per = ch.groupBy("h").agg(
        F.count("*").alias("occ"),
        F.sum("n_tok").cast("long").alias("mass"),
    )
    dup_mass = F.when(F.col("occ") > 1, F.col("mass")).otherwise(0)
    return per.agg(
        F.count("*").alias("n_distinct_chunks"),
        F.sum("occ").cast("long").alias("n_chunks"),
        F.sum("mass").cast("long").alias("total_token_mass"),
        F.sum(dup_mass).cast("long").alias("duplicated_mass"),
        F.sum(
            F.when(
                F.col("occ") > 1,
                F.col("mass") - F.expr("mass div occ"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("removable_mass"),
        F.round(
            F.sum(dup_mass).cast("double") / F.sum("mass"), 6
        ).alias("dup_mass_share"),
    )


@query(
    "q_dedup_minhash_est",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang,
               list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ),
    sig AS (
        SELECT d.doc_id, i.i,
               min((('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || t.term), 1, 15))::BIGINT)) AS m
        FROM d,
             unnest(d.toks) AS t(term),
             (SELECT unnest(generate_series(1, 16)) AS i) i
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.toks AS ta, b.toks AS tb
        FROM d a JOIN d b
          ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
    ),
    agree AS (
        SELECT p.doc_a, p.doc_b,
               CAST(sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_agree
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b AND sb.i = sa.i
        GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b, a.n_agree,
           round(CAST(a.n_agree AS DOUBLE) / 16, 4) AS jac_est,
           round(CAST(len(list_intersect(p.ta, p.tb)) AS DOUBLE)
                 / len(list_distinct(list_concat(p.ta, p.tb))), 4)
               AS jac_exact,
           round(abs(CAST(a.n_agree AS DOUBLE) / 16
                     - CAST(len(list_intersect(p.ta, p.tb)) AS DOUBLE)
                       / len(list_distinct(list_concat(p.ta, p.tb)))), 4)
               AS abs_err
    FROM pairs p JOIN agree a USING (doc_a, doc_b)
    ORDER BY p.doc_a
    """,
)
def q_dedup_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash as an ESTIMATOR, audited: for each consecutive same-lang
    doc pair (the sorted-neighborhood candidate shape), the fraction of
    agreeing positions in a 16-hash md5 MinHash signature estimates
    Jaccard similarity; the query emits estimate, exact Jaccard, and
    absolute error side by side — the calibration table you check
    before trusting signature agreement as a dedup score at 100 TB
    (where the exact column is unaffordable and only the estimator
    survives).

    Unlike q_dedup_minhash (xxhash64 signatures, banding PROVEN by an
    exact-verify step), the signature here is md5-derived so BOTH
    engines compute bit-identical minima and the estimator itself
    value-hashes.  Shapes: signature build is explode + 16-way
    hash-min (one shuffle on doc_id), pairs are a shifted self-join on
    doc_id — everything linear in the corpus."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    sig = d.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, 16), i ->"
            " array_min(transform(toks, t ->"
            " cast(conv(substr(md5(cast(concat(cast(i as string), ':', t) as binary)), 1, 15), 16, 10) as bigint))))"
        ).alias("sig"),
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        F.col("toks").alias("ta"),
    )
    b = d.select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("toks").alias("tb"),
    )
    pairs = a.join(b, "doc_a").filter(F.col("lang") == F.col("lang_b"))
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb"))
    jac = F.size(F.array_intersect("ta", "tb")).cast("double") / F.size(
        F.array_union("ta", "tb")
    )
    est = (
        F.expr(
            "size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))"
        )
        .cast("long")
        .alias("n_agree")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est, jac.alias("jac"))
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            F.round(F.col("n_agree").cast("double") / 16, 4).alias("jac_est"),
            F.round("jac", 4).alias("jac_exact"),
            F.round(
                F.abs(F.col("n_agree").cast("double") / 16 - F.col("jac")), 4
            ).alias("abs_err"),
        )
        .orderBy("doc_a")
    )


_TEMP_LANGS = ("de", "en", "es", "fr", "zh")


def _temperature_oracle() -> str:
    piv = ",\n           ".join(
        f"CAST(coalesce(max(CASE WHEN lang = '{l}' THEN c END), 0)"
        f" AS BIGINT) AS c_{i}"
        for i, l in enumerate(_TEMP_LANGS)
    )
    s = " + ".join(f"sqrt(CAST(c_{i} AS DOUBLE))" for i in range(5))
    n = " + ".join(f"c_{i}" for i in range(5))
    return f"""
    WITH c AS (
        SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS c
        FROM documents GROUP BY 1
    ),
    one AS (SELECT {piv} FROM c),
    tot AS (SELECT ({s}) AS s, ({n}) AS n FROM one)
    SELECT c.lang,
           c.c AS n_tokens,
           round(CAST(c.c AS DOUBLE) / t.n, 6)       AS raw_share,
           round(sqrt(CAST(c.c AS DOUBLE)) / t.s, 6) AS temp_weight,
           round(sqrt(CAST(c.c AS DOUBLE)) / t.s
                 / (CAST(c.c AS DOUBLE) / t.n), 4)   AS boost
    FROM c CROSS JOIN tot t
    ORDER BY c.lang
    """


@query("q_curate_temperature", oracle=_temperature_oracle())
def q_curate_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling (α = 0.5) — the multilingual
    training-mixture reweighting from the mBERT/XLM-R line of work:
    sampling weight p_l ∝ c_l^α flattens the language distribution so
    low-resource languages are up-sampled (`boost` > 1) and the head
    language is down-sampled.  Emitted per language: token count, raw
    share, temperature weight, and the boost factor a sampler would
    apply.

    Determinism: token counts are exact BIGINTs; each √c is one
    correctly-rounded IEEE op; the normalizer Σ√c is a FIXED-ORDER
    literal sum over the five pivoted counts (the Levene pattern), so
    both engines add in the same sequence.  One explode-free token
    count (size of split), a 5-row pivot, broadcast back — scales as a
    single corpus scan."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("c")
    )
    one = c.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("lang") == l, F.col("c"))), F.lit(0)
            )
            .cast("long")
            .alias(f"c_{i}")
            for i, l in enumerate(_TEMP_LANGS)
        ]
    )
    s_expr = " + ".join(f"sqrt(cast(c_{i} as double))" for i in range(5))
    n_expr = " + ".join(f"c_{i}" for i in range(5))
    tot = one.select(
        F.expr(s_expr).alias("s"), F.expr(n_expr).alias("n")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("c").alias("n_tokens"),
            F.round(F.col("c").cast("double") / F.col("n"), 6).alias(
                "raw_share"
            ),
            F.round(
                F.sqrt(F.col("c").cast("double")) / F.col("s"), 6
            ).alias("temp_weight"),
            F.round(
                F.sqrt(F.col("c").cast("double"))
                / F.col("s")
                / (F.col("c").cast("double") / F.col("n")),
                4,
            ).alias("boost"),
        )
        .orderBy("lang")
    )


@query(
    "q_text_cosine_sparse",
    oracle="""
    WITH de AS (
        SELECT doc_id, text FROM documents WHERE lang = 'de'
    ),
    tf AS (
        SELECT doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
        FROM de, unnest(string_split(text, ' ')) AS t(term)
        GROUP BY 1, 2
    ),
    nrm AS (
        SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
        FROM tf GROUP BY 1
    ),
    dot AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(sum(a.tf * b.tf) AS BIGINT) AS num
        FROM tf a JOIN tf b
          ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT d.doc_a, d.doc_b, d.num,
           na.n2 AS norm2_a, nb.n2 AS norm2_b,
           round(d.num / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)), 4) AS cos
    FROM dot d
    JOIN nrm na ON na.doc_id = d.doc_a
    JOIN nrm nb ON nb.doc_id = d.doc_b
    WHERE d.num * d.num >= CAST(0.81 * na.n2 * nb.n2 AS DOUBLE)
    ORDER BY d.doc_a, d.doc_b
    """,
)
def q_text_cosine_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse term-frequency cosine similarity ≥ 0.9 between German
    docs — the TEXT-side twin of the dense embedding cosine family:
    documents as sparse integer tf vectors, pairs generated by an
    INVERTED-INDEX join on the term (only docs sharing a term ever
    meet — the shape that scales, vs all-pairs), dot products and
    norms as exact BIGINTs, and one final float op per pair.

    The ≥ 0.9 threshold is applied EXACTLY as num² ≥ 0.81·‖a‖²·‖b‖²
    (both sides exact up to the one float multiply of a 2-decimal
    constant) — no accumulated float sums anywhere, so the pair set
    and hash match across engines (§7.5: never float-threshold on an
    accumulated score)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "de"
    )
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    nrm = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("n2")
    )
    a = tf.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("tf").alias("tf_a")
    )
    b = tf.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("tf").alias("tf_b")
    )
    dot = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("long").alias("num"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("norm2_a"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("norm2_b"))
    return (
        dot.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            (F.col("num") * F.col("num")).cast("double")
            >= 0.81 * (F.col("norm2_a") * F.col("norm2_b")).cast("double")
        )
        .select(
            "doc_a",
            "doc_b",
            "num",
            "norm2_a",
            "norm2_b",
            F.round(
                F.col("num")
                / F.sqrt((F.col("norm2_a") * F.col("norm2_b")).cast("double")),
                4,
            ).alias("cos"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q_text_novelty",
    oracle="""
    WITH b AS (
        SELECT doc_id // 50 AS batch,
               concat(toks[i], ' ', toks[i + 1]) AS bg
        FROM (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), (SELECT unnest(generate_series(1, 2000)) AS i)
        WHERE i <= len(toks) - 1
    ),
    d AS (SELECT DISTINCT batch, bg FROM b),
    fst AS (SELECT bg, CAST(min(batch) AS BIGINT) AS first_batch
            FROM d GROUP BY 1)
    SELECT CAST(d.batch AS BIGINT) AS batch,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN fst.first_batch = d.batch THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(sum(CASE WHEN fst.first_batch = d.batch
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS novelty_rate
    FROM d JOIN fst USING (bg)
    GROUP BY d.batch ORDER BY d.batch
    """,
)
def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve — the corpus-drift / dataset-freshness
    metric a training-data pipeline tracks per ingest batch: of the
    distinct bigrams appearing in batch b (50 docs per batch in
    doc_id order), what share was NEVER seen in any earlier batch?
    A collapsing novelty rate means the crawl is saturating; a spike
    flags a domain shift.

    Shape: bigrams built array-side (no explode until one row per
    (batch, bigram)), distinct per batch, one min-aggregate for the
    global first-occurrence batch, broadcast-join back — two shuffles
    on the bigram key, both hash-aggs.  Exact integers + one division.
    The oracle builds bigrams via a bounded index spine (DuckDB 1.0
    lacks lateral generate_series args — CLAUDE.md)."""
    d = load_table(spark, sf_dir, "documents").select(
        F.expr("doc_id div 50").alias("batch"),
        F.split("text", " ").alias("toks"),
    )
    bg = (
        d.filter(F.size("toks") >= 2)
        .select(
            "batch",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " (x, i) -> concat(x, ' ', toks[i + 1]))"
                )
            ).alias("bg"),
        )
        .distinct()
    )
    fst = bg.groupBy("bg").agg(F.min("batch").cast("long").alias("first_batch"))
    return (
        bg.join(fst, "bg")
        .groupBy("batch")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(
                (F.col("first_batch") == F.col("batch")).cast("int")
            )
            .cast("long")
            .alias("n_novel"),
            F.round(
                F.sum(
                    (F.col("first_batch") == F.col("batch")).cast("int")
                ).cast("double")
                / F.count("*"),
                4,
            ).alias("novelty_rate"),
        )
        .orderBy("batch")
    )


@query(
    "q_sim_mmr",
    oracle="""
    WITH q AS (
        SELECT vec_id, i.i,
               CAST(round(CAST(embedding[i.i] AS DOUBLE) * 10000) AS BIGINT)
                   AS v
        FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) i
    ),
    p AS (SELECT i, v FROM q WHERE vec_id = 0),
    rel AS (
        SELECT q.vec_id, CAST(sum(q.v * p.v) AS BIGINT) AS rel
        FROM q JOIN p USING (i) GROUP BY 1
    ),
    cand AS (SELECT vec_id, rel FROM rel ORDER BY rel DESC, vec_id LIMIT 20),
    sims AS (
        SELECT qa.vec_id AS a, qb.vec_id AS b,
               CAST(sum(qa.v * qb.v) AS BIGINT) AS s
        FROM q qa JOIN q qb USING (i)
        WHERE qa.vec_id IN (SELECT vec_id FROM cand)
          AND qb.vec_id IN (SELECT vec_id FROM cand)
          AND qa.vec_id <> qb.vec_id
        GROUP BY 1, 2
    ),
    s1 AS (
        SELECT 1 AS rank, vec_id, rel, 7 * rel AS score
        FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    ),
    s2 AS (
        SELECT 2 AS rank, c.vec_id, c.rel,
               7 * c.rel - 3 * max(si.s) AS score
        FROM cand c
        JOIN sims si ON si.a = c.vec_id
                    AND si.b IN (SELECT vec_id FROM s1)
        WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
        GROUP BY c.vec_id, c.rel
        ORDER BY score DESC, c.vec_id LIMIT 1
    ),
    s3 AS (
        SELECT 3 AS rank, c.vec_id, c.rel,
               7 * c.rel - 3 * max(si.s) AS score
        FROM cand c
        JOIN sims si ON si.a = c.vec_id
                    AND si.b IN (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2)
        WHERE c.vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2)
        GROUP BY c.vec_id, c.rel
        ORDER BY score DESC, c.vec_id LIMIT 1
    ),
    s4 AS (
        SELECT 4 AS rank, c.vec_id, c.rel,
               7 * c.rel - 3 * max(si.s) AS score
        FROM cand c
        JOIN sims si ON si.a = c.vec_id
                    AND si.b IN (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2 UNION ALL SELECT vec_id FROM s3)
        WHERE c.vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2 UNION ALL SELECT vec_id FROM s3)
        GROUP BY c.vec_id, c.rel
        ORDER BY score DESC, c.vec_id LIMIT 1
    ),
    s5 AS (
        SELECT 5 AS rank, c.vec_id, c.rel,
               7 * c.rel - 3 * max(si.s) AS score
        FROM cand c
        JOIN sims si ON si.a = c.vec_id
                    AND si.b IN (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2 UNION ALL SELECT vec_id FROM s3 UNION ALL SELECT vec_id FROM s4)
        WHERE c.vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2 UNION ALL SELECT vec_id FROM s3 UNION ALL SELECT vec_id FROM s4)
        GROUP BY c.vec_id, c.rel
        ORDER BY score DESC, c.vec_id LIMIT 1
    )
    SELECT CAST(rank AS INT) AS rank, vec_id, rel, CAST(score AS BIGINT) AS score
    FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4 UNION ALL SELECT * FROM s5) ORDER BY rank
    """,
)
def q_sim_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance — diversified retrieval: from the 20
    most probe-relevant vectors (integer-quantized dot products against
    vec 0), greedily select 5 where each pick maximizes
    λ·relevance − (1−λ)·max-similarity-to-already-picked (λ = 0.7,
    scored as the exact integers 7·rel − 3·maxsim, ties by vec_id).
    The RAG answer-context builder: relevant AND non-redundant.

    The greedy fold is order-dependent over a k-BOUNDED candidate set:
    only the 20 candidate rows (ids, rel, quantized vectors) reach the
    driver (the same bounded-collect tier as the k-means centroids),
    where the 20×20 integer sim matrix and 5-round argmax run in
    microseconds; candidate generation and relevance scoring stay
    distributed.  The oracle replays the identical greedy as 5
    unrolled argmax CTEs on the same exact integers."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = F.expr(
        "transform(embedding, x ->"
        " cast(round(cast(x as double) * 10000) as bigint))"
    )
    qd = e.select("vec_id", qv.alias("qv"))
    probe = qd.filter(F.col("vec_id") == 0).select("qv").first()["qv"]
    probe_lit = F.array(*[F.lit(int(v)) for v in probe])
    rel = qd.select(
        "vec_id",
        "qv",
        F.aggregate(
            F.zip_with("qv", probe_lit, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("rel"),
    )
    cand = rel.orderBy(F.col("rel").desc(), "vec_id").limit(20).collect()
    ids = [r["vec_id"] for r in cand]
    rels = {r["vec_id"]: r["rel"] for r in cand}
    vecs = {r["vec_id"]: r["qv"] for r in cand}
    sims = {
        (a, b): sum(x * y for x, y in zip(vecs[a], vecs[b]))
        for a in ids
        for b in ids
        if a != b
    }
    picked: list = []
    out = []
    for rank in range(1, 6):
        best = None
        for v in ids:
            if v in picked:
                continue
            if picked:
                score = 7 * rels[v] - 3 * max(sims[(v, p)] for p in picked)
            else:
                score = 7 * rels[v]
            key = (-score, v)
            if best is None or key < best[0]:
                best = (key, v, score)
        _, v, score = best
        picked.append(v)
        out.append((rank, v, int(rels[v]), int(score)))
    return spark.createDataFrame(
        out, schema="rank int, vec_id long, rel long, score long"
    ).orderBy("rank")


@query(
    "q_embed_drift",
    oracle="""
    WITH n AS (SELECT CAST(max(vec_id) AS BIGINT) AS mx FROM embeddings),
    x AS (
        SELECT CASE WHEN e.vec_id * 2 <= n.mx THEN 'a' ELSE 'b' END AS half,
               i.i AS dim,
               least(greatest(CAST(floor((CAST(e.embedding[i.i] AS DOUBLE)
                                          + 1) * 4) AS BIGINT), 0), 7)
                   AS bucket
        FROM embeddings e CROSS JOIN n,
             (SELECT unnest(generate_series(1, 64)) AS i) i
    ),
    cell AS (
        SELECT dim, bucket,
               CAST(sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
        FROM x GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) / 64
                    AS BIGINT) AS ta,
               CAST(sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) / 64
                    AS BIGINT) AS tb
        FROM x
    )
    SELECT CAST(c.dim AS INT) AS dim, CAST(c.bucket AS INT) AS bucket,
           c.n_a, c.n_b,
           CASE WHEN c.n_a > 0 AND c.n_b > 0
                THEN round((CAST(c.n_a AS DOUBLE) / t.ta
                            - CAST(c.n_b AS DOUBLE) / t.tb)
                           * ln((CAST(c.n_a AS DOUBLE) * t.tb)
                                / (CAST(c.n_b AS DOUBLE) * t.ta)), 6)
           END AS psi_term
    FROM cell c CROSS JOIN tot t
    ORDER BY c.dim, c.bucket
    """,
)
def q_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift, per dimension — the vector-feature
    twin of q_quality_drift's scalar PSI: each of the 64 dimensions is
    bucketed into 8 fixed bins, the first half of the corpus (by
    vec_id) is the reference and the second half the candidate, and
    every (dim, bucket) cell reports its PSI contribution
    (p−q)·ln(p/q).  Per-cell terms are emitted instead of per-dim sums
    — summing 8 floats is engine-order-dependent, while each term is a
    single float expression on exact integer counts (the q_stat_chisq
    design).  Zero-count cells are NULL (smoothing is the caller's
    policy call).

    Shape: one explode to (vec, dim) — 64 rows per vector, map-side
    partial aggregation into 512 cells — the monitoring query a
    feature store runs per embedding-model version at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.agg(F.max("vec_id").cast("long").alias("mx"))
    x = (
        e.crossJoin(F.broadcast(n))
        .select(
            F.when(F.col("vec_id") * 2 <= F.col("mx"), "a")
            .otherwise("b")
            .alias("half"),
            F.posexplode(
                F.expr(
                    "transform(embedding, v ->"
                    " least(greatest(cast(floor((cast(v as double) + 1) * 4)"
                    " as bigint), 0), 7))"
                )
            ).alias("dim0", "bucket"),
        )
        .select("half", (F.col("dim0") + 1).alias("dim"), "bucket")
    )
    cell = x.groupBy("dim", "bucket").agg(
        F.sum(F.when(F.col("half") == "a", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("half") == "b", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    tot = x.agg(
        (
            F.sum(F.when(F.col("half") == "a", 1).otherwise(0)) / 64
        )
        .cast("long")
        .alias("ta"),
        (
            F.sum(F.when(F.col("half") == "b", 1).otherwise(0)) / 64
        )
        .cast("long")
        .alias("tb"),
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    ratio = (F.col("n_a").cast("double") * F.col("tb")) / (
        F.col("n_b").cast("double") * F.col("ta")
    )
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.col("bucket").cast("int").alias("bucket"),
            "n_a",
            "n_b",
            F.when(
                ok,
                F.round(
                    (
                        F.col("n_a").cast("double") / F.col("ta")
                        - F.col("n_b").cast("double") / F.col("tb")
                    )
                    * F.log(ratio),
                    6,
                ),
            ).alias("psi_term"),
        )
        .orderBy("dim", "bucket")
    )


@query(
    "q_text_stopword_curve",
    oracle="""
    WITH tf AS (
        SELECT t.term, CAST(count(*) AS BIGINT) AS c
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
        GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tf),
    top AS (
        SELECT term, c,
               row_number() OVER (ORDER BY c DESC, term) AS k
        FROM tf ORDER BY c DESC, term LIMIT 20
    ),
    cum AS (
        SELECT k, term, c,
               sum(c) OVER (ORDER BY k) AS cum_c
        FROM top
    )
    SELECT CAST(cum.k AS INT) AS k, cum.term, cum.c AS term_count,
           CAST(cum.cum_c AS BIGINT) AS cum_count,
           round(CAST(cum.cum_c AS DOUBLE) / tot.n, 6) AS corpus_share
    FROM cum CROSS JOIN tot
    ORDER BY cum.k
    """,
)
def q_text_stopword_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive stopword coverage curve — building the stopword list
    FROM the corpus instead of a fixed dictionary: the 20 highest-df
    terms in rank order with the cumulative share of all token mass a
    stopword list of size k would remove.  The elbow of this curve is
    where a curation pipeline cuts its corpus-specific stopword list
    (fixed lists miss domain stopwords entirely).

    One explode→hash-agg for term counts, a top-20 TakeOrdered, and a
    20-row cumulative window (k-bounded, not a global sort); counts
    exact, one division per row."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = tf.agg(F.sum("c").cast("long").alias("n"))
    top = (
        tf.orderBy(F.col("c").desc(), "term")
        .limit(20)
        .withColumn(
            "k",
            F.row_number().over(Window.orderBy(F.col("c").desc(), "term")),
        )
    )
    cum = top.withColumn(
        "cum_c",
        F.sum("c").over(
            Window.orderBy("k").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("int").alias("k"),
            "term",
            F.col("c").alias("term_count"),
            F.col("cum_c").cast("long").alias("cum_count"),
            F.round(F.col("cum_c").cast("double") / F.col("n"), 6).alias(
                "corpus_share"
            ),
        )
        .orderBy("k")
    )


#: The q_curate_funnel rule ladder — Gopher-style heuristic gates
#: adapted to this corpus, every threshold an exact integer
#: cross-multiplication (never a float ratio compare), applied in the
#: FIXED order curation reports use (cheap structural gates first).
#: Each entry: (name, SQL predicate over the per-doc feature columns
#: n_toks / n_chars / n_distinct / n_stop / n_punct) — shared verbatim
#: by both engines.
_FUNNEL_RULES = (
    ("length_20_120", "n_toks BETWEEN 20 AND 120"),
    (
        "mean_tok_len_3_10",
        "(n_chars - n_toks + 1) >= 3 * n_toks"
        " AND (n_chars - n_toks + 1) <= 10 * n_toks",
    ),
    ("type_token_ratio_ge_0.3", "10 * n_distinct >= 3 * n_toks"),
    ("min_2_stopwords", "n_stop >= 2"),
    ("symbol_ratio_le_0.1", "10 * n_punct <= n_chars"),
)


def _funnel_oracle() -> str:
    from events_to_db_spark.operators.pipeline_ops import STOPWORDS

    cum = []
    stages = []
    for i, (name, pred) in enumerate(_FUNNEL_RULES, start=1):
        cum.append(f"({pred})")
        conj = " AND ".join(cum)
        stages.append(
            f"SELECT CAST({i} AS BIGINT) AS stage, '{name}' AS rule,"
            f" CAST(sum(CASE WHEN {' AND '.join(cum[:-1]) or 'TRUE'}"
            f" THEN 1 ELSE 0 END) AS BIGINT) AS n_in,"
            f" CAST(sum(CASE WHEN {conj} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_out"
            " FROM feats"
        )
        # noqa: the union keeps the fixed stage order by the stage key
    return f"""
    WITH feats AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
               n_chars,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   AS n_distinct,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains({list(STOPWORDS)!r}, x))) AS BIGINT)
                   AS n_stop,
               CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT)
                   AS n_punct
        FROM documents
    ),
    stages AS ({' UNION ALL '.join(stages)})
    SELECT stage, rule, n_in, n_out,
           CAST(n_in - n_out AS BIGINT) AS dropped,
           CASE WHEN n_in > 0
                THEN round(CAST(n_in - n_out AS DOUBLE) / n_in, 4)
           END AS drop_rate
    FROM stages ORDER BY stage
    """


@query("q_curate_funnel", oracle=_funnel_oracle())
def q_curate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter FUNNEL — per-rule attrition of the Gopher-style
    heuristic ladder applied in sequence (length → mean token length →
    type-token diversity → stopword presence → symbol ratio), the
    table a curation team actually reports: how many documents enter
    each stage, how many survive it, and each rule's marginal drop
    rate given everything before it (q_text_quality scores documents;
    this accounts for the PIPELINE).

    Determinism: every rule is an integer cross-multiplication over
    exact per-doc counts (no float ratio is ever compared); the stage
    order is fixed in ``_FUNNEL_RULES`` and keyed by an integer stage
    column, and the one float column is a final per-stage division.

    Scale shape: ONE corpus scan computes all five feature columns,
    one hash aggregate produces every cumulative-survivor count at
    once (the 5-stage funnel is 10 conditional sums in a single
    1-row agg, then a 5-row unpivot) — no per-stage rescans, no
    shuffle of document text."""
    from events_to_db_spark.operators.pipeline_ops import STOPWORDS

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = d.select(
        F.size(toks).cast("long").alias("n_toks"),
        "n_chars",
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stop_arr, x))
        )
        .cast("long")
        .alias("n_stop"),
        F.size(F.expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
        .cast("long")
        .alias("n_punct"),
    )
    cum_preds = []
    aggs = []
    for i, (_name, pred) in enumerate(_FUNNEL_RULES, start=1):
        prev = " AND ".join(cum_preds) or "TRUE"
        cum_preds.append(f"({pred})")
        conj = " AND ".join(cum_preds)
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {prev} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"in_{i}")
        )
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {conj} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"out_{i}")
        )
    one = feats.agg(*aggs)
    stack = ", ".join(
        f"{i}L, '{name}', in_{i}, out_{i}"
        for i, (name, _pred) in enumerate(_FUNNEL_RULES, start=1)
    )
    rows = one.select(
        F.expr(
            f"stack({len(_FUNNEL_RULES)}, {stack})"
            " as (stage, rule, n_in, n_out)"
        )
    )
    return rows.select(
        "stage",
        "rule",
        "n_in",
        "n_out",
        (F.col("n_in") - F.col("n_out")).cast("long").alias("dropped"),
        F.when(
            F.col("n_in") > 0,
            F.round(
                (F.col("n_in") - F.col("n_out")).cast("double")
                / F.col("n_in"),
                4,
            ),
        ).alias("drop_rate"),
    ).orderBy("stage")


_JSD_BINS = 16
#: 16-bucket term hash (md5 60-bit integer % 16) — identical in both
#: engines; binning makes the source distributions a FIXED-WIDTH
#: vector so the JSD sum can be one fixed-order expression instead of
#: a cross-row float sum over an unbounded vocabulary.
_JSD_BIN_SPARK = (
    "pmod(cast(conv(substr(md5(cast(term as binary)), 1, 15), 16, 10)"
    " as bigint), 16)"
)
_JSD_BIN_DUCK = "(('0x' || substr(md5(term), 1, 15))::BIGINT % 16)"


def _jsd_expr(c: str, d: str, n1: str, n2: str) -> str:
    """Fixed-order Jensen–Shannon divergence (natural log) over the 16
    named bin columns: Σ_b ½p·ln(2p/(p+q)) + ½q·ln(2q/(p+q)) with
    p = c_b/n1, q = d_b/n2 — zero-count contributions are exactly 0
    (lim x·ln x = 0), guarded by the CASE.  Shared verbatim by both
    engines; the exact-integer inputs make every per-term float op
    bit-identical (the q_embed_drift ln-parity precedent)."""
    terms = []
    for b in range(_JSD_BINS):
        p = f"(CAST({c.format(b=b)} AS DOUBLE) / {n1})"
        q = f"(CAST({d.format(b=b)} AS DOUBLE) / {n2})"
        terms.append(
            f"(CASE WHEN {c.format(b=b)} > 0 THEN CAST(0.5 AS DOUBLE)"
            f" * {p} * ln(CAST(2 AS DOUBLE) * {p} / ({p} + {q}))"
            " ELSE CAST(0 AS DOUBLE) END)"
        )
        terms.append(
            f"(CASE WHEN {d.format(b=b)} > 0 THEN CAST(0.5 AS DOUBLE)"
            f" * {q} * ln(CAST(2 AS DOUBLE) * {q} / ({p} + {q}))"
            " ELSE CAST(0 AS DOUBLE) END)"
        )
    return " + ".join(terms)


@query(
    "q_text_source_jsd",
    oracle=f"""
    WITH toks AS (
        SELECT source, {_JSD_BIN_DUCK} AS bin
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    ),
    dist AS (
        SELECT source,
               {", ".join(
                   f"CAST(sum(CASE WHEN bin = {b} THEN 1 ELSE 0 END)"
                   f" AS BIGINT) AS c_{b}"
                   for b in range(_JSD_BINS)
               )},
               CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY source
    )
    SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b,
           round({_jsd_expr("a.c_{b}", "b.c_{b}", "a.n", "b.n")}, 4)
               AS jsd
    FROM dist a JOIN dist b ON a.source < b.source
    ORDER BY src_a, src_b
    """,
)
def q_text_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair distributional divergence — Jensen–Shannon
    divergence between every pair of sources' (hash-binned) term
    distributions, the mixture-design diagnostic that says WHICH
    corpus sources are near-duplicates in distribution and which add
    diversity (q_text_source_overlap measures shared CONTENT; this
    measures shared SHAPE — two sources can share zero documents and
    still be distributionally identical).

    Determinism: per-source bin counts are exact BIGINTs from one
    explode→hash-agg; each pair's JSD is ONE fixed-order 32-term
    expression (16 bins × both sides, zero-count terms exactly 0)
    shared verbatim by both engines — no cross-row float aggregation
    anywhere, ln-parity per the q_embed_drift precedent.

    Scale shape: the corpus is touched ONCE (explode + 17-column hash
    agg to one row per source); the pair join is over the tiny
    source-level aggregate (S² rows of S sources, never documents) —
    at 100 TB the pair matrix is still bytes."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split("text", " ")).alias("term"),
    ).select("source", F.expr(_JSD_BIN_SPARK).alias("bin"))
    dist = toks.groupBy("source").agg(
        *[
            F.sum(F.when(F.col("bin") == b, 1).otherwise(0))
            .cast("long")
            .alias(f"c_{b}")
            for b in range(_JSD_BINS)
        ],
        F.count("*").cast("long").alias("n"),
    )
    a = dist.select(
        F.col("source").alias("src_a"),
        F.col("n").alias("n_a"),
        *[F.col(f"c_{b}").alias(f"ca_{b}") for b in range(_JSD_BINS)],
    )
    b_ = dist.select(
        F.col("source").alias("src_b"),
        F.col("n").alias("n_b"),
        *[F.col(f"c_{b}").alias(f"cb_{b}") for b in range(_JSD_BINS)],
    )
    pairs = a.join(b_, F.col("src_a") < F.col("src_b"))
    jsd = F.expr(_jsd_expr("ca_{b}", "cb_{b}", "n_a", "n_b"))
    return pairs.select(
        "src_a", "src_b", "n_a", "n_b", F.round(jsd, 4).alias("jsd")
    ).orderBy("src_a", "src_b")


#: Yule's K = 10⁴·(Σ_t tf_t² − N)/N² (Yule 1944, "The Statistical
#: Study of Literary Vocabulary") — Σ m²·V_m over the frequency
#: spectrum collapses to Σ tf² over types, so the whole statistic
#: needs only two exact sums.  Shared verbatim by both engines.
_YULE_EXPR = "10000 * CAST(s2 - n AS DOUBLE) / (n * n)"


@query(
    "q_text_yule",
    oracle=f"""
    WITH tf AS (
        SELECT source, t.term, CAST(count(*) AS BIGINT) AS tf
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
        GROUP BY 1, 2
    ),
    s AS (
        SELECT source, CAST(sum(tf) AS BIGINT) AS n,
               CAST(sum(tf * tf) AS BIGINT) AS s2,
               CAST(count(*) AS BIGINT) AS n_types
        FROM tf GROUP BY 1
    )
    SELECT source, n AS n_tokens, n_types, CAST(s2 - n AS BIGINT) AS k_num,
           round({_YULE_EXPR}, 4) AS yule_k
    FROM s ORDER BY source
    """,
)
def q_text_yule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source — the sample-size-invariant
    vocabulary-richness constant (unlike raw TTR, K is stable as the
    corpus grows, which is why it complements q_text_heaps/q_text_mattr
    in a curation dashboard: a source whose K jumps between snapshots
    changed its generation process, not just its volume).

    Exact-integer discipline: K = 10⁴·(Σ_m m²V_m − N)/N² and the
    frequency-spectrum sum Σ m²V_m equals Σ_types tf² exactly, so both
    numerator terms are exact BIGINTs from one explode → (source, term)
    hash aggregate; the single float op is the final division (N² at
    sf0.1 ≈ 1e10 — BIGINT-safe; DECIMAL(38,0) beyond ~3e9 tokens per
    source).

    Scale shape: explode → two stacked hash aggregates, shuffling
    (source, term) then source — linear in corpus tokens, no windows,
    no joins."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    s = tf.groupBy("source").agg(
        F.sum("tf").cast("long").alias("n"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("s2"),
        F.count("*").cast("long").alias("n_types"),
    )
    return s.select(
        "source",
        F.col("n").alias("n_tokens"),
        "n_types",
        (F.col("s2") - F.col("n")).cast("long").alias("k_num"),
        F.round(F.expr(_YULE_EXPR), 4).alias("yule_k"),
    ).orderBy("source")


#: Honoré's R = 100·ln(N) / (1 − V₁/V) (Honoré 1979) with the ln
#: carried as the floor(10⁶·ln N) fixed-point BIGINT — the q_ml_logloss
#: trick: the floor absorbs any sub-ulp ln drift between engines, and
#: the final assembly is one shared float expression over exact ints.
_HONORE_EXPR = (
    "CAST(ln_fp AS DOUBLE) / 10000 * n_types"
    " / (n_types - v1)"
)


@query(
    "q_text_lexical",
    oracle=f"""
    WITH tf AS (
        SELECT source, t.term, CAST(count(*) AS BIGINT) AS tf
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
        GROUP BY 1, 2
    ),
    s AS (
        SELECT source, CAST(sum(tf) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS v1,
               CAST(sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS v2
        FROM tf GROUP BY 1
    ),
    fp AS (
        SELECT source, n, n_types, v1, v2,
               CAST(floor(1000000 * ln(CAST(n AS DOUBLE))) AS BIGINT)
                   AS ln_fp
        FROM s
    )
    SELECT source, n AS n_tokens, n_types, v1 AS hapax, v2 AS dis,
           ln_fp,
           CASE WHEN n_types > v1 THEN round({_HONORE_EXPR}, 4) END
               AS honore_r,
           round(CAST(v2 AS DOUBLE) / n_types, 4) AS sichel_s
    FROM fp ORDER BY source
    """,
)
def q_text_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical-richness panel — Honoré's R (hapax-weighted,
    rises with productive vocabulary) and Sichel's S (dis-legomena
    share, near-constant for natural text) — the two classic
    frequency-spectrum constants that complement q_text_yule's K and
    q_text_hapax's raw counts in a curation dashboard: together
    (K, R, S) fingerprint a source's generation process independently
    of its volume.

    Determinism: the frequency spectrum (N, V, V₁, V₂) is exact
    BIGINTs from one explode → (source, term) hash aggregate; ln(N)
    is the floor(10⁶·ln N) fixed-point BIGINT (the q_ml_logloss floor
    absorbs sub-ulp ln drift — stronger than bare ln parity), and
    R = 100·ln(N)·V/(V−V₁) / S = V₂/V are single shared float
    expressions over those ints.  V=V₁ (every type a hapax) yields
    NULL R, never a division crash — the edge corpus exercises this.

    Scale shape: identical to q_text_yule — explode → two stacked
    hash aggregates, linear in corpus tokens, no windows, no joins."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    s = tf.groupBy("source").agg(
        F.sum("tf").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("tf") == 1, 1).otherwise(0))
        .cast("long")
        .alias("v1"),
        F.sum(F.when(F.col("tf") == 2, 1).otherwise(0))
        .cast("long")
        .alias("v2"),
    )
    fp = s.withColumn(
        "ln_fp",
        F.expr("CAST(floor(1000000 * ln(CAST(n AS DOUBLE))) AS BIGINT)"),
    )
    return fp.select(
        "source",
        F.col("n").alias("n_tokens"),
        "n_types",
        F.col("v1").alias("hapax"),
        F.col("v2").alias("dis"),
        "ln_fp",
        F.when(
            F.col("n_types") > F.col("v1"),
            F.round(F.expr(_HONORE_EXPR), 4),
        ).alias("honore_r"),
        F.round(F.col("v2").cast("double") / F.col("n_types"), 4).alias(
            "sichel_s"
        ),
    ).orderBy("source")


#: Interpolated Kneser–Ney bigram probability with discount d = 3/4:
#: on training-corpus evaluation every scored bigram is observed
#: (c₁₂ ≥ 1), so max(c₁₂−d, 0) = c₁₂ − 3/4 > 0 always and
#:   P = (c₁₂−d)/c₁ + (d·N₁₊(w₁·)/c₁)·(N₁₊(·w₂)/T)
#: collapses to the exact integer pair
#:   [(4·c₁₂−3)·T + 3·N₁₊(w₁·)·N₁₊(·w₂)] / (4·c₁·T).
_KN_NUM = "(4 * c12 - 3) * t + 3 * n1_fwd * n1_bwd"
_KN_DEN = "4 * c1 * t"


@query(
    "q_text_kn_bigram",
    oracle=f"""
    WITH tok AS (
        SELECT source, string_split(text, ' ') AS toks FROM documents
    ),
    idx AS (
        SELECT source, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM tok WHERE len(toks) >= 2
    ),
    big AS (
        SELECT source, toks[i] AS w1, toks[i + 1] AS w2 FROM idx
    ),
    model AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM big GROUP BY 1, 2
    ),
    ctx AS (
        SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1_fwd
        FROM model GROUP BY 1
    ),
    cont AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS n1_bwd
        FROM model GROUP BY 1
    ),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM model),
    scored AS (
        SELECT m.w1, m.w2,
               CAST(floor(1000000 * ln(
                   CAST({_KN_NUM} AS DOUBLE) / ({_KN_DEN})
               )) AS BIGINT) AS ln_fp
        FROM model m
        JOIN ctx ON m.w1 = ctx.w1
        JOIN cont ON m.w2 = cont.w2
        CROSS JOIN tt
    ),
    ev AS (
        SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c_s
        FROM big GROUP BY 1, 2, 3
    ),
    per_src AS (
        SELECT e.source,
               CAST(sum(e.c_s) AS BIGINT) AS n_bigrams,
               CAST(sum(e.c_s * s.ln_fp) AS BIGINT) AS sum_fp
        FROM ev e JOIN scored s ON e.w1 = s.w1 AND e.w2 = s.w2
        GROUP BY e.source
    )
    SELECT source, n_bigrams,
           (SELECT t FROM tt) AS model_types,
           round(CAST(-sum_fp AS DOUBLE) / n_bigrams / 1000000, 6)
               AS xent_kn
    FROM per_src ORDER BY source
    """,
)
def q_text_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram cross-entropy per source — the
    LM-quality statistic serious curation pipelines score with (KN's
    continuation probability famously fixes the "San Francisco"
    unigram artifact that q_text_perplexity's add-one unigram model
    suffers): train the bigram model on the whole corpus, score each
    source's bigram stream, report the per-source ln-perplexity.

    Exact-integer discipline: with d = 3/4 and self-evaluation (every
    scored bigram observed), P_KN collapses to the exact BIGINT pair
    [(4c₁₂−3)T + 3·N₁₊(w₁·)·N₁₊(·w₂)] / (4c₁T); each distinct bigram's
    ln is the floor(10⁶·ln) fixed-point BIGINT computed ONCE at model
    grain, the per-source weighted sum Σ c_s·ln_fp is pure integer
    arithmetic, and the final scale-out is one division.  Bigram
    extraction is position-exact (guarded array slice on the Spark
    side; guarded generate_series subscripts on the oracle side) — single-token and
    empty documents contribute zero bigrams, never a crash (edge
    corpus exercises both).

    Scale shape: token arrays never shuffle — bigrams explode from
    the in-row array; the model is three stacked hash aggregates on
    (w1,w2)/(w1)/(w2) keys; scoring joins the per-source bigram
    aggregate to the model at model grain (both sides already
    reduced).  The 31-token §0 vocabulary caps the model at ~10³
    types; a real corpus caps it at observed-bigram count — always
    ≪ corpus tokens, so every join side here is the SMALL side."""
    d = load_table(spark, sf_dir, "documents")
    big = (
        d.select(
            "source", F.split("text", " ").alias("toks")
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN"
                    " transform(slice(toks, 1, size(toks) - 1),"
                    " (x, i) -> struct(x AS w1,"
                    " element_at(toks, i + 2) AS w2))"
                    " ELSE array() END"
                )
            ).alias("b"),
        )
        .select("source", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    model = big.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c12")
    )
    ctx = model.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1_fwd"),
    )
    cont = model.groupBy("w2").agg(
        F.count("*").cast("long").alias("n1_bwd")
    )
    tt = model.agg(F.count("*").cast("long").alias("t"))
    scored = (
        model.join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            F.expr(
                f"CAST(floor(1000000 * ln("
                f"CAST({_KN_NUM} AS DOUBLE) / ({_KN_DEN})"
                f")) AS BIGINT)"
            ).alias("ln_fp"),
        )
    )
    ev = big.groupBy("source", "w1", "w2").agg(
        F.count("*").cast("long").alias("c_s")
    )
    per_src = (
        ev.join(scored, ["w1", "w2"])
        .groupBy("source")
        .agg(
            F.sum("c_s").cast("long").alias("n_bigrams"),
            F.sum(F.col("c_s") * F.col("ln_fp"))
            .cast("long")
            .alias("sum_fp"),
        )
    )
    return (
        per_src.crossJoin(F.broadcast(tt))
        .select(
            "source",
            "n_bigrams",
            F.col("t").alias("model_types"),
            F.round(
                (-F.col("sum_fp")).cast("double")
                / F.col("n_bigrams")
                / 1000000,
                6,
            ).alias("xent_kn"),
        )
        .orderBy("source")
    )


@query(
    "q_curate_dsir",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, source, t.term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    ),
    model AS (
        SELECT term,
               CAST(count(*) AS BIGINT) AS c_all,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_tgt
        FROM tok GROUP BY term
    ),
    tot AS (
        SELECT CAST(sum(c_all) AS BIGINT) AS n_all,
               CAST(sum(c_tgt) AS BIGINT) AS n_tgt,
               CAST(count(*) AS BIGINT) AS v
        FROM model
    ),
    delta AS (
        SELECT m.term,
               CAST(floor(1000000 * ln(CAST(m.c_tgt + 1 AS DOUBLE)
                                       / (t.n_tgt + t.v))) AS BIGINT)
               - CAST(floor(1000000 * ln(CAST(m.c_all + 1 AS DOUBLE)
                                         / (t.n_all + t.v))) AS BIGINT)
                   AS d_fp
        FROM model m CROSS JOIN tot t
    ),
    scored AS (
        SELECT tok.doc_id, tok.lang, tok.source,
               CAST(count(*) AS BIGINT) AS n_toks,
               CAST(sum(d.d_fp) AS BIGINT) AS score_fp
        FROM tok JOIN delta d ON tok.term = d.term
        GROUP BY 1, 2, 3
    )
    SELECT doc_id, lang, source, n_toks, score_fp,
           round(CAST(score_fp AS DOUBLE) / n_toks / 1000000, 6)
               AS avg_lw
    FROM scored
    ORDER BY score_fp DESC, doc_id
    LIMIT 10
    """,
)
def q_curate_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by its importance log-weight ln[P_target(x)/P_raw(x)]
    under unigram bag models — target = the English sub-corpus — and
    surface the top-10 most target-like documents.  This is the
    estimator a mixture-rebalancing pipeline ranks its raw pool with
    before resampling (the deterministic scoring half; the resampling
    draw is q_sample_weighted's territory).

    Determinism: both add-one models share the global vocabulary, so
    each token's δ = ln P_tgt − ln P_raw is a DIFFERENCE OF TWO
    floor(10⁶·ln)-fixed-point BIGINTs of exact rationals, computed
    ONCE at vocabulary grain; per-document scores are exact integer
    sums of δ over the token stream (order-free), and the top-10 is
    (score, doc_id)-tie-broken.  One final display division.

    Scale shape: explode → vocabulary-grain conditional aggregate
    (the model, broadcast), token stream re-joined at token grain,
    per-doc hash agg, TakeOrdered-10 — linear in corpus tokens, the
    model is always the small side."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split("text", " ")).alias("term"),
    )
    model = tok.groupBy("term").agg(
        F.count("*").cast("long").alias("c_all"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("c_tgt"),
    )
    tot = model.agg(
        F.sum("c_all").cast("long").alias("n_all"),
        F.sum("c_tgt").cast("long").alias("n_tgt"),
        F.count("*").cast("long").alias("v"),
    )
    delta = model.crossJoin(F.broadcast(tot)).select(
        "term",
        (
            F.expr(
                "CAST(floor(1000000 * ln(CAST(c_tgt + 1 AS DOUBLE)"
                " / (n_tgt + v))) AS BIGINT)"
            )
            - F.expr(
                "CAST(floor(1000000 * ln(CAST(c_all + 1 AS DOUBLE)"
                " / (n_all + v))) AS BIGINT)"
            )
        ).alias("d_fp"),
    )
    scored = (
        tok.join(F.broadcast(delta), "term")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.sum("d_fp").cast("long").alias("score_fp"),
        )
    )
    return (
        scored.orderBy(F.col("score_fp").desc(), "doc_id")
        .limit(10)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_toks",
            "score_fp",
            F.round(
                F.col("score_fp").cast("double") / F.col("n_toks") / 1000000,
                6,
            ).alias("avg_lw"),
        )
    )
