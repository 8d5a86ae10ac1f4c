"""Property guard for the shared MinHash candidate engine
(pipeline_ops.minhash_candidate_pairs): banding must never lose a
high-Jaccard pair.  At J ≥ 0.9 the analytic miss probability is
(1 − 0.9²)³² ≈ 1e-23 — effectively impossible — so ANY miss is a
regression in the signature/banding code, not bad luck."""

from __future__ import annotations

from pyspark.sql import functions as F

from events_to_db_spark.operators.pipeline_ops import minhash_candidate_pairs


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, toks array<string>")


def _exact_pairs(rows, jmin):
    out = set()
    for i, (ai, ta) in enumerate(rows):
        sa = set(ta)
        for bj, tb in rows[i + 1 :]:
            sb = set(tb)
            j = len(sa & sb) / len(sa | sb)
            if j >= jmin:
                out.add((min(ai, bj), max(ai, bj)))
    return out


def test_never_misses_high_jaccard_pairs(spark):
    # Deterministic adversarial corpus: clusters of planted near-dups
    # (90-98% overlap), singletons, short docs, single-token docs, and
    # docs sharing a long common prefix but low Jaccard.
    rows = []
    vocab = [f"w{i}" for i in range(500)]
    doc_id = 0
    for c in range(8):
        base = vocab[c * 50 : c * 50 + 40]
        rows.append((doc_id, list(base))); doc_id += 1
        rows.append((doc_id, list(base[:-2]) + [f"x{c}a", f"x{c}b"])); doc_id += 1
        rows.append((doc_id, list(base[:-1]) + [f"y{c}"])); doc_id += 1
    for s in range(10):
        rows.append((doc_id, [vocab[(s * 37 + k) % 500] for k in range(0, 30, 3)]))
        doc_id += 1
    rows.append((doc_id, ["solo"])); doc_id += 1
    rows.append((doc_id, ["solo"])); doc_id += 1  # identical single-token pair
    rows.append((doc_id, ["a", "b"])); doc_id += 1
    rows.append((doc_id, ["a", "b", "c"])); doc_id += 1  # J = 2/3 < 0.9

    want = _exact_pairs(rows, 0.9)
    assert want, "corpus must contain high-Jaccard pairs"

    cand = minhash_candidate_pairs(_mk_docs(spark, rows))
    got = {
        (r["doc_a"], r["doc_b"]) for r in cand.collect()
    }
    missed = want - got
    assert not missed, f"banding lost high-Jaccard pairs: {sorted(missed)}"


def test_blocked_mode_recall_within_blocks(spark):
    # Same guarantee when block columns join the band key: all
    # high-Jaccard SAME-BLOCK pairs survive; cross-block pairs are
    # excluded by construction.
    rows = []
    base = [f"t{i}" for i in range(30)]
    for b, blk in enumerate(["en", "de"]):
        for v in range(3):
            rows.append((b * 10 + v, blk, list(base[:-1]) + [f"v{b}{v}"]))
    df = spark.createDataFrame(
        rows, schema="doc_id long, lang string, toks array<string>"
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(df, ["lang"]).collect()
    }
    same_block = {(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)}
    assert same_block <= got
    assert all((a < 10) == (b < 10) for a, b in got), "cross-block pair leaked"


def test_min_bands_lossless_on_degenerate_vocab(spark, monkeypatch):
    """ADVICE r06: the >=2-shared-band rule (MINHASH_MIN_BANDS=2) must
    not drop a true J >= 0.8 pair even on the DEGENERATE 31-token
    vocabulary (the driver-corpus pathology where band hashes are
    maximally correlated and the idealized-independence miss bound is
    least trustworthy).  Pinned at BOTH settings: min_bands=1 (the old
    any-shared-band rule) and the default 2 must both achieve full
    recall of the planted J >= 0.8 pairs."""
    import random

    rng = random.Random(3)
    vocab = [f"v{i}" for i in range(31)]
    rows, doc_id = [], 0
    for c in range(40):
        base = rng.sample(vocab, 25)
        rows.append((doc_id, list(base))); doc_id += 1
        # J = 24/26 ≈ 0.923 with its base
        rows.append((doc_id, base[:-1] + [f"u{c}"])); doc_id += 1
        # J = 23/27 ≈ 0.852 with its base — just above the verify bar
        rows.append(
            (doc_id, base[:-2] + [f"w{c}a", f"w{c}b"])
        ); doc_id += 1
    want = _exact_pairs(rows, 0.8)
    assert len(want) >= 80, "corpus must plant many J>=0.8 pairs"

    docs = _mk_docs(spark, rows)
    for setting in ("1", "2"):
        monkeypatch.setenv("SPARK_GRAFT_MINHASH_MIN_BANDS", setting)
        got = {(r["doc_a"], r["doc_b"]) for r in
               minhash_candidate_pairs(docs).collect()}
        missed = want - got
        assert not missed, (
            f"min_bands={setting} lost true pairs: {sorted(missed)[:5]}"
        )
