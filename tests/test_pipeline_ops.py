"""Targeted tests for the extended pipeline operators (rows-only
surface + kernel behaviors the differential oracle can't see)."""

from __future__ import annotations

import pytest

from events_to_db_spark.operators.pipeline_ops import decode_image_stub
from tests.conftest import SF_SMOKE


def test_ann_lsh_recall_vs_exact(spark):
    """Multi-probe bucketed ANN must cover every vector and agree with
    the exact kernel for a substantial share.  Random uniform
    embeddings are LSH's worst case (cosines concentrate near 0);
    measured recall@1 with 1-bit-flip probing is 0.67 — the bound
    leaves headroom for plane-seed sensitivity, not for regressions to
    single-probe (~0.2)."""
    import __spark_entry__ as e
    from events_to_db_spark.session import load_table

    qs = e.queries()
    exact = {
        r["vec_id"]: r["nn_id"]
        for r in qs["q_sim_cosine_knn"](spark, SF_SMOKE).collect()
    }
    approx = {
        r["vec_id"]: r["nn_id"]
        for r in qs["q_sim_ann_lsh"](spark, SF_SMOKE).collect()
    }
    n_total = load_table(spark, SF_SMOKE, "embeddings").count()
    assert len(approx) == n_total  # multi-probe: every vector answered
    hits = sum(1 for v in exact if approx.get(v) == exact[v])
    assert hits / len(exact) >= 0.5


def test_decode_stub_fake_header():
    data = b"MM01" + (300).to_bytes(2, "big") + (200).to_bytes(2, "big") + b"xyz"
    meta = decode_image_stub(data)
    assert meta == {
        "fmt": "FAKE",
        "width": 300,
        "height": 200,
        "n_frames": 1 + data[-1] % 4,
    }


def test_decode_stub_rejects_unknown_payload():
    with pytest.raises((NotImplementedError, Exception)):
        decode_image_stub(b"not an image")


def test_mm_decode_dimensions_derived_from_doc_id(spark):
    import __spark_entry__ as e

    rows = e.queries()["q_mm_decode"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows[:50]:
        assert r["width"] == 16 + r["doc_id"] % 97
        assert r["height"] == 16 + r["doc_id"] % 53
        assert r["fmt"] == "FAKE"


def test_minhash_signature_stability(spark):
    """Same input twice -> identical pair set (no nondeterminism in the
    banding/hashing path)."""
    import __spark_entry__ as e

    fn = e.queries()["q_dedup_minhash"]
    a = {(r["doc_a"], r["doc_b"]) for r in fn(spark, SF_SMOKE).collect()}
    b = {(r["doc_a"], r["doc_b"]) for r in fn(spark, SF_SMOKE).collect()}
    assert a == b


def test_minhash_mask_band_path_parity(spark, monkeypatch):
    """r11 small-vocab bitmask fast path must be output-identical to
    the band engine it bypasses (same pairs, same rounded jaccard) —
    a path-selection gate may never change what the query computes.

    The smoke corpus's 31-token vocabulary takes the mask path by
    default; SPARK_GRAFT_MINHASH_MASK_MAX=0 forces the band engine."""
    import __spark_entry__ as e
    from events_to_db_spark.operators import pipeline_ops as po
    from events_to_db_spark.session import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    assert po._minhash_small_vocab(d) is not None  # gate fires on smoke

    fn = e.queries()["q_dedup_minhash"]
    mask = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in fn(spark, SF_SMOKE).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_MINHASH_MASK_MAX", "0")
    band = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in fn(spark, SF_SMOKE).collect()
    }
    assert mask == band
