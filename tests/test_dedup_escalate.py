"""Auto-escalating q_dedup_near (VERDICT r02 #1): when the largest
(lang, source) block exceeds the quadratic-join threshold, candidate
pairs must come from the shared MinHash-LSH band engine (blocked on
the same keys) instead of the in-block self-join — and the verified
result must be byte-identical, since banding is effectively lossless
at the 0.8 Jaccard threshold."""

from __future__ import annotations

import pytest

from events_to_db_spark.operators import llm_ops, pipeline_ops
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_escalated_path_matches_quadratic(spark, monkeypatch):
    import __spark_entry__ as e

    fn = e.queries()["q_dedup_near"]
    monkeypatch.delenv("SPARK_GRAFT_DEDUP_PPR_MAX", raising=False)
    expected = _rows(fn(spark, SF_SMOKE))
    assert expected, "smoke corpus should contain near-dup pairs"

    # Force escalation: every real block is bigger than 1 row.
    monkeypatch.setenv("SPARK_GRAFT_DEDUP_PPR_MAX", "1")
    called = {}
    real = pipeline_ops.minhash_candidate_pairs

    def spy(d, block_cols=None):
        called["block_cols"] = list(block_cols or [])
        return real(d, block_cols)

    monkeypatch.setattr(pipeline_ops, "minhash_candidate_pairs", spy)
    got = _rows(fn(spark, SF_SMOKE))
    assert called.get("block_cols") == ["lang", "source"]
    assert got == expected


def test_quadratic_path_is_default(spark, monkeypatch):
    """Below the threshold the band engine must NOT run (the probe adds
    one cheap agg; candidates come from the block equi-join)."""
    monkeypatch.delenv("SPARK_GRAFT_DEDUP_PPR_MAX", raising=False)
    monkeypatch.setattr(
        pipeline_ops,
        "minhash_candidate_pairs",
        lambda *a, **k: pytest.fail("band path engaged below threshold"),
    )
    import __spark_entry__ as e

    e.queries()["q_dedup_near"](spark, SF_SMOKE).collect()


def test_blocked_candidates_never_cross_blocks(spark):
    """The band join key includes the block columns: any candidate pair
    must agree on (lang, source)."""
    from pyspark.sql import functions as F

    from events_to_db_spark.session import load_table

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    cand = pipeline_ops.minhash_candidate_pairs(d, ["lang", "source"])
    meta = d.select("doc_id", "lang", "source")
    crossed = (
        cand.join(
            meta.select(
                F.col("doc_id").alias("doc_a"),
                F.col("lang").alias("lang_a"),
                F.col("source").alias("source_a"),
            ),
            "doc_a",
        )
        .join(
            meta.select(
                F.col("doc_id").alias("doc_b"),
                F.col("lang").alias("lang_b"),
                F.col("source").alias("source_b"),
            ),
            "doc_b",
        )
        .filter(
            (F.col("lang_a") != F.col("lang_b"))
            | (F.col("source_a") != F.col("source_b"))
        )
        .count()
    )
    assert crossed == 0


def test_dedup_curve_work_gate_and_block_sample(spark, monkeypatch):
    """r7 (the r6 cluster lesson applied at birth): the operating-curve
    quadratic is work-gated — above SPARK_GRAFT_CURVE_MAX_PAIRS it
    refuses loudly with the block-sample protocol in the message; a
    sample_mod run equals the direct computation restricted to the
    same deterministically-sampled blocks."""
    import pytest
    from pyspark.sql import functions as F

    from events_to_db_spark.functions.tags import _h15
    from events_to_db_spark.operators.llm_ops import dedup_curve
    from events_to_db_spark.session import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    ).cache()

    monkeypatch.setenv("SPARK_GRAFT_CURVE_MAX_PAIRS", "10")
    with pytest.raises(ValueError, match="sample_mod"):
        dedup_curve(d)
    monkeypatch.delenv("SPARK_GRAFT_CURVE_MAX_PAIRS")

    got = sorted(map(tuple, dedup_curve(d, sample_mod=2).collect()))
    sampled = d.filter(_h15(F.concat_ws("|", "lang", "source")) % 2 == 0)
    want = sorted(map(tuple, dedup_curve(sampled).collect()))
    assert got == want
    assert len(got) == 4
    # the sample must be a strict, non-empty subset of blocks
    n_all = d.select("lang", "source").distinct().count()
    n_s = sampled.select("lang", "source").distinct().count()
    assert 0 < n_s < n_all


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, "/tmp/sparkgraft_edge"])
def test_curve_agrees_with_band_engine_at_08(spark, sf_dir, monkeypatch):
    """VERDICT r07 #4: the operating curve's tau=0.8 point and the
    production dedup (q_dedup_near / near_dup_pairs) must COUNT THE
    SAME PAIRS — they currently agree because both ride the exact
    blocked join, and this pin makes a future band-engine swap (or a
    MINHASH_MIN_BANDS change) unable to silently make the diagnostic
    curve and the production dedup disagree about the same threshold."""
    import subprocess
    import sys
    from pathlib import Path

    from pyspark.sql import functions as F

    from events_to_db_spark.session import load_table

    if sf_dir.startswith("/tmp") and not Path(
        sf_dir, "documents.parquet"
    ).exists():
        subprocess.run(
            [sys.executable,
             str(Path(__file__).parent.parent / "tools" / "edgegen.py"),
             sf_dir],
            check=True,
        )
    monkeypatch.delenv("SPARK_GRAFT_CURVE_MAX_PAIRS", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_DEDUP_PPR_MAX", raising=False)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    curve = {
        r["tau"]: r["n_pairs"] for r in llm_ops.dedup_curve(d).collect()
    }
    assert curve["0.8"] == llm_ops.near_dup_pairs(d).count()


def test_near_dup_mask_verify_parity(spark, monkeypatch):
    """r11 opt: the small-vocab mask verify (bit_count over 64-bit set
    masks) must be output-identical to the array_intersect verify on
    BOTH the quadratic and the banded path — a verify-kernel swap may
    never change what the engine computes.  The smoke corpus's
    31-token vocabulary takes the mask path by default;
    SPARK_GRAFT_MINHASH_MASK_MAX=0 forces the array kernel."""
    import __spark_entry__ as e

    fn = e.queries()["q_dedup_near"]
    monkeypatch.delenv("SPARK_GRAFT_DEDUP_PPR_MAX", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_MINHASH_MASK_MAX", raising=False)
    mask_quad = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in fn(spark, SF_SMOKE).collect()
    }
    assert mask_quad, "smoke corpus should contain near-dup pairs"

    monkeypatch.setenv("SPARK_GRAFT_MINHASH_MASK_MAX", "0")
    array_quad = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in fn(spark, SF_SMOKE).collect()
    }
    assert mask_quad == array_quad

    monkeypatch.delenv("SPARK_GRAFT_MINHASH_MASK_MAX", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_DEDUP_PPR_MAX", "1")
    mask_band = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in fn(spark, SF_SMOKE).collect()
    }
    assert mask_quad == mask_band
