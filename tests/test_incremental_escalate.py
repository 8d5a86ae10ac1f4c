"""Auto-escalating q_dedup_incremental: when the largest (lang,
source) block exceeds the quadratic-join threshold, the near screen's
bipartite candidates must come from the shared MinHash-LSH band engine
(cross-side pairs only) instead of the in-block batch×corpus join —
and the verified verdicts must be byte-identical, since banding is
effectively lossless at the 0.8 Jaccard threshold."""

from __future__ import annotations

import pytest

from events_to_db_spark.operators import pipeline_ops
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_escalated_path_matches_bipartite(spark, monkeypatch):
    import __spark_entry__ as e

    fn = e.queries()["q_dedup_incremental"]
    monkeypatch.delenv("SPARK_GRAFT_DEDUP_PPR_MAX", raising=False)
    expected = _rows(fn(spark, SF_SMOKE))
    assert expected, "smoke corpus should produce batch verdicts"
    assert any(r[1] != "keep" for r in expected), (
        "smoke corpus should contain at least one duplicate verdict"
    )

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


def test_bipartite_path_is_default(spark, monkeypatch):
    """Below the threshold the band engine must NOT run."""
    monkeypatch.delenv("SPARK_GRAFT_DEDUP_PPR_MAX", raising=False)
    monkeypatch.setattr(
        pipeline_ops,
        "minhash_candidate_pairs",
        lambda *a, **k: pytest.fail("band path engaged below threshold"),
    )
    import __spark_entry__ as e

    e.queries()["q_dedup_incremental"](spark, SF_SMOKE).collect()
