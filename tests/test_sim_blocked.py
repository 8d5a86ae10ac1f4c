"""Size-gated similarity path (VERDICT r01 #4): when the reference side
exceeds the broadcast threshold, the dense-similarity queries must take
the exact block-nested-loop path — packed chunk×block cross join, no
driver collect — and produce byte-identical results to the broadcast
kernel."""

from __future__ import annotations

import pytest

from events_to_db_spark.operators import llm_ops
from tests.conftest import SF_SMOKE

SIM_QUERIES = [
    "q_sim_cosine_knn",
    "q_sim_threshold",
    "q_sim_hist",
    "q_dedup_embed",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SIM_QUERIES)
def test_blocked_path_matches_broadcast(spark, monkeypatch, name):
    import __spark_entry__ as e

    fn = e.queries()[name]
    monkeypatch.delenv("SPARK_GRAFT_SIM_BROADCAST_MAX", raising=False)
    expected = _rows(fn(spark, SF_SMOKE))

    # Force the blocked path: threshold below any real table size, and a
    # small chunk size so multiple chunk×block pairs actually exist.
    monkeypatch.setenv("SPARK_GRAFT_SIM_BROADCAST_MAX", "1")
    monkeypatch.setenv("SPARK_GRAFT_SIM_BLOCK_ROWS", "37")
    # Broadcast collect must not run on this path.
    monkeypatch.setattr(
        llm_ops,
        "_ref_broadcast",
        lambda *a, **k: pytest.fail("broadcast path engaged above threshold"),
    )
    got = _rows(fn(spark, SF_SMOKE))
    assert got == expected


def test_gate_defaults_to_broadcast_below_threshold(spark, monkeypatch):
    """At test scale the broadcast path must remain the default (the
    fast plan BENCH B10 measures)."""
    called = {}
    real = llm_ops._ref_broadcast

    def spy(*a, **k):
        called["yes"] = True
        return real(*a, **k)

    monkeypatch.delenv("SPARK_GRAFT_SIM_BROADCAST_MAX", raising=False)
    monkeypatch.setattr(llm_ops, "_ref_broadcast", spy)
    import __spark_entry__ as e

    e.queries()["q_sim_cosine_knn"](spark, SF_SMOKE).collect()
    assert called.get("yes")
