"""Plan-shape golden gate (VERDICT r03 #2): physical-plan fingerprints
are a checked-in invariant, not a per-round eyeball.  The round-3 perf
traps (CollapseProject re-evaluating md5 chains per pair, SortAggregate
from struct-min, a surprise CartesianProduct) all change node counts —
this gate catches that class at test time."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from tests.conftest import SF_CHECK
from tools.audit import GOLDEN_PATH, diff_fingerprint, plan_fingerprint

#: Representative spread: scan, agg, broadcast join, multiway join,
#: window, sessionization, cosine kNN (gated broadcast matmul), packed
#: argmin NN join, MinHash dedup.
SPOT_QUERIES = (
    "q_scan_pushdown",
    "q_agg_q1",
    "q_join_broadcast",
    "q_join_multiway",
    "q_win_rank",
    "q_ev_session",
    "q_sim_cosine_knn",
    "q_join_nn",
    "q_dedup_minhash",
)


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN_PATH.exists(), "run: python tools/audit.py --record-plans"
    return json.loads(GOLDEN_PATH.read_text())


def test_golden_covers_whole_registry(golden):
    import __spark_entry__ as e

    missing = sorted(set(e.queries()) - set(golden))
    assert not missing, f"unrecorded queries (run --record-plans): {missing}"


@pytest.mark.parametrize("name", SPOT_QUERIES)
def test_fingerprint_matches_golden(spark, golden, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, SF_CHECK)
    df.collect()  # AQE finalizes during execution
    deltas = diff_fingerprint(golden[name], plan_fingerprint(df))
    assert not deltas, f"{name} plan drifted: {deltas}"


def test_deliberate_regression_is_caught(spark, golden):
    """End-to-end detection check: inject a real plan regression (an
    extra round-robin shuffle on the query output) and assert the gate
    flags it — fingerprint extraction and compare, not just the dict
    diff."""
    import __spark_entry__ as e

    df = e.queries()["q_agg_q1"](spark, SF_CHECK).repartition(7)
    df.collect()
    deltas = diff_fingerprint(golden["q_agg_q1"], plan_fingerprint(df))
    assert deltas, "extra Exchange must be detected"
    assert any(d.startswith("Exchange") for d in deltas)


def test_diff_fingerprint_reports_all_keys():
    g = {"Exchange": 2, "SortAggregate": 0}
    n = {"Exchange": 3, "SortAggregate": 1, "CartesianProduct": 1}
    deltas = diff_fingerprint(g, n)
    joined = "\n".join(deltas)
    assert "Exchange: golden=2 now=3" in joined
    assert "SortAggregate: golden=0 now=1" in joined
    assert "CartesianProduct: golden=0 now=1" in joined
    assert diff_fingerprint(g, dict(g)) == []
