"""Auto-escalating q_dedup_editdist (VERDICT r03 #1): when the largest
brand block exceeds the quadratic-join threshold, candidate pairs must
come from the PassJoin (k+1)-segment pigeonhole inverted index instead
of the in-block self-join — and the verified result must be
byte-identical, because the segment index is lossless at k = 3 (every
true edit-distance-≤3 pair shares an untouched segment at a position
within ±3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from events_to_db_spark.operators import pipeline_ops
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_escalated_path_matches_quadratic(spark, monkeypatch):
    import __spark_entry__ as e

    fn = e.queries()["q_dedup_editdist"]
    monkeypatch.delenv("SPARK_GRAFT_EDITDIST_BLOCK_MAX", raising=False)
    expected = _rows(fn(spark, SF_SMOKE))
    assert expected, "smoke corpus should contain edit-distance near-dups"

    # Force escalation: every real block is bigger than 1 row.
    monkeypatch.setenv("SPARK_GRAFT_EDITDIST_BLOCK_MAX", "1")
    called = {}
    real = pipeline_ops.editdist_candidate_pairs

    def spy(d, block_cols, **kw):
        called["block_cols"] = list(block_cols)
        return real(d, block_cols, **kw)

    monkeypatch.setattr(pipeline_ops, "editdist_candidate_pairs", spy)
    got = _rows(fn(spark, SF_SMOKE))
    assert called.get("block_cols") == ["p_brand"]
    assert got == expected


def test_quadratic_path_is_default(spark, monkeypatch):
    """Below the threshold the segment index must NOT run (the probe
    adds one cheap agg; candidates come from the brand equi-join)."""
    monkeypatch.delenv("SPARK_GRAFT_EDITDIST_BLOCK_MAX", raising=False)
    monkeypatch.setattr(
        pipeline_ops,
        "editdist_candidate_pairs",
        lambda *a, **k: pytest.fail("segment index engaged below threshold"),
    )
    import __spark_entry__ as e

    e.queries()["q_dedup_editdist"](spark, SF_SMOKE).collect()


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _corpus():
    """Deterministic adversarial corpus: seeds mutated by ≤3 random
    edits (insert/delete/substitute at any position), plus short and
    empty strings to exercise the empty-segment path."""
    import random

    rng = random.Random(42)
    alpha = "abcdef"
    seeds = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(8, 40)))
        for _ in range(12)
    ] + ["", "a", "ab", "abc", "abcd"]
    out = []
    for s in seeds:
        out.append(s)
        for _ in range(3):
            t = list(s)
            for _ in range(rng.randint(0, 3)):
                op = rng.choice("ids")
                pos = rng.randint(0, max(len(t) - 1, 0))
                if op == "i":
                    t.insert(pos, rng.choice(alpha))
                elif op == "d" and t:
                    del t[pos]
                elif t:
                    t[pos] = rng.choice(alpha)
            out.append("".join(t))
    return [(i, "blk", s) for i, s in enumerate(out)]


def test_segment_index_is_lossless(spark):
    """Every brute-force edit-distance-≤3 pair must appear in the
    candidate set (pigeonhole guarantee), including short/empty-string
    pairs where segments degenerate to ''."""
    data = _corpus()
    df = spark.createDataFrame(data, ["key", "blk", "name"])
    cand = {
        (r["key_a"], r["key_b"])
        for r in pipeline_ops.editdist_candidate_pairs(
            df, ["blk"], k=3
        ).collect()
    }
    truth = set()
    for i, _, a in data:
        for j, _, b in data:
            if i < j and a != b and abs(len(a) - len(b)) <= 3 and _lev(a, b) <= 3:
                truth.add((i, j))
    assert truth, "corpus should contain true near-dup pairs"
    missed = truth - cand
    assert not missed, f"segment index missed {len(missed)} true pairs: {sorted(missed)[:5]}"


def test_candidates_respect_blocks(spark):
    """Candidates never cross block boundaries, and keys are ordered."""
    data = [(i, "b%d" % (i % 2), s) for i, (_, _, s) in enumerate(_corpus())]
    df = spark.createDataFrame(data, ["key", "blk", "name"])
    cand = pipeline_ops.editdist_candidate_pairs(df, ["blk"], k=3)
    rows = cand.collect()
    key_blk = {k: b for k, b, _ in data}
    for r in rows:
        assert key_blk[r["key_a"]] == r["blk"] == key_blk[r["key_b"]]
        assert r["key_a"] < r["key_b"]
    # Selectivity sanity: the index must not devolve to all-pairs on
    # real-ish strings (long random strings share few exact segments).
    longs = [k for k, _, s in data if len(s) >= 8]
    n_long_pairs = sum(
        1 for r in rows if r["key_a"] in longs and r["key_b"] in longs
    )
    all_long_pairs = len(longs) * (len(longs) - 1) // 2
    assert n_long_pairs < all_long_pairs
