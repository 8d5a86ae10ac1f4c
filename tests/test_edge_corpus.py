"""Crash sweep over the pathological-input corpus (tools/edgegen.py).

Every contract query must EXECUTE on data containing empty /
single-token / whitespace-only documents, a single-event user, exactly
tied timestamps, boundary values, and a zero embedding vector — the
rows a real 100 TB corpus always contains and uniform synthetic data
never does.  Values are not compared here (tools/check.py owns that on
pristine data); the assertion is "no runtime exception, a materialized
result, a stable schema".  This is the structural guard for the
failure class the round-2 advisor caught once by eye
(negative-length ``slice`` on short docs).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

import __spark_entry__ as e

EDGE_DIR = "/tmp/sparkgraft_edge"

#: Queries whose semantics legitimately cannot run on the tiny corpus.
#: Keep EMPTY unless a query has a documented hard precondition.
SKIP: dict[str, str] = {}


@pytest.fixture(scope="module", autouse=True)
def edge_corpus():
    if not Path(EDGE_DIR, "embeddings.parquet").exists():
        subprocess.run(
            [sys.executable, str(Path(__file__).parent.parent / "tools" / "edgegen.py"),
             EDGE_DIR],
            check=True,
        )


@pytest.mark.parametrize("name", sorted(e.queries()))
def test_query_survives_edge_corpus(spark, name):
    if name in SKIP:
        pytest.skip(SKIP[name])
    df = e.queries()[name](spark, EDGE_DIR)
    rows = df.limit(20).collect()
    assert rows is not None
    assert len(df.schema.fields) > 0
