"""Contract smoke tests: driver hooks + per-query oracle parity at
sf0.001 (fast).  The heavyweight sf0.01 sweep lives in tools/check.py."""

from __future__ import annotations

import pytest

import __spark_entry__ as e
from tests.conftest import SF_SMOKE, assert_oracle_match


def test_entry_smoke(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_has_callable_and_most_have_oracles(spark):
    qs, oracles = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs), "oracle without a query"


@pytest.mark.parametrize("name", sorted(e.queries()))
def test_oracle_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name, SF_SMOKE)
