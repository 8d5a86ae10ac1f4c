"""Shared pytest fixtures: one local SparkSession and a DuckDB
connection with the oracle views, both session-scoped."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from events_to_db_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


def assert_oracle_match(spark, duck, name: str, sf_dir: str = SF_SMOKE) -> None:
    """Differential check of one contract query at the given sf."""
    from tools.check import compare

    import __spark_entry__ as e

    spark_pdf = e.queries()[name](spark, sf_dir).toPandas()
    sql = e.oracle_sql().get(name)
    if sql is None:
        assert len(spark_pdf) >= 0  # rows-only surface
        return
    duck_pdf = duck.sql(sql).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
