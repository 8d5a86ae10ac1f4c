"""Golden-file tests (SURVEY.md §5.3.4): flagship query outputs at
sf0.001, frozen as CSV in tests/golden/.  Catches silent semantic
drift that the live DuckDB oracle can't (e.g. both engines changing
together, or an edit to a query AND its oracle that alters meaning).

Regenerate deliberately after an intentional semantics change:
    python -m tests.test_golden
"""

from __future__ import annotations

from pathlib import Path

import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"
GOLDEN_QUERIES = [
    "q_agg_q1",
    "q_join_multiway",
    "q_ev_tumbling",
    "q_text_wordcount",
    "q_sim_cosine_knn",
    "q_ev_latest",
    "q_ev_scd2",
    "q_ev_hysteresis",
    "q_dedup_cluster",
    "q_udf_ewma",
]


def _frame(spark, name):
    import __spark_entry__ as e

    pdf = e.queries()[name](spark, "/root/testdata/sf0.001").toPandas()
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:  # canonical text form, stable across pandas versions
        pdf[c] = pdf[c].map(lambda v: "" if v is None else str(v))
    return pdf.sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_matches_golden(spark, name):
    path = GOLDEN_DIR / f"{name}.csv"
    assert path.exists(), f"golden file missing — run: python -m tests.test_golden"
    import pandas as pd

    got = _frame(spark, name)
    want = pd.read_csv(path, dtype=str, keep_default_na=False)
    assert list(got.columns) == list(want.columns), name
    assert got.values.tolist() == want.values.tolist(), name


def _regenerate() -> None:
    from events_to_db_spark.session import get_spark

    GOLDEN_DIR.mkdir(exist_ok=True)
    spark = get_spark("golden", cpus=8)
    for name in GOLDEN_QUERIES:
        _frame(spark, name).to_csv(GOLDEN_DIR / f"{name}.csv", index=False)
        print(f"wrote {name}.csv")


if __name__ == "__main__":
    _regenerate()
