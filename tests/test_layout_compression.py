"""Layout → bytes evidence (plans/zorder + layout advice): sorting a
parquet file by its high-correlation column must shrink it (run-length
and dictionary pages compress sorted runs) and tighten per-row-group
min/max spans so scan pruning actually prunes.  This is the measured
backing for the repo's data-layout guidance at 100 TB."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from events_to_db_spark.session import load_table
from tests.conftest import SF_SMOKE


def _bytes(d: str) -> int:
    total = 0
    for p in glob.glob(f"{d}/*.parquet"):
        md = pq.ParquetFile(p).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            total += sum(
                rg.column(j).total_compressed_size
                for j in range(rg.num_columns)
            )
    return total


def test_sorted_layout_compresses_and_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate", "l_quantity"
    )
    unsorted_dir = str(tmp_path / "unsorted")
    sorted_dir = str(tmp_path / "sorted")
    # Scramble by a hash of the WHOLE row (no correlation with any
    # column — sorting by a single column's hash would cluster that
    # column and accidentally improve ITS compression), then write
    # both layouts with identical settings.
    scrambled = li.orderBy(
        F.xxhash64("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    )
    scrambled.coalesce(1).write.mode("overwrite").parquet(unsorted_dir)
    li.orderBy("l_orderkey").coalesce(1).write.mode("overwrite").parquet(
        sorted_dir
    )

    b_unsorted, b_sorted = _bytes(unsorted_dir), _bytes(sorted_dir)
    assert b_sorted < b_unsorted, (
        f"sorted layout should compress better: {b_sorted} vs {b_unsorted}"
    )

    # Min/max pruning evidence: in the sorted file the l_orderkey span
    # of each row group is a small slice of the full domain; in the
    # scrambled file every row group spans ~the whole domain.
    def spans(d: str, col: str = "l_orderkey"):
        out = []
        for p in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(p).metadata
            idx = md.schema.names.index(col)
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(idx).statistics
                out.append(st.max - st.min)
        return out

    full = max(spans(unsorted_dir))
    # A single row group makes span comparison degenerate; the check
    # still holds (sorted span == full span only when one RG holds all
    # rows in both files, in which case compression above is the
    # evidence).  With multiple RGs, sorted spans must be narrower.
    s_spans, u_spans = spans(sorted_dir), spans(unsorted_dir)
    if len(s_spans) > 1:
        assert max(s_spans) < full
    assert sum(s_spans) <= sum(u_spans)
