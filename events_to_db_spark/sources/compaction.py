"""Small-file compaction — the table-maintenance job every long-running
ingest needs.

A streaming copy (one file per micro-batch) or an over-parallel write
leaves thousands of tiny Parquet files; at 100 TB that means listing
storms, per-file open cost, and starved scan parallelism (a 4 KB file
still occupies a task).  Compaction rewrites a directory into files of
~``target_bytes`` each:

* the target partition count comes from the ACTUAL on-disk byte size
  (not row counts — row width varies), floor 1;
* the rewrite is one job — a scan + round-robin ``repartition(n)``
  (full shuffle, deliberately: ``coalesce`` would chain narrow deps and
  skew file sizes when input files are uneven);
* the output goes to a NEW directory + atomic swap by the caller, never
  in place — a failed compaction must leave the source untouched
  (Spark's commit protocol guarantees no partial visibility under
  ``_SUCCESS``).

Row-identical is asserted in tests/test_sources_sinks.py by count and
content hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (ignores _SUCCESS/CRC)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(root, f))
    return total


def n_data_files(path: str) -> int:
    return sum(
        1
        for _root, _d, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``src_dir`` into ``dst_dir`` with ~``target_bytes`` files.

    Returns the partition count used.  Compression makes output size
    an estimate — the contract is "few appropriately-sized files", not
    byte-exact splits.
    """
    size = dir_bytes(src_dir)
    n = max(1, (size + target_bytes - 1) // target_bytes)
    df: DataFrame = spark.read.format(fmt).load(src_dir)
    df.repartition(n).write.mode("overwrite").format(fmt).save(dst_dir)
    return n
