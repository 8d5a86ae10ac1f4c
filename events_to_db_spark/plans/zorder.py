"""Z-order (Morton) multi-dimensional clustering for data layout.

The 100 TB problem this solves: a parquet lake sorted by one key
(e.g. time) gives perfect file-skipping on that key and none on any
other.  Interleaving the bits of two keys into one Morton code and
range-partitioning the write on it gives *both* predicates partial
skipping — every file covers a small rectangle of (a, b) space, so
per-file min/max stats prune on either dimension (the same layout
Delta's OPTIMIZE ZORDER and Iceberg's sort orders target).

Everything here is pure Catalyst arithmetic (shifts, masks, ORs) —
whole-stage-codegen'd, no UDF, no shuffle beyond the final
``repartitionByRange`` that the write itself needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints: bit i of ``a`` lands at
    position 2i, bit i of ``b`` at 2i+1.  ``bits`` bits per dimension
    (values are masked to that width first, so out-of-range inputs
    degrade to their low bits rather than corrupting neighbours)."""
    a = a.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_value_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton code as a portable SQL expression (DuckDB /
    Spark SQL share `<<`, `>>`, `&`, `|` semantics on BIGINT)."""
    mask = (1 << bits) - 1
    am, bm = f"(CAST({a} AS BIGINT) & {mask})", f"(CAST({b} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({am} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({bm} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned on
    the Morton code of (col_a, col_b).

    ``repartitionByRange`` samples the z distribution, so files get
    balanced row counts over contiguous z ranges — i.e. rectangles in
    (a, b) space.  The z column is dropped before writing; the layout
    benefit lives in the parquet column min/max stats of the original
    columns, which any reader (including other engines) exploits."""
    zcol = "__z"
    (
        df.withColumn(zcol, z_value(F.col(col_a), F.col(col_b), bits))
        .repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )
