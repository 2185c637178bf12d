"""Data-layout operators: multi-dimension clustering for scan pruning.

Partitioning prunes on ONE dimension; sorting helps one more.  Z-ordering
interleaves the bits of two dimensions into a single sort key, so a range
of z-values is simultaneously narrow in BOTH dimensions — parquet
min/max footer stats then skip files for predicates on either column.
This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed
as plain Spark: compute z, range-partition + sort by it, write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_index(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Shift amounts are Python literals (a loop at plan-build time), so the
    whole key is one codegen'd integer expression; disjoint bit positions
    make the '+' a bitwise OR."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(a.cast("long"), i)
                           .bitwiseAND(1), 2 * i)
             + F.shiftleft(F.shiftright(b.cast("long"), i)
                           .bitwiseAND(1), 2 * i + 1))
    return z


def zorder_write(df: DataFrame, path: str, col_a: str, col_b: str,
                 bits: int = 16, files: int = 8) -> None:
    """Write ``df`` z-ordered on (col_a, col_b): range-partition by the
    z-key (contiguous z-ranges per file) and sort within partitions, so
    every output file covers a small rectangle in (a, b) space and footer
    min/max stats prune scans filtered on EITHER column."""
    z = zorder_index(F.col(col_a), F.col(col_b), bits)
    (df.withColumn("__z", z)
     .repartitionByRange(files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path))
