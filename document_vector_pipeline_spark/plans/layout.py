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


def hilbert_index(a: Column, b: Column, bits: int = 10) -> Column:
    """Hilbert-curve index of two non-negative ints below 2**bits — the
    space-filling key with strictly better locality than Z-order (every
    consecutive pair of Hilbert values is Manhattan-adjacent in (a, b),
    so a key range maps to ONE connected rectangle-ish region instead of
    Z-order's split quadrants; Delta/Iceberg expose the same option as
    OPTIMIZE ... HILBERT).

    One fold expression over the bit positions (top-down), carrying the
    (x, y, d) state through the standard quadrant-rotation recurrence.
    Reflection is ``XOR (s-1)`` — exact bit-flip of the not-yet-consumed
    low bits (equivalent to ``s-1-x`` there, and bits at or above ``s``
    are never consulted again, so leaving them flipped is harmless).
    All arithmetic is integer → bit-identical across engines; the SQL
    oracle unrolls the same recurrence as chained CTEs."""
    s_arr = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])

    def step(acc, i):
        s = F.element_at(s_arr, (i + F.lit(1)).cast("int"))
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1).cast("long")) \
              .otherwise(F.lit(0).cast("long"))
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1).cast("long")) \
              .otherwise(F.lit(0).cast("long"))
        d2 = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        flip = s - 1
        x2 = (F.when(ry == 0,
                     F.when(rx == 1, acc["y"].bitwiseXOR(flip))
                      .otherwise(acc["y"]))
              .otherwise(acc["x"]))
        y2 = (F.when(ry == 0,
                     F.when(rx == 1, acc["x"].bitwiseXOR(flip))
                      .otherwise(acc["x"]))
              .otherwise(acc["y"]))
        return F.struct(x2.alias("x"), y2.alias("y"), d2.alias("d"))

    return F.aggregate(
        F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1)),
        F.struct(a.cast("long").alias("x"), b.cast("long").alias("y"),
                 F.lit(0).cast("long").alias("d")),
        step,
        lambda acc: acc["d"])


def hilbert_write(df: DataFrame, path: str, col_a: str, col_b: str,
                  bits: int = 10, files: int = 8) -> None:
    """Write ``df`` Hilbert-clustered on (col_a, col_b): range-partition
    by the Hilbert key and sort within partitions — same recipe as
    ``zorder_write`` with the better-locality key."""
    h = hilbert_index(F.col(col_a), F.col(col_b), bits)
    (df.withColumn("__h", h)
     .repartitionByRange(files, "__h")
     .sortWithinPartitions("__h")
     .drop("__h")
     .write.mode("overwrite").parquet(path))


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
