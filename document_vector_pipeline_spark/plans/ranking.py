"""Two-phase EXACT global ranking — the scale-safe form of the
unpartitioned rank/ntile window.

``Window.orderBy(...)`` with no partition spec is correct but moves the
ENTIRE frame through ONE task (Spark warns ``WindowExec: No Partition
Defined``): even when the input is an already-aggregated users-sized
frame, at 10^9 users that is a one-core sort-and-spill straggler.  The
classical fix (Goetz Graefe's rank decomposition; the same shape
TeraSort uses) is two phases, both fully distributed:

1. ``repartitionByRange(n, *order_cols)`` — a range exchange on the
   ordering key, so every row in partition i sorts strictly before
   every row in partition i+1 (total order across partitions; the
   ordering must carry a unique tie-break so ranks are well-defined).
2. Per-partition row counts (n_partitions rows — PLAN METADATA, the
   same bounded-collect discipline as PQ codebooks) turned into an
   exclusive prefix sum of partition offsets; the global rank of a row
   is its partition's offset + its LOCAL row_number, computed in a
   window partitioned by the physical partition id — n_partitions
   bounded groups, never one global task.

The result is BIT-IDENTICAL to the unpartitioned window (same total
order → same ranks), so DuckDB oracles written against the one-window
form stay green.  ``ntile`` is derived arithmetically from the global
row_number with the standard SQL bucket rule (first N%k buckets get
one extra row), which Spark and DuckDB share.

Reference analogue: the reference engine has no ranked-decile surface
(BlobTriggerFunction.cs is a per-blob trigger); this module exists for
the analytics keys the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_number", "global_ntile", "grouped_running_sum"]


def _default_parts(df: DataFrame) -> int:
    return df.sparkSession.sparkContext.defaultParallelism


def _ranged(df: DataFrame, order_cols: list, n_parts: int):
    """Range-exchange ``df`` on the ordering, pin the partitioning with
    an eager localCheckpoint (two downstream jobs — the offsets count
    and the ranked output — MUST see the same partitions; the range
    boundaries come from a sample, so recomputation is not guaranteed
    stable), and return (frame+__pid, offsets DataFrame).  The offsets
    frame has n_parts rows: (__pid, __off) with __off = rows in all
    earlier partitions."""
    part = (df.repartitionByRange(n_parts, *order_cols)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    counts = {int(r["__pid"]): int(r["n"])
              for r in part.groupBy("__pid").count()
              .withColumnRenamed("count", "n").collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        offsets = [(0, 0)]
    off = df.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    return part, off, acc


def global_row_number(df: DataFrame, order_cols: list,
                      out: str = "rn",
                      n_partitions: int | None = None):
    """``(df + out, total_rows)``: exact global 1-based row_number over
    ``order_cols`` (must be a total order) with no single-task stage.
    Equivalent to ``F.row_number().over(Window.orderBy(*order_cols))``
    row for row."""
    n_parts = n_partitions or _default_parts(df)
    part, off, total = _ranged(df, order_cols, n_parts)
    wl = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = (part.join(F.broadcast(off), "__pid")
              .withColumn(out, (F.col("__off")
                                + F.row_number().over(wl)).cast("long"))
              .drop("__pid", "__off"))
    return ranked, total


def _ntile_expr(rn_col: str, total: int, n_tiles: int) -> str:
    """SQL ntile(k) as INTEGER arithmetic on the global row_number:
    with q = N//k and r = N%k the first r buckets hold q+1 rows, the
    rest q — identical in Spark and DuckDB.  ``div`` keeps every step
    exact int64 (no double round-trip), no window."""
    q, r = divmod(int(total), n_tiles)
    if q == 0:
        return f"cast({rn_col} as int)"
    head = r * (q + 1)
    return (f"cast(case when {rn_col} <= {head} "
            f"then ({rn_col} + {q}) div {q + 1} "
            f"else {r} + ({rn_col} - {head} + {q - 1}) div {q} "
            f"end as int)")


def global_ntile(df: DataFrame, order_cols: list, n_tiles: int,
                 out: str = "tile",
                 n_partitions: int | None = None) -> DataFrame:
    """Exact global ``ntile(n_tiles)`` over ``order_cols`` (total
    order), two-phase: bit-identical to
    ``F.ntile(n).over(Window.orderBy(*order_cols))`` without the
    single-task window."""
    ranked, total = global_row_number(df, order_cols, out="__grn",
                                      n_partitions=n_partitions)
    if total == 0:
        return ranked.withColumn(out, F.lit(None).cast("int")).drop("__grn")
    return (ranked.withColumn(out, F.expr(_ntile_expr("__grn", total,
                                                      n_tiles)))
            .drop("__grn"))


def grouped_running_sum(df: DataFrame, group_col: str, order_cols: list,
                        val_col: str, out: str = "cum",
                        n_partitions: int | None = None) -> DataFrame:
    """Per-group cumulative sum (``SUM(val) OVER (PARTITION BY g ORDER
    BY ... ROWS UNBOUNDED PRECEDING)``) in two-phase form: range
    exchange on (group, *order), per-(partition, group) partial sums
    collected as plan metadata (≤ n_parts·groups-that-span rows — a
    group contributes one row per partition it TOUCHES, and range
    partitioning keeps each group contiguous, so this is O(n_parts +
    n_groups)), exclusive prefix offsets per group, map-side cum =
    group offset + local running sum.  For the few-huge-groups shape
    (token budgets per source) where a group-partitioned window would
    be one task per group."""
    n_parts = n_partitions or _default_parts(df)
    order = [F.col(group_col), *order_cols]
    part = (df.repartitionByRange(n_parts, *order)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    partials = (part.groupBy("__pid", group_col)
                .agg(F.sum(F.col(val_col)).cast("long").alias("__s"))
                .collect())
    by_group: dict = {}
    for r in sorted(partials, key=lambda r: int(r["__pid"])):
        g = r[group_col]
        seen = by_group.setdefault(g, [])
        prior = seen[-1][1] + seen[-1][2] if seen else 0
        seen.append((int(r["__pid"]), prior, int(r["__s"])))
    rows = [(pid, g, off) for g, lst in by_group.items()
            for pid, off, _ in lst]
    schema = (part.select("__pid", group_col).limit(0)
              .withColumn("__goff", F.lit(0).cast("long")).schema)
    off = df.sparkSession.createDataFrame(rows, schema)
    wl = (Window.partitionBy("__pid", group_col).orderBy(*order_cols)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (part.join(F.broadcast(off), ["__pid", group_col])
            .withColumn(out, (F.col("__goff")
                              + F.sum(F.col(val_col)).over(wl))
                        .cast("long"))
            .drop("__pid", "__goff"))
