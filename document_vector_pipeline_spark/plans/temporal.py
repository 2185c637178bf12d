"""Temporal operators: as-of join, range join, rolling windows, time rollups.

These are the time-series primitives the reference's event-driven design
implies (blob events arrive as a time-ordered stream — BlobTriggerFunction.cs
L42-56 routes them one at a time; a batch engine replaying that history needs
order-aware joins), plus the hypertable-style rollups a 100 TB telemetry
corpus needs.

Scale design notes
------------------
- ``asof_join`` is the union+window formulation: ONE shuffle on the join key,
  no range-explosion, no skewed theta-join.  The naive formulation
  (left ⋈ right ON key AND r.ts <= l.ts, then row_number) materializes
  O(|left| × matches) rows before pruning; at 100 TB that's the difference
  between a sort-merge pass and an OOM.
- ``range_join`` buckets both sides on a coarse time grid sized to the query
  interval, so each left row joins at most 2 buckets per key instead of the
  whole key partition — the standard interval-bucketing trick (cf. Spark's
  own range-join hints in Databricks runtime, and Flink's interval join).
- ``rolling_counts`` uses a RANGE BETWEEN frame over the *numeric* event
  time, which Spark evaluates in a single window pass (one shuffle, no join
  at all) — the preferred plan when the "join" is a self-join.
- Rollups use native ``.rollup`` / two-grain reaggregation so Catalyst does
  partial aggregation map-side; the daily grain re-aggregates the hourly
  grain (continuous-aggregate style), touching 24× fewer rows than the base
  table.

All money aggregates use the fixed-point ``money_sum`` contract (see
plans/analytics.py) so results are bit-identical across engines/partitionings.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.expr import epoch_us
from document_vector_pipeline_spark.plans.analytics import money_sum

US_PER_SECOND = 1_000_000


def _us(ts: Column) -> Column:
    """Exact microseconds-since-epoch (timestamps are µs-precision).
    NTZ-safe: parquet timestamps read as TIMESTAMP_NTZ in Spark 4."""
    return epoch_us(ts)


def _idiv(col: Column, w: int) -> Column:
    """Exact floor-division of a non-negative long column by an int literal.
    Plain ``col / w`` is IEEE double division; near bucket boundaries the
    quotient can round UP across an integer (~200 µs band at 30-min buckets),
    mis-bucketing rows.  Subtracting the modulus first makes the numerator an
    exact multiple, so the division is exact."""
    return ((col - col % w) / w).cast("long")


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: Optional[Sequence[str]] = None,
              right_seq: Optional[str] = None,
              tolerance_us: Optional[int] = None,
              prefix: str = "r_") -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same ``key`` (ties on
    right_ts broken by greatest ``right_seq``).

    Implementation: tag-union both sides, sort each key partition once by
    (ts, side, seq), and carry the latest right payload forward with
    ``last(..., ignorenulls=True)``.  One shuffle on ``key``; no join node.

    ``tolerance_us`` drops matches older than the window (match columns
    become NULL), mirroring pandas ``merge_asof(tolerance=...)``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    if right_seq is None:
        right_seq = right_cols[0] if right_cols else right_ts

    payload = F.struct(
        F.col(right_ts).alias("__ats"),
        *[F.col(c).alias(c) for c in right_cols]).alias("__payload")
    r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_seq).cast("long").alias("__seq"), payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns])
    l = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"), F.lit(0).cast("long").alias("__seq"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left.columns)

    w = (Window.partitionBy("__k")
         .orderBy(F.col("__ts"), F.col("__side"), F.col("__seq"))
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = (r.unionByName(l)
               .withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
               .filter(F.col("__side") == 1))
    if tolerance_us is not None:
        in_window = (_us(F.col("__ts")) - _us(F.col("__m.__ats"))
                     <= F.lit(tolerance_us))
        matched = matched.withColumn(
            "__m", F.when(in_window, F.col("__m")))
    out_cols = list(left.columns)
    out_cols.append(F.col("__m.__ats").alias(f"{prefix}{right_ts}"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"{prefix}{c}")
                    for c in right_cols)
    return matched.select(*out_cols)


def _range_candidates(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str,
                      lower_us: int, upper_us: int,
                      right_cols: Sequence[str], prefix: str):
    """Bucketed candidate generation shared by range_join / range_join_agg.

    Both sides get coarse time buckets of width ``upper_us - lower_us``; the
    left side explodes to the (≤2) buckets its interval can touch, the join
    runs equi on ``(key, bucket)``, and the exact half-open range predicate
    marks the in-range candidates.  A right row lives in exactly one bucket,
    so each (left, right) pair appears at most once.  Shuffle volume is
    O(2·|left| + |right|) instead of a per-key cross product.

    Returns ``(joined, in_range)`` — a LEFT join (unmatched/out-of-range
    rows carry NULL right columns) plus the in-range predicate column.
    """
    width = upper_us - lower_us
    if width <= 0:
        raise ValueError("upper_us must exceed lower_us")
    lo = _us(F.col(left_ts)) + F.lit(lower_us)
    hi = _us(F.col(left_ts)) + F.lit(upper_us)  # exclusive
    l = left.withColumn(
        "__bucket",
        F.explode(F.sequence(_idiv(lo, width), _idiv(hi - 1, width))))
    r = right.select(
        F.col(key).alias("__rk"),
        _idiv(_us(F.col(right_ts)), width).alias("__bucket"),
        _us(F.col(right_ts)).alias("__rus"),
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols])
    joined = l.join(
        r, (F.col(key) == F.col("__rk")) & (l["__bucket"] == r["__bucket"]),
        "left")
    in_range = (F.col("__rus") >= lo) & (F.col("__rus") < hi)
    return joined, in_range


def range_join(left: DataFrame, right: DataFrame, key: str,
               left_ts: str = "ts", right_ts: str = "ts",
               lower_us: int = -30 * 60 * US_PER_SECOND,
               upper_us: int = 0,
               right_cols: Optional[Sequence[str]] = None,
               prefix: str = "r_") -> DataFrame:
    """Inner interval join: every (left, right) pair of the same ``key``
    with ``right_ts`` in ``[left_ts+lower_us, left_ts+upper_us)`` (half-open),
    each pair exactly once.  See ``_range_candidates`` for the bucketing."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    joined, in_range = _range_candidates(
        left, right, key, left_ts, right_ts, lower_us, upper_us,
        right_cols, prefix)
    return joined.filter(in_range).select(
        *left.columns, f"{prefix}{right_ts}",
        *[f"{prefix}{c}" for c in right_cols])


def range_join_agg(left: DataFrame, right: DataFrame, key: str,
                   left_ts: str = "ts", right_ts: str = "ts",
                   lower_us: int = -30 * 60 * US_PER_SECOND,
                   upper_us: int = 0,
                   value: str = "value") -> DataFrame:
    """Range join + per-left-row aggregation: for each left row (rows must be
    unique), the count and fixed-point value sum of in-range right rows —
    zero-match rows kept with (0, 0.0).  Aggregates over the LEFT candidate
    join directly: out-of-range candidates are NULLed, ``count(col)`` skips
    them, and the groupBy collapses any duplicate NULL rows an unmatched
    left row picked up from bucket explosion — no distinct, no re-join."""
    joined, in_range = _range_candidates(
        left, right, key, left_ts, right_ts, lower_us, upper_us,
        [value], "r_")
    matched = F.when(in_range, F.col(f"r_{value}"))
    unit = 100.0
    return (joined
            .groupBy(*left.columns)
            .agg(F.count(matched).alias("n_matched"),
                 (F.coalesce(F.sum(F.round(matched * unit, 0).cast("long")),
                             F.lit(0)) / unit).alias("matched_value")))


def rolling_counts(events: DataFrame, key: str = "user_id",
                   ts: str = "ts", value: str = "value",
                   window_us: int = 30 * 60 * US_PER_SECOND) -> DataFrame:
    """Per-key rolling aggregates over the *preceding* ``window_us`` (strictly
    before the current row): single window pass, RANGE frame on numeric event
    time — the no-join formulation of the self range-join."""
    w = (Window.partitionBy(key).orderBy(_us(F.col(ts)))
         .rangeBetween(-window_us, -1))
    unit = 100.0
    return events.select(
        *events.columns,
        F.count(F.col(value)).over(w).alias("n_prev"),
        (F.coalesce(F.sum(F.round(F.col(value) * unit, 0).cast("long"))
                    .over(w), F.lit(0)) / unit).alias("prev_value"))


def rollup_events(events: DataFrame, ts: str = "ts",
                  dim: str = "event_type", value: str = "value") -> DataFrame:
    """ROLLUP (grouping-sets) aggregate over (dim, day): day totals per dim,
    per-dim totals, and the grand total, tagged by grouping_id.  Native
    ``.rollup`` → Catalyst Expand + one partial-aggregated shuffle."""
    day = F.date_trunc("day", F.col(ts)).alias("day")
    return (events.rollup(F.col(dim).alias(dim), day)
            .agg(F.grouping_id().alias("gid"),
                 F.count("*").alias("n_events"),
                 money_sum(F.col(value), 2).alias("total_value"))
            .select(F.col("gid"),
                    F.coalesce(F.col(dim), F.lit("ALL")).alias(dim),
                    F.coalesce(F.col("day").cast("timestamp_ntz"),
                               F.lit("1970-01-01").cast("timestamp_ntz"))
                    .alias("day"),
                    "n_events", "total_value"))


def hypertable_rollup(events: DataFrame, ts: str = "ts",
                      value: str = "value") -> DataFrame:
    """Hypertable-style continuous aggregate: an hourly grain from the base
    table, and a daily grain re-aggregated FROM THE HOURLY grain (24× fewer
    input rows than re-scanning base — the TimescaleDB cagg pattern).
    Fixed-point cents carry through both grains exactly."""
    cents = F.round(F.col(value) * 100.0, 0).cast("long")
    hourly = (events
              .groupBy(F.date_trunc("hour", F.col(ts)).alias("bucket"))
              .agg(F.count("*").alias("n_events"),
                   F.sum(cents).alias("cents")))
    daily = (hourly
             .groupBy(F.date_trunc("day", F.col("bucket")).alias("bucket"))
             .agg(F.sum("n_events").alias("n_events"),
                  F.sum("cents").alias("cents")))
    out_cols = ["grain", "bucket", "n_events",
                (F.col("cents") / 100.0).alias("total_value")]
    return (hourly.withColumn("grain", F.lit("hour")).select(*out_cols)
            .unionByName(
                daily.withColumn("grain", F.lit("day")).select(*out_cols)))


def cube_events(events: DataFrame, ts: str = "ts",
                dim: str = "event_type", value: str = "value") -> DataFrame:
    """CUBE grouping sets over (dim, day-of-week): all four grouping
    combinations in one pass — Catalyst Expand + a single partial-
    aggregated shuffle, the same physical shape as ``rollup_events`` but
    with the full lattice.  dow is Spark convention (1=Sunday..7)."""
    dow = F.dayofweek(F.col(ts)).alias("dow")
    return (events.cube(F.col(dim).alias(dim), dow)
            .agg(F.grouping_id().alias("gid"),
                 F.count("*").alias("n_events"),
                 money_sum(F.col(value), 2).alias("total_value"))
            .select(F.col("gid"),
                    F.coalesce(F.col(dim), F.lit("ALL")).alias(dim),
                    F.coalesce(F.col("dow"), F.lit(-1)).cast("int")
                     .alias("dow"),
                    "n_events", "total_value"))


def asof_nearest(left: DataFrame, right: DataFrame, key: str,
                 left_ts: str = "ts", right_ts: str = "ts",
                 right_cols: Optional[Sequence[str]] = None,
                 right_seq: Optional[str] = None,
                 prefix: str = "r_") -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction='nearest')``):
    for every left row, attach the right row minimizing |right_ts −
    left_ts| within the same ``key``.

    Deterministic tie order: (|Δ|, right_ts, then greatest ``right_seq``
    among past rows / smallest among future rows) — i.e. an exact-tie
    between a past and a future row prefers the past one, and equal-ts
    duplicates resolve the same way the backward/forward scans do.

    Implementation: ONE tag-union sort per key (same single-shuffle shape
    as asof_join) with two frames over it — carry-last for the backward
    candidate, carry-first for the forward candidate — then a map-side
    pick of the closer one.  No join node, no second shuffle.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    if right_seq is None:
        right_seq = right_cols[0] if right_cols else right_ts

    payload = F.struct(
        F.col(right_ts).alias("__ats"),
        *[F.col(c).alias(c) for c in right_cols]).alias("__payload")
    r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_seq).cast("long").alias("__seq"), payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns])
    l = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"), F.lit(0).cast("long").alias("__seq"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left.columns)
    wb = (Window.partitionBy("__k")
          .orderBy(F.col("__ts"), F.col("__side"), F.col("__seq"))
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy("__k")
          .orderBy(F.col("__ts"), F.col("__side"), F.col("__seq"))
          .rowsBetween(0, Window.unboundedFollowing))
    u = (r.unionByName(l)
         .withColumn("__b", F.last("__payload", ignorenulls=True).over(wb))
         .withColumn("__f", F.first("__payload", ignorenulls=True).over(wf))
         .filter(F.col("__side") == 1))
    db = _us(F.col("__ts")) - _us(F.col("__b.__ats"))
    df_ = _us(F.col("__f.__ats")) - _us(F.col("__ts"))
    pick_b = (F.col("__f").isNull()
              | (F.col("__b").isNotNull() & (db <= df_)))
    m = F.when(pick_b, F.col("__b")).otherwise(F.col("__f"))
    u = u.withColumn("__m", m)
    out_cols = list(left.columns)
    out_cols.append(F.col("__m.__ats").alias(f"{prefix}{right_ts}"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"{prefix}{c}")
                    for c in right_cols)
    return u.select(*out_cols)


def asof_forward(left: DataFrame, right: DataFrame, key: str,
                 left_ts: str = "ts", right_ts: str = "ts",
                 right_cols: Optional[Sequence[str]] = None,
                 right_seq: Optional[str] = None,
                 tolerance_us: Optional[int] = None,
                 prefix: str = "r_") -> DataFrame:
    """Forward as-of join (pandas ``merge_asof(direction='forward')``):
    for every left row, attach the right row with the SMALLEST
    ``right_ts`` >= ``left_ts`` for the same ``key`` (equal-ts right
    duplicates resolve to the smallest ``right_seq``).  Completes the
    backward/forward/nearest direction triple with the same
    single-shuffle tag-union shape as ``asof_join``: one sort per key,
    carry-first over the following frame, no join node.

    ``tolerance_us`` drops matches farther than the window ahead
    (match columns become NULL)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    if right_seq is None:
        right_seq = right_cols[0] if right_cols else right_ts

    payload = F.struct(
        F.col(right_ts).alias("__ats"),
        *[F.col(c).alias(c) for c in right_cols]).alias("__payload")
    # left sorts BEFORE right at equal ts (side 0 < 1) so the inclusive
    # >= match sees same-instant right rows in its following frame.
    r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(right_seq).cast("long").alias("__seq"), payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns])
    l = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"), F.lit(0).cast("long").alias("__seq"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left.columns)
    w = (Window.partitionBy("__k")
         .orderBy(F.col("__ts"), F.col("__side"), F.col("__seq"))
         .rowsBetween(0, Window.unboundedFollowing))
    matched = (r.unionByName(l)
               .withColumn("__m",
                           F.first("__payload", ignorenulls=True).over(w))
               .filter(F.col("__side") == 0))
    if tolerance_us is not None:
        in_window = (_us(F.col("__m.__ats")) - _us(F.col("__ts"))
                     <= F.lit(tolerance_us))
        matched = matched.withColumn(
            "__m", F.when(in_window, F.col("__m")))
    out_cols = list(left.columns)
    out_cols.append(F.col("__m.__ats").alias(f"{prefix}{right_ts}"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"{prefix}{c}")
                    for c in right_cols)
    return matched.select(*out_cols)


def gapfill_locf(events: DataFrame, ts: str = "ts",
                 dim: str = "event_type", value: str = "value",
                 grain: str = "hour") -> DataFrame:
    """Hypertable-style ``time_bucket_gapfill`` + ``locf``: per ``dim``,
    an hourly-bucket series over the CORPUS time range with missing
    buckets materialized (n_events = 0, is_gap = true) and the value
    carried forward from the last real bucket (NULL before the first).
    The TimescaleDB gapfill/locf pattern for dashboard-continuous series.

    Plan shape (the 100 TB shape): the base table is touched exactly
    once by the grain aggregation (one partial-aggregated shuffle).
    The bucket grid is dims × buckets — generated from a 1-row min/max
    aggregate cross-joined onto the distinct dims and sequence-exploded,
    thousands of rows where the base table has billions.  The LOCF
    window and the grid join both run on the GRID, never on events.
    Fixed-point cents keep the carried values engine-exact."""
    cents = F.round(F.col(value) * 100.0, 0).cast("long")
    hourly = (events
              .groupBy(F.col(dim).alias(dim),
                       F.date_trunc(grain, F.col(ts)).alias("bucket"))
              .agg(F.count("*").alias("n_events"),
                   F.sum(cents).alias("__cents")))
    span = events.agg(
        F.date_trunc(grain, F.min(ts)).alias("__lo"),
        F.date_trunc(grain, F.max(ts)).alias("__hi"))
    dims = events.select(F.col(dim).alias(dim)).distinct()
    step = F.expr(f"interval 1 {grain}")
    grid = (dims.join(F.broadcast(span))
            .select(dim, F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), step))
                .alias("bucket")))
    joined = grid.join(hourly, [dim, "bucket"], "left")
    w = (Window.partitionBy(dim).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (joined
            .withColumn("__filled",
                        F.last("__cents", ignorenulls=True).over(w))
            .select(dim, "bucket",
                    F.coalesce(F.col("n_events"), F.lit(0)).cast("long")
                     .alias("n_events"),
                    (F.col("__cents") / 100.0).alias("bucket_value"),
                    (F.col("__filled") / 100.0).alias("locf_value"),
                    F.col("__cents").isNull().alias("is_gap")))


def scd2_build(changes: DataFrame, key: str, state: str,
               ts: str = "ts", seq: str | None = None) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change stream: per
    ``key``, collapse consecutive rows with an unchanged ``state`` and
    emit validity intervals — (key, state, valid_from, valid_to,
    version, is_current) with half-open [valid_from, valid_to) ranges
    and NULL valid_to on the current row.  The dimension-history table
    every warehouse derives from CDC feeds.

    ONE shuffle (key window, ordered by (ts, seq)): a lag marks state
    changes, a running sum numbers versions, the interval close is a
    lead over the change rows only.  Deterministic for duplicate
    timestamps via the ``seq`` tie-break."""
    order_cols = [F.col(ts)] + ([F.col(seq)] if seq else [])
    w = Window.partitionBy(key).orderBy(*order_cols)
    changed = (F.lag(state).over(w).isNull()
               | (F.col(state) != F.lag(state).over(w)))
    marked = (changes
              .select(key, state, ts, *( [seq] if seq else [] ))
              .withColumn("__chg", changed)
              .filter(F.col("__chg")))
    w2 = Window.partitionBy(key).orderBy(*order_cols)
    return (marked
            .withColumn("version",
                        F.row_number().over(w2).cast("long"))
            .withColumn("valid_from", F.col(ts))
            .withColumn("valid_to", F.lead(ts).over(w2))
            .select(key, state,
                    "valid_from", "valid_to", "version",
                    F.col("valid_to").isNull().alias("is_current")))
