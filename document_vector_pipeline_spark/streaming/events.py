"""Event-stream analytics: watermarked tumbling windows and session windows
(SURVEY.md §2 #26-27).

Each transformation is stream/batch agnostic — pass a streaming DataFrame
(readStream) and it becomes a watermarked streaming aggregation; pass the
batch events table and it is the exact batch equivalent the DuckDB oracle
checks.  That dual use is the point: one definition, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.expr import epoch_us

from document_vector_pipeline_spark.plans.analytics import money_sum


def _watermarked(events: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Streaming mode: cast the event-time column to TIMESTAMP (parquet
    timestamps read as TIMESTAMP_NTZ in Spark 4, which withWatermark
    rejects; the session timezone is pinned UTC so the instant is
    unchanged) and attach the watermark.  Batch mode: pass-through — the
    batch twin computes on the NTZ column directly."""
    if not events.isStreaming:
        return events
    return (events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type.  Late rows beyond the
    watermark are dropped in streaming mode; batch mode sees everything."""
    src = _watermarked(events, "ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 money_sum(F.col("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("event_type"), F.col("n_events"),
                    F.col("total_value")))


def sliding_event_counts(events: DataFrame, window: str = "1 hour",
                         slide: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Sliding-window counts/sums per event_type: each event lands in
    window/slide overlapping windows (2 for the defaults).  Same dual
    stream/batch contract as windowed_event_counts."""
    src = _watermarked(events, "ts", watermark)
    return (src.groupBy(F.window("ts", window, slide).alias("w"),
                        F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 money_sum(F.col("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("event_type"), F.col("n_events"),
                    F.col("total_value")))


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Session windows per user: a session ends after `gap` of inactivity.
    Streaming uses session_window state; batch is the same expression."""
    src = _watermarked(events, "ts", watermark)
    return (src.groupBy(F.session_window("ts", gap).alias("s"),
                        F.col("user_id"))
            .agg(F.count("*").alias("n_events"),
                 money_sum(F.col("value"), 2).alias("total_value"))
            .select(F.col("user_id"),
                    F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    F.col("n_events"), F.col("total_value")))


def top_users_by_activity(events: DataFrame, n: int = 20) -> DataFrame:
    """Per-user activity rollup with rank (batch analytics on the stream's
    history).

    Scale shape: the per-user aggregate is users-sized, so the final
    rank window is preceded by a partial_topk pre-cut — each physical
    partition surrenders at most n rows, making the unpartitioned
    window a constant-size (n_parts·n) stage at any user count.
    Bit-identical to the plain window for rank <= n (a row outside its
    partition's local top-n cannot rank <= n globally)."""
    from pyspark.sql import Window

    from ..plans.ranking import partial_topk
    agg = (events.groupBy("user_id")
           .agg(F.count("*").alias("n_events"),
                money_sum(F.col("value"), 2).alias("total_value"),
                F.countDistinct("event_type").alias("n_types")))
    order = [F.desc("n_events"), F.col("user_id")]
    cut = partial_topk(agg, order, n)
    w = Window.orderBy(*order)
    return (cut.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n))


def click_purchase_join(events: DataFrame, lookback: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: every purchase pairs with the same
    user's clicks in the preceding ``lookback``.

    Streaming mode: both sides are watermarked and the time-bound join
    condition lets Spark expire state — the per-key buffer never exceeds
    watermark + lookback, so state is bounded at any throughput.  Batch
    mode: the identical declarative join, which the DuckDB oracle checks
    row-for-row (gaps as exact integer microseconds)."""
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id")))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("value").alias("purchase_value")))
    if events.isStreaming:
        clicks = _watermarked(clicks, "click_ts", watermark)
        purchases = _watermarked(purchases, "purchase_ts", watermark)
    cond = ((F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts")
               >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")))
    out = (purchases.join(clicks, cond)
           .select(F.col("p_user").alias("user_id"),
                   "purchase_id", "click_id",
                   (epoch_us(F.col("purchase_ts"))
                    - epoch_us(F.col("click_ts"))).alias("gap_us")))
    # append-mode streams cannot sort; the order is for the batch oracle
    return out if events.isStreaming else out.orderBy(
        "user_id", "purchase_id", "click_id")


def funnel_counts(events: DataFrame,
                  stages: tuple = ("view", "click", "purchase")) -> DataFrame:
    """(stage, n_users): classic ordered-funnel analysis — stage i counts
    users whose first stage-i event happens at/after their first qualifying
    stage-(i-1) event (stage 0 = reached nothing).

    The three chained "first qualifying timestamp" computations are window
    mins over the same user partition, so Catalyst stacks the Window
    operators over ONE exchange on user_id; the per-user reduction then
    reuses that partitioning (no second wide shuffle of events), and the
    final stage histogram is a tiny aggregate."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    df = events.select("user_id", "event_type", "ts")
    df = df.withColumn("t1", F.min(
        F.when(F.col("event_type") == stages[0], F.col("ts"))).over(w))
    df = df.withColumn("t2", F.min(
        F.when((F.col("event_type") == stages[1])
               & (F.col("ts") >= F.col("t1")), F.col("ts"))).over(w))
    df = df.withColumn("t3", F.min(
        F.when((F.col("event_type") == stages[2])
               & (F.col("ts") >= F.col("t2")), F.col("ts"))).over(w))
    per_user = (df.groupBy("user_id")
                .agg(F.min("t1").alias("t1"), F.min("t2").alias("t2"),
                     F.min("t3").alias("t3")))
    stage = (F.when(F.col("t3").isNotNull(), 3)
             .when(F.col("t2").isNotNull(), 2)
             .when(F.col("t1").isNotNull(), 1)
             .otherwise(0)).cast("int")
    return (per_user.select(stage.alias("stage"))
            .groupBy("stage").agg(F.count("*").alias("n_users"))
            .orderBy("stage"))


def first_event_per_key(events: DataFrame, key: str = "user_id",
                        watermark: str = "2 hours") -> DataFrame:
    """One surviving event per ``key`` — streaming mode uses the built-in
    ``dropDuplicatesWithinWatermark`` (state expires past the watermark, so
    memory is O(active keys), not O(history)); batch mode keeps the exact
    earliest event (ts, then event_id tie-break).

    Streaming keeps the first-ARRIVING row per key, so stream≡batch is
    asserted on the key set (tests/test_streaming.py); the deterministic
    batch twin is the oracle-checked contract entry."""
    if events.isStreaming:
        return (_watermarked(events, "ts", watermark)
                .dropDuplicatesWithinWatermark([key]))
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy("ts", "event_id")
    return (events.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn")
            .orderBy(key))


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_day, day_offset, n_users): classic cohort retention — users
    grouped by first-seen day, counted on each subsequent active day.

    One exchange on user_id (window min = the cohort assignment), then a
    count-distinct aggregate; both partial-aggregated map-side.  At scale
    the cohort table never materializes as a separate join side."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    df = events.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
    df = df.withColumn("cohort_day", F.min("day").over(w))
    return (df.groupBy("cohort_day",
                       F.datediff(F.col("day"), F.col("cohort_day"))
                        .cast("int").alias("day_offset"))
            .agg(F.count_distinct("user_id").alias("n_users"))
            .orderBy("cohort_day", "day_offset"))


def daily_type_pivot(events: DataFrame,
                     types: tuple = ("click", "error", "purchase",
                                     "signup", "view")) -> DataFrame:
    """Daily event counts pivoted to one column per event type.

    The pivot values are EXPLICIT, so Spark skips the distinct-values
    discovery job and the whole thing is one partial-aggregated shuffle
    on day (Catalyst rewrites pivot to conditional aggregates — the same
    plan the hand-written CASE version would give)."""
    day = F.date_trunc("day", F.col("ts")).alias("day")
    return (events.groupBy(day)
            .pivot("event_type", list(types))
            .count()
            .na.fill(0, list(types))
            .orderBy("day"))


def windowed_top_users(events: DataFrame, window: str = "1 hour",
                       n: int = 3) -> DataFrame:
    """Per tumbling window, the top-``n`` users by event count (ties by
    user_id): the classic "trending keys per window" stream analytic.

    Batch mode (this definition) is the oracle-checked twin.  In streaming
    this runs as the standard two-step: the windowed groupBy is a normal
    watermarked streaming aggregation, and the per-window rank cut runs in
    ``foreachBatch`` on each emitted window (rank-within-group is not
    incrementally maintainable in append mode, so the cut belongs at the
    sink boundary — the same shape Flink's windowed Top-N uses)."""
    from pyspark.sql import Window as W

    agg = (events.groupBy(F.window("ts", window).alias("w"),
                          F.col("user_id"))
           .agg(F.count("*").alias("n_events"),
                money_sum(F.col("value"), 2).alias("total_value")))
    w = W.partitionBy("w").orderBy(F.desc("n_events"), "user_id")
    return (agg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n)
            .select(F.col("w.start").alias("window_start"),
                    F.col("rank").cast("int").alias("rank"),
                    "user_id", "n_events", "total_value"))


def active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Daily and trailing-N-day active users (the DAU/WAU dashboard):
    one row per active day with exact distinct-user counts.

    The trailing window is computed WITHOUT a range self-join: each
    distinct (user, day) row fans out map-side to the ≤ N report days it
    contributes to, then one count-distinct per day.  The fan-out factor
    is the window length — constant — so the plan is two uniform-key
    shuffles regardless of corpus size (a windowed range join would
    re-scan N days of history per report day)."""
    d = (events.select("user_id",
                       F.date_trunc("day", F.col("ts")).alias("day"))
         .distinct())
    # ONE fan-out feeds both counts: offset-0 rows are exactly the
    # distinct (user, day) set, so DAU is the i=0 slice of the same
    # aggregation that computes WAU — no second scan, no dau⋈wau join.
    # Report days with no same-day activity (n_dau = 0) are dropped,
    # matching the "per active day" contract.
    fan = (d.select(
        "user_id", "day",
        F.posexplode(F.sequence(F.lit(0), F.lit(window_days - 1)))
         .alias("__p", "i"))
        .select("user_id", "i",
                (F.col("day") + F.col("i")
                 * F.expr("interval 1 day")).alias("day")))
    return (fan.groupBy("day")
            .agg(F.count_distinct("user_id").cast("long").alias("n_wau"),
                 F.count_distinct(F.when(F.col("i") == 0,
                                         F.col("user_id")))
                  .cast("long").alias("n_dau"))
            .filter(F.col("n_dau") > 0)
            .select("day", "n_dau", "n_wau")
            .orderBy("day"))


def hourly_heatmap(events: DataFrame) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap with exact ppm shares
    (the seasonality grid capacity planning reads).  One partial-
    aggregated shuffle to the ≤ 7×24-cell grid; the share window runs on
    the grid, not the events, so the unpartitioned window is bounded by
    168 rows at any corpus size.  dow is Spark convention (1=Sunday..7)."""
    from pyspark.sql import Window

    cell = (events.groupBy(F.dayofweek("ts").alias("dow"),
                           F.hour("ts").alias("hod"))
            .agg(F.count("*").cast("long").alias("n_events")))
    total = F.sum("n_events").over(Window.partitionBy())
    return (cell.withColumn("__total", total)
            .select("dow", "hod", "n_events",
                    F.expr("(1000000 * n_events) div __total")
                     .alias("share_ppm"))
            .orderBy("dow", "hod"))


def session_histogram(events: DataFrame, gap: str = "30 minutes",
                      gap_us: int = 30 * 60 * 1_000_000) -> DataFrame:
    """Session-size distribution in power-of-two buckets: how many
    sessions have 1, 2-3, 4-7, … events, with exact min/max sizes and
    the summed session duration per bucket (duration = span from first
    to last event: session_window's end carries the +gap, subtracted
    back as exact µs).

    Unlike a global percentile (one big sort), the histogram is one
    bounded-width aggregate over the session table — the shape that
    still works when sessions number in the billions; sketch_histq is
    the quantile companion."""
    s = sessionize(events, gap=gap)
    dur = (epoch_us(F.col("session_end"))
           - epoch_us(F.col("session_start"))
           - F.lit(gap_us).cast("long"))
    bucket = F.length(F.bin(F.col("n_events"))).cast("int").alias("bucket")
    return (s.select(bucket, F.col("n_events"), dur.alias("dur_us"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_sessions"),
                 F.min("n_events").alias("min_events"),
                 F.max("n_events").alias("max_events"),
                 F.sum("dur_us").cast("long").alias("sum_duration_us"))
            .orderBy("bucket"))
