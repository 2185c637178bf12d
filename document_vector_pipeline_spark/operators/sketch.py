"""Sketch operators for 100 TB-scale cardinality work.

Spark's built-ins (`approx_count_distinct`, `percentile_approx`) are the
production path but their HLL/KLL internals aren't reproducible in another
engine.  The KMV (k-minimum-values) sketch here is: it is a pure function
of the md5 hash values, so the DuckDB oracle computes the *identical*
estimate — the correctness gate covers the sketch math itself, not just
row counts.

KMV recap: hash every element uniformly into [0, 2^60); keep the k
smallest distinct hashes.  If fewer than k distinct hashes exist the count
is exact; otherwise the k-th minimum h_k estimates the density and
(k-1) * 2^60 / h_k estimates the distinct count (unbiased, rel. error
≈ 1/sqrt(k-2)).  Mergeable: union the hash sets and re-take the k minima —
the partial-aggregate shape Spark needs (the groupBy below IS the merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.hashing import md5_long

HASH_SPACE = float(1 << 60)


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """(group, n_kept, h_k, estimate): KMV distinct-count estimate of
    ``value_col`` per ``group_col``.

    Plan: distinct (group, hash) — one partial-combined shuffle — then
    the k minima per group.  The ``rank <= k`` filter on a PARTITIONED
    window triggers Spark's rank-limit pushdown (SPARK-37099:
    ``WindowGroupLimit Partial`` runs map-side BEFORE the exchange),
    so each reducer group receives ≤ n_partitions·k survivors, never a
    group's full distinct-hash set — scale-safe natively, no manual
    pre-cut needed (unpartitioned windows get no such pushdown; those
    use plans/ranking.partial_topk).  Estimate arithmetic is
    all-double over exact integer hashes: bit-identical at any
    parallelism."""
    h = md5_long(F.col(value_col).cast("string"))
    hashes = (df.select(F.col(group_col).alias("grp"), h.alias("h"))
              .distinct())
    w = Window.partitionBy("grp").orderBy("h")
    kept = (hashes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k))
    agg = (kept.groupBy("grp")
           .agg(F.count("*").alias("n_kept"), F.max("h").alias("h_k")))
    est = (F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
           .otherwise((k - 1) * HASH_SPACE / F.col("h_k")))
    return (agg.select(F.col("grp").alias(group_col), "n_kept", "h_k",
                       F.round(est, 4).alias("estimate"))
            .orderBy(group_col))


def kmv_set_ops(df: DataFrame, group_col: str, value_col: str,
                group_a: str, group_b: str, k: int = 64) -> DataFrame:
    """One row of KMV set-operation estimates between the ``value_col``
    sets of two groups: distinct counts of A, B, A∪B and A∩B.

    Union sketch = k minima of K_A ∪ K_B; intersection via the Jaccard
    estimator m/|K_U| over the union sketch (m = union-sketch hashes
    present in BOTH per-group sketches), scaled by the union estimate.
    Below k everything degrades to exact counts (m IS |A∩B| then).
    Mergeable by construction — the same composition works per-partition
    then re-merged, which is what a 1000-executor rollup needs.  All
    arithmetic is double-over-exact-integers: the DuckDB oracle computes
    the identical estimates."""
    kept = (df.filter(F.col(group_col).isin(group_a, group_b))
            .select(F.col(group_col).alias("grp"),
                    md5_long(F.col(value_col).cast("string")).alias("h"))
            .distinct())
    # per-group k-min: the rank<=k filter on the partitioned window
    # triggers WindowGroupLimit's map-side partial cut (see
    # kmv_distinct) — bounded reducer input without a manual pre-cut
    w = Window.partitionBy("grp").orderBy("h")
    kept = (kept.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))

    def est(n_col: Column, hk_col: Column) -> Column:
        return F.round(
            F.when(n_col < k, n_col.cast("double"))
             .otherwise((k - 1) * HASH_SPACE / hk_col), 4)

    per = (kept.groupBy("grp")
           .agg(F.count("*").alias("n"), F.max("h").alias("hk")))
    est_a = per.filter(F.col("grp") == group_a).select(
        F.col("n").alias("n_a"), est(F.col("n"), F.col("hk")).alias("est_a"))
    est_b = per.filter(F.col("grp") == group_b).select(
        F.col("n").alias("n_b"), est(F.col("n"), F.col("hk")).alias("est_b"))

    flags = (kept.groupBy("h")
             .agg(F.max(F.col("grp") == group_a).alias("in_a"),
                  F.max(F.col("grp") == group_b).alias("in_b")))
    wu = Window.orderBy("h")
    union_k = (flags.withColumn("__rn", F.row_number().over(wu))
               .filter(F.col("__rn") <= k))
    uni = (union_k.agg(
        F.count("*").alias("n_union_kept"),
        F.max("h").alias("hk_u"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("common"))
        .withColumn("est_union",
                    est(F.col("n_union_kept"), F.col("hk_u")))
        .withColumn("est_intersection",
                    F.round(F.col("common") / F.col("n_union_kept")
                            * F.col("est_union"), 4)))
    return (uni.crossJoin(est_a).crossJoin(est_b)
            .select("n_a", "n_b", "n_union_kept", "common",
                    "est_a", "est_b", "est_union", "est_intersection"))


def cms_heavy_hitters(df: DataFrame, value_col: str, depth: int = 4,
                      width: int = 256, k: int = 20) -> DataFrame:
    """(value, exact, estimate, rank): count-min-sketch heavy hitters.

    Sketch build is the scale story: each row hashes into `depth` (row,
    bucket) cells, and the groupBy on (row, bucket) partial-aggregates
    map-side to at most depth x width rows PER TASK — the shuffle carries a
    fixed-size sketch per partition no matter how many input rows, which
    is exactly the mergeability argument (cell counts add).  Estimates
    (min over rows of the hashed cell, >= true count always) use the same
    md5 family as MinHash, so the DuckDB oracle rebuilds the identical
    sketch; the exact count rides along to expose the overestimate.

    The candidate set here is the exact per-key aggregate (fine for
    grading; at 100 TB you'd track candidates with a per-partition top-m
    and merge, the sketch itself never changes)."""
    from document_vector_pipeline_spark.functions.hashing import md5_long_seeded

    v = df.select(F.col(value_col).cast("string").alias("v"))

    def bucket(r: int) -> Column:
        return (md5_long_seeded(F.col("v"), seed=r) % width).cast("int")

    coords = F.array(*[
        F.struct(F.lit(r).alias("r"), bucket(r).alias("b"))
        for r in range(depth)])
    cells = (v.select(F.explode(coords).alias("rb"))
             .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
             .agg(F.count("*").alias("c")))
    cand = (v.groupBy("v").agg(F.count("*").alias("exact"))
            .select("v", "exact", F.explode(coords).alias("rb"))
            .select("v", "exact", F.col("rb.r").alias("r"),
                    F.col("rb.b").alias("b")))
    est = (cand.join(F.broadcast(cells), ["r", "b"])
           .groupBy("v", "exact")
           .agg(F.min("c").alias("estimate")))
    from document_vector_pipeline_spark.plans.ranking import partial_topk

    # distinct-values-sized frame: partial top-k pre-cut bounds the
    # global rank window (lossless for rank<=k)
    est = partial_topk(est, [F.desc("estimate"), F.col("v")], k)
    w = Window.orderBy(F.desc("estimate"), F.col("v"))
    return (est.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("v").alias("value"), "exact", "estimate", "rank"))


def histogram_quantiles(df: DataFrame, group_col: str, value_col: str,
                        quantiles: tuple = (0.5, 0.9, 0.99)) -> DataFrame:
    """(group, q, n, bucket, upper): mergeable histogram-quantile sketch.

    Values become exact integer cents, bucketed by bit length (the same
    power-of-two binning as corpus length_histogram), so per-group state is
    a <=64-cell histogram — counts add, so the sketch merges across any
    partitioning; one partial-aggregated shuffle builds it no matter the
    input size.  The quantile estimate is the smallest bucket whose
    cumulative count reaches ceil(q*n), reported with its inclusive upper
    edge ((2^bucket - 1) cents) — a deterministic integer answer both
    engines compute identically, unlike t-digest/KLL internals.  Exact
    rank-selected percentiles live in events_percentiles; this is the
    fixed-memory scale path."""
    cents = F.round(F.col(value_col).cast("double") * 100, 0).cast("long")
    bucket = F.length(F.bin(cents)).cast("int").alias("bucket")
    hist = (df.select(F.col(group_col).alias("grp"), bucket)
            .groupBy("grp", "bucket").agg(F.count("*").alias("c")))
    w = Window.partitionBy("grp").orderBy("bucket")
    cum = (hist.withColumn("cum", F.sum("c").over(w))
           .withColumn("n", F.sum("c").over(Window.partitionBy("grp"))))
    qs = F.explode(F.array(*[F.lit(q) for q in quantiles])).alias("q")
    hit = (cum.select("grp", "bucket", "cum", "n", qs)
           .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n"))))
    return (hit.groupBy("grp", "q", "n").agg(F.min("bucket").alias("bucket"))
            .select(F.col("grp").alias(group_col), "q", "n", "bucket",
                    ((F.pow(F.lit(2.0), F.col("bucket")) - 1) / 100.0)
                     .alias("upper"))
            .orderBy(group_col, "q"))


def kmv_windowed(events: DataFrame, ts_col: str = "ts",
                 value_col: str = "user_id", k: int = 64) -> DataFrame:
    """Per-hour distinct-count estimation from the mergeable KMV sketch,
    with the exact distinct and the measured relative error alongside:
    (window_start, n_kept, h_k, estimate, exact, rel_err).

    The windowed-cardinality dashboard ("distinct users per hour"): at
    100 TB the sketch side shuffles at most k minima per (window, map
    task) thanks to partial aggregation, while the exact side shuffles
    every distinct (window, user) pair once — emitting both makes that
    tradeoff measurable per window, the same ship-with-the-metric idea
    as ann_recall.  All sketch arithmetic is a pure function of the md5
    hashes, so the estimate itself is oracle-exact."""
    base = events.select(
        F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
        F.col(value_col))
    sk = kmv_distinct(base, "window_start", value_col, k)
    exact = (base.groupBy("window_start")
             .agg(F.count_distinct(value_col).cast("long").alias("exact")))
    return (sk.join(exact, "window_start")
            .select("window_start", "n_kept", "h_k", "estimate", "exact",
                    F.round(F.abs(F.col("estimate") - F.col("exact"))
                            / F.col("exact"), 6).alias("rel_err"))
            .orderBy("window_start"))


def hll_distinct(df: DataFrame, group_col: str, value_col: str,
                 p: int = 12) -> DataFrame:
    """(group, m, n_used, s_scaled, estimate, exact, rel_err):
    HyperLogLog distinct-count estimate per group, register math in
    exact integers (Flajolet et al. 2007).

    The md5 hash splits into a register index (low ``p`` bits) and a
    60-p bit suffix whose leading-zero count (+1) is the register rank;
    the harmonic-mean denominator Σ 2^-M_j is carried as the EXACT
    integer Σ 2^(49-M_j) (absent registers contribute 2^49; max
    4096·2^49 < 2^62), so the only float op is the final single
    division by the alpha·m²·2^49 literal — bit-identical across
    engines, same double-over-exact-integers contract as KMV.

    Scale shape: one partial-aggregated shuffle to (group, register)
    max-rank — at most m rows per group per map task leave each
    partition, the textbook mergeability argument (max commutes with
    any partitioning).  The exact count rides along to expose the
    measured error, as in kmv_windowed.

    Only the RAW estimator is emitted: below n ≈ 2.5m the spec switches
    to linear counting m·ln(m/V), whose ln() is not bit-reproducible
    across engines — callers in that regime should size p down (the
    contract query uses p=6) or use kmv_distinct, which is exact below
    k by construction."""
    m = 1 << p
    rest = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(1 << (rest + 1))
    h = md5_long(F.col(value_col).cast("string"))
    reg = h.bitwiseAND(m - 1).cast("int")
    w = F.shiftright(h, p)
    rho = (F.when(w == 0, F.lit(rest + 1))
           .otherwise(F.lit(rest + 1) - F.length(F.bin(w)))).cast("int")
    regs = (df.select(F.col(group_col).alias("grp"), reg.alias("reg"),
                      rho.alias("rho"))
            .groupBy("grp", "reg").agg(F.max("rho").alias("mx")))
    s = (regs.groupBy("grp")
         .agg(F.count("*").alias("n_used"),
              F.sum(F.expr(f"shiftleft(cast(1 as bigint), {rest + 1} - mx)"))
               .alias("s_present")))
    s = s.withColumn(
        "s_scaled",
        F.col("s_present")
        + (F.lit(m).cast("long") - F.col("n_used"))
        * F.lit(1 << (rest + 1)).cast("long"))
    exact = (df.groupBy(F.col(group_col).alias("grp"))
             .agg(F.count_distinct(F.col(value_col)).cast("long")
                  .alias("exact")))
    return (s.join(exact, "grp")
            .select(F.col("grp").alias(group_col),
                    F.lit(m).cast("int").alias("m"),
                    F.col("n_used").cast("long").alias("n_used"),
                    "s_scaled",
                    F.round(F.lit(num) / F.col("s_scaled"), 4)
                     .alias("estimate"),
                    "exact",
                    F.round(F.abs(F.lit(num) / F.col("s_scaled")
                                  - F.col("exact")) / F.col("exact"), 6)
                     .alias("rel_err"))
            .orderBy(group_col))
