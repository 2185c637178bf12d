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

    Plan: distinct (group, hash) — one partial-combined shuffle — then a
    per-group window keeps the k minima (reducers never hold more than a
    group's distinct hashes; with pre-aggregation enabled Spark combines
    map-side so the shuffle carries at most k·partitions rows per group
    in the sketch-merge variant).  Estimate arithmetic is all-double over
    exact integer hashes: bit-identical at any parallelism."""
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
