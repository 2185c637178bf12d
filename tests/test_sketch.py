"""KMV sketch: exact below k, within theory error above k, mergeable."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_vector_pipeline_spark.operators.sketch import kmv_distinct


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], ["g", "v"])
    row = kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["estimate"] == 10.0


def test_estimate_above_k(spark):
    n = 2000
    df = spark.createDataFrame([("a", i) for i in range(n)], ["g", "v"])
    row = kmv_distinct(df, "g", "v", k=64).collect()[0]
    # rel error ~ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    assert abs(row["estimate"] - n) / n < 0.51
    assert row["n_kept"] == 64


def test_partition_invariance(spark):
    df = spark.createDataFrame([("a", i) for i in range(500)], ["g", "v"])
    e1 = kmv_distinct(df.repartition(1), "g", "v").collect()[0]["estimate"]
    e2 = kmv_distinct(df.repartition(13), "g", "v").collect()[0]["estimate"]
    assert e1 == e2


def test_set_ops_exact_below_k(spark):
    from document_vector_pipeline_spark.operators.sketch import kmv_set_ops
    rows = ([("a", v) for v in range(10)]          # A = {0..9}
            + [("b", v) for v in range(5, 15)]     # B = {5..14}
            + [("c", 99)])                         # ignored group
    df = spark.createDataFrame(rows, ["g", "v"])
    r = kmv_set_ops(df, "g", "v", "a", "b", k=64).collect()[0]
    assert (r.n_a, r.n_b, r.n_union_kept, r.common) == (10, 10, 15, 5)
    assert (r.est_a, r.est_b) == (10.0, 10.0)
    assert (r.est_union, r.est_intersection) == (15.0, 5.0)


def test_set_ops_estimate_above_k(spark):
    from document_vector_pipeline_spark.operators.sketch import kmv_set_ops
    rows = ([("a", v) for v in range(1000)]
            + [("b", v) for v in range(500, 1500)])
    df = spark.createDataFrame(rows, ["g", "v"])
    r = kmv_set_ops(df, "g", "v", "a", "b", k=64).collect()[0]
    assert abs(r.est_union - 1500) / 1500 < 0.51      # 4 sigma at k=64
    assert 0 < r.est_intersection < 1500


def test_cms_estimate_dominates_exact_and_is_partition_invariant(spark):
    from document_vector_pipeline_spark.sources import load_table

    from document_vector_pipeline_spark.operators.sketch import (
        cms_heavy_hitters,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    a = cms_heavy_hitters(ev, "user_id", depth=4, width=64, k=10)
    rows = a.collect()
    assert len(rows) == 10
    assert all(r.estimate >= r.exact for r in rows)  # CMS never undercounts
    b = cms_heavy_hitters(ev.repartition(7), "user_id",
                          depth=4, width=64, k=10).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in b]  # mergeable


def test_histogram_quantiles_partition_invariant_and_ordered(spark):
    from document_vector_pipeline_spark.operators.sketch import (
        histogram_quantiles,
    )
    from document_vector_pipeline_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    a = histogram_quantiles(ev, "event_type", "value").collect()
    b = histogram_quantiles(ev.repartition(9), "event_type",
                            "value").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # mergeable
    by_grp = {}
    for r in a:
        by_grp.setdefault(r.event_type, []).append((r.q, r.bucket))
    for pairs in by_grp.values():
        qs, buckets = zip(*sorted(pairs))
        assert list(buckets) == sorted(buckets)  # monotone in q


def test_hll_accuracy_and_merge_shape(spark):
    """HLL estimate within ~5 σ (σ≈1.04/√m ≈ 1.6%) of exact on the real
    events table, and the register aggregate partial-combines (max is
    mergeable: same result at any parallelism)."""
    from document_vector_pipeline_spark.operators import sketch as SK
    from document_vector_pipeline_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    out = {r.event_type: r for r in
           SK.hll_distinct(ev, "event_type", "event_id", p=6).collect()}
    assert len(out) == 5
    for r in out.values():
        # m=64 -> sigma ~ 1.04/8 = 13%; 4 sigma
        assert r.rel_err < 0.52
        assert 0 < r.n_used <= r.m
    # repartitioning must not change a single output value
    again = {r.event_type: r for r in
             SK.hll_distinct(ev.repartition(13), "event_type",
                             "event_id", p=6).collect()}
    for k in out:
        assert out[k].s_scaled == again[k].s_scaled
        assert out[k].estimate == again[k].estimate
