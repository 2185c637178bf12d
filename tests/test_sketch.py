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
