"""Embedder: pandas-UDF fast path agrees with the exact built-in expression;
vector function sanity."""

import math

import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.config import PipelineConfig
from document_vector_pipeline_spark.functions.vectors import (
    cosine_similarity,
    quantize_int8,
    vector_from_json,
    vector_to_json,
)
from document_vector_pipeline_spark.operators.embed import (
    add_embeddings,
    hash_embedding_expr,
)

CFG = PipelineConfig(embedding_dimensions=16)


def test_udf_matches_exact_expression(spark, docs_small):
    df = (docs_small.limit(50)
          .withColumn("exact", hash_embedding_expr(F.col("text"), 16)))
    df = add_embeddings(df, text_col="text", out_col="fast", cfg=CFG)
    rows = df.select("doc_id", "exact", "fast").collect()
    assert rows
    for r in rows:
        norm = math.sqrt(sum(v * v for v in r.exact))
        expect = [v / norm if norm else 0.0 for v in r.exact]
        assert r.fast == pytest.approx(expect, abs=1e-6)


def test_embedding_is_unit_norm(spark, docs_small):
    df = add_embeddings(docs_small.limit(20), text_col="text", cfg=CFG)
    for r in df.select("embedding").collect():
        assert sum(v * v for v in r.embedding) == pytest.approx(1.0, abs=1e-5)


def test_cosine_and_quantize(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a array<float>, b array<float>")
    got = df.select(F.round(cosine_similarity("a", "b"), 6).alias("c")).collect()
    assert [r.c for r in got] == [0.0, 1.0]
    q = df.select(quantize_int8("a").alias("q")).collect()
    assert q[1].q == [90, 90]  # 0.7071*127 rounded


def test_embedding_json_roundtrip(spark):
    df = spark.createDataFrame([([0.5, -1.5, 2.0],)], "v array<float>")
    back = df.select(vector_from_json(vector_to_json(F.col("v"))).alias("v2")).first()
    assert back.v2 == [0.5, -1.5, 2.0]
