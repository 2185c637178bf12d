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


# ---------------------------------------------------------------------------
# injectable embedding client with retry/backoff (embed_with_client)
# ---------------------------------------------------------------------------

def _hash_client(dim):
    """Per-row float32 hashing-trick client, bit-identical to the
    vectorized add_embeddings UDF (np.add.at applies in stream order)."""
    def client(texts):
        import hashlib

        import numpy as np
        out = []
        for t in texts:
            vec = np.zeros(dim, dtype=np.float32)
            for w in (t.split() if t else []):
                h = hashlib.md5(w.encode("utf-8")).hexdigest()
                b = int(h[:8], 16) % dim
                s = np.float32(1.0 if int(h[8], 16) % 2 == 0 else -1.0)
                vec[b] += s
            n = float(np.sqrt((vec.astype(np.float64) ** 2).sum()))
            if n > 0:
                # divide in float64 like the vectorized UDF's 2-D
                # mat/norms path (NEP-50: float32_array / python_float
                # would stay float32 and round differently)
                vec = (vec.astype(np.float64) / n).astype(np.float32)
            out.append([float(x) for x in vec])
        return out
    return client


def _flaky(client, status=429, fail_first_n_calls=1):
    """Fails the first attempt(s) for every distinct batch, then defers to
    `client` — worker-local state survives across retry attempts because
    the retry loop re-invokes the same deserialized closure."""
    from document_vector_pipeline_spark.operators.embed import (
        EmbeddingClientError,
    )
    seen: dict = {}

    def c(texts):
        key = tuple(texts)
        n = seen.get(key, 0)
        if n < fail_first_n_calls:
            seen[key] = n + 1
            raise EmbeddingClientError(status, "transient")
        return client(texts)
    return c


def test_embed_with_client_retries_and_matches_add_embeddings(spark,
                                                              docs_small):
    from document_vector_pipeline_spark.operators.embed import (
        embed_with_client,
    )
    df = docs_small.limit(25).select("doc_id", F.col("text"))
    via_client = embed_with_client(
        df, _flaky(_hash_client(16)), text_col="text", out_col="embedding",
        batch_size=10, max_retries=3, retry_delay_s=0.0)
    expected = add_embeddings(df, text_col="text", cfg=CFG)
    got = {r.doc_id: r.embedding
           for r in via_client.select("doc_id", "embedding").collect()}
    exp = {r.doc_id: r.embedding
           for r in expected.select("doc_id", "embedding").collect()}
    assert got == exp  # every 429 was retried AND values are bit-identical


def test_embed_with_client_gives_up_after_max_retries(spark, docs_small):
    import pytest as _pytest

    from document_vector_pipeline_spark.operators.embed import (
        embed_with_client,
    )
    df = docs_small.limit(5).select("doc_id", F.col("text"))
    always_429 = _flaky(_hash_client(16), fail_first_n_calls=10 ** 9)
    out = embed_with_client(df, always_429, text_col="text",
                            max_retries=2, retry_delay_s=0.0)
    with _pytest.raises(Exception, match="429"):
        out.collect()


def test_embed_with_client_non_retryable_fails_fast(spark, docs_small):
    import pytest as _pytest

    from document_vector_pipeline_spark.operators.embed import (
        embed_with_client,
    )
    df = docs_small.limit(5).select("doc_id", F.col("text"))
    server_err = _flaky(_hash_client(16), status=500,
                        fail_first_n_calls=10 ** 9)
    out = embed_with_client(df, server_err, text_col="text",
                            max_retries=100, retry_delay_s=0.0)
    with _pytest.raises(Exception, match="500"):
        out.collect()
