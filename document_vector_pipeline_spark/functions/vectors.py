"""Vector math as column expressions over array<float|double>.

Used by the vector store's cosine top-k search (parity with the reference's
CosmosDB vector index: cosine distance, QuantizedFlat int8 quantization —
CosmosDBClientWrapper.cs:117-146) and by the ANN / near-dup operators.

All JVM-side (zip_with/aggregate/transform); the brute-force ANN operator
also has a numpy pandas-UDF fast path in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; 0.0 for zero vectors."""
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    denom = l2_norm(ad) * l2_norm(bd)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(ad, bd) / denom)


def normalize(a: Column) -> Column:
    n = l2_norm(F.transform(a, lambda v: v.cast("double")))
    return F.when(n == 0, F.transform(a, lambda v: v.cast("double")))\
            .otherwise(F.transform(a, lambda v: v.cast("double") / n))


def quantize_int8(a: Column, scale: float = 127.0) -> Column:
    """QuantizedFlat-style scalar quantization of a unit-normalized vector:
    clamp(round(v*scale)) into int8 range (stored as array<tinyint>)."""
    return F.transform(
        normalize(a),
        lambda v: F.greatest(F.lit(-127.0),
                             F.least(F.lit(127.0), F.round(v * scale, 0)))
                   .cast("tinyint"))


def dequantize_int8(q: Column, scale: float = 127.0) -> Column:
    return F.transform(q, lambda v: v.cast("double") / F.lit(scale))


def vector_to_json(a: Column) -> Column:
    """Embedding JSON round-trip (AzureSQL stores VECTOR columns from a JSON
    array string — AzureSQL BlobTriggerFunction.cs:134, Document.cs)."""
    return F.to_json(a)


def vector_from_json(s: Column) -> Column:
    return F.from_json(s, "array<float>")
