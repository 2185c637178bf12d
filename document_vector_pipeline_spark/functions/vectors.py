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

from document_vector_pipeline_spark.functions.expr import bound


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; 0.0 for zero vectors.

    Mismatched dimensions raise a NAMED error per row instead of the
    silent wrong answer zip_with would give (it pads the shorter array
    with nulls, so a 32-dim query against a 64-dim corpus 'works' and
    ranks garbage).  Null vectors pass through as null — the ingress
    rule (operators/similarity._live_vectors) is where they drop."""
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    denom = l2_norm(ad) * l2_norm(bd)
    return F.when(
        F.size(a) != F.size(b),
        F.raise_error(F.concat(
            F.lit("cosine_similarity: vector dimensions differ ("),
            F.size(a).cast("string"), F.lit(" vs "),
            F.size(b).cast("string"), F.lit(")")))
    ).when(denom == 0, F.lit(0.0)).otherwise(dot(ad, bd) / denom)


def normalize(a: Column) -> Column:
    """L2-normalize (zero vectors pass through).  Both the doubled array
    and its norm are bound once — inlining the norm in the per-element
    lambda would make this O(dim²) per row (see functions/expr.py)."""
    ad = F.transform(a, lambda v: v.cast("double"))
    return bound(ad, lambda v: bound(
        l2_norm(v),
        lambda n: F.when(n == 0, v)
                   .otherwise(F.transform(v, lambda x: x / n))))


def quantize_int8(a: Column, scale: float = 127.0) -> Column:
    """QuantizedFlat-style scalar quantization of a unit-normalized vector:
    clamp(round(v/||a||*scale)) into int8 range (stored as array<tinyint>).

    The norm is bound ONCE through a single-element outer transform —
    naively inlining `l2_norm(a)` inside the per-element lambda makes the
    expression O(dim²) per row (catastrophic at dims=1536), because HOF
    lambdas defeat common-subexpression elimination."""
    ad = F.transform(a, lambda v: v.cast("double"))
    return F.element_at(
        F.transform(
            F.array(l2_norm(ad)),
            lambda n: F.transform(
                ad,
                lambda v: F.greatest(
                    F.lit(-127.0),
                    F.least(F.lit(127.0),
                            F.round(F.when(n == 0, v).otherwise(v / n)
                                    * scale, 0)))
                .cast("tinyint"))),
        1)


def dequantize_int8(q: Column, scale: float = 127.0) -> Column:
    return F.transform(q, lambda v: v.cast("double") / F.lit(scale))


def py_round_half_up(x: float) -> float:
    """Python mirror of Spark's Round(double, 0): HALF_UP on the shortest
    decimal repr (BigDecimal.valueOf semantics — python repr() produces the
    same shortest string)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1"),
                                           rounding=ROUND_HALF_UP))


def py_quantize_int8(vec: list[float], scale: float = 127.0) -> list[int]:
    """Python mirror of quantize_int8 for literal query vectors (value-
    identical to the column expression — tested)."""
    import math

    n = math.sqrt(sum(v * v for v in vec))
    out = []
    for v in vec:
        x = (v if n == 0 else v / n) * scale
        out.append(int(max(-127.0, min(127.0, py_round_half_up(x)))))
    return out


def vector_to_json(a: Column) -> Column:
    """Embedding JSON round-trip (AzureSQL stores VECTOR columns from a JSON
    array string — AzureSQL BlobTriggerFunction.cs:134, Document.cs)."""
    return F.to_json(a)


def vector_from_json(s: Column) -> Column:
    return F.from_json(s, "array<float>")


def py_round6_np(arr):
    """Vectorized mirror of Spark's Round(double, 6) over a numpy array.

    Spark rounds HALF_UP on the SHORTEST decimal repr of the double
    (BigDecimal.valueOf).  The vectorized floor-trick
    sign·floor(|x|·1e6 + 0.5) agrees with that everywhere except when
    |x|·1e6 sits within an ulp-band of a .5 tie — any value whose
    shortest repr ends in a 7th-digit 5 lands in that band — so entries
    inside the band are re-rounded exactly via the Decimal(repr) path.
    The band is empirically empty for cosine quotients; the fallback is
    correctness insurance, not a hot path.
    """
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    a = np.asarray(arr, dtype=np.float64)
    scaled = np.abs(a) * 1e6
    flo = np.floor(scaled)
    out = np.sign(a) * np.floor(scaled + 0.5) / 1e6
    sus = np.nonzero(np.abs(scaled - flo - 0.5) < 1e-6)[0]
    for i in sus:
        out[i] = float(Decimal(repr(float(a[i])))
                       .quantize(Decimal("0.000001"),
                                 rounding=ROUND_HALF_UP))
    return out
