"""Embedding generation.

The reference calls Azure OpenAI text-embedding with Dimensions=1536 in
batches of 10 with retry/backoff (BlobTriggerFunction.cs:118-160).  That
service isn't available here, so the engine ships a deterministic
hashing-trick embedder with two implementations:

1. `hash_embedding_expr` — pure built-in expression (md5 bucket + sign per
   token, scatter-summed into a dim-length int vector).  Exactly
   reproducible in the DuckDB oracle; used by the correctness queries.
2. `add_embeddings` — Arrow-batched pandas UDF with numpy scatter-add +
   L2 normalization.  This is the production hot path (vectorized, ~100×
   row-UDF) and the seam where a real model/service call would go: the
   UDF receives whole Arrow batches, mirroring the reference's batched
   REST calls (MaxBatchSize=10, MaxDegreeOfParallelism=50 — Spark's task
   parallelism replaces the manual Parallel.ForEachAsync).

Both agree: normalize(hash_embedding_expr(t)) == add_embeddings(t) (tested).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from document_vector_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig
from document_vector_pipeline_spark.functions.expr import bound
from document_vector_pipeline_spark.functions.hashing import token_bucket, token_sign


def hash_embedding_expr(text: Column, dim: int) -> Column:
    """Unnormalized hashing-trick embedding as array<int> (exact arithmetic,
    oracle-reproducible): for each whitespace token t,
    vec[md5_32(t) % dim] += sign(md5 hex digit 9 of t)."""
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit(""))
    pairs = F.transform(words, lambda w: F.struct(
        token_bucket(w, dim).alias("b"), token_sign(w).alias("s")))
    # bind the (bucket, sign) pairs once: inlining them in the per-bucket
    # lambda would re-split and re-hash the text dim times per row.
    # NULL text embeds to NULL (not an array of null components, which
    # the bare aggregate would produce) — downstream vector operators
    # drop null vectors at ingress.
    return F.when(text.isNotNull(), bound(
        pairs,
        lambda ps: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda b: F.aggregate(
                ps, F.lit(0),
                lambda acc, p: acc + F.when(p["b"] == b, p["s"]).otherwise(0)))))


def make_embed_udf(dim: int):
    """Build the Arrow-batched embedder UDF.

    The whole implementation lives inside this closure (with local imports)
    so cloudpickle serializes it BY VALUE: executor Python workers don't
    need this package importable — exactly like a real cluster where the
    repo isn't on every worker's PYTHONPATH.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        import hashlib as _hashlib
        import itertools as _it

        import numpy as _np
        import pandas as _pd

        # token -> (bucket, sign) memo: real corpora follow Zipf, so the
        # md5 cost collapses to ~one hash per DISTINCT token per worker
        memo: dict[str, tuple[int, float]] = {}

        def tok(w: str) -> tuple[int, float]:
            bs = memo.get(w)
            if bs is None:
                h = _hashlib.md5(w.encode("utf-8")).hexdigest()
                bs = (int(h[:8], 16) % dim,
                      1.0 if int(h[8], 16) % 2 == 0 else -1.0)
                if len(memo) < 1_000_000:
                    memo[w] = bs
            return bs

        # Whole-batch vectorized path: one flat token stream for the Arrow
        # batch, md5 only per DISTINCT token (factorize), one np.add.at
        # scatter for every (row, bucket) update.  add.at applies updates
        # in stream order, so the float32 accumulation is bit-identical to
        # the per-row loop it replaces.
        lists = [t.split() if t else [] for t in texts]
        n_rows = len(lists)
        mat = _np.zeros((n_rows, dim), dtype=_np.float32)
        flat = _np.array(list(_it.chain.from_iterable(lists)), dtype=object)
        if flat.size:
            lens = _np.fromiter((len(x) for x in lists), dtype=_np.int64,
                                count=n_rows)
            rows = _np.repeat(_np.arange(n_rows), lens)
            codes, uniques = _pd.factorize(flat)
            bs = [tok(w) for w in uniques]
            buckets = _np.fromiter((b for b, _ in bs), dtype=_np.int64,
                                   count=len(bs))
            signs = _np.fromiter((s for _, s in bs), dtype=_np.float32,
                                 count=len(bs))
            _np.add.at(mat, (rows, buckets[codes]), signs[codes])
        # norms in float64, matching float(np.linalg.norm(vec)) per row
        norms = _np.sqrt((mat.astype(_np.float64) ** 2).sum(axis=1))
        nz = norms > 0
        mat[nz] = (mat[nz] / norms[nz, None]).astype(_np.float32)
        # NULL text embeds to NULL ('' still embeds to the zero vector)
        return _pd.Series([None if t is None else v
                           for t, v in zip(texts, mat)])

    return embed


def add_embeddings(chunks: DataFrame, text_col: str = "chunk_text",
                   out_col: str = "embedding",
                   cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Append an L2-normalized embedding column (array<float>, cfg dims)."""
    embed = make_embed_udf(cfg.embedding_dimensions)
    return chunks.withColumn(out_col, embed(F.col(text_col)))


# Statuses the reference treats as transient (TooManyRequests and the
# token-expiry Unauthorized): BlobTriggerFunction.cs:142-156.
DEFAULT_RETRY_STATUSES = (429, 401)


class EmbeddingClientError(Exception):
    """Raised by an embedding client callable; ``status_code`` decides
    retryability (the HTTP status of the failed REST call)."""

    def __init__(self, status_code: int, message: str = ""):
        super().__init__(f"embedding client error {status_code}: {message}")
        self.status_code = status_code


def embed_with_client(chunks: DataFrame, client,
                      text_col: str = "chunk_text",
                      out_col: str = "embedding",
                      batch_size: int = 10,
                      max_retries: int = 100,
                      retry_delay_s: float = 10.0,
                      retry_on=DEFAULT_RETRY_STATUSES) -> DataFrame:
    """Embed via an injectable service client with the reference's batching
    and retry policy (BlobTriggerFunction.cs:118-160: MaxBatchSize=10,
    MaxRetryCount=100, 10 s delay on 429/401; Spark task parallelism
    replaces MaxDegreeOfParallelism=50).

    ``client`` is any ``Callable[[list[str]], list[list[float]]]`` — the
    seam where the real REST embedding call goes.  It is cloudpickled BY
    VALUE to executor Python workers, so construct network connections
    lazily INSIDE the callable (first call), never at closure-build time
    on the driver.  A call that raises :class:`EmbeddingClientError` with
    a status in ``retry_on`` is retried up to ``max_retries`` times with
    ``retry_delay_s`` between attempts; any other status (or exhaustion)
    propagates and fails the task — Spark's task retry then provides the
    outer layer, exactly like the reference's function-host retry.

    Plan shape: one mapInPandas stage — map-only, no shuffle; each Arrow
    batch is sliced into ``batch_size`` REST-call-sized groups, mirroring
    the reference's GetEmbeddingsBatchWithRetryAsync loop."""
    import time

    from pyspark.sql import types as T

    schema = T.StructType(
        list(chunks.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))])

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            texts = pdf[text_col].tolist()
            vecs: list[list[float]] = []
            for s in range(0, len(texts), batch_size):
                group = texts[s:s + batch_size]
                attempt = 0
                while True:
                    try:
                        got = client(group)
                        break
                    except Exception as e:
                        # duck-typed (any exception carrying a
                        # status_code, not just EmbeddingClientError) so
                        # this closure serializes BY VALUE with no
                        # reference to this package — executor workers
                        # don't need the repo importable, same philosophy
                        # as make_embed_udf
                        status = getattr(e, "status_code", None)
                        if (status not in retry_on
                                or attempt >= max_retries):
                            raise
                        attempt += 1
                        if retry_delay_s:
                            time.sleep(retry_delay_s)
                if len(got) != len(group):
                    raise ValueError(
                        f"embedding client returned {len(got)} vectors "
                        f"for a batch of {len(group)} texts")
                vecs.extend(got)
            out = pdf.copy()
            out[out_col] = [[float(x) for x in v] for v in vecs]
            yield out

    return chunks.mapInPandas(run, schema)
