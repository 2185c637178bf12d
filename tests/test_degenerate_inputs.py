"""Degenerate-input contract: every queries() key must evaluate on a
ZERO-ROW corpus — returning an empty (or defined) frame exactly like
its DuckDB oracle would on the same empty tables — instead of raising
from internals.  tools/empty_sweep.py sweeps all keys; this module
pins the families that historically crashed (the round-7/8 ADVICE
class: k-means/IVF centroid training on an empty corpus, persisted
indexes whose zero-row partitioned writes leave nothing to infer a
schema from, null split boundaries fed into interval arithmetic).
"""
import os

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SRC = "/root/testdata/sf0.001"

# one representative per root cause + every key the r8 sweep found broken
EMPTY_PINNED = [
    # centroid training / numpy matmul on an empty corpus
    "ann_ivf", "ann_ivf_tuning", "ann_ivfpq", "ann_recall_multi",
    "ann_refine", "ann_bruteforce_np", "dedup_semantic", "emb_kmeans",
    "emb_cluster_purity", "emb_outliers", "emb_silhouette",
    # persisted-index empty build → schema-sidecar reads
    "ann_ivf_persisted", "ann_ivf_filtered", "ann_ivf_rebuild",
    "ann_ivf_stats", "ann_ivf_upsert", "ann_ivfpq_persisted",
    "store_hybrid_indexed", "store_versioned_hybrid",
    # write-then-read of zero-row partitioned parquet
    "corpus_shards", "source_partitioned",
    # null min(ts) split boundary + interval arithmetic
    "events_forecast_mae",
]


# null-payload class: one intact row + one row with every payload
# column NULL (keys stay non-null).  The ingress rule under test:
# null vectors/text don't participate (SQL aggregate null semantics)
# instead of poisoning numpy batches or driver-side collects.
NULLS_PINNED = [
    "ann_bruteforce", "ann_ivf", "ann_ivfpq_persisted", "ann_lsh",
    "dedup_embedding", "dedup_semantic", "emb_kmeans", "emb_covariance",
    "vector_search_batch", "store_hybrid_search", "store_versioned_search",
    "store_versioned_hybrid", "corpus_token_budget", "events_retention_drop",
    "retrieval_mmr", "hybrid_rrf",
]

KEY_COLS = {"doc_id", "event_id", "vec_id", "o_orderkey", "l_orderkey",
            "l_linenumber", "c_custkey", "s_suppkey", "p_partkey",
            "n_nationkey", "r_regionkey"}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(tbl.slice(0, 0), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    import pyarrow as pa

    d = tmp_path_factory.mktemp("nulls_sf")
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        first, second = tbl.slice(0, 1), tbl.slice(1, 1)
        cols = [second.column(i) if f.name in KEY_COLS
                else pa.nulls(1, f.type)
                for i, f in enumerate(tbl.schema)]
        nulled = pa.table(cols, schema=tbl.schema)
        pq.write_table(pa.concat_tables([first, nulled]),
                       str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("key", EMPTY_PINNED)
def test_key_evaluates_on_empty_corpus(spark, empty_dir, key):
    df = entry.queries()[key](spark, empty_dir)
    assert df.count() >= 0  # evaluates without raising; schema defined
    assert len(df.columns) > 0


@pytest.mark.parametrize("key", NULLS_PINNED)
def test_key_evaluates_on_null_payloads(spark, nulls_dir, key):
    df = entry.queries()[key](spark, nulls_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_dim_mismatch_raises_named_error(spark):
    """A 32-dim query against a 64-dim corpus must raise a NAMED
    dimension error on every ANN path — never numpy's opaque
    could-not-broadcast, and never zip_with's silent wrong answer
    (it pads the shorter array with nulls and ranks garbage)."""
    import pytest as _pytest

    from document_vector_pipeline_spark.operators import similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q32 = (emb.filter(F.col("vec_id") < 2)
           .select(F.col("vec_id").alias("query_id"),
                   F.slice("embedding", 1, 32).alias("query_vec")))
    for fn, marker in [
        (lambda: S.brute_force_topk(emb, q32, k=5), "dimension"),
        (lambda: S.brute_force_topk(emb, q32, k=5, use_udf=False),
         "dimensions differ"),
        (lambda: S.ivf_ann(emb, q32, k=5), "dimensions differ"),
        (lambda: S.lsh_ann(emb, q32, k=5), "dimension"),
        (lambda: S.range_search(emb, q32), "dimension"),
    ]:
        with _pytest.raises(Exception, match=marker):
            fn().count()


def test_null_text_embeds_to_null(spark):
    from document_vector_pipeline_spark.operators.embed import (
        hash_embedding_expr, make_embed_udf,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "hello world"), (1, None), (2, "")], "id long, text string")
    expr = df.select("id", hash_embedding_expr(F.col("text"), 8)
                     .alias("e")).orderBy("id").collect()
    assert expr[0]["e"] is not None
    assert expr[1]["e"] is None          # NULL text -> NULL embedding
    assert expr[2]["e"] == [0] * 8       # '' still embeds (zero vector)
    udf = df.select("id", make_embed_udf(8)(F.col("text")).alias("e")
                    ).orderBy("id").collect()
    assert udf[0]["e"] is not None
    assert udf[1]["e"] is None
    assert list(udf[2]["e"]) == [0.0] * 8
