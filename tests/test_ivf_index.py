"""Persisted IVF index: exactness at full probe, pruning, recall."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.operators.similarity import (
    brute_force_topk,
)
from document_vector_pipeline_spark.store.ivf_index import IVFIndex

N_CENTROIDS = 8


@pytest.fixture(scope="module")
def index(spark, embeddings_small, tmp_path_factory):
    idx = IVFIndex(spark, str(tmp_path_factory.mktemp("ivf") / "idx"),
                   n_centroids=N_CENTROIDS)
    idx.build(embeddings_small)
    return idx


@pytest.fixture(scope="module")
def qvec(embeddings_small):
    row = embeddings_small.filter(F.col("vec_id") == 7).first()
    return [float(v) for v in row["embedding"]]


def test_full_probe_equals_brute_force(spark, index, embeddings_small, qvec):
    got = {(r["vec_id"], r["score"])
           for r in index.search(qvec, k=10, nprobe=N_CENTROIDS).collect()}
    qdf = (embeddings_small.filter(F.col("vec_id") == 7)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))
    want = {(r["vec_id"], r["score"])
            for r in brute_force_topk(embeddings_small, qdf, k=10).collect()}
    assert got == want


def test_partition_pruning_on_probed_cells(index, qvec):
    df = index.search(qvec, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan[:800]


def test_low_probe_recall_reasonable(index, embeddings_small, qvec):
    got = [r["vec_id"] for r in index.search(qvec, k=10, nprobe=3).collect()]
    qdf = (embeddings_small.filter(F.col("vec_id") == 7)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))
    want = [r["vec_id"]
            for r in brute_force_topk(embeddings_small, qdf, k=10).collect()]
    # the query's own cell is always probed, so the top hit survives
    assert want[0] in got
    assert len(set(got) & set(want)) >= 3


def test_cells_cover_corpus_exactly_once(spark, index, embeddings_small):
    cells = spark.read.parquet(index._cells)
    assert cells.count() == embeddings_small.count()
    assert cells.select("vec_id").distinct().count() == embeddings_small.count()
    assert cells.select("centroid_id").distinct().count() <= N_CENTROIDS


def test_search_many_matches_looped_search(index, embeddings_small):
    """One batch plan over one pruned cells scan must return exactly what
    the per-query search loop returns, probe set included."""
    qdf = (embeddings_small.filter(F.col("vec_id") < 4)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))
    batch = index.search_many(qdf, k=5, nprobe=2)
    got = {(r.query_id, r.rank): (r.vec_id, r.score)
           for r in batch.collect()}
    want = {}
    for q in qdf.collect():
        one = index.search([float(v) for v in q.query_vec], k=5, nprobe=2)
        for i, r in enumerate(one.collect(), start=1):
            want[(q.query_id, i)] = (r.vec_id, r.score)
    assert got == want
    plan = batch._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), "cells scan not pruned"
    assert "MapInPandas" in plan  # partial top-k below the rank window


def test_ivf_build_twins_equal(spark, tmp_path):
    """Arrow assignment must replay the argmin-fold expression exactly
    (same cells, same norms, same tie-breaks)."""
    from document_vector_pipeline_spark.store.ivf_index import IVFIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = IVFIndex(spark, str(tmp_path / "a"), n_centroids=8)
    b = IVFIndex(spark, str(tmp_path / "b"), n_centroids=8)
    a.build(emb)
    b.build(emb, use_udf=False)
    ra = sorted(tuple(r) for r in spark.read.parquet(a._cells)
                .select("vec_id", "vnorm", "centroid_id").collect())
    rb = sorted(tuple(r) for r in spark.read.parquet(b._cells)
                .select("vec_id", "vnorm", "centroid_id").collect())
    assert ra == rb and len(ra) > 0


def test_pq_adc_exhaustive_equals_pq_ann(spark, tmp_path):
    from document_vector_pipeline_spark.operators import similarity as S
    from document_vector_pipeline_spark.store.ivf_index import IVFIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    idx = IVFIndex(spark, str(tmp_path / "ivfpq"), n_centroids=4)
    idx.build(emb)
    idx.build_pq(emb)
    adc = [(r.query_id, r.rank, r.vec_id, r.score) for r in
           idx.search_many_adc(q, k=10, nprobe=4)
           .orderBy("query_id", "rank").collect()]
    pq = [(r.query_id, r.rank, r.vec_id, r.score) for r in
          S.pq_ann(emb, q, k=10).orderBy("query_id", "rank").collect()]
    assert adc == pq


def test_pq_adc_low_nprobe_prunes_partitions(spark, tmp_path):
    from document_vector_pipeline_spark.store.ivf_index import IVFIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") < 2)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    idx = IVFIndex(spark, str(tmp_path / "ivfpq2"), n_centroids=4)
    idx.build(emb)
    idx.build_pq(emb)
    out = idx.search_many_adc(q, k=5, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # every result row sits in a cell its query probed
    probed = {qid: set(idx._probe_ids(
        [float(v) for v in r], 1))
        for qid, r in ((x.query_id, x.query_vec) for x in q.collect())}
    cells = {r.vec_id: r.centroid_id for r in
             spark.read.parquet(idx._cells)
             .select("vec_id", "centroid_id").collect()}
    for r in out.collect():
        assert cells[r.vec_id] in probed[r.query_id]
