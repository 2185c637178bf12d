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


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_upsert_after_delete_equals_fresh_build(spark, embeddings_small,
                                                tmp_path):
    """search on (build full → delete 10% → re-upsert half of them) must
    equal a fresh build over the merged corpus — the incremental path is
    invisible to readers."""
    emb = embeddings_small
    final = emb.filter((F.col("vec_id") % 10 != 0)
                       | (F.col("vec_id") % 20 == 0))
    qdf = (emb.filter(F.col("vec_id") < 5)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))

    inc = IVFIndex(spark, str(tmp_path / "inc"), n_centroids=N_CENTROIDS)
    inc.build(emb)
    inc.delete(emb.filter(F.col("vec_id") % 10 == 0).select("vec_id"))
    inc.upsert(emb.filter(F.col("vec_id") % 20 == 0))

    # exhaustive probe == brute force over exactly the surviving corpus
    got = inc.search_many(qdf, k=10, nprobe=N_CENTROIDS)
    want = brute_force_topk(final, qdf, k=10)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_upsert_moves_vector_across_cells(spark, embeddings_small, tmp_path):
    """Replacing an id with a different vector must relocate it to its new
    cell and leave no stale copy in the old one."""
    emb = embeddings_small
    idx = IVFIndex(spark, str(tmp_path / "mv"), n_centroids=N_CENTROIDS)
    idx.build(emb)
    # replace vec 7 with the embedding of vec 200 (different cell, usually)
    donor = emb.filter(F.col("vec_id") == 200).select("embedding").first()[0]
    repl = spark.createDataFrame([(7, list(donor))],
                                 "vec_id long, embedding array<float>")
    idx.upsert(repl)
    cells = spark.read.parquet(str(tmp_path / "mv" / "cells"))
    rows = cells.filter(F.col("vec_id") == 7).collect()
    assert len(rows) == 1, "stale duplicate left behind"
    modified = emb.filter(F.col("vec_id") != 7).unionByName(
        spark.createDataFrame([(7, list(donor), 0)],
                              "vec_id long, embedding array<float>, "
                              "label int").select("vec_id", "embedding",
                                                  "label"))
    qdf = (modified.filter(F.col("vec_id") < 5)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))
    got = idx.search_many(qdf, k=10, nprobe=N_CENTROIDS)
    want = brute_force_topk(modified, qdf, k=10)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_pq_upsert_keeps_adc_consistent(spark, embeddings_small, tmp_path):
    """Upsert into a PQ-augmented index encodes new rows with the FROZEN
    codebook: exhaustive-probe ADC search equals a from-scratch
    build+build_pq whose codebook was trained on the ORIGINAL corpus."""
    from document_vector_pipeline_spark.operators.similarity import (
        pq_codebook,
    )

    emb = embeddings_small
    keep = emb.filter(F.col("vec_id") % 5 != 0)
    back = emb.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 300))
    qdf = (emb.filter(F.col("vec_id") < 5)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))

    inc = IVFIndex(spark, str(tmp_path / "pq_inc"), n_centroids=N_CENTROIDS)
    inc.build(keep)
    inc.build_pq(keep)
    inc.upsert(back)
    got = inc.search_many_adc(qdf, k=10, nprobe=N_CENTROIDS)

    # reference: fresh cells over the merged corpus, same frozen codebook
    ref = IVFIndex(spark, str(tmp_path / "pq_ref"), n_centroids=N_CENTROIDS)
    merged = keep.unionByName(back)
    ref.build(merged)
    # the codebook inc TRAINED on `keep` (round 12: build_pq's default
    # is 2 per-subspace Lloyd rounds, so replay them here)
    cb = pq_codebook(keep, 16, 64, n_sub=8, iters=2)
    cb_df = spark.createDataFrame([(i + 1, list(c)) for i, c in enumerate(cb)],
                                  "code int, c6 array<bigint>")
    cb_df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "pq_ref" / "codebook.parquet"))
    cells = spark.read.parquet(str(tmp_path / "pq_ref" / "cells"))
    coded = IVFIndex._with_pq_codes(cells, cb, 8, 64)
    tmp = str(tmp_path / "pq_ref" / "cells2")
    (coded.repartition("centroid_id").write
     .partitionBy("centroid_id").mode("overwrite").parquet(tmp))
    (spark.read.parquet(tmp).repartition("centroid_id").write
     .partitionBy("centroid_id").mode("overwrite")
     .parquet(str(tmp_path / "pq_ref" / "cells")))
    # manual surgery behind the index's back must record the new layout
    # in the schema sidecar — it is authoritative for every read
    ref._record_schemas(cells=coded.schema, codebook=cb_df.schema)
    want = ref.search_many_adc(qdf, k=10, nprobe=N_CENTROIDS)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_delete_empties_cell_directory(spark, tmp_path):
    """Deleting every vector of a cell must drop the partition directory —
    dynamic overwrite alone would leave the stale files in place."""
    import numpy as np

    rng = [(i, [float((i * 7 + j) % 13 - 6) for j in range(64)])
           for i in range(40)]
    emb = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    idx = IVFIndex(spark, str(tmp_path / "empty"), n_centroids=4)
    idx.build(emb)
    cells = spark.read.parquet(str(tmp_path / "empty" / "cells"))
    one_cell = cells.select("centroid_id").first()[0]
    victims = [r[0] for r in cells.filter(F.col("centroid_id") == one_cell)
               .select("vec_id").collect()]
    idx.delete(victims)
    import os
    assert not os.path.exists(
        str(tmp_path / "empty" / "cells" / f"centroid_id={one_cell}"))
    left = spark.read.parquet(str(tmp_path / "empty" / "cells"))
    assert left.filter(F.col("vec_id").isin(victims)).count() == 0
    assert left.count() == 40 - len(victims)
    # idmap agrees with cells after the rewrite
    imap = spark.read.parquet(str(tmp_path / "empty" / "idmap"))
    assert (_sorted_rows(imap.select("vec_id", "centroid_id"))
            == _sorted_rows(left.select("vec_id", "centroid_id")))


def test_cell_stats_population_and_fill(spark, index, embeddings_small):
    """cell_stats covers the whole corpus exactly once and fill factors
    average to the uniform ideal."""
    stats = index.cell_stats().collect()
    n = embeddings_small.count()
    assert sum(r["n_vectors"] for r in stats) == n
    assert len(stats) <= N_CENTROIDS
    # shares sum to ~1e6 (integer div loses < n_cells ppm)
    total_ppm = sum(r["share_ppm"] for r in stats)
    assert 1000000 - len(stats) <= total_ppm <= 1000000
    for r in stats:
        assert r["fill_milli"] == 1000 * r["n_vectors"] * len(stats) // n


def test_upsert_rejects_duplicate_batch_ids(spark, tmp_path):
    """Round 6 (advisor): two rows with the same vec_id in one upsert
    batch would both survive the anti-join merge, leaving duplicate ids
    in the cells/idmap — refused up front."""
    import pytest
    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.store.ivf_index import IVFIndex

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .limit(32))
    idx = IVFIndex(spark, str(tmp_path / "dup_ivf"), n_centroids=2)
    idx.build(emb)
    dup = emb.limit(2).union(emb.limit(1))
    with pytest.raises(ValueError, match="duplicate vec_id"):
        idx.upsert(dup)
    # a clean batch still works
    idx.upsert(emb.limit(2).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000_000)))


def test_upserts_do_not_fragment_and_compact_restores_single_files(
        spark, tmp_path):
    """Round 6 (judge nit): upsert/delete rewrite each touched partition
    wholesale, so file counts DON'T grow across many small upserts
    (asserted); compact() coalesces an externally fragmented cell back
    to one file with identical search results."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.store.ivf_index import IVFIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "frag_ivf")
    idx = IVFIndex(spark, path, n_centroids=4, n_buckets=4)
    idx.build(emb)

    def files(sub):
        base = os.path.join(path, sub)
        return {d: sorted(f for f in os.listdir(os.path.join(base, d))
                          if f.endswith(".parquet"))
                for d in os.listdir(base) if "=" in d}

    for i in range(4):
        idx.upsert(emb.filter(F.col("vec_id") % 50 == i))
    counts = {d: len(fs) for d, fs in files("cells").items()}
    assert all(n == 1 for n in counts.values()), counts   # no fragmentation

    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    before = sorted(map(tuple, idx.search_many(q, k=5, nprobe=4).collect()))

    # fragment one cell by hand: split its single file into two parts
    cell_dir, flist = next(iter(files("cells").items()))
    full = os.path.join(path, "cells", cell_dir, flist[0])
    t = pq.read_table(full)
    half = max(1, t.num_rows // 2)
    pq.write_table(t.slice(0, half),
                   os.path.join(path, "cells", cell_dir,
                                "part-frag-a.snappy.parquet"))
    pq.write_table(t.slice(half),
                   os.path.join(path, "cells", cell_dir,
                                "part-frag-b.snappy.parquet"))
    os.remove(full)
    assert len(files("cells")[cell_dir]) == 2

    idx.compact()
    counts = {d: len(fs) for d, fs in files("cells").items()}
    assert all(n == 1 for n in counts.values()), counts
    after = sorted(map(tuple, idx.search_many(q, k=5, nprobe=4).collect()))
    assert after == before


def test_maybe_rebuild_policy(spark, embeddings_small, tmp_path):
    """Balanced index → maybe_rebuild is a no-op returning False;
    drifted upserts (a pile of near-identical vectors landing in one
    cell) push that cell past the fill threshold → it rebuilds, and
    exhaustive-probe search equals brute force over the live corpus
    afterwards."""
    emb = embeddings_small.select("vec_id", "embedding")
    idx = IVFIndex(spark, str(tmp_path / "rb"), n_centroids=N_CENTROIDS)
    idx.build(emb)
    assert idx.maybe_rebuild() is False

    donor = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    n = emb.count()
    batch = spark.createDataFrame(
        [(100_000 + i, [float(x) for x in donor]) for i in range(n)],
        "vec_id long, embedding array<float>")
    idx.upsert(batch)
    assert idx.maybe_rebuild() is True

    merged = emb.unionByName(batch)
    qdf = (emb.filter(F.col("vec_id") < 5)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))
    got = idx.search_many(qdf, k=10, nprobe=N_CENTROIDS)
    want = brute_force_topk(merged, qdf, k=10)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_maybe_rebuild_triggers_on_empty_cells(spark, embeddings_small,
                                               tmp_path):
    """Deleting everything outside one cell leaves most centroids
    empty — the dead-cell trigger fires and the rebuild restores a
    fully-populated index over the survivors."""
    emb = embeddings_small.select("vec_id", "embedding")
    idx = IVFIndex(spark, str(tmp_path / "empty"),
                   n_centroids=N_CENTROIDS)
    idx.build(emb)
    cells = spark.read.parquet(str(tmp_path / "empty" / "cells"))
    keep_cell = cells.select("centroid_id").orderBy("centroid_id").first()[0]
    # materialize ids driver-side: a lazy frame over the cells path
    # would re-read it mid-delete, after its dirs were rewritten
    victims = [r[0] for r in
               cells.filter(F.col("centroid_id") != keep_cell)
               .select("vec_id").collect()]
    survivors = [r[0] for r in
                 cells.filter(F.col("centroid_id") == keep_cell)
                 .select("vec_id").collect()]
    idx.delete(victims)
    assert idx.maybe_rebuild() is True
    live = emb.filter(F.col("vec_id").isin(survivors))
    qdf = (live.limit(3)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))
    got = idx.search_many(qdf, k=5, nprobe=N_CENTROIDS)
    want = brute_force_topk(live, qdf, k=5)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_upsert_null_embedding_deletes_stale_vector(spark, embeddings_small,
                                                    tmp_path):
    """Round-8 ADVICE (medium): an upsert row whose embedding is NULL is
    a keyword-only REPLACEMENT — the previously-served vector must leave
    the index (cells AND idmap), not keep serving; remaining search is
    bit-identical to a fresh build without the victims.  A mixed batch
    (one NULL + one vectored row) and an all-NULL batch both work; an id
    carrying both a NULL and a vectored row in one batch is refused."""
    import pytest
    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.store.ivf_index import IVFIndex

    idx = IVFIndex(spark, str(tmp_path / "ivf"), n_centroids=4)
    idx.build(embeddings_small)
    n0 = idx._read_cells().count()

    new_vec = [float(j % 5 - 2) for j in range(64)]
    batch = spark.createDataFrame(
        [(0, None), (1, new_vec)], "vec_id long, embedding array<float>")
    idx.upsert(batch)
    cells = idx._read_cells()
    assert cells.count() == n0 - 1        # id 0 out; id 1 replaced in place
    assert cells.filter(F.col("vec_id") == 0).count() == 0
    assert idx._read_idmap().filter(F.col("vec_id") == 0).count() == 0

    # search ≡ fresh build over the surviving corpus
    ref = IVFIndex(spark, str(tmp_path / "ref"), n_centroids=4)
    ref.build(embeddings_small.select("vec_id", "embedding")
              .filter(F.col("vec_id") > 1)
              .unionByName(batch.filter(F.col("embedding").isNotNull())))
    q = spark.createDataFrame([(0, new_vec)],
                              "query_id long, query_vec array<float>")
    got = idx.search_many(q, k=5, nprobe=4).toPandas().values.tolist()
    want = ref.search_many(q, k=5, nprobe=4).toPandas().values.tolist()
    assert got == want and got

    # all-NULL batch: pure delete, no empty write jobs blow up
    idx.upsert(spark.createDataFrame([(2, None)],
                                     "vec_id long, embedding array<float>"))
    assert idx._read_cells().filter(F.col("vec_id") == 2).count() == 0

    # NULL + vectored rows for ONE id: ambiguous — refused
    dup = spark.createDataFrame(
        [(3, None), (3, new_vec)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="duplicate vec_id"):
        idx.upsert(dup)


def test_adc_id_filter_equals_postfiltered_rerank(spark, embeddings_small,
                                                  tmp_path):
    """Filtered compressed serving (round 9): search_many_adc with an
    id_filter equals the unfiltered ADC scores restricted to matching
    ids and re-ranked — the predicate changes WHICH rows rank, never
    how a row scores (codebook stays trained on the full index)."""
    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.store.ivf_index import IVFIndex

    idx = IVFIndex(spark, str(tmp_path / "ivf"), n_centroids=4)
    idx.build(embeddings_small)
    idx.build_pq(embeddings_small)
    q = (embeddings_small.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    got = [tuple(r) for r in
           idx.search_many_adc(q, k=10, nprobe=4,
                               id_filter=F.col("vec_id") % 3 == 0)
           .orderBy("query_id", "rank").collect()]
    # expected: full ADC scores, post-filtered, re-ranked per query
    full = idx.search_many_adc(q, k=10_000, nprobe=4)
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
    want = [tuple(r) for r in
            (full.filter(F.col("vec_id") % 3 == 0)
             .withColumn("rank", F.row_number().over(w).cast("int"))
             .filter(F.col("rank") <= 10)
             .select("query_id", "vec_id", "score", "rank")
             .orderBy("query_id", "rank")).collect()]
    assert got == want and got


def test_rotated_pq_index_exhaustive_probe_equals_opq_ann(
        spark, embeddings_small, tmp_path):
    """build_pq(rotate=True) persists the WHT-rotated codes + the
    rotation flag as index metadata: exhaustive-probe ADC must be
    bit-identical to similarity.opq_ann, the rotation must survive an
    upsert (new rows encode in the same domain without the caller
    restating the flag), and a plain index must stay bit-identical to
    pq_ann (flag off by default)."""
    from document_vector_pipeline_spark.operators.similarity import (
        opq_ann,
        pq_ann,
    )

    qdf = (embeddings_small.filter(F.col("vec_id") < 3)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))

    rot = IVFIndex(spark, str(tmp_path / "opq_idx"), n_centroids=4)
    rot.build(embeddings_small)
    rot.build_pq(embeddings_small, n_codes=8, n_sub=8, rotate=True)
    assert rot._pq_rotate() is True
    got = sorted(map(tuple, rot.search_many_adc(qdf, k=10,
                                                nprobe=4).collect()))
    want = sorted(map(tuple, opq_ann(embeddings_small, qdf, k=10,
                                     n_codes=8, n_sub=8).collect()))
    assert got == want and len(got) > 0

    plain = IVFIndex(spark, str(tmp_path / "pq_idx"), n_centroids=4)
    plain.build(embeddings_small)
    plain.build_pq(embeddings_small, n_codes=8, n_sub=8)
    assert plain._pq_rotate() is False
    gotp = sorted(map(tuple, plain.search_many_adc(qdf, k=10,
                                                   nprobe=4).collect()))
    wantp = sorted(map(tuple, pq_ann(embeddings_small, qdf, k=10,
                                     n_codes=8, n_sub=8).collect()))
    assert gotp == wantp
    assert got != gotp          # the rotation genuinely changes ranks

    # upsert re-encodes in the persisted domain: the rotated index's
    # post-upsert exhaustive probe equals opq_ann over the merged corpus
    batch = embeddings_small.filter(F.col("vec_id") < 4).withColumn(
        "embedding",
        F.transform(F.col("embedding"), lambda x: x * F.lit(-1.0)))
    rot.upsert(batch)
    merged = (embeddings_small.filter(F.col("vec_id") >= 4)
              .unionByName(batch))
    got2 = sorted(map(tuple, rot.search_many_adc(qdf, k=10,
                                                 nprobe=4).collect()))
    # the index's codebook is FROZEN at build_pq time (trained on the
    # original corpus — round 12: training makes this distinction real,
    # any new row would shift the centroids), so the twin is opq_ann
    # over the merged corpus WITH that frozen codebook injected
    frozen_cb = rot._read_codebook()
    want2 = sorted(map(tuple, opq_ann(merged, qdf, k=10, n_codes=8,
                                      n_sub=8, cb=frozen_cb).collect()))
    assert got2 == want2
