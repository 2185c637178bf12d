"""Streaming: file-source ingest drains to the store; windowed/session aggs
agree between streaming and batch execution of the same transformation."""

import time

from pyspark.sql import functions as F

from document_vector_pipeline_spark.config import PipelineConfig
from document_vector_pipeline_spark.sources import load_table
from document_vector_pipeline_spark.store.vector_store import VectorStore
from document_vector_pipeline_spark.streaming.events import (
    sessionize,
    top_users_by_activity,
    windowed_event_counts,
)
from document_vector_pipeline_spark.streaming.ingest import stream_ingest

CFG = PipelineConfig(max_tokens_per_chunk=16, embedding_dimensions=16,
                     store_buckets=8)


def test_stream_ingest_drains_directory(spark, tmp_path):
    blob_dir = tmp_path / "inbox"
    blob_dir.mkdir()
    (blob_dir / "a.txt").write_text("stream alpha " * 30)
    (blob_dir / "b.txt").write_text("stream beta " * 30)

    store = VectorStore(spark, str(tmp_path / "store"), CFG)
    q = stream_ingest(spark, str(blob_dir), store,
                      checkpoint=str(tmp_path / "ckpt"), cfg=CFG)
    q.awaitTermination(120)
    assert store.read().select("document_url").distinct().count() == 2

    # a new file arriving is picked up by the next availableNow run
    (blob_dir / "c.txt").write_text("stream gamma " * 30)
    q2 = stream_ingest(spark, str(blob_dir), store,
                       checkpoint=str(tmp_path / "ckpt"), cfg=CFG)
    q2.awaitTermination(120)
    assert store.read().select("document_url").distinct().count() == 3


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    batch = windowed_event_counts(events)

    # the driver testdata uses TIMESTAMP(NANOS), which the streaming parquet
    # source rejects; re-write through Spark (micros) to stream it
    src_dir = str(tmp_path / "events_stream_src")
    events.write.parquet(src_dir)
    stream_src = (spark.readStream
                  .schema(events.schema)
                  .parquet(src_dir))
    streamed = windowed_event_counts(stream_src)
    q = (streamed.writeStream.format("memory")
         .queryName("win_counts").outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts")
    b = {(r.window_start, r.event_type): (r.n_events, r.total_value)
         for r in batch.collect()}
    s = {(r.window_start, r.event_type): (r.n_events, r.total_value)
         for r in got.collect()}
    assert b == s and len(b) > 0


def test_sessionize_batch(spark):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    sess = sessionize(events, gap="30 minutes")
    assert sess.count() > 0
    # session bounds are consistent
    bad = sess.filter(F.col("session_end") <= F.col("session_start")).count()
    assert bad == 0
    # every user's events are covered by their sessions
    per_user = sess.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    direct = events.groupBy("user_id").agg(F.count("*").alias("n"))
    mism = (per_user.join(direct, "user_id")
            .filter(per_user.n != direct.n).count())
    assert mism == 0


def test_top_users(spark):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    top = top_users_by_activity(events, n=5).collect()
    assert len(top) == 5
    assert [r.rank for r in top] == [1, 2, 3, 4, 5]
    assert top[0].n_events >= top[4].n_events


def test_interval_join_stream_equals_batch(spark, tmp_path):
    from document_vector_pipeline_spark.streaming.events import (
        click_purchase_join,
    )
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    batch = click_purchase_join(events)

    src_dir = str(tmp_path / "events_join_src")
    events.write.parquet(src_dir)
    stream_src = (spark.readStream
                  .schema(events.schema)
                  .parquet(src_dir))
    streamed = click_purchase_join(stream_src)
    q = (streamed.writeStream.format("memory")
         .queryName("ivj").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from ivj")
    key = lambda r: (r.user_id, r.purchase_id, r.click_id, r.gap_us)
    b = sorted(key(r) for r in batch.collect())
    s = sorted(key(r) for r in got.collect())
    assert b == s and len(b) > 0


def test_funnel_hand_case(spark):
    from datetime import datetime as dt

    from document_vector_pipeline_spark.streaming.events import funnel_counts
    t = lambda s: dt(2026, 1, 1, 0, 0, s)
    rows = [  # (user, type, second)
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),   # stage 3
        (2, "view", 1), (2, "click", 2),                       # stage 2
        (3, "click", 2), (3, "view", 5),                       # click too early -> 1
        (4, "click", 1),                                       # no view -> 0
        (5, "view", 1), (5, "purchase", 2),                    # no click -> 1
    ]
    df = spark.createDataFrame(
        [(u, ty, t(s)) for u, ty, s in rows], ["user_id", "event_type", "ts"])
    got = {r.stage: r.n_users for r in funnel_counts(df).collect()}
    assert got == {0: 1, 1: 2, 2: 1, 3: 1}


def test_dropdup_stream_matches_batch_keys(spark, tmp_path):
    from document_vector_pipeline_spark.streaming.events import (
        first_event_per_key,
    )
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    batch = first_event_per_key(events)

    src = str(tmp_path / "dropdup_src")
    events.write.parquet(src)
    stream_src = spark.readStream.schema(events.schema).parquet(src)
    q = (first_event_per_key(stream_src).writeStream.format("memory")
         .queryName("ddp").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from ddp").collect()
    bkeys = sorted(r.user_id for r in batch.collect())
    skeys = sorted(r.user_id for r in got)
    assert skeys == bkeys and len(skeys) > 0   # one row per key, same keys
    ev = {(r.user_id, r.event_id) for r in events.collect()}
    assert all((r.user_id, r.event_id) in ev for r in got)


def test_active_users_hand_computed(spark):
    from document_vector_pipeline_spark.streaming.events import active_users

    rows = [
        ("u1", "2024-01-01 10:00:00"),
        ("u1", "2024-01-01 11:00:00"),  # same user+day: no double count
        ("u2", "2024-01-01 12:00:00"),
        ("u1", "2024-01-05 09:00:00"),
        ("u3", "2024-01-09 09:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts string") \
        .selectExpr("user_id", "cast(ts as timestamp) as ts")
    out = {str(r["day"])[:10]: r for r in active_users(ev).collect()}
    assert out["2024-01-01"]["n_dau"] == 2
    assert out["2024-01-01"]["n_wau"] == 2
    # Jan 5: u1 active that day; u1,u2 within trailing 7 days
    assert out["2024-01-05"]["n_dau"] == 1
    assert out["2024-01-05"]["n_wau"] == 2
    # Jan 9: u3 new; u1's Jan-5 visit still in window, Jan-1 visits aged out
    assert out["2024-01-09"]["n_dau"] == 1
    assert out["2024-01-09"]["n_wau"] == 2


def test_hourly_heatmap_shares_sum_to_million(spark):
    from document_vector_pipeline_spark.sources import load_table
    from document_vector_pipeline_spark.streaming.events import hourly_heatmap

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = hourly_heatmap(ev).collect()
    assert all(1 <= r["dow"] <= 7 and 0 <= r["hod"] <= 23 for r in out)
    total = sum(r["n_events"] for r in out)
    assert total == ev.count()
    # integer-div shares sum to ≤ 1e6 and within grid-size slack
    s = sum(r["share_ppm"] for r in out)
    assert 1_000_000 - len(out) <= s <= 1_000_000


def test_stream_blob_events_matches_batch_apply(spark, tmp_path):
    import json

    from document_vector_pipeline_spark.config import PipelineConfig
    from document_vector_pipeline_spark.operators.pipeline import (
        apply_blob_events,
    )
    from document_vector_pipeline_spark.store.vector_store import VectorStore
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_blob_events,
    )

    cfg = PipelineConfig(max_tokens_per_chunk=1_000_000,
                         embedding_dimensions=8, store_buckets=4)
    events = [
        {"seq": 1, "op": "create", "document_url": "mem://a.txt",
         "content": "alpha beta gamma"},
        {"seq": 2, "op": "create", "document_url": "mem://b.txt",
         "content": "delta epsilon"},
        {"seq": 3, "op": "delete", "document_url": "mem://a.txt",
         "content": None},
        {"seq": 4, "op": "create", "document_url": "mem://c.txt",
         "content": "zeta eta theta"},
        {"seq": 5, "op": "create", "document_url": "mem://b.txt",
         "content": "delta epsilon REVISED"},
    ]
    evdir = tmp_path / "events"
    evdir.mkdir()
    (evdir / "batch0.jsonl").write_text(
        "\n".join(json.dumps(e) for e in events[:3]))
    (evdir / "batch1.jsonl").write_text(
        "\n".join(json.dumps(e) for e in events[3:]))

    s_store = VectorStore(spark, str(tmp_path / "s_store"), cfg)
    q = stream_blob_events(spark, str(evdir), s_store,
                           str(tmp_path / "ckpt"), cfg)
    q.awaitTermination(120)

    b_store = VectorStore(spark, str(tmp_path / "b_store"), cfg)
    apply_blob_events(
        spark.createDataFrame(
            [(e["seq"], e["op"], e["document_url"], e["content"])
             for e in events],
            "seq long, op string, document_url string, content string"),
        b_store, cfg)

    def state(store):
        return sorted((r["document_url"], r["chunk_text"])
                      for r in store.read().collect())

    got = state(s_store)
    assert got == state(b_store)
    assert ("mem://b.txt", "delta epsilon REVISED") in got
    assert all(u != "mem://a.txt" for u, _ in got)


def test_session_histogram_hand_computed(spark):
    from document_vector_pipeline_spark.streaming.events import (
        session_histogram,
    )

    rows = [
        # u1: one 3-event session spanning 10 min (bucket 2)
        (1, "2024-01-01 00:00:00", "u1"),
        (2, "2024-01-01 00:05:00", "u1"),
        (3, "2024-01-01 00:10:00", "u1"),
        # u1: a second, single-event session hours later (bucket 1)
        (4, "2024-01-01 05:00:00", "u1"),
        # u2: single-event session (bucket 1)
        (5, "2024-01-01 00:00:00", "u2"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id string") \
        .selectExpr("event_id", "cast(ts as timestamp) as ts", "user_id",
                    "'click' as event_type", "cast(1.0 as double) as value",
                    "'{}' as props")
    out = {r["bucket"]: r for r in session_histogram(ev).collect()}
    assert out[1]["n_sessions"] == 2
    assert out[1]["sum_duration_us"] == 0
    assert out[2]["n_sessions"] == 1
    assert out[2]["sum_duration_us"] == 600 * 1_000_000


def test_stream_ingest_with_flaky_embed_client(spark, tmp_path):
    """Round 5: the injectable retrying embed client wired through the
    streaming foreachBatch — a 429 on the first call of every group is
    retried INSIDE the microbatch, and the drained store equals the
    batch-mode embed_with_client result over the same blobs."""
    import os

    from document_vector_pipeline_spark.operators.embed import (
        embed_with_client,
    )
    from document_vector_pipeline_spark.operators.pipeline import (
        blobs_to_chunks,
    )
    from document_vector_pipeline_spark.sources import read_text_blobs

    blob_dir = tmp_path / "inbox_client"
    blob_dir.mkdir()
    (blob_dir / "a.txt").write_text("client alpha " * 40)
    (blob_dir / "b.txt").write_text("client beta stream " * 30)
    marker_dir = str(tmp_path / "throttle_markers")
    os.makedirs(marker_dir)

    def flaky_client(texts):
        # deterministic flakiness: the FIRST call for any given group
        # 429s (leaving a marker), the retry succeeds — exercises the
        # retry loop inside a microbatch without wall-clock sleeps
        import hashlib
        import os as _os
        key = hashlib.md5("||".join(texts).encode()).hexdigest()
        marker = _os.path.join(marker_dir, key)
        if not _os.path.exists(marker):
            open(marker, "w").close()
            err = Exception("throttled")
            err.status_code = 429
            raise err
        return [[float(len(t) % 31), float(len(t.split()) % 17), 1.0]
                for t in texts]

    store = VectorStore(spark, str(tmp_path / "store_client"), CFG)
    q = stream_ingest(spark, str(blob_dir), store,
                      checkpoint=str(tmp_path / "ckpt_client"), cfg=CFG,
                      embed_client=flaky_client, embed_retry_delay_s=0.0)
    q.awaitTermination(120)

    got = sorted(map(tuple, store.read()
                     .select("document_url", "id", "embedding").collect()))
    chunks = blobs_to_chunks(read_text_blobs(spark, str(blob_dir)), CFG)
    want_df = embed_with_client(chunks, flaky_client, retry_delay_s=0.0)
    store2 = VectorStore(spark, str(tmp_path / "store_client_batch"), CFG)
    store2.upsert(want_df)
    want = sorted(map(tuple, store2.read()
                      .select("document_url", "id", "embedding").collect()))
    assert got == want and len(got) > 0


def test_stream_ingest_maintains_ivf_index(spark, tmp_path):
    """Round 5: a pre-built serving IVF index passed to stream_ingest is
    incrementally maintained per microbatch — after draining, its cells
    hold exactly the chunk vectors a batch pipeline produces."""
    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.operators.embed import (
        add_embeddings,
    )
    from document_vector_pipeline_spark.operators.pipeline import (
        blobs_to_chunks,
    )
    from document_vector_pipeline_spark.sources import read_text_blobs
    from document_vector_pipeline_spark.store.ivf_index import IVFIndex

    blob_dir = tmp_path / "inbox_ivf"
    blob_dir.mkdir()
    (blob_dir / "a.txt").write_text("serving index alpha " * 30)

    def chunk_vecs(path):
        chunks = add_embeddings(
            blobs_to_chunks(read_text_blobs(spark, path), CFG), cfg=CFG)
        return chunks.select(
            F.xxhash64(F.concat_ws(
                "#", F.col("document_url"),
                F.col("chunk_number").cast("string"))).alias("vec_id"),
            F.col("embedding"))

    # offline build on the initial corpus (file a only)
    idx = IVFIndex(spark, str(tmp_path / "serve_ivf"), n_centroids=2)
    idx.build(chunk_vecs(str(blob_dir)))

    # a second document arrives; the stream maintains store AND index
    (blob_dir / "b.txt").write_text("fresh beta vectors " * 25)
    store = VectorStore(spark, str(tmp_path / "store_ivf"), CFG)
    q = stream_ingest(spark, str(blob_dir), store,
                      checkpoint=str(tmp_path / "ckpt_ivf"), cfg=CFG,
                      ivf_index=idx)
    q.awaitTermination(120)

    want = sorted((r["vec_id"], tuple(r["embedding"])) for r in
                  chunk_vecs(str(blob_dir)).collect())
    got = sorted((r["vec_id"], tuple(r["v"])) for r in
                 spark.read.parquet(str(tmp_path / "serve_ivf" / "cells"))
                 .select("vec_id", "v").collect())
    assert got == want and len(got) > 0


def test_stream_reingest_shrunken_document_purges_stale_vectors(
        spark, tmp_path):
    """Round 6 (advisor): re-ingesting a document with FEWER chunks than
    before must remove the old higher-numbered chunk vectors from the
    store and the serving IVF index — deleted content must not stay
    searchable."""
    from document_vector_pipeline_spark.operators.embed import (
        add_embeddings,
    )
    from document_vector_pipeline_spark.operators.pipeline import (
        blobs_to_chunks,
    )
    from document_vector_pipeline_spark.sources import read_text_blobs
    from document_vector_pipeline_spark.store.ivf_index import IVFIndex

    blob_dir = tmp_path / "inbox_shrink"
    blob_dir.mkdir()
    (blob_dir / "a.txt").write_text("shrink alpha beta " * 40)   # many chunks

    def chunk_vecs(path):
        chunks = add_embeddings(
            blobs_to_chunks(read_text_blobs(spark, path), CFG), cfg=CFG)
        return chunks.select(
            F.xxhash64(F.concat_ws(
                "#", F.col("document_url"),
                F.col("chunk_number").cast("string"))).alias("vec_id"),
            F.col("embedding"))

    idx = IVFIndex(spark, str(tmp_path / "shrink_ivf"), n_centroids=2)
    idx.build(chunk_vecs(str(blob_dir)))
    store = VectorStore(spark, str(tmp_path / "store_shrink"), CFG)
    q = stream_ingest(spark, str(blob_dir), store,
                      checkpoint=str(tmp_path / "ckpt_shrink1"), cfg=CFG,
                      ivf_index=idx)
    q.awaitTermination(120)
    n_before = store.read().count()
    assert n_before > 1

    # the document shrinks to a single chunk; a fresh checkpoint makes
    # the file source re-deliver it (same document_url)
    (blob_dir / "a.txt").write_text("tiny now")
    q2 = stream_ingest(spark, str(blob_dir), store,
                       checkpoint=str(tmp_path / "ckpt_shrink2"), cfg=CFG,
                       ivf_index=idx)
    q2.awaitTermination(120)

    assert store.read().count() == 1        # stale chunks gone from store
    want = sorted((r["vec_id"], tuple(r["embedding"])) for r in
                  chunk_vecs(str(blob_dir)).collect())
    got = sorted((r["vec_id"], tuple(r["v"])) for r in
                 spark.read.parquet(str(tmp_path / "shrink_ivf" / "cells"))
                 .select("vec_id", "v").collect())
    assert got == want and len(got) == 1    # ...and from the index


def test_stream_ingest_maintains_text_index(spark, tmp_path):
    """Round 6: a built TextIndex passed to stream_ingest is maintained
    per microbatch (chunk-grain postings under the synthetic chunk id);
    after draining — including a shrinking re-ingest — indexed BM25
    search equals the scan-path BM25 over the batch pipeline's chunks."""
    from document_vector_pipeline_spark.operators import retrieval
    from document_vector_pipeline_spark.operators.pipeline import (
        blobs_to_chunks,
    )
    from document_vector_pipeline_spark.sources import read_text_blobs
    from document_vector_pipeline_spark.store.text_index import TextIndex

    blob_dir = tmp_path / "inbox_ti"
    blob_dir.mkdir()
    (blob_dir / "a.txt").write_text("alpha beta gamma delta " * 20)

    def chunk_docs(path):
        return blobs_to_chunks(read_text_blobs(spark, path), CFG).select(
            F.xxhash64(F.concat_ws(
                "#", F.col("document_url"),
                F.col("chunk_number").cast("string"))).alias("doc_id"),
            F.col("chunk_text").alias("text"))

    ti = TextIndex(spark, str(tmp_path / "serve_ti"), n_term_buckets=4,
                   n_doc_buckets=2)
    ti.build(chunk_docs(str(blob_dir)))
    store = VectorStore(spark, str(tmp_path / "store_ti"), CFG)
    (blob_dir / "b.txt").write_text("epsilon zeta alpha " * 15)
    q = stream_ingest(spark, str(blob_dir), store,
                      checkpoint=str(tmp_path / "ckpt_ti1"), cfg=CFG,
                      text_index=ti)
    q.awaitTermination(120)

    qt = spark.createDataFrame(
        [(0, "alpha"), (0, "epsilon"), (1, "delta")],
        "query_id long, term string")

    def assert_matches_batch():
        want = sorted(map(tuple, retrieval.bm25_topk(
            chunk_docs(str(blob_dir)), qt, k=10).collect()))
        got = sorted(map(tuple, ti.search(qt, k=10).collect()))
        assert got == want and len(got) > 0

    assert_matches_batch()

    # document a shrinks; a fresh checkpoint re-delivers it — its stale
    # chunk postings must be tombstoned out of the serving index
    (blob_dir / "a.txt").write_text("alpha only now")
    q2 = stream_ingest(spark, str(blob_dir), store,
                       checkpoint=str(tmp_path / "ckpt_ti2"), cfg=CFG,
                       text_index=ti)
    q2.awaitTermination(120)
    assert_matches_batch()


def test_streamed_serving_stack_answers_hybrid_like_batch(spark, tmp_path):
    """End-to-end serving story: stream_ingest maintains the store, the
    IVF index AND the text index across microbatches (including a
    shrinking re-ingest); afterwards the persisted-index hybrid answers
    exactly like the scan-path hybrid computed from the final corpus."""
    from document_vector_pipeline_spark.operators import (
        retrieval,
        similarity,
    )
    from document_vector_pipeline_spark.operators.embed import (
        add_embeddings,
    )
    from document_vector_pipeline_spark.operators.pipeline import (
        blobs_to_chunks,
    )
    from document_vector_pipeline_spark.sources import read_text_blobs
    from document_vector_pipeline_spark.store.ivf_index import IVFIndex
    from document_vector_pipeline_spark.store.text_index import TextIndex

    blob_dir = tmp_path / "inbox_serve"
    blob_dir.mkdir()
    (blob_dir / "a.txt").write_text("alpha beta gamma " * 30)

    def chunks_of(path):
        return add_embeddings(
            blobs_to_chunks(read_text_blobs(spark, path), CFG),
            cfg=CFG).select(
            F.xxhash64(F.concat_ws(
                "#", F.col("document_url"),
                F.col("chunk_number").cast("string"))).alias("cid"),
            F.col("chunk_text"), F.col("embedding"))

    base = chunks_of(str(blob_dir))
    ivf = IVFIndex(spark, str(tmp_path / "sv_ivf"), n_centroids=2)
    ivf.build(base.select(F.col("cid").alias("vec_id"), "embedding"))
    ti = TextIndex(spark, str(tmp_path / "sv_ti"), n_term_buckets=4,
                   n_doc_buckets=2)
    ti.build(base.select(F.col("cid").alias("doc_id"),
                         F.col("chunk_text").alias("text")))
    store = VectorStore(spark, str(tmp_path / "sv_store"), CFG)

    (blob_dir / "b.txt").write_text("delta epsilon alpha " * 25)
    q1 = stream_ingest(spark, str(blob_dir), store,
                       checkpoint=str(tmp_path / "sv_ck1"), cfg=CFG,
                       ivf_index=ivf, text_index=ti)
    q1.awaitTermination(120)
    (blob_dir / "a.txt").write_text("alpha zeta")          # shrinks
    q2 = stream_ingest(spark, str(blob_dir), store,
                       checkpoint=str(tmp_path / "sv_ck2"), cfg=CFG,
                       ivf_index=ivf, text_index=ti)
    q2.awaitTermination(120)

    cur = chunks_of(str(blob_dir)).localCheckpoint(eager=True)
    qt = spark.createDataFrame(
        [(0, "alpha"), (0, "epsilon"), (1, "zeta")],
        "query_id long, term string")
    qv = cur.limit(2).select(
        F.monotonically_increasing_id().alias("query_id"),
        F.col("embedding").alias("query_vec")).localCheckpoint(eager=True)

    got = retrieval.hybrid_search_indexed(ti, ivf, qt, qv, k=5, nprobe=2)
    text = retrieval.bm25_topk(
        cur.select(F.col("cid").alias("doc_id"),
                   F.col("chunk_text").alias("text")), qt, k=5)
    vec = similarity.brute_force_topk(
        cur.select(F.col("cid").alias("vec_id"), "embedding"), qv, k=5)
    want = retrieval.rrf_fuse(text, vec, k=5)
    assert (sorted(map(tuple, got.collect()))
            == sorted(map(tuple, want.collect())))
    assert got.count() > 0


def test_stream_ingest_versioned_commits_per_microbatch(spark, tmp_path):
    """Round 7: streaming ingest into a VersionedVectorStore — every
    drained batch is one auditable manifest commit; a shrinking
    re-ingest purges stale chunks in the NEW version while the prior
    version keeps serving its exact old state (the mid-stream-pinned
    retrieval eval); the final state equals the batch pipeline."""
    from document_vector_pipeline_spark.operators.embed import (
        add_embeddings,
    )
    from document_vector_pipeline_spark.operators.pipeline import (
        blobs_to_chunks,
    )
    from document_vector_pipeline_spark.store.versioned_store import (
        VersionedVectorStore,
    )
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_ingest_versioned,
    )

    blob_dir = tmp_path / "v_inbox"
    blob_dir.mkdir()
    long_text = " ".join(f"w{i}" for i in range(120))   # multi-chunk doc
    (blob_dir / "a.txt").write_text(long_text)
    (blob_dir / "b.txt").write_text("steady second doc")
    vvs = VersionedVectorStore(spark, str(tmp_path / "v_store"), CFG)
    q = stream_ingest_versioned(spark, str(blob_dir), vvs,
                                checkpoint=str(tmp_path / "v_ckpt"),
                                cfg=CFG)
    q.awaitTermination(120)
    v0 = vvs.versions()[-1]
    n0 = vvs.read(v0).count()
    a0 = vvs.read(v0).filter(F.col("document_url").endswith("a.txt"))
    assert a0.count() > 1                               # chunked long doc

    # a.txt shrinks to one chunk; a fresh checkpoint re-delivers the
    # directory (the file source tracks paths, not contents) and the
    # drain commits ONE new version via replace_documents
    (blob_dir / "a.txt").write_text("tiny now")
    q2 = stream_ingest_versioned(spark, str(blob_dir), vvs,
                                 checkpoint=str(tmp_path / "v_ckpt2"),
                                 cfg=CFG)
    q2.awaitTermination(120)
    v1 = vvs.versions()[-1]
    assert v1 > v0
    # new version: exactly one a.txt chunk, no stale survivors
    a1 = vvs.read(v1).filter(F.col("document_url").endswith("a.txt"))
    assert [r["chunk_text"] for r in a1.collect()] == ["tiny now"]
    # pinned version still serves the pre-shrink state byte-for-byte
    assert vvs.read(v0).count() == n0
    assert (sorted(r["chunk_text"] for r in
                   vvs.read(v0).filter(
                       F.col("document_url").endswith("a.txt")).collect())
            == sorted(r["chunk_text"] for r in a0.collect()))
    # final state == batch pipeline over the current blob directory
    blobs = spark.createDataFrame(
        [(f"file:{blob_dir}/a.txt", "tiny now"),
         (f"file:{blob_dir}/b.txt", "steady second doc")],
        "document_url string, content string")
    want = add_embeddings(blobs_to_chunks(blobs, CFG), cfg=CFG)
    got = vvs.read(v1)
    assert got.count() == want.count()
    wk = {(r["document_url"].rsplit("/", 1)[-1], r["chunk_number"],
           r["chunk_text"]) for r in want.collect()}
    gk = {(r["document_url"].rsplit("/", 1)[-1], int(r["id"]),
           r["chunk_text"]) for r in got.collect()}
    assert gk == wk
    # audit trail: one commit per drained batch, every op a replace
    ops = [r["op"] for r in vvs.history().orderBy("version").collect()]
    assert len(ops) == 2 and all(o == "upsert" for o in ops)
    # a CDC consumer tailing the stream's commits mirrors the store:
    # applying the feed's payloads in version order from v0 yields v1
    digest = F.conv(F.substring(F.md5(F.col("chunk_text")), 1, 13),
                    16, 10).cast("long")
    mirror = {(r["document_url"], r["id"]): r["chunk_text"]
              for r in vvs.read(v0).collect()}
    feed = (vvs.cdc_feed(digest=digest, from_version=v0)
            .orderBy("version").collect())
    for r in feed:
        key = (r["document_url"], r["id"])
        if r["status"] == "removed":
            del mirror[key]
        else:
            mirror[key] = r["chunk_text"]
    assert mirror == {(r["document_url"], r["id"]): r["chunk_text"]
                      for r in vvs.read(v1).collect()}


def test_stream_dedup_gate_sequential_admission(spark, tmp_path):
    """Round 7: the always-on crawl admission gate — batch 1's admitted
    docs reject batch 2's copies (sequential semantics), exact
    within-batch dups collapse to the smallest id, fresh docs pass, and
    the admitted corpus equals the sequential batch application."""
    import json

    from document_vector_pipeline_spark.streaming.ingest import (
        stream_dedup_gate,
    )

    inbox = tmp_path / "gate_in"
    inbox.mkdir()
    corpus_dir = str(tmp_path / "gate_corpus")
    base = "the quick brown fox jumps over the lazy dog again and again"

    def write_batch(name, rows):
        (inbox / name).write_text("\n".join(
            json.dumps({"doc_id": i, "text": t}) for i, t in rows))

    # batch 1: a fresh doc, its exact within-batch dup, another fresh
    write_batch("b1.jsonl", [
        (1, base),
        (2, base),                                  # in-batch exact dup
        (3, "completely different first crawl material here"),
    ])
    q = stream_dedup_gate(spark, str(inbox), corpus_dir,
                          checkpoint=str(tmp_path / "gate_ck"),
                          threshold_milli=400)
    q.awaitTermination(120)
    def read_corpus():
        return {r["doc_id"] for r in
                (spark.read.option("recursiveFileLookup", "true")
                 .parquet(corpus_dir)).collect()}

    assert read_corpus() == {1, 3}

    # batch 2: exact copy of an admitted doc, near-copy, fresh doc
    write_batch("b2.jsonl", [
        (10, base),                                  # exact vs admitted 1
        (11, base + " with a tiny tail"),            # near vs admitted 1
        (12, "entirely novel second batch document nothing shared"),
    ])
    q2 = stream_dedup_gate(spark, str(inbox), corpus_dir,
                           checkpoint=str(tmp_path / "gate_ck"),
                           threshold_milli=400)
    q2.awaitTermination(120)
    assert read_corpus() == {1, 3, 12}


def test_stream_index_maintain_equals_batch_builds(spark, tmp_path):
    """A drained maintenance stream leaves BOTH serving indexes
    bit-identical to batch builds over the final corpus — including a
    mid-stream REPLACEMENT of an already-indexed document (upsert
    semantics through foreachBatch, not just appends)."""
    import json as _json

    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.store.ivf_index import IVFIndex
    from document_vector_pipeline_spark.store.text_index import TextIndex
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_index_maintain,
    )

    words = ["vector", "join", "stream", "window", "batch", "table"]

    def doc(i, tag=""):
        txt = " ".join(words[i % 3:i % 3 + 3]) + f" doc{i} {tag}"
        vec = [float((i * 7 + j) % 5 - 2) for j in range(8)]
        return {"doc_id": i, "text": txt.strip(),
                "embedding": vec if i < 20 else None}

    initial = [doc(i) for i in range(10)]
    batch1 = [doc(i) for i in range(10, 20)]
    # batch 2: new ids + a REPLACEMENT of doc 5 + a CDC DELETE of doc 3
    batch2 = ([doc(i) for i in range(20, 30)] + [doc(5, tag="edited")]
              + [{"doc_id": 3, "text": None, "embedding": None,
                  "op": "delete"}])

    def to_df(rows):
        return spark.createDataFrame(
            [(r["doc_id"], r["text"], r["embedding"]) for r in rows],
            "doc_id long, text string, embedding array<float>")

    ti = TextIndex(spark, str(tmp_path / "text"), n_term_buckets=4,
                   n_doc_buckets=2)
    ti.build(to_df(initial).select("doc_id", "text"))
    vi = IVFIndex(spark, str(tmp_path / "ivf"), n_centroids=4)
    vi.build(to_df(initial).select(F.col("doc_id").alias("vec_id"),
                                   "embedding"))

    bdir = tmp_path / "batches"
    bdir.mkdir()
    for n, rows in (("b1", batch1), ("b2", batch2)):
        with open(bdir / f"{n}.json", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
    # tight compaction threshold so the 3rd segment (batch 2) forces a
    # mid-stream merge; rebuild check every batch exercises the drift
    # policy path (it should NOT trigger on this balanced data)
    q = stream_index_maintain(spark, str(bdir), ti, vi,
                              str(tmp_path / "ckpt"),
                              compact_opts={"max_segments": 2},
                              rebuild_check_every=1)
    q.awaitTermination(180)
    assert len(ti._manifest()["segments"]) <= 2  # compaction fired

    final = {r["doc_id"]: r for r in initial + batch1 + batch2
             if r.get("op") != "delete" and r["doc_id"] != 3}.values()
    final_df = to_df(sorted(final, key=lambda r: r["doc_id"]))

    ref_t = TextIndex(spark, str(tmp_path / "text_ref"), n_term_buckets=4,
                      n_doc_buckets=2)
    ref_t.build(final_df.select("doc_id", "text"))
    qt = spark.createDataFrame(
        [(0, "vector"), (0, "doc5"), (1, "stream"), (1, "edited")],
        "query_id long, term string")
    got_t = ti.search(qt, k=10).toPandas().sort_values(
        ["query_id", "rank"]).values.tolist()
    want_t = ref_t.search(qt, k=10).toPandas().sort_values(
        ["query_id", "rank"]).values.tolist()
    assert got_t == want_t and len(got_t) > 0

    ref_v = IVFIndex(spark, str(tmp_path / "ivf_ref"), n_centroids=4)
    ref_v.build(final_df.select(F.col("doc_id").alias("vec_id"),
                                "embedding"))
    qv = to_df([doc(1), doc(13)]).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    got_v = vi.search_many(qv, k=5, nprobe=4).toPandas().sort_values(
        ["query_id", "rank"]).values.tolist()
    want_v = ref_v.search_many(qv, k=5, nprobe=4).toPandas().sort_values(
        ["query_id", "rank"]).values.tolist()
    assert got_v == want_v and len(got_v) > 0


def test_stream_index_maintain_seq_collapse(spark, tmp_path):
    """Round 9: a CDC source that emits several versions of one document
    inside a trigger interval works with ``seq_col`` — the microbatch
    collapses to the highest-seq row per id before either index is
    touched.  Covers: two versions of one doc (latest text wins), a
    delete-then-upsert of one id (the upsert wins — log-replay order),
    and a VECTOR-DROPPING replacement (v2 has no embedding: the stale
    v1 vector must leave the IVF index, not keep serving)."""
    import json as _json

    import pytest
    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.store.ivf_index import IVFIndex
    from document_vector_pipeline_spark.store.text_index import TextIndex
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_index_maintain,
    )

    def vec(i):
        return [float((i * 7 + j) % 5 - 2) for j in range(8)]

    initial = [(i, f"base text doc{i}", vec(i)) for i in range(8)]
    init_df = spark.createDataFrame(
        initial, "doc_id long, text string, embedding array<float>")
    ti = TextIndex(spark, str(tmp_path / "text"), n_term_buckets=4,
                   n_doc_buckets=2)
    ti.build(init_df.select("doc_id", "text"))
    vi = IVFIndex(spark, str(tmp_path / "ivf"), n_centroids=4)
    vi.build(init_df.select(F.col("doc_id").alias("vec_id"), "embedding"))

    # ONE microbatch carrying: doc 1 v1 then v2 (v2 drops its vector),
    # doc 2 delete(seq 1) then upsert(seq 2), doc 9 a plain new row
    batch = [
        {"doc_id": 1, "text": "stale version", "embedding": vec(1),
         "op": None, "seq": 1},
        {"doc_id": 1, "text": "fresh zebra version", "embedding": None,
         "op": None, "seq": 2},
        {"doc_id": 2, "text": None, "embedding": None,
         "op": "delete", "seq": 1},
        {"doc_id": 2, "text": "resurrected quagga", "embedding": vec(2),
         "op": None, "seq": 2},
        {"doc_id": 9, "text": "brand new okapi", "embedding": vec(9),
         "op": None, "seq": 1},
    ]
    bdir = tmp_path / "batches"
    bdir.mkdir()
    with open(bdir / "b1.json", "w") as f:
        for r in batch:
            f.write(_json.dumps(r) + "\n")
    stream_index_maintain(spark, str(bdir), ti, vi,
                          str(tmp_path / "ckpt"),
                          seq_col="seq").awaitTermination(180)

    qt = spark.createDataFrame(
        [(0, "zebra"), (1, "stale"), (2, "quagga"), (3, "okapi")],
        "query_id long, term string")
    hits = {(r["query_id"], r["doc_id"])
            for r in ti.search(qt, k=5).collect()}
    assert (0, 1) in hits          # latest version indexed
    assert (1, 1) not in hits      # stale v1 text gone
    assert (2, 2) in hits          # delete-then-upsert nets to upsert
    assert (3, 9) in hits
    # vector leg: doc 1's v2 dropped its embedding — stale v1 vector out
    live = {r["vec_id"] for r in vi._read_cells().collect()}
    assert 1 not in live and 2 in live and 9 in live

    # ambiguous: two rows sharing one id's maximal seq fail the trigger
    bdir2 = tmp_path / "batches2"
    bdir2.mkdir()
    with open(bdir2 / "b1.json", "w") as f:
        for txt in ("left", "right"):
            f.write(_json.dumps({"doc_id": 7, "text": txt,
                                 "embedding": None, "op": None,
                                 "seq": 5}) + "\n")
    with pytest.raises(Exception, match="ambiguous"):
        stream_index_maintain(spark, str(bdir2), ti, vi,
                              str(tmp_path / "ckpt2"),
                              seq_col="seq").awaitTermination(180)


def test_stream_dedup_gate_with_persisted_artifacts(spark, tmp_path):
    """Round 9: the gate run with artifacts_path admits EXACTLY the
    same documents as the recompute-per-batch form, while maintaining
    the sidecar append-only — after the drain, the sidecar holds one
    artifact row per admitted document (bootstrap + per-batch keeper
    appends, nothing for rejected rows)."""
    import json as _json

    from document_vector_pipeline_spark.streaming.ingest import (
        stream_dedup_gate,
    )

    batches = [
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different first document about spark joins"),
         (3, "the quick brown fox jumps over the lazy dog today")],
        [(4, "the quick brown fox jumps over the lazy dog today"),
         (5, "completely different first document about spark joins plus"),
         (6, "an entirely novel third topic on columnar storage")],
    ]

    def run(root, artifacts):
        bdir = root / "batches"
        bdir.mkdir(parents=True)
        for i, rows in enumerate(batches):
            with open(bdir / f"b{i}.json", "w") as f:
                for did, txt in rows:
                    f.write(_json.dumps({"doc_id": did, "text": txt})
                            + "\n")
        kw = {"artifacts_path": str(root / "art")} if artifacts else {}
        stream_dedup_gate(spark, str(bdir), str(root / "corpus"),
                          str(root / "ckpt"), threshold_milli=500,
                          **kw).awaitTermination(180)
        return {r["doc_id"] for r in
                (spark.read.option("recursiveFileLookup", "true")
                 .parquet(str(root / "corpus"))).collect()}

    plain = run(tmp_path / "plain", artifacts=False)
    side = run(tmp_path / "side", artifacts=True)
    assert side == plain and side
    art = (spark.read.option("recursiveFileLookup", "true")
           .parquet(str(tmp_path / "side" / "art")))
    assert {r["doc_id"] for r in art.select("doc_id").collect()} == side
    assert set(art.columns) == {"doc_id", "fp", "bands", "shingles", "n"}


def test_stream_dedup_gate_replay_is_idempotent(spark, tmp_path):
    """Round 9: both gate sinks use batch_id-keyed overwrite, so a full
    replay (fresh checkpoint over the same inbox — the worst-case
    foreachBatch retry) rewrites the same per-batch directories instead
    of doubling rows: corpus and sidecar row COUNTS are unchanged, not
    just id sets."""
    import json as _json

    from document_vector_pipeline_spark.streaming.ingest import (
        stream_dedup_gate,
    )

    inbox = tmp_path / "in"
    inbox.mkdir()
    with open(inbox / "b1.json", "w") as f:
        f.write(_json.dumps({"doc_id": 1, "text": "alpha beta gamma "
                             "delta epsilon zeta"}) + "\n")
        f.write(_json.dumps({"doc_id": 2, "text": "one two three four "
                             "five six seven"}) + "\n")

    def counts():
        c = (spark.read.option("recursiveFileLookup", "true")
             .parquet(str(tmp_path / "corpus"))).count()
        a = (spark.read.option("recursiveFileLookup", "true")
             .parquet(str(tmp_path / "art"))).count()
        return c, a

    stream_dedup_gate(spark, str(inbox), str(tmp_path / "corpus"),
                      str(tmp_path / "ck1"),
                      artifacts_path=str(tmp_path / "art")) \
        .awaitTermination(120)
    first = counts()
    assert first == (2, 2)
    # full replay: fresh checkpoint, same inbox, same batch ids
    stream_dedup_gate(spark, str(inbox), str(tmp_path / "corpus"),
                      str(tmp_path / "ck2"),
                      artifacts_path=str(tmp_path / "art")) \
        .awaitTermination(120)
    assert counts() == first


def _write_jsonl(path, rows):
    import json

    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_stream_merge_apply_exactly_once_and_seq_collapse(spark, tmp_path):
    """Three-file CDC drain: latest-wins collapse inside a trigger, one
    manifest version per trigger, and a full fresh-checkpoint replay
    changes NOTHING (batch-id stamps detected off the manifest log)."""
    import shutil

    from document_vector_pipeline_spark.store.versioned import (
        BucketedVersionedTable,
    )
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_merge_apply,
    )

    vt = BucketedVersionedTable(spark, str(tmp_path / "t"),
                                bucket_col="b")
    base = spark.createDataFrame(
        [(i, f"t{i}", str(i % 2)) for i in range(8)],
        "id long, text string, b string")
    vt.commit_overwrite(base)
    bdir = tmp_path / "batches"
    bdir.mkdir()
    # batch 1: id 1 carried twice (seq 1 stale, seq 2 wins) + id 2 delete
    _write_jsonl(bdir / "b1.json", [
        {"id": 1, "text": "stale", "b": "1", "op": "upsert", "seq": 1},
        {"id": 1, "text": "fresh", "b": "1", "op": "upsert", "seq": 2},
        {"id": 2, "text": None, "b": "0", "op": "delete", "seq": 1},
    ])
    # batch 2: insert id 100
    _write_jsonl(bdir / "b2.json", [
        {"id": 100, "text": "new", "b": "0", "op": "upsert", "seq": 1},
    ])
    schema = "id long, text string, b string, op string, seq long"

    def drain(ck):
        stream_merge_apply(spark, str(bdir), vt, ["id"], str(ck),
                           schema=schema, seq_col="seq").awaitTermination()

    drain(tmp_path / "ck1")
    got = {r["id"]: r["text"] for r in vt.read().collect()}
    assert got[1] == "fresh" and 2 not in got and got[100] == "new"
    assert len(vt.versions()) == 3          # v0 + one per trigger
    ops = [vt._manifest(v)["op"] for v in vt.versions()]
    import hashlib as _hashlib

    feed = _hashlib.sha256(str(bdir).encode()).hexdigest()[:12]
    assert ops[1:] == [f"merge:{feed}:b0", f"merge:{feed}:b1"]
    # fresh checkpoint = full replay; every batch must self-detect
    drain(tmp_path / "ck2")
    assert len(vt.versions()) == 3
    assert {r["id"]: r["text"] for r in vt.read().collect()} == got
    # a SECOND feed (different batch dir, fresh checkpoint) pointed at
    # the same table must NOT have its first batches misread as replays
    # of the first feed's high stamps — stamps are feed-scoped
    bdir2 = tmp_path / "batches2"
    bdir2.mkdir()
    _write_jsonl(bdir2 / "c1.json", [
        {"id": 200, "text": "feed2", "b": "0", "op": "upsert", "seq": 1},
    ])
    stream_merge_apply(spark, str(bdir2), vt, ["id"],
                       str(tmp_path / "ck3"), schema=schema,
                       seq_col="seq").awaitTermination()
    got2 = {r["id"]: r["text"] for r in vt.read().collect()}
    assert got2[200] == "feed2"
    assert len(vt.versions()) == 4
    # an explicit stream_id overrides the path hash in the stamp
    _write_jsonl(bdir2 / "c2.json", [
        {"id": 201, "text": "named", "b": "1", "op": "upsert", "seq": 1},
    ])
    stream_merge_apply(spark, str(bdir2), vt, ["id"],
                       str(tmp_path / "ck4"), schema=schema,
                       seq_col="seq", stream_id="feed-two"
                       ).awaitTermination()
    ops = [vt._manifest(v)["op"] for v in vt.versions()]
    assert any(op.startswith("merge:feed-two:b") for op in ops)


def test_stream_merge_apply_legacy_stamps_keep_replay_detection(
        spark, tmp_path):
    """Round-12 ADVICE fix: a table whose merge stamps predate feed
    scoping (``merge:b{id}``, no feed segment) keeps replay detection —
    a fresh-checkpoint re-drain against it applies NOTHING instead of
    re-applying every batch (extra versions / value regressions)."""
    from document_vector_pipeline_spark.store.versioned import (
        BucketedVersionedTable,
    )
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_merge_apply,
    )

    vt = BucketedVersionedTable(spark, str(tmp_path / "t"),
                                bucket_col="b")
    vt.commit_overwrite(spark.createDataFrame(
        [(1, "base", "0")], "id long, text string, b string"))
    bdir = tmp_path / "batches"
    bdir.mkdir()
    _write_jsonl(bdir / "b1.json", [
        {"id": 1, "text": "applied-pre-upgrade", "b": "0",
         "op": "upsert", "seq": 1},
    ])
    schema = "id long, text string, b string, op string, seq long"
    # Simulate the pre-round-11 engine: the batch was applied under the
    # LEGACY stamp format (merge:b0, no feed segment).
    src = (spark.createDataFrame(
        [(1, "applied-pre-upgrade", "0", False)],
        "id long, text string, b string, _deleted boolean"))
    vt.merge(src, ["id"], op="merge:b0")
    n_versions = len(vt.versions())
    # Fresh checkpoint against the same batch directory: batch 0 must
    # be detected as already applied via the legacy stamp.
    stream_merge_apply(spark, str(bdir), vt, ["id"],
                       str(tmp_path / "ck"), schema=schema,
                       seq_col="seq").awaitTermination()
    assert len(vt.versions()) == n_versions
    got = {r["id"]: r["text"] for r in vt.read().collect()}
    assert got == {1: "applied-pre-upgrade"}
    # ...while a genuinely NEW batch (id 1 past the legacy stamp)
    # still applies on the next drain.
    _write_jsonl(bdir / "b2.json", [
        {"id": 2, "text": "post-upgrade", "b": "1",
         "op": "upsert", "seq": 1},
    ])
    stream_merge_apply(spark, str(bdir), vt, ["id"],
                       str(tmp_path / "ck2"), schema=schema,
                       seq_col="seq").awaitTermination()
    got = {r["id"]: r["text"] for r in vt.read().collect()}
    assert got == {1: "applied-pre-upgrade", 2: "post-upgrade"}


def test_legacy_stamp_not_attributed_on_multifeed_table(spark, tmp_path):
    """Round-13 ADVICE fix: once a feed-scoped stamp from ANOTHER feed
    exists in the log, a legacy ``merge:b{id}`` stamp is no longer
    attributable to any particular feed — a NEW feed's batch 0 must
    APPLY rather than be silently skipped as a replay of the legacy
    stamp (which would be silent data loss)."""
    from document_vector_pipeline_spark.store.versioned import (
        BucketedVersionedTable,
    )
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_merge_apply,
    )

    vt = BucketedVersionedTable(spark, str(tmp_path / "t"),
                                bucket_col="b")
    vt.commit_overwrite(spark.createDataFrame(
        [(1, "base", "0")], "id long, text string, b string"))
    # legacy stamp (pre-feed-scoping engine) covering batch ids <= 3
    src = spark.createDataFrame(
        [(1, "legacy-write", "0", False)],
        "id long, text string, b string, _deleted boolean")
    vt.merge(src, ["id"], op="merge:b3")
    # a DIFFERENT feed later attached with a scoped stamp — the table
    # is provably multi-feed from here on
    src2 = spark.createDataFrame(
        [(2, "feed-one-write", "1", False)],
        "id long, text string, b string, _deleted boolean")
    vt.merge(src2, ["id"], op="merge:feed-one:b0")
    # now a THIRD feed drains batch 0: the legacy stamp (3 >= 0) must
    # NOT swallow it
    bdir = tmp_path / "batches"
    bdir.mkdir()
    _write_jsonl(bdir / "b1.json", [
        {"id": 3, "text": "feed-two-batch0", "b": "2",
         "op": "upsert", "seq": 1},
    ])
    schema = "id long, text string, b string, op string, seq long"
    stream_merge_apply(spark, str(bdir), vt, ["id"],
                       str(tmp_path / "ck"), schema=schema,
                       seq_col="seq", stream_id="feed-two"
                       ).awaitTermination()
    got = {r["id"]: r["text"] for r in vt.read().collect()}
    assert got[3] == "feed-two-batch0"
    # and the single-feed legacy path (previous test) still holds:
    # feed-two's OWN scoped stamp now guards its replays
    stream_merge_apply(spark, str(bdir), vt, ["id"],
                       str(tmp_path / "ck2"), schema=schema,
                       seq_col="seq", stream_id="feed-two"
                       ).awaitTermination()
    ops = [vt._manifest(v)["op"] for v in vt.versions()]
    assert sum(op == "merge:feed-two:b0" for op in ops) == 1


def test_stream_late_audit_flags_and_measures_late_rows(spark, tmp_path):
    """Batch 0 advances the watermark to 11:00-10m; batch 1's 10:30 row
    is late by exactly 20 minutes. A fresh-checkpoint re-drain rewrites
    identical audit rows (batch-keyed idempotent sink)."""
    from document_vector_pipeline_spark.streaming.ingest import (
        read_late_audit,
        stream_late_audit,
    )

    def us(h, m):
        import datetime

        return int(datetime.datetime(
            2024, 1, 1, h, m, tzinfo=datetime.timezone.utc).timestamp()
        ) * 1_000_000

    bdir = tmp_path / "b"
    bdir.mkdir()
    _write_jsonl(bdir / "b0.json", [
        {"id": 1, "ts_us": us(10, 0)},
        {"id": 2, "ts_us": us(11, 0)},
    ])
    _write_jsonl(bdir / "b1.json", [
        {"id": 3, "ts_us": us(10, 30)},     # 20 min behind the watermark
        {"id": 4, "ts_us": us(11, 5)},      # on time
    ])
    # the file source orders batches by mtime — pin it explicitly (two
    # writes can land inside one filesystem timestamp granule)
    import os as _os

    _os.utime(bdir / "b0.json", (1_700_000_000, 1_700_000_000))
    _os.utime(bdir / "b1.json", (1_700_000_100, 1_700_000_100))
    audit = str(tmp_path / "audit")
    schema = "id long, ts_us long"

    def drain(ck):
        stream_late_audit(spark, str(bdir), audit, str(tmp_path / ck),
                          schema=schema, ts_col="ts_us",
                          delay_seconds=600).awaitTermination()

    drain("ck1")
    rows = {r["batch_id"]: r for r in read_late_audit(spark, audit).collect()}
    assert rows[0]["n_rows"] == 2 and rows[0]["n_late"] == 0
    assert rows[0]["max_lag_us"] == 0
    assert rows[1]["n_rows"] == 2 and rows[1]["n_late"] == 1
    assert rows[1]["max_lag_us"] == 20 * 60 * 1_000_000
    drain("ck2")                             # full replay: identical audit
    again = {r["batch_id"]: r
             for r in read_late_audit(spark, audit).collect()}
    assert {k: tuple(v) for k, v in rows.items()} \
        == {k: tuple(v) for k, v in again.items()}


def test_stream_merge_apply_constraint_gate_stops_the_feed(spark,
                                                           tmp_path):
    """A microbatch violating a declared constraint fails its trigger
    with NO version written; the table still serves the last good
    snapshot."""
    import pyspark.errors

    from document_vector_pipeline_spark.store.versioned import (
        BucketedVersionedTable,
    )
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_merge_apply,
    )

    vt = BucketedVersionedTable(spark, str(tmp_path / "t"), bucket_col="b")
    vt.commit_overwrite(spark.createDataFrame(
        [(1, "x", "0")], "id long, text string, b string"))
    bdir = tmp_path / "batches"
    bdir.mkdir()
    _write_jsonl(bdir / "b1.json", [
        {"id": 2, "text": None, "b": "0", "op": "upsert"},   # null text
    ])
    q = stream_merge_apply(
        spark, str(bdir), vt, ["id"], str(tmp_path / "ck"),
        schema="id long, text string, b string, op string",
        constraints={"not_null": ["text"]})
    try:
        q.awaitTermination()
        raised = False
    except pyspark.errors.exceptions.captured.StreamingQueryException:
        raised = True
    assert raised
    assert vt.versions() == [0]
    assert [r["id"] for r in vt.read().collect()] == [1]


def test_stream_dim_join_pins_version_per_trigger(spark, tmp_path):
    """Each microbatch joins the dimension AS OF its latest committed
    version: a dimension commit between triggers is picked up at the
    NEXT trigger (never mid-batch), and every output row is stamped
    with the version that enriched it.  A fresh-checkpoint replay
    against the now-newer dimension rewrites batch dirs under the new
    version — the documented observable difference."""
    from document_vector_pipeline_spark.store.versioned import (
        BucketedVersionedTable,
    )
    from document_vector_pipeline_spark.streaming.ingest import (
        read_dim_joined,
        stream_dim_join,
    )

    dim = BucketedVersionedTable(spark, str(tmp_path / "dim"),
                                 bucket_col="b")
    dim.commit_overwrite(spark.createDataFrame(
        [(1, "north", "0"), (2, "south", "1")],
        "user_id long, region string, b string"))
    bdir = tmp_path / "batches"
    bdir.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    schema = "event_id long, user_id long"
    _write_jsonl(bdir / "b0.json", [{"event_id": 10, "user_id": 1},
                                    {"event_id": 11, "user_id": 3}])
    stream_dim_join(spark, str(bdir), dim, ["user_id"], out, ck,
                    schema=schema).awaitTermination()
    # dimension evolves BETWEEN triggers: user 1 moves, user 3 appears
    dim.upsert(spark.createDataFrame(
        [(1, "east", "0"), (3, "west", "1")],
        "user_id long, region string, b string"), ["user_id"])
    _write_jsonl(bdir / "b1.json", [{"event_id": 20, "user_id": 1},
                                    {"event_id": 21, "user_id": 3}])
    stream_dim_join(spark, str(bdir), dim, ["user_id"], out, ck,
                    schema=schema).awaitTermination()
    rows = {r["event_id"]: r for r in
            read_dim_joined(spark, out).collect()}
    # trigger 1 saw v0: user 1 = north, user 3 unknown
    assert rows[10]["region"] == "north" and rows[10]["dim_version"] == 0
    assert rows[11]["region"] is None and rows[11]["dim_version"] == 0
    # trigger 2 saw v1: the commit landed at the NEXT trigger
    assert rows[20]["region"] == "east" and rows[20]["dim_version"] == 1
    assert rows[21]["region"] == "west" and rows[21]["dim_version"] == 1


def test_stream_index_maintain_survives_restart(spark, tmp_path):
    """Round-13 verdict item 7 — kill-and-resume for the index
    maintainer: drain batch 1, STOP (the driver-crash boundary), add
    batch 2, restart from the SAME checkpoint.  The restart must apply
    ONLY batch 2 (offsets live in the checkpoint — segment count pins
    it), and both serving indexes end bit-identical to batch builds
    over the final corpus, exactly as an uninterrupted run would."""
    import json as _json

    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.store.ivf_index import IVFIndex
    from document_vector_pipeline_spark.store.text_index import TextIndex
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_index_maintain,
    )

    def doc(i, tag=""):
        txt = f"alpha beta doc{i} {tag}".strip()
        vec = [float((i * 7 + j) % 5 - 2) for j in range(8)]
        return {"doc_id": i, "text": txt, "embedding": vec}

    def to_df(rows):
        return spark.createDataFrame(
            [(r["doc_id"], r["text"], r["embedding"]) for r in rows],
            "doc_id long, text string, embedding array<float>")

    initial = [doc(i) for i in range(6)]
    b1 = [doc(i) for i in range(6, 10)]
    b2 = ([doc(10), doc(3, tag="edited")]
          + [{"doc_id": 4, "text": None, "embedding": None,
              "op": "delete"}])

    ti = TextIndex(spark, str(tmp_path / "text"), n_term_buckets=4,
                   n_doc_buckets=2)
    ti.build(to_df(initial).select("doc_id", "text"))
    vi = IVFIndex(spark, str(tmp_path / "ivf"), n_centroids=4)
    vi.build(to_df(initial).select(F.col("doc_id").alias("vec_id"),
                                   "embedding"))
    bdir = tmp_path / "batches"
    bdir.mkdir()
    with open(bdir / "b1.json", "w") as f:
        for r in b1:
            f.write(_json.dumps(r) + "\n")
    ck = str(tmp_path / "ckpt")
    stream_index_maintain(spark, str(bdir), ti, vi, ck,
                          rebuild_check_every=0).awaitTermination(180)
    segs_after_run1 = len(ti._manifest()["segments"])
    # stopped between triggers; batch 2 lands, restart SAME checkpoint
    with open(bdir / "b2.json", "w") as f:
        for r in b2:
            f.write(_json.dumps(r) + "\n")
    stream_index_maintain(spark, str(bdir), ti, vi, ck,
                          rebuild_check_every=0).awaitTermination(180)
    # exactly-once across the restart: ONE new segment (batch 2) —
    # a replayed batch 1 would have written a second
    assert len(ti._manifest()["segments"]) == segs_after_run1 + 1

    final = {r["doc_id"]: r for r in initial + b1 + b2
             if r.get("op") != "delete"}
    final.pop(4, None)
    final_df = to_df(sorted(final.values(), key=lambda r: r["doc_id"]))
    ref_t = TextIndex(spark, str(tmp_path / "tref"), n_term_buckets=4,
                      n_doc_buckets=2)
    ref_t.build(final_df.select("doc_id", "text"))
    qt = spark.createDataFrame(
        [(0, "doc3"), (0, "edited"), (1, "doc7"), (2, "doc4")],
        "query_id long, term string")
    assert (ti.search(qt, k=10).toPandas().sort_values(
                ["query_id", "rank"]).values.tolist()
            == ref_t.search(qt, k=10).toPandas().sort_values(
                ["query_id", "rank"]).values.tolist())
    ref_v = IVFIndex(spark, str(tmp_path / "vref"), n_centroids=4)
    ref_v.build(final_df.select(F.col("doc_id").alias("vec_id"),
                                "embedding"))
    qv = to_df([doc(1), doc(8)]).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    got_v = vi.search_many(qv, k=5, nprobe=4).toPandas().sort_values(
        ["query_id", "rank"]).values.tolist()
    want_v = ref_v.search_many(qv, k=5, nprobe=4).toPandas().sort_values(
        ["query_id", "rank"]).values.tolist()
    assert got_v == want_v and len(got_v) > 0


def test_stream_merge_apply_survives_restart(spark, tmp_path):
    """Kill-and-resume for the CDC merge stream: stop after batch 0,
    add batch 1, restart from the SAME checkpoint — exactly one new
    version lands (the exactly-once batch stamps are per-feed and the
    checkpoint carries the offsets), and the table equals what an
    uninterrupted drain of both batches produces."""
    from document_vector_pipeline_spark.store.versioned import (
        BucketedVersionedTable,
    )
    from document_vector_pipeline_spark.streaming.ingest import (
        stream_merge_apply,
    )

    vt = BucketedVersionedTable(spark, str(tmp_path / "t"),
                                bucket_col="b")
    vt.commit_overwrite(spark.createDataFrame(
        [(1, "one", "0"), (2, "two", "1")],
        "id long, text string, b string"))
    bdir = tmp_path / "batches"
    bdir.mkdir()
    schema = "id long, text string, b string, op string, seq long"
    _write_jsonl(bdir / "b0.json", [
        {"id": 2, "text": "two-v2", "b": "1", "op": "upsert", "seq": 1},
        {"id": 3, "text": "three", "b": "2", "op": "upsert", "seq": 1},
    ])
    ck = str(tmp_path / "ck")
    stream_merge_apply(spark, str(bdir), vt, ["id"], ck, schema=schema,
                       seq_col="seq", stream_id="feed"
                       ).awaitTermination(180)
    assert len(vt.versions()) == 2
    # crash boundary: batch 1 arrives, restart from the SAME checkpoint
    _write_jsonl(bdir / "b1.json", [
        {"id": 1, "text": None, "b": "0", "op": "delete", "seq": 2},
        {"id": 4, "text": "four", "b": "3", "op": "upsert", "seq": 2},
    ])
    stream_merge_apply(spark, str(bdir), vt, ["id"], ck, schema=schema,
                       seq_col="seq", stream_id="feed"
                       ).awaitTermination(180)
    ops = [vt._manifest(v)["op"] for v in vt.versions()]
    # exactly one version per batch, stamps monotone, no replays
    assert len(vt.versions()) == 3
    assert ops[1:] == ["merge:feed:b0", "merge:feed:b1"]
    got = {r["id"]: r["text"] for r in vt.read().collect()}
    assert got == {2: "two-v2", 3: "three", 4: "four"}
