"""Streaming ingest: the Structured-Streaming equivalent of the reference's
blob trigger (BlobTriggerFunction.cs:40-56).

The file source gives create-event semantics (each new file under the
watched directory is processed exactly once, offsets checkpointed); the
per-microbatch handler runs the SAME declarative pipeline as batch mode
(blobs_to_chunks → add_embeddings → VectorStore.upsert) via foreachBatch,
because upsert-merge is not an append-only sink.

At scale this is the always-on variant of the pipeline: the reference's
"one function invocation per blob" becomes "one microbatch per file
batch", with maxFilesPerTrigger bounding latency vs. throughput.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from document_vector_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig
from document_vector_pipeline_spark.operators.embed import add_embeddings
from document_vector_pipeline_spark.operators.pipeline import blobs_to_chunks
from document_vector_pipeline_spark.sources import stream_text_blobs
from document_vector_pipeline_spark.store.vector_store import VectorStore


def stream_ingest(spark: SparkSession, blob_path: str, store: VectorStore,
                  checkpoint: str,
                  cfg: PipelineConfig = DEFAULT_CONFIG,
                  available_now: bool = True,
                  embed_client=None,
                  embed_retry_delay_s: float = 10.0,
                  ivf_index=None,
                  text_index=None) -> StreamingQuery:
    """Watch `blob_path`; upsert each microbatch of new files into `store`.

    available_now=True drains everything currently present and stops
    (test/backfill mode); False runs continuously.

    ``embed_client`` routes each microbatch's chunks through
    ``embed_with_client`` (the injectable REST client with the
    reference's batch=10 / retry-on-429/401 policy, operators/embed.py)
    instead of the built-in hash embedder — the always-on variant of
    the reference's per-blob embed call (BlobTriggerFunction.cs:
    103-160): retries happen INSIDE the microbatch, so a transient
    throttle never fails the streaming query.

    ``ivf_index`` (a pre-built ``IVFIndex`` — centroids/codebook are
    frozen index metadata, trained offline) keeps the SERVING index
    fresh alongside the store: every microbatch's chunk embeddings are
    incrementally upserted (touched cells only, PQ re-encode against
    the frozen codebook) under a synthetic stable id
    xxhash64(document_url # chunk_number); re-ingest is per-document
    REPLACE — stale chunk vectors beyond a shrunken document's new
    chunk count are deleted from the index via the keys
    ``replace_documents`` reports — the always-on version of the
    reference's per-upsert Cosmos index maintenance.

    ``text_index`` (a built ``TextIndex``) is the KEYWORD twin: each
    microbatch's chunks are upserted as one new immutable segment
    (chunk-grain postings under the same synthetic id), and stale
    chunks of shrunken documents are tombstoned — so the BM25 leg of
    hybrid serving stays as fresh as the vector leg, O(batch) per
    microbatch."""
    blobs = stream_text_blobs(spark, blob_path)

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        chunks = blobs_to_chunks(batch_df, cfg)
        if embed_client is not None:
            from document_vector_pipeline_spark.operators.embed import (
                embed_with_client,
            )
            chunks = embed_with_client(chunks, embed_client,
                                       retry_delay_s=embed_retry_delay_s)
        else:
            chunks = add_embeddings(chunks, cfg=cfg)
        # materialize once: the store replace and the index upserts must
        # see the same chunks without re-running the embed stage
        if ivf_index is not None or text_index is not None:
            chunks = chunks.localCheckpoint(eager=True)
        # per-document REPLACE, not key-merge: a re-ingested document
        # that shrank must lose its stale higher-numbered chunks in the
        # store AND the serving indexes (replace_documents returns
        # exactly the dropped keys)
        stale = store.replace_documents(chunks)  # checkpointed inside
        # in the common no-shrink microbatch there is nothing stale:
        # skip the index delete calls entirely (one cheap isEmpty on the
        # checkpointed frame) instead of appending empty tombstone files
        # and rewriting index metadata twice per batch
        has_stale = ((ivf_index is not None or text_index is not None)
                     and not stale.isEmpty())
        stale_ids = stale.select(
            F.xxhash64(F.concat_ws("#", F.col("document_url"),
                                   F.col("id"))).alias("vec_id"))
        chunk_key = F.xxhash64(F.concat_ws(
            "#", F.col("document_url"),
            F.col("chunk_number").cast("string")))
        if ivf_index is not None:
            if has_stale:
                ivf_index.delete(stale_ids)
            ivf_index.upsert(chunks.select(chunk_key.alias("vec_id"),
                                           F.col("embedding")))
        if text_index is not None:
            if has_stale:
                text_index.delete(stale_ids.select(
                    F.col("vec_id").alias("doc_id")))
            text_index.upsert(chunks.select(chunk_key.alias("doc_id"),
                                            F.col("chunk_text")),
                              id_col="doc_id", text_col="chunk_text")
            # every microbatch adds a segment; fold them back down once
            # the count crosses the background-merge threshold
            text_index.maybe_compact()

    writer = (blobs.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ingest_versioned(spark: SparkSession, blob_path: str,
                            vstore, checkpoint: str,
                            cfg: PipelineConfig = DEFAULT_CONFIG,
                            available_now: bool = True,
                            embed_client=None,
                            embed_retry_delay_s: float = 10.0) -> StreamingQuery:
    """Always-on ingest into a VersionedVectorStore: every non-empty
    microbatch becomes ONE manifest commit (replace_documents — the
    re-ingest of a shrunken document purges its stale chunks in the new
    version), so the stream leaves an AUDITABLE history: ``history()``
    shows exactly which blob batches arrived when, any prior state stays
    searchable (``search_many(version=N)``), and a retrieval eval pinned
    mid-stream replays byte-identical forever.  The commit is
    bucket-incremental — a microbatch touching few documents rewrites
    only their hash buckets, whatever the table's total size — which is
    what makes an always-on commit-per-batch log viable at 100 TB.
    The mutate-in-place twin is ``stream_ingest`` (the reference's
    semantics, BlobTriggerFunction.cs:40-56); same file-source
    exactly-once contract via the checkpointed offsets."""
    blobs = stream_text_blobs(spark, blob_path)

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        chunks = blobs_to_chunks(batch_df, cfg)
        if embed_client is not None:
            from document_vector_pipeline_spark.operators.embed import (
                embed_with_client,
            )
            chunks = embed_with_client(chunks, embed_client,
                                       retry_delay_s=embed_retry_delay_s)
        else:
            chunks = add_embeddings(chunks, cfg=cfg)
        vstore.replace_documents(chunks)

    writer = (blobs.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_blob_events(spark: SparkSession, events_path: str,
                       store: VectorStore, checkpoint: str,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       available_now: bool = True) -> StreamingQuery:
    """Streaming CDC: watch a directory of blob-event JSONL files
    (seq, op, document_url, content) and apply each microbatch with
    apply_blob_events — creates AND deletes, the full event surface of
    the reference's trigger (its delete branch is a TODO;
    BlobTriggerFunction.cs:163-169)."""
    from document_vector_pipeline_spark.operators.pipeline import (
        apply_blob_events,
    )

    schema = ("seq long, op string, document_url string, content string")
    events = spark.readStream.schema(schema).json(events_path)

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_blob_events(batch_df, store, cfg)

    writer = (events.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_gate(spark: SparkSession, batches_path: str,
                      corpus_path: str, checkpoint: str,
                      available_now: bool = True,
                      threshold_milli: int = 500,
                      artifacts_path: str | None = None) -> StreamingQuery:
    """Always-on crawl admission gate: each microbatch of candidate
    documents (JSONL files of (doc_id, text) under ``batches_path``) is
    judged against the CURRENT admitted corpus with
    operators/dedup.incremental_dedup; keepers are appended to the
    corpus parquet at ``corpus_path``, rejects are dropped.  Documents
    admitted in batch N are part of the corpus batch N+1 is judged
    against — the sequential semantics a crawl pipeline needs (a page
    and its later near-copy cannot both be admitted).

    Within one microbatch, exact duplicates collapse to the smallest id
    before admission; NEAR-dups inside a single microbatch can both be
    admitted (judging a batch against itself would reject legitimate
    first occurrences on symmetric collisions) — the periodic
    minhash_lsh_pairs backfill over the admitted corpus is the
    catch-all for those, exactly as in production curation stacks.

    Scale: each microbatch costs the batch-bounded band/fingerprint
    joins of incremental_dedup; the writes touch only the batch's
    rows.  Without ``artifacts_path`` the corpus-side signatures are
    recomputed from admitted text each trigger (self-contained, fine
    for tests).  WITH ``artifacts_path`` the gate maintains a
    PERSISTED dedup_artifacts sidecar: bootstrap once from whatever
    corpus already exists, read the columnar artifacts per trigger
    instead of re-tokenizing the corpus, and write only the keepers'
    artifact rows after each admission — at 100 TB the difference
    between a per-batch corpus recompute and a signature-table scan.
    Verdicts are bit-identical either way
    (incremental_dedup_artifacts materializes the same expressions).

    Exactly-once: both sinks use the batch_id-keyed idempotent-write
    idiom — each trigger OVERWRITES its own ``batch_<id>``
    subdirectory under the corpus and sidecar roots (reads use a
    recursive file lookup).  foreachBatch replays a failed trigger
    after restart; with two independent appends a crash between them
    would re-admit the batch against a sidecar that never saw it and
    double the corpus rows.  Per-batch overwrite alone is not enough
    either: a replay would judge the batch against state containing
    its OWN first attempt and self-reject, so the gate also anti-joins
    the batch's ids out of the judged state (ids are unique per
    document — any state row carrying a batch id IS that earlier
    attempt), making replay verdicts deterministic and the overwrite
    a true no-op rewrite."""
    from document_vector_pipeline_spark.operators.dedup import (
        dedup_artifacts,
        exact_dedup_survivors,
        incremental_dedup,
        incremental_dedup_artifacts,
    )

    schema = "doc_id long, text string"
    batches = spark.readStream.schema(schema).json(batches_path)

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.localCheckpoint(eager=True)
        # within-batch exact collapse (min id per canonical fingerprint)
        firsts = exact_dedup_survivors(batch_df).select("doc_id")
        batch_df = batch_df.join(firsts, "doc_id", "left_semi")
        # Probe for the corpus EXPLICITLY: only a genuinely absent path
        # means "first batch, empty corpus".  A corrupted file or a
        # transient FS error must PROPAGATE so the microbatch retries —
        # swallowing it would silently admit near-duplicates of
        # already-admitted documents.
        jvm = spark._jvm.org.apache.hadoop.fs.Path
        jvm_path = jvm(corpus_path)
        fs = jvm_path.getFileSystem(
            spark._jsc.hadoopConfiguration())
        if fs.exists(jvm_path):
            corpus = (spark.read.schema(schema)
                      .option("recursiveFileLookup", "true")
                      .parquet(corpus_path))
        else:
            corpus = spark.createDataFrame([], schema)
        # Judge against the state MINUS this batch's own ids: ids are
        # unique per document, so any state row with a batch id is this
        # batch's own earlier (crashed/replayed) attempt — leaving it
        # in would make the replay self-reject and the idempotent
        # overwrite below would then wipe the rows.  Batch-bounded
        # broadcast anti-joins.
        bids = F.broadcast(batch_df.select("doc_id"))
        corpus = corpus.join(bids, "doc_id", "left_anti")
        if artifacts_path is not None:
            # bootstrap the sidecar exactly once (covers a pre-existing
            # corpus without one); afterwards every trigger reads the
            # columnar artifacts — no corpus re-tokenization
            if not fs.exists(jvm(artifacts_path)):
                (dedup_artifacts(corpus).write.mode("overwrite")
                 .parquet(os.path.join(artifacts_path, "bootstrap")))
            art = (spark.read.option("recursiveFileLookup", "true")
                   .parquet(artifacts_path)
                   .join(bids, "doc_id", "left_anti"))
            verdicts = incremental_dedup_artifacts(
                art, batch_df, threshold_milli=threshold_milli)
        else:
            verdicts = incremental_dedup(
                corpus, batch_df, threshold_milli=threshold_milli)
        keep = verdicts.filter(F.col("keep")).select("doc_id")
        # checkpoint: keepers feeds TWO writes (corpus + sidecar) and
        # its lineage reads the sidecar being written — materialize
        # once so neither write re-runs the verdict joins or re-reads
        # a directory mid-write
        keepers = (batch_df.join(keep, "doc_id", "left_semi")
                   .localCheckpoint(eager=True))
        (keepers.write.mode("overwrite")
         .parquet(os.path.join(corpus_path, f"batch_{batch_id}")))
        if artifacts_path is not None and not keepers.isEmpty():
            # O(batch) sidecar maintenance: only the admitted rows'
            # artifacts land (an all-rejected batch writes nothing)
            (dedup_artifacts(keepers).write.mode("overwrite")
             .parquet(os.path.join(artifacts_path, f"batch_{batch_id}")))

    writer = (batches.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_index_maintain(spark: SparkSession, batches_path: str,
                          text_index, ivf_index, checkpoint: str,
                          available_now: bool = True,
                          max_files_per_trigger: int = 1,
                          compact_opts: dict | None = None,
                          rebuild_check_every: int = 8,
                          seq_col: str | None = None) -> StreamingQuery:
    """Streaming maintenance of BOTH persisted serving indexes — the
    freshness loop that closes the gap between "the stream keeps the
    STORE current" (stream_ingest) and "the serving tier answers from
    PRE-BUILT indexes" (TextIndex / IVFIndex): without it, every
    streamed document is invisible to indexed search until the next
    batch rebuild.

    Each microbatch of (doc_id, text, embedding) JSONL rows is applied
    as ONE TextIndex.upsert (a new immutable segment + tombstones for
    replaced ids, manifest-atomic, O(batch)) and ONE IVFIndex.upsert
    (assignment against the FROZEN centroids is map-only; only the
    touched cells and idmap buckets rewrite, O(batch)) — so the
    per-microbatch cost is bounded by the batch regardless of index
    size, the property that makes an always-on maintainer viable at
    100 TB.  Rows with a NULL embedding are keyword-only documents:
    the text leg indexes them, and the vector leg treats them as
    DELETES of any previously-served vector for that id (IVFIndex.
    upsert routes null-embedding ids through delete) — a replacement
    that drops its embedding must not leave the stale old vector
    serving.

    Exactness: both indexes' upserts maintain exact statistics
    (BM25 df/dl deltas; frozen-codebook re-encode), so after the
    stream drains, indexed search over the maintained indexes is
    bit-identical to a scan of the full corpus — that equivalence IS
    the oracle of the stream_index_maintain contract key.

    Failure semantics: foreachBatch retries a failed microbatch after
    restart (offsets checkpoint only on success).  TextIndex.upsert is
    manifest-atomic, so a replayed batch re-applies cleanly (same ids
    tombstone their previous segment).  IVFIndex maintenance is
    derived-data (see ivf_index.py's crash-recovery contract): a torn
    cell write is repaired by the replay's own anti-join-then-merge.

    A microbatch carrying the SAME doc_id twice fails its trigger —
    both indexes refuse ambiguous upserts (the Delta-MERGE
    multiple-source-rows-match discipline) rather than pick a survivor
    nondeterministically.  A source that can emit several versions of
    one document inside a trigger interval (any real CDC feed) should
    pass ``seq_col``: the source schema gains that long column and
    each microbatch collapses to the HIGHEST-seq row per doc_id before
    either index is touched (the surviving row's op decides delete vs
    upsert — log-replay latest-wins).  Rows with a NULL seq sort below
    every non-null seq; a doc_id whose maximal seq is carried by MORE
    than one row is still ambiguous and fails the trigger.

    CDC deletes: rows may carry ``op: "delete"`` (any other value, or
    the field absent, means upsert).  Deletes in a microbatch apply
    BEFORE its upserts — so a batch that deletes id X and upserts id X
    nets to the new version, matching CDC log-replay order per trigger.
    Both indexes' deletes are O(batch): tombstones for the text leg,
    touched-cell rewrites for the vector leg; deleting a never-indexed
    id is a no-op on both.

    Self-maintenance: an always-on maintainer writes one text segment
    (and possibly a tombstone dir) per trigger, so segment/tombstone
    volume grows with uptime — after each batch the stream consults
    ``TextIndex.maybe_compact(**compact_opts)`` (manifest-metadata-only
    below its thresholds, a full merge above) and, every
    ``rebuild_check_every`` batches, ``IVFIndex.maybe_rebuild()`` (a
    partition-column stats scan below threshold; a rebuild from the
    index's own live rows above — the frozen-centroid drift check).
    Set ``rebuild_check_every=0`` to disable the drift check.  Neither
    policy changes search results — compaction is exact and rebuilds
    only re-cluster.
    """
    schema = "doc_id long, text string, embedding array<float>, op string"
    if seq_col is not None:
        if seq_col in ("doc_id", "text", "embedding", "op"):
            raise ValueError(
                f"seq_col {seq_col!r} collides with a source column")
        schema += f", {seq_col} long"
    batches = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", max_files_per_trigger)
               .json(batches_path))

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.localCheckpoint(eager=True)
        if seq_col is not None:
            # latest-wins collapse per id: keep the max-seq row (its op
            # decides delete vs upsert).  eqNullSafe so an id whose
            # rows all carry NULL seq keeps its single row; MAX skips
            # nulls, so a null-seq row loses to any sequenced one.
            # All joins are batch-sized.
            mx = batch_df.groupBy("doc_id").agg(
                F.max(F.col(seq_col)).alias("__mx"))
            winners = (batch_df.join(mx, "doc_id")
                       .filter(F.col(seq_col).eqNullSafe(F.col("__mx")))
                       .drop("__mx"))
            if not (winners.groupBy("doc_id").count()
                    .filter(F.col("count") > 1).isEmpty()):
                raise ValueError(
                    "stream_index_maintain: a doc_id's maximal "
                    f"{seq_col} is carried by more than one row — "
                    "ambiguous latest version; fix the source's "
                    "sequence assignment")
            batch_df = winners.localCheckpoint(eager=True)
        is_del = F.col("op") == "delete"
        # one aggregate over the checkpointed batch answers both
        # any-deletes? / any-upserts? (two isEmpty jobs before); the
        # keyword and vector legs of each phase touch DISJOINT index
        # directories and are applied concurrently (§2.6) — delete
        # before upsert ordering per trigger is preserved
        from document_vector_pipeline_spark.functions.par import (
            run_parallel,
        )
        cnt = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_del, 1).otherwise(0)).alias("nd")).collect()[0]
        n_del = int(cnt["nd"] or 0)
        n_ups = int(cnt["n"]) - n_del
        if n_del:
            dels = batch_df.filter(is_del).select("doc_id")
            run_parallel(
                lambda: text_index.delete(dels),
                lambda: ivf_index.delete(
                    dels.select(F.col("doc_id").alias("vec_id"))))
        if n_ups:
            ups = batch_df.filter(~F.coalesce(is_del, F.lit(False)))
            run_parallel(
                lambda: text_index.upsert(ups.select("doc_id", "text")),
                lambda: ivf_index.upsert(
                    ups.select(F.col("doc_id").alias("vec_id"),
                               "embedding")))
        text_index.maybe_compact(**(compact_opts or {}))
        if rebuild_check_every and (batch_id + 1) % rebuild_check_every == 0:
            ivf_index.maybe_rebuild()

    writer = (batches.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_merge_apply(spark: SparkSession, batches_path: str,
                       table, keys: list[str], checkpoint: str,
                       schema: str,
                       available_now: bool = True,
                       max_files_per_trigger: int = 1,
                       op_col: str = "op",
                       seq_col: str | None = None,
                       constraints: dict | None = None,
                       stream_id: str | None = None) -> StreamingQuery:
    """CDC stream → one atomic ``BucketedVersionedTable.merge`` per
    microbatch: the always-on form of store_merge, and the missing
    third leg next to stream_ingest (store freshness) and
    stream_index_maintain (serving-index freshness) — here the
    VERSIONED table of record follows the feed, one auditable manifest
    version per trigger.

    ``schema`` is the source JSONL schema and must carry the table's
    columns (including its bucket column) plus ``op_col`` (rows with
    op='delete' delete; anything else upserts).  With ``seq_col`` the
    microbatch first collapses latest-wins per key — a real CDC feed
    emits several versions of one key inside a trigger interval — and
    a key whose maximal seq is ambiguous fails the trigger (merge's
    duplicate-source-keys refusal backstops it).  ``constraints``
    (constraint_violations kwargs) enforce data quality at the merge
    gate: a violating microbatch fails its trigger with no version
    written — the feed stops rather than admit bad data.

    EXACTLY-ONCE, not at-least-once: every merge commit is stamped
    ``merge:{feed}:b{batch_id}`` in its manifest — ``feed`` is
    ``stream_id`` if given, else a stable hash of ``batches_path`` —
    and a replayed microbatch (foreachBatch re-delivers after a crash
    between sink commit and offset checkpoint; a fresh checkpoint
    re-drains everything) is detected off the manifest log and skipped
    — the versioned twin of the admission gate's batch-keyed
    idempotent sinks.  Batch ids are monotone PER FEED and
    availableNow+mtime ordering re-delivers files in the same order,
    so the newest stamp carrying THIS feed's id is the highest batch
    id this feed applied: the backward scan stops at the first
    same-feed stamp — O(1) manifest reads per trigger on a table this
    stream alone maintains.  Scoping the stamp to the feed means a NEW
    stream (fresh checkpoint, different batch directory) pointed at a
    table that already carries another feed's high merge stamps does
    NOT have its first microbatches misread as replays.  The
    stamp↔batch correspondence assumes each feed's batch directory is
    APPEND-ONLY (the file-source contract anyway): removing already-
    processed files before a fresh-checkpoint re-drain would renumber
    batches against the stamps.

    Per-trigger cost is merge's: only the batch's buckets rewrite,
    untouched dirs carried by reference — O(batch) against a 100 TB
    table.  Reference contrast: BlobTriggerFunction.cs:42-56 applies
    one document per invocation with no replay detection beyond blob
    receipts, and no version audit at all."""
    import hashlib

    batches = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", max_files_per_trigger)
               .json(batches_path))
    feed = stream_id if stream_id is not None else \
        hashlib.sha256(batches_path.encode("utf-8")).hexdigest()[:12]
    prefix = f"merge:{feed}:b"

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tag = f"{prefix}{batch_id}"
        # Replay detection in O(1) manifest reads: batch ids are
        # monotone within a checkpoint AND across a fresh-checkpoint
        # re-drain (availableNow + mtime file order re-deliver the same
        # files in the same order), so the NEWEST stamp carrying THIS
        # feed's id is the highest batch id this feed applied — scan
        # backward, skip other feeds' stamps, stop at the first
        # same-feed stamp (usually this stream's own previous commit),
        # skip the batch if that stamp already covers it.  Pre-feed-
        # scoping stamps (`merge:b{id}`, written before round 11 added
        # the feed segment) are attributed to THIS feed only while the
        # log shows no feed-scoped stamp from a DIFFERENT feed: legacy
        # tables were single-feed by construction, but once a second
        # feed attaches, a legacy stamp is no longer attributable and
        # honoring it would silently skip that feed's early batches as
        # replays (round-13 ADVICE fix).  Feed-scoped stamps are
        # strictly newer than legacy ones, so the newest-first scan has
        # seen every scoped stamp before it reaches a legacy stamp —
        # `other_feed_seen` is complete at decision time.
        legacy = "merge:b"
        other_feed_seen = False
        for v in reversed(table.versions()):
            op = table._manifest(v).get("op", "")
            stamped = None
            if op.startswith(prefix):
                stamped = op[len(prefix):]
            elif op.startswith("merge:") and ":b" in op[len("merge:"):]:
                other_feed_seen = True   # another feed's scoped stamp
            elif op.startswith(legacy) and op[len(legacy):].isdigit():
                if other_feed_seen:
                    break   # ambiguous on a multi-feed table — apply
                stamped = op[len(legacy):]
            if stamped is not None:
                if int(stamped) >= batch_id:
                    return               # replayed batch — already live
                break
        batch_df = batch_df.localCheckpoint(eager=True)
        if seq_col is not None:
            mx = batch_df.groupBy(*keys).agg(
                F.max(F.col(seq_col)).alias("__mx"))
            winners = (batch_df.join(mx, keys)
                       .filter(F.col(seq_col).eqNullSafe(F.col("__mx")))
                       .drop("__mx"))
            batch_df = winners.localCheckpoint(eager=True)
        src = (batch_df
               .withColumn("_deleted", F.col(op_col) == "delete")
               .drop(op_col, *([seq_col] if seq_col else [])))
        # constraints enforce at the merge gate: a violating microbatch
        # fails its trigger (ConstraintViolation) with NO version
        # written — the stream stops rather than admit bad data, and a
        # restart after the fix replays the batch cleanly
        table.merge(src, keys, op=tag, constraints=constraints)

    writer = (batches.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_late_audit(spark: SparkSession, batches_path: str,
                      audit_path: str, checkpoint: str, schema: str,
                      delay_seconds: int = 600, ts_col: str = "ts",
                      available_now: bool = True,
                      max_files_per_trigger: int = 1) -> StreamingQuery:
    """Late-data accounting under the watermark contract — the ops
    readout every watermarked pipeline needs before anyone trusts its
    windowed aggregates: per microbatch, how many rows arrived with an
    event time already BEHIND the watermark (Spark would route them
    into evicted window state), and how far behind the worst one was.

    The watermark is tracked by the audit itself with Spark's formula
    — wm(k) = max(event time over batches < k) − delay — persisted IN
    the audit rows (each batch records its own max event time), so a
    restarted stream recomputes it from the audit table, not from
    driver memory.  One audit row per microbatch: (batch_id, n_rows,
    n_late, max_lag_us) where max_lag_us is the worst lateness among
    the batch's late rows in exact microseconds (0 when none).

    The audit sink is EXACTLY-ONCE: each batch overwrites its own
    ``batch=K`` directory (the admission gate's batch-keyed idempotent
    sink), so a foreachBatch redelivery rewrites identical rows
    instead of double-counting.  Per-trigger cost: one batch-sized
    aggregation + one tiny-table read of prior audit rows — O(batch)
    at any feed size."""
    batches = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", max_files_per_trigger)
               .json(batches_path))
    delay_us = int(delay_seconds) * 1_000_000

    def handle(batch_df, batch_id: int) -> None:
        from pyspark.sql.types import LongType

        from document_vector_pipeline_spark.functions.expr import epoch_us

        if batch_df.isEmpty():
            return
        # "no audit rows yet" is an explicit FS probe (as read_late_audit
        # does), NOT exception control flow: a transient FS error or a
        # corrupt prior audit must FAIL the trigger rather than silently
        # audit this batch as if it were the first (watermark=None,
        # n_late=0) and overwrite its batch=K dir with wrong rows.
        jpath = spark._jvm.org.apache.hadoop.fs.Path(audit_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        prior_max = None
        if fs.exists(jpath):
            prior = (spark.read.parquet(audit_path)
                     .filter(F.col("batch_id") < batch_id)
                     .agg(F.max("batch_max_us")).collect()[0][0])
            prior_max = int(prior) if prior is not None else None
        wm = (prior_max - delay_us) if prior_max is not None else None
        # a LONG ts column is taken as epoch MICROSECONDS verbatim —
        # the lossless staging for feeds serialized through JSON, whose
        # timestamp round-trip truncates to milliseconds
        if isinstance(batch_df.schema[ts_col].dataType, LongType):
            ts_us = F.col(ts_col)
        else:
            ts_us = epoch_us(F.col(ts_col))
        late = (F.lit(False) if wm is None
                else ts_us < F.lit(wm))
        row = (batch_df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(late.cast("long")).cast("long").alias("n_late"),
            F.coalesce(
                F.max(F.when(late, F.lit(wm) - ts_us)),
                F.lit(0)).cast("long").alias("max_lag_us"),
            F.max(ts_us).cast("long").alias("batch_max_us"))
            .withColumn("batch_id", F.lit(batch_id).cast("long")))
        (row.write.mode("overwrite")
         .parquet(f"{audit_path}/batch={batch_id}"))

    writer = (batches.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_late_audit(spark: SparkSession, audit_path: str):
    """The drained audit table: one row per microbatch.  A feed that
    never delivered a row wrote no audit dirs — that is the typed
    empty audit, not an error (explicit FS probe, not exception
    control flow)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(audit_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return spark.createDataFrame(
            [], "batch_id long, n_rows long, n_late long, max_lag_us long")
    return (spark.read.parquet(audit_path)
            .select("batch_id", "n_rows", "n_late", "max_lag_us")
            .orderBy("batch_id"))


def stream_dim_join(spark: SparkSession, batches_path: str,
                    dim_table, keys: list[str], out_path: str,
                    checkpoint: str, schema: str,
                    dim_version_col: str = "dim_version",
                    broadcast_dim: bool = False,
                    available_now: bool = True,
                    max_files_per_trigger: int = 1) -> StreamingQuery:
    """Stream-static AS-OF enrichment: each microbatch of the fact feed
    left-joins the VERSIONED dimension table at its latest COMMITTED
    version, pinned ONCE per trigger — the streaming twin of
    events_enrich against a dimension that itself receives commits.

    Why pin per trigger: Spark's native stream-static join re-plans
    the static side per microbatch but gives no versioned-read
    guarantee — against a table of plain parquet dirs a concurrent
    dimension writer can TEAR a batch (some partitions join the old
    files, some the new, some crash on vanished ones).  Reading
    ``dim_table.read(v)`` for the manifest-resolved latest ``v``
    makes every row of a trigger join exactly one dimension snapshot;
    a mid-stream dimension commit is picked up at the NEXT trigger,
    never mid-batch.  Each output row is stamped ``dim_version_col``
    = v, so downstream consumers (and audits) can see exactly which
    snapshot enriched it.

    The sink is EXACTLY-ONCE: each batch overwrites its own
    ``batch=K`` dir (the admission gate's batch-keyed idempotent
    sink), so a foreachBatch redelivery rewrites identical rows —
    identical because the replayed trigger re-reads the SAME manifest
    version only if the dimension hasn't committed since; if it has,
    the replay joins the newer snapshot, which is the documented
    at-least-once-enrichment caveat every stream-static join carries
    (exactly-once would need the version stamped into the checkpoint;
    stamping it into the OUTPUT makes the difference observable).

    ``broadcast_dim`` hints the dimension side broadcast (right for a
    dims-sized table at any fact-feed scale); per-trigger cost is one
    batch×dimension join — the dimension read is manifest-pruned to
    its live dirs, never a directory listing race."""
    batches = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", max_files_per_trigger)
               .json(batches_path))

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        v = dim_table.latest()
        dim = dim_table.read(v)
        if broadcast_dim:
            dim = F.broadcast(dim)
        out = (batch_df.join(dim, keys, "left")
               .withColumn(dim_version_col,
                           F.lit(int(v)).cast("long")))
        (out.write.mode("overwrite")
         .parquet(f"{out_path}/batch={batch_id}"))

    writer = (batches.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_dim_joined(spark: SparkSession, out_path: str, schema=None):
    """The drained enriched feed across all batch dirs.  A feed that
    never delivered a row wrote no batch dirs — with ``schema`` (a
    StructType or DDL string) that is the TYPED EMPTY enrichment
    (explicit FS probe, the read_late_audit discipline), not an
    error; without it the missing path propagates (no schema to
    synthesize)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(out_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if schema is not None and not fs.exists(jpath):
        return spark.createDataFrame([], schema)
    return spark.read.parquet(out_path)
