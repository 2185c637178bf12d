"""Persisted inverted index for BM25 keyword retrieval — the keyword twin
of store/ivf_index.IVFIndex.

The scan path (operators/retrieval.bm25_scores) recomputes tokenization +
tf + df from a full corpus scan on EVERY query batch; at 100 TB that is a
full scan per batch.  This index is build-once / probe-pruned / maintained
incrementally, the same serving contract the vector leg got in rounds 4-5
(and the reference maintains per write on its side —
CosmosDBClientWrapper.cs:117-146 keeps its index current on every upsert):

- ``build``: ONE tokenize pass over the corpus writes a posting table
  (term, doc_id, tf, dl) hash-partitioned into ``tbucket=`` directories
  by term (a term's complete posting list lives in exactly one bucket,
  so per-term document frequency stays corpus-exact under pruning), plus
  two metadata-sized sidecars — ``docterms`` (doc_id → its terms, hashed
  into ``dbucket=`` partitions: locates a document's postings without
  scanning them) and ``doclens`` (doc_id → token count, every document
  INCLUDING empty ones: membership + corpus statistics delta), plus a
  one-row ``stats`` table (n_docs, total_len).
- ``search``: reads ONLY the query terms' buckets (partition pruning on
  ``tbucket`` — the keyword analogue of IVF probing cells), scores with
  the exact integer BM25 core shared verbatim with the scan path
  (retrieval.score_tf), cuts map-side, ranks.  Bit-identical to
  ``bm25_topk`` over the same corpus by construction.
- ``upsert``/``delete``: per-DOCUMENT replace.  The docterms sidecar
  (pruned to the batch's dbuckets) yields the old postings' term
  buckets; only (old ∪ new) tbuckets are read, anti-joined on the batch
  doc ids, merged and dynamically overwritten — untouched buckets are
  never read or written; emptied directories are dropped through the
  Hadoop FS.  Corpus stats are adjusted by the (old out, new in) delta,
  two one-row aggregates.  df needs no maintenance: it is derived from
  the (complete, pruned) posting lists at query time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_vector_pipeline_spark.operators import retrieval

POSTING_SCHEMA = "term string, doc_id long, tf bigint, dl int, tbucket int"
DOCTERMS_SCHEMA = "doc_id long, term string, dbucket int"
DOCLENS_SCHEMA = "doc_id long, dl int, dbucket int"


class TextIndex:
    def __init__(self, spark: SparkSession, path: str,
                 n_term_buckets: int = 64, n_doc_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.n_term_buckets = n_term_buckets
        self.n_doc_buckets = n_doc_buckets

    # -- layout -------------------------------------------------------------

    @property
    def _postings(self) -> str:
        return os.path.join(self.path, "postings")

    @property
    def _docterms(self) -> str:
        return os.path.join(self.path, "docterms")

    @property
    def _doclens(self) -> str:
        return os.path.join(self.path, "doclens")

    @property
    def _stats(self) -> str:
        return os.path.join(self.path, "stats.parquet")

    # -- Hadoop-FS helpers (object-store-safe, mirrors IVFIndex) ------------

    def _jpath(self, p: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, jp):
        return jp.getFileSystem(self.spark._jsc.hadoopConfiguration())

    def _fs_exists(self, p: str) -> bool:
        jp = self._jpath(p)
        return self._fs(jp).exists(jp)

    def _fs_delete(self, p: str) -> None:
        jp = self._jpath(p)
        self._fs(jp).delete(jp, True)

    # -- bucket expressions -------------------------------------------------

    def _tbucket(self, term_col):
        return (F.pmod(F.xxhash64(term_col), F.lit(self.n_term_buckets))
                .cast("int"))

    def _dbucket(self, doc_col):
        return (F.pmod(F.xxhash64(doc_col.cast("string")),
                       F.lit(self.n_doc_buckets)).cast("int"))

    # -- derivation shared by build/upsert ----------------------------------

    def _tf_of(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        toks = retrieval._tokens(F.col(text_col))
        tok = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                          F.explode(toks).alias("term"),
                          F.size(toks).cast("int").alias("dl"))
        return (tok.groupBy("doc_id", "term")
                .agg(F.count(F.lit(1)).alias("tf"),
                     F.first("dl").alias("dl")))

    def _doclens_of(self, docs: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
        # one row per document, EMPTY documents included — they carry
        # n_docs weight in the BM25 statistics
        return docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.size(retrieval._tokens(F.col(text_col))).cast("int").alias("dl"),
            self._dbucket(F.col(id_col)).alias("dbucket"))

    # -- operations ---------------------------------------------------------

    def build(self, docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> None:
        """One tokenize pass → postings + sidecars + stats; a rebuild
        replaces everything through the committer (static overwrite)."""
        tf = self._tf_of(docs, id_col, text_col)
        (tf.withColumn("tbucket", self._tbucket(F.col("term")))
         .repartition("tbucket")
         .write.partitionBy("tbucket").mode("overwrite")
         .parquet(self._postings))
        post = self.spark.read.schema(POSTING_SCHEMA).parquet(self._postings)
        (post.select("doc_id", "term",
                     self._dbucket(F.col("doc_id")).alias("dbucket"))
         .repartition("dbucket")
         .write.partitionBy("dbucket").mode("overwrite")
         .parquet(self._docterms))
        dl = self._doclens_of(docs, id_col, text_col)
        (dl.repartition("dbucket")
         .write.partitionBy("dbucket").mode("overwrite")
         .parquet(self._doclens))
        self._write_stats(dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum(F.col("dl").cast("long")), F.lit(0))
            .alias("total_len")))

    def _write_stats(self, one_row: DataFrame) -> None:
        df = one_row.select(F.col("n_docs").cast("long"),
                            F.col("total_len").cast("long"))
        df.coalesce(1).write.mode("overwrite").parquet(self._stats)

    def stats(self) -> DataFrame:
        return self.spark.read.parquet(self._stats)

    def search(self, query_terms: DataFrame, k: int = 10,
               checkpoint: bool = True) -> DataFrame:
        """BM25 top-k per query reading ONLY the query terms' posting
        buckets — (query_id, doc_id, n_terms, score_micro, rank),
        bit-identical to retrieval.bm25_topk over the same corpus.

        The bucket list is a query-batch-sized driver collect (the
        keyword analogue of IVF's probed-cell list); everything after it
        is candidate-sized.  ``checkpoint`` materializes the pruned tf
        relation once for its two consumers (df aggregation + scoring
        join); pass False to keep full lineage (plan inspection)."""
        tb = [r[0] for r in query_terms
              .select(self._tbucket(F.col("term"))).distinct().collect()]
        post = (self.spark.read.schema(POSTING_SCHEMA)
                .parquet(self._postings)
                .filter(F.col("tbucket").isin(tb)))
        tf = (post.join(F.broadcast(query_terms.select("term").distinct()),
                        "term", "left_semi")
              .select("doc_id", "term", "tf", "dl"))
        if checkpoint:
            tf = tf.localCheckpoint(eager=True)
        scored = retrieval.score_tf(tf, query_terms, self.stats())
        return retrieval.rank_topk(scored, k)

    def upsert(self, docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> None:
        """Per-document replace: the batch documents' OLD postings are
        removed and their new postings written, touching only the
        affected term/doc buckets; corpus statistics move by the exact
        (old out, new in) delta."""
        self._apply(docs, id_col, text_col)

    def delete(self, doc_ids) -> None:
        """Remove documents from the index by id — the empty-batch case
        of the same pruned rewrite."""
        if not isinstance(doc_ids, DataFrame):
            doc_ids = self.spark.createDataFrame(
                [(int(i),) for i in doc_ids], "doc_id long")
        empty = self.spark.createDataFrame([], "doc_id long, text string")
        self._apply(empty, "doc_id", "text",
                    extra_victims=doc_ids.select(
                        F.col(doc_ids.columns[0]).cast("long")
                        .alias("doc_id")).distinct())

    def _apply(self, docs: DataFrame, id_col: str, text_col: str,
               extra_victims: DataFrame | None = None) -> None:
        new_dl = self._doclens_of(docs, id_col, text_col)\
            .localCheckpoint(eager=True)
        victims = new_dl.select("doc_id")
        if extra_victims is not None:
            victims = victims.unionByName(extra_victims).distinct()
        victims = victims.localCheckpoint(eager=True)

        dbkts = [r[0] for r in
                 victims.select(self._dbucket(F.col("doc_id")).alias("b"))
                 .distinct().collect()]
        if not dbkts:
            return

        old_terms = (self.spark.read.schema(DOCTERMS_SCHEMA)
                     .parquet(self._docterms)
                     .filter(F.col("dbucket").isin(dbkts))
                     .join(F.broadcast(victims), "doc_id", "left_semi"))
        new_tf = self._tf_of(docs, id_col, text_col)\
            .localCheckpoint(eager=True)
        tbkts = sorted({r[0] for r in
                        old_terms.select(self._tbucket(F.col("term"))
                                         .alias("b")).distinct().collect()}
                       | {r[0] for r in
                          new_tf.select(self._tbucket(F.col("term"))
                                        .alias("b")).distinct().collect()})

        # stats delta BEFORE doclens is rewritten (two one-row collects)
        old_dl = (self.spark.read.schema(DOCLENS_SCHEMA)
                  .parquet(self._doclens)
                  .filter(F.col("dbucket").isin(dbkts))
                  .join(F.broadcast(victims), "doc_id", "left_semi"))
        o = old_dl.agg(F.count(F.lit(1)).alias("n"),
                       F.coalesce(F.sum(F.col("dl").cast("long")),
                                  F.lit(0)).alias("t")).collect()[0]
        n = new_dl.agg(F.count(F.lit(1)).alias("n"),
                       F.coalesce(F.sum(F.col("dl").cast("long")),
                                  F.lit(0)).alias("t")).collect()[0]
        cur = self.stats().collect()[0]
        self._write_stats(self.spark.createDataFrame(
            [(cur["n_docs"] - o["n"] + n["n"],
              cur["total_len"] - o["t"] + n["t"])],
            "n_docs long, total_len long"))

        if tbkts:
            cur_post = (self.spark.read.schema(POSTING_SCHEMA)
                        .parquet(self._postings)
                        .filter(F.col("tbucket").isin(tbkts))
                        .join(F.broadcast(victims), "doc_id", "left_anti"))
            add = new_tf.withColumn("tbucket", self._tbucket(F.col("term")))
            merged = (cur_post.unionByName(add)
                      .localCheckpoint(eager=True))
            self._overwrite_partitions(merged, self._postings, "tbucket",
                                       tbkts)

        cur_dt = (self.spark.read.schema(DOCTERMS_SCHEMA)
                  .parquet(self._docterms)
                  .filter(F.col("dbucket").isin(dbkts))
                  .join(F.broadcast(victims), "doc_id", "left_anti"))
        add_dt = new_tf.select(
            "doc_id", "term", self._dbucket(F.col("doc_id")).alias("dbucket"))
        self._overwrite_partitions(
            cur_dt.unionByName(add_dt).localCheckpoint(eager=True),
            self._docterms, "dbucket", dbkts)

        cur_dl = (self.spark.read.schema(DOCLENS_SCHEMA)
                  .parquet(self._doclens)
                  .filter(F.col("dbucket").isin(dbkts))
                  .join(F.broadcast(victims), "doc_id", "left_anti"))
        self._overwrite_partitions(
            cur_dl.unionByName(new_dl).localCheckpoint(eager=True),
            self._doclens, "dbucket", dbkts)

    def _overwrite_partitions(self, df: DataFrame, path: str,
                              part_col: str, affected: list) -> None:
        """Dynamic-partition overwrite + FS-drop of affected partitions
        that received no rows (same contract as IVFIndex)."""
        present = {r[0] for r in df.select(part_col).distinct().collect()}
        (df.repartition(part_col).write
         .partitionBy(part_col).mode("overwrite")
         .option("partitionOverwriteMode", "dynamic").parquet(path))
        for p in set(affected) - present:
            self._fs_delete(os.path.join(path, f"{part_col}={p}"))
