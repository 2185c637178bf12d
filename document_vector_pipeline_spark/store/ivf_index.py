"""Persisted IVF index: the at-scale companion to operators/similarity.

`ivf_ann` recomputes centroid assignment per query batch — right for
one-shot jobs, wrong for a serving corpus.  IVFIndex materializes the
layout you'd keep at 100 TB:

- `centroids.parquet`  — tiny (n_centroids rows), read driver-side
- `cells/`             — the corpus partitioned BY centroid_id, each row
                         carrying its precomputed vector norm

A search then (1) scores the query against the centroids in plain python
(they're plan metadata), (2) reads ONLY the nprobe closest cell
directories — parquet partition pruning, verified in tests — and
(3) reranks with one dot-product fold per candidate against the stored
norms.  With nprobe = n_centroids the result is exactly brute force
(oracle-checked via the ann_bruteforce SQL twin); smaller nprobe trades
recall for reading 1/nth of the corpus — the IVF contract.

Deterministic-by-construction like everything else: centroids are the
n smallest md5(id) rows (stable across runs, engines and cluster sizes),
assignment ties break on centroid_id, scores are rounded at 6 dp with a
total ranking order.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.hashing import md5_long
from document_vector_pipeline_spark.functions.vectors import dot, l2_norm


class IVFIndex:
    def __init__(self, spark: SparkSession, path: str, n_centroids: int = 16):
        self.spark = spark
        self.path = path
        self.n_centroids = n_centroids

    @property
    def _cells(self) -> str:
        return os.path.join(self.path, "cells")

    @property
    def _cents(self) -> str:
        return os.path.join(self.path, "centroids.parquet")

    def build(self, corpus: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", use_udf: bool = True) -> None:
        """Assign every vector to its max-cosine centroid and persist the
        corpus clustered by cell (one shuffle on centroid_id).  Both
        writes are static-overwrite parquet jobs, so a rebuild replaces
        the index entirely through the engine's committer — no direct
        filesystem deletes, object-store-safe.

        Assignment is MAP-ONLY either way (centroids are index metadata,
        never a join side): ``use_udf=True`` scores all centroids in one
        Arrow pass (numpy products + sequential cumsum — bit-identical to
        the expression fold, see VectorStore._score_cut_np), with the
        interpreted argmin-fold expression kept as the twin.  The
        tie-break replays array_min(struct(-score, cid)): max score, then
        lowest centroid id."""
        vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
        base = corpus.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("v"),
                             l2_norm(vd).alias("vnorm"))
        cents = (base
                 .select("vec_id", "v", "vnorm",
                         md5_long(F.col("vec_id").cast("string")).alias("h"))
                 .orderBy("h", "vec_id").limit(self.n_centroids)
                 .select(F.col("vec_id").alias("centroid_id"),
                         F.col("v").alias("centroid"),
                         F.col("vnorm").alias("cnorm")))
        cents.coalesce(1).write.mode("overwrite").parquet(self._cents)
        cent_rows = sorted(self.spark.read.parquet(self._cents).collect(),
                           key=lambda r: r["centroid_id"])
        if use_udf:
            assigned = self._assign_np(base, cent_rows)
        else:
            vd2 = F.transform(F.col("v"), lambda v: v.cast("double"))
            cands = []
            for r in cent_rows:
                carr = F.array(*[F.lit(float(x)) for x in r["centroid"]])
                denom = F.col("vnorm") * F.lit(r["cnorm"])
                s = F.round(F.when(denom == 0, F.lit(0.0))
                             .otherwise(dot(vd2, carr) / denom), 6)
                cands.append(F.struct((-s).alias("ns"),
                                      F.lit(r["centroid_id"]).alias("cid")))
            best = F.array_min(F.array(*cands))
            assigned = (base.withColumn("centroid_id", best["cid"])
                        .select("vec_id", "v", "vnorm", "centroid_id"))
        (assigned.repartition("centroid_id").write
         .partitionBy("centroid_id").mode("overwrite").parquet(self._cells))

    @staticmethod
    def _assign_np(base: DataFrame, cent_rows) -> DataFrame:
        """Arrow twin of the argmin-fold assignment: per-centroid cosine
        via products + sequential cumsum (bit-identical IEEE order),
        py_round6_np for Round(_, 6), columns pre-sorted by centroid_id so
        np.argmin's first-minimum rule replays the (−score, cid) order."""
        import numpy as np

        from document_vector_pipeline_spark.functions.vectors import (
            py_round6_np,
        )

        C = np.array([[float(x) for x in r["centroid"]]
                      for r in cent_rows], dtype=np.float64)
        cnorms = np.array([float(r["cnorm"]) for r in cent_rows])
        cids = np.array([int(r["centroid_id"]) for r in cent_rows])
        id_type = base.schema["vec_id"].dataType.simpleString()
        schema = (f"vec_id {id_type}, v array<float>, vnorm double, "
                  "centroid_id long")

        def run(batches):
            import pandas as pd
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.array(list(pdf["v"]), dtype=np.float64)
                vn = pdf["vnorm"].to_numpy()
                S = np.empty((len(V), len(C)), dtype=np.float64)
                for ci in range(len(C)):
                    dots = np.cumsum(V * C[ci][None, :], axis=1)[:, -1]
                    denom = vn * cnorms[ci]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        s = dots / denom
                    S[:, ci] = py_round6_np(np.where(denom == 0.0, 0.0, s))
                best = cids[S.argmax(axis=1)]  # ties → first → lowest cid
                out = pdf[["vec_id", "v", "vnorm"]].copy()
                out["centroid_id"] = best
                yield out

        return base.mapInPandas(run, schema)

    @property
    def _codebook(self) -> str:
        return os.path.join(self.path, "codebook.parquet")

    def build_pq(self, corpus: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", n_codes: int = 16,
                 n_sub: int = 8, dim: int = 64) -> None:
        """Augment the index with PQ codes: after ``build``, re-persist
        each cell row with its ``n_sub`` codebook codes (array<int>) and
        write the codebook alongside the centroids.  An ADC search then
        reads n_sub small ints per row instead of ``dim`` floats — the
        persisted FAISS-IVFADC layout (IVF prunes cells, PQ shrinks the
        bytes the surviving cells cost).  Codes use the same exact
        1e-6 fixed-point integer encode as ``pq_ann`` (argmin integer
        subspace L2, ties to the lowest code), so an exhaustive-probe
        ADC search is bit-identical to ``pq_ann`` — the oracle."""
        import numpy as np

        from document_vector_pipeline_spark.operators.similarity import (
            pq_codebook,
            pq_fixed_point,
        )

        sub = dim // n_sub
        cb = pq_codebook(corpus, n_codes, dim, id_col, vec_col)
        cb_df = self.spark.createDataFrame(
            [(i + 1, list(c)) for i, c in enumerate(cb)],
            "code int, c6 array<bigint>")
        cb_df.coalesce(1).write.mode("overwrite").parquet(self._codebook)

        cbm = np.array(cb, dtype=np.int64)

        @F.pandas_udf("array<int>")
        def encode(v6s):
            import pandas as pd
            out = []
            for v in v6s:
                a = np.asarray(v, dtype=np.int64)
                codes = []
                for m in range(n_sub):
                    d = (a[m * sub:(m + 1) * sub]
                         - cbm[:, m * sub:(m + 1) * sub])
                    # first-min tie-break == struct(d, code) min
                    codes.append(int(np.argmin((d * d).sum(axis=1))) + 1)
                out.append(codes)
            return pd.Series(out)

        cells = self.spark.read.parquet(self._cells)
        with_codes = (cells
                      .withColumn("__v6",
                                  pq_fixed_point(F.col("v"), dim))
                      .withColumn("pq_codes", encode(F.col("__v6")))
                      .drop("__v6"))
        tmp = self._cells + "_pq"
        (with_codes.repartition("centroid_id").write
         .partitionBy("centroid_id").mode("overwrite").parquet(tmp))
        (self.spark.read.parquet(tmp)
         .repartition("centroid_id").write
         .partitionBy("centroid_id").mode("overwrite")
         .parquet(self._cells))
        # drop the staging dir through the Hadoop FS (object-store-safe)
        jvm = self.spark._jvm
        jp = jvm.org.apache.hadoop.fs.Path(tmp)
        jp.getFileSystem(self.spark._jsc.hadoopConfiguration()) \
          .delete(jp, True)

    def search_many_adc(self, queries: DataFrame, k: int = 10,
                        nprobe: int = 4, n_sub: int = 8, dim: int = 64,
                        qid_col: str = "query_id",
                        qvec_col: str = "query_vec") -> DataFrame:
        """Batch ADC search over the PQ-augmented index: probed cells
        are read once (partition-pruned), each surviving row is scored
        by ``n_sub`` integer LUT lookups on its stored codes — no
        vector column is touched at all.  LUTs (query × codebook
        integer dots) are plan metadata baked as map literals; exact
        integers end-to-end, so nprobe = n_centroids reproduces
        ``pq_ann`` bit-for-bit."""
        import math as _math

        from document_vector_pipeline_spark.operators.similarity import (
            pq_fixed_point,
        )

        sub = dim // n_sub
        cb_rows = sorted(self.spark.read.parquet(self._codebook).collect(),
                         key=lambda r: r["code"])
        cb = [list(r["c6"]) for r in cb_rows]
        q6_rows = (queries
                   .select(F.col(qid_col).alias("query_id"),
                           pq_fixed_point(F.col(qvec_col), dim)
                           .alias("q6"))
                   .collect())
        lut = {r["query_id"]: [[sum(r["q6"][m * sub + i] * cw[m * sub + i]
                                    for i in range(sub))
                                for cw in cb]
                               for m in range(n_sub)]
               for r in q6_rows}
        raw = {r[0]: [float(v) for v in r[1]]
               for r in queries.select(qid_col, qvec_col).collect()}
        probe_pairs = []
        for qid, qd in raw.items():
            for cid in self._probe_ids(qd, nprobe):
                probe_pairs.append((qid, cid))
        probes = self.spark.createDataFrame(
            probe_pairs, "query_id long, centroid_id long")
        all_cells = sorted({c for _, c in probe_pairs})
        cells = (self.spark.read.parquet(self._cells)
                 .filter(F.col("centroid_id").isin(all_cells))
                 .select("vec_id", "centroid_id", "pq_codes"))
        cand = cells.join(F.broadcast(probes), "centroid_id")
        per_m = []
        for m in range(n_sub):
            entries = []
            for qid in sorted(lut):
                entries += [F.lit(qid).cast("long"),
                            F.array(*[F.lit(v) for v in lut[qid][m]])]
            lmap = F.create_map(*entries)
            per_m.append(F.element_at(
                F.element_at(lmap, F.col("query_id")),
                F.element_at(F.col("pq_codes"), m + 1)))
        iscore = per_m[0]
        for t in per_m[1:]:
            iscore = iscore + t
        scored = cand.select(
            "query_id", "vec_id",
            F.round(iscore / F.lit(1e12), 6).alias("score"))

        schema = scored.schema

        def cut(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values(["query_id", "score", "vec_id"],
                                      ascending=[True, False, True],
                                      kind="mergesort")
                yield pdf.groupby("query_id", sort=False).head(k)

        partial = scored.mapInPandas(cut, schema)
        w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                   F.col("vec_id"))
        return (partial.withColumn("rank",
                                   F.row_number().over(w).cast("int"))
                .filter(F.col("rank") <= k)
                .select("query_id", "vec_id", "score", "rank"))

    def _probe_ids(self, qd: list[float], nprobe: int) -> list[int]:
        """Pick the nprobe closest centroids driver-side (they are index
        metadata, a few KB — never a Spark job)."""
        qnorm = math.sqrt(sum(v * v for v in qd))
        rows = self.spark.read.parquet(self._cents).collect()
        scored = []
        for r in rows:
            c = [float(x) for x in r["centroid"]]
            denom = r["cnorm"] * qnorm
            s = 0.0 if denom == 0 else sum(a * b for a, b in zip(c, qd)) / denom
            scored.append((round(s, 6), r["centroid_id"]))
        scored.sort(key=lambda t: (-t[0], t[1]))
        return [cid for _, cid in scored[:nprobe]]

    def search(self, query_vector: list[float], k: int = 10,
               nprobe: int = 4) -> DataFrame:
        """Top-k over the nprobe closest cells only (partition-pruned scan;
        nprobe = n_centroids degrades gracefully to exact brute force)."""
        qd = [float(v) for v in query_vector]
        qnorm = math.sqrt(sum(v * v for v in qd))
        probes = self._probe_ids(qd, nprobe)
        cells = (self.spark.read.parquet(self._cells)
                 .filter(F.col("centroid_id").isin(probes)))
        q = F.array(*[F.lit(v) for v in qd])
        vd = F.transform(F.col("v"), lambda v: v.cast("double"))
        denom = F.col("vnorm") * F.lit(qnorm)
        score = F.round(F.when(denom == 0, F.lit(0.0))
                         .otherwise(dot(vd, q) / denom), 6)
        return (cells.withColumn("score", score)
                .orderBy(F.desc("score"), "vec_id").limit(k)
                .select("vec_id", "score"))

    def search_many(self, queries: DataFrame, k: int = 10, nprobe: int = 4,
                    qid_col: str = "query_id",
                    qvec_col: str = "query_vec") -> DataFrame:
        """Batch IVF search: every query answered in ONE partition-pruned
        scan — (query_id, vec_id, score, rank).

        The query set is collected (it is index metadata-sized by
        definition) and each query's nprobe cells are picked driver-side
        from the tiny centroid table; the cells directory is then read
        ONCE, pruned to the union of all probed cells, and a broadcast
        join keeps each (row, query) pair only where the row's cell is in
        that query's probe list.  Ranking is two-phase: a map-side
        partial top-k per Arrow batch (same order as the final rank, so
        lossless) feeds the per-query row_number window — ≤ k·n_batches
        skinny rows per query reach the exchange, never the scored scan.
        This replaces the one-search-per-query loop: N queries cost one
        pruned scan instead of N."""
        q_rows = queries.select(qid_col, qvec_col).collect()
        recs = []
        for r in q_rows:
            qd = [float(v) for v in r[1]]
            recs.append((r[0], qd, math.sqrt(sum(v * v for v in qd)),
                         self._probe_ids(qd, nprobe)))
        all_cells = sorted({c for _, _, _, ps in recs for c in ps})
        qdf = self.spark.createDataFrame(
            recs, "query_id long, __qv array<double>, __qnorm double, "
                  "__probes array<bigint>")
        cells = (self.spark.read.parquet(self._cells)
                 .filter(F.col("centroid_id").isin(all_cells)))
        vd = F.transform(F.col("v"), lambda v: v.cast("double"))
        denom = F.col("vnorm") * F.col("__qnorm")
        score = F.round(F.when(denom == 0, F.lit(0.0))
                         .otherwise(dot(vd, F.col("__qv")) / denom), 6)
        scored = (cells
                  .join(F.broadcast(qdf),
                        F.array_contains("__probes", F.col("centroid_id")))
                  .withColumn("score", score)
                  .select("query_id", "vec_id", "score"))

        schema = scored.schema

        def cut(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values(["query_id", "score", "vec_id"],
                                      ascending=[True, False, True],
                                      kind="mergesort")
                yield pdf.groupby("query_id", sort=False).head(k)

        partial = scored.mapInPandas(cut, schema)
        w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                   F.col("vec_id"))
        return (partial.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "vec_id", "score", "rank"))
