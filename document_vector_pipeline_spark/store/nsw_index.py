"""Persisted NSW graph index: the serving companion to nsw_ann.

Round-12's `nsw_ann` (operators/similarity.py) builds its per-cell
navigable-small-world graph INSIDE the query — O(n·ef·m) per cell per
call, the round-12 verdict's one perf-weak item.  This module gives
the graph rung the same treatment IVF/PQ and the text index already
have: build once, persist, serve walks against the persisted
adjacency, maintain in O(batch).

Layout (a sidecar beside IVFIndex's files, same path):

    <path>/centroids.parquet        IVFIndex coarse quantizer
    <path>/cells/centroid_id=C/     IVFIndex clustered corpus
    <path>/graph/centroid_id=C/     per-cell NSW adjacency:
                                    (ord, vec_id, v6, neighbors)
    <path>/nsw_meta.json            {m_links, ef, dim}

Graph rows carry the fixed-point vectors (``v6``) inline — the HNSW
storage layout: a probed cell's walk reads ONE partition-pruned
directory and touches nothing else.  ``ord`` is the insertion
position ((md5(vec_id), vec_id) order, entry = ord 0) and
``neighbors`` lists neighbor ords, so the walker rebuilds its
adjacency as a plain list-of-lists with zero joins.

Serving contract (pinned in tests/test_similarity.py): at equal
(n_centroids, nprobe, m_links, ef) a ``search`` against the persisted
graph is BIT-IDENTICAL to ``nsw_ann`` — same centroid rule (n
smallest md5(id)), same probe selection (``ivf_probes`` verbatim),
same shared ``nsw_build_adjacency`` / ``nsw_greedy_search`` code, and
the same exact rounded-cosine rescore of the nominated candidates.

Maintenance: ``insert`` is the real NSW insert-by-search — new
vectors route to their cells through the frozen centroids
(IVFIndex.upsert keeps cells/idmap consistent), then ONLY the touched
cells' graphs extend: each new node searches the persisted adjacency
(beam ef) and links bidirectionally to its m nearest, one dynamic
partition overwrite per touched cell.  Insertion-order dependence is
inherent to NSW (an incrementally-grown graph differs from a
from-scratch build edge-for-edge), so the insert contract is measured
recall, not bit-equality — `rebuild_cells` re-canonicalizes when
drift accumulates (the cell_stats rebuild discipline).

At 100 TB: cells scale out, per-cell build/walk cost stays bounded,
serving reads are partition-pruned to nprobe dirs per query batch —
exactly how sharded HNSW serving deploys.  Reference contrast: the
reference delegates ANN entirely to Cosmos's managed index
(CosmosDBClientWrapper.cs:107-176, QuantizedFlat); the graph family
here is the self-hosted equivalent with its build/serve split made
explicit.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.hashing import md5_long
from document_vector_pipeline_spark.functions.vectors import (
    cosine_similarity,
)
from document_vector_pipeline_spark.operators.similarity import (
    ivf_probes,
    nsw_build_adjacency,
    nsw_greedy_search,
    pq_fixed_point,
)
from document_vector_pipeline_spark.store.ivf_index import IVFIndex


class NSWIndex:
    """Persisted per-cell NSW graph over an IVFIndex's cell layout."""

    def __init__(self, spark: SparkSession, path: str,
                 n_centroids: int = 8, m_links: int = 6, ef: int = 24,
                 dim: int = 64):
        self.spark = spark
        self.path = path
        self.m_links = m_links
        self.ef = ef
        self.dim = dim
        self.ivf = IVFIndex(spark, path, n_centroids=n_centroids)

    @property
    def _graph(self) -> str:
        return os.path.join(self.path, "graph")

    @property
    def _meta(self) -> str:
        return os.path.join(self.path, "nsw_meta.json")

    def _graph_schema(self, id_type: str) -> str:
        return (f"ord int, vec_id {id_type}, v6 array<long>, "
                "neighbors array<int>, centroid_id long")

    def _id_type(self) -> str:
        sch = self.ivf._schemas().get("cells")
        return sch["vec_id"].dataType.simpleString() if sch else "long"

    # ---- build ------------------------------------------------------------

    def build(self, corpus: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding") -> None:
        """IVF layout + per-cell graph in one pass each: the cells
        write is IVFIndex.build's (one shuffle on centroid_id); the
        graph build is ONE applyInPandas pass over the cells — the
        same O(n·ef·m) insert-by-search nsw_ann pays per query, paid
        ONCE here."""
        self.ivf.build(corpus, id_col=id_col, vec_col=vec_col)
        self.ivf._write_text(self._meta, json.dumps(
            {"m_links": self.m_links, "ef": self.ef, "dim": self.dim}))
        self._build_graph_for(None)

    def _build_graph_for(self, cells: list | None) -> None:
        """(Re)build the graph partitions for ``cells`` (None = all)
        from the persisted cell layout — the canonical graph, used by
        build and rebuild_cells."""
        base = self.ivf._read_cells()
        if cells is not None:
            base = base.filter(F.col("centroid_id").isin(list(cells)))
        src = base.select(
            "centroid_id", "vec_id",
            pq_fixed_point(F.col("v"), self.dim).alias("v6"),
            md5_long(F.col("vec_id").cast("string")).alias("h"))
        id_type = self._id_type()
        m_links, ef = self.m_links, self.ef

        def per_cell(pdf):
            import numpy as np
            import pandas as pd

            pdf = pdf.sort_values(["h", "vec_id"], kind="mergesort")
            V = np.array(list(pdf["v6"]), dtype=np.int64)
            ids = list(pdf["vec_id"])
            adj = nsw_build_adjacency(V, ids, m_links, ef)
            return pd.DataFrame({
                "ord": range(len(ids)), "vec_id": ids,
                "v6": [list(map(int, v)) for v in V],
                "neighbors": [list(map(int, a)) for a in adj],
                "centroid_id": pdf["centroid_id"].iloc[0]})

        rows = src.groupBy("centroid_id").applyInPandas(
            per_cell, self._graph_schema(id_type))
        if cells is None:
            (rows.repartition("centroid_id").write
             .partitionBy("centroid_id").mode("overwrite")
             .parquet(self._graph))
        else:
            rows = rows.localCheckpoint(eager=True)
            self.ivf._overwrite_partitions(rows, self._graph,
                                           "centroid_id", list(cells))

    def _read_graph(self) -> DataFrame:
        id_type = self._id_type()
        return (self.spark.read.schema(self._graph_schema(id_type))
                .parquet(self._graph))

    # ---- serve ------------------------------------------------------------

    def search(self, queries: DataFrame, k: int = 10, nprobe: int = 2,
               qid_col: str = "query_id",
               qvec_col: str = "query_vec") -> DataFrame:
        """Walk the PERSISTED graphs of each query's nprobe cells: no
        build cost in the query, the read is partition-pruned to the
        probed graph dirs, and the nominated candidates get the same
        exact rounded-cosine rescore nsw_ann ranks by — bit-identical
        to nsw_ann at equal parameters (test-pinned), at serve-time
        cost O(probed cells' walks) instead of O(build + walks)."""
        queries = queries.filter(F.col(qvec_col).isNotNull())
        cents = (self.ivf._read_dir(self.ivf._cents, "cents")
                 .select("centroid_id", "centroid"))
        q = queries.select(F.col(qid_col).alias("query_id"),
                           F.col(qvec_col).alias("q"))
        probes = ivf_probes(q, cents, nprobe)
        probe_rows = probes.collect()
        cell_queries: dict = {}
        for r in probe_rows:
            cell_queries.setdefault(r["centroid_id"],
                                    []).append(r["query_id"])
        q_rows = (queries.select(
            F.col(qid_col).alias("query_id"),
            pq_fixed_point(F.col(qvec_col), self.dim).alias("q6"))
            .collect())
        import numpy as np

        q6 = {r["query_id"]: np.array(r["q6"], dtype=np.int64)
              for r in q_rows}
        ef, k_beam = self.ef, k
        id_type = self._id_type()

        graph = self._read_graph().filter(
            F.col("centroid_id").isin(list(cell_queries))
            if cell_queries else F.lit(False))

        def per_cell(pdf):
            import pandas as pd
            cell = pdf["centroid_id"].iloc[0]
            qids = cell_queries.get(cell, [])
            if not qids or pdf.empty:
                return pd.DataFrame(columns=["query_id", "vec_id"])
            pdf = pdf.sort_values("ord", kind="mergesort")
            V = np.array(list(pdf["v6"]), dtype=np.int64)
            ids = list(pdf["vec_id"])
            adj = [list(a) for a in pdf["neighbors"]]
            rows = []
            for qid in sorted(qids):
                qv = q6[qid]
                for _d, vid, _j in nsw_greedy_search(
                        adj, V, ids, 0, qv, max(ef, k_beam)):
                    rows.append((qid, vid))
            return pd.DataFrame(rows, columns=["query_id", "vec_id"])

        cand = graph.groupBy("centroid_id").applyInPandas(
            per_cell, f"query_id long, vec_id {id_type}")
        probed_cells = list(cell_queries)
        cells = (self.ivf._read_cells()
                 .filter(F.col("centroid_id").isin(probed_cells)
                         if probed_cells else F.lit(False)))
        exact = (cells.select("vec_id", "v")
                 .join(F.broadcast(cand), "vec_id")
                 .join(F.broadcast(q), "query_id")
                 .withColumn("score",
                             F.round(cosine_similarity("v", "q"), 6)))
        w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                   F.col("vec_id"))
        return (exact.select("query_id", "vec_id", "score")
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))

    # ---- maintain ---------------------------------------------------------

    def insert(self, df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> list:
        """O(batch) graph maintenance — NSW insert-by-search on the
        TOUCHED cells only: IVFIndex.upsert routes the batch (frozen
        centroids, cells/idmap rewritten for affected cells), then
        each touched cell's persisted adjacency extends by searching
        it for every new node ((md5, vec_id) order) and linking
        bidirectionally — never a full rebuild, never an untouched
        cell read.  New ids only (an id already in the graph would
        need unlink-relink surgery — that is ``rebuild_cells``, the
        cell-bounded re-canonicalization).  Returns the touched cell
        ids."""
        import numpy as np
        import pandas as pd

        new = df.filter(F.col(vec_col).isNotNull())
        self.ivf._ensure_idmap()
        existing = (self.ivf._read_idmap()
                    .join(F.broadcast(new.select(
                        F.col(id_col).alias("vec_id"))), "vec_id",
                        "left_semi"))
        if existing.limit(1).count():
            raise ValueError(
                "insert is for NEW ids; replacing an existing vector "
                "needs unlink surgery — use rebuild_cells for its cell")
        self.ivf.upsert(df, id_col=id_col, vec_col=vec_col)
        batch = new.select(
            F.col(id_col).alias("vec_id"),
            pq_fixed_point(F.col(vec_col), self.dim).alias("v6"),
            md5_long(F.col(id_col).cast("string")).alias("h"))
        placed = (self.ivf._read_idmap()
                  .join(F.broadcast(batch), "vec_id")
                  .select("vec_id", "v6", "h", "centroid_id"))
        placed_rows = placed.collect()
        touched = sorted({r["centroid_id"] for r in placed_rows})
        if not touched:
            return []
        by_cell: dict = {}
        for r in placed_rows:
            by_cell.setdefault(r["centroid_id"], []).append(r)
        id_type = self._id_type()
        g = (self._read_graph()
             .filter(F.col("centroid_id").isin(touched)))
        m_links, ef = self.m_links, self.ef

        def extend(pdf):
            cell = pdf["centroid_id"].iloc[0]
            newr = sorted(by_cell.get(cell, []),
                          key=lambda r: (r["h"], r["vec_id"]))
            pdf = pdf.sort_values("ord", kind="mergesort")
            V_old = np.array(list(pdf["v6"]), dtype=np.int64) \
                if len(pdf) else np.zeros((0, 0), dtype=np.int64)
            ids = list(pdf["vec_id"])
            adj = [list(a) for a in pdf["neighbors"]]
            if len(pdf):
                V = np.vstack([V_old] + [
                    np.array(r["v6"], dtype=np.int64)[None, :]
                    for r in newr])
            else:
                V = np.array([r["v6"] for r in newr], dtype=np.int64)
            ids = ids + [r["vec_id"] for r in newr]
            start = len(adj)
            adj = nsw_build_adjacency(V, ids, m_links, ef,
                                      adj=adj, start=max(start, 1))
            return pd.DataFrame({
                "ord": range(len(ids)), "vec_id": ids,
                "v6": [list(map(int, v)) for v in V],
                "neighbors": [list(map(int, a)) for a in adj],
                "centroid_id": cell})

        # a batch landing in a PREVIOUSLY EMPTY cell has no graph rows
        # to group on — seed those cells with their batch rows so the
        # grouped pass sees every touched cell
        have = {r[0] for r in g.select("centroid_id")
                .distinct().collect()}
        frames = [g]
        for cell in touched:
            if cell in have:
                continue
            rows = by_cell[cell]
            from document_vector_pipeline_spark.functions.localrel import (
                local_df,
            )
            seed = local_df(
                self.spark,
                [(0, rows[0]["vec_id"], [int(x) for x in rows[0]["v6"]],
                  [], int(cell))], self._graph_schema(id_type))
            # remaining rows of a fresh cell insert through the same
            # extend() path (start=1 — node 0 is the entry)
            by_cell[cell] = rows[1:] if len(rows) > 1 else []
            frames.append(seed)
        g_all = frames[0]
        for f in frames[1:]:
            g_all = g_all.unionByName(f)
        out = (g_all.groupBy("centroid_id").applyInPandas(
            extend, self._graph_schema(id_type))
            .localCheckpoint(eager=True))
        self.ivf._overwrite_partitions(out, self._graph,
                                       "centroid_id", touched)
        return touched

    def rebuild_cells(self, cells: list) -> None:
        """Re-canonicalize the graphs of ``cells`` from their cell
        data (the from-scratch (md5, vec_id) insertion order) —
        cell-bounded, the maintenance move after heavy churn or a
        vector replacement, scheduled by the same cell_stats drift
        metric the IVF rebuild uses."""
        self._build_graph_for(list(cells))


def _hnsw_level(h: int, cap: int = 6) -> int:
    """Deterministic HNSW level assignment: trailing-zero count of the
    node's md5 hash — a uniform 64-bit hash's trailing zeros are
    exactly Geometric(1/2), i.e. P(level >= l) = 2^-l, the standard
    HNSW layer distribution at mL = 1/ln 2 (Malkov & Yashunin 2018)
    with no RNG state to carry (the determinism discipline every rung
    here follows).  Capped so a pathological hash cannot build a
    50-layer tower over a 100-row cell."""
    u = h & ((1 << 64) - 1)
    if u == 0:
        return cap
    lv = 0
    while u & 1 == 0 and lv < cap:
        u >>= 1
        lv += 1
    return lv


def _hnsw_search_layer(adj, lv, levels, V, ids, entries, qv, beam):
    """Best-first beam over ONE layer: node i's neighbors at this
    layer are ``adj[i][lv]`` (guarded by ``levels`` — nodes below the
    layer are never linked on it, so they are unreachable exactly as
    in the previous dict form, without the O(n) per-call dict build).
    Same exact-int64-L2 / vec_id-tie discipline as nsw_greedy_search,
    generalized to multiple entry points (the descend hands down one,
    inserts may seed several); a popped node's unvisited neighbors
    are distanced in one vectorized numpy gather (§4.2) — visited
    set, heap contents and returned tuples are identical."""
    import heapq
    from bisect import insort

    best = []
    cand = []
    visited = set()
    for e in entries:
        if e in visited:
            continue
        visited.add(e)
        d = int(((V[e] - qv) ** 2).sum())
        heapq.heappush(cand, (d, ids[e], e))
        best.append((d, ids[e], e))
    best.sort()
    del best[beam:]
    while cand:
        d, _tie, i = heapq.heappop(cand)
        if len(best) >= beam and d > best[-1][0]:
            break
        nbrs = adj[i][lv] if levels[i] >= lv else ()
        fresh = [j for j in nbrs
                 if j not in visited and not visited.add(j)]
        if not fresh:
            continue
        D = V[fresh] - qv
        ds = (D * D).sum(axis=1)
        for t, j in enumerate(fresh):
            tup = (int(ds[t]), ids[j], j)
            heapq.heappush(cand, tup)
            insort(best, tup)
            if len(best) > beam:
                best.pop()
    return best


def hnsw_build(V, ids, levels, m_links, ef):
    """HNSW proper (Malkov & Yashunin, TPAMI 2018) for one cell:
    insert in the given order; each node descends greedily from the
    top layer to its own level, then links bidirectionally to its m
    nearest on every layer it occupies.  Returns (adj, entry) where
    ``adj[node]`` is a list of per-layer neighbor lists
    (len = level+1) and ``entry`` is the global entry point (the
    highest-level node, first-inserted on ties)."""
    n = len(ids)
    adj = [[[] for _ in range(levels[i] + 1)] for i in range(n)]
    if n == 0:
        return adj, None
    entry, cur_max = 0, levels[0]
    for i in range(1, n):
        ep = [entry]
        # phase 1: greedy descend (beam 1) through layers above ours.
        # Node i is not yet linked anywhere, so direct adjacency access
        # reaches exactly the nodes the old j<i dict reached.
        for lv in range(cur_max, levels[i], -1):
            found = _hnsw_search_layer(
                adj, lv, levels, V, ids, ep, V[i], 1)
            ep = [found[0][2]]
        # phase 2: link on every layer we occupy, top-down
        for lv in range(min(levels[i], cur_max), -1, -1):
            found = _hnsw_search_layer(
                adj, lv, levels, V, ids, ep, V[i], ef)
            for _d, _vid, j in found[:m_links]:
                if j == i:
                    continue
                adj[i][lv].append(j)
                adj[j][lv].append(i)
            ep = [f[2] for f in found]
        if levels[i] > cur_max:
            entry, cur_max = i, levels[i]
    return adj, entry


def hnsw_search(adj, levels, entry, V, ids, qv, beam):
    """Serve path: greedy descend (beam 1) from the entry's top layer
    to layer 1, then a beam search on layer 0 — the standard HNSW
    query; returns nsw_greedy_search-shaped (dist, vec_id, idx)."""
    if entry is None:
        return []
    ep = [entry]
    for lv in range(levels[entry], 0, -1):
        found = _hnsw_search_layer(
            adj, lv, levels, V, ids, ep, qv, 1)
        ep = [found[0][2]]
    return _hnsw_search_layer(adj, 0, levels, V, ids, ep, qv, beam)


class HNSWIndex(NSWIndex):
    """Multi-layer HNSW over the same persisted per-cell layout
    (round-13 stretch — the entry-point hierarchy on top of the
    persisted single-layer graph): graph rows gain ``level`` and
    per-layer neighbor lists; serving descends the tower greedily and
    beam-searches layer 0 only.  Same storage discipline (vectors
    inline, partition-pruned probes), same determinism (md5 insertion
    order, trailing-zero levels, int64 distances, vec_id ties), and
    the same acceptance contract: recall is MEASURED against exact
    and against the single-layer NSW walk (tests/test_similarity.py);
    with beam >= cell size layer 0 is exhaustive over the connected
    cell graph, so full-probe full-beam search equals exhaustive IVF
    — the family's exact-twin ladder."""

    def _graph_schema(self, id_type: str) -> str:
        return (f"ord int, vec_id {id_type}, v6 array<long>, "
                "level int, nbrs array<array<int>>, centroid_id long")

    def _build_graph_for(self, cells: list | None) -> None:
        base = self.ivf._read_cells()
        if cells is not None:
            base = base.filter(F.col("centroid_id").isin(list(cells)))
        src = base.select(
            "centroid_id", "vec_id",
            pq_fixed_point(F.col("v"), self.dim).alias("v6"),
            md5_long(F.col("vec_id").cast("string")).alias("h"))
        id_type = self._id_type()
        m_links, ef = self.m_links, self.ef

        def per_cell(pdf):
            import numpy as np
            import pandas as pd

            pdf = pdf.sort_values(["h", "vec_id"], kind="mergesort")
            V = np.array(list(pdf["v6"]), dtype=np.int64)
            ids = list(pdf["vec_id"])
            levels = [_hnsw_level(int(h)) for h in pdf["h"]]
            adj, _entry = hnsw_build(V, ids, levels, m_links, ef)
            return pd.DataFrame({
                "ord": range(len(ids)), "vec_id": ids,
                "v6": [list(map(int, v)) for v in V],
                "level": levels,
                "nbrs": [[list(map(int, layer)) for layer in a]
                         for a in adj],
                "centroid_id": pdf["centroid_id"].iloc[0]})

        rows = src.groupBy("centroid_id").applyInPandas(
            per_cell, self._graph_schema(id_type))
        if cells is None:
            (rows.repartition("centroid_id").write
             .partitionBy("centroid_id").mode("overwrite")
             .parquet(self._graph))
        else:
            rows = rows.localCheckpoint(eager=True)
            self.ivf._overwrite_partitions(rows, self._graph,
                                           "centroid_id", list(cells))

    def search(self, queries: DataFrame, k: int = 10, nprobe: int = 2,
               qid_col: str = "query_id",
               qvec_col: str = "query_vec") -> DataFrame:
        queries = queries.filter(F.col(qvec_col).isNotNull())
        cents = (self.ivf._read_dir(self.ivf._cents, "cents")
                 .select("centroid_id", "centroid"))
        q = queries.select(F.col(qid_col).alias("query_id"),
                           F.col(qvec_col).alias("q"))
        probes = ivf_probes(q, cents, nprobe)
        cell_queries: dict = {}
        for r in probes.collect():
            cell_queries.setdefault(r["centroid_id"],
                                    []).append(r["query_id"])
        q_rows = (queries.select(
            F.col(qid_col).alias("query_id"),
            pq_fixed_point(F.col(qvec_col), self.dim).alias("q6"))
            .collect())
        import numpy as np

        q6 = {r["query_id"]: np.array(r["q6"], dtype=np.int64)
              for r in q_rows}
        ef, k_beam = self.ef, k
        id_type = self._id_type()
        graph = self._read_graph().filter(
            F.col("centroid_id").isin(list(cell_queries))
            if cell_queries else F.lit(False))

        def per_cell(pdf):
            import pandas as pd
            cell = pdf["centroid_id"].iloc[0]
            qids = cell_queries.get(cell, [])
            if not qids or pdf.empty:
                return pd.DataFrame(columns=["query_id", "vec_id"])
            pdf = pdf.sort_values("ord", kind="mergesort")
            V = np.array(list(pdf["v6"]), dtype=np.int64)
            ids = list(pdf["vec_id"])
            levels = [int(x) for x in pdf["level"]]
            adj = [[list(layer) for layer in a] for a in pdf["nbrs"]]
            # the entry point is the highest-level node, first-inserted
            # on ties — recomputed from persisted state, no extra file
            entry = max(range(len(ids)),
                        key=lambda i: (levels[i], -i)) if ids else None
            rows = []
            for qid in sorted(qids):
                qv = q6[qid]
                for _d, vid, _j in hnsw_search(
                        adj, levels, entry, V, ids, qv,
                        max(ef, k_beam)):
                    rows.append((qid, vid))
            return pd.DataFrame(rows, columns=["query_id", "vec_id"])

        cand = graph.groupBy("centroid_id").applyInPandas(
            per_cell, f"query_id long, vec_id {id_type}")
        probed_cells = list(cell_queries)
        cells = (self.ivf._read_cells()
                 .filter(F.col("centroid_id").isin(probed_cells)
                         if probed_cells else F.lit(False)))
        exact = (cells.select("vec_id", "v")
                 .join(F.broadcast(cand), "vec_id")
                 .join(F.broadcast(q), "query_id")
                 .withColumn("score",
                             F.round(cosine_similarity("v", "q"), 6)))
        w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                   F.col("vec_id"))
        return (exact.select("query_id", "vec_id", "score")
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))

    def insert(self, df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> list:
        """HNSW maintenance = cell-bounded RE-CANONICALIZATION: the
        batch routes through IVFIndex.upsert (frozen centroids), then
        the touched cells rebuild their towers from scratch — an
        O(cell) cost, not O(batch), which is the honest price of the
        multi-layer structure (incremental tower insertion changes
        entry-point history; the single-layer NSWIndex is the O(batch)
        member of the family)."""
        new = df.filter(F.col(vec_col).isNotNull())
        self.ivf.upsert(df, id_col=id_col, vec_col=vec_col)
        self.ivf._ensure_idmap()
        touched = sorted({
            r[0] for r in self.ivf._read_idmap()
            .join(F.broadcast(new.select(F.col(id_col).alias("vec_id"))),
                  "vec_id", "left_semi")
            .select("centroid_id").distinct().collect()})
        if touched:
            self.rebuild_cells(touched)
        return touched
