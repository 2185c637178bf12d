"""Graph operators for corpus curation — the missing step between
pairwise near-dup detection and an actual deletion list is resolving the
pair graph into clusters (keep one representative per component).

Connected components via iterative min-label propagation: every node
adopts the smallest id reachable so far; one join + one aggregate per
round, converging in O(component diameter) rounds.  Near-dup graphs are
shallow (diameter is small even when components are large — dup clusters
are near-cliques), so a handful of rounds suffices at any data size; the
driver loop only runs Spark jobs, it never collects data.  Each round's
label frame is cached and the previous one unpersisted, so the lineage
(and the DAG the scheduler sees) stays one round deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component is
    the minimum node id in the connected component.  Converges when a
    full round changes no label (checked with a cheap aggregate, not a
    collect of labels)."""
    # sym is re-scanned every round (labels init + each iteration's join);
    # without a cache the whole upstream pair pipeline (e.g. MinHash-LSH)
    # would recompute per round.
    # cached PARTITIONED BY the per-round join key m (§2.4, the
    # label_propagation edge-partitioning): when the label frame
    # outgrows the broadcast threshold — the 100 TB regime — each
    # round's join reuses the cached layout and only the node-sized
    # label frame moves (measured neutral-to-positive at bench scale).
    sym = (edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
           .union(edges.select(F.col(dst).alias("n"),
                               F.col(src).alias("m"))))
    sym = sym.repartition("m").cache()
    labels = (sym.select("n", F.least("n", "m").alias("lbl"))
              .groupBy("n").agg(F.min("lbl").alias("lbl"))
              .cache())

    def label_sum(df: DataFrame):
        # labels only ever decrease, so an unchanged sum certifies
        # convergence — one aggregate per round instead of a self-join.
        # decimal(38,0) keeps the certificate exact for 64-bit ids.
        return df.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        nbr = (sym.join(labels.withColumnRenamed("n", "m"), "m")
               .select("n", "lbl"))
        # localCheckpoint, not cache: `labels` feeds the round TWICE
        # (union side + join side), so a cache — which truncates
        # execution but not the LOGICAL plan — would nest 2^round copies
        # of the upstream pair-join tree into later plans; the same
        # plan-analysis blowup kcore hit at 3 refs/round.  Checkpointing
        # keeps every round's plan one round deep.
        new_labels = (labels.select("n", "lbl").union(nbr)
                      .groupBy("n").agg(F.min("lbl").alias("lbl"))
                      .localCheckpoint(eager=True))
        new_sum = label_sum(new_labels)
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels.select(F.col("n").alias("id"),
                         F.col("lbl").alias("component"))


def dedup_clusters(pairs: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """Resolve a near-dup pair list into clusters: (id, component) ordered,
    component = min doc id — the canonical survivor.  Rows not in any pair
    are implicitly their own singleton cluster (not emitted)."""
    return (connected_components(pairs, src, dst)
            .orderBy("component", "id"))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 5, unit: int = 10 ** 9) -> DataFrame:
    """(node, rank, score): PageRank after a FIXED number of power
    iterations, in exact integer fixed-point units — the iterative-
    algorithm template (the loop drives Spark jobs; data never visits the
    driver).

    Arithmetic: ranks start at ``unit`` per node; each round every node
    sends floor(rank * 85 / (100 * outdeg)) along each out-edge and
    collects base = floor(unit * 15 / 100) plus the integer sum of
    arriving contributions.  Positive-integer floor division and integer
    sums are associative/deterministic, so any partitioning — and the
    DuckDB oracle's unrolled CTEs — produces bit-identical ranks (a
    float PageRank can NOT be oracle-checked exactly across engines).

    Per round: one join (contributions) + one groupBy (inbox sum), the
    canonical Pregel step as DataFrames.  Each round's rank frame is
    cached and the previous unpersisted, keeping lineage one round deep;
    at 1000-executor scale you'd checkpoint every ~10 rounds instead.
    int64 headroom: total mass is n*unit, so keep n*unit << 9.2e18
    (shrink ``unit`` for >1e9-node graphs, or move to decimal(38,0))."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # out-degree is loop-invariant: attach it to the edge list ONCE and
    # cache that, so each round is exactly one join (ranks) + one groupBy
    w_u = Window.partitionBy("u")
    ed = e.withColumn("deg", F.count("*").over(w_u)).cache()
    nodes = (ed.select(F.col("u").alias("node"))
             .union(ed.select(F.col("v").alias("node"))).distinct().cache())
    nodes.count()
    base = unit * 15 // 100
    ranks = nodes.select("node", F.lit(unit).cast("long").alias("rank")).cache()
    for _ in range(iterations):
        contrib = (ed.join(ranks.withColumnRenamed("node", "u"), "u")
                   .select(F.col("v").alias("node"),
                           F.expr("rank * 85 div (100 * deg)").alias("c")))
        # union-then-sum instead of left join: one shuffle delivers both
        # the inbox sums and the base term for inbox-less nodes
        new_ranks = (contrib
                     .unionByName(nodes.select(
                         "node", F.lit(0).cast("long").alias("c")))
                     .groupBy("node")
                     .agg((F.lit(base) + F.sum("c")).cast("long")
                          .alias("rank"))
                     .cache())
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    ed.unpersist()
    nodes.unpersist()
    return (ranks.select("node", "rank",
                         F.round(F.col("rank") / unit, 6).alias("score"))
            .orderBy(F.desc("rank"), "node"))


def label_propagation(edges: DataFrame, src: str = "id_a",
                      dst: str = "id_b",
                      iterations: int = 4) -> DataFrame:
    """(id, community): synchronous label propagation (Raghavan et al.
    2007) after a FIXED number of rounds — community detection where
    connected components are too coarse: one bridge edge fuses two
    dense groups CC can never separate, while LPA assigns them
    different majority labels.  The curation use is grouping near-dup
    /citation/trade graphs into behaviourally-cohesive families for
    per-family sampling quotas.

    Deterministic contract (what makes it oracle-checkable): labels
    init to the node's own id; each round EVERY node simultaneously
    adopts the most frequent label among its neighbours, ties broken
    by smallest label; fixed ``iterations`` (no convergence test —
    synchronous LPA can oscillate on bipartite structure, so a fixed
    round count is the only engine-portable stopping rule).

    Plan: per round ONE equi-join (neighbour labels), ONE (node,
    label) groupBy (map-side combinable frequencies), then the
    per-node argmax as a second AGGREGATE — min over the
    struct(-count, label) lexicographic order, identical winner to
    the (c desc, lbl asc) rank-1 window row but map-side combinable
    and sort-free (the window form paid an exchange + full sort and
    shuffled every (node, label) histogram row; the aggregate ships
    at most one candidate per node per map task).  Each round
    localCheckpoints (labels feed the next round's join once, but
    the plan would otherwise nest a copy of the upstream edge
    pipeline per round — the connected_components lesson)."""
    # the edge table is joined on m EVERY round: cache it partitioned
    # by m (one extra edge shuffle at build) so each round's join
    # reuses the cached partitioning and only the node-sized label
    # frame moves (§2.4 — the standard Pregel edge-partitioning)
    sym = (edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
           .union(edges.select(F.col(dst).alias("n"),
                               F.col(src).alias("m")))
           .distinct().repartition("m").cache())
    labels = (sym.select("n").distinct()
              .select("n", F.col("n").alias("lbl"))
              .localCheckpoint(eager=True))
    for _ in range(iterations):
        freq = (sym.join(labels.select(F.col("n").alias("m"), "lbl"), "m")
                .groupBy("n", "lbl").agg(F.count(F.lit(1)).alias("c")))
        new_labels = (freq.groupBy("n")
                      .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                          F.col("lbl").alias("lbl")))
                           .alias("__s"))
                      .select("n", F.col("__s.lbl").alias("lbl"))
                      .localCheckpoint(eager=True))
        labels = new_labels
    sym.unpersist()
    return labels.select(F.col("n").alias("id"),
                         F.col("lbl").alias("community"))


def triangle_count(pairs: DataFrame, a_col: str = "id_a",
                   b_col: str = "id_b") -> DataFrame:
    """Exact triangle count of an undirected graph given as ordered edges
    (a < b), plus the edge count: one row (n_edges, n_triangles).  On the
    near-dup pair graph this measures cluster density — triangle-heavy
    components are boilerplate families where transitive dedup is safe;
    triangle-free chains are the risky drift cases.

    The ordered-edge wedge join (x<y<z via (x,y)⋈(y,z)⋈(x,z)) counts each
    triangle exactly once and bounds wedge fan-out by the HIGHER endpoint's
    forward-degree.  At 100 TB scale you'd pre-orient edges by total degree
    instead of id (the standard compact-forward refinement — same plan,
    one extra degree join) so hub vertices don't own quadratic wedges; AQE
    skew-join covers the moderate-hub middle ground."""
    e = pairs.select(F.col(a_col).alias("x"),
                     F.col(b_col).alias("y")).distinct()
    wedges = e.join(e.select(F.col("x").alias("y"), F.col("y").alias("z")),
                    "y")
    tri = wedges.join(e.select(F.col("x"), F.col("y").alias("z")),
                      ["x", "z"])
    return (e.agg(F.count("*").cast("long").alias("n_edges"))
            .crossJoin(tri.agg(F.count("*").cast("long")
                               .alias("n_triangles"))))


def degree_histogram(pairs: DataFrame, a_col: str = "id_a",
                     b_col: str = "id_b") -> DataFrame:
    """Degree distribution of an undirected pair graph in power-of-two
    buckets (bit-length convention, as corpus_lenhist): completes the
    graph diagnostic set — pagerank (influence), components (clusters),
    triangles (density), degrees (skew).  A heavy-degree tail here is the
    advance warning that the wedge join in triangle_count and the label
    propagation in dedup_clusters will need degree-based orientation.

    One union (map-side), one degree aggregation, one ≤64-bucket
    reduce."""
    ends = (pairs.select(F.col(a_col).alias("node"))
            .unionAll(pairs.select(F.col(b_col).alias("node"))))
    deg = ends.groupBy("node").agg(F.count("*").alias("degree"))
    bucket = F.length(F.bin(F.col("degree"))).cast("int").alias("bucket")
    return (deg.groupBy(bucket)
            .agg(F.count("*").cast("long").alias("n_nodes"),
                 F.min("degree").alias("min_degree"),
                 F.max("degree").alias("max_degree"))
            .orderBy("bucket"))


def cluster_size_histogram(pairs: DataFrame, src: str = "id_a",
                           dst: str = "id_b") -> DataFrame:
    """Near-dup cluster-size distribution in power-of-two buckets — the
    dedup REPORT artifact: bucket-2 clusters are ordinary duplicates,
    bucket-5+ clusters are boilerplate families whose transitive removal
    deserves review before neardup_dedup cuts all but one member.
    Singletons never enter the pair graph, so every cluster here has
    size ≥ 2.

    One label-propagation pass (connected_components), a component-count
    aggregate, and a ≤64-bucket reduce."""
    comp = dedup_clusters(pairs, src, dst)
    sizes = comp.groupBy("component").agg(F.count("*").alias("size"))
    bucket = F.length(F.bin(F.col("size"))).cast("int").alias("bucket")
    return (sizes.groupBy(bucket)
            .agg(F.count("*").cast("long").alias("n_clusters"),
                 F.min("size").alias("min_size"),
                 F.max("size").alias("max_size"),
                 F.sum("size").cast("long").alias("n_docs"))
            .orderBy("bucket"))


def kcore(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
          k: int = 2, rounds: int = 4) -> DataFrame:
    """k-core pruning after a FIXED number of peel rounds: repeatedly
    drop nodes with degree < k, keep edges between survivors; output
    (id, core_deg) for surviving nodes with their within-core degree.
    On near-dup graphs this separates dense boilerplate cliques (which
    survive any k) from incidental pairs (peeled in round 1) — the
    triage step before deciding cluster-wide removal policies.

    The iterative-algorithm template again (like pagerank): each round
    is one degree aggregate + two semi-join-shaped prunes.  Each round's
    edge frame is EAGERLY LOCAL-CHECKPOINTED, not just cached: `e` feeds
    the round THREE times (itself + both sides' degree prune), so a
    cache — which truncates execution but not the logical plan — would
    nest ~3^rounds copies of the upstream pair-join tree into the final
    plan and blow up plan analysis (observed: OOM generating the tree
    string at 4 rounds over the MinHash band join).  Checkpointing cuts
    the lineage to one round; the previous round's blocks are released
    as soon as the next is materialized.  A FIXED round count keeps the
    DuckDB oracle an unrolled CTE; near-dup graphs peel to a fixed point
    in a handful of rounds."""
    swap = edges.select(F.col(dst).alias("n"), F.col(src).alias("m"))
    e = (edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
         .union(swap).localCheckpoint(eager=True))
    for _ in range(rounds):
        d = (e.groupBy("n").agg(F.count("*").alias("deg"))
             .filter(F.col("deg") >= k).select("n"))
        new_e = (e.join(d, "n")
                 .join(d.withColumnRenamed("n", "m"), "m")
                 .select("n", "m").localCheckpoint(eager=True))
        e.unpersist()
        e = new_e
    out = (e.groupBy("n")
           .agg(F.count("*").cast("long").alias("core_deg"))
           .select(F.col("n").alias("id"), "core_deg")
           .orderBy("id"))
    result = out.localCheckpoint(eager=True)
    e.unpersist()
    return result
