"""Connected-components unit tests on hand-built graphs."""

from __future__ import annotations

from document_vector_pipeline_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {r["id"]: r["component"]
            for r in connected_components(df).collect()}


def test_single_edge(spark):
    assert _cc(spark, [(1, 2)]) == {1: 1, 2: 1}


def test_chain_converges_past_one_hop(spark):
    # 5-node path: label must propagate the full diameter
    labels = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert labels == {i: 1 for i in range(1, 6)}


def test_two_components_and_order(spark):
    labels = _cc(spark, [(10, 20), (20, 30), (7, 8)])
    assert labels == {10: 10, 20: 10, 30: 10, 7: 7, 8: 7}


def test_cluster_output_sorted(spark):
    df = spark.createDataFrame([(5, 3), (9, 8), (3, 1)], ["id_a", "id_b"])
    rows = [(r["component"], r["id"]) for r in dedup_clusters(df).collect()]
    assert rows == [(1, 1), (1, 3), (1, 5), (8, 8), (8, 9)]


def test_pagerank_matches_python_reference(spark):
    """Integer fixed-point PageRank on a small path graph vs a literal
    Python re-implementation of the same recurrence."""
    from document_vector_pipeline_spark.operators.graph import pagerank

    und = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(df, iterations=4).collect()}

    unit = 10 ** 9
    adj, deg = {}, {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        deg[u] = deg.get(u, 0) + 1
    nodes = sorted(deg)
    rank = {n: unit for n in nodes}
    for _ in range(4):
        inbox = {n: 0 for n in nodes}
        for u in nodes:
            c = rank[u] * 85 // (100 * deg[u])
            for v in adj[u]:
                inbox[v] += c
        rank = {n: unit * 15 // 100 + inbox[n] for n in nodes}
    assert got == rank
    assert rank["b"] > rank["a"]  # interior nodes accumulate more mass


def test_pagerank_partition_invariant(spark):
    from document_vector_pipeline_spark.operators.graph import pagerank

    und = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    edges = [e for e in und + [(b, a) for a, b in und] if e[0] != e[1]]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = [tuple(r) for r in pagerank(df, iterations=3).collect()]
    b = [tuple(r) for r in pagerank(df.repartition(13),
                                    iterations=3).collect()]
    assert a == b


def test_triangle_count_hand_computed(spark):
    from document_vector_pipeline_spark.operators.graph import triangle_count

    # graph: triangle 1-2-3, plus a dangling edge 3-4, plus a second
    # triangle 2-3-4 (edges 2-4, 3-4 present) -> triangles: {1,2,3},{2,3,4}
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (2, 4)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    row = triangle_count(e).collect()[0]
    assert row["n_edges"] == 5
    assert row["n_triangles"] == 2


def test_triangle_count_empty_graph(spark):
    from document_vector_pipeline_spark.operators.graph import triangle_count

    e = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    row = triangle_count(e).collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (2, 0)


def test_degree_histogram_hand_computed(spark):
    from document_vector_pipeline_spark.operators.graph import (
        degree_histogram,
    )

    # star: hub 1 connected to 2,3,4 (deg 3 -> bucket 2); leaves deg 1
    edges = [(1, 2), (1, 3), (1, 4)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["bucket"]: r for r in degree_histogram(e).collect()}
    assert out[1]["n_nodes"] == 3 and out[1]["max_degree"] == 1
    assert out[2]["n_nodes"] == 1 and out[2]["min_degree"] == 3


def test_cluster_size_histogram_hand_computed(spark):
    from document_vector_pipeline_spark.operators.graph import (
        cluster_size_histogram,
    )

    # two clusters: {1,2} (size 2 -> bucket 2) and {5,6,7,8,9} via a chain
    # (size 5 -> bucket 3)
    edges = [(1, 2), (5, 6), (6, 7), (7, 8), (8, 9)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["bucket"]: r for r in cluster_size_histogram(e).collect()}
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[3]["n_clusters"] == 1 and out[3]["max_size"] == 5


def test_kcore_peels_low_degree_nodes(spark):
    from document_vector_pipeline_spark.operators.graph import kcore

    # triangle 1-2-3 (2-core) + pendant chain 3-4-5 (peeled at k=2)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)],
        "id_a long, id_b long")
    jsc = spark.sparkContext._jsc.sc()
    cached_before = len(list(jsc.getRDDStorageInfo()))
    out = {r["id"]: r["core_deg"] for r in
           kcore(pairs, k=2, rounds=4).collect()}
    assert set(out) == {1, 2, 3}
    assert all(v == 2 for v in out.values())
    # k=3 kills everything (no 3-core in a triangle+chain)
    assert kcore(pairs, k=3, rounds=4).count() == 0
    # per-round checkpoint blocks are bounded (rounds+2 per invocation,
    # reaped by the periodic ContextCleaner GC once unreferenced) — the
    # loop must not accumulate unboundedly beyond that
    assert (len(list(jsc.getRDDStorageInfo()))
            <= cached_before + 2 * (4 + 2))


def _lp(spark, edges, iterations=4):
    from document_vector_pipeline_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {r["id"]: r["community"]
            for r in label_propagation(df, iterations=iterations).collect()}


def test_lp_two_cliques_with_bridge_split_where_cc_fuses(spark):
    """Two triangles joined by one bridge edge: CC gives one component,
    LPA keeps each triangle on its own majority label."""
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    edges = tri1 + tri2 + bridge
    assert len(set(_cc(spark, edges).values())) == 1
    lab = _lp(spark, edges)
    assert lab[1] == lab[2] == lab[3]
    assert lab[10] == lab[11] == lab[12]
    assert lab[1] != lab[10]


def test_lp_one_round_adopts_min_neighbour_on_ties(spark):
    """Round 1 on a path 1-2-3: node 2's neighbours {1,3} tie at count
    1 → smallest label 1; endpoints adopt their only neighbour."""
    lab = _lp(spark, [(1, 2), (2, 3)], iterations=1)
    assert lab == {1: 2, 2: 1, 3: 2}


def test_lp_deterministic_across_runs(spark):
    edges = [(i, (i * 7) % 23 + 100) for i in range(40)]
    assert _lp(spark, edges) == _lp(spark, edges)


def test_lp_zero_iterations_is_identity_labels(spark):
    lab = _lp(spark, [(1, 2), (3, 4)], iterations=0)
    assert lab == {1: 1, 2: 2, 3: 3, 4: 4}
