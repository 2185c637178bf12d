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
