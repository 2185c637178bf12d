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

from pyspark.sql import DataFrame
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
    sym = (edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
           .union(edges.select(F.col(dst).alias("n"),
                               F.col(src).alias("m"))))
    sym = sym.cache()
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
        new_labels = (labels.select("n", "lbl").union(nbr)
                      .groupBy("n").agg(F.min("lbl").alias("lbl"))
                      .cache())
        new_sum = label_sum(new_labels)
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()  # labels' cache is already materialized by label_sum
    return labels.select(F.col("n").alias("id"),
                         F.col("lbl").alias("component"))


def dedup_clusters(pairs: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """Resolve a near-dup pair list into clusters: (id, component) ordered,
    component = min doc id — the canonical survivor.  Rows not in any pair
    are implicitly their own singleton cluster (not emitted)."""
    return (connected_components(pairs, src, dst)
            .orderBy("component", "id"))
