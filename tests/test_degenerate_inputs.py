"""Degenerate-input contract: every queries() key must evaluate on a
ZERO-ROW corpus — returning an empty (or defined) frame exactly like
its DuckDB oracle would on the same empty tables — instead of raising
from internals.  tools/empty_sweep.py sweeps all keys; this module
pins the families that historically crashed (the round-7/8 ADVICE
class: k-means/IVF centroid training on an empty corpus, persisted
indexes whose zero-row partitioned writes leave nothing to infer a
schema from, null split boundaries fed into interval arithmetic).
"""
import os

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SRC = "/root/testdata/sf0.001"

# one representative per root cause + every key the r8 sweep found broken
EMPTY_PINNED = [
    # centroid training / numpy matmul on an empty corpus
    "ann_ivf", "ann_ivf_tuning", "ann_ivfpq", "ann_recall_multi",
    "ann_refine", "ann_bruteforce_np", "dedup_semantic", "emb_kmeans",
    "emb_cluster_purity", "emb_outliers", "emb_silhouette",
    # persisted-index empty build → schema-sidecar reads
    "ann_ivf_persisted", "ann_ivf_filtered", "ann_ivf_rebuild",
    "ann_ivf_stats", "ann_ivf_upsert", "ann_ivfpq_persisted",
    "store_hybrid_indexed", "store_versioned_hybrid",
    # write-then-read of zero-row partitioned parquet
    "corpus_shards", "source_partitioned",
    # null min(ts) split boundary + interval arithmetic
    "events_forecast_mae",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(tbl.slice(0, 0), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("key", EMPTY_PINNED)
def test_key_evaluates_on_empty_corpus(spark, empty_dir, key):
    df = entry.queries()[key](spark, empty_dir)
    assert df.count() >= 0  # evaluates without raising; schema defined
    assert len(df.columns) > 0
