"""SQL surface: expose the whole operator catalog as Spark SQL views.

``register_all(spark, sf_dir)`` registers the ten corpus tables plus one
temp view per contract query, so an analyst (or a JDBC/Thrift client on a
real cluster) can drive the engine entirely through ``spark.sql``:

    >>> from document_vector_pipeline_spark import sql_surface
    >>> sql_surface.register_all(spark, "/root/testdata/sf0.01")
    >>> spark.sql("select * from dedup_exact where n_dups > 1").show()
    >>> spark.sql(\"\"\"
    ...   select d.doc_id, q.passes
    ...   from documents d join corpus_qualityfilter q using (doc_id)
    ... \"\"\").show()

Views are LAZY — registering is plan construction only; nothing executes
until a view is queried, and Catalyst optimizes across the view boundary
(filters on a view push down into the operator's plan).  Store-backed
queries (vector_topk, store_*) materialize scratch stores on first
evaluation, so they are opt-in via ``include_store=True``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from document_vector_pipeline_spark import contract
from document_vector_pipeline_spark.sources import register_views

# queries whose construction has side effects (scratch store/file writes)
# or that re-read their own output directories — excluded by default
_STORE_BACKED = frozenset({
    "pipeline_e2e", "store_schema", "store_upsert", "store_delete",
    "store_compact", "store_reembed", "vector_topk", "vector_quantized",
    "vector_topk_filtered", "vector_search_batch", "ann_ivf_persisted",
    "source_jsonl", "source_csv", "source_partitioned",
    "source_orc", "source_bucketed", "store_timetravel",
    "corpus_shards", "ann_ivfpq_persisted", "ann_ivf_upsert",
    "store_hybrid_search", "ann_ivf_stats",
    # round 6: persisted text index / versioned store builders
    "text_bm25_indexed", "store_hybrid_indexed", "store_versioned_search",
    "text_df_topk", "text_phrase_search", "text_near_search",
    "text_snippets", "text_bm25_filtered", "ann_ivf_filtered",
})


def register_all(spark: SparkSession, sf_dir: str,
                 include_store: bool = False) -> list[str]:
    """Register base tables + one temp view per operator query; returns
    the registered view names."""
    register_views(spark, sf_dir)
    names = []
    for name, fn in contract.queries().items():
        if not include_store and name in _STORE_BACKED:
            continue
        fn(spark, sf_dir).createOrReplaceTempView(name)
        names.append(name)
    return names
