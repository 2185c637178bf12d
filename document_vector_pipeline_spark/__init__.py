"""document_vector_pipeline_spark — a PySpark-native engine with the query
and data-processing capabilities of Azure/document-vector-pipeline.

The reference (/root/reference) is a pair of Azure Functions (CosmosDB and
AzureSQL flavors) that ingest blobs, parse them, chunk the text, generate
embeddings and upsert them into a vector store.  This package re-expresses
that pipeline — plus the large-scale training-data operators a 100 TB corpus
needs (dedup, ANN, text analysis, multimodal plumbing) — as declarative
PySpark DataFrame transformations so Catalyst/Tungsten pick the physical
plan and the whole thing scales horizontally.

Layout:
  config        pipeline configuration (chunk sizes, dims, batch sizes)
  session       SparkSession factory tuned for the workload
  sources       table + blob readers (batch and streaming)
  functions/    column-level expressions (chunking, hashing, text, vectors)
  operators/    DataFrame -> DataFrame operators (parse, chunk, embed,
                dedup, similarity, textstats, multimodal)
  store/        the parquet-backed vector store (upsert/delete/search)
  streaming/    Structured-Streaming ingest (blob-trigger parity) + events
  plans/        relational analytics over the star schema
"""

from document_vector_pipeline_spark.config import PipelineConfig
from document_vector_pipeline_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]
__version__ = "0.1.0"
