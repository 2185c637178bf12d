from document_vector_pipeline_spark.store.vector_store import VectorStore

__all__ = ["VectorStore"]
