from document_vector_pipeline_spark.store.ivf_index import IVFIndex
from document_vector_pipeline_spark.store.vector_store import VectorStore
from document_vector_pipeline_spark.store.versioned import VersionedTable

__all__ = ["IVFIndex", "VectorStore", "VersionedTable"]
