from document_vector_pipeline_spark.store.ivf_index import IVFIndex
from document_vector_pipeline_spark.store.text_index import TextIndex
from document_vector_pipeline_spark.store.vector_store import VectorStore
from document_vector_pipeline_spark.store.versioned import (
    BucketedVersionedTable,
    VersionedTable,
)
from document_vector_pipeline_spark.store.versioned_store import (
    VersionedVectorStore,
)

__all__ = ["IVFIndex", "TextIndex", "VectorStore", "VersionedTable",
           "BucketedVersionedTable", "VersionedVectorStore"]
