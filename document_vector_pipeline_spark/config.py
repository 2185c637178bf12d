"""Pipeline configuration.

Defaults mirror the reference's configuration surface:
- max_tokens_per_chunk=250, overlap=0   (DocumentChunker.cs:14-16)
- embedding dims default 1536           (BlobTriggerFunction.cs:27-28)
- char chunk size 2048                  (AzureSQL TextChunker.cs:13)
- word window 40                        (DocumentChunker.cs:84)
- embed batch size 10                   (BlobTriggerFunction.cs:34)

The reference reads these from IConfiguration (app settings); here they are
a plain dataclass passed to the operators.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # chunking
    max_tokens_per_chunk: int = 250   # DocumentChunker.DefaultMaxTokensPerChunk
    overlap_words: int = 0            # DocumentChunker.DefaultOverlapTokens (we
                                      # measure overlap in whitespace tokens)
    char_chunk_size: int = 2048       # AzureSQL TextChunker.MaxChunkSize
    max_word_count: int = 40          # DocumentChunker.MaxChunkWordCount
    chunk_mode: str = "tokens"        # "tokens" = flat token-budget fold;
                                      # "sk_paragraphs" = the reference's
                                      # actual SK TextChunker routing
                                      # (markdown split for .txt/.md,
                                      # plaintext split for analyzer output)

    # embedding
    embedding_dimensions: int = 1536  # BlobTriggerFunction.DefaultDimensions
    embed_batch_size: int = 10        # BlobTriggerFunction.MaxBatchSize (per
                                      # Arrow batch; Spark sizes batches itself,
                                      # kept for API parity)

    # vector store
    store_buckets: int = 64           # hash buckets on document_url (the
                                      # Cosmos partition key path)


DEFAULT_CONFIG = PipelineConfig()
