"""Chunk operator: documents -> chunks (one row per chunk).

The three reference chunkers (see functions/chunking.py for the semantics
and citations) exposed as DataFrame operators.  posexplode supplies the
chunk_number (parity with the reference's running chunkNumber counter,
DocumentChunker.cs:57-60).

Scale notes: chunking is a narrow map — no shuffle, no Python.  Output is
one row per chunk with the parent's key columns carried through, so the
downstream embed/upsert stages inherit the scan's partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_vector_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig
from document_vector_pipeline_spark.functions import chunking as C


def chunk_documents(docs: DataFrame,
                    mode: str = "tokens",
                    text_col: str = "text",
                    id_cols: Sequence[str] = ("doc_id",),
                    cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Split `text_col` into chunks.

    mode='tokens'      — token-budget packing (DocumentChunker.cs:58-80)
    mode='paragraphs'  — SK line-preferring paragraph build
                         (TextChunker.SplitPlainTextParagraphs semantics,
                         DocumentChunker.cs:59-80)
    mode='md_paragraphs' — SK sentence-preferring markdown build
                         (TextChunker.SplitMarkdownParagraphs, the path
                         BOTH .txt and .md take: BlobTriggerFunction.cs:69-81)
    mode='chars'       — 2048-char windows    (AzureSQL TextChunker.cs:15-50)
    mode='words'       — 40-word windows      (DocumentChunker.cs:84-113)

    Returns id_cols + (chunk_number int, chunk_text string, page_number int).
    """
    words = C.norm_words(F.col(text_col))
    if mode == "paragraphs":
        chunks = C.token_paragraph_chunks(F.col(text_col),
                                          cfg.max_tokens_per_chunk)
    elif mode == "md_paragraphs":
        chunks = C.token_paragraph_chunks(F.col(text_col),
                                          cfg.max_tokens_per_chunk,
                                          markdown=True)
    elif mode == "tokens":
        spans = C.token_budget_spans(words, cfg.max_tokens_per_chunk,
                                     cfg.overlap_words)
        chunks = C.spans_to_chunks(words, spans)
    elif mode == "chars":
        spans = C.char_window_spans(words, cfg.char_chunk_size)
        chunks = C.spans_to_chunks(words, spans)
    elif mode == "words":
        chunks = F.transform(
            C.word_window_chunks(words, cfg.max_word_count),
            lambda t: F.struct(t.alias("chunk_text"),
                               F.lit(0).alias("page_number")))
    else:
        raise ValueError(f"unknown chunk mode: {mode}")

    keep = [F.col(c) for c in id_cols]
    return (docs
            .select(*keep, F.posexplode(chunks).alias("chunk_number", "ch"))
            .select(*keep, F.col("chunk_number").cast("int"),
                    F.col("ch.chunk_text").alias("chunk_text"),
                    F.col("ch.page_number").alias("page_number")))
