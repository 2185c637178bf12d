"""End-to-end ingestion parity: files on disk → route → chunk → embed →
upsert → search, plus the delete event."""

from pyspark.sql import functions as F

from document_vector_pipeline_spark.config import PipelineConfig
from document_vector_pipeline_spark.operators.pipeline import (
    blobs_to_chunks,
    documents_table_to_store,
    ingest_blobs,
)
from document_vector_pipeline_spark.sources import read_text_blobs
from document_vector_pipeline_spark.store.vector_store import VectorStore

CFG = PipelineConfig(max_tokens_per_chunk=16, embedding_dimensions=16,
                     store_buckets=8)


def test_ingest_from_files_and_search(spark, tmp_path):
    blob_dir = tmp_path / "blobs"
    blob_dir.mkdir()
    (blob_dir / "a.txt").write_text("alpha beta gamma " * 30)
    (blob_dir / "b.md").write_text("# heading\n\ndelta epsilon " * 20)
    (blob_dir / "c.pdf").write_text("zeta eta theta " * 25)  # analyzer route

    store = VectorStore(spark, str(tmp_path / "store"), CFG)
    blobs = read_text_blobs(spark, str(blob_dir))
    total = ingest_blobs(blobs, store, CFG)
    assert total > 3  # several chunks per blob at a 16-token budget

    df = store.read()
    assert df.select("document_url").distinct().count() == 3
    # chunk numbers restart per document (reference chunkNumber counter)
    assert df.filter((F.col("id") == "0")).count() == 3

    # search returns the ingested text
    q = store.read().filter(F.col("chunk_text").contains("alpha")) \
        .select("embedding").first().embedding
    top = store.search(list(q), k=1).first()
    assert "alpha" in top.chunk_text

    # delete event removes the document's chunks
    url = df.filter(F.col("chunk_text").contains("zeta")) \
        .select("document_url").first().document_url
    store.delete_document(url)
    assert store.read().filter(F.col("document_url") == url).count() == 0


def test_routes_cover_txt_md_other(spark, tmp_path):
    blob_dir = tmp_path / "blobs2"
    blob_dir.mkdir()
    (blob_dir / "x.txt").write_text("one two three")
    (blob_dir / "y.md").write_text("four five six")
    (blob_dir / "z.bin").write_text("seven eight nine")
    chunks = blobs_to_chunks(read_text_blobs(spark, str(blob_dir)), CFG)
    texts = {r.chunk_text for r in chunks.collect()}
    assert texts == {"one two three", "four five six", "seven eight nine"}


def test_documents_table_adapter(spark, docs_small, tmp_path):
    store = VectorStore(spark, str(tmp_path / "docstore"), CFG)
    documents_table_to_store(docs_small.limit(40), store, CFG)
    df = store.read()
    assert df.select("document_url").distinct().count() == 40
    assert df.filter(F.size("embedding") != 16).count() == 0


# ---------------------------------------------------------------------------
# BOM / encoding-aware blob reading (BlobTriggerFunction.cs:167-184 parity)
# ---------------------------------------------------------------------------

def test_bom_aware_blob_reading(spark, tmp_path):
    """The same text authored as plain UTF-8, UTF-8-with-BOM, UTF-16 LE and
    UTF-16 BE must decode identically (BOM stripped, right codec picked)."""
    from document_vector_pipeline_spark.sources import (
        read_encoded_blobs,
        read_text_blobs,
    )

    body = "first line of text\nsecond line with ümlaut"
    enc_dir = tmp_path / "enc"
    enc_dir.mkdir()
    (enc_dir / "plain.txt").write_bytes(body.encode("utf-8"))
    (enc_dir / "bom8.txt").write_bytes(body.encode("utf-8-sig"))
    (enc_dir / "u16le.txt").write_bytes("﻿".encode("utf-16-le")
                                        + body.encode("utf-16-le"))
    (enc_dir / "u16be.txt").write_bytes("﻿".encode("utf-16-be")
                                        + body.encode("utf-16-be"))
    got = {r.document_url.rsplit("/", 1)[-1]: r.content
           for r in read_encoded_blobs(spark, str(enc_dir)).collect()}
    assert got == {"plain.txt": body, "bom8.txt": body,
                   "u16le.txt": body, "u16be.txt": body}

    # the plain text source strips a decoded UTF-8 BOM too
    txt_dir = tmp_path / "txt"
    txt_dir.mkdir()
    (txt_dir / "bom8.txt").write_bytes(body.encode("utf-8-sig"))
    rows = read_text_blobs(spark, str(txt_dir)).collect()
    assert rows[0].content == body


def test_sk_paragraph_mode_routes_by_extension(spark):
    from document_vector_pipeline_spark.config import PipelineConfig
    from document_vector_pipeline_spark.operators.pipeline import (
        blobs_to_chunks,
    )

    blobs = spark.createDataFrame(
        [("mem://a.txt", "One two. Three four! Five six seven eight nine"),
         ("mem://b.bin", "plain words only here")],
        "document_url string, content string")
    cfg = PipelineConfig(max_tokens_per_chunk=8, chunk_mode="sk_paragraphs")
    out = {r["document_url"]: r for r in
           blobs_to_chunks(blobs, cfg).orderBy("chunk_number").collect()
           if r["chunk_number"] == 0}
    # .txt takes the markdown split: sentence units joined by AppendLine
    assert "\n" in out["mem://a.txt"]["chunk_text"]
    assert out["mem://a.txt"]["chunk_text"].startswith("One two.")
    # non-text falls back to the analyzer cascade + plaintext split
    assert out["mem://b.bin"]["chunk_text"]
