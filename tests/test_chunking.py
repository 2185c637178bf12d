"""Chunker unit tests: Spark expressions vs the pure-Python replication of
the reference semantics, on synthetic corner cases and real testdata."""

import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.config import PipelineConfig
from document_vector_pipeline_spark.functions import chunking as C
from document_vector_pipeline_spark.operators.chunk import chunk_documents
from tests.reference_semantics import (
    char_window_reference,
    sk_paragraph_reference,
    token_budget_reference,
    word_window_reference,
)

CASES = [
    "",
    "one",
    "a b",
    "  leading and   trailing   ",
    "word " * 100,
    "supercalifragilisticexpialidocious " * 30,
    "x" * 300,  # single word longer than any budget
    "short text with several words and a bit more content to chunk",
]


def _spark_chunks(spark, text, mode, **cfg_kw):
    cfg = PipelineConfig(**cfg_kw)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = (chunk_documents(df, mode=mode, cfg=cfg)
            .orderBy("chunk_number").collect())
    return [(r.chunk_text, r.page_number) for r in rows]


@pytest.mark.parametrize("text", CASES)
def test_char_window_matches_reference(spark, text):
    words = text.split()
    expected = char_window_reference(words, 64)
    got = _spark_chunks(spark, text, "chars", char_chunk_size=64)
    assert got == expected


@pytest.mark.parametrize("text", CASES)
def test_word_window_matches_reference(spark, text):
    words = text.split()
    expected = word_window_reference(words, 5)
    got = [c for c, _ in _spark_chunks(spark, text, "words", max_word_count=5)]
    assert got == expected


@pytest.mark.parametrize("text", CASES)
@pytest.mark.parametrize("overlap", [0, 2])
def test_token_budget_matches_reference(spark, text, overlap):
    words = text.split()
    expected = token_budget_reference(words, 16, overlap)
    got = [c for c, _ in _spark_chunks(spark, text, "tokens",
                                       max_tokens_per_chunk=16,
                                       overlap_words=overlap)]
    assert got == expected


def test_chunks_reassemble_to_document(spark, docs_small):
    """Property: concatenating token-mode chunks (overlap=0) restores the
    whitespace-normalized document."""
    cfg = PipelineConfig(max_tokens_per_chunk=16, overlap_words=0)
    chunks = chunk_documents(docs_small, mode="tokens", cfg=cfg)
    rebuilt = (chunks.groupBy("doc_id")
               .agg(F.array_join(F.array_sort(F.collect_list(
                   F.struct("chunk_number", "chunk_text"))).getField("chunk_text"), " ")
                   .alias("rebuilt")))
    joined = (docs_small
              .select("doc_id",
                      F.array_join(C.norm_words(F.col("text")), " ").alias("orig"))
              .join(rebuilt, "doc_id"))
    bad = joined.filter(F.col("orig") != F.col("rebuilt")).count()
    assert bad == 0


def test_token_budget_never_exceeds_budget(spark, docs_small):
    """No chunk exceeds the token budget unless it is a single word."""
    cfg = PipelineConfig(max_tokens_per_chunk=16, overlap_words=0)
    chunks = chunk_documents(docs_small, mode="tokens", cfg=cfg)
    over = chunks.filter(
        (F.floor(F.length("chunk_text") / 4) > 16)
        & (F.size(F.split("chunk_text", " ")) > 1)
    ).count()
    assert over == 0


# ---------------------------------------------------------------------------
# SK SplitPlainTextParagraphs parity (mode='paragraphs')
# ---------------------------------------------------------------------------

MULTILINE_CASES = CASES + [
    "alpha beta gamma\ndelta epsilon\nzeta",
    "aaaa bbbb cccc dddd eeee ffff gggg hhhh",
    "one two\n\n   \nthree four five six seven eight nine ten eleven twelve",
    "line one here\r\nline two here\r\nline three here",
    "\n\n\n",
    ("first paragraph of prose that runs along for a while\n"
     "second line kept whole\n"
     "third line also kept whole and a bit longer than the others\n"
     "tail"),
]


@pytest.mark.parametrize("text", MULTILINE_CASES)
def test_sk_paragraphs_match_reference(spark, text):
    expected = sk_paragraph_reference(text, 8)
    got = _spark_chunks(spark, text, "paragraphs", max_tokens_per_chunk=8)
    assert got == expected


def test_sk_paragraphs_hand_computed(spark):
    """Hand-walked SK semantics on a three-line document (max_tokens=8,
    word budget 35 chars):

    - line boundaries survive as piece boundaries (the behavior the flat
      word fold loses): 'one two' stays its own paragraph seed;
    - the 54-char second line word-packs into two pieces;
    - the paragraph build emits on tokens(para+'\\n')+tokens(piece) >= 8;
    - the 21-char tail has 5 tokens >= 8//4, so NO balancing merge."""
    text = ("one two\n"
            "three four five six seven eight nine ten eleven twelve")
    got = _spark_chunks(spark, text, "paragraphs", max_tokens_per_chunk=8)
    assert got == [
        ("one two", 0),
        ("three four five six seven eight", 0),
        ("nine ten eleven twelve", 0),
    ]


def test_sk_paragraphs_balancing_merge(spark):
    """Short tail (tokens < max//4) whose word count fits the budget merges
    into the predecessor, rejoined by single spaces (newlines collapse)."""
    text = "alpha beta gamma\ndelta epsilon\nzeta"
    got = _spark_chunks(spark, text, "paragraphs", max_tokens_per_chunk=8)
    assert got == [("alpha beta gamma delta epsilon zeta", 0)]


def test_sk_paragraphs_duckdb_oracle_multiline(spark):
    """The driver's documents table has no newlines, so prove the DuckDB
    oracle agrees with the Spark plan on synthetic MULTI-LINE docs too."""
    import duckdb
    import pandas as pd

    from document_vector_pipeline_spark.contract import _sql_paragraph_chunks

    rows = [(i, t) for i, t in enumerate(MULTILINE_CASES)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = (chunk_documents(sdf, mode="paragraphs",
                           cfg=PipelineConfig(max_tokens_per_chunk=8))
           .orderBy("doc_id", "chunk_number")
           .toPandas())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = con.execute(
        _sql_paragraph_chunks(8)
        + " order by doc_id, chunk_number").df()
    assert got["chunk_text"].tolist() == exp["chunk_text"].tolist()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["chunk_number"].tolist() == exp["chunk_number"].tolist()


def test_md_paragraphs_prefer_sentence_boundaries(spark):
    from document_vector_pipeline_spark.config import PipelineConfig
    from document_vector_pipeline_spark.operators.chunk import chunk_documents

    text = ("Alpha beta gamma. Delta eps! "
            "Longer sentence with many more words to overflow the budget here"
            "\nSecond line. Done?")
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    out = [r["chunk_text"] for r in
           chunk_documents(df, mode="md_paragraphs",
                           cfg=PipelineConfig(max_tokens_per_chunk=8))
           .orderBy("chunk_number").collect()]
    # sentences survive as units (SK AppendLine => '\n' joins within a
    # paragraph); only the oversized no-punctuation run is word-packed
    assert out == [
        "Alpha beta gamma.\nDelta eps!",
        "Longer sentence with many more",
        "words to overflow the budget here",
        "Second line.\nDone?",
    ]


def test_md_paragraphs_without_punctuation_match_plaintext(spark, docs_small):
    from document_vector_pipeline_spark.config import PipelineConfig
    from document_vector_pipeline_spark.operators.chunk import chunk_documents

    # the corpus has no sentence punctuation, so each line is one unit in
    # both variants and the outputs must coincide exactly
    cfg = PipelineConfig(max_tokens_per_chunk=8)
    docs = docs_small.limit(50)
    a = chunk_documents(docs, mode="paragraphs", cfg=cfg).collect()
    b = chunk_documents(docs, mode="md_paragraphs", cfg=cfg).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
