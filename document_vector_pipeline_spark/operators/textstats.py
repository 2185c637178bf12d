"""Text analysis operator: one pass over the documents table producing the
training-data quality columns (SURVEY.md §2 #21-24).

All columns are built-in expressions (functions/text.py) — a single narrow
projection, no shuffle, codegen end to end: at 100 TB this runs at scan
speed alongside ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions import text as X


def analyze_documents(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    lang = X.langid_struct(t)
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        X.whitespace_token_count(t).alias("ws_tokens"),
        X.bpe_ish_token_count(t).alias("bpe_tokens"),
        X.punct_count(t).alias("punct_chars"),
        X.alpha_count(t).alias("alpha_chars"),
        X.stopword_count(t).alias("en_stopwords"),
        X.quality_score(t).alias("quality"),
        lang["lang"].alias("lang_guess"),
        lang["hits"].alias("lang_hits"),
        X.content_fingerprint(t).alias("fingerprint"),
    )


def term_stats(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", topk: int = 50) -> DataFrame:
    """Corpus term statistics: for the top-``topk`` terms (by total term
    frequency), (term, tf, df) where tf = total occurrences and df = number
    of distinct documents containing the term.

    Tokenization is lowercase split on runs of non-alphanumerics — the same
    regex both engines support verbatim.  One explode → one groupBy on term
    (df via count_distinct, two-phase, no per-doc set on a single reducer).
    Top-k cut is deterministic: (tf desc, term).  At 100 TB the explode is
    map-side only; the single shuffle carries (term, doc_id) pairs and AQE
    coalesces the skewed stopword buckets."""
    tok = (docs.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
         .alias("term"))
        .filter(F.col("term") != ""))
    return (tok.groupBy("term")
            .agg(F.count("*").alias("tf"),
                 F.count_distinct("__doc").alias("df"))
            .orderBy(F.desc("tf"), "term")
            .limit(topk))


def document_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", window: int = 8) -> DataFrame:
    """(id, fingerprint): exploded rolling-window fingerprints — the
    winnowing primitive for plagiarism/overlap detection."""
    return (docs.select(
        F.col(id_col),
        F.explode(X.rolling_fingerprints(F.col(text_col), window))
         .alias("fingerprint")))
