"""Parse & route: the blob-extension dispatch + analyzer-output fallback.

Parity:
- Extension routing .txt / .md / other — BlobTriggerFunction.cs:66-101.
- Analyzer fallback order pages.lines → paragraphs → pages.words → content
  — DocumentChunker.cs:40-56.

The reference calls Azure Document Intelligence ("prebuilt-read") for
non-txt/md blobs.  That service isn't available here, so `analyze_document`
is a deterministic fake: it produces the same AnalyzeResult shape (lines /
paragraphs / words / content) from the raw text so the fallback-order logic
and everything downstream is real and testable.  A production deployment
would swap `analyze_document` for a mapInPandas calling the real service
(or a PDF lib) — the contract (the `analysis` struct) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANALYSIS_TYPE = ("struct<lines:array<string>,paragraphs:array<string>,"
                 "words:array<string>,content:string>")


def extension(url: Column) -> Column:
    """Lower-cased file extension including the dot ('' if none).
    Parity: Path.GetExtension (BlobTriggerFunction.cs:66)."""
    ext = F.regexp_extract(url, r"(\.[^./\\]+)$", 1)
    return F.lower(ext)


BOM_UTF8 = bytes([0xEF, 0xBB, 0xBF])
BOM_UTF16_LE = bytes([0xFF, 0xFE])
BOM_UTF16_BE = bytes([0xFE, 0xFF])
_REST = 1 << 30  # "to end of blob" length for substring


def decode_blob_text(data: Column) -> Column:
    """BOM-aware decode of a binary blob column to string.

    Parity: the reference reads blobs through a StreamReader with
    detectEncodingFromByteOrderMarks (ReadAllLinesAsync,
    BlobTriggerFunction.cs:167-184), so Windows-authored files with
    UTF-8/UTF-16 byte-order marks decode cleanly and the BOM never leaks
    into the first chunk's text.  Pure column expressions — the dispatch
    is three prefix compares per blob, whole-stage-codegen'd."""
    p2 = F.substring(data, 1, 2)
    p3 = F.substring(data, 1, 3)
    return (
        F.when(p3 == F.lit(BOM_UTF8),
               F.decode(F.substring(data, 4, _REST), "UTF-8"))
         .when(p2 == F.lit(BOM_UTF16_LE),
               F.decode(F.substring(data, 3, _REST), "UTF-16LE"))
         .when(p2 == F.lit(BOM_UTF16_BE),
               F.decode(F.substring(data, 3, _REST), "UTF-16BE"))
         .otherwise(F.decode(data, "UTF-8")))


def strip_bom(text: Column) -> Column:
    """Drop a leading U+FEFF from an already-decoded string column (what a
    UTF-8 BOM becomes when a text source decodes the file as plain UTF-8)."""
    return F.regexp_replace(text, "^" + chr(0xFEFF), "")


def analyze_document(text: Column) -> Column:
    """Deterministic stand-in for Document Intelligence 'prebuilt-read'.

    Emits struct(lines, paragraphs, words, content):
    - lines: non-empty physical lines (only if the text has newlines —
      mirrors .docx analyzer output having no lines populated)
    - paragraphs: blank-line separated blocks
    - words: whitespace tokens
    - content: the raw text
    """
    has_nl = F.instr(text, "\n") > 0
    lines = F.when(
        has_nl,
        F.filter(F.transform(F.split(text, r"\r?\n"), F.trim),
                 lambda ln: ln != F.lit("")),
    ).otherwise(F.array().cast("array<string>"))
    paragraphs = F.filter(
        F.transform(F.split(text, r"(\r?\n){2,}"), F.trim),
        lambda p: p != F.lit(""))
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit(""))
    return F.struct(lines.alias("lines"), paragraphs.alias("paragraphs"),
                    words.alias("words"), text.alias("content"))


def analysis_text_units(analysis: Column) -> Column:
    """The fallback cascade (DocumentChunker.cs:40-56): prefer page lines,
    then paragraphs, then words (handled downstream by the word chunker),
    then raw content.  Returns array<string> of text units to chunk."""
    return (
        F.when(F.size(analysis["lines"]) > 0, analysis["lines"])
         .when(F.size(analysis["paragraphs"]) > 0, analysis["paragraphs"])
         .when(F.size(analysis["words"]) > 0, F.array(F.array_join(analysis["words"], " ")))
         .otherwise(F.array(analysis["content"]))
    )


def route_blobs(blobs: DataFrame, content_col: str = "content",
                url_col: str = "document_url") -> DataFrame:
    """Add routing + analysis columns to a blob DataFrame.

    Output adds: `ext`, `route` ('text'|'markdown'|'analyze'), `analysis`.
    """
    ext = extension(F.col(url_col))
    route = (F.when(ext == ".txt", F.lit("text"))
              .when(ext == ".md", F.lit("markdown"))
              .otherwise(F.lit("analyze")))
    return (blobs
            .withColumn("ext", ext)
            .withColumn("route", route)
            .withColumn("analysis", analyze_document(F.col(content_col))))
