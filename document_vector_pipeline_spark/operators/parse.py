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


# Statuses a document-analysis service treats as transient (throttling
# and gateway hiccups); mirrors the embed client's policy surface.
DEFAULT_PARSE_RETRY_STATUSES = (429, 503)


class ParseClientError(Exception):
    """Raised by a parse client callable; ``status_code`` decides
    retryability (the HTTP status of the failed analyze call)."""

    def __init__(self, status_code: int, message: str = ""):
        super().__init__(f"parse client error {status_code}: {message}")
        self.status_code = status_code


def analyze_with_client(blobs: DataFrame, client,
                        content_col: str = "content",
                        out_col: str = "analysis",
                        batch_size: int = 8,
                        max_retries: int = 3,
                        retry_delay_s: float = 0.0,
                        retry_on=DEFAULT_PARSE_RETRY_STATUSES) -> DataFrame:
    """Analyze blobs via an injectable document-parse client — the seam
    where a real parser (Document Intelligence "prebuilt-read" as in
    BlobTriggerFunction.cs:84-99, or an OSS PDF lib) drops in, mirroring
    ``embed_with_client``'s client contract exactly.

    ``client`` is any ``Callable[[list[str]], list[dict]]`` returning one
    ``{lines, paragraphs, words, content}`` dict per input (the
    AnalyzeResult shape the fallback cascade consumes).  It is
    cloudpickled BY VALUE to executor workers — construct connections
    lazily inside the callable.  Exceptions carrying a ``status_code``
    in ``retry_on`` are retried up to ``max_retries`` with
    ``retry_delay_s`` between attempts (duck-typed like the embed
    client, so the closure serializes with no package reference); other
    failures propagate to Spark's task retry.

    Plan shape: one map-only mapInPandas stage, each Arrow batch sliced
    into ``batch_size`` service-call groups."""
    import time

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in blobs.schema.fields)
    schema = f"{schema}, {out_col} {ANALYSIS_TYPE}"

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            texts = pdf[content_col].tolist()
            results: list[dict] = []
            for s in range(0, len(texts), batch_size):
                group = texts[s:s + batch_size]
                attempt = 0
                while True:
                    try:
                        got = client(group)
                        break
                    except Exception as e:
                        status = getattr(e, "status_code", None)
                        if (status not in retry_on
                                or attempt >= max_retries):
                            raise
                        attempt += 1
                        if retry_delay_s:
                            time.sleep(retry_delay_s)
                if len(got) != len(group):
                    raise ValueError(
                        f"parse client returned {len(got)} analyses "
                        f"for a batch of {len(group)} blobs")
                results.extend(got)
            out = pdf.copy()
            out[out_col] = results
            yield out

    return blobs.mapInPandas(run, schema)


def stub_parse_client(texts: list[str]) -> list[dict]:
    """Plain-Python twin of ``analyze_document`` — the deterministic
    stand-in parse client (and the oracle for any real client's
    plumbing).  Replays the expression path exactly: Spark ``trim``
    strips ASCII spaces only, ``split`` drops regex capture groups."""
    import re

    out = []
    for t in texts:
        has_nl = "\n" in t
        lines = ([s for s in (x.strip(" ") for x in re.split(r"\r?\n", t))
                  if s != ""] if has_nl else [])
        paragraphs = [s for s in
                      (x.strip(" ") for x in re.split(r"(?:\r?\n){2,}", t))
                      if s != ""]
        words = [w for w in re.split(r"\s+", t.strip(" ")) if w != ""]
        out.append({"lines": lines, "paragraphs": paragraphs,
                    "words": words, "content": t})
    return out


def route_blobs(blobs: DataFrame, content_col: str = "content",
                url_col: str = "document_url",
                parse_client=None) -> DataFrame:
    """Add routing + analysis columns to a blob DataFrame.

    Output adds: `ext`, `route` ('text'|'markdown'|'analyze'), `analysis`.

    With ``parse_client`` set, blobs on the 'analyze' route (non-.txt/.md
    — the reference's prebuilt-read path) are analyzed by the injectable
    client via ``analyze_with_client`` while text/markdown blobs keep the
    whole-stage-codegen expression path; the two legs are unioned back.
    Default (None) keeps the single expression-only projection."""
    ext = extension(F.col(url_col))
    route = (F.when(ext == ".txt", F.lit("text"))
              .when(ext == ".md", F.lit("markdown"))
              .otherwise(F.lit("analyze")))
    routed = blobs.withColumn("ext", ext).withColumn("route", route)
    if parse_client is None:
        return routed.withColumn("analysis",
                                 analyze_document(F.col(content_col)))
    text_like = (routed.filter(F.col("route") != "analyze")
                 .withColumn("analysis",
                             analyze_document(F.col(content_col))))
    analyzed = analyze_with_client(
        routed.filter(F.col("route") == "analyze"), parse_client,
        content_col=content_col)
    return text_like.unionByName(analyzed)
