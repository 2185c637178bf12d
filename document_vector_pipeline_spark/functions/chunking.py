"""Chunking as pure column expressions.

All three reference chunkers are re-expressed as folds/closed forms over the
document's whitespace-token array using Spark higher-order functions
(split / aggregate / transform / slice / array_join).  That keeps chunking
inside whole-stage codegen — no Python, no shuffle, linear in document size
with O(#chunks) state — so a 100 TB corpus chunks at scan speed.

Semantics replicated (cited file:line in each function):

1. char_window_spans — AzureSQL TextChunker.FixedSizeChunking
   (AzureSQL/.../TextChunker.cs:15-50): accumulate words + ' ' into a
   buffer; when buffer length EXCEEDS chunk_size, emit the buffer (with the
   overflowing word INCLUDED, trailing space trimmed) and reset.  The final
   partial chunk is tagged with the after-loop page index (a reference
   quirk we preserve: single-page docs get page 0 for full chunks, page 1
   for the tail).

2. word_window_chunks — DocumentChunker.SplitWords
   (AzureCosmosDB/.../DocumentChunker.cs:84-113): emit after the word
   count EXCEEDS max_word_count, i.e. chunks of (max_word_count+1) words —
   another reference quirk we preserve.

3. token_budget_spans — DocumentChunker.FixedSizeChunking /
   ChunkTextLines (DocumentChunker.cs:58-80), which delegate to Semantic
   Kernel's TextChunker with maxTokensPerChunk/overlapTokens.  We re-specify
   cleanly: token(s) ≈ len(s)/4 chars (SK's default heuristic), greedy
   packing of whitespace tokens, a chunk never exceeds max_tokens unless a
   single word does, and overlap prepends the last `overlap_words` words of
   the previous chunk.  At the reference defaults (250 tokens, overlap 0)
   this is behavior-equivalent for line-free documents; we normalize all
   whitespace runs to single spaces rather than preferring line breaks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.expr import bound

SPAN_TYPE = "array<struct<ws:int,we:int,page:int>>"


def norm_words(text: Column) -> Column:
    """Whitespace-normalized token array (empty tokens dropped)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit(""))


def _span(ws: Column, we: Column, page: Column) -> Column:
    return F.array(F.struct(ws.alias("ws"), we.alias("we"), page.alias("page")))


def char_window_spans(words: Column, chunk_size: int = 2048) -> Column:
    """Word-index spans for the 2048-char window chunker.

    Buffer length after appending word w (incl. its trailing space) is
    cum + len(w) + [not first] + 1; the reference breaks when that exceeds
    chunk_size, i.e. when the joined length reaches chunk_size.
    """
    init = F.struct(
        F.lit(0).alias("cum"),          # joined length of current buffer
        F.lit(1).alias("ws"),           # 1-based word index of buffer start
        F.array().cast(SPAN_TYPE).alias("spans"),
        F.lit(1).alias("idx"),          # 1-based index of the incoming word
    )

    def step(acc: Column, w: Column) -> Column:
        cum2 = acc["cum"] + F.length(w) + F.when(acc["cum"] > 0, 1).otherwise(0)
        brk = cum2 >= F.lit(chunk_size)
        return F.struct(
            F.when(brk, F.lit(0)).otherwise(cum2).alias("cum"),
            F.when(brk, acc["idx"] + 1).otherwise(acc["ws"]).alias("ws"),
            F.when(brk, F.concat(acc["spans"],
                                 _span(acc["ws"], acc["idx"], F.lit(0))))
             .otherwise(acc["spans"]).alias("spans"),
            (acc["idx"] + 1).alias("idx"),
        )

    def fin(acc: Column) -> Column:
        # Trailing partial chunk: reference emits it with the post-loop page
        # index (== page count, 1 for our single-page docs).
        return F.when(acc["ws"] < acc["idx"],
                      F.concat(acc["spans"],
                               _span(acc["ws"], acc["idx"] - 1, F.lit(1))))\
                .otherwise(acc["spans"])

    return F.aggregate(words, init, step, fin)


def word_window_chunks(words: Column, max_word_count: int = 40) -> Column:
    """Closed-form word-window chunking: chunks of (max_word_count+1) words
    (the reference emits when count EXCEEDS the max — quirk preserved)."""
    per = max_word_count + 1

    def build(w: Column) -> Column:
        n = F.size(w)
        idxs = F.when(n > 0,
                      F.sequence(F.lit(0), F.floor((n - 1) / per).cast("int")))\
                .otherwise(F.array().cast("array<int>"))
        return F.transform(
            idxs, lambda i: F.array_join(F.slice(w, i * per + 1, per), " "))

    return bound(words, build)


def token_budget_spans(words: Column, max_tokens: int = 250,
                       overlap_words: int = 0) -> Column:
    """Word-index spans for greedy token-budget packing.

    token(s) = len(s)/4 (Semantic Kernel's default counter), so a chunk of
    joined length L holds floor(L/4) tokens; the budget in joined chars is
    B = 4*max_tokens + 3.  A word that would overflow starts a new chunk
    (never splits mid-buffer like the char chunker); a single word longer
    than B becomes its own chunk.
    """
    budget = 4 * max_tokens + 3
    init = F.struct(
        F.lit(0).alias("cum"),
        F.lit(1).alias("ws"),
        F.array().cast(SPAN_TYPE).alias("spans"),
        F.lit(1).alias("idx"),
    )

    def step(acc: Column, w: Column) -> Column:
        cum2 = acc["cum"] + F.length(w) + F.when(acc["cum"] > 0, 1).otherwise(0)
        brk = (cum2 > F.lit(budget)) & (acc["cum"] > 0)
        return F.struct(
            F.when(brk, F.length(w)).otherwise(cum2).alias("cum"),
            F.when(brk, acc["idx"]).otherwise(acc["ws"]).alias("ws"),
            F.when(brk, F.concat(acc["spans"],
                                 _span(acc["ws"], acc["idx"] - 1, F.lit(0))))
             .otherwise(acc["spans"]).alias("spans"),
            (acc["idx"] + 1).alias("idx"),
        )

    def fin(acc: Column) -> Column:
        return F.when(acc["ws"] < acc["idx"],
                      F.concat(acc["spans"],
                               _span(acc["ws"], acc["idx"] - 1, F.lit(0))))\
                .otherwise(acc["spans"])

    spans = F.aggregate(words, init, step, fin)
    if overlap_words > 0:
        # bind the span array once — element_at(spans, i) inside the lambda
        # would re-run the whole fold per span
        spans = bound(spans, lambda sp_arr: F.transform(
            sp_arr,
            lambda sp, i: F.struct(
                F.when(i > 0,
                       F.greatest(F.element_at(sp_arr, i)["ws"],
                                  sp["ws"] - F.lit(overlap_words)))
                 .otherwise(sp["ws"]).alias("ws"),
                sp["we"].alias("we"),
                sp["page"].alias("page"),
            ),
        ))
    return spans


SENTENCE_UNIT_RE = r"[^.!?]*[.!?]+|[^.!?]+"


def token_paragraph_chunks(text: Column, max_tokens: int = 250,
                           markdown: bool = False) -> Column:
    """Semantic-Kernel-style line-preferring paragraph chunking
    (TextChunker.SplitPlainTextParagraphs, delegated to by
    DocumentChunker.cs:59-80) as pure column expressions:
    array<struct<chunk_text,page_number>>.

    The two-level SK pipeline, re-specified exactly:

    1. LINE SPLIT (InternalSplitLines): the document splits on '\\n' into
       lines; each line is whitespace-normalized and, if its token count
       (floor(len/4), SK's default counter) exceeds ``max_tokens``, greedy
       word-packed into pieces of ≤ 4·max_tokens+3 joined chars (the same
       budget fold as token_budget_spans — our word-level stand-in for
       SK's recursive sentence-separator middle-split).  A line within
       budget is one piece, so LINE BOUNDARIES ARE PRESERVED — the
       behavior the flat word fold lost on multi-line documents.
    2. PARAGRAPH BUILD (BuildParagraph): pieces accumulate into a
       paragraph joined with '\\n'; before appending piece p, if the
       builder is non-empty and tokens(para + trailing newline) +
       tokens(p) ≥ max_tokens, the paragraph is emitted and p starts the
       next one.  (SK appends with AppendLine, so the builder carries a
       trailing newline — hence the +1 in the count.)
    3. BALANCING: if the final paragraph is short (tokens < max_tokens/4)
       and its word count plus the previous paragraph's fits max_tokens,
       the two merge, rejoined by single spaces (SK's "distribute text
       more evenly in the last paragraphs" step).

    Empty/whitespace-only lines vanish (their word array is empty).
    Page numbers are 0 (plain-text path has no page structure).

    ``markdown=True`` is the SplitMarkdownParagraphs twin — the variant
    the reference routes BOTH .txt and .md blobs through
    (BlobTriggerFunction.cs:69-81 → ChunkTextLines/ChunkMarkdownLines →
    SplitMarkdownParagraphs): within each line the first split level is
    SENTENCE punctuation ([.!?], kept attached to the left unit, SK's
    s_markdownSplitOptions head) rather than the raw line, so chunk
    boundaries prefer sentence ends; only an oversized sentence falls
    back to the word-packing fold."""
    def tok(c: Column) -> Column:
        return F.floor(F.length(c) / 4)

    def line_pieces(line: Column) -> Column:
        w = norm_words(line)
        spans = token_budget_spans(w, max_tokens)
        return F.transform(
            spans, lambda sp: F.array_join(
                F.slice(w, sp["ws"], sp["we"] - sp["ws"] + 1), " "))

    if markdown:
        def md_pieces(line: Column) -> Column:
            units = F.regexp_extract_all(line, F.lit(SENTENCE_UNIT_RE),
                                         F.lit(0))
            return F.flatten(F.transform(units, line_pieces))

        pieces = F.flatten(F.transform(F.split(text, "\n"), md_pieces))
    else:
        pieces = F.flatten(F.transform(F.split(text, "\n"), line_pieces))

    init = F.struct(F.lit("").alias("cur"),
                    F.array().cast("array<string>").alias("paras"))

    def step(acc: Column, p: Column) -> Column:
        emit = (acc["cur"] != F.lit("")) & (
            (F.floor((F.length(acc["cur"]) + 1) / 4) + tok(p))
            >= F.lit(max_tokens))
        cur2 = (F.when(emit, p)
                .when(acc["cur"] == F.lit(""), p)
                .otherwise(F.concat(acc["cur"], F.lit("\n"), p)))
        return F.struct(
            cur2.alias("cur"),
            F.when(emit, F.concat(acc["paras"], F.array(acc["cur"])))
             .otherwise(acc["paras"]).alias("paras"))

    def fin(acc: Column) -> Column:
        return F.when(acc["cur"] != F.lit(""),
                      F.concat(acc["paras"], F.array(acc["cur"])))\
                .otherwise(acc["paras"])

    paras = F.aggregate(pieces, init, step, fin)

    def balance(pa: Column) -> Column:
        n = F.size(pa)
        last = F.element_at(pa, n)
        second = F.element_at(pa, n - 1)
        lw = norm_words(last)
        sw = norm_words(second)
        merged = F.concat(F.array_join(sw, " "), F.lit(" "),
                          F.array_join(lw, " "))
        cond = ((n >= 2)
                & (tok(last) < F.lit(max_tokens // 4))
                & ((F.size(lw) + F.size(sw)) <= F.lit(max_tokens)))
        return F.when(cond, F.concat(F.slice(pa, 1, n - 2), F.array(merged)))\
                .otherwise(pa)

    paras = bound(paras, balance)
    return F.transform(paras, lambda p: F.struct(
        p.alias("chunk_text"), F.lit(0).cast("int").alias("page_number")))


def spans_to_chunks(words: Column, spans: Column) -> Column:
    """Materialize spans as array<struct<chunk_text,page_number>>.
    The word array is bound once (not re-split per chunk)."""
    return bound(words, lambda w: F.transform(
        spans,
        lambda sp: F.struct(
            F.array_join(F.slice(w, sp["ws"], sp["we"] - sp["ws"] + 1), " ")
             .alias("chunk_text"),
            sp["page"].alias("page_number"),
        ),
    ))
