"""Text-analysis expressions: token counting, quality scoring, language ID,
fingerprinting.  Beyond-reference operators (SURVEY.md §2 #21-24) for the
training-data pipeline; all built-ins, no Python in the hot path.

Determinism contract: every score is a ratio of integer counts (exact in
both Spark and DuckDB) or is rounded before being surfaced, so the DuckDB
oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.expr import bound
from document_vector_pipeline_spark.functions.hashing import md5_long

# A small multilingual stopword table: enough signal for heuristic language
# ID over short documents; ties broken by language order below.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de": ("der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "von"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "他", "这", "中"),
}
LANGS = tuple(STOPWORDS)


def whitespace_token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens."""
    return F.size(F.filter(F.split(F.trim(text), r"\s+"),
                           lambda w: w != F.lit("")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation via
    regex, approximating a GPT-style tokenizer's ~4-chars-per-token on prose.
    Defined as the number of matches of (letter-runs of length<=4 pieces,
    digit runs, single punctuation)."""
    # split letter runs into ceil(len/4) pieces, count digits runs and
    # punctuation marks individually
    letters = F.split(F.lower(text), r"[^\p{L}]+")
    letter_pieces = F.aggregate(
        F.filter(letters, lambda w: w != F.lit("")),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"))
    digit_runs = F.size(F.filter(F.split(text, r"[^0-9]+"),
                                 lambda w: w != F.lit("")))
    punct = F.length(F.regexp_replace(text, r"[^\p{P}]", ""))
    return (letter_pieces + digit_runs + punct).alias("bpe_tokens")


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^\p{P}]", ""))


def alpha_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^\p{L}]", ""))


def stopword_count(text: Column, lang: str = "en") -> Column:
    words = F.split(F.lower(F.trim(text)), r"\s+")
    sw = STOPWORDS[lang]
    return F.size(F.filter(words, lambda w: w.isin(*sw)))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: mean of
    - length score: min(1, n_chars/500)
    - alpha ratio: alpha chars / chars
    - stopword presence: min(1, en-stopwords / (tokens/10))  (prose signal)
    - punct sanity: 1 - min(1, punct/chars*10)
    Rounded to 6 dp for cross-engine hash stability."""
    n_chars = F.length(text)
    tokens = whitespace_token_count(text)
    safe_chars = F.greatest(n_chars, F.lit(1))
    length_score = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    alpha_ratio = alpha_count(text) / safe_chars
    sw_score = F.least(F.lit(1.0),
                       stopword_count(text) * F.lit(10.0)
                       / F.greatest(tokens, F.lit(1)))
    punct_sanity = F.lit(1.0) - F.least(F.lit(1.0),
                                        punct_count(text) * F.lit(10.0) / safe_chars)
    return F.round((length_score + alpha_ratio + sw_score + punct_sanity) / 4.0, 6)


def langid_struct(text: Column) -> Column:
    """Heuristic language ID: per-language stopword hit counts; winner by
    (count desc, language order).  Returns struct(lang, hits)."""
    lowered_expr = F.split(F.lower(F.trim(text)), r"\s+")

    def build(lowered: Column) -> Column:
        def hit_counter(sw: tuple[str, ...]):
            return lambda w: w.isin(*sw)

        scores = [
            F.struct(
                F.size(F.filter(lowered, hit_counter(sw))).alias("hits"),
                F.lit(idx).alias("ord"),
                F.lit(lang).alias("lang"),
            )
            for idx, (lang, sw) in enumerate(STOPWORDS.items())
        ]
        # max over (hits, -ord): array_max picks lexicographically largest
        best = F.array_max(F.array(*[
            F.struct(s["hits"].alias("hits"), (-s["ord"]).alias("negord"),
                     s["lang"].alias("lang")) for s in scores]))
        return F.struct(best["lang"].alias("lang"), best["hits"].alias("hits"))

    return bound(lowered_expr, build)


def content_fingerprint(text: Column) -> Column:
    """Whole-document content fingerprint: md5-derived 60-bit int over the
    whitespace-normalized text (dedup key; cross-engine exact)."""
    return md5_long(F.array_join(
        F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit("")), " "))


def rolling_fingerprints(text: Column, window: int = 8) -> Column:
    """Rolling window fingerprints: md5-long of each `window`-token shingle
    (the winnowing/fingerprinting primitive; also the shingle set for
    MinHash).  Returns array<bigint> (distinct, unsorted)."""
    words_expr = F.filter(F.split(F.trim(F.lower(text)), r"\s+"),
                          lambda w: w != F.lit(""))

    def build(words: Column) -> Column:
        n = F.size(words)
        starts = F.when(n >= window,
                        F.sequence(F.lit(1), n - window + 1))\
                 .otherwise(F.when(n > 0, F.array(F.lit(1)))
                            .otherwise(F.array().cast("array<int>")))
        shingles = F.transform(
            starts, lambda s: F.array_join(F.slice(words, s, window), " "))
        return F.array_distinct(F.transform(shingles, lambda sh: md5_long(sh)))

    return bound(words_expr, build)
