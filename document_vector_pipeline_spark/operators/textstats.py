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


def tfidf_top_terms(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", topk: int = 5) -> DataFrame:
    """Per-document top-``topk`` terms by tf-idf (idf = ln(N/df)).

    One explode feeds BOTH aggregates: per-(doc, term) tf, then term df as
    a second small agg over the distinct (doc, term) pairs the first agg
    already produced — the corpus is tokenized once.  N is a one-row
    broadcast.  Ranking uses the exact integer keys (tf desc, df asc,
    term) so the cut is deterministic even where two scores tie; the
    double-valued score is display output, not the sort key."""
    from pyspark.sql import Window

    tok = (docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
         .alias("term"))
        .filter(F.col("term") != ""))
    tf = tok.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    w = (Window.partitionBy("doc")
         .orderBy(F.desc("tf"), F.asc("df"), F.asc("term")))
    return (tf.join(df, "term").join(F.broadcast(n))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= topk)
            .select(F.col("doc").alias(id_col), "term", "tf", "df",
                    F.round(F.col("tf")
                            * F.log(F.col("n_docs") / F.col("df")), 6)
                     .alias("score"))
            .orderBy(id_col, F.desc("tf"), "df", "term"))


# PII patterns restricted to syntax Java regex and RE2 interpret identically
# (explicit character classes, no backrefs, no lookaround) so the DuckDB
# oracle reproduces the scrub byte-for-byte.
PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("url", r"https?://[a-zA-Z0-9./_-]+", "<URL>"),
    ("phone", r"\+[0-9]{7,15}", "<PHONE>"),
)


def scrub_pii(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """PII redaction: replace emails / URLs / phone numbers with typed
    placeholder tokens and report per-document match counts.  Map-only —
    regexp_count / regexp_replace are JVM intrinsics inside whole-stage
    codegen, so the scrub runs at scan speed; no shuffle at any scale.
    Counts are taken on the original text, replacements applied in
    declaration order (the patterns cannot overlap-match each other's
    placeholders)."""
    col = F.col(text_col)
    out = docs.select(
        F.col(id_col),
        *[F.regexp_count(col, F.lit(pat)).alias(f"n_{name}")
          for name, pat, _ in PII_PATTERNS],
        col.alias("__t"))
    scrubbed = F.col("__t")
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return (out.select(
        id_col, "n_email", "n_url", "n_phone",
        scrubbed.alias("scrubbed"),
        F.length(scrubbed).alias("scrubbed_len"))
        .orderBy(id_col))


def pii_census(docs: DataFrame, by: str = "source",
               text_col: str = "text") -> DataFrame:
    """Privacy audit: per ``by`` group, the document count plus — for
    every PII type — total matches and how many documents carry at
    least one.  The census a data-governance review runs BEFORE
    deciding what to scrub (scrub_pii is the remediation; this is the
    assessment), and the per-source report that localizes a leaky
    crawl source.  Map-only regexp_count inside whole-stage codegen
    (scan speed at any corpus size); the only shuffle is the
    groups-sized aggregation, map-side combinable."""
    col = F.col(text_col)
    per = docs.select(
        F.col(by),
        *[F.regexp_count(col, F.lit(pat)).cast("long").alias(f"n_{name}")
          for name, pat, _ in PII_PATTERNS])
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for name, _, _ in PII_PATTERNS:
        aggs.append(F.sum(f"n_{name}").cast("long").alias(f"n_{name}"))
        aggs.append(F.sum(F.when(F.col(f"n_{name}") > 0, 1).otherwise(0))
                    .cast("long").alias(f"docs_{name}"))
    return per.groupBy(by).agg(*aggs).orderBy(by)


def document_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", window: int = 8) -> DataFrame:
    """(id, fingerprint): exploded rolling-window fingerprints — the
    winnowing primitive for plagiarism/overlap detection."""
    return (docs.select(
        F.col(id_col),
        F.explode(X.rolling_fingerprints(F.col(text_col), window))
         .alias("fingerprint")))


def top_bigrams(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", topk: int = 30) -> DataFrame:
    """Corpus-wide top-``topk`` word bigrams: (bigram, tf, df) with tf =
    total occurrences, df = distinct documents.  The bigram array is built
    map-side from ONE tokenize pass (bound once — see functions/expr.py),
    so the single shuffle carries (bigram, doc_id) pairs; the top-k cut is
    deterministic on (tf desc, bigram)."""
    from document_vector_pipeline_spark.functions.expr import bound

    words_expr = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                          lambda w: w != F.lit(""))

    def bigrams(words):
        n = F.size(words)
        idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)) \
               .otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1)))

    tok = (docs.select(F.col(id_col).alias("__doc"),
                       F.explode(bound(words_expr, bigrams)).alias("bigram")))
    return (tok.groupBy("bigram")
            .agg(F.count("*").alias("tf"),
                 F.count_distinct("__doc").alias("df"))
            .orderBy(F.desc("tf"), "bigram")
            .limit(topk))


def collocations(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", min_count: int = 5,
                 topk: int = 50) -> DataFrame:
    """Top word collocations by integer PMI-lift — (w1, w2, c_xy, c_x,
    c_y, lift_milli): lift = P(xy) / (P(x)·P(y)) in milli-units,
    computed as floor((1000·c_xy·n_tok²) / (c_x·c_y·n_bi)) with a FIXED
    double op order so DuckDB replays it bit-for-bit (all inputs are
    exact integer counts; the one division is correctly rounded in both
    engines).  The phrase-mining statistic a tokenizer/corpus pipeline
    ships next to raw bigram counts: lift >> 1000 means the pair
    co-occurs far above chance ("new york"), lift ≈ 1000 means
    independence, regardless of raw frequency.

    Plan: one tokenize pass feeds both the unigram and the adjacent-pair
    explode map-side; two uniform-key count shuffles; totals ride in as
    broadcast single-row joins; the final rank is over the
    min_count-filtered pair table (vocab², not corpus, sized).  n_tok²
    stays in int64 up to ~3e9 tokens per partition-group — beyond that,
    rescale to per-shard lifts or drop the ×1000 to centi-units.

    The corpus totals are derived from the count tables (Σc over the
    unigram/pair histograms ≡ the exploded row count — exact integers),
    so the tokenize pass runs once per explode (2×), not once per
    consumer (4×); an under-partitioned scan fans out first (§2.5,
    no-op at production parallelism)."""
    from document_vector_pipeline_spark.functions.par import fan_out

    words_expr = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                          lambda w: w != F.lit(""))
    t = fan_out(docs.select(text_col)).select(words_expr.alias("w"))
    uni = t.select(F.explode("w").alias("word"))
    ucnt = uni.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = ucnt.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_tok"))

    idx = (F.when(F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1))
           .otherwise(F.array().cast("array<int>")))
    pair = F.transform(idx, lambda i: F.struct(
        F.element_at("w", i).alias("w1"),
        F.element_at("w", (i + F.lit(1)).cast("int")).alias("w2")))
    pairs = t.select(F.explode(pair).alias("p")).select("p.w1", "p.w2")
    bcnt = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    nbi = bcnt.agg(F.coalesce(F.sum("c_xy"), F.lit(0)).alias("n_bi"))

    joined = (bcnt.filter(F.col("c_xy") >= min_count)
              .join(ucnt.select(F.col("word").alias("w1"),
                                F.col("c").alias("c_x")), "w1")
              .join(ucnt.select(F.col("word").alias("w2"),
                                F.col("c").alias("c_y")), "w2")
              .crossJoin(F.broadcast(tot))
              .crossJoin(F.broadcast(nbi)))
    lift = F.floor(
        ((F.lit(1000.0) * F.col("c_xy"))
         * (F.col("n_tok") * F.col("n_tok")))
        / ((F.col("c_x") * F.col("c_y")) * F.col("n_bi")))
    return (joined.withColumn("lift_milli", lift)
            .select("w1", "w2", "c_xy", "c_x", "c_y", "lift_milli")
            .orderBy(F.desc("lift_milli"), "w1", "w2")
            .limit(topk))


def doc_domains(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                blocklist: tuple = ("spam.example", "tracker.test")) -> DataFrame:
    """Per-document URL domain inventory with a blocklist verdict: one row
    per distinct (doc, domain) with its occurrence count and whether the
    domain is blocklisted — the inputs to domain-level corpus filtering
    (blocklists, per-domain caps, domain mixture stats).

    Map-side regexp extraction + one explode; the only shuffle is the
    (doc, domain) count.  The domain normalization (lowercase, strip
    leading www.) is the same regex in both engines."""
    doms = F.transform(
        F.regexp_extract_all(F.col(text_col),
                             F.lit(r"https?://([A-Za-z0-9.-]+)"), 1),
        lambda d: F.regexp_replace(F.lower(d), "^www\\.", ""))
    ex = docs.select(F.col(id_col), F.explode(doms).alias("domain"))
    return (ex.groupBy(id_col, "domain")
            .agg(F.count("*").cast("long").alias("n_occurrences"))
            .withColumn("blocked",
                        F.col("domain").isin(*blocklist))
            .orderBy(id_col, "domain"))


def readability(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Automated Readability Index per document, in exact integer
    milli-units (the quality-filter battery's readability signal).

    ARI = 4.71·chars/words + 0.5·words/sentences − 21.43, computed with
    the denominators cleared so both engines do the same integer
    arithmetic: ari_milli = max(0, 4710·c·s + 500·w² − 21430·w·s)
    div (w·s), clamped at 0 (scores below 0 all mean "trivial text" and
    the clamp keeps cross-engine integer division well-defined —
    truncation and floor agree on non-negatives).
    chars counts [A-Za-z0-9]; words are whitespace tokens; sentences are
    [.!?]+ runs, floored at 1.  Map-only whole-stage-codegen."""
    t = F.col(text_col)
    c = F.length(F.regexp_replace(t, "[^A-Za-z0-9]", "")).cast("long")
    w = F.size(F.filter(F.split(F.trim(t), r"\s+"),
                        lambda x: x != F.lit(""))).cast("long")
    s = F.greatest(F.lit(1).cast("long"),
                   F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), F.lit(0)))
                    .cast("long"))
    stats = docs.select(F.col(id_col), c.alias("n_chars"),
                        w.alias("n_words"), s.alias("n_sents"))
    ari = F.when(F.col("n_words") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("greatest(0L, 4710 * n_chars * n_sents"
               " + 500 * n_words * n_words"
               " - 21430 * n_words * n_sents)"
               " div (n_words * n_sents)"))
    return stats.select(id_col, "n_chars", "n_words", "n_sents",
                        ari.alias("ari_milli")).orderBy(id_col)


def vocab_coverage(docs: DataFrame, text_col: str = "text",
                   targets: tuple = (500_000, 900_000, 990_000)) -> DataFrame:
    """Vocabulary coverage curve: how many distinct terms (most frequent
    first) cover 50/90/99 % of all token occurrences — the statistic that
    sizes a tokenizer's vocab against a corpus.

    ONE tokenize+explode pass → term counts (one shuffle) → the
    TWO-PHASE exact cumulative sum + rank over the TERM table
    (plans/ranking.global_cumsum — vocab-sized, and at web scale a
    vocabulary IS corpus-class, so no single-task window; the token
    total comes back as plan metadata) → a single aggregation answers
    every coverage target at once (conditional mins, then an explode
    back to long form).  Exact: n_terms is the first rank whose
    cumulative count × 10⁶ ≥ target × total — cleared-denominator
    integer comparison, no division."""
    from document_vector_pipeline_spark.plans.ranking import global_cumsum

    toks = docs.select(F.explode(
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                 lambda w: w != F.lit(""))).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("n"))
    ranked, _, total = global_cumsum(
        counts, [F.desc("n"), F.col("term")], "n",
        out="cum", rn_out="rank")
    agg = ranked.agg(*[
        F.min(F.when(F.lit(1_000_000) * F.col("cum")
                     >= F.lit(t).cast("long") * F.lit(total),
                     F.col("rank"))).cast("long").alias(f"t{t}")
        for t in targets])
    rows = F.array(*[
        F.struct(F.lit(t).cast("long").alias("coverage_ppm"),
                 F.col(f"t{t}").alias("n_terms"))
        for t in targets])
    return (agg.select(F.explode(rows).alias("r"))
            .select("r.coverage_ppm", "r.n_terms")
            .orderBy("coverage_ppm"))


def bpe_pair_counts(docs: DataFrame, text_col: str = "text",
                    top: int = 50) -> DataFrame:
    """One BPE merge iteration over the corpus: counts of adjacent
    character pairs within whitespace-lowercased tokens (with
    multiplicity) — the statistic a byte-pair-encoding tokenizer trainer
    computes to pick its next merge (Sennrich et al. 2016).  Output:
    (pair, n), top `top` by count with a lexicographic tie-break.

    Plan: map-side explode of words then in-word pairs (no joins), one
    shuffle on the bounded pair key space (≤ alphabet², uniform), tiny
    global top-k.  The iterated trainer repeats this with the previous
    merges applied; one exact iteration is the oracle-checkable unit.
    The per-char pair explode is the CPU-dense map pass — an
    under-partitioned scan is fanned out first (§2.5; no-op at
    production parallelism)."""
    from document_vector_pipeline_spark.functions.par import fan_out

    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda x: x != F.lit(""))
    w = fan_out(docs.select(text_col)).select(F.explode(words).alias("w"))
    starts = (F.when(F.length("w") >= 2,
                     F.sequence(F.lit(1), F.length("w") - 1))
              .otherwise(F.array().cast("array<int>")))
    pairs = w.select(
        F.explode(F.transform(starts,
                              lambda i: F.substring(F.col("w"), i, F.lit(2))))
         .alias("pair"))
    return (pairs.groupBy("pair")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(top))
