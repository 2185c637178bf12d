"""Corpus management operators a large-scale training-data pipeline needs:
deterministic splits, stratified sampling, within-document repetition
scoring, and benchmark decontamination.

All of these are defined over md5-derived hashes (functions/hashing.py) so
they are (a) reproducible under any partitioning / rerun / engine and
(b) bit-identical to the DuckDB oracles — no RNG state anywhere.

Scale notes (100 TB): hash-split and repetition scoring are map-only (zero
shuffle); stratified sampling shuffles once on the stratum key; the
decontamination join shuffles 60-bit shingle hashes, never text, and the
benchmark side is distinct-reduced before the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.hashing import md5_long
from document_vector_pipeline_spark.operators.dedup import _shingles


def split_col(id_col: Column, train_pct: int = 80,
              val_pct: int = 10) -> Column:
    """Deterministic train/val/test label from an md5 bucket (0-99) of the
    id — stable under data order, partitioning, and reruns, unlike
    `rand()`-based splits.  Map-only: no shuffle, survives any scale."""
    b = md5_long(id_col.cast("string"), hex_digits=8) % 100
    return (F.when(b < train_pct, F.lit("train"))
            .when(b < train_pct + val_pct, F.lit("val"))
            .otherwise(F.lit("test")))


def hash_split(docs: DataFrame, id_col: str = "doc_id",
               train_pct: int = 80, val_pct: int = 10) -> DataFrame:
    """Tag every document with its deterministic split."""
    return docs.withColumn(
        "split", split_col(F.col(id_col), train_pct, val_pct))


def split_summary(docs: DataFrame, id_col: str = "doc_id",
                  chars_col: str = "n_chars") -> DataFrame:
    """Per-split document and character counts (the sanity report a split
    job emits).  One tiny 3-group agg shuffle."""
    return (hash_split(docs, id_col)
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col(chars_col).cast("long")).alias("sum_chars"))
            .orderBy("split"))


def stratified_sample(docs: DataFrame, group_col: str = "source",
                      frac: float = 0.2,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic stratified sample: rank documents within each stratum
    by a uniform md5 hash (ties broken by id) and keep the first
    ceil(frac * stratum_size) — an EXACT per-group fraction, unlike
    `sampleBy` which is only a probability.  One shuffle on the stratum
    key; the window never sees more than a stratum per reducer.  Skewed
    strata at 100 TB: pre-filter by a loose hash threshold first, then
    rank only the surviving ~frac fraction."""
    h = md5_long(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    wc = Window.partitionBy(group_col)
    return (docs
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count("*").over(wc))
            .filter(F.col("__rn") <= F.ceil(F.col("__n") * frac))
            .select(id_col, group_col, F.col("__rn").alias("sample_rank"))
            .orderBy(group_col, "sample_rank"))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", width: int = 3) -> DataFrame:
    """Within-document repeated n-gram ratio — the C4/Gopher-style quality
    signal that catches boilerplate and looping generations.  Map-only
    (split/transform/array_distinct inside whole-stage codegen); the
    duplicate fraction is (total - distinct) / total over word ``width``-
    grams, 0.0 for documents shorter than ``width`` words."""
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda w: w != F.lit(""))
    doc = docs.select(F.col(id_col), words.alias("__w"))
    n = F.size(F.col("__w"))
    starts = (F.when(n >= width, F.sequence(F.lit(1), n - width + 1))
              .otherwise(F.array().cast("array<int>")))
    grams = F.transform(starts,
                        lambda s: F.array_join(
                            F.slice(F.col("__w"), s, width), " "))
    g = doc.select(id_col, grams.alias("__g"))
    total = F.size(F.col("__g"))
    distinct = F.size(F.array_distinct(F.col("__g")))
    return (g.select(
        F.col(id_col),
        total.alias("n_ngrams"),
        distinct.alias("n_distinct"),
        F.when(total > 0,
               F.round((total - distinct) / total, 6))
         .otherwise(F.lit(0.0)).alias("dup_frac"))
        .orderBy(id_col))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  width: int = 5) -> DataFrame:
    """Benchmark decontamination: training documents that share any
    ``width``-token shingle with a benchmark/eval set, with the count of
    distinct shared shingles (the evidence a removal decision needs).

    Both sides explode to 60-bit md5 shingle hashes; the benchmark side is
    distinct-reduced (tiny) and the join shuffles hashes only.  At 100 TB
    the benchmark shingle set usually fits in a broadcast — Spark's AQE
    converts the join automatically once the distinct side measures small;
    the explicit plan keeps it correct either way."""
    def shingle_hashes(df: DataFrame, keep_id: bool) -> DataFrame:
        sh = df.select(
            *( [F.col(id_col)] if keep_id else [] ),
            F.explode(_shingles(F.col(text_col), width)).alias("__s"))
        cols = ([F.col(id_col)] if keep_id else []) + \
            [md5_long(F.col("__s")).alias("shingle_h")]
        return sh.select(*cols)

    bench_h = shingle_hashes(benchmark, keep_id=False).distinct()
    doc_h = shingle_hashes(docs, keep_id=True)
    return (doc_h.join(bench_h, "shingle_h")
            .groupBy(id_col)
            .agg(F.count_distinct("shingle_h").alias("n_shared"))
            .orderBy(F.desc("n_shared"), id_col))


def pack_sequences(docs: DataFrame, budget: int = 512,
                   group_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text", token_client=None) -> DataFrame:
    """Sequence packing: assign documents to contiguous token-budget
    training shards (concatenate-then-chunk semantics — a document may
    straddle a shard boundary, as in GPT-style token-stream packing).

    Within each ``group_col`` stream, documents are ordered by id and the
    running token count places each at (shard, offset):
    shard = tokens_before // budget.  One window shuffle on the group key;
    the cumulative sum is a single pass.  At 100 TB, groups are the
    natural parallel unit (source/domain shards) — no global ordering is
    ever required.

    ``token_client`` (Callable[[list[str]], list[int]], see
    operators/tokenize.py) swaps the whitespace heuristic for a REAL
    trained tokenizer's counts — the budget numbers then mean model
    tokens.  None (default) keeps the JVM expression; injecting
    tokenize.stub_token_counter reproduces it bit for bit."""
    if token_client is not None:
        from document_vector_pipeline_spark.operators.tokenize import (
            count_tokens_with_client)
        counted = count_tokens_with_client(
            docs.select(id_col, group_col, text_col), token_client,
            text_col=text_col, out_col="n_tokens")
        counted = counted.select(id_col, group_col,
                                 F.col("n_tokens").cast("long")
                                 .alias("n_tokens"))
    else:
        toks = F.size(F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda w: w != F.lit("")))
        counted = docs.select(id_col, group_col,
                              toks.cast("long").alias("n_tokens"))
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (counted
            .withColumn("shard", F.floor(before / budget).cast("long"))
            .withColumn("offset", (before % budget).cast("long"))
            .orderBy(group_col, id_col))


def length_histogram(docs: DataFrame, col: str = "n_chars") -> DataFrame:
    """(bucket, n_docs, min_len, max_len, sum_len): power-of-two document
    length histogram — the corpus shape profile that drives chunk-size and
    partition-size decisions.

    bucket = bit length of the value (number of binary digits), an exact
    integer both engines compute identically — deliberately NOT floor(log2)
    on doubles, whose last-ulp rounding can differ across engines.
    Map-only + one tiny aggregate."""
    v = F.col(col).cast("long")
    bucket = F.length(F.bin(v)).cast("int").alias("bucket")
    return (docs.groupBy(bucket)
            .agg(F.count("*").alias("n_docs"),
                 F.min(v).alias("min_len"),
                 F.max(v).alias("max_len"),
                 F.sum(v).alias("sum_len"))
            .orderBy("bucket"))


def mixture_weights(docs: DataFrame, source_col: str = "source",
                    size_col: str = "n_chars") -> DataFrame:
    """(source, n_docs, n_chars, prop, weight): per-source corpus mixture —
    raw share plus a sqrt-temperature sampling weight (the standard
    upweight-the-tail recipe for multi-source training mixes).

    weight uses floor(sqrt(n_docs)) so the normalization is a ratio of
    exact integers (a float sqrt SUM would be summation-order-dependent
    and engine-divergent).  One tiny aggregate + unpartitioned window over
    n_sources rows."""
    from pyspark.sql import Window

    agg = (docs.groupBy(F.col(source_col).alias("source"))
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.col(size_col).cast("long")).alias("n_chars")))
    isq = F.floor(F.sqrt(F.col("n_docs"))).cast("long")
    w = Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    return (agg.withColumn("isq", isq)
            .withColumn("tot_docs", F.sum("n_docs").over(w))
            .withColumn("tot_isq", F.sum("isq").over(w))
            .select("source", "n_docs", "n_chars",
                    F.round(F.col("n_docs") / F.col("tot_docs"), 6)
                     .alias("prop"),
                    F.round(F.col("isq") / F.col("tot_isq"), 6)
                     .alias("weight"))
            .orderBy("source"))


def shuffle_assign(docs: DataFrame, id_col: str = "doc_id",
                   shard_size: int = 1024) -> DataFrame:
    """(doc_id, pos, shard): deterministic global training order — docs
    sorted by md5(doc_id) (a seedless uniform permutation, reproducible
    across runs and engines) with contiguous shard assignment.

    The global position is the TWO-PHASE exact rank (plans/ranking.py:
    range exchange + partition-offset row_number — the zipWithIndex
    shape, no single-reducer sort at any corpus size).  Shard
    boundaries are pure integer division of the position."""
    from document_vector_pipeline_spark.plans.ranking import (
        global_row_number)

    h = md5_long(F.col(id_col).cast("string"))
    base = docs.select(F.col(id_col), h.alias("__h"))
    ranked, _ = global_row_number(
        base, [F.col("__h"), F.col(id_col)], out="__rn")
    return (ranked.select(F.col(id_col),
                          (F.col("__rn") - 1).alias("pos"))
            .withColumn("shard", F.floor(F.col("pos") / shard_size)
                        .cast("long"))
            .orderBy("pos"))


def write_shards(docs: DataFrame, path: str, id_col: str = "doc_id",
                 text_col: str = "text",
                 shard_size: int = 1024) -> DataFrame:
    """Materialize the final training shards and return their manifest,
    read back FROM THE WRITTEN FILES: (shard, n_docs, n_tokens, fp_xor)
    — the WebDataset/tfrecord-shards step that turns a curated corpus
    into the artifact a trainer actually consumes, with a digest per
    shard so the write path itself is verified (not just the plan).

    Layout: ``repartition(shard)`` gives each task whole shards,
    ``sortWithinPartitions(shard, pos)`` fixes the in-shard training
    order, the partitioned write yields one file per shard directory.
    The manifest aggregates the read-back files: doc count, whitespace
    token count, and an order-independent xor of per-doc text md5s —
    all integers, so the oracle recomputes the identical digest from
    the assignment alone (file loss or row corruption breaks fp_xor)."""
    asg = shuffle_assign(docs, id_col, shard_size)
    rows = docs.select(F.col(id_col), F.col(text_col)).join(asg, id_col)
    (rows.repartition("shard")
     .sortWithinPartitions("shard", "pos")
     .write.partitionBy("shard").mode("overwrite").parquet(path))
    # explicit schema: an empty corpus writes zero shard files and
    # inference would fail; the schema is known — it's what we wrote
    back = docs.sparkSession.read.schema(rows.schema).parquet(path)
    toks = F.size(F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: w != F.lit("")))
    fp = (f"bit_xor(cast(conv(substring(md5({text_col}),1,15),16,10)"
          " as bigint))")
    return (back.groupBy(F.col("shard").cast("long").alias("shard"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(toks.cast("long")).cast("long").alias("n_tokens"),
                 F.expr(fp).alias("fp_xor"))
            .orderBy("shard"))


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n, n_null, n_distinct, min_s, max_s): data-quality profile
    of the given columns — null counts, exact distinct cardinality, and
    string-form min/max.

    One pass: unpivot via explode of (name, value-as-string) structs, one
    partial-aggregated shuffle on column name.  Values compare as strings
    (deterministic across engines; numeric min/max live in typed queries).
    The profile is the pre-flight check every ingest batch runs before
    entering a 100 TB corpus."""
    pairs = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("v"))
        for c in cols])).alias("p")
    return (df.select(pairs)
            .select("p.column", "p.v")
            .groupBy("column")
            .agg(F.count("*").alias("n"),
                 F.count(F.when(F.col("v").isNull(), 1)).alias("n_null"),
                 F.count_distinct("v").alias("n_distinct"),
                 F.min("v").alias("min_s"),
                 F.max("v").alias("max_s"))
            .orderBy("column"))


def quality_filters(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    min_words: int = 20, max_words: int = 100_000,
                    min_mean_len: float = 2.0,
                    max_mean_len: float = 12.0,
                    min_stop_hits: int = 2) -> DataFrame:
    """Gopher/C4-style quality-filter battery (Rae et al. 2021 §A1.1,
    Raffel et al. 2020 §2.2): per-document word count, mean word length,
    symbol ratio, digit ratio and English stopword hits, plus the boolean
    verdict the curation pipeline filters on.

    Everything is exact integer counting + one guarded ratio rounded at
    6 dp, so the verdict is bit-stable across engines and partitionings.
    Map-only (zero shuffle): at 100 TB this runs at scan speed as the
    first pass of corpus curation."""
    t = F.col(text_col)
    words = F.filter(F.split(F.lower(F.trim(t)), r"\s+"),
                     lambda w: w != F.lit(""))

    def ratio(num, den):
        return F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))

    en_stops = list(__import__(
        "document_vector_pipeline_spark.functions.text",
        fromlist=["STOPWORDS"]).STOPWORDS["en"])
    out = docs.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)).alias("n_word_chars"),
        F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
         .cast("long").alias("n_symbols"),
        F.length(F.regexp_replace(t, r"[^0-9]", ""))
         .cast("long").alias("n_digits"),
        F.length(t).cast("long").alias("n_chars"),
        F.size(F.filter(words, lambda w: w.isin(en_stops)))
         .cast("long").alias("stop_hits"))
    mean_len = ratio(F.col("n_word_chars"), F.col("n_words"))
    out = out.select(
        id_col, "n_words",
        mean_len.alias("mean_word_len"),
        ratio(F.col("n_symbols"), F.col("n_chars")).alias("symbol_ratio"),
        ratio(F.col("n_digits"), F.col("n_chars")).alias("digit_ratio"),
        "stop_hits",
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
         & (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
         & (F.col("stop_hits") >= min_stop_hits)).alias("passes"))
    return out.orderBy(id_col)


def length_percentiles(docs: DataFrame, group_col: str = "source",
                       value_col: str = "n_chars",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact per-group document-length percentiles (p50/p90/p99) by rank
    selection — the corpus-profiling twin of the events percentile query:
    idx_p = (n-1)·p in pure integer arithmetic, total order
    (value, id), no interpolation, so both engines agree bit-for-bit.
    One window pass + one partial-aggregated shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = docs.select(
        group_col, F.col(value_col).cast("long").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("n"))

    def at(pct: int):
        idx = ((F.col("n") - 1) * pct - ((F.col("n") - 1) * pct) % 100) / 100
        return F.max(F.when(F.col("rn") == idx.cast("long") + 1,
                            F.col("v")))

    return (ranked.groupBy(group_col)
            .agg(F.count("*").cast("long").alias("n_docs"),
                 at(50).alias("p50"), at(90).alias("p90"),
                 at(99).alias("p99"))
            .orderBy(group_col))


def bigram_lm_scores(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document bigram language-model quality score, exact fixed-point:
    (doc_id, n_bigrams, score).

    The corpus itself is the training set (the standard "score each doc
    under a corpus-level n-gram LM" quality signal — low-probability word
    sequences mark boilerplate/garbled text, the KenLM-filter idea without
    the external model).  For every in-document bigram (w1, w2):

        p6(w1, w2) = (1_000_000 * c2(w1, w2)) div c1(w1)

    — integer division of exact corpus counts, so every per-bigram
    probability is an exact integer in millionths and the document score
    round(sum(p6) / (1e6 * n_bigrams), 6) is invariant to partitioning and
    bit-identical across engines (no float log anywhere; arithmetic-mean
    probability instead of perplexity keeps it in integers).

    Plan shape: one tokenize pass feeds both count aggregations; scoring
    joins each document bigram to its two counts — shuffles on the bigram
    and unigram keys (Zipf-skewed: AQE skew-join handles the head) and one
    final groupBy doc.  At 100 TB the unigram table (vocabulary) is
    broadcast-sized; Catalyst picks that up from AQE stats at runtime."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
                 lambda w: w != F.lit("")).alias("w"))
    grams = toks.select(
        "doc_id",
        F.posexplode(F.when(
            F.size("w") >= 2,
            F.transform(F.sequence(F.lit(1), F.size("w") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("w"), i).alias("w1"),
                            F.element_at(F.col("w"), i + 1).alias("w2"))))
         .otherwise(F.array().cast(
             "array<struct<w1:string,w2:string>>"))).alias("pos", "g"))
    grams = grams.select("doc_id", F.col("g.w1").alias("w1"),
                         F.col("g.w2").alias("w2"))
    c2 = grams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # c1 must be the count of w1 AS A BIGRAM HEAD (so probabilities per w1
    # sum to 1 exactly), i.e. sum of c2 over w2
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (grams
              .join(c2, ["w1", "w2"])
              .join(c1, ["w1"])
              .withColumn("p6", F.expr("(1000000 * c2) div c1")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.sum("p6").alias("s6"))
            .select("doc_id", "n_bigrams",
                    F.round(F.col("s6") / (F.col("n_bigrams") * 1e6), 6)
                     .alias("score"))
            .orderBy("doc_id"))


def lang_mix(docs: DataFrame, source_col: str = "source",
             lang_col: str = "lang") -> DataFrame:
    """Language composition per source: (source, lang, n_docs,
    share_ppm) with exact integer ppm of the source's documents — the
    per-source language report multilingual mixture weighting starts
    from (companion of mixture_weights, which weights sources;
    this shows what each source is made of).

    One partial-aggregated shuffle on the bounded (source, lang) key;
    the share window runs on the crosstab, never the corpus."""
    from pyspark.sql import Window

    cnt = (docs.groupBy(F.col(source_col).alias("source"),
                        F.col(lang_col).alias("lang"))
           .agg(F.count("*").cast("long").alias("n_docs")))
    w = Window.partitionBy("source")
    return (cnt.withColumn(
        "share_ppm",
        F.expr("(1000000 * n_docs) div sum(n_docs) over "
               "(partition by source)").cast("long"))
        .orderBy("source", "lang"))


def lm_buckets(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): rank every
    document by its corpus-LM score and cut the ranking into
    head/middle/tail tertiles — the bucket label CCNet keeps (head),
    samples (middle), or drops (tail) when building training mixes.
    (doc_id, n_bigrams, score, tile, bucket).

    Plan: the LM scoring is bigram_lm_scores (oracle-exact fixed-point);
    the tiling runs over the per-document SCORE table — one row per
    doc, never tokens — as the TWO-PHASE exact global ntile
    (plans/ranking.py: range exchange + partition-offset arithmetic)
    with a deterministic total tie-break (score desc, doc_id), so
    billions of docs never single-task."""
    from document_vector_pipeline_spark.plans.ranking import global_ntile

    scored = bigram_lm_scores(docs, id_col, text_col)
    tiled = global_ntile(scored, [F.desc("score"), F.col("doc_id")], 3,
                         out="tile")
    return (tiled
            .withColumn("bucket",
                        F.when(F.col("tile") == 1, "head")
                         .when(F.col("tile") == 2, "middle")
                         .otherwise("tail"))
            .select("doc_id", "n_bigrams", "score", "tile", "bucket"))


def curate(docs: DataFrame, id_col: str = "doc_id",
           text_col: str = "text", rep_width: int = 3,
           max_dup_frac: float = 0.2) -> DataFrame:
    """The curation decision table — per document, every drop signal the
    pipeline computes plus the final verdict:
    (doc_id, exact_dup, near_dup, low_quality, repetitive, keep).

    - exact_dup: not the min-id holder of its normalized-text md5 group
    - near_dup: a non-survivor of a MinHash-LSH connected component
    - low_quality: fails the Gopher/C4 filter battery (quality_filters)
    - repetitive: within-doc repeated n-gram ratio > ``max_dup_frac``
    - keep: none of the above

    This is the query a training-data pipeline actually runs: one pass
    that explains, for every document, WHY it stays or goes — the audit
    artifact curation reviews want, not just the surviving corpus.

    Plan shape: quality and repetition are map-only; exact dedup is one
    groupBy on a uniform md5 key; near-dup reuses the banded LSH join +
    label propagation (the only iterative piece); the final assembly is
    skinny boolean columns joined on doc_id — co-partitioned after the
    first shuffle, and the loser/flag sides are tiny at any scale."""
    from document_vector_pipeline_spark.operators import dedup as D
    from document_vector_pipeline_spark.operators.graph import (
        connected_components,
    )

    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"))
    fp = base.select("doc_id",
                     md5_long(D._norm_text(F.col("text"))).alias("f"))
    keep_id = fp.groupBy("f").agg(F.min("doc_id").alias("keep_id"))
    exact = (fp.join(keep_id, "f")
             .select("doc_id",
                     (F.col("doc_id") != F.col("keep_id"))
                     .alias("exact_dup")))
    comp = connected_components(D.minhash_lsh_pairs(base))
    losers = (comp.filter(F.col("id") != F.col("component"))
              .select(F.col("id").alias("doc_id"),
                      F.lit(True).alias("near_dup")))
    q = quality_filters(base).select("doc_id", "passes")
    rep = repetition_stats(base, width=rep_width).select("doc_id",
                                                         "dup_frac")
    flags = (base.select("doc_id")
             .join(exact, "doc_id")
             .join(losers, "doc_id", "left")
             .join(q, "doc_id")
             .join(rep, "doc_id")
             .select("doc_id", "exact_dup",
                     F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
                     (~F.col("passes")).alias("low_quality"),
                     (F.col("dup_frac") > max_dup_frac).alias("repetitive")))
    return (flags.withColumn(
                "keep",
                ~(F.col("exact_dup") | F.col("near_dup")
                  | F.col("low_quality") | F.col("repetitive")))
            .orderBy("doc_id"))


def interleave_by_mixture(docs: DataFrame, source_col: str = "source",
                          id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted interleaving of sources into one training
    order: (doc_id, source, v6, pos).

    The mixture scheduler: each source's documents are ranked by the
    seedless md5 permutation, and document r of source s is released at
    virtual time v = r / w_s with w_s = sqrt(n_s) (the sqrt-temperature
    weight corpus_mixture computes) — classic fair-queueing, so sources
    appear proportionally to their weights all the way through the epoch
    instead of front-loading the big ones.  All arithmetic is integer:
    w6 = floor(sqrt(n_s · 1e6)) (IEEE sqrt of an exact integer — both
    engines round identically), v6 = (r · 1_000_000) div w6, ties broken
    by (source, doc_id).  Reproducible across runs, engines and cluster
    sizes.

    Fully two-phase (plans/ranking.py): the per-source rank is a
    grouped running count (a source-partitioned window would be ONE
    TASK PER SOURCE with a handful of sources), per-source totals ride
    in as a broadcast aggregate, and the global position is the
    partition-offset exact rank — no single-task stage anywhere at
    any corpus size."""
    from document_vector_pipeline_spark.plans.ranking import (
        global_row_number, grouped_running_sum)

    h = md5_long(F.col(id_col).cast("string"))
    base = docs.select(F.col(id_col), F.col(source_col).alias("source"),
                       h.alias("__h"), F.lit(1).cast("long").alias("__one"))
    ranked = grouped_running_sum(
        base, "source", [F.col("__h"), F.col(id_col)], "__one", out="r")
    n_per = (docs.groupBy(F.col(source_col).alias("source"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    ranked = ranked.join(F.broadcast(n_per), "source")
    w6 = F.floor(F.sqrt(F.col("n") * F.lit(1_000_000))).cast("long")
    ranked = ranked.withColumn("w6", w6) \
                   .withColumn("v6", F.expr("(r * 1000000) div w6"))
    pos_ranked, _ = global_row_number(
        ranked.select(id_col, "source", "v6"),
        [F.col("v6"), F.col("source"), F.col(id_col)], out="__grn")
    return (pos_ranked.select(id_col, "source", "v6",
                              (F.col("__grn") - 1).alias("pos"))
            .orderBy("pos"))


def weighted_sample(docs: DataFrame, weight_ppm: Column,
                    id_col: str = "doc_id",
                    salt: str = "ws") -> DataFrame:
    """Per-document Bernoulli sampling with a per-row acceptance
    probability (quality-weighted downsampling: keep high-quality docs
    with high probability, low-quality with low, without any global pass).

    keep ⇔ md5(id|salt) mod 10⁶ < weight_ppm — deterministic,
    re-runnable, and exactly reproducible by any engine with md5 (no RNG
    state, no seed plumbing, no shuffle: pure map, so it composes with
    any upstream filter at 100 TB for free).  Emits the draw and the
    weight for audit."""
    draw = md5_long(F.concat(F.col(id_col).cast("string"),
                             F.lit("|" + salt))) % 1_000_000
    return (docs.select(F.col(id_col),
                        weight_ppm.cast("long").alias("weight_ppm"),
                        draw.alias("draw_ppm"))
            .withColumn("keep", F.col("draw_ppm") < F.col("weight_ppm"))
            .orderBy(id_col))


def boilerplate_stats(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", min_df: int = 3) -> DataFrame:
    """Per-document boilerplate profile (the C4 "line appears in ≥ N
    documents" filter input): line count, boilerplate-line count (lines
    whose corpus document-frequency ≥ min_df), and the boilerplate ppm.

    Lines travel as md5 integers once exploded, so the df aggregation
    and the flag join shuffle skinny (id, hash) rows, not text; both
    shuffles key on the line hash (uniform unless one line dominates —
    which is exactly the boilerplate case AQE skew-join handles)."""
    lines = docs.select(
        F.col(id_col),
        F.explode(F.filter(
            F.transform(F.split(F.col(text_col), "\n"), F.trim),
            lambda s: s != F.lit(""))).alias("line"))
    keyed = lines.select(id_col, md5_long(F.col("line")).alias("lh"))
    df = (keyed.groupBy("lh")
          .agg(F.count_distinct(id_col).alias("df")))
    flagged = keyed.join(df, "lh")
    return (flagged.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_lines"),
                 F.count(F.when(F.col("df") >= min_df, 1)).cast("long")
                  .alias("n_boiler"))
            .withColumn("boiler_ppm",
                        F.expr("(1000000 * n_boiler) div n_lines"))
            .orderBy(id_col))


def source_vocab_similarity(docs: DataFrame, source_col: str = "source",
                            text_col: str = "text") -> DataFrame:
    """Pairwise vocabulary Jaccard between sources (source_a < source_b,
    exact |V∩V|/|V∪V| in ppm) — the corpus-organization view that tells
    you which sources are near-mirrors before mixture weighting.

    Terms travel as md5 ints; ONE distinct over (source, term-hash), a
    self-equi-join on the term hash (df-bounded fan-out per term: at most
    n_sources² pairs per term), and a sources²-row output.  The exact
    |V| sizes ride the same distinct."""
    # materialize the per-source vocabulary ONCE (vocab-sized, two
    # narrow columns): it feeds BOTH sides of the self-join and the
    # size aggregate, and without the checkpoint the corpus tokenize +
    # md5 pass (the dominant CPU of this query) re-runs per consumer —
    # AQE exchange reuse does not cover the differently-keyed
    # re-shuffles (§1.2: don't recompute what you already computed)
    v = (docs.select(F.col(source_col).alias("src"),
                     F.explode(F.filter(
                         F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                         lambda w: w != F.lit(""))).alias("term"))
         .select("src", md5_long(F.col("term")).alias("h"))
         .distinct().localCheckpoint(eager=True))
    sizes = v.groupBy("src").agg(F.count("*").alias("nv"))
    inter = (v.alias("a").join(v.alias("b"),
                               (F.col("a.h") == F.col("b.h"))
                               & (F.col("a.src") < F.col("b.src")))
             .groupBy(F.col("a.src").alias("source_a"),
                      F.col("b.src").alias("source_b"))
             .agg(F.count("*").alias("c")))
    return (inter
            .join(F.broadcast(sizes.withColumnRenamed("src", "source_a")
                              .withColumnRenamed("nv", "na")), "source_a")
            .join(F.broadcast(sizes.withColumnRenamed("src", "source_b")
                              .withColumnRenamed("nv", "nb")), "source_b")
            .select("source_a", "source_b",
                    F.col("c").cast("long").alias("n_shared"),
                    F.expr("(1000000 * c) div (na + nb - c)")
                     .alias("jaccard_ppm"))
            .orderBy("source_a", "source_b"))


def novelty_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", width: int = 3) -> DataFrame:
    """Per-document novelty against everything that arrived BEFORE it
    (id order = arrival order): the fraction of the doc's distinct
    shingles whose first corpus occurrence is this document, in exact
    ppm.  The incremental-crawl signal — a snapshot whose docs score
    near zero is re-crawl, not new data — and the complement of
    boilerplate_stats (which asks how SHARED a line is, not how early).

    Shingles travel as md5 ints; one groupBy finds each shingle's first
    doc (map-side-combinable min), one join flags novelty, one per-doc
    reduce."""
    keyed = (docs.select(
        F.col(id_col),
        F.explode(_shingles(F.col(text_col), width)).alias("s"))
        .select(id_col, md5_long(F.col("s")).alias("h")))
    first = keyed.groupBy("h").agg(F.min(id_col).alias("first_id"))
    return (keyed.join(first, "h")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_shingles"),
                 F.count(F.when(F.col("first_id") == F.col(id_col), 1))
                  .cast("long").alias("n_novel"))
            .withColumn("novelty_ppm",
                        F.expr("(1000000 * n_novel) div n_shingles"))
            .orderBy(id_col))


def token_budget_select(docs: DataFrame, budget_tokens: int = 50_000,
                        source_col: str = "source", id_col: str = "doc_id",
                        chars_col: str = "n_chars",
                        text_col: str = "text",
                        token_client=None) -> DataFrame:
    """Greedy per-source token-budget selection: admit documents in a
    deterministic pseudo-random order (md5(id), id — the same uniform
    priority as hash_split) until each source's cumulative token count
    exceeds its budget.  This is the mixture-building step after
    mixture_weights decides per-source budgets: "take N tokens of web, M
    of code" becomes one pass with a kept flag.

    Tokens = ceil(n_chars / 4) (the chars-per-token heuristic used by
    text_tokens), or a REAL trained tokenizer's counts when
    ``token_client`` is injected (operators/tokenize.py seam — the
    budget then means model tokens).  Output: (doc_id, source, tokens,
    cum_tokens, kept).

    Scale: a per-source running sum is sequential by definition, and
    with only a handful of sources a source-partitioned window is ONE
    TASK PER SOURCE — so this runs the TWO-PHASE form directly
    (plans/ranking.grouped_running_sum): range exchange on (source,
    priority), per-(shard, source) partial sums as plan metadata,
    map-side cum = source offset within shard order + local running
    sum.  Bit-identical to the window, fully distributed at 100 TB.
    """
    from document_vector_pipeline_spark.functions.hashing import md5_long
    from document_vector_pipeline_spark.plans.ranking import (
        grouped_running_sum)

    pri = md5_long(F.col(id_col).cast("string"))
    if token_client is not None:
        # trained-tokenizer budgets (operators/tokenize.py seam):
        # counts come from the injected client over the text itself
        from document_vector_pipeline_spark.operators.tokenize import (
            count_tokens_with_client)
        base = (count_tokens_with_client(
                    docs.select(id_col, source_col, text_col),
                    token_client, text_col=text_col, out_col="tokens")
                .select(F.col(id_col), F.col(source_col),
                        F.col("tokens").cast("long").alias("tokens"),
                        pri.alias("__pri")))
    else:
        # ceil(n/4) in pure integer form: (n+3) div 4 (floor((n+3)/4.0)
        # is exact in double for any realistic n; DuckDB mirrors as //)
        toks = F.floor((F.col(chars_col).cast("long") + 3) / 4) \
            .cast("long")
        base = docs.select(F.col(id_col), F.col(source_col),
                           toks.alias("tokens"), pri.alias("__pri"))
    summed = grouped_running_sum(
        base, source_col, [F.col("__pri"), F.col(id_col)], "tokens",
        out="cum_tokens")
    return (summed
            .withColumn("kept", F.col("cum_tokens") <= budget_tokens)
            .select(id_col, source_col, "tokens", "cum_tokens", "kept"))


def quality_model_scores(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Linear quality-classifier inference over hashed bag-of-words
    features — the fastText-style scoring pass (Joulin et al. 2016) LLM
    pipelines run to rank documents (e.g. GPT-3's WebText-similarity
    filter).  The model weights here are a deterministic md5-derived stub
    (weight(w) = md5(w) % 2001 − 1000), the same stand-in philosophy as
    the hash embedder: swap in trained weights via a broadcast map at
    deployment, every Spark-side shape — distinct-token featurization,
    integer logit accumulation, verdict — is the production one.

    Map-only (zero shuffle), exact integer arithmetic end to end.
    Output: (doc_id, n_feats, logit_milli, keep) with
    logit_milli = Σ weights over distinct tokens.
    """
    from document_vector_pipeline_spark.functions.expr import bound
    from document_vector_pipeline_spark.functions.hashing import md5_long

    words = F.array_distinct(
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                 lambda w: w != F.lit("")))

    def score(ws):
        return F.aggregate(
            ws, F.lit(0).cast("long"),
            lambda acc, w: acc + (md5_long(w) % 2001 - 1000))

    ws = bound(words, lambda w: F.struct(
        F.size(w).cast("long").alias("n_feats"),
        score(w).alias("logit_milli")))
    return docs.select(
        F.col(id_col),
        ws["n_feats"].alias("n_feats"),
        ws["logit_milli"].alias("logit_milli"),
        (ws["logit_milli"] > 0).alias("keep"))


def dsir_weights(docs: DataFrame, target_cond: Column,
                 id_col: str = "doc_id", text_col: str = "text",
                 m: int = 1024, k: int = 50) -> DataFrame:
    """DSIR-style hashed-ngram importance weights (Data Selection via
    Importance Resampling, Xie et al. NeurIPS 2023): score every
    document by how much more likely its features are under the TARGET
    distribution (the docs matching ``target_cond``) than under the raw
    corpus — the principled replacement for hand-rules when curating
    toward a domain.  Returns the top-``k`` (doc_id, n_feats,
    logw_micro, rank).

    Features are unigrams + adjacent bigrams hashed into ``m`` buckets
    (md5-prefix — cross-engine exact); bucket probabilities are
    Laplace-smoothed, and the per-feature log ratio

        ln( ((ct+1) * (totr+m)) / ((cr+1) * (tott+m)) )

    is rounded to integer micro-units immediately (the ln is the only
    transcendental — same discipline as BM25's idf), so each document's
    log-weight is an order-free integer sum.

    Plan shape: ONE tokenize pass feeds the feature stream; both bucket
    count aggregations shuffle on the uniform m-bucket key; scoring
    joins the stream to the BROADCAST m-row stats table (plus one-row
    totals) and aggregates per doc — no corpus-sized shuffle beyond the
    one feature groupBy, and the rank window runs over a k-cut."""
    from pyspark.sql import Window

    from document_vector_pipeline_spark.functions.hashing import md5_long

    if m < 2:
        raise ValueError("dsir_weights needs m >= 2 hash buckets")
    from document_vector_pipeline_spark.functions.par import fan_out

    # target_cond may reference arbitrary doc columns — fan out the full
    # row (§2.5; the tokenize+hash explode below is the CPU-dense pass)
    docs = fan_out(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"), target_cond.alias("is_t"),
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
                 lambda w: w != F.lit("")).alias("w"))
    uni = toks.select("doc_id", "is_t", F.explode("w").alias("f"))
    bi = toks.select(
        "doc_id", "is_t",
        F.explode(F.when(
            F.size("w") >= 2,
            F.transform(F.sequence(F.lit(1), F.size("w") - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at(F.col("w"), i),
                            F.element_at(F.col("w"), i + 1))))
         .otherwise(F.array().cast("array<string>"))).alias("f"))
    feats = (uni.unionByName(bi)
             .select("doc_id", "is_t",
                     (md5_long(F.col("f"), 8) % m).alias("b"))
             .localCheckpoint(eager=True))

    raw = feats.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (feats.filter(F.col("is_t"))
           .groupBy("b").agg(F.count(F.lit(1)).alias("ct")))
    stats = (raw.join(tgt, "b", "left")
             .withColumn("ct", F.coalesce("ct", F.lit(0)).cast("long")))
    tots = feats.agg(
        F.count(F.lit(1)).alias("totr"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("tott"))

    c = F.round(
        F.log((((F.col("ct") + F.lit(1.0)) * (F.col("totr") + F.lit(m))))
              / (((F.col("cr") + F.lit(1.0))
                  * (F.col("tott") + F.lit(m)))))
        * F.lit(1000000.0)).cast("long")
    contrib = (feats.join(F.broadcast(stats), "b")
               .crossJoin(F.broadcast(tots))
               .withColumn("c", c))
    agg = (contrib.groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_feats"),
                F.sum("c").alias("logw_micro")))
    top = agg.orderBy(F.desc("logw_micro"), "doc_id").limit(k)
    w = Window.orderBy(F.desc("logw_micro"), "doc_id")
    return (top.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("doc_id", "n_feats", "logw_micro", "rank"))


def semantic_decontaminate(emb: DataFrame, heldout: DataFrame,
                           threshold: float = 0.9,
                           id_col: str = "doc_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Embedding-space decontamination — the semantic companion to the
    n-gram ``decontaminate``: flags every corpus document whose
    embedding cosine against ANY held-out eval document meets
    ``threshold``, reporting its best-matching eval doc —
    (id_col, eval_id, score), ties on max score to the smallest
    eval id.  N-gram overlap misses paraphrased leakage; this is the
    standard second pass (e.g. SemDeDup-style eval-leak audits).

    Plan: the held-out set is eval-set-sized by definition, so it
    broadcasts as the query side of ``range_search``'s ZERO-shuffle
    band scan (one Arrow pass over the corpus; only pairs ≥ threshold
    leave each batch) — the argmax regroup then runs on the
    contamination-sized pair list, never the corpus.  At 100 TB this
    is one scan, no corpus-keyed exchange."""
    from document_vector_pipeline_spark.operators.similarity import (
        range_search,
    )

    q = heldout.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("query_vec"))
    pairs = range_search(emb, q, threshold=threshold,
                         id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), "query_id")
    return (pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("vec_id").alias(id_col),
                    F.col("query_id").alias("eval_id"), "score")
            .orderBy(id_col))
