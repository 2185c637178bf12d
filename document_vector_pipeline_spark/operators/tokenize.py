"""Tokenizer training and the injectable tokenizer-client seam.

Round 9 closes the full loop: ``bpe_train`` (exact iterated BPE merges
over the corpus word histogram — each merge one literal string replace,
engine-portable), ``bpe_token_hist`` (the corpus token histogram under
the trained merges — the encode half), ``vocab_from_merges`` +
``make_vocab_token_counter`` (longest-match counting under the trained
vocab), and ``make_bpe_token_counter`` (TRUE merge-order segmentation
as a client — agrees token-for-token with the histogram path).  Token
budgets (corpus_pack, corpus_token_budget) run under any of these via
``count_tokens_with_client``.

Token budgets (corpus.pack_sequences, corpus.token_budget_select,
chunking) ship with deterministic heuristic counters — fine for oracle
exactness, but a production mixture is budgeted in TRAINED-tokenizer
tokens (BPE/WordPiece).  This module is the same seam discipline as
embed_with_client / rerank_with_client (the injectable-client contract
mirroring BlobTriggerFunction.cs:118-160's batch/retry shape): a
``client`` is any ``Callable[[list[str]], list[int]]`` returning a
token count per text — the hook where tiktoken/HF-tokenizers (or a
remote tokenize service) goes.  It is cloudpickled BY VALUE to
executor workers: build the vocab/trie lazily inside the callable,
never at closure-build time.

``stub_token_counter`` replays the house whitespace count exactly
(Java ``\\s`` semantics, the same split the JVM expression uses), so
wiring the seam changes NOTHING until a real client is injected —
the oracle-green keys stay green by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.localrel import local_df

__all__ = ["stub_token_counter", "make_vocab_token_counter",
           "make_bpe_token_counter", "count_tokens_with_client",
           "bpe_train", "vocab_from_merges", "bpe_token_hist",
           "unigram_train", "unigram_token_hist"]

# Java \s (what Spark's split(text, '\\s+') matches): ASCII whitespace
# only — Python's \s is unicode-wide, so spell the class out
_JAVA_WS = "[ \t\n\x0b\f\r]+"


def stub_token_counter(texts: list) -> list:
    """Whitespace token counts with EXACTLY the JVM expression's
    semantics (lower(trim(text)) split on Java ``\\s+``, empties
    dropped) — the stub client: injecting it reproduces the built-in
    heuristic bit for bit.  Self-contained (re only): cloudpickles by
    value with no reference to this package."""
    import re

    ws = re.compile("[ \t\n\x0b\f\r]+")
    out = []
    for t in texts:
        out.append(len([w for w in ws.split(t.strip().lower()) if w]))
    return out


def make_vocab_token_counter(vocab: list) -> "callable":
    """A real (non-stub) counter from a trained vocabulary: greedy
    longest-match WordPiece-style segmentation of each whitespace word
    against ``vocab`` (longest prefix wins, unknown chars count 1) —
    the swap-in example proving the seam carries an actual trained
    tokenizer, and the shape a vocab/merges file from any BPE trainer
    reduces to for COUNTING purposes.  The vocab list travels inside
    the closure; the prefix index builds lazily on first call in each
    worker."""
    def count(texts: list) -> list:
        import re

        if not hasattr(count, "_by_len"):
            by_len: dict = {}
            for piece in vocab:
                by_len.setdefault(len(piece), set()).add(piece)
            count._lens = sorted(by_len, reverse=True)
            count._by_len = by_len
        ws = re.compile("[ \t\n\x0b\f\r]+")
        out = []
        for t in texts:
            n = 0
            for w in ws.split(t.strip().lower()):
                i = 0
                while i < len(w):
                    for ln in count._lens:
                        if w[i:i + ln] in count._by_len[ln]:
                            i += ln
                            break
                    else:
                        i += 1
                    n += 1
            out.append(n)
        return out

    return count


def _word_histogram(docs: DataFrame, text_col: str) -> DataFrame:
    """(seq, cnt): the corpus word histogram with each word's symbol
    sequence encoded as a string — every symbol wrapped in single
    spaces ('hello' → ' h  e  l  l  o '), so a BPE merge applies as
    one literal replace.  One corpus scan, one word-keyed shuffle;
    checkpointed because every training/encoding iteration re-reads
    it.  The tokenize+explode map pass is CPU-dense, so an
    under-partitioned scan is fanned out first (§2.5; no-op at
    production parallelism)."""
    from document_vector_pipeline_spark.functions.par import fan_out

    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda x: x != F.lit(""))
    return (fan_out(docs.select(text_col)).select(F.explode(words).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .select(F.concat(F.lit(" "),
                             F.array_join(F.split(F.col("w"), ""), "  "),
                             F.lit(" ")).alias("seq"),
                    "cnt")
            .localCheckpoint(eager=True))


def _apply_merges(wh: DataFrame, merge_rows) -> DataFrame:
    """Chain the literal replaces of a merge table (rank order) onto a
    word-histogram frame — the ENCODE step, shared by training (which
    derives the table as it goes) and bpe_token_hist (which consumes a
    trained one)."""
    for r in sorted(merge_rows, key=lambda r: r["merge_rank"]):
        a, b = r["a"], r["b"]
        wh = wh.withColumn(
            "seq", F.replace(F.col("seq"),
                             F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")))
    return wh


def bpe_token_hist(docs: DataFrame, merges: DataFrame, top: int = 50,
                   text_col: str = "text") -> DataFrame:
    """Corpus token histogram under a TRAINED BPE tokenizer — (token,
    n), top ``top`` by count with a lexicographic tie-break: apply the
    merge table's replaces in rank order to the word histogram, split
    the surviving symbol sequences back into tokens, and weight each
    token by its word's corpus count.  This is the segmentation
    (encode) half of the tokenizer loop — what vocabulary coverage /
    OOV analysis under the trained vocab actually reads.

    Plan: merges are n_merges rows of plan metadata (collected); all
    work after the shared one-scan word histogram is vocab-sized —
    chained JVM string replaces, one explode, one bounded-key
    aggregation, a tiny top-k."""
    wh = _apply_merges(_word_histogram(docs, text_col),
                       merges.collect())
    toks = wh.select(
        F.explode(F.split(F.trim(F.col("seq")), "  ")).alias("token"),
        "cnt")
    return (toks.groupBy("token")
            .agg(F.sum("cnt").cast("long").alias("n"))
            .orderBy(F.desc("n"), "token")
            .limit(top))


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """Exact BPE tokenizer training (Sennrich et al. 2016): iterate the
    merge step ``n_merges`` times and return the merge table —
    (merge_rank 1.., a, b, token = a||b, n = the pair's exact corpus
    count when it was chosen).  This closes the loop the single-step
    ``textstats.bpe_pair_counts`` opens: merges → a (token, rank)
    vocabulary (``vocab_from_merges``) → ``make_vocab_token_counter``
    → token budgets under the TRAINED vocab.

    Exactness (the oracle replays every iteration): the corpus state
    is the WORD HISTOGRAM (word, count) — BPE statistics only depend
    on it — and each word's symbol sequence is encoded as a string
    with every symbol wrapped in single spaces ('hello' → ' h  e  l
    l  o '  [two spaces between symbols]).  Applying a merge is then
    ONE literal string replace: ``replace(seq, ' a  b ', ' ab ')`` —
    left-to-right non-overlapping replacement IS greedy BPE merge
    order, and Spark's ``replace`` and ANSI SQL's share it.  Pair
    counts are integer sums weighted by word count; the argmax
    tie-break is (n desc, a, b) — binary string order, engine-portable
    for the ASCII corpus.  Training stops early if no pair is left.

    Plan shape (100 TB): ONE corpus scan builds the word histogram
    (the only corpus-sized shuffle, on the word key); all ``n_merges``
    iterations run over the VOCAB-sized checkpointed histogram — per
    iteration one bounded-key pair aggregation (≤ |vocab| · avg word
    length pairs) and a 1-row driver collect (the chosen merge is plan
    metadata, exactly the PQ-codebook discipline).  The merge applies
    lazily as a chained replace expression — no per-iteration
    materialization of the histogram."""
    wh = _word_histogram(docs, text_col)
    merges: list = []
    cur = wh
    for rank in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("seq")), "  ")
        pair = F.zip_with(
            F.slice(syms, F.lit(1), F.size(syms) - 1),
            F.slice(syms, F.lit(2), F.size(syms) - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")))
        best = (cur.select(F.explode(pair).alias("p"), "cnt")
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), "a", "b")
                .limit(1).collect())
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((rank, a, b, a + b, n))
        cur = cur.withColumn(
            "seq", F.replace(F.col("seq"),
                             F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")))
    spark = docs.sparkSession
    if not merges:
        return spark.createDataFrame(
            [], "merge_rank int, a string, b string, token string, n long")
    return local_df(
        spark,
        merges, "merge_rank int, a string, b string, token string, n long")


def vocab_from_merges(merges: DataFrame) -> list:
    """Flatten a ``bpe_train`` merge table into the vocabulary list
    ``make_vocab_token_counter`` consumes: every merged token plus both
    sides of every merge (covering intermediate symbols), deduplicated,
    merge order preserved (earlier merges first — the counter's
    longest-match doesn't need ranks, but a real BPE segmenter would).
    Driver-side: the merge table is n_merges rows of plan metadata."""
    rows = sorted(merges.collect(), key=lambda r: r["merge_rank"])
    out: list = []
    seen: set = set()
    for r in rows:
        for tok in (r["token"], r["a"], r["b"]):
            if tok not in seen:
                seen.add(tok)
                out.append(tok)
    return out


def make_bpe_token_counter(merge_pairs: list):
    """A TRUE BPE tokenizer client from a trained merge table: apply
    the merges to each whitespace word IN RANK ORDER (greedy
    left-to-right per merge — exactly the semantics ``bpe_train``
    trained under and ``bpe_token_hist`` aggregates with), and count
    the surviving symbols.  ``merge_pairs`` is [(a, b), ...] in merge
    rank order (e.g. ``[(r["a"], r["b"]) for r in
    merges.orderBy("merge_rank").collect()]``).

    This differs from ``make_vocab_token_counter`` (greedy
    longest-match, WordPiece-style): BPE segmentation is determined by
    merge ORDER, not piece length — the pair makes the client seam and
    the corpus-histogram path agree token for token (tested).
    Self-contained closure; the word→count memo builds lazily per
    worker (Zipf makes it ~one segmentation per distinct word)."""
    pairs = [tuple(p) for p in merge_pairs]

    def count(texts: list) -> list:
        import re

        if not hasattr(count, "_memo"):
            count._memo = {}
            count._ws = re.compile("[ \t\n\x0b\f\r]+")

        def seg_len(w: str) -> int:
            n = count._memo.get(w)
            if n is None:
                syms = list(w)
                for a, b in pairs:
                    out, i = [], 0
                    while i < len(syms):
                        if (i + 1 < len(syms) and syms[i] == a
                                and syms[i + 1] == b):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                n = len(syms)
                if len(count._memo) < 1_000_000:
                    count._memo[w] = n
            return n

        return [sum(seg_len(w)
                    for w in count._ws.split(t.strip().lower()) if w)
                for t in texts]

    return count


def count_tokens_with_client(docs: DataFrame, client,
                             text_col: str = "text",
                             out_col: str = "n_tokens",
                             batch_size: int = 1000,
                             max_retries: int = 100,
                             retry_delay_s: float = 10.0,
                             retry_on=(429, 401)) -> DataFrame:
    """Append ``out_col`` (long) = ``client``'s token count of
    ``text_col`` — ONE map-only mapInPandas stage (no shuffle; the
    Arrow batch is sliced into ``batch_size`` call groups), with the
    embed_with_client retry contract for remote tokenize services
    (a local tokenizer never raises and never pays it)."""
    import time

    from pyspark.sql import types as T

    schema = T.StructType(list(docs.schema.fields)
                          + [T.StructField(out_col, T.LongType())])

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            texts = pdf[text_col].tolist()
            counts: list = []
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
                        f"tokenizer client returned {len(got)} counts "
                        f"for a batch of {len(group)} texts")
                counts.extend(got)
            out = pdf.copy()
            out[out_col] = [int(c) for c in counts]
            yield out

    return docs.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Unigram-style tokenizer training (SentencePiece's seed → count → prune →
# re-estimate loop, Kudo 2018) — round 11.
# ---------------------------------------------------------------------------


def _plain_word_hist(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt): the plain corpus word histogram (house normalization —
    lower(trim) split on \\s+, empties dropped).  One corpus scan, one
    word-keyed shuffle; checkpointed because both training passes
    re-read it.  Fanned out like _word_histogram (§2.5)."""
    from document_vector_pipeline_spark.functions.par import fan_out

    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda x: x != F.lit(""))
    return (fan_out(docs.select(text_col)).select(F.explode(words).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .localCheckpoint(eager=True))


def _greedy_seg_udf(vocab: list, max_len: int):
    """Greedy longest-match segmentation of a word against ``vocab``
    (longest piece at each position wins; every corpus character is in
    the vocab, so the single-char fallback never fires but keeps the
    closure total).  Arrow-batched over the VOCAB-SIZED word histogram
    — never the corpus; bit-identical to the oracle's recursive
    coalesce(v4..v1) scan because both try lengths longest-first."""
    vs = set(vocab)

    @F.pandas_udf("array<string>")
    def seg(ws):
        import pandas as _pd
        out = []
        for w in ws:
            i, toks = 0, []
            while i < len(w):
                for ln in range(min(max_len, len(w) - i), 0, -1):
                    if w[i:i + ln] in vs:
                        toks.append(w[i:i + ln])
                        i += ln
                        break
                else:
                    toks.append(w[i])
                    i += 1
            out.append(toks)
        return _pd.Series(out)

    return seg


def _unigram_counts(wh: DataFrame, vocab: list,
                    max_len: int) -> DataFrame:
    """(piece, n): expected piece counts of the greedy (hard-EM)
    segmentation of the word histogram under ``vocab``, weighted by
    word count — the E-step."""
    seg = _greedy_seg_udf(vocab, max_len)
    return (wh.select(F.explode(seg(F.col("w"))).alias("piece"), "cnt")
            .groupBy("piece").agg(F.sum("cnt").cast("long").alias("n")))


def unigram_train(docs: DataFrame, seed_len: int = 4,
                  seed_size: int = 128, vocab_size: int = 32,
                  text_col: str = "text") -> DataFrame:
    """Unigram-style tokenizer training (the SentencePiece shape, Kudo
    2018: over-complete substring seed → E-step expected counts →
    prune to the target vocabulary → re-estimate): returns the trained
    model table (piece, n, prob_micro) ordered (n desc, piece), with
    prob_micro the exact integer MLE probability (1e6·n div total).

    The E-step uses greedy longest-match (hard-EM) segmentation
    instead of Viterbi under the current probabilities — the one
    substitution that makes EVERY training step exactly replayable by
    the DuckDB oracle (a recursive position scan with longest-first
    piece joins) while keeping the seed-prune-re-estimate structure;
    all counts and probabilities are exact integers.  Single
    characters are never pruned (SentencePiece's rule — keeps every
    word segmentable); ``seed_size`` / ``vocab_size`` budget the
    MULTI-character pieces only.

    Plan shape (100 TB): one corpus scan builds the word histogram
    (the only corpus-sized shuffle); the substring seed explode, both
    segmentation passes (Arrow, vocab in the closure), and every
    aggregation run over the vocab-sized histogram; the two pruning
    collects are plan metadata (≤ seed_size rows) — the PQ-codebook
    discipline, like bpe_train's per-merge collect."""
    wh = _plain_word_hist(docs, text_col)
    parts = None
    for ln in range(1, seed_len + 1):
        idx = F.when(F.length("w") >= ln,
                     F.sequence(F.lit(1), F.length("w") - ln + 1)) \
               .otherwise(F.array().cast("array<int>"))
        p = wh.select(
            F.explode(F.transform(idx, lambda i: F.col("w")
                                  .substr(i, F.lit(ln)))).alias("piece"),
            "cnt")
        parts = p if parts is None else parts.unionByName(p)
    subs = (parts.groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("n"))
            .localCheckpoint(eager=True))
    chars = sorted(r["piece"] for r in
                   subs.filter(F.length("piece") == 1)
                   .select("piece").collect())
    multi0 = [r["piece"] for r in
              subs.filter(F.length("piece") > 1)
              .orderBy(F.desc("n"), "piece").limit(seed_size).collect()]
    c1 = _unigram_counts(wh, chars + multi0, seed_len)
    multi1 = [r["piece"] for r in
              c1.filter(F.length("piece") > 1)
              .orderBy(F.desc("n"), "piece").limit(vocab_size).collect()]
    voc = chars + multi1
    c2 = _unigram_counts(wh, voc, seed_len).localCheckpoint(eager=True)
    spark = docs.sparkSession
    vdf = local_df(spark, [(p,) for p in voc], "piece string")
    tot = c2.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("t"))
    return (vdf.join(c2, "piece", "left")
            .withColumn("n", F.coalesce("n", F.lit(0)).cast("long"))
            .crossJoin(F.broadcast(tot))
            .withColumn("prob_micro",
                        F.when(F.col("t") == 0, F.lit(0))
                        .otherwise(F.expr("(1000000 * n) div t"))
                        .cast("long"))
            .select("piece", "n", "prob_micro")
            .orderBy(F.desc("n"), "piece"))


def unigram_token_hist(docs: DataFrame, top: int = 50,
                       seed_len: int = 4, seed_size: int = 128,
                       vocab_size: int = 32,
                       text_col: str = "text") -> DataFrame:
    """Corpus token histogram under the TRAINED unigram-style vocab —
    (token, n), top ``top`` by (n desc, token): the encode half of the
    loop (what coverage/OOV analysis reads), sharing the train path's
    final segmentation pass exactly — the companion of
    ``bpe_token_hist`` for the unigram trainer."""
    model = unigram_train(docs, seed_len=seed_len, seed_size=seed_size,
                          vocab_size=vocab_size, text_col=text_col)
    return (model.filter(F.col("n") > 0)
            .select(F.col("piece").alias("token"), "n")
            .orderBy(F.desc("n"), "token")
            .limit(top))
