"""Tokenizer-client seam, rerank-client seam, and indexed PRF."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_vector_pipeline_spark.operators import retrieval
from document_vector_pipeline_spark.operators.corpus import (
    pack_sequences,
    token_budget_select,
)
from document_vector_pipeline_spark.operators.tokenize import (
    count_tokens_with_client,
    make_vocab_token_counter,
    stub_token_counter,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stub_counter_matches_jvm_expression(spark, docs_small):
    """Injecting the stub client reproduces the built-in whitespace
    heuristic bit for bit — the seam is free until a real tokenizer
    goes in."""
    toks = F.size(F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                           lambda w: w != F.lit("")))
    want = _rows(docs_small.select("doc_id",
                                        toks.cast("long").alias("n")),
                 ["doc_id", "n"])
    got = _rows(count_tokens_with_client(
        docs_small.select("doc_id", "text"), stub_token_counter,
        out_col="n"), ["doc_id", "n"])
    assert got == want


def test_pack_sequences_stub_client_identical(spark, docs_small):
    base = pack_sequences(docs_small, budget=256)
    via = pack_sequences(docs_small, budget=256,
                         token_client=stub_token_counter)
    cols = ["doc_id", "source", "n_tokens", "shard", "offset"]
    assert _rows(via, cols) == _rows(base, cols)


def test_token_budget_select_accepts_client(spark, docs_small):
    """With a real client the budget is measured in client tokens: the
    per-source cumulative sums are consistent with the client's own
    counts."""
    out = token_budget_select(docs_small, budget_tokens=5_000,
                              token_client=stub_token_counter)
    rows = out.collect()
    assert rows
    counts = {r["doc_id"]: r["tokens"] for r in rows}
    texts = {r["doc_id"]: r["text"]
             for r in docs_small.select("doc_id", "text").collect()}
    ids = sorted(counts)[:20]
    want = stub_token_counter([texts[i] for i in ids])
    assert [counts[i] for i in ids] == want


def test_vocab_counter_is_a_real_tokenizer():
    """Non-stub path: a trained-vocab greedy longest-match counter
    segments like WordPiece — not a whitespace count."""
    count = make_vocab_token_counter(["un", "break", "able", "breakable"])
    # 'unbreakable' -> un + breakable = 2 pieces; whitespace would say 1
    assert count(["unbreakable"]) == [2]
    # longest match first: 'breakable' is one piece, not break+able
    assert count(["breakable"]) == [1]
    # unknown chars count one each: 'xy' -> 2
    assert count(["xy un xy"]) == [2 + 1 + 2]
    assert count(["unbreakable", "break able"]) == [2, 2]


def test_rerank_with_client_real_scorer(spark, docs_small):
    """Non-stub rerank client: any real scoring function flows through
    the seam — here, score = Jaccard overlap of query and doc tokens
    (a legitimate lexical reranker)."""
    def jaccard_client(pairs):
        out = []
        for q, d in pairs:
            qs, ds = set(q.lower().split()), set(d.lower().split())
            inter, union = len(qs & ds), len(qs | ds) or 1
            out.append(round(inter / union, 6))
        return out

    docs = docs_small.limit(30)
    cand = (docs.select("doc_id", "text")
            .withColumn("query_id", F.lit(0).cast("long"))
            .withColumn("query_text", F.lit("vector join hash")))
    got = retrieval.rerank_with_client(cand, jaccard_client, k=5)
    rows = got.orderBy("rank").collect()
    assert len(rows) == 5
    # ranking is by client score desc, doc_id asc
    scores = [r["rr_score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # spot-check one score against the client run driver-side
    top = rows[0]
    text = docs.filter(F.col("doc_id") == top["doc_id"]).first()["text"]
    want = int(round(jaccard_client([("vector join hash", text)])[0] * 1e6))
    assert top["rr_score_micro"] == want


def test_prf_indexed_equals_scan_path(spark, docs_small, tmp_path):
    """TextIndex.prf_search ≡ retrieval.bm25_prf over the same corpus —
    the indexed serving path is bit-identical to the scan path."""
    from document_vector_pipeline_spark.store.text_index import TextIndex

    qt = spark.createDataFrame(
        [(0, "vector"), (0, "join"), (1, "stream"), (1, "window")],
        "query_id long, term string")
    idx = TextIndex(spark, str(tmp_path / "prf_idx"),
                    n_term_buckets=8, n_doc_buckets=4, term_vectors=True)
    idx.build(docs_small)
    got = idx.prf_search(qt, k=10, k_fb=3, m=5)
    want = retrieval.bm25_prf(docs_small, qt, k=10, k_fb=3, m=5)
    cols = ["query_id", "doc_id", "n_terms", "score_micro", "rank"]
    assert _rows(got, cols) == _rows(want, cols)


# ---- BPE training (round 9: closes the tokenizer loop) ---------------------

def _bpe_reference(texts, n_merges):
    """Driver-side reference BPE trainer: word histogram, greedy
    left-to-right merges, argmax tie-break (n desc, a, b) — the
    textbook algorithm bpe_train's string-replace encoding must equal."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            words[tuple(w)] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, cnt in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, n))
        new_words = Counter()
        for syms, cnt in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == a and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] += cnt
        words = new_words
    return merges


def test_bpe_train_matches_reference_algorithm(spark):
    """bpe_train's string-replace merge application IS greedy BPE:
    exact equality with the textbook sequence-rewriting trainer on a
    corpus engineered with overlapping repeats (aaa), chained merges
    (multi-symbol pairs), and count ties."""
    from document_vector_pipeline_spark.operators.tokenize import bpe_train

    texts = ["aaa abab abab banana banana banana",
             "low lower lowest low low",
             "aaa ab banana b a n"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    got = [tuple(r) for r in
           bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()]
    want = _bpe_reference(texts, 6)
    assert got == want


def test_bpe_train_stops_early_when_exhausted(spark):
    """Single-char words have no pairs — training returns an empty
    merge table instead of failing."""
    from document_vector_pipeline_spark.operators.tokenize import bpe_train

    docs = spark.createDataFrame([(0, "a b c a b")],
                                 "doc_id long, text string")
    # 'ab' never occurs INSIDE a word, so no adjacent pairs exist
    assert bpe_train(docs, n_merges=4).count() == 0


def test_trained_vocab_drives_token_budgets(spark, docs_small):
    """The closed loop: train merges on the corpus, flatten to a vocab,
    count under the trained tokenizer, and budget-select with it — the
    selected prefix's counts equal the trained counter's own numbers
    (a NON-stub token budget)."""
    from document_vector_pipeline_spark.operators.tokenize import (
        bpe_train,
        vocab_from_merges,
    )

    merges = bpe_train(docs_small, n_merges=8)
    vocab = vocab_from_merges(merges)
    assert len(vocab) >= 8 and any(len(v) > 2 for v in vocab)
    counter = make_vocab_token_counter(vocab)
    out = token_budget_select(docs_small, budget_tokens=5_000,
                              token_client=counter)
    rows = out.collect()
    assert rows
    texts = {r["doc_id"]: r["text"]
             for r in docs_small.select("doc_id", "text").collect()}
    ids = sorted(r["doc_id"] for r in rows)[:20]
    counts = {r["doc_id"]: r["tokens"] for r in rows}
    assert [counts[i] for i in ids] == counter([texts[i] for i in ids])
    # trained counts differ from the whitespace stub (it IS a tokenizer)
    assert counter([texts[ids[0]]]) != stub_token_counter([texts[ids[0]]])


def test_bpe_token_hist_matches_reference_encode(spark):
    """The encode half round-trips: applying the trained merges via
    string replaces yields exactly the textbook trainer's final word
    segmentation, token for token, count for count."""
    from collections import Counter

    from document_vector_pipeline_spark.operators.tokenize import (
        bpe_token_hist,
        bpe_train,
    )

    texts = ["aaa abab abab banana banana banana",
             "low lower lowest low low",
             "aaa ab banana b a n"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    merges = bpe_train(docs, n_merges=6)
    got = {r["token"]: r["n"] for r in
           bpe_token_hist(docs, merges, top=1000).collect()}

    # reference: replay the textbook trainer's segmentation
    words = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            words[tuple(w)] += 1
    for r in sorted(merges.collect(), key=lambda x: x["merge_rank"]):
        a, b = r["a"], r["b"]
        nw = Counter()
        for syms, cnt in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw[tuple(out)] += cnt
        words = nw
    want: Counter = Counter()
    for syms, cnt in words.items():
        for s in syms:
            want[s] += cnt
    assert got == dict(want)


def test_bpe_counter_agrees_with_token_hist(spark, docs_small):
    """The true-BPE client (merge-order segmentation) and the corpus
    histogram path agree exactly: total client tokens over the corpus
    == the full token histogram's count sum — one segmentation
    semantics across the seam and the distributed operator."""
    from document_vector_pipeline_spark.operators.tokenize import (
        _apply_merges,
        _word_histogram,
        bpe_token_hist,
        bpe_train,
        make_bpe_token_counter,
    )

    merges = bpe_train(docs_small, n_merges=8)
    enc = _apply_merges(_word_histogram(docs_small, "text"),
                        merges.collect())
    hist_total = (enc.select(
        (F.size(F.split(F.trim(F.col("seq")), "  ")) * F.col("cnt"))
        .alias("t")).agg(F.sum("t")).collect()[0][0])
    # the public top-k surface: after 8 merges the symbol vocabulary is
    # roughly alphabet + merge tokens — every row a positive count, the
    # merged tokens present
    top = bpe_token_hist(docs_small, merges, top=50).collect()
    toks = {r["token"] for r in top}
    assert all(r["n"] > 0 for r in top)
    assert any(len(t) > 1 for t in toks)
    counter = make_bpe_token_counter(
        [(r["a"], r["b"]) for r in
         sorted(merges.collect(), key=lambda x: x["merge_rank"])])
    texts = [r["text"] for r in docs_small.select("text").collect()]
    assert sum(counter(texts)) == hist_total
    # and it is a REAL tokenizer: differs from the whitespace count
    assert counter([texts[0]]) != stub_token_counter([texts[0]])
    # budgets run under it through the standard client seam
    out = token_budget_select(docs_small, budget_tokens=5_000,
                              token_client=counter)
    rows = out.collect()
    assert rows
    tx = {r["doc_id"]: r["text"]
          for r in docs_small.select("doc_id", "text").collect()}
    ids = sorted(r["doc_id"] for r in rows)[:10]
    counts = {r["doc_id"]: r["tokens"] for r in rows}
    assert [counts[i] for i in ids] == counter([tx[i] for i in ids])


def test_unigram_train_model_properties(spark, docs_small):
    """The trained table keeps every corpus character (never pruned),
    multi pieces within budget, exact integer probabilities summing
    to ≤ 1e6, and greedy segmentation under the model re-produces the
    reported counts."""
    from document_vector_pipeline_spark.operators.tokenize import (
        _greedy_seg_udf,
        _plain_word_hist,
        unigram_token_hist,
        unigram_train,
    )

    model = unigram_train(docs_small, seed_len=4, seed_size=32,
                          vocab_size=8)
    rows = model.collect()
    pieces = [r["piece"] for r in rows]
    assert len(set(pieces)) == len(pieces)
    corpus_chars = {c for r in
                    _plain_word_hist(docs_small, "text").collect()
                    for c in r["w"]}
    assert corpus_chars <= {p for p in pieces if len(p) == 1}
    assert sum(1 for p in pieces if len(p) > 1) <= 8
    assert all(len(p) <= 4 for p in pieces)
    tot = sum(r["n"] for r in rows)
    assert all(r["prob_micro"] == (1_000_000 * r["n"]) // tot
               for r in rows)
    # counts really are the greedy segmentation's piece counts
    wh = _plain_word_hist(docs_small, "text")
    seg = _greedy_seg_udf(pieces, 4)
    truth: dict = {}
    for r in wh.select(seg(F.col("w")).alias("t"), "cnt").collect():
        for p in r["t"]:
            truth[p] = truth.get(p, 0) + r["cnt"]
    assert {r["piece"]: r["n"] for r in rows if r["n"] > 0} == truth
    # encode = the n>0 slice, ranked
    enc = unigram_token_hist(docs_small, top=10, seed_len=4,
                             seed_size=32, vocab_size=8).collect()
    want = sorted(((n, t) for t, n in truth.items()),
                  key=lambda x: (-x[0], x[1]))[:10]
    assert [(r["n"], r["token"]) for r in enc] == want


def test_unigram_multi_pieces_beat_chars_on_repetitive_text(spark):
    """A corpus dominated by one repeated word must train multi-char
    pieces that cover it (the whole point of subword training)."""
    from document_vector_pipeline_spark.operators.tokenize import (
        unigram_train,
    )

    docs = spark.createDataFrame(
        [(i, "banana banana banana split") for i in range(20)],
        "doc_id long, text string")
    rows = unigram_train(docs, seed_len=4, seed_size=16,
                         vocab_size=4).collect()
    used_multi = [r["piece"] for r in rows
                  if len(r["piece"]) > 1 and r["n"] > 0]
    assert used_multi                       # e.g. 'anan', 'ana', 'ba'
    top = rows[0]
    assert len(top["piece"]) > 1            # a multi piece dominates
