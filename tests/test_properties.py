"""Property tests (hypothesis): invariants that must hold for ANY input,
not just the testdata corpus (SURVEY.md §5).

Each example builds a small batch of documents and runs the real Spark
operators — examples are kept few (Spark jobs are the cost) but each one
covers a batch of adversarial strings (empty, single word, whitespace
runs, unicode, words longer than the chunk budget).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from document_vector_pipeline_spark.config import PipelineConfig
from document_vector_pipeline_spark.operators.chunk import chunk_documents
from document_vector_pipeline_spark.operators.dedup import (
    exact_dedup_survivors,
)

# words of 1-12 letters/digits, plus some unicode
WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1, max_size=12)
DOC = st.lists(WORD, min_size=0, max_size=60).map(" ".join)
SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


@SLOW
@given(st.lists(DOC, min_size=1, max_size=12))
def test_chunk_reassembly_all_modes(spark, texts):
    """concat(chunk_texts) == whitespace-normalized original, every mode:
    chunking must never lose, duplicate, or reorder words."""
    df = _docs_df(spark, texts)
    expected = {
        r["doc_id"]: r["w"]
        for r in df.select(
            "doc_id",
            F.array_join(F.filter(F.split(F.trim("text"), r"\s+"),
                                  lambda w: w != F.lit("")), " ").alias("w")
        ).collect()}
    for mode, cfg in (
        ("tokens", PipelineConfig(max_tokens_per_chunk=7)),
        ("chars", PipelineConfig(char_chunk_size=16)),
        ("words", PipelineConfig(max_word_count=5)),
    ):
        chunks = chunk_documents(df, mode=mode, cfg=cfg)
        got = {
            r["doc_id"]: r["t"]
            for r in (chunks.orderBy("doc_id", "chunk_number")
                      .groupBy("doc_id")
                      .agg(F.array_join(
                          F.collect_list("chunk_text"), " ").alias("t"))
                      .collect())}
        for d, w in expected.items():
            assert got.get(d, "") == w, (mode, d)


@SLOW
@given(st.lists(DOC, min_size=1, max_size=12))
def test_exact_dedup_idempotent_and_total(spark, texts):
    """dedup(dedup(x)) == dedup(x); survivors have distinct fingerprints
    and every input fingerprint is represented."""
    df = _docs_df(spark, texts)
    s1 = exact_dedup_survivors(df)
    rows1 = {(r["doc_id"], r["fingerprint"]) for r in s1.collect()}
    # idempotence: running dedup on the survivors changes nothing
    surv_docs = df.join(s1.select("doc_id"), "doc_id")
    rows2 = {(r["doc_id"], r["fingerprint"])
             for r in exact_dedup_survivors(surv_docs).collect()}
    assert rows1 == rows2
    # totality: every distinct fingerprint of the input survives exactly once
    n_fp = (df.select(F.md5(F.array_join(
        F.filter(F.split(F.lower(F.trim("text")), r"\s+"),
                 lambda w: w != F.lit("")), " ")).alias("f"))
            .distinct().count())
    assert len({f for _, f in rows1}) == len(rows1) == n_fp


# multi-line documents: lines of words joined by newlines
LINE = st.lists(WORD, min_size=0, max_size=12).map(" ".join)
MLDOC = st.lists(LINE, min_size=0, max_size=6).map("\n".join)


@SLOW
@given(st.lists(MLDOC, min_size=1, max_size=10))
def test_paragraph_chunks_preserve_word_sequence(spark, texts):
    """SK paragraph chunking must never lose, duplicate, or reorder
    words, for any multi-line input — splitting, paragraph build, and
    balancing all only move boundaries."""
    df = _docs_df(spark, texts)
    out = chunk_documents(df, mode="paragraphs",
                          cfg=PipelineConfig(max_tokens_per_chunk=8))
    got = {}
    for r in out.orderBy("doc_id", "chunk_number").collect():
        got.setdefault(r.doc_id, []).extend(r.chunk_text.split())
    for i, t in enumerate(texts):
        assert got.get(i, []) == t.split()


SENT = st.lists(WORD, min_size=1, max_size=6).map(" ".join)
DOTDOC = st.lists(SENT, min_size=0, max_size=6).map(". ".join)


@SLOW
@given(st.lists(DOTDOC, min_size=1, max_size=10))
def test_line_dedup_idempotent(spark, texts):
    """After one pass every surviving unit is globally unique, so a
    second pass must keep everything unchanged."""
    from document_vector_pipeline_spark.operators.dedup import line_dedup

    df = _docs_df(spark, texts)
    once = line_dedup(df).select(
        "doc_id", F.col("clean_text").alias("text")).collect()
    df2 = spark.createDataFrame(once, "doc_id long, text string")
    twice = {r.doc_id: r for r in line_dedup(df2).collect()}
    for r in once:
        again = twice[r.doc_id]
        assert again.clean_text == r.text
        assert again.n_units == again.n_kept


URLCHARS = st.text(
    alphabet="abcXYZ0189-._~/?&=#:%", min_size=0, max_size=30)


@SLOW
@given(st.lists(URLCHARS, min_size=1, max_size=8))
def test_url_canonical_is_idempotent(spark, tails):
    """canonical(canonical(u)) == canonical(u): normalization must be a
    projection, or re-running a dedup pass would change keys."""
    from document_vector_pipeline_spark.operators.dedup import url_canonical

    rows = [(i, "HTTP://WWW.Example.com:80/" + t)
            for i, t in enumerate(tails)]
    df = spark.createDataFrame(rows, "i int, url string")
    out = df.select(
        url_canonical(F.col("url")).alias("c1")).select(
        F.col("c1"), url_canonical(F.col("c1")).alias("c2")).collect()
    for r in out:
        assert r["c1"] == r["c2"], r


@SLOW
@given(st.integers(min_value=0, max_value=1_000_000),
       st.integers(min_value=0, max_value=1_000_000))
def test_weighted_sample_keep_set_is_monotone(spark, docs_small, w1, w2):
    """A higher acceptance weight can only ADD documents to the keep set
    (the md5 draw is fixed per id), so repeated curation passes with
    loosened thresholds never drop previously-kept docs."""
    from document_vector_pipeline_spark.operators.corpus import (
        weighted_sample,
    )

    lo, hi = sorted((w1, w2))
    d = docs_small.limit(60)
    keep_lo = {r["doc_id"] for r in
               weighted_sample(d, F.lit(lo)).filter("keep").collect()}
    keep_hi = {r["doc_id"] for r in
               weighted_sample(d, F.lit(hi)).filter("keep").collect()}
    assert keep_lo <= keep_hi


@given(st.lists(st.floats(min_value=-2.0, max_value=2.0,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=60))
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_py_round6_np_matches_spark_round(spark, xs):
    """py_round6_np must replay Spark's Round(double, 6) on arbitrary
    doubles (incl. shortest-repr tie values hypothesis may find)."""
    import numpy as np

    from document_vector_pipeline_spark.functions.vectors import py_round6_np

    got = list(py_round6_np(np.array(xs)))
    want = [r["r"] for r in
            spark.createDataFrame([(float(x),) for x in xs], "x double")
            .select(F.round("x", 6).alias("r")).collect()]
    assert got == want


def test_bm25_and_fusion_partition_invariant(spark):
    """The 1000-executor claim, tested: BM25 scores and both fusion
    operators return IDENTICAL values regardless of input partitioning
    (integer sums are order-free; every float op is fixed-shape)."""
    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.operators import retrieval

    rows = [(i, f"alpha beta{i % 7} gamma delta" + " pad" * (i % 5))
            for i in range(60)]
    qt = spark.createDataFrame(
        [(0, "alpha"), (0, "beta3"), (1, "gamma"), (1, "pad")],
        "query_id long, term string")

    def run(n_parts):
        docs = (spark.createDataFrame(rows, "doc_id long, text string")
                .repartition(n_parts))
        text = retrieval.bm25_topk(docs, qt, k=10)
        vec = spark.createDataFrame(
            [(0, 3, 0.91, 1), (0, 8, 0.42, 2), (1, 5, 0.77, 1)],
            "query_id long, vec_id long, score double, rank int")
        rrf = retrieval.rrf_fuse(
            text.select("query_id", "doc_id", "rank"), vec, k=10)
        mm = retrieval.minmax_fuse(text, vec, k=10)
        return (sorted(map(tuple, text.collect())),
                sorted(map(tuple, rrf.collect())),
                sorted(map(tuple, mm.collect())))

    assert run(1) == run(13)


def test_collocations_partition_invariant(spark):
    from document_vector_pipeline_spark.operators import textstats

    rows = [(i, "red wine " * (i % 4 + 1) + "blue sky " * 3)
            for i in range(40)]

    def run(n_parts):
        docs = (spark.createDataFrame(rows, "doc_id long, text string")
                .repartition(n_parts))
        return sorted(map(tuple, textstats.collocations(
            docs, min_count=3, topk=20).collect()))

    assert run(1) == run(11)


AWORD = st.sampled_from(
    ["apple", "apricot", "banana", "band", "cherry", "chess",
     "durian", "dust", "fig", "fog"])
ADOC = st.lists(AWORD, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(ADOC, min_size=2, max_size=10),
       st.sampled_from(["a", "ap", "b", "ch", "d", "f", "zz"]))
def test_prefix_search_equals_scan_expansion(spark, tmp_path_factory, texts, prefix):
    """prefix_search over the dictionary == scan-path BM25 over the
    corpus-derived expansion, for random corpora and prefixes."""
    import uuid

    from document_vector_pipeline_spark.operators import retrieval
    from document_vector_pipeline_spark.store.text_index import TextIndex

    docs = _docs_df(spark, texts)
    base = tmp_path_factory.mktemp("pfx") / uuid.uuid4().hex
    idx = TextIndex(spark, str(base), n_term_buckets=4, n_doc_buckets=2)
    idx.build(docs)
    px = spark.createDataFrame([(0, prefix)], "query_id long, prefix string")
    got = sorted(map(tuple, idx.prefix_search(px, k=10).collect()))
    vocab = {w for t in texts for w in t.split()}
    exp_terms = sorted(w for w in vocab if w.startswith(prefix))
    if not exp_terms:
        assert got == []
        return
    exp = spark.createDataFrame([(0, w) for w in exp_terms],
                                "query_id long, term string")
    want = sorted(map(tuple, retrieval.bm25_topk(docs, exp, k=10).collect()))
    assert got == want
