"""Unit tests for quality_filters, top_bigrams, windowed_top_users and the
filtered vector search."""

from pyspark.sql import functions as F

from document_vector_pipeline_spark.operators import corpus, textstats
from document_vector_pipeline_spark.streaming import events as sev

SF = "/root/testdata/sf0.001"


def test_quality_filters_hand_computed(spark):
    rows = [
        (1, "the cat sat on the mat and it is that for sure ok " * 3),
        (2, "x"),                       # 1 word -> fails min_words
        (3, "1234 5678 " * 30),         # no stopwords -> fails stop_hits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           corpus.quality_filters(df, min_words=10).collect()}
    assert out[1]["passes"] is True
    assert out[2]["n_words"] == 1 and out[2]["passes"] is False
    assert out[3]["stop_hits"] == 0 and out[3]["passes"] is False
    assert out[3]["digit_ratio"] > 0.5


def test_quality_filters_map_only(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = corpus.quality_filters(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    # the battery itself must not shuffle (the orderBy at the end is the
    # only exchange allowed)
    assert plan.count("Exchange") <= 1


def test_top_bigrams_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")], "doc_id long, text string")
    rows = textstats.top_bigrams(df, topk=2).collect()
    assert (rows[0]["bigram"], rows[0]["tf"], rows[0]["df"]) == ("a b", 3, 2)


def test_windowed_top_users_rank_bound(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = sev.windowed_top_users(ev, n=3)
    assert out.filter(F.col("rank") > 3).count() == 0
    # exactly one rank-1 row per emitted window
    r1 = out.filter(F.col("rank") == 1).groupBy("window_start").count()
    assert r1.filter(F.col("count") != 1).count() == 0


def test_filtered_search_matches_full_rank(spark, tmp_path):
    from document_vector_pipeline_spark.contract import (
        QVEC, _doc_url, _store_chunks)
    from document_vector_pipeline_spark.store.vector_store import VectorStore

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    store = VectorStore(spark, str(tmp_path / "store"))
    store.upsert(_store_chunks(docs))
    url = "mem://docs/9.txt"
    got = store.search(QVEC, k=5, document_url=url).collect()
    assert [r["document_url"] for r in got] == [url]
    # same row the unfiltered ranking produces for that document
    full = {r["document_url"]: r["score"]
            for r in store.search(QVEC, k=10_000).collect()}
    assert got[0]["score"] == full[url]


def test_boilerplate_stats_flags_shared_lines(spark):
    from document_vector_pipeline_spark.operators.corpus import (
        boilerplate_stats,
    )

    rows = [
        (1, "unique one\nShared Footer"),
        (2, "unique two\nShared Footer"),
        (3, "unique three\nShared Footer"),
        (4, "all unique here"),
    ]
    out = {r["doc_id"]: r for r in
           boilerplate_stats(
               spark.createDataFrame(rows, "doc_id int, text string"),
               min_df=3).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_boiler"] == 1
    assert out[1]["boiler_ppm"] == 500_000
    assert out[4]["n_boiler"] == 0 and out[4]["boiler_ppm"] == 0


def test_source_vocab_similarity_hand_computed(spark):
    from document_vector_pipeline_spark.operators.corpus import (
        source_vocab_similarity,
    )

    rows = [
        (1, "s1", "a b c"),
        (2, "s1", "c d"),        # V(s1) = {a,b,c,d}
        (3, "s2", "c d e"),      # V(s2) = {c,d,e}
        (4, "s3", "x y"),        # V(s3) disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = {(r["source_a"], r["source_b"]): r
           for r in source_vocab_similarity(docs).collect()}
    r = out[("s1", "s2")]
    assert r["n_shared"] == 2                       # {c,d}
    assert r["jaccard_ppm"] == 1_000_000 * 2 // 5   # |union| = 5
    assert ("s1", "s3") not in out                  # zero overlap: no row


def test_novelty_scores_first_doc_is_fully_novel(spark):
    from document_vector_pipeline_spark.operators.corpus import (
        novelty_scores,
    )

    rows = [
        (1, "a b c d e"),
        (2, "a b c d e"),          # exact re-crawl of doc 1: 0 novelty
        (3, "x y z w v"),          # all-new content: full novelty
        (4, "a b c x y z extra"),  # mixed: shares earlier shingles
    ]
    out = {r["doc_id"]: r for r in
           novelty_scores(
               spark.createDataFrame(rows, "doc_id int, text string"),
               width=3).collect()}
    assert out[1]["novelty_ppm"] == 1_000_000
    assert out[2]["novelty_ppm"] == 0
    assert out[3]["novelty_ppm"] == 1_000_000
    assert 0 < out[4]["novelty_ppm"] < 1_000_000
