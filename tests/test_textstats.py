"""Text analysis: hand-computed expectations + real-table sanity."""

import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.operators.textstats import (
    analyze_documents,
    document_fingerprints,
)


def test_counts_on_known_text(spark):
    df = spark.createDataFrame(
        [(1, "The cat, the dog; and 42 birds!")], "doc_id long, text string")
    r = analyze_documents(df).first()
    assert r.n_chars == 31
    assert r.ws_tokens == 7
    assert r.punct_chars == 3          # , ; !
    assert r.alpha_chars == 20         # Thecatthedogandbirds
    assert r.en_stopwords == 3         # 'The'->the, 'the', 'and'
    assert r.lang_guess == "en"


def test_quality_bounds_on_real_docs(spark, docs_small):
    stats = analyze_documents(docs_small)
    bad = stats.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0
    assert stats.count() == docs_small.count()


def test_langid_all_langs(spark):
    rows = [
        (1, "the cat and the dog is in a house"),
        (2, "el gato y la casa es de un perro"),
        (3, "le chat est une maison et le chien"),
        (4, "der hund und die katze ist ein haus"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lang_guess for r in analyze_documents(df).collect()}
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de"}


def test_fingerprints_detect_shared_window(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h X Y"),   # shares the first 8-token window
        (3, "p q r s t u v w x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = document_fingerprints(df, window=8)
    shared = (fp.alias("l").join(fp.alias("r"), "fingerprint")
              .filter("l.doc_id < r.doc_id")
              .select("l.doc_id", "r.doc_id").distinct().collect())
    assert [(r[0], r[1]) for r in shared] == [(1, 2)]


def test_en_stopword_count_exact(spark):
    df = spark.createDataFrame([(1, "the cat and the hat")],
                               "doc_id long, text string")
    assert analyze_documents(df).first().en_stopwords == 3


def test_readability_hand_computed(spark):
    from document_vector_pipeline_spark.operators.textstats import readability

    rows = [
        (1, "The cat sat. The dog ran!"),   # c=18, w=6, s=2
        (2, ""),                             # empty: all zero
        (3, "word " * 10),                   # no punctuation: s floors to 1
    ]
    out = {r["doc_id"]: r for r in
           readability(spark.createDataFrame(rows, "doc_id int, text string"))
           .collect()}
    r1 = out[1]
    assert (r1["n_chars"], r1["n_words"], r1["n_sents"]) == (18, 6, 2)
    expected = max(0, 4710 * 18 * 2 + 500 * 6 * 6 - 21430 * 6 * 2) // (6 * 2)
    assert r1["ari_milli"] == expected
    assert out[2]["n_words"] == 0 and out[2]["ari_milli"] == 0
    assert out[3]["n_sents"] == 1


def test_vocab_coverage_hand_computed(spark):
    from document_vector_pipeline_spark.operators.textstats import (
        vocab_coverage,
    )

    # 10 tokens total: a×5, b×3, c×1, d×1
    docs = spark.createDataFrame(
        [(1, "a a a a a b b"), (2, "b c d")], "doc_id int, text string")
    out = {r["coverage_ppm"]: r["n_terms"]
           for r in vocab_coverage(docs).collect()}
    # 50%: 'a' alone covers 5/10 -> 1 term; 90%: a+b = 8/10 < 9 -> need c
    # (alphabetical tie-break) -> 3 terms; 99%: all 4 terms
    assert out[500_000] == 1
    assert out[900_000] == 3
    assert out[990_000] == 4
