"""Dedup operators: synthetic duplicates, invariants, and a cross-engine
hash spot-check against DuckDB (prefiguring the driver's oracle)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.operators import dedup as D
from document_vector_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),        # exact dup of 1
        (3, "The  quick brown fox   jumps over the lazy dog"),     # ws/case dup of 1
        (4, "the quick brown fox jumps over the lazy cat"),        # near-dup
        (5, "completely different content about spark engines"),
        (6, ""),                                                   # empty
        (7, "one"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark, corpus):
    groups = D.exact_dedup(corpus).collect()
    by_keep = {r.keep_id: r.n_dups for r in groups}
    assert by_keep[1] == 3          # docs 1,2,3 collapse
    assert by_keep[4] == 1
    surv = {r.doc_id for r in D.exact_dedup_survivors(corpus).collect()}
    assert surv == {1, 4, 5, 6, 7}


def test_minhash_lsh_finds_near_dup(spark, corpus):
    pairs = {(r.id_a, r.id_b) for r in
             D.minhash_lsh_pairs(corpus, num_perm=16, bands=8).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert (1, 4) in pairs                      # near-dup caught with 8 bands
    assert not any(5 in p for p in pairs)


def test_simhash_hamming(spark, corpus):
    sims = {r.doc_id: r.simhash for r in D.simhash(corpus).collect()}
    assert sims[1] == sims[2] == sims[3]        # identical canonical text
    assert sims[6] == 0
    assert 0 <= sims[1] < (1 << 60)
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             D.simhash_pairs(corpus, max_hamming=12).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0


def test_ngram_jaccard(spark, corpus):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             D.ngram_jaccard_pairs(corpus, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.3 <= pairs[(1, 4)] < 1.0           # one word differs
    assert not any(5 in p for p in pairs)


def test_embedding_neardup(spark):
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.99, 0.01, 0.0]),
            (3, [0.0, 1.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = D.embedding_neardup_pairs(emb, threshold=0.95).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]


def test_md5_hashing_matches_duckdb(spark, corpus):
    """The whole dedup family rests on md5_long being identical across
    engines — verify on real strings end to end."""
    got = (corpus.filter(F.col("text") != "")
           .select("doc_id", "text", D.md5_long(F.col("text")).alias("h"))
           .orderBy("doc_id").collect())
    assert got
    con = duckdb.connect()
    for r in got:
        expect = con.execute(
            "select cast(('0x' || substr(md5(?),1,15)) as bigint)", [r.text]
        ).fetchone()[0]
        assert r.h == expect, r.doc_id


def test_minhash_udf_equals_expression(spark):
    """The hashlib pandas-UDF signature path must be value-identical to the
    built-in HOF (oracle-facing) definition."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    udf = {r.doc_id: r.sig for r in
           D.minhash_signatures(docs, use_udf=True).collect()}
    expr = {r.doc_id: r.sig for r in
            D.minhash_signatures(docs, use_udf=False).collect()}
    assert udf == expr


def test_simhash_udf_equals_expression(spark):
    """The numpy pandas-UDF simhash path must be value-identical to the
    explode+votes (oracle-facing) definition, empty docs included."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    udf = {r.doc_id: r.simhash for r in
           D.simhash(docs, use_udf=True).collect()}
    expr = {r.doc_id: r.simhash for r in
            D.simhash(docs, use_udf=False).collect()}
    assert udf == expr and len(udf) > 0


def test_embedding_prefilter_equals_exact(spark):
    """The matmul-pruned near-dup path must return exactly the pure O(n²)
    JVM pairs (the 1e-4 slack cannot drop a true pair)."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    fast = {(r.id_a, r.id_b): r.cos for r in
            D.embedding_neardup_pairs(emb, threshold=0.35).collect()}
    slow = {(r.id_a, r.id_b): r.cos for r in
            D.embedding_neardup_pairs(emb, threshold=0.35,
                                      prefilter=False).collect()}
    assert fast == slow and len(fast) > 0


def test_embedding_lsh_pairs_subset_of_exact_and_verified(spark):
    """The banded path's output must be a SUBSET of the exact pair set
    (candidates can only MISS true pairs, never invent them — the
    exact verify guarantees every emitted cos is the true one), and at
    high cosine + enough tables it should find them all."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {(r.id_a, r.id_b): r.cos for r in
             D.embedding_neardup_pairs(emb, threshold=0.35).collect()}
    banded = {(r.id_a, r.id_b): r.cos for r in
              D.embedding_lsh_pairs(emb, threshold=0.35, planes=4,
                                    tables=16, dim=64).collect()}
    assert set(banded) <= set(exact)
    assert all(exact[p] == c for p, c in banded.items())
    assert len(banded) >= 0.8 * len(exact) > 0
    # a truly-identical pair collides in EVERY table — recall 1 at cos=1
    rows = [(1, [1.0, 2.0, 3.0, 4.0]), (2, [2.0, 4.0, 6.0, 8.0]),
            (3, [-1.0, 5.0, -2.0, 0.5])]
    tiny = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    got = D.embedding_lsh_pairs(tiny, threshold=0.99, planes=8,
                                tables=4, dim=4).collect()
    assert [(r.id_a, r.id_b, r.cos) for r in got] == [(1, 2, 1.0)]


def test_embedding_lsh_tuning_prefix_sigs_match_standalone(spark):
    """The tuning sweep derives each entry's band key as the first
    ``planes`` characters of ONE max-planes signature pass (round-13
    batch 8).  Plane p's hyperplane does not depend on the total plane
    count, so every sweep row must equal the standalone eval — which
    computes its own full signatures at that plane count — exactly."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    tun = {r["planes"]: r for r in
           D.embedding_lsh_tuning(emb, threshold=0.35,
                                  planes_list=(2, 4, 6),
                                  tables=8).collect()}
    assert set(tun) == {2, 4, 6}
    for p in (2, 4, 6):
        ev = D.embedding_lsh_eval(emb, threshold=0.35, planes=p,
                                  tables=8, dim=64).collect()[0]
        got = tun[p]
        assert (got["n_cand"], got["n_true"], got["n_hit"],
                got["precision_milli"], got["recall_milli"]) == \
               (ev["n_cand"], ev["n_true"], ev["n_hit"],
                ev["precision_milli"], ev["recall_milli"]), f"planes={p}"


def test_embedding_lsh_eval_metric_consistent(spark):
    """n_hit == the production path's emitted pair count; milli metrics
    are the exact integer ratios; empty corpus yields the typed zero
    row, not a crash."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    r = D.embedding_lsh_eval(emb, threshold=0.35, planes=4, tables=16,
                             dim=64).collect()[0]
    n_pairs = D.embedding_lsh_pairs(emb, threshold=0.35, planes=4,
                                    tables=16, dim=64).count()
    assert r.n_hit == n_pairs
    assert r.precision_milli == 1000 * r.n_hit // r.n_cand
    assert r.recall_milli == 1000 * r.n_hit // r.n_true
    empty = D.embedding_lsh_eval(emb.filter("vec_id < 0"), planes=2,
                                 tables=2, dim=64).collect()[0]
    assert tuple(empty) == (0, 0, 0, 0, 0)


def test_embedding_neardup_auto_dispatch(spark):
    """The measured strategy dispatch: under the flops budget the
    output IS the exact blocked pair set; above it, the banded path's
    (a verified subset)."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = sorted(map(tuple, D.embedding_neardup_pairs(
        emb, threshold=0.35).collect()))
    auto = sorted(map(tuple, D.embedding_neardup_auto(
        emb, threshold=0.35, planes=4, tables=16, dim=64).collect()))
    assert auto == exact and len(exact) > 0
    banded = sorted(map(tuple, D.embedding_lsh_pairs(
        emb, threshold=0.35, planes=4, tables=16, dim=64).collect()))
    forced = sorted(map(tuple, D.embedding_neardup_auto(
        emb, threshold=0.35, planes=4, tables=16, dim=64,
        blas_budget_rows=10).collect()))
    assert forced == banded


def test_lsh_auto_size_pins_the_production_rule():
    """Round-12 verdict item 2: the planes ≈ log₂(n/bucket) / Charikar
    tables rule is CODE, not prose — pin its values so the dispatch's
    defaults are auditable.  planes grows with n (constant expected
    bucket occupancy — the property that kills the bucket-density-
    quadratic blowup the round-11 decade measured at fixed planes);
    tables grows as the per-band survival probability p^planes
    shrinks."""
    import math

    # n = 50k, τ = 0.95 (the decade replica's regime)
    planes, tables = D.lsh_auto_size(50_000, 0.95)
    assert planes == math.ceil(math.log2(50_000 / 64)) == 10
    p_band = (1.0 - math.acos(0.95) / math.pi) ** 10
    assert tables == math.ceil(math.log(0.1) / math.log(1.0 - p_band)) == 6
    # n = 1e9: planes hits the cap, tables compensates
    planes_b, tables_b = D.lsh_auto_size(1_000_000_000, 0.95)
    assert planes_b == 24 and tables_b > tables
    # monotone in n; clamps hold at the extremes
    assert D.lsh_auto_size(100, 0.95)[0] == 4
    assert D.lsh_auto_size(10**15, 0.95) == (24, D.lsh_auto_size(
        10**15, 0.95)[1])
    assert 1 <= D.lsh_auto_size(10**15, 0.5)[1] <= 64


def test_lsh_auto_size_survives_pband_float_underflow():
    """Round-13 ADVICE fix: when p^planes underflows so that
    1.0 - p_band rounds to 1.0 (deep-negative thresholds at the plane
    cap), the denominator is computed via log1p and a 0.0 denominator
    clamps to max_tables instead of raising ZeroDivisionError."""
    planes, tables = D.lsh_auto_size(10**9, -0.9)
    assert planes == 24 and tables == 64
    # the boundary regime still behaves: very small but representable
    # p_band yields the max-tables clamp too, monotonically
    assert D.lsh_auto_size(10**9, -0.5)[1] == 64


def test_embedding_neardup_auto_autosizes_above_budget(spark):
    """Above the flops budget with planes/tables unset, the dispatch
    runs the banded path at lsh_auto_size's computed configuration
    (identical output to calling embedding_lsh_pairs at those values),
    and the result is a verified subset of the exact pair set."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    ap, at = D.lsh_auto_size(n, 0.35)
    auto = sorted(map(tuple, D.embedding_neardup_auto(
        emb, threshold=0.35, dim=64, blas_budget_rows=10,
        n_rows=n).collect()))
    pinned = sorted(map(tuple, D.embedding_lsh_pairs(
        emb, threshold=0.35, planes=ap, tables=at, dim=64).collect()))
    assert auto == pinned
    exact = set(map(tuple, D.embedding_neardup_pairs(
        emb, threshold=0.35).collect()))
    assert set(auto) <= exact


def test_neardup_dedup_keeps_min_id_per_cluster(spark):
    from document_vector_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        neardup_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [(1, base), (2, base + " tail"), (3, "completely different text "
                                                "about spark engines " * 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"])
             for r in minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs  # near-dups collide in >=1 band
    kept = {r["doc_id"] for r in neardup_dedup(df).collect()}
    assert kept == {1, 3}


def test_line_dedup_keeps_first_occurrence(spark):
    """C4-style sentence dedup on real sentences (the driver corpus has no
    dots, so the multi-sentence path is proven here + DuckDB cross-check)."""
    import duckdb
    import pandas as pd

    from document_vector_pipeline_spark.contract import _sql_dedup_lines
    from document_vector_pipeline_spark.operators.dedup import line_dedup

    rows = [
        (1, "the cat sat. common boilerplate sentence. unique one"),
        (2, "common boilerplate sentence. another thing entirely"),
        (3, "the cat sat. common boilerplate sentence."),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.doc_id, r.clean_text, r.n_units, r.n_kept)
           for r in line_dedup(df).collect()]
    assert got == [
        (1, "the cat sat. common boilerplate sentence. unique one", 3, 3),
        (2, "another thing entirely", 2, 1),
        (3, "", 2, 0),
        (4, "", 0, 0),
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = [tuple(r) for r in con.execute(_sql_dedup_lines()).fetchall()]
    assert got == exp


def test_bigram_lm_scores_hand_computed(spark):
    """c2(a,b)=3 c2(b,a)=1 c2(b,c)=1; c1(a)=3 c1(b)=2 →
    doc1 mean(1.0, 0.5, 1.0) = 0.833333, doc2 mean(1.0, 0.5) = 0.75."""
    from document_vector_pipeline_spark.operators.corpus import (
        bigram_lm_scores,
    )

    df = spark.createDataFrame([(1, "a b a b"), (2, "a b c")],
                               "doc_id long, text string")
    got = [(r.doc_id, r.n_bigrams, r.score)
           for r in bigram_lm_scores(df).collect()]
    assert got == [(1, 3, 0.833333), (2, 2, 0.75)]


def test_curate_flags_agree_with_standalone_operators(spark, docs_small):
    """The verdict table must restate exactly what the individual
    operators say — no drift between the dashboard and its sources."""
    from document_vector_pipeline_spark.operators import corpus as C
    from document_vector_pipeline_spark.operators.graph import (
        connected_components,
    )

    out = {r.doc_id: r for r in C.curate(docs_small).collect()}
    assert len(out) == docs_small.count()

    n_exact_losers = sum(1 for r in out.values() if r.exact_dup)
    n_groups = D.exact_dedup(docs_small).count()
    assert n_exact_losers == len(out) - n_groups

    comp = connected_components(D.minhash_lsh_pairs(docs_small))
    losers = {r.id for r in comp.collect() if r.id != r.component}
    assert {d for d, r in out.items() if r.near_dup} == losers

    fails = {r.doc_id for r in C.quality_filters(docs_small).collect()
             if not r.passes}
    assert {d for d, r in out.items() if r.low_quality} == fails

    for r in out.values():
        assert r.keep == (not (r.exact_dup or r.near_dup
                               or r.low_quality or r.repetitive))


def test_interleave_spreads_sources_evenly(spark, docs_small):
    """Fair-queueing property: every prefix of the training order holds
    each source roughly in proportion to its weight — sources must not
    front-load."""
    from document_vector_pipeline_spark.operators.corpus import (
        interleave_by_mixture,
    )

    rows = interleave_by_mixture(docs_small).collect()
    assert [r.pos for r in rows] == list(range(len(rows)))
    total = {}
    for r in rows:
        total[r.source] = total.get(r.source, 0) + 1
    half = rows[: len(rows) // 2]
    seen = {}
    for r in half:
        seen[r.source] = seen.get(r.source, 0) + 1
    for s, n in total.items():
        if n >= 10:
            frac = seen.get(s, 0) / n
            assert 0.3 < frac < 0.7, (s, frac)


def test_url_canonical_normalization(spark):
    from document_vector_pipeline_spark.operators.dedup import url_dedup

    rows = [
        (1, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&q=1#frag"),
        (2, "https://example.com/a/b?q=1"),
        (3, "http://example.com:80/a/b?z=2&a=1"),
        (4, "http://example.com/a/b?a=1&z=2&fbclid=abc"),
        (5, "https://example.com"),
        (6, "https://example.com:8080/a"),  # non-default port survives
    ]
    out = {r["doc_id"]: r for r in
           url_dedup(spark.createDataFrame(rows, "doc_id int, url string"))
           .collect()}
    assert out[1]["canon_url"] == "https://example.com/a/b?q=1"
    assert out[1]["keep"] and not out[2]["keep"]
    assert out[3]["canon_url"] == "http://example.com/a/b?a=1&z=2"
    assert out[3]["keep"] and not out[4]["keep"]
    assert out[5]["canon_url"] == "https://example.com"
    assert out[6]["canon_url"] == "https://example.com:8080/a"
    assert out[6]["n_group"] == 1


def test_minhash_eval_counts_consistent(spark, docs_small):
    from document_vector_pipeline_spark.operators.dedup import minhash_eval

    row = minhash_eval(docs_small.limit(150), threshold=0.1).collect()[0]
    assert row["n_hit"] <= min(row["n_pred"], row["n_true"])
    if row["n_pred"]:
        assert row["precision_milli"] == 1000 * row["n_hit"] // row["n_pred"]
    if row["n_true"]:
        assert row["recall_milli"] == 1000 * row["n_hit"] // row["n_true"]
        # LSH candidates should catch most true near-dup pairs
        assert row["recall_milli"] >= 500


def test_weighted_sample_respects_weights(spark, docs_small):
    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.operators.corpus import (
        weighted_sample,
    )

    zero = weighted_sample(docs_small, F.lit(0)).filter("keep").count()
    full = weighted_sample(docs_small, F.lit(1_000_000))
    assert zero == 0
    assert full.filter("keep").count() == docs_small.count()
    # idempotent: same salt, same draws
    half = weighted_sample(docs_small, F.lit(500_000))
    a = {r["doc_id"] for r in half.filter("keep").collect()}
    b = {r["doc_id"] for r in half.filter("keep").collect()}
    assert a == b
    n = docs_small.count()
    assert 0.35 * n < len(a) < 0.65 * n  # md5 draws ~uniform


def test_shingle_df_histogram_hand_computed(spark):
    from document_vector_pipeline_spark.operators.dedup import (
        shingle_df_histogram,
    )

    # identical docs 1-3 share all shingles (df=3 -> bucket 2);
    # doc 4 is unique (df=1 -> bucket 1)
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "a b c d"),
            (4, "x y z w")]
    out = {r["bucket"]: r for r in
           shingle_df_histogram(
               spark.createDataFrame(rows, "doc_id int, text string"))
           .collect()}
    assert out[1]["n_shingles"] == 2 and out[1]["max_df"] == 1
    assert out[2]["n_shingles"] == 2 and out[2]["min_df"] == 3


def test_substring_dup_stats_flags_verbatim_reuse(spark):
    from document_vector_pipeline_spark.operators.dedup import (
        substring_dup_stats,
    )

    shared = "x" * 30 + "the same long verbatim span " + "y" * 30
    rows = [
        (1, "AAA " + shared),
        (2, "BBB " + shared + " tail"),
        (3, "totally different content here " + "z" * 60),
    ]
    out = {r["doc_id"]: r for r in
           substring_dup_stats(
               spark.createDataFrame(rows, "doc_id int, text string"),
               width=50).collect()}
    assert out[1]["n_dup_windows"] > 0
    assert out[2]["n_dup_windows"] > 0
    assert out[3]["n_dup_windows"] == 0
    # a strided pass never reports MORE duplicated windows than exact
    strided = {r["doc_id"]: r for r in
               substring_dup_stats(
                   spark.createDataFrame(rows, "doc_id int, text string"),
                   width=50, stride=4).collect()}
    for i in (1, 2, 3):
        assert strided[i]["n_windows"] <= out[i]["n_windows"]


def test_pair_generator_caches_are_bounded(spark):
    """Repeated pair-generator invocations must not accumulate persisted
    signature frames: each call releases the previous invocation's cache
    (bench sweeps / long sessions would otherwise leak one block-set per
    call), and release_caches() drains everything."""
    from document_vector_pipeline_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} alpha beta gamma") for i in range(40)],
        "doc_id long, text string")
    jsc = spark.sparkContext._jsc.sc()
    base = len(list(jsc.getRDDStorageInfo()))
    for _ in range(3):
        D.minhash_lsh_pairs(docs).count()
        D.simhash_pairs(docs).count()
    assert len(list(jsc.getRDDStorageInfo())) <= base + 2
    D.release_caches()
    assert len(list(jsc.getRDDStorageInfo())) <= base


def test_ngram_jaccard_strategies_are_equivalent(spark):
    """The count-based and PPJoin exact plans must return identical pair
    sets at any threshold (they are the same mathematical definition)."""
    from document_vector_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for th in (0.1, 0.5):
        a = sorted(tuple(r) for r in
                   ngram_jaccard_pairs(docs, threshold=th,
                                       strategy="count").collect())
        b = sorted(tuple(r) for r in
                   ngram_jaccard_pairs(docs, threshold=th,
                                       strategy="ppjoin").collect())
        assert a == b and len(a) > 0


def test_containment_catches_subsumed_doc(spark):
    from document_vector_pipeline_spark.operators.dedup import (
        containment_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " plus a lot of extra unrelated words " * 5
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally different text body here now")],
        "doc_id long, text string")
    out = {(r["id_sub"], r["id_super"]): r["containment"]
           for r in containment_pairs(docs, threshold=0.8).collect()}
    assert (1, 2) in out and out[(1, 2)] == 1.0  # fully contained
    assert (2, 1) not in out                      # asymmetric
    assert not any(3 in k for k in out)


def test_dedup_summary_counts(spark):
    from document_vector_pipeline_spark.operators.dedup import dedup_summary

    same = "repeated body of text that is exactly the same every time"
    rows = [(1, "s1", same), (2, "s1", same),          # exact dups
            (3, "s1", "unique text one two three four five six seven"),
            (4, "s2", same)]                            # cross-source dup
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")
    out = {r["source"]: r for r in dedup_summary(docs).collect()}
    assert out["s1"]["n_docs"] == 3
    assert out["s1"]["exact_dup_docs"] == 2     # docs 1,2
    assert out["s2"]["exact_dup_docs"] == 1     # doc 4 (corpus-wide group)
    assert out["s1"]["exact_ppm"] == 666_666
    assert out["s1"]["near_dup_docs"] >= 2      # exact dups are near dups


def test_lsh_tuning_monotone_recall(spark, docs_small):
    """More bands => looser collision threshold => recall must be
    non-decreasing; n_true identical across rows."""
    from document_vector_pipeline_spark.operators import dedup as D
    rows = (D.lsh_tuning(docs_small, bands_list=(2, 4, 8), threshold=0.1)
            .orderBy("bands").collect())
    assert [r.bands for r in rows] == [2, 4, 8]
    assert len({r.n_true for r in rows}) == 1
    recalls = [r.recall_milli for r in rows]
    assert recalls == sorted(recalls)
    assert all(r.n_hit <= min(r.n_pred, r.n_true) for r in rows)


def test_similar_docs_topk_properties(spark, docs_small):
    """Symmetry of scoring, rank bounds, and agreement with the exact
    Jaccard on a spot-checked pair."""
    from document_vector_pipeline_spark.operators import dedup as D
    out = D.similar_docs_topk(docs_small, k=3).collect()
    assert out
    per = {}
    for r in out:
        assert 1 <= r.rank <= 3 and 0 <= r.jacc_milli <= 1000
        per.setdefault(r.doc_id, []).append((r.rank, r.jacc_milli, r.nbr_id))
    for rows in per.values():
        rows.sort()
        scores = [s for _, s, _ in rows]
        assert scores == sorted(scores, reverse=True)
    # symmetric pair scores agree when both directions survive the cut
    score = {(r.doc_id, r.nbr_id): r.jacc_milli for r in out}
    for (a, b), s in score.items():
        if (b, a) in score:
            assert score[(b, a)] == s


def test_incremental_dedup_admission_verdicts(spark):
    """Hand-checked batch-vs-corpus admission: exact dup (identical
    canonical text, min corpus id), near dup (band candidate verified
    by exact Jaccard >= tau, max-jacc/min-id pick), fresh doc kept;
    the corpus is never self-joined (corpus dups don't appear)."""
    from document_vector_pipeline_spark.operators.dedup import (
        incremental_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(10, base),
         (11, base),                       # corpus-internal dup: ignored
         (12, "completely different corpus material about spark plans"),
         (13, "short text")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, "  THE  quick brown fox jumps over the lazy dog again and again  "),
         (101, base + " with a small fresh tail"),
         (102, "entirely novel crawl document nothing shared here at all")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           incremental_dedup(corpus, batch,
                             threshold_milli=400).collect()}
    # 100: canonical text == base -> exact dup of min(10, 11) = 10
    assert got[100]["exact_dup"] == 10 and got[100]["keep"] is False
    # exact dups are also near dups (jacc 1000) via the band join
    assert got[100]["near_dup"] == 10 and got[100]["jacc_milli"] == 1000
    # 101: no exact, near dup of 10 (min id among the 10/11 tie)
    assert got[101]["exact_dup"] == -1
    assert got[101]["near_dup"] == 10
    assert 400 <= got[101]["jacc_milli"] < 1000
    # 102: fresh
    assert got[102]["exact_dup"] == -1 and got[102]["near_dup"] == -1
    assert got[102]["jacc_milli"] == 0 and got[102]["keep"] is True
    assert len(got) == 3                  # one verdict row per batch doc


def test_incremental_dedup_eval_metric(spark):
    """The gate's acceptance metric: candidates that are true near-dups
    count as hits; truth the bands miss lowers recall; precision/recall
    are exact integer milli-units."""
    from document_vector_pipeline_spark.operators.dedup import (
        incremental_dedup_eval,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(10, base), (11, "totally unrelated corpus text here")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, base + " tail"),                       # true near-dup
         (101, "nothing in common with anything")],   # fresh
        "doc_id long, text string")
    r = incremental_dedup_eval(corpus, batch,
                               threshold_milli=400).collect()[0]
    assert r["n_true"] == 1 and r["n_hit"] >= 0
    assert r["n_hit"] <= min(r["n_cand"], r["n_true"])
    if r["n_cand"]:
        assert r["precision_milli"] == 1000 * r["n_hit"] // r["n_cand"]
    assert r["recall_milli"] == 1000 * r["n_hit"] // max(r["n_true"], 1)


def test_incremental_dedup_artifacts_equals_direct(spark, docs_small):
    """The persisted-sidecar admission path (dedup_artifacts →
    incremental_dedup_artifacts, round-trip through parquet) returns
    verdicts bit-identical to the derive-from-text incremental_dedup —
    the artifacts ARE those expressions, materialized."""
    import tempfile

    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.operators.dedup import (
        dedup_artifacts,
        incremental_dedup,
        incremental_dedup_artifacts,
    )

    corpus = docs_small.filter(F.col("doc_id") % 9 != 0)
    batch = (docs_small.filter(F.col("doc_id") % 9 == 0)
             .select("doc_id", "text"))
    want = sorted(map(tuple,
                      incremental_dedup(corpus, batch,
                                        threshold_milli=500).collect()))
    with tempfile.TemporaryDirectory() as d:
        dedup_artifacts(corpus).write.mode("overwrite").parquet(d + "/art")
        art = spark.read.parquet(d + "/art")
        got = sorted(map(tuple,
                         incremental_dedup_artifacts(
                             art, batch, threshold_milli=500).collect()))
    assert got == want and got
