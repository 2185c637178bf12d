"""Round-3 operators: SemDeDup, hard negatives, token budget, trigrams,
BPE pairs — unit semantics + UDF/expression twin equivalence."""

import pytest
from pyspark.sql import functions as F


def test_semantic_dedup_removes_within_cluster_dups(spark):
    from document_vector_pipeline_spark.operators.dedup import semantic_dedup

    # two exact duplicate groups + singletons; 1 cluster => pure cosine dedup
    v1 = [1.0, 0.0, 0.0, 0.0]
    v2 = [0.0, 1.0, 0.0, 0.0]
    v3 = [0.0, 0.0, 1.0, 0.0]
    rows = [(1, v1), (2, v1), (3, v2), (4, v2), (5, v3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(emb, n_clusters=1, iters=1, dim=4,
                          threshold=0.99).collect()}
    assert len(out) == 5
    assert out[1]["kept"] and not out[2]["kept"]   # min id survives
    assert out[3]["kept"] and not out[4]["kept"]
    assert out[5]["kept"]


def test_semantic_dedup_twins_equal(spark):
    from document_vector_pipeline_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(tuple(r) for r in
               semantic_dedup(emb, threshold=0.35).collect())
    b = sorted(tuple(r) for r in
               semantic_dedup(emb, threshold=0.35, use_udf=False).collect())
    assert a == b and len(a) > 0


def test_kmeans_twins_equal(spark):
    from document_vector_pipeline_spark.operators.similarity import (
        kmeans_fixed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = [tuple(r) for r in kmeans_fixed(emb, n_clusters=4, iters=2).collect()]
    b = [tuple(r) for r in kmeans_fixed(emb, n_clusters=4, iters=2,
                                        use_udf=False).collect()]
    assert a == b and len(a) == 4 * 64


def test_hard_negatives_band_and_self_exclusion(spark):
    from document_vector_pipeline_spark.operators.similarity import (
        hard_negatives,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    got = hard_negatives(emb, q, k=5, lo=0.05, hi=0.5).collect()
    assert got, "expected some in-band negatives"
    for r in got:
        assert r["vec_id"] != r["query_id"]
        assert 0.05 <= r["score"] < 0.5
        assert 1 <= r["rank"] <= 5


def test_token_budget_select_greedy_cut(spark):
    from document_vector_pipeline_spark.operators.corpus import (
        token_budget_select,
    )

    rows = [(i, "s", 400) for i in range(10)]   # 100 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "n_chars int")
    out = token_budget_select(docs, budget_tokens=350).collect()
    kept = [r for r in out if r["kept"]]
    assert len(kept) == 3                       # 3 × 100 ≤ 350 < 4 × 100
    assert all(r["tokens"] == 100 for r in out)
    # cumulative sums are a permutation-prefix: max cum = total tokens
    assert max(r["cum_tokens"] for r in out) == 1000


def test_event_trigrams_counts(spark):
    from document_vector_pipeline_spark.plans.analytics import event_trigrams

    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),
            (2, 5, "a"), (2, 6, "b"), (2, 7, "c")]
    ev = (spark.createDataFrame(rows, "user_id long, event_id long, "
                                      "event_type string")
          .withColumn("ts", F.timestamp_seconds(F.col("event_id") * 60)))
    got = {(r["t1"], r["t2"], r["t3"]): r["n"]
           for r in event_trigrams(ev).collect()}
    assert got[("a", "b", "c")] == 2
    assert got[("b", "c", "a")] == 1
    assert len(got) == 2


def test_bpe_pair_counts(spark):
    from document_vector_pipeline_spark.operators.textstats import (
        bpe_pair_counts,
    )

    docs = spark.createDataFrame([(1, "aaab AB x")],
                                 "doc_id long, text string")
    got = {r["pair"]: r["n"] for r in bpe_pair_counts(docs).collect()}
    # "aaab" -> aa, aa, ab; "ab" (lowered) -> ab; "x" too short
    assert got == {"aa": 2, "ab": 2}


def test_phash_pairs_find_byte_level_neardups(spark):
    from document_vector_pipeline_spark.operators import multimodal as M

    base = ("the quick brown fox jumps over the lazy dog and then "
            "keeps on running through the quiet field " * 4)
    rows = [(1, base), (2, base + "!"),          # near-identical bytes
            (3, "zzzzzzzz 0123456789 ~~~ ||| @@@ ### $$$ %%% ^^^ &&&")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")).withColumn(
        "source", F.lit("s")).withColumn("n_chars", F.length("text"))
    assets = M.documents_as_assets(docs)
    pairs = {(r["id_a"], r["id_b"]) for r in
             M.phash_pairs(assets, max_hamming=2).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # hash of every asset exists, even empty payloads
    n = M.phash(assets).count()
    assert n == 3


def test_embedding_outliers_flags_far_points(spark):
    from document_vector_pipeline_spark.operators.similarity import (
        embedding_outliers,
    )

    # 19 tight points + 1 far point in one cluster
    rows = [(i, [1.0 + 0.001 * i, 0.0, 0.0, 0.0]) for i in range(19)]
    rows.append((99, [50.0, 50.0, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           embedding_outliers(emb, n_clusters=1, iters=1, dim=4,
                              pct=90).collect()}
    assert out[99]["outlier"]
    n_out = sum(1 for r in out.values() if r["outlier"])
    assert n_out == 2  # ceil(10% of 20)
    # twins equal
    a = sorted(tuple(r) for r in
               embedding_outliers(emb, n_clusters=2, iters=2, dim=4).collect())
    b = sorted(tuple(r) for r in
               embedding_outliers(emb, n_clusters=2, iters=2, dim=4,
                                  use_udf=False).collect())
    assert a == b


def test_asof_nearest_picks_closer_side(spark):
    from document_vector_pipeline_spark.plans.temporal import asof_nearest

    def ts(s):
        return F.timestamp_seconds(F.lit(s))

    left = spark.range(1).select(
        F.lit(1).alias("user_id"), ts(100).alias("ts"),
        F.lit(10).alias("event_id"))
    right = spark.createDataFrame(
        [(1, 90, 1), (1, 104, 2), (1, 200, 3)],
        "user_id int, sec int, event_id int"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"), "event_id")
    out = asof_nearest(left, right, key="user_id",
                       right_cols=["event_id"],
                       right_seq="event_id").collect()
    assert len(out) == 1 and out[0]["r_event_id"] == 2  # |+4| < |-10|

    # exact tie prefers the earlier (backward) row
    right2 = spark.createDataFrame(
        [(1, 95, 1), (1, 105, 2)],
        "user_id int, sec int, event_id int"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"), "event_id")
    out = asof_nearest(left, right2, key="user_id",
                       right_cols=["event_id"],
                       right_seq="event_id").collect()
    assert out[0]["r_event_id"] == 1

    # no right rows for the key -> nulls survive (left join semantics)
    left2 = spark.range(1).select(
        F.lit(7).alias("user_id"), ts(50).alias("ts"),
        F.lit(11).alias("event_id"))
    out = asof_nearest(left2, right, key="user_id",
                       right_cols=["event_id"],
                       right_seq="event_id").collect()
    assert out[0]["r_event_id"] is None


def test_quality_model_scores_deterministic_and_map_only(spark):
    from document_vector_pipeline_spark.operators.corpus import (
        quality_model_scores,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "gamma")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_model_scores(docs).collect()}
    assert out[1]["n_feats"] == 2          # distinct tokens
    assert out[2]["n_feats"] == 0 and out[2]["logit_milli"] == 0
    assert out[1]["keep"] == (out[1]["logit_milli"] > 0)
    # repeated run identical (no RNG anywhere)
    again = {r["doc_id"]: r for r in quality_model_scores(docs).collect()}
    assert {k: tuple(v) for k, v in out.items()} == \
           {k: tuple(v) for k, v in again.items()}
    plan = quality_model_scores(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_multitouch_credit_conserved(spark):
    from document_vector_pipeline_spark.plans.analytics import (
        multitouch_attribution,
    )

    rows = [
        # user 1: purchase at 1000s with 3 clicks inside 30 min
        (1, 1, "click", 100), (2, 1, "click", 500), (3, 1, "click", 900),
        (4, 1, "purchase", 1000),
        # user 2: purchase with no clicks
        (5, 2, "purchase", 2000),
        # user 3: 1 click -> full credit
        (6, 3, "click", 2900), (7, 3, "purchase", 3000),
    ]
    ev = (spark.createDataFrame(rows, "event_id long, user_id long, "
                                      "event_type string, sec long")
          .select("event_id", "user_id", "event_type",
                  F.timestamp_seconds("sec").alias("ts")))
    out = {r["click_id"]: r for r in multitouch_attribution(ev).collect()}
    # 2 matched purchases x 1000 milli-credits, conserved exactly
    assert sum(r["credit_milli"] for r in out.values()) == 2000
    assert out[6]["credit_milli"] == 1000
    # remainder (1000 - 3*333 = 1) goes to the earliest click
    assert out[1]["credit_milli"] == 334
    assert out[2]["credit_milli"] == 333 and out[3]["credit_milli"] == 333


def test_cohort_ltv_cumulative_monotone(spark):
    from document_vector_pipeline_spark.plans.analytics import cohort_ltv

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = cohort_ltv(ev).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r["age_weeks"])
        cums = [r["cum_value"] for r in rs]
        assert cums == sorted(cums)  # cumulative is monotone
        assert abs(cums[-1] - sum(r["value"] for r in rs)) < 1e-9


def test_scd2_build_intervals(spark):
    from document_vector_pipeline_spark.plans.temporal import scd2_build

    rows = [(1, 1, "a", 10), (1, 2, "a", 20), (1, 3, "b", 30),
            (1, 4, "a", 40), (2, 5, "c", 15)]
    ev = (spark.createDataFrame(rows, "user_id long, event_id long, "
                                      "event_type string, sec long")
          .select("user_id", "event_id", "event_type",
                  F.timestamp_seconds("sec").alias("ts")))
    out = sorted(
        scd2_build(ev, key="user_id", state="event_type",
                   seq="event_id").collect(),
        key=lambda r: (r["user_id"], r["version"]))
    u1 = [r for r in out if r["user_id"] == 1]
    assert [r["event_type"] for r in u1] == ["a", "b", "a"]  # collapsed
    assert [r["version"] for r in u1] == [1, 2, 3]
    assert u1[0]["valid_to"] == u1[1]["valid_from"]  # half-open chain
    assert u1[2]["valid_to"] is None and u1[2]["is_current"]
    assert not u1[0]["is_current"]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]


def test_seasonal_baseline_mae_exact(spark):
    from document_vector_pipeline_spark.plans.analytics import (
        seasonal_baseline_mae,
    )

    # train: two events at value 1.00 and 3.00 in the same hour cell ->
    # cell mean 200 cents; test (day 22+): value 5.00 -> |500-200| = 300
    rows = [("a", 0, 1.0), ("a", 3600, 3.0),
            ("a", 23 * 86400, 5.0), ("a", 23 * 86400 + 60, 2.0)]
    ev = (spark.createDataFrame(rows, "event_type string, sec long, "
                                      "value double")
          .select("event_type", F.timestamp_seconds("sec").alias("ts"),
                  "value"))
    out = {r["event_type"]: r for r in seasonal_baseline_mae(ev).collect()}
    a = out["a"]
    assert a["n_train"] == 2 and a["n_test"] == 2
    # both test rows hit the global fallback or a cell; MAE is an exact
    # integer floor of cent distances
    assert isinstance(a["mae_cents"], int) and a["mae_cents"] >= 0


def test_customer_rfm_tiles_are_balanced(spark):
    from document_vector_pipeline_spark.plans.analytics import customer_rfm

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    rows = customer_rfm(orders).collect()
    n = sum(r["n_customers"] for r in rows)
    # each score dimension partitions all customers into 5 tiles whose
    # sizes differ by at most 1
    for dim in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            per[r[dim]] = per.get(r[dim], 0) + r["n_customers"]
        assert set(per) == {1, 2, 3, 4, 5}
        assert max(per.values()) - min(per.values()) <= 1
        assert sum(per.values()) == n


def test_lm_buckets_tertiles_ordered_by_score(spark, docs_small):
    from document_vector_pipeline_spark.operators import corpus as C
    rows = C.lm_buckets(docs_small).collect()
    n = len(rows)
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.score)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # tertile sizes differ by at most 1
    sizes = sorted(len(v) for v in by_bucket.values())
    assert sizes[-1] - sizes[0] <= 1 and sum(sizes) == n
    # every head score >= every tail score
    assert min(by_bucket["head"]) >= max(by_bucket["tail"])


def test_write_shards_one_file_per_shard_and_order(spark, docs_small,
                                                   tmp_path):
    from document_vector_pipeline_spark.operators import corpus as C
    path = str(tmp_path / "shards")
    manifest = {r.shard: r for r in
                C.write_shards(docs_small, path, shard_size=16).collect()}
    back = spark.read.parquet(path)
    files = (back.select("shard", F.input_file_name().alias("f"))
             .distinct()
             .groupBy("shard").agg(F.count("*").alias("nf"))
             .collect())
    assert all(r.nf == 1 for r in files)
    assert len(files) == len(manifest)
    # in-shard rows are contiguous pos ranges in training order
    rows = back.select("shard", "pos").collect()
    per = {}
    for r in rows:
        per.setdefault(r.shard, []).append(r.pos)
    all_pos = sorted(p for v in per.values() for p in v)
    assert all_pos == list(range(len(all_pos)))
    for shard, ps in per.items():
        ps.sort()
        assert ps == list(range(min(ps), max(ps) + 1))
    assert sum(r.n_docs for r in manifest.values()) == len(all_pos)


def test_lang_mix_shares_sum_per_source(spark, docs_small):
    from document_vector_pipeline_spark.operators import corpus as C
    rows = C.lang_mix(docs_small).collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append(r)
    for source, rs in per.items():
        total = sum(r.n_docs for r in rs)
        # floor-division ppm shares sum to <= 1e6, within n_langs of it
        ppm = sum(r.share_ppm for r in rs)
        assert 1_000_000 - len(rs) < ppm <= 1_000_000
        for r in rs:
            assert r.share_ppm == (1_000_000 * r.n_docs) // total


def test_dsir_weights_prefers_target_like_docs(spark):
    """Docs made of target-distribution features must out-rank docs of
    raw-only features; weights are deterministic integers."""
    from pyspark.sql import functions as F

    from document_vector_pipeline_spark.operators import corpus

    rows = ([(i, "alpha beta alpha beta", "en") for i in range(10)]
            + [(100 + i, "gamma delta gamma delta", "xx")
               for i in range(10)]
            + [(200, "alpha beta alpha", "xx"),     # target-LIKE text
               (201, "gamma delta gamma", "en")])   # raw-like text in en
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = corpus.dsir_weights(d, F.col("lang") == "en", m=64, k=30)
    ranks = {r["doc_id"]: r["rank"] for r in out.collect()}
    # the target-like xx doc ranks above the raw-like en doc: weights
    # follow FEATURES, not the label
    assert ranks[200] < ranks[201]
    # all alpha/beta docs outrank all gamma/delta docs
    ab = [ranks[i] for i in range(10)] + [ranks[200]]
    gd = [ranks[100 + i] for i in range(10)] + [ranks[201]]
    assert max(ab) < min(gd)
