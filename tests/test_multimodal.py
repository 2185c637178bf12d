"""Multimodal plumbing: schema shape, determinism, frame sampling."""

from pyspark.sql import functions as F

from document_vector_pipeline_spark.operators.multimodal import (
    decode_assets,
    documents_as_assets,
    extract_features,
    sample_frames,
)


def test_decode_schema_and_determinism(spark, docs_small):
    assets = documents_as_assets(docs_small.limit(30))
    d1 = decode_assets(assets).orderBy("asset_id").collect()
    d2 = decode_assets(assets).orderBy("asset_id").collect()
    assert d1 == d2                       # deterministic fake decode
    kinds = {r.kind for r in d1}
    assert kinds == {"image", "audio", "video"}
    for r in d1:
        if r.kind == "image":
            assert r.width > 0 and r.height > 0 and r.n_frames == 1
        if r.kind == "audio":
            assert r.duration_s > 0 and r.width == 0
        if r.kind == "video":
            assert r.n_frames > 0 and r.duration_s > 0
        assert len(r.content_hash) == 32


def test_features_unit_norm(spark, docs_small):
    assets = documents_as_assets(docs_small.limit(20))
    feats = extract_features(assets).collect()
    assert all(len(r.feature) == 16 for r in feats)
    for r in feats:
        s = sum(v * v for v in r.feature)
        assert abs(s - 1.0) < 1e-4


def test_sample_frames(spark, docs_small):
    assets = documents_as_assets(docs_small.limit(30))
    frames = sample_frames(assets, every_bytes=32, frame_bytes=8)
    rows = frames.collect()
    assert rows and all(len(r.frame) == 8 for r in rows)
    # only video assets produce frames
    vids = {r.asset_id for r in assets.filter("kind = 'video'").collect()}
    assert {r.asset_id for r in rows} <= vids
    # frame numbers are dense per asset
    per = frames.groupBy("asset_id").agg(
        F.min("frame_no").alias("lo"), F.max("frame_no").alias("hi"),
        F.count("*").alias("n"))
    bad = per.filter((F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)).count()
    assert bad == 0


def test_byte_histogram_udf_equals_expression(spark, docs_small):
    from document_vector_pipeline_spark.operators.multimodal import (
        byte_histogram,
        byte_histogram_expr,
        documents_as_assets,
    )

    assets = documents_as_assets(docs_small.limit(80))
    a = byte_histogram(assets).collect()
    b = byte_histogram_expr(assets).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # histogram counts sum to the payload byte totals
    total = sum(r["n"] for r in a)
    from pyspark.sql import functions as F
    expect = (assets.select(F.sum(F.length("payload"))).collect()[0][0])
    assert total == expect


def test_resize_aspect_fit_and_byte_budget(spark):
    """Integer aspect-fit shrink-only targets; the stub-resized payload's
    length equals the proportional byte budget exactly."""
    from document_vector_pipeline_spark.operators import multimodal

    rows = [(1, "x" * 3000), (2, "y" * 50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # doc_id % 3: 1 -> audio, 2 -> video; force image kinds via adapter?
    # build assets directly so every row is an image
    assets = spark.createDataFrame(
        [(i, "image", t.encode(), None) for i, t in rows],
        multimodal.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in
           multimodal.resize_assets(assets, max_w=640, max_h=480).collect()}
    import hashlib
    for i, t in rows:
        payload = t.encode()
        h = hashlib.md5(payload).hexdigest()
        w = int(h[:4], 16) % 1920 + 1
        ht = int(h[4:8], 16) % 1080 + 1
        r = got[i]
        assert (r["width"], r["height"]) == (w, ht)
        assert r["new_width"] <= 640 and r["new_height"] <= 480
        # shrink-only and aspect preserved within integer floor
        assert r["new_width"] <= w and r["new_height"] <= ht
        m = len(payload) * (r["new_width"] * r["new_height"]) // (w * ht)
        assert len(r["resized"]) == m
    # non-image rows are dropped
    audio = spark.createDataFrame([(9, "audio", b"abc", None)],
                                  multimodal.ASSET_SCHEMA)
    assert multimodal.resize_assets(audio).count() == 0


def test_resize_with_real_codec_if_available(spark):
    """Optional (the mm symmetry of the pypdf parse-seam test): if a
    real image library is importable, wire PIL through resize_assets'
    codec seam — bytes the repo didn't fabricate, decoded and resized
    by a real codec inside the SAME mapInPandas contract."""
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from document_vector_pipeline_spark.operators import multimodal

    def make_png(w, h):
        buf = io.BytesIO()
        PIL_Image.new("RGB", (w, h), (120, 30, 200)).save(buf, "PNG")
        return buf.getvalue()

    def pil_dims(payload):
        with PIL_Image.open(io.BytesIO(payload)) as im:
            return im.size

    def pil_resize(payload, w, h, nw, nh):
        with PIL_Image.open(io.BytesIO(payload)) as im:
            buf = io.BytesIO()
            im.resize((nw, nh)).save(buf, "PNG")
            return buf.getvalue()

    rows = [(1, make_png(1600, 400)),     # width-bound shrink
            (2, make_png(200, 960)),      # height-bound shrink
            (3, make_png(100, 80))]       # already fits: untouched dims
    assets = spark.createDataFrame(
        [(i, "image", p, None) for i, p in rows], multimodal.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in
           multimodal.resize_assets(assets, max_w=640, max_h=480,
                                    codec=(pil_dims, pil_resize)).collect()}
    assert (got[1]["width"], got[1]["height"]) == (1600, 400)
    assert (got[1]["new_width"], got[1]["new_height"]) == (640, 160)
    assert (got[2]["new_width"], got[2]["new_height"]) == (100, 480)
    assert (got[3]["new_width"], got[3]["new_height"]) == (100, 80)
    # the resized payloads are REAL images at exactly the target dims
    for i, r in got.items():
        with PIL_Image.open(io.BytesIO(bytes(r["resized"]))) as im:
            assert im.size == (r["new_width"], r["new_height"])


# ---- asset-embedding client seam (round 9) ---------------------------------

def test_embed_assets_stub_matches_hash_embedder(spark, docs_small):
    """The stub asset embedder replays the house hashing-trick embedding
    over the decoded payload EXACTLY: normalize(stub vector) equals
    add_embeddings over the same text at the same dim."""
    from document_vector_pipeline_spark.functions.vectors import normalize
    from document_vector_pipeline_spark.operators import multimodal
    from document_vector_pipeline_spark.operators.embed import make_embed_udf

    docs = docs_small.limit(40)
    assets = multimodal.documents_as_assets(docs)
    got = (multimodal.embed_assets_with_client(
               assets, multimodal.stub_asset_embedder(dim=32),
               retry_delay_s=0.0)
           .select("asset_id",
                   normalize(F.col("embedding")).alias("v")))
    embed = make_embed_udf(32)
    # the house embedder lowercases nothing; the stub doesn't either
    want = docs.select(F.col("doc_id").alias("asset_id"),
                       embed(F.col("text")).alias("v"))
    g = {r["asset_id"]: [round(float(x), 5) for x in r["v"]]
         for r in got.collect()}
    w = {r["asset_id"]: [round(float(x), 5) for x in r["v"]]
         for r in want.collect()}
    assert g == w


def test_embed_assets_retry_contract(spark):
    """A client that throttles (status_code 429) twice before succeeding
    never fails the task; a non-retryable status propagates."""
    import pytest

    from document_vector_pipeline_spark.operators import multimodal

    assets = spark.createDataFrame(
        [(1, "image", b"abc def", None), (2, "image", b"ghi", None)],
        multimodal.ASSET_SCHEMA).coalesce(1)

    class Err(Exception):
        def __init__(self, status):
            super().__init__(f"status {status}")
            self.status_code = status

    def flaky(payloads, _state={"calls": 0}):
        _state["calls"] += 1
        if _state["calls"] <= 2:
            raise Err(429)
        return [[float(len(p))] for p in payloads]

    got = multimodal.embed_assets_with_client(
        assets, flaky, retry_delay_s=0.0).collect()
    assert sorted((r["asset_id"], r["embedding"][0]) for r in got) \
        == [(1, 7.0), (2, 3.0)]

    def fatal(payloads):
        raise Err(500)

    with pytest.raises(Exception, match="status 500"):
        multimodal.embed_assets_with_client(
            assets, fatal, retry_delay_s=0.0).collect()


def test_embed_assets_real_client_if_available(spark):
    """Non-stub proof: a REAL image model stand-in — PIL decodes the
    payload and the embedding is the downsampled pixel grid (an actual
    bytes→vector model pipeline, not a byte hash) — through the same
    seam, then fed to the embedding-leg dedup: identical images pair at
    cos 1.0, a different image does not."""
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from document_vector_pipeline_spark.operators import dedup, multimodal

    def make_png(color):
        buf = io.BytesIO()
        PIL_Image.new("RGB", (64, 64), color).save(buf, "PNG")
        return buf.getvalue()

    def pil_embed(payloads):
        out = []
        for p in payloads:
            with PIL_Image.open(io.BytesIO(bytes(p))) as im:
                px = list(im.convert("L").resize((4, 4)).getdata())
            out.append([float(v) for v in px])
        return out

    assets = spark.createDataFrame(
        [(1, "image", make_png((200, 10, 10)), None),
         (2, "image", make_png((200, 10, 10)), None),
         (3, "image", make_png((10, 10, 200)), None)],
        multimodal.ASSET_SCHEMA)
    emb = multimodal.embed_assets_with_client(assets, pil_embed,
                                              retry_delay_s=0.0)
    pairs = {(r["id_a"], r["id_b"]): r["cos"] for r in
             dedup.embedding_neardup_pairs(
                 emb.select(F.col("asset_id").alias("vec_id"),
                            "embedding"),
                 threshold=0.999999).collect()}
    assert set(pairs) == {(1, 2)}
