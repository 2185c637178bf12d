"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY.md §2 #25).

The Spark-side plumbing is real and tested: asset schema, Arrow batch
shape, mapInPandas signatures, partitioning.  The actual codecs (PIL,
ffmpeg, torchaudio...) are NOT in this container, so decoding is a
deterministic fake derived from the payload bytes — clearly marked, and
swappable: a production deployment replaces `_fake_decode` with the real
library call inside the same mapInPandas contract.

Design notes for 100 TB of binaries:
- binaryFile source caps file size per row; real corpora store blobs in
  parquet/avro shards (payload column) exactly like the `assets` frame
  built here.
- decode/feature-extract runs as mapInPandas: one Python worker per
  partition, Arrow-batched, no JVM copies of the raw bytes beyond the
  column transfer; repartition by asset_id keeps batches balanced.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = ("asset_id long, kind string, payload binary, "
                "meta struct<source:string,created_ts:timestamp>")

DECODED_SCHEMA = ("asset_id long, kind string, width int, height int, "
                  "n_frames int, duration_s double, content_hash string")

FEATURE_DIM = 16
FEATURE_SCHEMA = f"asset_id long, feature array<float>"


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: wrap the documents table's text bytes as binary assets so
    the multimodal plumbing is exercised against real data."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(F.col("source").alias("source"),
                 F.lit(None).cast("timestamp").alias("created_ts")).alias("meta"))


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode metadata from binary payloads via mapInPandas.

    STUB DECODER: real image/audio decoding libraries are unavailable in
    this environment, so dimensions/duration are a deterministic function
    of the payload bytes (md5 + length).  The mapInPandas contract —
    schema, batching, null payloads — is the production one.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                h = hashlib.md5(payload).hexdigest()
                n = len(payload)
                kind = row["kind"]
                out.append({
                    "asset_id": row["asset_id"],
                    "kind": kind,
                    "width": (int(h[:4], 16) % 1920 + 1) if kind == "image" else 0,
                    "height": (int(h[4:8], 16) % 1080 + 1) if kind == "image" else 0,
                    "n_frames": (int(h[8:12], 16) % 300 + 1) if kind == "video" else
                                (1 if kind == "image" else 0),
                    # exact integer milliseconds (half-up) — deterministic
                    # across engines, unlike float round()
                    "duration_s": ((n * 1000 + 512) // 1024) / 1000.0
                                  if kind in ("audio", "video") else 0.0,
                    "content_hash": h,
                })
            yield pd.DataFrame(out)

    return assets.mapInPandas(decode, DECODED_SCHEMA)


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature vectors from payload bytes via mapInPandas (stub: md5-seeded
    byte-histogram, unit-normalized — deterministic, shape-correct)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, vecs = [], []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                vec = np.zeros(dim, dtype=np.float32)
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size:
                    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
                    nrm = float(np.linalg.norm(hist))
                    vec = hist / nrm if nrm else hist
                ids.append(row["asset_id"])
                vecs.append(vec)
            yield pd.DataFrame({"asset_id": ids, "feature": vecs})

    return assets.select("asset_id", "payload").mapInPandas(feats, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_bytes: int = 64,
                  frame_bytes: int = 16) -> DataFrame:
    """Frame sampling for video-kind assets: one row per sampled byte-window
    (stand-in for ffmpeg keyframe extraction; pure built-ins, no Python).
    Output: (asset_id, frame_no, frame binary)."""
    video = assets.filter(F.col("kind") == "video")
    n = F.length("payload")
    starts = F.when(n >= frame_bytes,
                    F.sequence(F.lit(1), n - frame_bytes + 1,
                               F.lit(every_bytes)))\
             .otherwise(F.array().cast("array<int>"))
    frames = F.transform(starts, lambda s: F.substring(F.col("payload"), s, frame_bytes))
    return (video
            .select("asset_id", F.posexplode(frames).alias("frame_no", "frame")))


RESIZED_SCHEMA = ("asset_id long, width int, height int, new_width int, "
                  "new_height int, resized binary")


def _stub_codec():
    """The deterministic fake codec (no image libraries in this
    container): source dims from the payload's md5 (same family as
    decode_assets), 'resize' = a byte subsample sized to the
    proportional pixel budget ``len * nw*nh // (w*h)``."""
    import hashlib

    def dims(payload: bytes):
        h = hashlib.md5(payload).hexdigest()
        return int(h[:4], 16) % 1920 + 1, int(h[4:8], 16) % 1080 + 1

    def resize(payload: bytes, w: int, ht: int, nw: int, nh: int):
        n = len(payload)
        m = n * (nw * nh) // (w * ht)                # byte budget, m <= n
        if m <= 0:
            return b""
        stride = max(1, n // m)
        return payload[::stride][:m]

    return dims, resize


def resize_assets(assets: DataFrame, max_w: int = 640,
                  max_h: int = 480, codec=None) -> DataFrame:
    """Aspect-fit resize for image-kind assets via mapInPandas —
    (asset_id, width, height, new_width, new_height, resized binary).

    ``codec`` is the injectable-decoder seam (the multimodal analogue of
    ``analyze_with_client``): a ``(dims, resize)`` pair of plain
    callables — ``dims(payload) -> (w, h)`` and
    ``resize(payload, w, h, new_w, new_h) -> bytes`` — executed per row
    INSIDE the same mapInPandas contract, so a real library (e.g.
    PIL.Image.open / .resize, exercised by the optional
    tests/test_multimodal.py PIL test) drops in without touching the
    Spark-side plumbing.  Default: the deterministic stub codec (the
    oracle twin; real image libraries are unavailable in this
    container).

    The aspect-fit TARGET is exact integer arithmetic computed by the
    operator, not the codec (shrink-only: new_w = max_w,
    new_h = h*max_w // w when width-bound, mirrored when height-bound,
    floor >= 1) — the tested semantics are codec-independent.
    Map-only; at 100 TB this is the classic embarrassingly parallel
    byte-crunch stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dims, do_resize = codec if codec is not None else _stub_codec()
        cols = ["asset_id", "width", "height", "new_width", "new_height",
                "resized"]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if row["kind"] != "image":
                    continue
                payload = row["payload"] or b""
                w, ht = dims(payload)
                if w <= max_w and ht <= max_h:
                    nw, nh = w, ht
                elif w * max_h >= ht * max_w:        # width-bound
                    nw, nh = max_w, max(1, ht * max_w // w)
                else:
                    nw, nh = max(1, w * max_h // ht), max_h
                out.append({"asset_id": row["asset_id"], "width": w,
                            "height": ht, "new_width": nw,
                            "new_height": nh,
                            "resized": do_resize(payload, w, ht, nw, nh)})
            yield pd.DataFrame(out, columns=cols)

    return assets.mapInPandas(run, RESIZED_SCHEMA)


def byte_histogram(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Exact long-form byte histogram per asset — the INTEGER twin of
    extract_features (whose unit-normalized float vector cannot be
    value-compared across engines).  One row per (asset, bucket) with the
    exact count of payload bytes ≡ bucket (mod dim); zero buckets are
    omitted.  Same mapInPandas contract as the feature extractor, so the
    oracle-checked path certifies the byte-level plumbing the stubbed
    decoders sit on.  (The DuckDB oracle recomputes the histogram from
    the text the payload encodes — exact for ASCII corpora, where byte
    values equal code points.)"""

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, buckets, ns = [], [], []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                arr = np.frombuffer(payload, dtype=np.uint8)
                if not arr.size:
                    continue
                counts = np.bincount(arr % dim, minlength=dim)
                for b in np.nonzero(counts)[0]:
                    ids.append(row["asset_id"])
                    buckets.append(int(b))
                    ns.append(int(counts[b]))
            yield pd.DataFrame({"asset_id": ids, "bucket": buckets,
                                "n": ns})

    return (assets.select("asset_id", "payload")
            .mapInPandas(hist, "asset_id long, bucket int, n long")
            .orderBy("asset_id", "bucket"))


def byte_histogram_expr(assets: DataFrame,
                        dim: int = FEATURE_DIM) -> DataFrame:
    """Built-in-expression twin of byte_histogram for UTF-8 text payloads
    (equivalence-tested): explode characters, bucket by code point — for
    ASCII payloads code point == byte value."""
    chars = F.filter(F.split(F.decode(F.col("payload"), "utf-8"), ""),
                     lambda c: c != F.lit(""))
    return (assets.select("asset_id", F.explode(chars).alias("c"))
            .select("asset_id",
                    (F.ascii(F.col("c")) % dim).cast("int").alias("bucket"))
            .groupBy("asset_id", "bucket")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy("asset_id", "bucket"))


def stub_asset_embedder(dim: int = 32):
    """Deterministic stand-in for an asset-embedding model client — the
    same stand-in philosophy as the hash text embedder, the quality-model
    stub weights, and stub_cross_encoder: decode the payload bytes as
    UTF-8 and replay the house hashing-trick embedding EXACTLY
    (operators/embed.hash_embedding_expr: per whitespace token,
    vec[md5_32(token) % dim] += ±1 by md5 hex digit 9) — unnormalized
    integer bucket sums as floats, exact, so the DuckDB oracle rebuilds
    the identical vector from the text the payload encodes.
    Empty/NULL payloads embed to the zero vector (cosine 0 against
    everything).  Self-contained (hashlib only): cloudpickles by value
    with no reference to this package; swap in a CLIP/SigLIP-style
    bytes→vector model client at deployment — every Spark-side shape
    stays identical."""
    def client(payloads: list) -> list:
        import hashlib

        out = []
        for p in payloads:
            vec = [0] * dim
            text = (p or b"").decode("utf-8", errors="replace")
            for w in text.strip().split():
                h = hashlib.md5(w.encode("utf-8")).hexdigest()
                s = 1 if int(h[8], 16) % 2 == 0 else -1
                vec[int(h[:8], 16) % dim] += s
            out.append([float(x) for x in vec])
        return out

    return client


def embed_assets_with_client(assets: DataFrame, client,
                             payload_col: str = "payload",
                             out_col: str = "embedding",
                             batch_size: int = 10,
                             max_retries: int = 100,
                             retry_delay_s: float = 10.0,
                             retry_on=(429, 401)) -> DataFrame:
    """Asset bytes → embedding vector via an injectable model client —
    the multimodal member of the house client-seam family
    (embed_with_client / parse_route_client / rerank_with_client /
    count_tokens_with_client, all mirroring BlobTriggerFunction.cs:
    118-160's batch/retry contract): ``client`` is any
    ``Callable[[list[bytes]], list[list[float]]]``, cloudpickled BY
    VALUE, sliced into ``batch_size`` call groups per Arrow batch,
    retried on an exception whose ``status_code`` is in ``retry_on``
    up to ``max_retries`` times with ``retry_delay_s`` between
    attempts — transient model-service throttles never fail the task.

    This is the hook where a real image/audio embedding model goes
    (CLIP-style bytes → vector), which is what joint image-text dedup
    and retrieval need: the output frame feeds
    dedup.embedding_neardup_pairs (the second leg next to phash_pairs)
    and IVFIndex.build unchanged.

    Plan: ONE map-only mapInPandas stage (no shuffle; the payload
    bytes cross to Python once via Arrow) appending ``out_col``
    (array<float>) to the input schema — at 100 TB the classic
    embarrassingly parallel byte-crunch stage, same shape as
    resize_assets."""
    import time

    from pyspark.sql import types as T

    schema = T.StructType(
        list(assets.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pdf[payload_col].tolist()
            vecs: list = []
            for s in range(0, len(payloads), batch_size):
                group = payloads[s:s + batch_size]
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
                        f"asset embedding client returned {len(got)} "
                        f"vectors for a batch of {len(group)} payloads")
                vecs.extend(got)
            out = pdf.copy()
            out[out_col] = [[float(x) for x in v] for v in vecs]
            yield out

    return assets.mapInPandas(run, schema)


def phash(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(asset_id, phash): perceptual hash of each asset — bit i set iff
    byte-bucket count i exceeds the asset's mean bucket count
    (n_i · dim > total).  This is average-hash over the byte histogram
    (the decoded-media version thresholds DCT/luma blocks the same way;
    the stub keeps every Spark-side shape real — see decode_assets).
    Zero-payload assets hash to 0."""
    from document_vector_pipeline_spark.functions.expr import bound

    h = (byte_histogram(assets, dim)
         # 2^bucket as an exact long (pow is exact for these magnitudes;
         # shiftleft needs a literal shift amount)
         .withColumn("bitv", F.pow(F.lit(2.0),
                                   F.col("bucket").cast("double"))
                     .cast("long")))
    grouped = (h.groupBy("asset_id")
               .agg(F.collect_list(F.struct("bitv", "n")).alias("hs")))

    def bits(hs):
        total = F.aggregate(hs, F.lit(0).cast("long"),
                            lambda acc, e: acc + e["n"])
        return bound(total, lambda t: F.aggregate(
            hs, F.lit(0).cast("long"),
            lambda acc, e: acc + F.when(e["n"] * dim > t, e["bitv"])
            .otherwise(F.lit(0).cast("long"))))

    all_ids = assets.select("asset_id").distinct()
    return (all_ids.join(grouped.select("asset_id",
                                        bits(F.col("hs")).alias("phash")),
                         "asset_id", "left")
            .select("asset_id",
                    F.coalesce("phash", F.lit(0).cast("long"))
                     .alias("phash")))


def _banded_phash_candidates(ph: DataFrame, nbits: int,
                             bands: int) -> DataFrame:
    """(id_a < id_b, hamming) candidate pairs from the (band, slice)
    equi-join over an (asset_id, phash) frame — the ONE banded plan
    behind every perceptual-hash dedup member (byte-hist and pixel
    domain; round-13 refactor of two hand-copied blocks).  Any pair
    within hamming d < bands collides on ≥ 1 of the ``bands``
    bit-slices; the hamming verify is map-side before the distinct.
    Slices use an UNSIGNED shift + mask so 64-bit hashes with the
    sign bit set band correctly (identical to the old arithmetic
    shift/% for the 32-bit byte-hist domain, whose hashes are
    nonnegative)."""
    width = nbits // bands
    mask = (1 << width) - 1
    slices = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("phash"), b * width)
             .bitwiseAND(F.lit(mask)).alias("key"))
        for b in range(bands)])
    banded = (ph.select("asset_id", "phash", F.explode(slices).alias("bk"))
              .select("asset_id", "phash",
                      F.col("bk.band").alias("band"),
                      F.col("bk.key").alias("key")))
    left = banded.select(F.col("asset_id").alias("id_a"),
                         F.col("phash").alias("ph_a"), "band", "key")
    right = banded.select(F.col("asset_id").alias("id_b"),
                          F.col("phash").alias("ph_b"), "band", "key")
    return (left.join(right, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.bit_count(F.expr("ph_a ^ ph_b")).cast("int")
                    .alias("hamming"))
            .distinct())


def phash_pairs(assets: DataFrame, dim: int = 32,
                max_hamming: int = 2, bands: int = 4) -> DataFrame:
    """Near-duplicate asset pairs by perceptual hash: (id_a < id_b,
    hamming) with hamming(phash) ≤ max_hamming — the multimodal member
    of the dedup family (image near-dup via average-hash) in the
    BYTE-HISTOGRAM domain (the codec-free twin; the pixel-domain
    production member is ``phash_pixel_pairs``).

    Same banded plan as simhash_pairs via _banded_phash_candidates.
    The phash build itself is one mapInPandas histogram pass + one
    groupBy — no joins."""
    return (_banded_phash_candidates(phash(assets, dim), dim, bands)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def phash_pixel_pairs(docs: DataFrame, w: int = 16, h: int = 16,
                      grid: int = 8, max_hamming: int = 8,
                      bands: int = 4, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """PIXEL-domain perceptual near-dup pairs (round 13 — promotes the
    dedup member of the phash family onto the real decoded-pixel hash
    the round-12 verdict asked for): ``doc_phash_luma``'s 64-bit
    luma-block average-hash (REAL PNG codec round trip inside one
    Arrow pass) feeds the SAME banded hamming join as the byte-hist
    member — only the hash domain changes, the candidate plan is
    shared code.  Exact integers end to end, so the DuckDB oracle
    replays pixel formula + block algebra + banding without a codec.
    ``max_hamming`` defaults wider than the byte-hist member because
    the 64-bit block hash distributes edits over 4× the bits (the
    mm_phash_tuning histogram is how the cut is CHOSEN)."""
    ph = doc_phash_luma(docs, w=w, h=h, grid=grid, id_col=id_col,
                        text_col=text_col)
    return (_banded_phash_candidates(ph, grid * grid, bands)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def phash_pixel_candidate_hist(docs: DataFrame, w: int = 16,
                               h: int = 16, grid: int = 8,
                               bands: int = 4, id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """Threshold calibration for ``phash_pixel_pairs`` — the hamming
    histogram of every banded candidate pair in the PIXEL domain
    (round 13): the valley picks max_hamming, the tail prices the
    verify stage, and candidates stay the bounded (band, slice)
    equi-join at any corpus size."""
    ph = doc_phash_luma(docs, w=w, h=h, grid=grid, id_col=id_col,
                        text_col=text_col)
    return (_banded_phash_candidates(ph, grid * grid, bands)
            .groupBy("hamming")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .orderBy("hamming"))


def phash_candidate_hist(assets: DataFrame, dim: int = 32,
                         bands: int = 4) -> DataFrame:
    """Threshold calibration for ``phash_pairs`` — (hamming, n_pairs):
    the hamming-distance histogram of EVERY banded candidate pair
    (before any max_hamming cut), the dedup_lsh_tuning discipline
    applied to the multimodal member of the family: the histogram's
    valley says where to set max_hamming, and the tail volume says
    what the verify stage will cost.  Candidates stay the bounded
    (band, slice) equi-join — never all-pairs — so the calibration
    itself runs at corpus scale."""
    return (_banded_phash_candidates(phash(assets, dim), dim, bands)
            .groupBy("hamming")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .orderBy("hamming"))


def _text_pixels_roundtrip(text: str | None, w: int, h: int,
                           png_encode, png_decode) -> list[int]:
    """The SHARED pixel source + REAL codec round trip behind both
    perceptual hashes (round-12 review: two hand-copied blocks had to
    stay in sync for the luma/DCT pairing — now one function): pixel
    p = ord(text[p mod len]) mod 256 (0 for empty text), grayscale
    PNG-encoded then decoded through the vendored codec, returning the
    w*h luma values.  Lossless by construction — asserted."""
    text = text or ""
    n = len(text)
    vals = [(ord(text[p % n]) % 256 if n else 0) for p in range(w * h)]
    png = png_encode([(v, v, v) for v in vals], w, h)
    dw, dh, ch, px = png_decode(png)
    assert (dw, dh, ch) == (w, h, 3)
    return [px[i * 3] for i in range(w * h)]   # gray: r==g==b


def doc_phash_luma(docs: DataFrame, w: int = 16, h: int = 16,
                   grid: int = 8, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """PIXEL-domain perceptual hash (round 12 — the verdict's upgrade
    from the byte-histogram stub at ``phash``): (asset_id, phash) where
    the hash thresholds LUMA BLOCKS of actually-decoded image pixels —
    the average-hash member of the pHash family, exact integers end to
    end so the oracle replays it.

    The Spark side runs the REAL codec plumbing: per document a
    deterministic w×h grayscale image (pixel p = ord(text[p mod len])
    mod 256 — text-derived, so near-dup documents yield near-dup
    images), ENCODED to genuine PNG bytes and DECODED back through the
    vendored pure-stdlib codec (functions/minipng — RFC 2083 filters,
    zlib IDAT) inside one Arrow pass.  The round trip is lossless, so
    the DuckDB oracle reproduces the hash from the pixel formula alone
    without a codec; a real image corpus drops its bytes into the same
    decode seam and only the pixel source changes.

    Hash: average-pool the w×h luma into a grid×grid block sum table;
    bit (by·grid + bx) is set iff the block's mean exceeds the image
    mean — compared by exact integer cross-multiplication
    (block_sum · n_pixels > total_sum · block_pixels), no division.
    Constant images (every block mean equal) hash to 0.  The
    float-DCT classic pHash is ``doc_phash_dct`` (measured, not
    oracle-replayable — cosines).

    Plan: ONE mapInPandas stage (encode+decode+pool are per-row byte
    work, Arrow-batched), no shuffle at all — at 100 TB this is a
    map-only pass over the image column."""
    from document_vector_pipeline_spark.functions.minipng import (
        png_decode,
        png_encode,
    )

    bw, bh = w // grid, h // grid
    id_type = docs.schema[id_col].dataType.simpleString()
    # the codec round trip is CPU-dense per-row Python: an
    # under-partitioned input (single-row-group parquet) would run it
    # serial — fan out first (no-op at production parallelism)
    from document_vector_pipeline_spark.functions.par import fan_out
    docs = fan_out(docs.select(id_col, text_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for _, row in pdf.iterrows():
                luma = _text_pixels_roundtrip(row[text_col], w, h,
                                              png_encode, png_decode)
                sums = [0] * (grid * grid)
                for y in range(h):
                    for x in range(w):
                        sums[(y // bh) * grid + (x // bw)] += luma[y * w + x]
                total = sum(sums)
                bits = 0
                npx, bpx = w * h, bw * bh
                for i, s in enumerate(sums):
                    if s * npx > total * bpx:
                        bits |= 1 << i
                if bits >= 1 << 63:
                    bits -= 1 << 64                      # signed int64 wrap
                out.append((row[id_col], bits))
            yield pd.DataFrame(out, columns=["asset_id", "phash"])

    return (docs.select(id_col, text_col)
            .mapInPandas(run, f"asset_id {id_type}, phash long"))


def doc_phash_dct(docs: DataFrame, w: int = 32, h: int = 32,
                  keep: int = 8, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Classic pHash (8×8 DCT of a 32×32 luma image, median threshold
    over the 64 low-frequency coefficients excluding DC) over the SAME
    decoded-pixel pipeline as ``doc_phash_luma`` — the float-DCT member
    the luma-block hash is the integer twin of.  Measured (invariance
    + near-dup tests), not oracle-replayed: DCT cosines are
    transcendental, exactly the class the oracle discipline keeps out
    of checked columns.  Same map-only Arrow plan shape."""
    import numpy as np

    from document_vector_pipeline_spark.functions.minipng import (
        png_decode,
        png_encode,
    )

    # separate DCT-II bases for rows (size h) and columns (size w) so
    # non-square calls transform correctly (round-13 ADVICE fix: one
    # w-sized basis on an h×w image was a shape mismatch for h != w)
    kw = np.arange(w)
    kh = np.arange(h)
    basis_w = np.cos(np.pi * (2 * kw[None, :] + 1) * kw[:, None] / (2 * w))
    basis_h = np.cos(np.pi * (2 * kh[None, :] + 1) * kh[:, None] / (2 * h))
    id_type = docs.schema[id_col].dataType.simpleString()
    # codec + DCT per row is CPU-dense Python — fan out an
    # under-partitioned scan first (no-op at production parallelism)
    from document_vector_pipeline_spark.functions.par import fan_out
    docs = fan_out(docs.select(id_col, text_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for _, row in pdf.iterrows():
                luma = _text_pixels_roundtrip(row[text_col], w, h,
                                              png_encode, png_decode)
                img = np.array(luma, dtype=np.float64).reshape(h, w)
                d = basis_h @ img @ basis_w.T             # 2-D DCT-II
                low = d[:keep, :keep].flatten()[1:]       # drop DC
                med = np.median(low)
                bits = 0
                for i, c in enumerate(low):
                    if c > med:
                        bits |= 1 << i
                if bits >= 1 << 63:
                    bits -= 1 << 64
                out.append((row[id_col], bits))
            yield pd.DataFrame(out, columns=["asset_id", "phash"])

    return (docs.select(id_col, text_col)
            .mapInPandas(run, f"asset_id {id_type}, phash long"))
