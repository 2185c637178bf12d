"""Join-strategy operators: the explicit runtime-filter patterns a 100 TB
join needs when the optimizer can't infer them.

Spark's AQE injects bloom runtime filters in some shapes, but the classic
hand-built version stays useful: build a compact bitmap from the small
side's join keys, broadcast it as plan metadata, and drop probe-side rows
map-side BEFORE they reach the join shuffle.  False positives survive the
filter; the exact join afterwards removes them, so results are identical
to the plain join — the filter only shrinks the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions from ONE xxhash64 evaluation: disjoint 21-bit
    windows of the 64-bit hash, each mod m_bits.  The bitmap hash needs
    no cross-engine contract (bloom false positives are removed by the
    exact join that follows), so the cheapest JVM-native hash wins —
    xxhash64 is a single codegen'd long op vs md5's string digest.
    21*k <= 63 caps k at 3; m_bits must stay <= 2^21."""
    if k * 21 > 63 or m_bits > (1 << 21):
        raise ValueError("k <= 3 and m_bits <= 2^21 with one xxhash64")
    h = F.xxhash64(key)
    return [F.shiftrightunsigned(h, 21 * i)
            .bitwiseAND(F.lit((1 << 21) - 1)) % m_bits
            for i in range(k)]


# bit masks as a literal lookup (shiftleft needs a literal shift amount;
# 63 bits per word keeps every mask a positive long)
_WORD_BITS = 63
_POW2 = [1 << i for i in range(_WORD_BITS)]


def _mask(p: Column) -> Column:
    return F.element_at(F.lit(_POW2), (p % _WORD_BITS).cast("int") + 1)


def bloom_bitmap(build: DataFrame, key_col: str,
                 m_bits: int = 1 << 16, k: int = 3) -> list[int]:
    """Driver-collected bloom bitmap (63-bit words) over the build side's
    keys.  Built distributed: explode the k bit positions per key, OR-fold
    per word (one partial-aggregated shuffle of at most m_bits/63 rows),
    then collect — ~1000 longs at the default size, plan metadata exactly
    like a broadcast hash table, only ~1000x smaller."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k)))
    words = (build.select(pos.alias("p"))
             .select((F.col("p") / _WORD_BITS).cast("int").alias("w"),
                     _mask(F.col("p")).alias("b"))
             .groupBy("w").agg(F.bit_or("b").alias("bits")))
    bitmap = [0] * (m_bits // _WORD_BITS + 1)
    for r in words.collect():
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(key: Column, bitmap: list[int],
                        m_bits: int, k: int) -> Column:
    """Map-side membership test: all k bits set in the literal bitmap."""
    words = F.lit(list(bitmap))
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        word = F.element_at(words, (p / _WORD_BITS).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_mask(p)) != 0)
    return cond


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_key: str,
                    build_key: str, m_bits: int = 1 << 16,
                    k: int = 3) -> DataFrame:
    """LEFT SEMI join with a bloom prefilter on the probe side.

    The prefilter is a pure projection over the probe scan (no exchange),
    so rows that cannot match never enter the join shuffle; the exact
    LEFT SEMI join then removes bloom false positives.  Result is
    IDENTICAL to probe SEMI JOIN build — the oracle is the plain join —
    while the shuffle carries only build-selectivity x (1 + fp-rate) of
    the probe.  With the default 64 Kbit / k=3 sizing, fp-rate at 5k
    build keys is ~0.04%."""
    keep = bloom_might_contain(F.col(probe_key),
                               bloom_bitmap(build, build_key, m_bits, k),
                               m_bits, k)
    return (probe.filter(keep)
            .join(build.select(F.col(build_key).alias(probe_key)).distinct(),
                  probe_key, "left_semi"))


def bloom_fpr(build: DataFrame, probe: DataFrame, build_key: str,
              probe_key: str, m_bits: int = 1 << 12,
              k: int = 3) -> DataFrame:
    """Measured false-positive rate of a bloom bitmap over YOUR keys —
    one row (m_bits, k, n_build, n_probe, n_fp, fpr_ppm): the fraction
    of DISJOINT probe keys (not in the build set) that still pass all
    ``k`` membership tests.  The acceptance metric the
    ``bloom_semi_join`` sizing (m_bits, k) implies but never measures —
    the same ship-the-metric contract as ann_recall / dedup_minhash_eval.

    Unlike the runtime filter itself (xxhash64 — no cross-engine
    contract needed because the exact join clears false positives),
    this MEASUREMENT uses md5-window positions (k disjoint 20-bit hex
    windows mod m_bits) so a SQL oracle replays it bit-for-bit.

    Plan: positions-set is <= m_bits distinct ints (one bounded
    shuffle); the membership probe is an equi-join of (probe x k) rows
    against it; counts are exact integers."""
    from document_vector_pipeline_spark.functions.hashing import md5_long

    if m_bits > (1 << 20):
        raise ValueError("m_bits <= 2^20 with 5-hex-digit windows")
    if k > 6:
        # each hash reads a disjoint 5-hex-char window of the 32-char
        # md5 digest starting at 1+5*i; k=7 would run past the digest
        # and silently shrink the hash range, biasing the measured FPR
        raise ValueError("k <= 6 (6*5=30 hex chars fit the md5 digest)")

    def positions(col: Column) -> list[Column]:
        return [md5_long(col.cast("string"), 5, 1 + 5 * i) % m_bits
                for i in range(k)]

    b = build.select(F.col(build_key).alias("key")).distinct()
    pos_set = (b.select(F.explode(F.array(*positions(F.col("key"))))
                        .alias("p"))
               .distinct())
    pr = (probe.select(F.col(probe_key).alias("pk")).distinct()
          .join(b.select(F.col("key").alias("pk")), "pk", "left_anti"))
    cand = pr.select(
        "pk", F.posexplode(F.array(*positions(F.col("pk"))))
        .alias("j", "p"))
    hits = (cand.join(pos_set, "p")
            .select("pk", "j").distinct()
            .groupBy("pk").agg(F.count(F.lit(1)).alias("nh")))
    n_fp = (hits.filter(F.col("nh") == k)
            .agg(F.count(F.lit(1)).alias("n_fp")))
    return (b.agg(F.count(F.lit(1)).alias("n_build"))
            .crossJoin(F.broadcast(pr.agg(F.count(F.lit(1))
                                          .alias("n_probe"))))
            .crossJoin(F.broadcast(n_fp))
            .select(F.lit(m_bits).cast("int").alias("m_bits"),
                    F.lit(k).cast("int").alias("k"),
                    "n_build", "n_probe", "n_fp",
                    F.expr("case when n_probe = 0 then 0 "
                           "else (1000000 * n_fp) div n_probe end")
                    .alias("fpr_ppm")))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt: int = 8) -> DataFrame:
    """Skew-safe equi-join: the manual salting pattern for the case AQE
    can't fix — ONE key so hot that a single reducer drowns even after
    skew-split (the web-crawl "null user", the boilerplate domain).

    Each big-side row gets a uniform salt from its row id, the small
    side is replicated ``salt`` ways (explode of the salt range), and
    the join runs on (key, salt) — the hot key's probe rows spread over
    ``salt`` reducers instead of one.  The salt column never leaves the
    operator.  RESULT-IDENTICAL to the plain join by construction: salt
    assignment only moves rows between reducers (the oracle is the
    plain join, the same contract as events_salted_agg).  Cost: small
    side ×salt — use only when the small side is genuinely small and a
    specific key is measurably hot; the first tools to reach for are
    AQE skew-join and broadcast."""
    b = big.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    s = (small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        .withColumn("__salt", F.col("__salt").cast("int")))
    return b.join(s, [key, "__salt"]).drop("__salt")


def skew_profile(df: DataFrame, key_col: str, label: str,
                 n_partitions: int = 32,
                 quantiles: tuple = (50, 99)) -> DataFrame:
    """Shuffle-key skew advisor: ONE row describing how ``key_col``
    would load a ``n_partitions``-way hash shuffle — the measurement
    you take BEFORE deciding between a plain join, AQE skew handling,
    and explicit salting (``salted_join``).

    Columns: (relation_key, n_rows, n_keys, top1_rows, top1_share_ppm,
    p50_key_rows, p99_key_rows, skew_ratio_ppm, recommended_salt).
    skew_ratio_ppm is the hottest key's load relative to a perfectly
    level partition (1e6 = level; n_partitions×1e6 = one key owns the
    table); recommended_salt = ⌈top1_rows·P/n_rows⌉ is the fan-out
    that brings the hottest key's shards back to the average partition
    load (1 = salting buys nothing).  All arithmetic is exact int64
    (the ppm split q·1e6 + (r·1e6 div n) keeps headroom to ~9·10¹²
    rows; beyond that lift to decimal).

    Plan: one key-sized aggregation (map-side combinable), a
    DISTINCT-SIZE histogram (≪ keys), and the two-phase exact
    ``global_cumsum`` over it for the key-size percentiles — no
    unpartitioned window ever sees a keys-sized frame.  Key counts
    come back as plan metadata (bounded counters), never key data."""
    from document_vector_pipeline_spark.plans import ranking

    sizes = (df.groupBy(F.col(key_col).alias("k"))
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    hist = sizes.groupBy("x").agg(F.count(F.lit(1)).cast("long")
                                  .alias("cnt"))
    cum, _, n_keys = ranking.global_cumsum(hist, [F.col("x")], "cnt")
    spark = df.sparkSession
    # the empty-input schema must track the `quantiles` parameter —
    # the non-empty path names percentile columns from it, and a mixed
    # unionByName over profiles breaks if the empty branch hardcodes
    # p50/p99
    out_schema = ("relation_key string, n_rows long, n_keys long, "
                  "top1_rows long, top1_share_ppm long, "
                  + "".join(f"p{q}_key_rows long, " for q in quantiles)
                  + "skew_ratio_ppm long, recommended_salt long")
    if n_keys == 0:
        return spark.createDataFrame([], out_schema)
    tot = sizes.agg(F.sum("x").cast("long").alias("n_rows"),
                    F.lit(int(n_keys)).cast("long").alias("n_keys"),
                    F.max("x").cast("long").alias("top1_rows"))
    row = tot
    for q in quantiles:
        target = (q * int(n_keys) + 99) // 100
        pq = (cum.filter(F.col("cum") >= target)
              .agg(F.min("x").cast("long").alias(f"p{q}_key_rows")))
        row = row.crossJoin(F.broadcast(pq))
    p = int(n_partitions)
    ratio_ppm = F.expr(
        f"((top1_rows * {p}) div n_rows) * 1000000 "
        f"+ (((top1_rows * {p}) % n_rows) * 1000000) div n_rows")
    salt = F.expr(f"greatest(1, (top1_rows * {p} + n_rows - 1) "
                  "div n_rows)")
    return row.select(
        F.lit(label).alias("relation_key"),
        "n_rows", "n_keys", "top1_rows",
        F.expr("(top1_rows * 1000000) div n_rows").cast("long")
         .alias("top1_share_ppm"),
        *[F.col(f"p{q}_key_rows") for q in quantiles],
        ratio_ppm.cast("long").alias("skew_ratio_ppm"),
        salt.cast("long").alias("recommended_salt"))
