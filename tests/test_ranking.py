"""plans/ranking.py: two-phase exact ranking primitives — each must be
bit-identical to its unpartitioned-window counterpart (that is the
whole contract: same answer, no single-task stage)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from document_vector_pipeline_spark.plans.ranking import (
    global_cumsum,
    global_ntile,
    global_row_number,
    global_suffix_max,
    grouped_running_sum,
    partial_topk,
)


@pytest.fixture(scope="module")
def frame(spark):
    random.seed(7)
    rows = [(i, random.randint(0, 50), random.choice("abc"))
            for i in range(997)]
    return (spark.createDataFrame(rows, "id long, n long, g string")
            .repartition(8).localCheckpoint(eager=True))


def ORDER():
    return [F.desc("n"), F.col("id")]


def W():
    return Window.orderBy(F.desc("n"), "id")


def test_global_row_number_equals_window(frame):
    got, total = global_row_number(frame, ORDER(), out="rn")
    want = frame.withColumn("rn", F.row_number().over(W()).cast("long"))
    assert total == 997
    assert ({(r.id, r.rn) for r in got.collect()}
            == {(r.id, r.rn) for r in want.collect()})


@pytest.mark.parametrize("k", [10, 3, 997, 1200])
def test_global_ntile_equals_window(frame, k):
    got = global_ntile(frame, ORDER(), k, out="t")
    want = frame.withColumn("t", F.ntile(k).over(W()))
    assert ({(r.id, r.t) for r in got.collect()}
            == {(r.id, r.t) for r in want.collect()})


def test_grouped_running_sum_equals_window(frame):
    wg = (Window.partitionBy("g").orderBy(F.desc("n"), "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = frame.withColumn("c", F.sum("n").over(wg).cast("long"))
    got = grouped_running_sum(frame, "g", ORDER(), "n", out="c")
    assert ({(r.id, r.c) for r in got.collect()}
            == {(r.id, r.c) for r in want.collect()})


def test_global_cumsum_equals_window(frame):
    ws = Window.orderBy("n", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    want = (frame
            .withColumn("c", F.sum("n").over(ws).cast("long"))
            .withColumn("rk", F.row_number()
                        .over(Window.orderBy("n", "id")).cast("long")))
    got, total, tsum = global_cumsum(
        frame, [F.col("n"), F.col("id")], "n", out="c", rn_out="rk")
    assert total == 997
    assert tsum == sum(r["n"] for r in frame.select("n").collect())
    assert ({(r.id, r.c, r.rk) for r in got.collect()}
            == {(r.id, r.c, r.rk) for r in want.collect()})


def test_global_suffix_max_equals_range_window(frame):
    wr = Window.orderBy("n").rangeBetween(1, Window.unboundedFollowing)
    want = frame.withColumn("sm", F.max("id").over(wr).cast("long"))
    got = global_suffix_max(frame, "n", "id", out="sm")
    assert ({(r.id, r.sm) for r in got.collect()}
            == {(r.id, r.sm) for r in want.collect()})


def test_partial_topk_lossless_for_rank_cut(frame):
    want = {r.id for r in frame.withColumn("rk", F.row_number().over(W()))
            .filter(F.col("rk") <= 25).collect()}
    cut = partial_topk(frame, ORDER(), 25)
    got = {r.id for r in cut.withColumn("rk", F.row_number().over(W()))
           .filter(F.col("rk") <= 25).collect()}
    assert got == want
    # survivor frame is partition-bounded
    assert cut.count() <= 8 * 25 * 2

    wg = Window.partitionBy("g").orderBy(F.desc("n"), "id")
    wantg = {(r.g, r.id) for r in frame
             .withColumn("rk", F.row_number().over(wg))
             .filter(F.col("rk") <= 10).collect()}
    cutg = partial_topk(frame, ORDER(), 10, group_cols=("g",))
    gotg = {(r.g, r.id) for r in cutg
            .withColumn("rk", F.row_number().over(wg))
            .filter(F.col("rk") <= 10).collect()}
    assert gotg == wantg


def test_empty_frames(frame):
    e = frame.limit(0)
    ranked, total = global_row_number(e, ORDER())
    assert total == 0 and ranked.count() == 0
    assert global_ntile(e, ORDER(), 10).count() == 0
    res, n, s = global_cumsum(e, ORDER(), "n")
    assert n == 0 and s == 0 and res.count() == 0
    assert global_suffix_max(e, "n", "id").count() == 0


def test_grouped_running_sum_keeps_null_groups(spark):
    """Round-8 ADVICE: a NULL group key is a real window partition (SQL
    PARTITION BY groups nulls together) — the offsets join must be
    null-safe, not silently drop those rows."""
    rows = [("a", 1, 10), (None, 2, 5), ("a", 3, 7),
            (None, 4, 3), (None, 5, None), ("b", 6, 2)]
    df = (spark.createDataFrame(rows, "g string, o int, v int")
          .repartition(4))
    wg = (Window.partitionBy("g").orderBy("o")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {(r.g, r.o, r.c) for r in
            df.withColumn("c", F.sum("v").over(wg).cast("long")).collect()}
    got = {(r.g, r.o, r.c) for r in
           grouped_running_sum(df, "g", [F.col("o")], "v",
                               out="c").collect()}
    assert got == want
    assert any(g is None for g, _, _ in got)


def test_cumsum_and_suffix_max_tolerate_all_null_partitions(spark):
    """Round-8 ADVICE: a range partition whose values are all NULL sums
    (maxes) to NULL — the driver-side offset fold must skip it like the
    window form does, not raise int(None)."""
    rows = [(1, None), (2, None), (3, 4), (4, None), (5, 9)]
    df = (spark.createDataFrame(rows, "o int, v int").repartition(5))
    ws = Window.orderBy("o").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    want_c = {(r.o, r.c) for r in
              df.withColumn("c", F.sum("v").over(ws).cast("long"))
              .collect()}
    got, n, s = global_cumsum(df, [F.col("o")], "v", out="c",
                              n_partitions=5)
    assert n == 5 and s == 13
    got_c = {(r.o, r.c) for r in got.collect()}
    # bit-identical incl. NULL placement: NULL only before the first
    # non-null value globally, the real prefix sum everywhere after —
    # even when a partition's local slice is all-NULL.
    assert got_c == want_c

    wr = Window.orderBy("o").rangeBetween(1, Window.unboundedFollowing)
    want_m = {(r.o, r.m) for r in
              df.withColumn("m", F.max("v").over(wr).cast("long"))
              .collect()}
    got_m = {(r.o, r.m) for r in
             global_suffix_max(df, "o", "v", out="m",
                               n_partitions=5).collect()}
    assert got_m == want_m

    # fully-null value column: totals are 0, no driver-side TypeError
    alln = spark.createDataFrame([(1, None), (2, None)], "o int, v int")
    _, n2, s2 = global_cumsum(alln, [F.col("o")], "v")
    assert (n2, s2) == (2, 0)
    assert global_suffix_max(alln, "o", "v").count() == 2
