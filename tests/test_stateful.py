"""Stateful streaming operators: cross-microbatch dedup + running totals.

Drives real Structured Streaming queries (file source, one file per
microbatch via maxFilesPerTrigger=1) so the GroupState actually carries
across batches.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.streaming.stateful import (
    first_seen_filter,
    running_totals,
)

SCHEMA = "fingerprint bigint, doc_id bigint, value double"


def _write_batches(tmp_path):
    # batch 1: fp 1,2 ; batch 2: fp 2 (dup!), 3 ; batch 3: fp 1 (dup), 4
    batches = [
        [(1, 10, 1.5), (2, 20, 2.25)],
        [(2, 21, 4.0), (3, 30, 3.0)],
        [(1, 11, 9.0), (4, 40, 0.5)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.jsonl", "w") as f:
            for fp, doc, val in rows:
                f.write(json.dumps({"fingerprint": fp, "doc_id": doc,
                                    "value": val}) + "\n")
    return str(src)


def _run_stream(spark, df, tmp_path, name):
    q = (df.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .outputMode("append" if name == "dedup" else "update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture()
def stream_src(spark, tmp_path):
    path = _write_batches(tmp_path)
    return (spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
            .json(path))


def test_first_seen_filter_dedups_across_microbatches(spark, tmp_path,
                                                      stream_src):
    out = first_seen_filter(stream_src, "fingerprint", ("doc_id", "value"))
    got = _run_stream(spark, out, tmp_path, "dedup")
    rows = {r["fingerprint"]: (r["doc_id"], r["value"])
            for r in got.collect()}
    # each fingerprint exactly once, first-batch occurrence wins
    assert rows == {1: (10, 1.5), 2: (20, 2.25), 3: (30, 3.0), 4: (40, 0.5)}


def test_first_seen_filter_batch_fallback(spark, docs_small):
    from document_vector_pipeline_spark.functions.text import (
        content_fingerprint,
    )
    df = docs_small.select(
        content_fingerprint(F.col("text")).alias("fingerprint"),
        F.col("doc_id"), F.lit(1.0).alias("value"))
    out = first_seen_filter(df, "fingerprint", ("doc_id", "value"))
    assert out.count() == df.select("fingerprint").distinct().count()


def test_running_totals_accumulates_state(spark, tmp_path, stream_src):
    keyed = stream_src.select(F.col("fingerprint").alias("user_id"), "value")
    out = running_totals(keyed)
    got = _run_stream(spark, out, tmp_path, "totals")
    # memory sink in update mode keeps every emission; the LAST one per key
    # is the converged total
    pdf = got.toPandas()
    final = {}
    for _, r in pdf.iterrows():
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (2, 10.5)   # 1.5 + 9.0 across batches 1 and 3
    assert final[2] == (2, 6.25)   # 2.25 + 4.0 across batches 1 and 2
    assert final[3] == (1, 3.0)
    assert final[4] == (1, 0.5)


def test_running_totals_batch_fallback(spark, stream_src, tmp_path):
    batch = spark.read.schema(SCHEMA).json(str(tmp_path / "src"))
    keyed = batch.select(F.col("fingerprint").alias("user_id"), "value")
    out = running_totals(keyed)
    rows = {r["user_id"]: (r["n_events"], r["total_value"])
            for r in out.collect()}
    assert rows[1] == (2, 10.5) and rows[2] == (2, 6.25)


EV_SCHEMA = "user_id bigint, event_type string, sec bigint, event_id bigint"


def _write_scd2_batches(tmp_path):
    # user 1: a, a (dup), b | b (dup), a  -> versions a1, b2, a3
    # user 2: c only                      -> version c1
    batches = [
        [(1, "a", 10, 1), (1, "a", 20, 2), (2, "c", 15, 3)],
        [(1, "b", 30, 4)],
        [(1, "b", 40, 5), (1, "a", 50, 6)],
    ]
    src = tmp_path / "scd2src"
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.jsonl", "w") as f:
            for u, s, sec, eid in rows:
                f.write(json.dumps({"user_id": u, "event_type": s,
                                    "sec": sec, "event_id": eid}) + "\n")
    return str(src)


def test_scd2_changes_streaming_matches_batch(spark, tmp_path):
    from document_vector_pipeline_spark.streaming.stateful import scd2_changes

    path = _write_scd2_batches(tmp_path)
    raw = (spark.readStream.schema(EV_SCHEMA)
           .option("maxFilesPerTrigger", 1).json(path))
    stream_df = raw.select("user_id", "event_type",
                           F.timestamp_seconds("sec").alias("ts"),
                           "event_id")
    q = (scd2_changes(stream_df).writeStream.format("memory")
         .queryName("scd2s")
         .option("checkpointLocation", str(tmp_path / "ckpt_scd2"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("scd2s").collect())

    batch_df = (spark.read.schema(EV_SCHEMA).json(path)
                .select("user_id", "event_type",
                        F.timestamp_seconds("sec").alias("ts"), "event_id"))
    want = sorted(tuple(r) for r in scd2_changes(batch_df).collect())
    assert got == want
    versions = {(r[0], r[1]): r[3] for r in got}
    assert versions[(1, "a")] in (1, 3) and versions[(2, "c")] == 1
    assert len(got) == 4  # a1, b2, a3 for user 1 + c1 for user 2


def _drain(spark, make_df, tmp_path, name, ckpt):
    """One availableNow drain against a SHARED checkpoint — the
    kill-and-resume primitive: each call is a fresh query resuming
    whatever GroupState the checkpoint holds.  foreachBatch is the
    sink (it SUPPORTS checkpoint recovery, unlike the memory sink,
    which refuses to resume); emissions land in a driver-side list."""
    rows: list[dict] = []

    def sink(bdf, _bid):
        rows.extend(r.asDict() for r in bdf.collect())

    q = (make_df().writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / ckpt))
         .outputMode("update" if "totals" in name else "append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return rows


def test_first_seen_state_survives_restart(spark, tmp_path):
    """Round-12 verdict item 7 — kill-and-resume: stop the stream after
    batch 1, append new files, restart from the SAME checkpoint.  A
    fingerprint seen before the stop must NOT re-emit after the
    restart: the dedup GroupState lives in the checkpoint, not the
    query object (the production failure mode this pins is a driver
    crash between microbatches)."""
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.jsonl", "w") as f:
        for fp, doc, val in [(1, 10, 1.5), (2, 20, 2.25)]:
            f.write(json.dumps({"fingerprint": fp, "doc_id": doc,
                                "value": val}) + "\n")

    def make():
        raw = (spark.readStream.schema(SCHEMA)
               .option("maxFilesPerTrigger", 1).json(str(src)))
        return first_seen_filter(raw, "fingerprint", ("doc_id", "value"))

    got1 = {r["fingerprint"] for r in
            _drain(spark, make, tmp_path, "dedup_r1", "ck_fs")}
    assert got1 == {1, 2}
    # the query is STOPPED now (availableNow terminated).  New files
    # arrive: fp 2 is a dup across the restart boundary, fp 5 is new.
    with open(src / "b1.jsonl", "w") as f:
        for fp, doc, val in [(2, 21, 4.0), (5, 50, 0.5)]:
            f.write(json.dumps({"fingerprint": fp, "doc_id": doc,
                                "value": val}) + "\n")
    got2 = {r["fingerprint"]: r["doc_id"] for r in
            _drain(spark, make, tmp_path, "dedup_r2", "ck_fs")}
    assert got2 == {5: 50}          # fp 2 suppressed by restored state


def test_running_totals_state_survives_restart(spark, tmp_path):
    """Totals accumulated before the stop keep counting after the
    restart: the post-restart emission for a key carries the
    pre-restart n_events/total_value."""
    src = tmp_path / "tsrc"
    src.mkdir()
    with open(src / "b0.jsonl", "w") as f:
        for fp, doc, val in [(1, 10, 1.5), (2, 20, 2.0)]:
            f.write(json.dumps({"fingerprint": fp, "doc_id": doc,
                                "value": val}) + "\n")

    def make():
        raw = (spark.readStream.schema(SCHEMA)
               .option("maxFilesPerTrigger", 1).json(str(src)))
        return running_totals(raw.select(
            F.col("fingerprint").alias("user_id"), "value"))

    _drain(spark, make, tmp_path, "totals_r1", "ck_rt")
    with open(src / "b1.jsonl", "w") as f:
        f.write(json.dumps({"fingerprint": 1, "doc_id": 11,
                            "value": 9.0}) + "\n")
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in
           _drain(spark, make, tmp_path, "totals_r2", "ck_rt")}
    # only user 1 emits post-restart, WITH its pre-restart history
    assert got == {1: (2, 10.5)}


def test_scd2_state_survives_restart(spark, tmp_path):
    """SCD2 change detection across the restart boundary: a post-restart
    event equal to the key's pre-restart state is NOT a change; a
    genuinely new state continues the version counter from the
    checkpointed value."""
    from document_vector_pipeline_spark.streaming.stateful import (
        scd2_changes,
    )

    src = tmp_path / "s2src"
    src.mkdir()
    with open(src / "b0.jsonl", "w") as f:
        for u, st, sec, eid in [(1, "a", 10, 1), (2, "c", 15, 2)]:
            f.write(json.dumps({"user_id": u, "event_type": st,
                                "sec": sec, "event_id": eid}) + "\n")

    def make():
        raw = (spark.readStream.schema(EV_SCHEMA)
               .option("maxFilesPerTrigger", 1).json(str(src)))
        return scd2_changes(raw.select(
            "user_id", "event_type",
            F.timestamp_seconds("sec").alias("ts"), "event_id"))

    got1 = sorted((r["user_id"], r["event_type"], r["version"]) for r in
                  _drain(spark, make, tmp_path, "scd2_r1", "ck_s2"))
    assert got1 == [(1, "a", 1), (2, "c", 1)]
    with open(src / "b1.jsonl", "w") as f:
        for u, st, sec, eid in [(1, "a", 20, 3),    # same state: no change
                                (1, "b", 30, 4),    # change -> version 2
                                (2, "c", 25, 5)]:   # same state: no change
            f.write(json.dumps({"user_id": u, "event_type": st,
                                "sec": sec, "event_id": eid}) + "\n")
    got2 = sorted((r["user_id"], r["event_type"], r["version"]) for r in
                  _drain(spark, make, tmp_path, "scd2_r2", "ck_s2"))
    assert got2 == [(1, "b", 2)]   # counter continued from the checkpoint
