"""Custom stateful streaming operators via applyInPandasWithState.

Spark's built-in streaming aggregations (windows, session_window) cover the
events analytics; these operators cover what they can't express:

- first_seen_filter: cross-microbatch EXACT DEDUP of a stream.  The state
  per key is a single seen-flag, so a document fingerprint that arrived in
  any earlier microbatch is dropped — the streaming twin of
  operators.dedup.exact_dedup_survivors, and the shape of every
  "emit-once" operator (alerting, CDC create-events, crawl frontiers).
- running_totals: per-key cumulative counters carried across microbatches
  (count + fixed-point value sum), i.e. an incrementally-maintained
  aggregate published every batch — the pattern for live per-source
  ingest counters at 100 TB (state is O(#keys), each batch touches only
  the keys it contains).

Both run identically under batch DataFrames for testing: pass a batch
frame and they fall back to the equivalent batch computation, mirroring
streaming/events.py's dual-mode contract.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_filter(df: DataFrame, key_col: str,
                      payload_cols: tuple[str, ...] = ()) -> DataFrame:
    """Keep only the FIRST arrival of each key across the whole stream.

    Streaming: state = one boolean per key; later microbatches emit
    nothing for seen keys.  Within a microbatch the winner is the row with
    the smallest payload tuple (deterministic, engine-order independent).
    Batch fallback: groupBy(key).min(payload) — the same semantics.
    """
    cols = [key_col, *payload_cols]
    out_schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}"
                           for c in cols)

    if not df.isStreaming:
        return (df.select(*cols)
                .groupBy(key_col)
                .agg(*[F.min(c).alias(c) for c in payload_cols]))

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            pdf = pdf[cols].sort_values(cols).head(1)
            if first is None or pdf.iloc[0].tolist() < first.iloc[0].tolist():
                first = pdf
        if first is not None:
            state.update((True,))
            yield first

    return (df.select(*cols)
            .groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, "seen boolean",
                                    "append", GroupStateTimeout.NoTimeout))


def running_totals(df: DataFrame, key_col: str = "user_id",
                   value_col: str = "value") -> DataFrame:
    """Cumulative (n_events, total_value) per key, emitted each microbatch.

    The value is accumulated as exact integer cents (state must be
    replay-deterministic; float accumulation order isn't).  Batch fallback:
    a plain groupBy — the "final" totals the stream converges to.
    """
    if not df.isStreaming:
        return (df.groupBy(key_col)
                .agg(F.count("*").alias("n_events"),
                     (F.sum(F.round(F.col(value_col) * 100.0, 0)
                            .cast("long")) / 100.0).alias("total_value")))

    out_schema = f"{key_col} bigint, n_events bigint, total_value double"

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(round(float(pdf[value_col].sum()) * 100))
        state.update((n, cents))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n],
                            "total_value": [cents / 100.0]})

    return (df.select(key_col, value_col)
            .groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, "n bigint, cents bigint",
                                    "update", GroupStateTimeout.NoTimeout))


def scd2_changes(df: DataFrame, key_col: str = "user_id",
                 state_col: str = "event_type", ts_col: str = "ts",
                 seq_col: str = "event_id") -> DataFrame:
    """Streaming SCD2 change detector: one output row per state CHANGE
    per key — (key, state, changed_at, version) — with (last_state,
    version) carried in GroupState across microbatches.  The streaming
    half of plans/temporal.scd2_build: a stream can only emit open-ended
    change events (closing an interval needs the NEXT change); the
    warehouse merge closes them, or the batch scd2_build recomputes the
    full interval table.

    Within a microbatch rows are ordered by (ts, seq) before diffing, so
    the output is deterministic and — under per-key in-order delivery
    across batches (what a keyed log gives you) — identical to the batch
    twin, which sorts each key's complete history.  Batch fallback: the
    change rows of scd2_build's window plan (ONE key shuffle)."""
    out_schema = (f"{key_col} {df.schema[key_col].dataType.simpleString()}, "
                  f"{state_col} {df.schema[state_col].dataType.simpleString()}, "
                  f"changed_at timestamp, version bigint")

    if not df.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
        changed = (F.lag(state_col).over(w).isNull()
                   | (F.col(state_col) != F.lag(state_col).over(w)))
        marked = (df.select(key_col, state_col, ts_col, seq_col)
                  .withColumn("__chg", changed).filter(F.col("__chg")))
        w2 = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
        return (marked
                .select(key_col, state_col,
                        F.col(ts_col).alias("changed_at"),
                        F.row_number().over(w2).cast("long")
                         .alias("version")))

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        last, ver = state.get if state.exists else (None, 0)
        out_k, out_s, out_t, out_v = [], [], [], []
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values([ts_col, seq_col])
        for _, r in rows.iterrows():
            s = r[state_col]
            if last is None or s != last:
                ver += 1
                out_k.append(key[0])
                out_s.append(s)
                out_t.append(r[ts_col])
                out_v.append(ver)
                last = s
        state.update((last, int(ver)))
        if out_k:
            yield pd.DataFrame({key_col: out_k, state_col: out_s,
                                "changed_at": out_t, "version": out_v})

    return (df.select(key_col, state_col, ts_col, seq_col)
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, out_schema, "last string, ver bigint",
                "append", GroupStateTimeout.NoTimeout))
