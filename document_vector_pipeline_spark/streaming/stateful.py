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
