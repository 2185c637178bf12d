"""Expression utilities.

`bound` is the load-bearing one: Spark evaluates any expression referenced
inside a higher-order-function lambda ONCE PER ELEMENT (lambdas defeat
common-subexpression elimination), so e.g.

    F.transform(starts, lambda s: F.slice(words_expr, s, k))

re-runs the whole `words_expr` regex split for every element — turning a
linear scan into O(n²) per row.  Binding the expression through a
single-element transform makes it a lambda variable, evaluated once:

    bound(words_expr, lambda words: F.transform(starts, ...))

This pattern took the shingle/minhash/embedding expressions from O(n²) to
O(n) (57s -> ~1s on 5000 docs) and is used by every operator that feeds a
computed array into a HOF lambda.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bound(col: Column, f: Callable[[Column], Column]) -> Column:
    """Evaluate `col` once per row and pass it to `f` as a bound HOF
    lambda variable (see module docstring)."""
    return F.element_at(F.transform(F.array(col), f), 1)


def bound2(c1: Column, c2: Column,
           f: Callable[[Column, Column], Column]) -> Column:
    """Two-column variant of `bound`."""
    return bound(c1, lambda a: bound(c2, lambda b: f(a, b)))


def epoch_us(ts: Column) -> Column:
    """Exact microseconds since 1970-01-01 00:00:00 wall-clock.

    Parquet timestamps without a timezone read as TIMESTAMP_NTZ in Spark 4
    (`spark.sql.parquet.inferTimestampNTZ.enabled` defaults true), and
    ``unix_micros`` rejects NTZ input.  ``timestamp_diff`` accepts NTZ, and
    pinning the epoch literal as NTZ keeps the arithmetic timezone-free —
    the same integer DuckDB's ``epoch_us`` yields on the naive timestamp.
    TIMESTAMP (ltz) input is first cast to NTZ via the session timezone
    (UTC in every session this engine creates)."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        ts.cast("timestamp_ntz"))
