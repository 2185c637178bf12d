"""Deterministic, cross-engine-reproducible hash expressions.

Everything here is defined in terms of md5 hex digests so the DuckDB oracle
can compute byte-identical values:  Spark `conv(substring(md5(x),1,n),16,10)`
== DuckDB `cast('0x'||substr(md5(x),1,n) as bigint)`.

These hashes power the hashing-trick embedder, MinHash, SimHash and the
document fingerprints.  md5 is a JVM intrinsic in Spark (codegen'd), so the
hot path stays off Python entirely.

Precision note: only integer ops (`%` on bigint, substring) are used —
never `/` on a >53-bit value, which would round-trip through double and
diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column, hex_digits: int = 15, start: int = 1) -> Column:
    """`hex_digits` hex chars of md5(col) starting at `start` (1-based),
    as a non-negative bigint.  15 hex digits = 60 bits, positive in int64."""
    return F.conv(F.substring(F.md5(col), start, hex_digits), 16, 10).cast("long")


def md5_long_seeded(col: Column, seed: int, hex_digits: int = 15) -> Column:
    """Seeded variant: md5(seed || '|' || col). Used for the MinHash
    permutation family h_i(x) = md5(i|x)."""
    return md5_long(F.concat(F.lit(str(seed)), F.lit("|"), col), hex_digits)


def token_bucket(col: Column, dim: int) -> Column:
    """Hashing-trick bucket for a token: 32-bit md5 prefix mod dim (exact
    integer arithmetic in both Spark and DuckDB)."""
    return (md5_long(col, hex_digits=8, start=1) % F.lit(dim)).cast("int")


def token_sign(col: Column) -> Column:
    """Deterministic ±1 sign for a token from md5 hex digit 9 — a bit range
    disjoint from the bucket bits (digits 1-8)."""
    return F.when(md5_long(col, hex_digits=1, start=9) % 2 == 0,
                  F.lit(1)).otherwise(F.lit(-1))
