"""Driver-style comparator: every queries() key vs its oracle_sql() twin.

Replicates the driver's t2 correctness gate at sf0.01: run the Spark query
and the DuckDB oracle side by side, sort columns by name and rows by value,
and demand exact equality (floats included — the contract is engineered for
bit-identical results, see contract.py docstring).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    assert len(sdf) > 0, f"{name}: Spark result is empty"
    if name not in ORACLES:  # rows-only contract entry
        return
    ddf = ddb.execute(ORACLES[name]).df()
    s, d = canon(sdf), canon(ddf)
    assert list(s.columns) == list(d.columns), \
        f"{name}: columns {list(s.columns)} vs {list(d.columns)}"
    assert len(s) == len(d), f"{name}: rows {len(s)} vs {len(d)}"
    pd.testing.assert_frame_equal(s, d, check_exact=True,
                                  obj=f"{name} result")
