#!/usr/bin/env python
"""Degenerate-input sweep: run every queries() key against a ZERO-ROW
replica of the testdata schema (and optionally a 1-row-per-table
replica) and report any key that raises.

The contract being enforced: a key given empty inputs either returns
an (evaluable) empty/defined DataFrame — matching what its DuckDB
oracle would produce on the same empty tables — or raises a
deliberate, documented ValueError.  Raw ZeroDivisionError /
IndexError / py4j analysis errors from internals are defects (the
round-7 ADVICE class: markov_stationary ZeroDivisionError,
diff_rows typed-empty union, silhouette null family).

Usage:
    python tools/empty_sweep.py [empty|tiny|nulls] [key_prefix ...]

Modes: ``empty`` = zero-row tables; ``tiny`` = one row per table;
``nulls`` = two rows per table, the second with every payload column
NULL (keys stay non-null — a null primary key is invalid input, not a
robustness scenario).
"""
import os
import sys
import traceback

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SRC = "/root/testdata/sf0.001"


# key columns stay non-null in the nulls replica (a null primary key is
# invalid input, not a robustness scenario); every payload column nulls
KEY_COLS = {"doc_id", "event_id", "vec_id", "o_orderkey", "l_orderkey",
            "l_linenumber", "c_custkey", "s_suppkey", "p_partkey",
            "n_nationkey", "r_regionkey"}


def build_replica(dst: str, n_rows: int, nulls: bool = False) -> None:
    import pyarrow as pa

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        out = os.path.join(dst, f"{t}.parquet")
        if os.path.exists(out):
            continue
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        if not nulls:
            pq.write_table(tbl.slice(0, n_rows), out)
            continue
        # one intact row + one row with every payload column NULL
        first = tbl.slice(0, 1)
        second = tbl.slice(1, 1)
        cols = []
        for i, f in enumerate(tbl.schema):
            if f.name in KEY_COLS:
                cols.append(second.column(i))
            else:
                cols.append(pa.nulls(1, f.type))
        nulled = pa.table(cols, schema=tbl.schema)
        pq.write_table(pa.concat_tables([first, nulled]), out)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "empty"
    prefixes = sys.argv[2:]
    n_rows = 0 if mode == "empty" else 1
    dst = os.path.join(ROOT, ".scratch", f"sweep_{mode}")
    build_replica(dst, n_rows, nulls=(mode == "nulls"))

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName(f"sweep-{mode}")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    qs = entry.queries()
    if prefixes:
        qs = {k: v for k, v in qs.items()
              if any(k.startswith(p) for p in prefixes)}

    ok, deliberate, failed = [], [], []
    for i, (key, fn) in enumerate(sorted(qs.items())):
        try:
            n = fn(spark, dst).count()
            ok.append((key, n))
            status = f"ok ({n} rows)"
        except ValueError as e:
            deliberate.append((key, str(e)))
            status = f"ValueError: {e}"
        except Exception as e:
            msg = traceback.format_exc().strip().splitlines()[-1]
            failed.append((key, msg))
            status = f"FAIL: {msg[:120]}"
        print(f"[{i + 1}/{len(qs)}] {key:32s} {status}", flush=True)

    print(f"\n=== {mode}: {len(ok)} ok, {len(deliberate)} deliberate "
          f"ValueError, {len(failed)} FAILED ===")
    for key, msg in failed:
        print(f"FAIL {key}: {msg[:200]}")
    for key, msg in deliberate:
        print(f"VALUEERROR {key}: {msg[:120]}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
