"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python tools/capture_plans.py <out_dir> <suffix> <key> [key ...]
e.g.   python tools/capture_plans.py plans/r13 before text_bm25_indexed

Each key's plan lands in <out_dir>/<key>_<suffix>.txt.  Building the
DataFrame may run eager setup jobs (index builds, checkpoints) — only
the FINAL query's physical plan is captured, which is what the serving
path executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    from document_vector_pipeline_spark.session import get_spark
    spark = get_spark("capture_plans")
    queries = entrymod.queries()
    for k in keys:
        df = queries[k](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        path = os.path.join(out_dir, f"{k}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
