"""Print the physical plan of any queries() key — the fastest way to
verify a pushdown/pruning/broadcast claim made in a docstring.

Usage: python tools/plan_audit.py KEY [sf_dir] [--formatted]

Builds the key's DataFrame (running whatever setup the key performs —
index builds, versioned commits — but NOT the final action) and prints
the executed plan, plus a one-line summary of the signals reviewers
grep for: Exchange count, PartitionFilters/PushedFilters presence,
BroadcastHashJoin count, and any row-at-a-time Python eval (there
should never be one — Arrow batches only).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    key = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "/root/testdata/sf0.001"
    fmt = "--formatted" in sys.argv

    from document_vector_pipeline_spark import get_spark
    spark = get_spark("plan-audit", cores=8)
    df = entrymod.queries()[key](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if fmt:
        df.explain("formatted")
    else:
        print(plan)
    print("--- summary ---")
    print(f"key: {key}  sf: {sf}")
    print(f"Exchange nodes:       {plan.count('Exchange')}")
    print(f"BroadcastHashJoin:    {plan.count('BroadcastHashJoin')}")
    print(f"PartitionFilters:     {'yes' if 'PartitionFilters: [' in plan else 'no'}")
    print(f"PushedFilters:        {'yes' if 'PushedFilters: [' in plan else 'no'}")
    print(f"ArrowEval (pandas):   {plan.count('ArrowEvalPython') + plan.count('MapInPandas')}")
    print(f"row-at-a-time Python: {plan.count('BatchEvalPython')}")
    spark.stop()


if __name__ == "__main__":
    main()
