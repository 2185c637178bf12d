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


def sweep(sf: str) -> int:
    """Plan-lint EVERY queries() key: build each key's DataFrame (index
    builds / versioned commits / stream drains included), read its
    executed plan, and record the reviewer signals — Exchange count,
    broadcast joins, Arrow batches — while HARD-FAILING on any
    row-at-a-time Python eval (BatchEvalPython): the no-slow-path
    invariant the whole repo claims, machine-checked key by key.
    Writes PLANAUDIT.json and prints a summary."""
    import json

    from document_vector_pipeline_spark import get_spark
    spark = get_spark("plan-audit-sweep", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    rows, bad = {}, []
    for i, (key, fn) in enumerate(qs.items(), 1):
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows[key] = {
                "exchanges": plan.count("Exchange"),
                "broadcast_joins": plan.count("BroadcastHashJoin"),
                "arrow_batches": (plan.count("ArrowEvalPython")
                                  + plan.count("MapInPandas")
                                  + plan.count("FlatMapGroupsInPandas")),
                "row_python": plan.count("BatchEvalPython"),
            }
            if rows[key]["row_python"]:
                bad.append(key)
            print(f"[{i}/{len(qs)}] {key:32s} ex={rows[key]['exchanges']:3d}"
                  f" bhj={rows[key]['broadcast_joins']} "
                  f"arrow={rows[key]['arrow_batches']} "
                  f"rowpy={rows[key]['row_python']}", flush=True)
        except Exception as ex:                        # noqa: BLE001
            rows[key] = {"error": f"{type(ex).__name__}: {ex}"[:200]}
            bad.append(key)
            print(f"[{i}/{len(qs)}] {key:32s} ERROR {ex}", flush=True)
    with open("PLANAUDIT.json", "w") as fh:
        json.dump(rows, fh, indent=1, sort_keys=True)
    print(f"--- sweep: {len(qs)} keys, {len(bad)} flagged "
          f"(row-python or error): {bad}")
    spark.stop()
    return 1 if bad else 0


def main() -> None:
    if sys.argv[1:2] == ["--sweep"]:
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        raise SystemExit(sweep(sf))
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
