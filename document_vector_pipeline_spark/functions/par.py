"""Driver-side overlap of independent Spark actions (optimization
guide §2.6: "actions are only sequential because your driver code calls
them sequentially").

A maintenance op like IVFIndex.upsert ends in two writes to DIFFERENT
directories derived from already-materialized inputs; an indexed hybrid
search runs a keyword leg and a vector leg whose eager prep (driver
collects, localCheckpoints) is independent.  Submitting those actions
from a small thread pool lets the scheduler back-fill the tail of one
job with tasks of the other instead of paying the sum of the walls.

Scale note: this changes WHEN jobs are submitted, never what any job
computes — results are bit-identical, and on a cluster the same overlap
fills executors idled by a job's straggler tail.  Job descriptions are
thread-local in Spark, so concurrent jobs keep their own labels.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


def run_parallel(*thunks):
    """Run the given zero-arg callables concurrently and return their
    results in argument order.  Exceptions propagate (first one wins);
    with a single thunk this degrades to a plain call."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def fan_out(df, min_parts: int | None = None):
    """Repartition an UNDER-partitioned input before CPU-dense per-row
    work (guide §2.5: "one huge unsplittable file … repartition
    immediately after the read").  A single-row-group parquet scans as
    ONE split no matter the byte knobs, so a codec/hash/signature
    stage inherits parallelism 1 and runs serial regardless of
    cores.  No-op whenever the input already has >= the session's
    default parallelism partitions — the production case, where a
    corpus arrives as many files and the extra shuffle would be pure
    waste.  Row ORDER changes (round-robin), row SET does not; the
    repartition is deterministic under retry (sort-before-repartition
    is on by default, SPARK-23207)."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
