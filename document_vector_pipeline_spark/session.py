"""SparkSession factory.

Tuned for the container (local[N], single JVM) but every setting is also the
one you'd want on a real cluster: AQE on (runtime re-plan, skew-join
handling, partition coalescing), Arrow on (pandas-UDF hot path), UTC session
timezone (oracle comparability), shuffle partitions sized to cores rather
than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "document_vector_pipeline_spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the bucketed stores/indexes read 16-64 directory paths per
        # scan; Spark's default parallelPartitionDiscovery.threshold=32
        # turns each such read into a 64-task listing JOB (measured:
        # ~0.3 s and a driver sync apiece, 70+ per bench run).  Listing
        # ≤ 128 dirs driver-side is faster on ANY filesystem — the
        # distributed path exists for thousands-of-partitions tables,
        # which still exceed this threshold (env-overridable).
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                os.environ.get("SPARK_GRAFT_LIST_THRESHOLD", "128"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # long single-JVM sessions (bench sweeps, notebooks) accumulate
        # shuffle files / block-manager state that only the ContextCleaner
        # releases, and it needs a JVM GC to notice dead references —
        # force one periodically so hour-long local sessions don't slow
        # down as state piles up (no effect on short-lived sessions)
        .config("spark.cleaner.periodicGC.interval", "3min")
        .config("spark.ui.enabled",
                os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
