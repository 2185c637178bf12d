"""Sources: test tables and blob-store-like readers.

The reference ingests from Azure Blob Storage via a blob trigger
(BlobTriggerFunction.cs:40-56).  The Spark-native equivalents:

- batch:      ``spark.read.format("text").option("wholetext", True)`` /
              ``format("binaryFile")`` over a directory tree — one row per
              blob, `path` column = the blob URL.
- streaming:  ``spark.readStream.format("text"|"binaryFile")`` over the same
              directory — Structured Streaming's file source gives exactly
              the create-event semantics of the blob trigger (each new file
              is processed once, checkpointed).

Test tables are the driver-provided parquet at /root/testdata/sf*/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a test table; `events.ts` is TIMESTAMP(NANOS) in the driver
    parquet, which Spark 4 rejects outright — read it as long nanos
    (legacy conf) and truncate to microseconds with exact integer
    arithmetic (`div`, never `/`: 1.7e18 doesn't fit a double)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql() use."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_text_blobs(spark: SparkSession, path: str) -> DataFrame:
    """One row per text blob: (document_url, content).

    Parity: BlobTriggerFunction.cs:70-84 opens the blob stream and reads all
    lines; here the file source reads whole files distributed, and the later
    parse step splits lines.
    """
    from document_vector_pipeline_spark.operators.parse import strip_bom

    df = spark.read.format("text").option("wholetext", "true").load(path)
    return df.select(
        strip_bom(F.col("value")).alias("content"),
        F.input_file_name().alias("document_url"),
    )


def read_encoded_blobs(spark: SparkSession, path: str) -> DataFrame:
    """BOM/encoding-aware text blob source: binaryFile bytes decoded with
    byte-order-mark dispatch (UTF-8 / UTF-16 LE / UTF-16 BE, BOM stripped
    — parity with the reference's detectEncodingFromByteOrderMarks
    StreamReader, BlobTriggerFunction.cs:167-184).  Use instead of
    read_text_blobs when the corpus may contain Windows-authored files;
    the text source assumes clean UTF-8."""
    from document_vector_pipeline_spark.operators.parse import (
        decode_blob_text,
    )

    df = spark.read.format("binaryFile").load(path)
    return df.select(
        decode_blob_text(F.col("content")).alias("content"),
        F.col("path").alias("document_url"),
    )


def read_binary_blobs(spark: SparkSession, path: str) -> DataFrame:
    """One row per blob: (document_url, content binary, length, mod_time).

    Parity: the non-txt/md branch of BlobTriggerFunction.cs:86-101 downloads
    the blob bytes for Document Intelligence; binaryFile is the distributed
    equivalent (content bytes + metadata columns).
    """
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.col("path").alias("document_url"),
        F.col("content"),
        F.col("length"),
        F.col("modificationTime").alias("modification_time"),
    )


def stream_text_blobs(spark: SparkSession, path: str) -> DataFrame:
    """Streaming create-event source (blob-trigger parity, see module doc)."""
    from document_vector_pipeline_spark.operators.parse import strip_bom

    df = (spark.readStream.format("text")
          .option("wholetext", "true")
          .option("maxFilesPerTrigger", "64")
          .load(path))
    return df.select(
        strip_bom(F.col("value")).alias("content"),
        F.input_file_name().alias("document_url"),
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink — the interchange format every training-data
    pipeline speaks.  One file per partition, append-parallel, no schema
    sidecar needed (self-describing rows)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema: skipping inference avoids
    the extra full scan Spark otherwise runs, and pins column types (a
    100 TB read must not sample-guess that a long column is a string)."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink configured for lossless text round-trips: quoted fields
    with RFC-4180 doubled-quote escaping, and a header so the file stands
    alone."""
    (df.write.mode("overwrite")
     .option("header", "true")
     .option("quote", '"')
     .option("escape", '"')
     .csv(path))


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV source matching write_csv: multiLine handles embedded newlines
    inside quoted fields (without it a quoted newline silently splits a
    row — the classic CSV corruption).  Explicit schema, same rationale as
    read_jsonl.  multiLine makes gzip'd single files non-splittable; at
    100 TB keep many files so parallelism comes from file count."""
    return (spark.read.schema(schema)
            .option("header", "true")
            .option("quote", '"')
            .option("escape", '"')
            .option("multiLine", "true")
            .csv(path))


def write_bucketed(df: DataFrame, spark: SparkSession, table: str,
                   key: str, buckets: int, path: str,
                   sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) external table:
    rows are hash-partitioned on ``key`` into ``buckets`` files per write
    task AND the catalog records the layout, so joins/aggregations between
    tables co-bucketed on the same key skip their Exchange entirely —
    the pre-shuffled layout a 100 TB fact-to-fact join amortizes across
    every downstream query (broadcast only rescues small sides; bucketing
    is the big-join answer)."""
    # align write tasks to buckets first: without this every task emits a
    # file per bucket it touches (tasks × buckets small files — 512 for
    # 32×16); with it the layout lands as ~one file per bucket, which is
    # also what the downstream bucketed scan wants to see
    w = df.repartition(buckets, F.col(key)).write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    (w.option("path", path)
     .mode("overwrite")
     .format("parquet")
     .saveAsTable(table))


def write_partitioned(df: DataFrame, path: str, *part_cols: str) -> None:
    """Hive-style partitioned parquet sink (dir per partition value).
    Reads that filter on the partition columns prune whole directories —
    the layout choice that turns a 100 TB scan into a per-partition scan
    (verified via inputFiles in tests/test_sources_partitioned.py)."""
    df.write.partitionBy(*part_cols).mode("overwrite").parquet(path)


def read_partitioned(spark: SparkSession, path: str,
                     schema=None) -> DataFrame:
    """Read a partitioned parquet dataset; partition columns come back as
    directory-derived columns and filters on them prune at planning time.
    Pass ``schema`` (the written frame's StructType) when the dataset may
    be empty — a zero-row write leaves no files to infer from — or to
    skip footer inference on wide datasets."""
    reader = spark.read if schema is None else spark.read.schema(schema)
    return reader.parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (zlib default): the columnar interchange format for
    Hive/Trino-side consumers.  Same splittable-stripe scan properties as
    parquet — predicate pushdown and column pruning both apply."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source; schema comes from the file footer (self-describing,
    no inference scan)."""
    return spark.read.orc(path)
