"""Partitioned parquet sink/source: losslessness + file-level pruning."""

import os

from pyspark.sql import functions as F

from document_vector_pipeline_spark import sources

SF = "/root/testdata/sf0.001"


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = os.path.join(str(tmp_path), "docs_by_lang")
    sources.write_partitioned(docs, path, "lang")

    back = sources.read_partitioned(spark, path)
    assert back.count() == docs.count()

    # losslessness per row (text survives the partition move)
    a = {r["doc_id"]: r["d"] for r in
         docs.select("doc_id", F.md5("text").alias("d")).collect()}
    b = {r["doc_id"]: r["d"] for r in
         back.select("doc_id", F.md5("text").alias("d")).collect()}
    assert a == b

    # partition pruning: the filter on the partition column must reach the
    # scan as a PartitionFilter (directory-level pruning, not a row filter)
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    assert len(langs) > 1
    filtered = back.filter(F.col("lang") == langs[0])
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    part_section = plan.split("PartitionFilters:", 1)
    assert len(part_section) == 2 and "lang" in part_section[1][:120]
    assert filtered.count() == docs.filter(F.col("lang") == langs[0]).count()
