"""Bucketed-table layout: the co-located-join promise of SURVEY §4.

A join between two tables bucketed on the join key must not shuffle
either side — the Exchange nodes disappear because the catalog knows the
layout.  This is the 100 TB fact-to-fact join strategy (broadcast covers
small dims; bucketing covers big-big)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.sources import load_table, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    write_bucketed(li.withColumnRenamed("l_orderkey", "okey"), spark,
                   "li_b", "okey", 8, str(base / "li"))
    write_bucketed(o.withColumnRenamed("o_orderkey", "okey"), spark,
                   "o_b", "okey", 8, str(base / "o"))
    yield spark.table("li_b"), spark.table("o_b")
    spark.sql("drop table if exists li_b")
    spark.sql("drop table if exists o_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    li_b, o_b = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li_b.join(o_b, "okey").groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # neither join side shuffles; the only exchange is the final groupBy
    # on a different key
    assert plan.count("Exchange") <= 1
    # and the result is right (join actually works on the bucketed layout)
    n = j.agg(F.sum("count")).collect()[0][0]
    assert n == load_table(spark, SF, "lineitem").count()


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark, bucketed):
    li_b, _ = bucketed
    plan = (li_b.groupBy("okey").agg(F.sum("l_quantity"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
