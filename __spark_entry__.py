"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over document_vector_pipeline_spark.contract, which holds the
full operator surface: one Spark callable plus (where expressible) one
DuckDB oracle per SURVEY.md §2 line.  See that module's docstring for the
cross-engine exactness rules that make value-hash comparison feasible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from document_vector_pipeline_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable queries() key."""
    return contract.oracle_sql()
