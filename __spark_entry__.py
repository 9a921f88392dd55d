"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``acuvate_spark.queries.REGISTRY``: every implemented
operator from SURVEY.md §2 (plus the training-data pipeline ops) is a
named query with, where SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from acuvate_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["getdata_page"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops, which get rows-only checks)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
