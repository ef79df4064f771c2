"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` export the registry in ``uquery_rs_spark.queries`` — one
entry per implemented operator from SURVEY.md §2, each with a DuckDB oracle
(or ``None`` → rows-only check for non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from uquery_rs_spark import queries as _q

_q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return _q.REGISTRY["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One callable per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in _q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return {name: q.oracle for name, q in _q.REGISTRY.items() if q.oracle is not None}
