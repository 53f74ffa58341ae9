"""Driver contract for the spark-graft builder (PySpark target).

Exposes the query catalog in
``spotify_podcasts_airflow_batch_spark/plans`` (SURVEY.md §2): every
implemented capability registers a ``(spark, sf_dir) -> DataFrame``
callable and, where SQL-expressible, a DuckDB oracle statement.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end chart report (SURVEY.md §2 A9)."""
    from spotify_podcasts_airflow_batch_spark.plans.reference_parity import (
        top_eps_report,
    )

    return top_eps_report(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
