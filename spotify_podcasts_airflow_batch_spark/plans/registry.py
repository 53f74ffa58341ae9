"""Query catalog registry.

Each capability from SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (where expressible)
the equivalent ANSI SQL a DuckDB oracle can run on the same parquet
tables. ``__spark_entry__`` exposes the registry to the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

_PLAN_MODULES = (
    "spotify_podcasts_airflow_batch_spark.plans.relational",
    "spotify_podcasts_airflow_batch_spark.plans.relational2",
    "spotify_podcasts_airflow_batch_spark.plans.relational3",
    "spotify_podcasts_airflow_batch_spark.plans.relational4",
    "spotify_podcasts_airflow_batch_spark.plans.recsys",
    "spotify_podcasts_airflow_batch_spark.plans.reference_parity",
    "spotify_podcasts_airflow_batch_spark.plans.text",
    "spotify_podcasts_airflow_batch_spark.plans.text2",
    "spotify_podcasts_airflow_batch_spark.plans.text3",
    "spotify_podcasts_airflow_batch_spark.plans.llm_pipeline",
    "spotify_podcasts_airflow_batch_spark.plans.llm_pipeline2",
    "spotify_podcasts_airflow_batch_spark.plans.analytics",
    "spotify_podcasts_airflow_batch_spark.plans.analytics2",
    "spotify_podcasts_airflow_batch_spark.plans.similarity",
    "spotify_podcasts_airflow_batch_spark.plans.similarity2",
    "spotify_podcasts_airflow_batch_spark.plans.events",
    "spotify_podcasts_airflow_batch_spark.plans.events2",
    "spotify_podcasts_airflow_batch_spark.plans.timeseries",
    "spotify_podcasts_airflow_batch_spark.plans.multimodal",
)


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
