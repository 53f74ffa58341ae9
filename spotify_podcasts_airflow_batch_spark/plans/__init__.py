from spotify_podcasts_airflow_batch_spark.plans.registry import (
    Query,
    all_queries,
    register,
)

__all__ = ["Query", "register", "all_queries"]
