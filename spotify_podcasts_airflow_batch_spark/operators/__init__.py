from spotify_podcasts_airflow_batch_spark.operators.joins import (
    asof_join,
    validated_left_join,
)
from spotify_podcasts_airflow_batch_spark.operators.ranking import (
    latest_per_key,
    topk_per_group,
)
from spotify_podcasts_airflow_batch_spark.operators.sessionize import sessionize

__all__ = [
    "topk_per_group",
    "latest_per_key",
    "validated_left_join",
    "asof_join",
    "sessionize",
]
