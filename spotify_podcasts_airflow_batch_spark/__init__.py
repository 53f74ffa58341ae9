"""PySpark-native analytics engine with the query/data-processing
capabilities of the Spotify-Podcasts-Airflow-Batch reference pipeline,
re-expressed Spark-first (DataFrame/SQL, Catalyst-optimized), plus the
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

See SURVEY.md for the capability inventory and architecture.
"""

from spotify_podcasts_airflow_batch_spark.session import get_spark

__all__ = ["get_spark"]
