from spotify_podcasts_airflow_batch_spark.streaming.windows import (
    read_events_stream,
    streaming_tumbling_agg,
)

__all__ = ["read_events_stream", "streaming_tumbling_agg"]
