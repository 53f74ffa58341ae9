"""Streaming sinks: micro-batch → the same idempotent daily-partition
layout the batch pipeline writes (the reference's per-day S3 prefix,
continuously).

``foreachBatch`` hands each micro-batch to the BATCH writer, so the
partition-overwrite idempotency (sinks/writers.py) carries over: a
replayed micro-batch rewrites exactly the dates it contains. Combined
with the checkpoint location this gives effectively-once file output
from an at-least-once stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.sinks.writers import (
    write_daily_partitioned,
)


def stream_to_daily_parquet(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
):
    """Continuously materialize an event stream into date partitions.
    Returns the started StreamingQuery (availableNow trigger: drain
    everything pending, then stop — the cron-batch replacement mode)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        write_daily_partitioned(
            batch_df.withColumn(
                "snapshot_date", F.col(ts_col).cast("date").cast("string")
            ),
            out_path,
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
