"""Streaming vector ingest into the incremental ANN store — the
streaming twin of plans/similarity4.append_batch (SURVEY §2 D42
runtime row).

Each micro-batch of (vec_id, embedding) rows is encoded against the
store's FROZEN day-0 quantizers (one shuffle-free O(batch)
projection) and landed as its own ``epoch=N`` segment partition of
the by-cell layout. ``append_batch`` dynamically OVERWRITES the epoch
partition, so an at-least-once replay of a micro-batch lands the
identical files instead of duplicating rows — the same idempotency
discipline as streaming/dedup.py. Stream ≡ batch is pinned in
tests/test_ann_stream_ingest.py: the same waves ingested via this
stream or via batch append_batch calls produce an identical live
index and identical served results.

At 100 TB this is the online path: vectors arrive continuously, the
index grows by partition-local appends, and the D40 staleness dial +
D34 centroid drift decide when the frozen quantizers earn a retrain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spotify_podcasts_airflow_batch_spark.plans.similarity4 import (
    append_batch,
)


def stream_ann_ingest(
    spark: SparkSession,
    vec_stream_dir: str,
    root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    epoch_base: int = 1,
):
    """foreachBatch driver: encode each micro-batch with the frozen
    artifacts and append it as segment epoch ``epoch_base + epoch_id``
    (epoch 0 is the day-0 base build). Returns the started query
    (Trigger.AvailableNow — drains what is present; leave it running
    with a processing-time trigger for a live feed)."""
    schema = spark.read.parquet(vec_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(vec_stream_dir)
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch(
            batch_df.sparkSession,
            root,
            batch_df.select("vec_id", "embedding"),
            epoch=epoch_base + int(epoch_id),
        )

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
