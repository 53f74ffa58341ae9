"""The reference's daily chart cron as a LIVE streaming pipeline.

Batch form (pipeline/podcast.py) replays the DAG on stored tables;
this form wires the engine's streaming pieces end-to-end instead:

    chart-API streaming source (sources/chart_api.py — one microbatch
    per polled day, one partition per (day, region))
    → the A2 chart transform (URI prefix strip, column shaping;
      include/spotify_eps.py:82-88) as stream operators
    → idempotent date-partitioned parquet sink (streaming/sinks.py —
      foreachBatch + dynamic partition overwrite)

Checkpointed offsets make ingest exactly-once per day; partition
overwrite makes replays idempotent — together the two properties the
reference builds out of Airflow retries + per-day S3 overwrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.sources.chart_api import (
    EPISODE_URI_PREFIX,
    SHOW_URI_PREFIX,
    ChartDataSource,
)
from spotify_podcasts_airflow_batch_spark.streaming.sinks import (
    stream_to_daily_parquet,
)

_EP_PREFIX_LEN = len(EPISODE_URI_PREFIX)
_SHOW_PREFIX_LEN = len(SHOW_URI_PREFIX)


def transform_charts(charts: DataFrame) -> DataFrame:
    """A2 over a (possibly streaming) chart DataFrame: strip the URI
    prefixes, keep the reference's column shape. Pure projection —
    fuses into the source scan, streaming or batch."""
    return charts.select(
        "date",
        "rank",
        "region",
        "chartRankMove",
        F.substring("episodeUri", _EP_PREFIX_LEN + 1, 2_000_000).alias(
            "episodeUri"
        ),
        F.substring("showUri", _SHOW_PREFIX_LEN + 1, 2_000_000).alias("showUri"),
        "episodeName",
    )


def run_streaming_ingest(
    spark: SparkSession,
    out_path: str,
    checkpoint_path: str,
    start_date: str,
    end_date: str,
    regions: str,
    top_n: int = 50,
):
    """Start the bounded ingest (availableNow semantics via the
    source's end_date cap + the sink's availableNow trigger). Returns
    the StreamingQuery; callers awaitTermination."""
    from datetime import date as _date

    spark.dataSource.register(ChartDataSource)
    # The sink drains with availableNow, which consults latestOffset
    # ONCE — so the bounded ingest must expose the whole range in one
    # offset step. A long-running deployment would instead trigger on
    # processingTime with days_per_trigger=1 (the daily-poll pacing
    # tests/test_chart_datasource.py exercises).
    total_days = (
        _date.fromisoformat(end_date) - _date.fromisoformat(start_date)
    ).days + 1
    stream = (
        spark.readStream.format("spotify_charts")
        .option("regions", regions)
        .option("top_n", str(top_n))
        .option("start_date", start_date)
        .option("end_date", end_date)
        .option("days_per_trigger", str(total_days))
        .load()
    )
    return stream_to_daily_parquet(
        transform_charts(stream), out_path, checkpoint_path, ts_col="date"
    )
