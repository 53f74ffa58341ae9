"""G — streaming chart ingest end-to-end: source → transform → daily
partitions; equals the batch form and replays idempotently."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.pipeline.podcast_stream import (
    run_streaming_ingest,
    transform_charts,
)

DAYS = ("2024-10-22", "2024-10-23")
REGIONS = "us,gb,de"
TOP_N = 25


def _batch_equivalent(spark):
    from spotify_podcasts_airflow_batch_spark.sources.chart_api import (
        ChartDataSource,
    )

    spark.dataSource.register(ChartDataSource)
    parts = []
    for day in DAYS:
        parts.append(
            transform_charts(
                spark.read.format("spotify_charts")
                .option("regions", REGIONS)
                .option("top_n", str(TOP_N))
                .option("date", day)
                .load()
            )
        )
    return parts[0].unionByName(parts[1])


def test_streaming_ingest_equals_batch_and_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "top-charts")
    q = run_streaming_ingest(
        spark,
        out,
        str(tmp_path / "ckpt"),
        start_date=DAYS[0],
        end_date=DAYS[-1],
        regions=REGIONS,
        top_n=TOP_N,
    )
    q.awaitTermination(180)

    assert sorted(
        d for d in os.listdir(out) if d.startswith("snapshot_date=")
    ) == [f"snapshot_date={d}" for d in DAYS]

    # batch_epoch is the sink's replay-idempotency partition layer
    got = spark.read.parquet(out).drop("snapshot_date", "batch_epoch")
    want = _batch_equivalent(spark)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # prefixes really are stripped (reference include/spotify_eps.py:83-84)
    r = got.where((F.col("rank") == 1) & (F.col("region") == "us")).first()
    assert not r.episodeUri.startswith("spotify:")
    assert not r.showUri.startswith("spotify:")

    # replay with a FRESH checkpoint (the at-least-once worst case):
    # dynamic partition overwrite rewrites the same days — no dupes
    q2 = run_streaming_ingest(
        spark,
        out,
        str(tmp_path / "ckpt2"),
        start_date=DAYS[0],
        end_date=DAYS[-1],
        regions=REGIONS,
        top_n=TOP_N,
    )
    q2.awaitTermination(180)
    assert spark.read.parquet(out).count() == want.count()
