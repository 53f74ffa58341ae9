"""Watermarked stream-stream interval join (E7): the streaming run
over the same files equals the batch run of the same logical function.
"""

from __future__ import annotations

import os
import shutil

import pytest

from spotify_podcasts_airflow_batch_spark.sources.readers import table
from spotify_podcasts_airflow_batch_spark.streaming.joins import (
    click_purchase_attribution,
)
from spotify_podcasts_airflow_batch_spark.streaming.windows import (
    read_events_stream,
)


@pytest.fixture()
def events_dir(tmp_path, sf_dir):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "events.parquet")
    return str(d)


def test_stream_stream_join_equals_batch(spark, sf_dir, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir)
    joined = click_purchase_attribution(stream)
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("attributed").collect()
    want = click_purchase_attribution(table(spark, sf_dir, "events")).collect()
    assert len(want) > 0  # the fixture data must exercise the join
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
