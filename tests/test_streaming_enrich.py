"""Stream-static enrichment join + streaming dedup (at-least-once →
exactly-once-per-key)."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.sources.readers import table
from spotify_podcasts_airflow_batch_spark.streaming.enrich import (
    dedup_stream,
    enrich_stream,
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


@pytest.fixture()
def dup_events_dir(tmp_path, sf_dir):
    """The same events file delivered twice (two micro-batches) — the
    at-least-once redelivery scenario."""
    d = tmp_path / "events_dup"
    d.mkdir()
    src = os.path.join(sf_dir, "events.parquet")
    shutil.copy(src, d / "a.parquet")
    shutil.copy(src, d / "b.parquet")
    return str(d)


def test_stream_static_enrich_equals_batch(spark, sf_dir, events_dir):
    ev = table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_label", F.upper("event_type"))
    )
    stream = enrich_stream(
        read_events_stream(spark, events_dir), dim, on="event_type", how="left"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, count(type_label) AS labeled FROM enriched"
    ).collect()[0]
    n_batch = ev.count()
    assert got.n == n_batch
    assert got.labeled == n_batch  # every event found its dim row


def test_streaming_dedup_across_batches(spark, sf_dir, dup_events_dir):
    stream = dedup_stream(
        read_events_stream(spark, dup_events_dir, max_files_per_trigger=1),
        keys=["event_id"],
        event_time_col="ts",
        delay="90 days",  # horizon > the 30-day test window: nothing evicted
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM deduped").collect()[0].n
    want = table(spark, sf_dir, "events").count()  # each event exactly once
    assert got == want


def test_stream_to_daily_partitions_equals_batch(spark, sf_dir, events_dir, tmp_path):
    """foreachBatch → partitioned parquet: streamed output matches a
    batch write of the same data, date partitioning included."""
    from spotify_podcasts_airflow_batch_spark.streaming.sinks import (
        stream_to_daily_parquet,
    )

    out = str(tmp_path / "daily_out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_daily_parquet(
        read_events_stream(spark, events_dir), out, ckpt
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    ev = table(spark, sf_dir, "events")
    assert got.count() == ev.count()
    # date partitioning materialized
    n_dates = got.select("snapshot_date").distinct().count()
    want_dates = ev.select(F.col("ts").cast("date")).distinct().count()
    assert n_dates == want_dates
    # values survive the round trip
    assert (
        got.agg(F.round(F.sum("value"), 2)).collect()[0][0]
        == ev.agg(F.round(F.sum("value"), 2)).collect()[0][0]
    )


def test_stream_upsert_maintains_latest_per_key(spark, sf_dir, tmp_path):
    """Streaming A8: two micro-batches of interleaved user activity
    upsert into a bucketed current-state table; the final table equals
    batch latest-per-key over everything, and only one row per user
    survives."""
    from pyspark.sql import functions as F

    from spotify_podcasts_airflow_batch_spark.operators.ranking import (
        latest_per_key,
    )
    from spotify_podcasts_airflow_batch_spark.sources.readers import table
    from spotify_podcasts_airflow_batch_spark.streaming.sinks import (
        stream_upsert_latest,
    )
    from spotify_podcasts_airflow_batch_spark.streaming.windows import (
        read_events_stream,
    )

    ev = table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    # two files → two micro-batches (maxFilesPerTrigger=1); parity split
    # interleaves users so the second batch must UPDATE bucket rows
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = str(tmp_path / "state")
    q = stream_upsert_latest(
        read_events_stream(spark, src, max_files_per_trigger=1),
        out,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        r.user_id: (r.ts, r.event_id)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.user_id: (r.ts, r.event_id)
        for r in latest_per_key(
            ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
        ).collect()
    }
    assert got == want
    assert len(got) == ev.select("user_id").distinct().count()


def test_stream_daily_sink_survives_cross_batch_dates(
    spark, sf_dir, tmp_path
):
    """E6 regression (found by the E6b driver-hash promotion): two
    micro-batches touching the SAME dates must land side by side via
    the batch_epoch partition layer — date-only dynamic overwrite let
    the later batch silently clobber the earlier one's rows. A full
    replay of the stream overwrites exactly its own (date, epoch)
    partitions, so the table stays duplicate-free."""
    from pyspark.sql import functions as F

    from spotify_podcasts_airflow_batch_spark.sources.readers import table
    from spotify_podcasts_airflow_batch_spark.streaming.sinks import (
        stream_to_daily_parquet,
    )
    from spotify_podcasts_airflow_batch_spark.streaming.windows import (
        read_events_stream,
    )

    ev = table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    # parity split: both files cover the same date range, so with
    # one file per trigger every date spans both micro-batches
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out = str(tmp_path / "daily")
    q = stream_to_daily_parquet(
        read_events_stream(spark, src, max_files_per_trigger=1),
        out,
        str(tmp_path / "ck1"),
    )
    assert q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
    # replay from scratch (fresh checkpoint, same deterministic file
    # order): same epochs overwrite their own partitions — no dupes
    q2 = stream_to_daily_parquet(
        read_events_stream(spark, src, max_files_per_trigger=1),
        out,
        str(tmp_path / "ck2"),
    )
    assert q2.awaitTermination(180)
    assert spark.read.parquet(out).count() == ev.count()
