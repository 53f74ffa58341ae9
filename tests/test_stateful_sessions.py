"""E9-streaming — transformWithStateInPandas session finalization:
the emit-on-close stream agrees with batch sessionize on every
completed session (bounds, counts, sums), and open tails stay unsent.
"""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.operators.sessionize import sessionize
from spotify_podcasts_airflow_batch_spark.sources.readers import table

GAP_US = 30 * 60 * 1_000_000


@pytest.fixture()
def events_dir(tmp_path, sf_dir):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "events.parquet")
    return str(d)


def test_finalized_sessions_match_batch(spark, sf_dir, events_dir):
    from spotify_podcasts_airflow_batch_spark.streaming.stateful import (
        finalize_sessions,
    )
    from spotify_podcasts_airflow_batch_spark.streaming.windows import (
        read_events_stream,
    )

    stream = read_events_stream(spark, events_dir).withWatermark(
        "ts", "0 seconds"
    )
    q = (
        finalize_sessions(stream)
        .writeStream.format("memory")
        .queryName("fin_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (
            r.user_id,
            r.session_start,
            r.session_end,
            r.n_events,
            r.session_value_micros,
        )
        for r in spark.sql(
            "SELECT user_id, session_start, session_end, n_events,"
            " session_value_micros FROM fin_sessions"
        ).collect()
    }

    ev = table(spark, sf_dir, "events")
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    sessions = (
        sessionize(ev, gap_minutes=30)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 1000000 + 0.5).cast("long")
            ).alias("session_value_micros"),
        )
    )
    # a session is complete once the watermark (max event time) passes
    # its end + gap; the per-user final session may remain open
    completed = sessions.where(
        F.expr(f"(unix_micros(session_end) + {GAP_US}) div 1000")
        <= F.lit(max_us // 1000)
    )
    want = {
        (
            r.user_id,
            r.session_start,
            r.session_end,
            r.n_events,
            r.session_value_micros,
        )
        for r in completed.collect()
    }
    assert got == want
    assert len(got) > 0
