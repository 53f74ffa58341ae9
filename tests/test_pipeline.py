"""G — podcast pipeline end-to-end on sf0.001: daily run, consolidated
CSV, and idempotent backfill (the reference's core guarantees)."""

from __future__ import annotations

import os

import pytest

from spotify_podcasts_airflow_batch_spark.pipeline.podcast import PodcastPipeline


@pytest.fixture()
def pipe(spark, sf_dir, tmp_path):
    return PodcastPipeline(spark=spark, sf_dir=sf_dir, out_root=str(tmp_path))


def test_run_daily_end_to_end(pipe, spark):
    csv = pipe.run_daily()
    assert os.path.exists(csv)
    consolidated = (
        spark.read.option("header", "true").csv(os.path.dirname(csv))
    )
    ranks = {int(r["rank"]) for r in consolidated.select("rank").distinct().collect()}
    assert ranks == set(range(1, 11))
    # partitioned layout exists (one dir per chart date)
    parts = [p for p in os.listdir(pipe.charts_path) if p.startswith("snapshot_date=")]
    assert len(parts) >= 25  # ~30 days of events


def test_backfill_is_idempotent(pipe, spark):
    pipe.run_daily()
    before = spark.read.parquet(pipe.charts_path).count()
    # re-run a date slice twice — partition overwrite must not duplicate
    pipe.run_backfill("2024-01-05", "2024-01-10")
    pipe.run_backfill("2024-01-05", "2024-01-10")
    after = spark.read.parquet(pipe.charts_path).count()
    assert before == after


def test_mismatch_audit_zero_on_clean_join(pipe):
    enriched = pipe.enrich(pipe.build_charts())
    assert pipe.assert_no_mismatch(enriched) in (0, 1)  # count of flagged rows
    # users outside the customer dim produce NULL c_name → flagged
    flagged = enriched.where("__mismatch").count()
    unflagged = enriched.where("NOT __mismatch").count()
    assert flagged + unflagged == enriched.count()
