"""G — hive-style partition layout: static pruning at plan time and
DYNAMIC partition pruning (runtime subquery filter) through a dim join
— the scan-elimination mechanics a 100 TB date-partitioned fact table
lives by."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.sinks.writers import (
    write_daily_partitioned,
)
from spotify_podcasts_airflow_batch_spark.sources.readers import table


@pytest.fixture(scope="module")
def fact_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_by_date")
    ev = table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    write_daily_partitioned(ev, path, partition_col="event_date")
    return path


def test_static_partition_pruning_reads_one_partition(spark, fact_path):
    df = spark.read.parquet(fact_path).filter(
        F.col("event_date") == "2024-01-05"
    )
    # inputFiles() lists the unpruned relation; the executed scan node
    # carries the partition filter — assert it landed there, then that
    # the answer matches a full-scan residual filter.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    full = (
        spark.read.parquet(fact_path)
        .filter(F.col("event_date").cast("string") == "2024-01-05")
        .count()
    )
    assert df.count() == full > 0


def test_dynamic_partition_pruning_fires_through_dim_join(
    spark, fact_path, tmp_path
):
    dim_path = str(tmp_path / "dim_dates")
    (
        spark.createDataFrame(
            [("2024-01-03", "keep"), ("2024-01-04", "keep"), ("2024-01-20", "drop")],
            "d string, flag string",
        )
        .withColumn("d", F.col("d").cast("date"))
        .write.parquet(dim_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("flag") == "keep")
    joined = fact.join(dim, fact.event_date == dim.d).groupBy(
        "event_date"
    ).agg(F.count(F.lit(1)).alias("n"))

    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized.lower(), optimized[:2000]

    got = {str(r.event_date): r.n for r in joined.collect()}
    want = {
        str(r.event_date): r.n
        for r in fact.filter(
            F.col("event_date").isin("2024-01-03", "2024-01-04")
        )
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) == 2
