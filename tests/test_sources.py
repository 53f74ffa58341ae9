"""Source-connector round trips (SURVEY.md §2 G)."""

from __future__ import annotations

import json
import os

from spotify_podcasts_airflow_batch_spark.sources.readers import (
    list_data_files,
    read_csv,
    read_json,
    read_parquet_many,
    table,
)


def test_read_parquet_many_merges_schema(spark, sf_dir, tmp_path):
    o = table(spark, sf_dir, "orders")
    a = str(tmp_path / "day_a")
    b = str(tmp_path / "day_b")
    o.select("o_orderkey", "o_orderstatus", "o_totalprice").write.parquet(a)
    o.select("o_orderkey", "o_orderstatus").write.parquet(b)  # schema drift
    merged = read_parquet_many(spark, [a, b])
    assert set(merged.columns) == {"o_orderkey", "o_orderstatus", "o_totalprice"}
    assert merged.count() == 2 * o.count()
    assert merged.where("o_totalprice IS NULL").count() == o.count()


def test_csv_round_trip(spark, sf_dir, tmp_path):
    c = table(spark, sf_dir, "customer")
    path = str(tmp_path / "customers_csv")
    c.write.option("header", "true").csv(path)
    back = read_csv(spark, path)
    assert back.count() == c.count()
    assert set(back.columns) == set(c.columns)


def test_json_round_trip(spark, tmp_path):
    path = tmp_path / "rows.json"
    with open(path, "w") as f:
        for i in range(10):
            f.write(json.dumps({"id": i, "name": f"row{i}", "score": i * 1.5}) + "\n")
    df = read_json(spark, str(path))
    assert df.count() == 10
    assert {"id", "name", "score"} <= set(df.columns)


def test_list_data_files(sf_dir):
    files = list_data_files(sf_dir)
    names = {os.path.basename(p) for p in files}
    assert "lineitem.parquet" in names and "events.parquet" in names
    assert all(p.endswith(".parquet") for p in files)


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Daily snapshots written with partitionBy(date) must let a date
    filter prune at the FILE level (PartitionFilters in the scan, not a
    post-scan Filter) — the property that makes reading one day out of
    a 3-year 100 TB history cost one day, not a full scan."""
    from pyspark.sql import functions as F

    from spotify_podcasts_airflow_batch_spark.sinks.writers import (
        write_daily_partitioned,
    )
    from spotify_podcasts_airflow_batch_spark.sources.readers import table

    ev = table(spark, sf_dir, "events").withColumn(
        "snapshot_date", F.col("ts").cast("date").cast("string")
    )
    out = str(tmp_path / "daily")
    write_daily_partitioned(ev, out)

    dates = [r.snapshot_date for r in ev.select("snapshot_date").distinct().collect()]
    pick = sorted(dates)[0]
    back = spark.read.parquet(out).where(F.col("snapshot_date") == pick)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert f"isnotnull(snapshot_date" in plan or pick in plan
    want = ev.where(F.col("snapshot_date") == pick).count()
    assert back.count() == want


def test_partition_overwrite_is_surgical(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite replaces ONLY the rewritten date —
    other partitions survive byte-for-byte (the reference's per-day S3
    key replace, distributed)."""
    from pyspark.sql import functions as F

    from spotify_podcasts_airflow_batch_spark.sinks.writers import (
        write_daily_partitioned,
    )
    from spotify_podcasts_airflow_batch_spark.sources.readers import table

    ev = table(spark, sf_dir, "events").withColumn(
        "snapshot_date", F.col("ts").cast("date").cast("string")
    )
    out = str(tmp_path / "daily2")
    write_daily_partitioned(ev, out)
    total_before = spark.read.parquet(out).count()

    dates = sorted(
        r.snapshot_date for r in ev.select("snapshot_date").distinct().collect()
    )
    pick = dates[1]
    one_day = ev.where(F.col("snapshot_date") == pick).limit(5)
    write_daily_partitioned(one_day, out)  # re-write just that date

    after = spark.read.parquet(out)
    assert after.where(F.col("snapshot_date") == pick).count() == 5
    other = after.where(F.col("snapshot_date") != pick).count()
    assert other == total_before - ev.where(F.col("snapshot_date") == pick).count()
