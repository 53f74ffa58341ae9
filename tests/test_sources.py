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
