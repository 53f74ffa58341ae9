"""A12 — file-provenance audit vs a filename-aware DuckDB run (the
registry oracle can't see filenames through the driver's views, so the
equivalence check lives here with the real paths)."""

from __future__ import annotations

import duckdb

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries


def test_file_inventory_matches_duckdb(spark, sf_dir):
    got = {
        (r.tbl, r.file_name, r.n_rows)
        for r in all_queries()["file_inventory"].spark_fn(spark, sf_dir).collect()
    }
    want = set()
    for tbl in ("documents", "events", "orders"):
        for fn, n in duckdb.sql(
            f"""SELECT regexp_extract(filename, '([^/]+)$', 1), count(*)
                FROM read_parquet('{sf_dir}/{tbl}.parquet', filename=true)
                GROUP BY 1"""
        ).fetchall():
            want.add((tbl, fn, n))
    assert got == want
    assert len(got) >= 3
