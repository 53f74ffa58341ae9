"""Sinks (SURVEY.md §2 G).

The reference's sinks are: daily parquet to S3 prefixes, one
consolidated CSV, and a Kaggle dataset upload
(spotify_eps_dag.py, kaggle.py). Spark-first:

- daily parquet  → ``partitionBy(date)`` with DYNAMIC partition
  overwrite: re-running a backfill date replaces exactly that
  partition (idempotent, the property the reference gets by
  overwriting one S3 key per day).
- consolidated CSV → a coalesced CSV directory; at 100 TB you would
  never single-file it, so single_file=True is an explicit small-data
  convenience that routes through one final task.
- Kaggle/S3 → external-credential sinks, stubbed: the interface is
  the contract; this environment has no credentials or kaggle CLI.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_daily_partitioned(
    df: DataFrame, path: str, partition_col: str = "snapshot_date"
) -> None:
    """Idempotent per-date snapshot writer (dynamic partition
    overwrite ≍ the backfill DAG's per-day S3 object replace)."""
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .mode("overwrite")
        .parquet(path)
    )


def write_consolidated_csv(
    df: DataFrame, path: str, single_file: bool = False
) -> str:
    """Union-consolidated CSV (≍ top-podcasts-union/top_podcasts.csv).

    ``single_file`` coalesces to one task — only for dataset-export
    sized results (the Kaggle upload case), never for fact data."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)
    if single_file:
        part = glob.glob(os.path.join(path, "part-*.csv"))[0]
        final = os.path.join(path, "consolidated.csv")
        shutil.copyfile(part, final)
        return final
    return path


def upload_to_kaggle(csv_path: str, dataset_id: str, title: str) -> None:
    """External sink stub — reference shells out to the ``kaggle`` CLI
    (kaggle.py:create_kaggle_dataset). No credentials in this
    environment; the pipeline treats this sink as pluggable."""
    raise NotImplementedError(
        "kaggle upload requires external credentials; plug a real "
        "implementation via PodcastPipeline(kaggle_sink=...)"
    )


def upload_to_s3(local_path: str, bucket: str, key: str) -> None:
    """External sink stub — reference uses S3Hook.load_file. On a real
    cluster Spark writes s3a:// URIs directly; no driver-side upload
    step exists at all."""
    raise NotImplementedError(
        "write directly to s3a:// paths from Spark on a real cluster"
    )
