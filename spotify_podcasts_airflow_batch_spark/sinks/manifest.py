"""File-manifest scan planning — a table-format-style data-skipping
layer over plain parquet directories.

Delta/Iceberg keep per-file column min/max in their transaction log so
query planning touches only files whose range intersects the
predicate. Neither package ships in this environment, so the engine
carries the mechanism itself: a manifest build reads ONLY parquet
footers (KBs per file, never data pages), distributed over executors
via ``mapInPandas`` — at 100 TB / 128 MB files that is ~800k footer
reads spread across the cluster, with one small manifest DataFrame
out. The manifest is itself a table: persist it next to the data and
rebuild incrementally for new files only.

Pruning then intersects a range predicate with each file's [min, max]
envelope and hands the surviving file list straight to
``spark.read.parquet`` — the same plan-time file skipping a table
format's scan planning does. Combined with the clustered layouts in
``writers.py`` (range-sorted or z-ordered, which make the per-file
envelopes tight), selective predicates touch a handful of files
instead of the whole table.

Reference parity: the closest ancestor is the S3 key-listing loop in
spotify_eps_union_dag.py:17-38 — here listing is metadata-driven and
predicate-aware rather than read-everything.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.sources.readers import list_data_files

_EPOCH_NAIVE = datetime(1970, 1, 1)
_EPOCH_UTC = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _num(v) -> float | None:
    """Normalize a footer statistic to double: numerics pass through,
    timestamps become epoch microseconds (matching unix_micros under
    the engine's pinned-UTC reads). The micros are computed as exact
    integers from the timedelta — epoch micros stay below 2^53, so the
    double is exact. Non-orderable types → None."""
    if v is None:
        return None
    if isinstance(v, datetime):
        td = v - (_EPOCH_UTC if v.tzinfo is not None else _EPOCH_NAIVE)
        return float(
            td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
        )
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return None
    return float(v)


def build_manifest(
    spark: SparkSession,
    path: str,
    cols: list[str],
    files: list[str] | None = None,
) -> DataFrame:
    """Per-file stats manifest: ``path, n_rows, min_<c>, max_<c>``.

    Footer-only reads (pyarrow ``ParquetFile.metadata``), fanned out
    over executors; row-group stats fold into one per-file envelope.
    A file missing stats for a column gets nulls there — pruning then
    conservatively keeps it. ``files`` restricts the harvest to an
    explicit list (how refresh keeps its cost at O(new files)).
    """
    if files is None:
        files = list_data_files(path)
    schema = "path string, n_rows long, " + ", ".join(
        f"min_{c} double, max_{c} double" for c in cols
    )

    def scan(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                row: dict = {"path": p, "n_rows": md.num_rows}
                mins: dict = {}
                maxs: dict = {}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        name = col.path_in_schema
                        if name not in cols:
                            continue
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            mins[name] = maxs[name] = None
                            continue
                        lo, hi = _num(st.min), _num(st.max)
                        if name in mins and mins[name] is None:
                            continue  # a stats-less row group poisons the file
                        mins[name] = (
                            lo if name not in mins else min(mins[name], lo)
                        )
                        maxs[name] = (
                            hi if name not in maxs else max(maxs[name], hi)
                        )
                for c in cols:
                    row[f"min_{c}"] = mins.get(c)
                    row[f"max_{c}"] = maxs.get(c)
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=["path", "n_rows"]
                + [f"{m}_{c}" for c in cols for m in ("min", "max")],
            )

    paths_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(min(max(len(files), 1), 64))
    return paths_df.mapInPandas(scan, schema)


def prune_files(
    manifest: DataFrame, col: str, lo: float | None, hi: float | None
) -> list[str]:
    """Files whose [min, max] envelope may intersect [lo, hi].

    Files with null stats survive (conservative). The manifest is one
    row per file — small enough to collect even at 100 TB scale; a
    cluster deployment would instead join this against the scan's file
    index, but the planning decision is identical.
    """
    keep = F.lit(True)
    if hi is not None:
        keep = keep & (
            F.col(f"min_{col}").isNull() | (F.col(f"min_{col}") <= F.lit(hi))
        )
    if lo is not None:
        keep = keep & (
            F.col(f"max_{col}").isNull() | (F.col(f"max_{col}") >= F.lit(lo))
        )
    return [r.path for r in manifest.filter(keep).select("path").collect()]


def pruned_read(
    spark: SparkSession,
    manifest: DataFrame,
    col: str,
    lo: float | None,
    hi: float | None,
) -> DataFrame:
    """Manifest-planned scan: read only the files the predicate can
    touch. The residual filter still applies downstream (file skipping
    is a superset guarantee, same as any table format)."""
    files = prune_files(manifest, col, lo, hi)
    if not files:
        raise ValueError("no files survive the predicate; empty scan")
    return spark.read.parquet(*files)


def write_manifest(manifest: DataFrame, path: str) -> None:
    """Persist the manifest as its own (single-file) parquet table —
    the 'transaction log lite'. Re-running after new files land only
    needs footers for paths absent from the stored manifest."""
    manifest.coalesce(1).write.mode("overwrite").parquet(path)


def refresh_manifest(
    spark: SparkSession, data_path: str, manifest_path: str, cols: list[str]
) -> DataFrame:
    """Incremental manifest maintenance: footer-read only files not yet
    in the stored manifest, union, rewrite. Idempotent; cost is
    O(new files), matching a table-format commit."""
    current = list_data_files(data_path)
    if os.path.isdir(manifest_path) and list_data_files(manifest_path):
        old = spark.read.parquet(manifest_path)
        known = {r.path for r in old.select("path").collect()}
        new_files = [p for p in current if p not in known]
        if not new_files:
            return old
        schema_cols = [c[4:] for c in old.columns if c.startswith("min_")]
        if set(schema_cols) != set(cols):
            raise ValueError("manifest column set changed; rebuild required")
        # footer-read ONLY the new files — a post-hoc filter above the
        # harvest would still read every footer in the dataset
        tmp_manifest = build_manifest(spark, data_path, cols, files=new_files)
        merged = old.unionByName(tmp_manifest)
    else:
        merged = build_manifest(spark, data_path, cols)
    merged = merged.localCheckpoint()  # cut lineage before overwrite read-from-self
    write_manifest(merged, manifest_path)
    return merged
