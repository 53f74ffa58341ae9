"""F/G — binaryFile source: real media-directory ingest plumbing into
the multimodal decode pass."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.sources.readers import (
    read_binary_files,
)


def _write_fake_media(tmp_path, n=6):
    d = tmp_path / "media"
    (d / "nested").mkdir(parents=True)
    paths = []
    for i in range(n):
        sub = d / "nested" if i % 2 else d
        p = sub / f"clip_{i}.bin"
        p.write_bytes(hashlib.md5(f"media{i}".encode()).digest() * (i + 1))
        paths.append(p)
    (d / "ignore.txt").write_text("not media")
    return str(d), paths


def test_binary_source_lists_globbed_files_with_content(spark, tmp_path):
    root, paths = _write_fake_media(tmp_path)
    df = read_binary_files(spark, root, glob="*.bin")
    rows = {r.path.split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {p.name for p in paths}  # .txt filtered out
    for p in paths:
        assert rows[p.name].length == p.stat().st_size
        assert bytes(rows[p.name].content) == p.read_bytes()


def test_binary_source_feeds_decode_pass(spark, tmp_path):
    from spotify_podcasts_airflow_batch_spark.operators.multimodal import (
        decode_media,
    )

    root, paths = _write_fake_media(tmp_path)
    media = (
        read_binary_files(spark, root, glob="*.bin")
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.lit("application/octet-stream").alias("media_type"),
            F.col("content").alias("payload"),
        )
    )
    decoded = decode_media(media)
    got = {r.n_bytes for r in decoded.collect()}
    assert got == {16 * (i + 1) for i in range(len(paths))}
    # metadata-only projection prunes the content column off the scan
    meta_only = read_binary_files(spark, root, glob="*.bin").select(
        "path", "length"
    )
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan.split("ReadSchema")[-1]
