"""Streaming ANN ingest (streaming/ann_ingest.py): stream ≡ batch —
the same waves ingested as micro-batches or as batch append_batch
calls produce an identical live index and identical served results;
a replayed micro-batch is idempotent."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
    _ivfpq_serve,
)
from spotify_podcasts_airflow_batch_spark.plans.similarity4 import (
    _load_artifacts,
    append_batch,
    build_base_store,
    incremental_live_index,
)
from spotify_podcasts_airflow_batch_spark.sources.readers import table
from spotify_podcasts_airflow_batch_spark.streaming.ann_ingest import (
    stream_ann_ingest,
)


def _vec_rows(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return [(r.vec_id, list(r.embedding)) for r in rows]


def _write_vecs(path: str, rows) -> None:
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
            }
        ),
        path,
    )


@pytest.fixture(scope="module")
def split_vectors(spark, sf_dir, tmp_path_factory):
    """Base slice (vec_id % 3 == 0) + the rest split across 3 monotone
    stream files."""
    tmp = tmp_path_factory.mktemp("ann_stream")
    rows = _vec_rows(spark, sf_dir)
    base = [r for r in rows if r[0] % 3 == 0]
    rest = [r for r in rows if r[0] % 3 != 0]
    base_dir = tmp / "base"
    base_dir.mkdir()
    _write_vecs(str(base_dir / "base.parquet"), base)
    in_dir = tmp / "incoming"
    in_dir.mkdir()
    third = (len(rest) + 2) // 3
    waves = []
    for i in range(3):
        chunk = rest[i * third : (i + 1) * third]
        if chunk:
            _write_vecs(str(in_dir / f"part-{i:03d}.parquet"), chunk)
            waves.append(chunk)
    return str(tmp), str(base_dir), str(in_dir), waves


def _index_content(spark, root):
    return {
        (r.vec_id, tuple(r.codes), r.cell_id)
        for r in incremental_live_index(spark, root).collect()
    }


def test_stream_equals_batch_ingest(spark, sf_dir, split_vectors):
    tmp, base_dir, in_dir, waves = split_vectors
    base = spark.read.parquet(base_dir)

    batch_root = os.path.join(tmp, "store_batch")
    build_base_store(spark, "", base, batch_root)
    for i, wave in enumerate(waves):
        ids = [r[0] for r in wave]
        batch_df = spark.read.parquet(in_dir).where(
            F.col("vec_id").isin(ids)
        )
        append_batch(spark, batch_root, batch_df, epoch=1 + i)

    stream_root = os.path.join(tmp, "store_stream")
    build_base_store(spark, "", base, stream_root)
    q = stream_ann_ingest(
        spark,
        in_dir,
        stream_root,
        os.path.join(tmp, "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    got_b = _index_content(spark, batch_root)
    got_s = _index_content(spark, stream_root)
    assert got_b == got_s and got_s

    # served results identical too (frozen artifacts are shared)
    cents, cells = _load_artifacts(stream_root)

    def serve(root):
        return sorted(
            tuple(r)
            for r in _ivfpq_serve(
                spark,
                sf_dir,
                incremental_live_index(spark, root),
                cents=cents,
                cells=cells,
            ).collect()
        )

    assert serve(batch_root) == serve(stream_root)


def test_replayed_epoch_is_idempotent(spark, sf_dir, split_vectors):
    """append_batch dynamically overwrites its epoch partition — the
    exact same rows land on replay, no duplicates."""
    tmp, base_dir, in_dir, waves = split_vectors
    root = os.path.join(tmp, "store_replay")
    base = spark.read.parquet(base_dir)
    build_base_store(spark, "", base, root)
    ids = [r[0] for r in waves[0]]
    batch = spark.read.parquet(in_dir).where(F.col("vec_id").isin(ids))
    append_batch(spark, root, batch, epoch=1)
    first = _index_content(spark, root)
    append_batch(spark, root, batch, epoch=1)  # the replay
    assert _index_content(spark, root) == first
    seg = spark.read.parquet(os.path.join(root, "segments"))
    assert seg.count() == seg.select("vec_id").distinct().count()


def test_stream_derives_epoch_base_after_batch_appends(
    spark, sf_dir, split_vectors, tmp_path
):
    """ADVICE r9 #2: a stream started on a store that already has
    batch appends must land AFTER them (derived epoch_base =
    max existing + 1), and an explicit epoch_base that collides with
    existing segments is rejected before any write."""
    import glob

    from spotify_podcasts_airflow_batch_spark.streaming.ann_ingest import (
        next_epoch,
    )

    tmp, base_dir, in_dir, waves = split_vectors
    root = os.path.join(tmp, "store_epochbase")
    base = spark.read.parquet(base_dir)
    build_base_store(spark, "", base, root)
    assert next_epoch(root) == 1
    ids = [r[0] for r in waves[0]]
    batch = spark.read.parquet(in_dir).where(F.col("vec_id").isin(ids))
    append_batch(spark, root, batch, epoch=1)
    append_batch(spark, root, batch, epoch=2)
    assert next_epoch(root) == 3
    with pytest.raises(ValueError, match="collides"):
        stream_ann_ingest(
            spark, in_dir, root, str(tmp_path / "ck_bad"), epoch_base=2
        )
    q = stream_ann_ingest(spark, in_dir, root, str(tmp_path / "ck_ok"))
    assert q.awaitTermination(180)
    epochs = {
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(os.path.join(root, "segments", "epoch=*"))
    }
    # batch epochs 1-2 survive; streamed batches appended from 3 up
    assert {0, 1, 2}.issubset(epochs) and max(epochs) >= 3


def test_stream_restart_requires_explicit_epoch_base(
    spark, sf_dir, split_vectors, tmp_path
):
    """Restarting over an existing checkpoint must not silently derive
    a new epoch_base — replayed batches would land as fresh epochs
    instead of idempotently overwriting their own."""
    tmp, base_dir, in_dir, waves = split_vectors
    root = os.path.join(tmp, "store_restart")
    build_base_store(spark, "", spark.read.parquet(base_dir), root)
    ckpt = tmp_path / "ck_restart"
    (ckpt / "commits").mkdir(parents=True)
    (ckpt / "commits" / "0").write_text("{}")
    with pytest.raises(ValueError, match="checkpoint"):
        stream_ann_ingest(spark, in_dir, root, str(ckpt))
