"""Streaming incremental near-dup (streaming/dedup.py): stream ≡
batch under the ingest-order contract, batching-invariance, and the
index append catching cross-run duplicates."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spotify_podcasts_airflow_batch_spark.sources.readers import table
from spotify_podcasts_airflow_batch_spark.streaming.dedup import (
    build_signature_index,
    near_dup_flags,
    stream_incremental_near_dup,
)

_HIST_N = 40  # history = first 40 docs of the fixture corpus


def _doc_rows(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
        .collect()
    )
    return [tuple(r) for r in rows]


def _write_docs(path: str, rows) -> None:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array([r[3] for r in rows]),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        path,
    )


@pytest.fixture()
def split_corpus(spark, sf_dir, tmp_path):
    """History docs + 30 'incoming' docs (10 of them literal re-ingests
    of history text under new ids — guaranteed near-dups) split across
    3 monotone-doc_id files."""
    rows = _doc_rows(spark, sf_dir)
    hist, rest = rows[:_HIST_N], rows[_HIST_N : _HIST_N + 20]
    base_id = max(r[0] for r in rows) + 1000
    redup = [
        (base_id + i, h[1], h[2], "reingest", h[4])
        for i, h in enumerate(hist[:10])
    ]
    incoming = sorted(rest + redup, key=lambda r: r[0])
    hist_dir = tmp_path / "hist"
    hist_dir.mkdir()
    _write_docs(str(hist_dir / "docs.parquet"), hist)
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    third = (len(incoming) + 2) // 3
    for i in range(3):
        chunk = incoming[i * third : (i + 1) * third]
        if chunk:
            _write_docs(str(in_dir / f"part-{i:03d}.parquet"), chunk)
    return str(hist_dir), str(in_dir), incoming


def _read_docs(spark, path):
    return spark.read.parquet(path)


def _run_stream(spark, tmp_path, hist_dir, in_dir, tag, max_files=1):
    index = str(tmp_path / f"index_{tag}")
    out = str(tmp_path / f"flags_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    build_signature_index(spark, _read_docs(spark, hist_dir), index)
    q = stream_incremental_near_dup(
        spark, in_dir, index, out, ckpt, max_files_per_trigger=max_files
    )
    q.awaitTermination(180)
    return index, out


def test_stream_equals_batch_and_batching_invariant(
    spark, tmp_path, split_corpus
):
    hist_dir, in_dir, incoming = split_corpus
    index_a, out_a = _run_stream(
        spark, tmp_path, hist_dir, in_dir, "one_by_one", max_files=1
    )
    index_b, out_b = _run_stream(
        spark, tmp_path, hist_dir, in_dir, "all_at_once", max_files=10
    )
    got_a = {
        r.doc_id: r.is_near_dup
        for r in spark.read.parquet(out_a).collect()
    }
    got_b = {
        r.doc_id: r.is_near_dup
        for r in spark.read.parquet(out_b).collect()
    }
    # batch twin: one shot over the full incoming slice
    from spotify_podcasts_airflow_batch_spark.streaming.dedup import (
        banded_signatures,
    )

    hist_banded = banded_signatures(_read_docs(spark, hist_dir))
    want = {
        r.doc_id: r.is_near_dup
        for r in near_dup_flags(
            _read_docs(spark, in_dir), hist_banded
        ).collect()
    }
    assert got_a == want  # stream ≡ batch
    assert got_b == want  # invariant to micro-batch partitioning
    # the 10 literal re-ingests must all be flagged (identical text →
    # identical signatures → guaranteed band collision)
    redup_ids = [d for d, *_ in
                 [(r[0],) for r in incoming if r[3] == "reingest"]]
    assert redup_ids and all(want[d] == 1 for d in redup_ids)
    # at least one genuinely new doc is NOT flagged
    assert 0 in set(want.values())


def test_index_append_catches_cross_run_duplicates(
    spark, tmp_path, split_corpus
):
    """A second run whose docs duplicate FIRST-RUN docs (not history)
    must flag them — the property the per-batch index append buys."""
    hist_dir, in_dir, incoming = split_corpus
    index, out = _run_stream(spark, tmp_path, hist_dir, in_dir, "r1")
    # second wave: re-ingest two first-wave docs under fresh ids
    wave2_dir = tmp_path / "incoming2"
    wave2_dir.mkdir()
    base = max(r[0] for r in incoming) + 1000
    wave2 = [
        (base + i, r[1], r[2], "wave2", r[4])
        for i, r in enumerate(incoming[:2])
    ]
    _write_docs(str(wave2_dir / "part-000.parquet"), wave2)
    out2 = str(tmp_path / "flags_r2")
    q = stream_incremental_near_dup(
        spark, str(wave2_dir), index, out2, str(tmp_path / "ckpt_r2")
    )
    q.awaitTermination(180)
    got = {
        r.doc_id: r.is_near_dup
        for r in spark.read.parquet(out2).collect()
    }
    assert all(got[base + i] == 1 for i in range(2))
