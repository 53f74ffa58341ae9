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


def test_replayed_batch_is_idempotent(spark, tmp_path, split_corpus):
    """Simulate the at-least-once crash window (ADVICE r8): run the
    probe body TWICE for the same epoch — the second run sees an index
    that already holds the batch's own band rows. Flags must not
    duplicate and must not flip to all-near-dup (no self-collision)."""
    from spotify_podcasts_airflow_batch_spark.streaming.dedup import (
        banded_signatures,
    )
    import pyspark.sql.functions as F

    hist_dir, in_dir, _ = split_corpus
    index = str(tmp_path / "index_replay")
    out = str(tmp_path / "flags_replay")
    build_signature_index(spark, _read_docs(spark, hist_dir), index)
    batch = _read_docs(spark, in_dir)

    def run_epoch_0():
        hist = (
            spark.read.parquet(index)
            .join(F.broadcast(batch.select("doc_id")), "doc_id", "anti")
        )
        flags = near_dup_flags(batch, hist)
        (
            flags.withColumn("epoch", F.lit(0))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out)
        )
        (
            banded_signatures(batch)
            .withColumn("epoch", F.lit(0))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(index)
        )

    run_epoch_0()
    first = {
        r.doc_id: r.is_near_dup for r in spark.read.parquet(out).collect()
    }
    n_flag_rows = spark.read.parquet(out).count()
    run_epoch_0()  # the replay: index already holds epoch-0 band rows
    again = {
        r.doc_id: r.is_near_dup for r in spark.read.parquet(out).collect()
    }
    assert again == first  # values unchanged — no self-collision flips
    assert spark.read.parquet(out).count() == n_flag_rows  # no dup rows
    assert 0 in set(again.values())  # not all-near-dup


def test_intra_batch_self_probe_is_linear(spark, tmp_path):
    """50 identical docs in ONE micro-batch (a template crawl dump):
    the min-per-bucket window must flag 49 and keep work linear in
    band rows — no quadratic pair join (VERDICT r8 item 7)."""
    from spotify_podcasts_airflow_batch_spark.streaming.dedup import (
        banded_signatures,
    )

    text = "the same boilerplate template page body " * 8
    rows = [(i, text, "en", "crawl", len(text)) for i in range(50)]
    d = tmp_path / "boiler"
    d.mkdir()
    _write_docs(str(d / "docs.parquet"), rows)
    docs = spark.read.parquet(str(d))
    empty_hist = banded_signatures(docs).limit(0)
    flags = {
        r.doc_id: r.is_near_dup
        for r in near_dup_flags(docs, empty_hist).collect()
    }
    assert flags[0] == 0 and all(flags[i] == 1 for i in range(1, 50))
    # linearity: the physical plan must contain no join between two
    # band-row relations (only the final flag left-join + semi probe)
    plan = near_dup_flags(docs, empty_hist)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


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
