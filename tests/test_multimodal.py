"""F2 — multimodal plumbing: schema, Arrow batching, frame sampling."""

from __future__ import annotations

from spotify_podcasts_airflow_batch_spark.operators.multimodal import (
    DECODED_SCHEMA,
    attach_media,
    decode_media,
    frame_sample,
)
from spotify_podcasts_airflow_batch_spark.sources.readers import table


def test_decode_media_contract(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    decoded = decode_media(attach_media(docs))
    assert decoded.schema == DECODED_SCHEMA
    rows = decoded.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes > 0
        assert 16 <= r.width < 80 and 16 <= r.height < 80
        assert 1 <= r.n_frames <= 8
        assert len(r.thumb) == min(16, r.n_bytes)


def test_decode_is_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(20)
    a = sorted(map(tuple, decode_media(attach_media(docs)).collect()))
    b = sorted(map(tuple, decode_media(attach_media(docs)).collect()))
    assert a == b


def test_frame_sample_expansion(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(20)
    decoded = decode_media(attach_media(docs))
    frames = frame_sample(decoded, every=2).collect()
    n_frames = {r.doc_id: r.n_frames for r in decoded.collect()}
    from collections import Counter

    per_doc = Counter(r.doc_id for r in frames)
    for doc_id, n in n_frames.items():
        assert per_doc[doc_id] == (n + 1) // 2
