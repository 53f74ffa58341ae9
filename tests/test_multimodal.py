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


def test_resize_plan_geometry(spark, sf_dir):
    from spotify_podcasts_airflow_batch_spark.operators.multimodal import (
        resize_plan,
    )

    docs = table(spark, sf_dir, "documents").limit(50)
    decoded = decode_media(attach_media(docs))
    rows = resize_plan(decoded, max_dim=32).collect()
    for r in rows:
        assert max(r.target_width, r.target_height) <= 32
        assert r.target_width >= 1 and r.target_height >= 1
        # no upscaling
        assert r.target_width <= r.width and r.target_height <= r.height
        # aspect ratio preserved within rounding
        if max(r.width, r.height) > 32:
            want = r.width / r.height
            got = r.target_width / r.target_height
            assert abs(want - got) / want < 0.15


def test_resize_plan_is_pure_jvm(spark, sf_dir):
    from spotify_podcasts_airflow_batch_spark.operators.multimodal import (
        resize_plan,
    )

    docs = table(spark, sf_dir, "documents").limit(5)
    decoded = decode_media(attach_media(docs))
    plan = (
        resize_plan(decoded)._jdf.queryExecution().executedPlan().toString()
    )
    # exactly one python-exchange stage: the decode; resize adds none
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_extract_features_contract(spark, sf_dir):
    from spotify_podcasts_airflow_batch_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    docs = table(spark, sf_dir, "documents").limit(30)
    decoded = decode_media(attach_media(docs))
    feats = extract_features(decoded).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.features) == FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-5  # L1-normalized
    # deterministic
    again = extract_features(decoded).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))
