"""D24/D25/D26 — product-quantization ANN: Lloyd monotonicity of the
trained codebook and the recall dial's schema/range contract."""

from __future__ import annotations

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries
from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
    _PQ_NQ,
    pq_sample_distortion,
    pq_train_codebook,
)


def test_lloyd_training_reduces_distortion(spark, sf_dir):
    """k-means guarantees non-increasing quantization error on the
    training sample; with 6dp centroid pinning the decrease holds up
    to rounding slack. This is the theorem-backed check that training
    actually trained (recall improvements are data-dependent; this is
    not)."""
    seed = pq_train_codebook(spark, sf_dir, iters=0)
    trained = pq_train_codebook(spark, sf_dir, iters=3)
    d_seed = pq_sample_distortion(spark, sf_dir, seed)
    d_trained = pq_sample_distortion(spark, sf_dir, trained)
    assert d_trained <= d_seed + 1e-6, (d_seed, d_trained)
    # and it should be a real improvement, not a no-op fixed point
    assert d_trained < d_seed * 0.999, (d_seed, d_trained)


def test_trained_recall_schema_and_range(spark, sf_dir):
    rows = (
        all_queries()["pq_trained_recall"].spark_fn(spark, sf_dir).collect()
    )
    assert len(rows) == _PQ_NQ
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert r.recall_bp == r.n_hits * 2000


def test_serving_path_equals_training_path(spark, sf_dir):
    """D24 serves the trained codebook; D26 rebuilds it via the
    training path directly. Their recalls must be identical rows —
    a split means serving and training diverged."""
    d25 = sorted(
        tuple(r)
        for r in all_queries()["pq_adc_recall"].spark_fn(spark, sf_dir).collect()
    )
    d26 = sorted(
        tuple(r)
        for r in all_queries()["pq_trained_recall"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    assert d25 == d26


def test_sampled_control_schema_and_range(spark, sf_dir):
    """The D25b control reports the same shape as D25. (No ordering
    assertion between trained and sampled recall: distortion descent
    is the theorem — recall movement is data-dependent, measured
    +1000 bp at sf0.1 but negative on the 500-vector sf0.001 toy.)"""
    rows = (
        all_queries()["pq_sampled_recall"].spark_fn(spark, sf_dir).collect()
    )
    assert len(rows) == _PQ_NQ
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert r.recall_bp == r.n_hits * 2000


def test_codebook_memo_is_keyed_per_dataset(spark, sf_dir):
    """The serving memo must (a) return the identical trained constant
    for repeated calls — one training job per (process, dataset) —
    and (b) never leak a codebook across datasets or iteration
    counts."""
    from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
        _PQ_CB_CACHE,
        pq_train_codebook_cached,
    )

    a1 = pq_train_codebook_cached(spark, sf_dir)
    a2 = pq_train_codebook_cached(spark, sf_dir)
    assert a1 is a2  # cache hit, not retrain
    b = pq_train_codebook_cached(spark, sf_dir, iters=0)
    assert b is not a1 and b != a1  # different key → different model
    assert all(k[0] == sf_dir for k in _PQ_CB_CACHE if k[0] == sf_dir)
