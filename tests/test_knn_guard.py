"""The knn_brute_force driver-side collect is bounded: a query set
larger than the documented cap must fail loudly, not OOM the driver."""

from __future__ import annotations

import pytest

from spotify_podcasts_airflow_batch_spark.operators import similarity as sim
from spotify_podcasts_airflow_batch_spark.sources.readers import table


def test_knn_brute_force_query_cap(spark, sf_dir, monkeypatch):
    emb = table(spark, sf_dir, "embeddings")
    monkeypatch.setattr(sim, "KNN_MAX_QUERIES", 3)
    with pytest.raises(ValueError, match="caps it at 3"):
        sim.knn_brute_force(emb, emb.limit(10), k=2)


def test_knn_brute_force_under_cap_ok(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    out = sim.knn_brute_force(emb, emb.limit(2), k=3)
    rows = out.collect()
    assert 0 < len(rows) <= 2 * 3
