"""D13 pca_project: the distributed Gram-matrix + eigensolve pipeline
must agree with a plain numpy PCA computed driver-side on the full
(small) test corpus — component direction (up to the pinned sign) and
per-vector projections.
"""

from __future__ import annotations

import numpy as np

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries
from spotify_podcasts_airflow_batch_spark.sources.readers import table


def test_pca_matches_numpy(spark, sf_dir):
    q = all_queries()["pca_project"]
    got = {r["vec_id"]: r["pc1_score"] for r in q.spark_fn(spark, sf_dir).collect()}

    rows = (
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    )
    ids = [r["vec_id"] for r in rows]
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xc = x - x.mean(axis=0)
    _, vecs = np.linalg.eigh(xc.T @ xc)
    comp = vecs[:, -1]
    nz = np.flatnonzero(np.abs(comp) > 1e-12)
    if len(nz) and comp[nz[0]] < 0:
        comp = -comp
    expect = xc @ comp

    assert len(got) == len(ids)
    err = max(abs(got[i] - e) for i, e in zip(ids, expect))
    assert err < 1e-3, f"max projection error {err}"
