"""D7b — integer micro-unit Lloyd SSE audit: the theorem-backed
monotonicity check that makes the D7 k-means fixed point
driver-checkable."""

from __future__ import annotations

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries


def test_sse_is_monotone_nonincreasing(spark, sf_dir):
    rows = sorted(
        (r.iter, r.sse_u)
        for r in all_queries()["kmeans_audit"].spark_fn(spark, sf_dir).collect()
    )
    assert [i for i, _ in rows] == [0, 1, 2]
    sses = [s for _, s in rows]
    assert sses[1] <= sses[0] and sses[2] <= sses[1], sses
    # and the first update must be a real improvement, not a no-op
    assert sses[1] < sses[0], sses


def test_matches_d7_cluster_count_contract(spark, sf_dir):
    """Sanity tie to D7: the audit and kmeans_lloyd share seeding and
    iteration count, so D7's assignment must use <= k clusters and
    the audit must report exactly iters+1 rows."""
    d7 = all_queries()["kmeans_lloyd"].spark_fn(spark, sf_dir)
    n_clusters = d7.select("cluster").distinct().count()
    assert 1 <= n_clusters <= 8
    audit = all_queries()["kmeans_audit"].spark_fn(spark, sf_dir)
    assert audit.count() == 3
