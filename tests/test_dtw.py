"""E31 dtw_behavior_align: the cogrouped DTW result is cross-checked
value-for-value against an independent pure-python DP over the same
collected, deterministically ordered sequences."""

from __future__ import annotations

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries
from spotify_podcasts_airflow_batch_spark.sources.readers import table


def _ref_dtw(a, b):
    n, m = len(a), len(b)
    inf = float("inf")
    prev = [0.0] + [inf] * m
    for i in range(n):
        cur = [inf] * (m + 1)
        for j in range(1, m + 1):
            cur[j] = abs(a[i] - b[j - 1]) + min(prev[j], prev[j - 1], cur[j - 1])
        prev = cur
    return prev[m]


def test_dtw_matches_pure_python(spark, sf_dir):
    got = {
        r.user_id: (r.n_views, r.n_buys, r.dtw_dist)
        for r in all_queries()["dtw_behavior_align"].spark_fn(spark, sf_dir).collect()
    }

    rows = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    series: dict = {}
    for r in rows:
        if r.event_type in ("view", "purchase"):
            series.setdefault(r.user_id, {"view": [], "purchase": []})[
                r.event_type
            ].append((r.ts, r.event_id, r.value))
    want = {}
    for uid, s in series.items():
        v = [x[2] for x in sorted(s["view"])]
        b = [x[2] for x in sorted(s["purchase"])]
        if v and b:
            want[uid] = (len(v), len(b), round(_ref_dtw(v, b), 4))

    assert got == want
    assert len(got) > 0


def test_dtw_identical_sequences_zero():
    from spotify_podcasts_airflow_batch_spark.plans.events2 import dtw_distance

    assert dtw_distance([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]) == 0.0
    assert dtw_distance([1.0], [4.0]) == 3.0
    # warping: repeated elements align for free
    assert dtw_distance([1.0, 2.0], [1.0, 1.0, 2.0]) == 0.0
