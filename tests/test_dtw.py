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
    """Bounded inputs (every sf_dir user is under _DTW_CAP on both
    sides): the capped plan must be IDENTICAL to the uncapped
    reference and flag nothing."""
    out = all_queries()["dtw_behavior_align"].spark_fn(spark, sf_dir).collect()
    assert not any(r.capped for r in out)
    got = {r.user_id: (r.n_views, r.n_buys, r.dtw_dist) for r in out}

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


def test_dtw_hot_user_is_capped(spark, tmp_path):
    """A planted hot user (12k views, one side) must (a) run in bounded
    time — 512² DP cells, not 12k·m — (b) report TRUE pre-cap counts
    with capped=True, and (c) score the exact md5-ranked subsample an
    independent python replica selects."""
    import hashlib
    import time

    import pandas as pd

    from spotify_podcasts_airflow_batch_spark.plans.events2 import _DTW_CAP

    def h60(x: int) -> int:
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    base = pd.Timestamp("2024-01-01")
    rows = []
    # hot user 1: 12_000 views, 40 purchases
    for i in range(12_000):
        rows.append((i, base + pd.Timedelta(seconds=i), 1, "view",
                     float((i * 37) % 100)))
    for i in range(40):
        rows.append((20_000 + i, base + pd.Timedelta(seconds=i * 300), 1,
                     "purchase", float(i % 7)))
    # bounded user 2: stays under the cap on both sides
    for i in range(25):
        rows.append((30_000 + i, base + pd.Timedelta(seconds=i), 2, "view",
                     float(i)))
        rows.append((31_000 + i, base + pd.Timedelta(seconds=i + 1), 2,
                     "purchase", float(i)))
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)

    t0 = time.time()
    out = {
        r.user_id: r
        for r in all_queries()["dtw_behavior_align"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    wall = time.time() - t0
    assert wall < 120, f"hot user not bounded: {wall:.0f}s"

    hot = out[1]
    assert hot.capped and hot.n_views == 12_000 and hot.n_buys == 40

    # python replica of the cap: keep the _DTW_CAP lowest (h60, id)
    # view event_ids, re-order by (ts, event_id) == by id here
    views = sorted(range(12_000), key=lambda i: (h60(i), i))[:_DTW_CAP]
    vseq = [float((i * 37) % 100) for i in sorted(views)]
    bseq = [float(i % 7) for i in range(40)]
    assert hot.dtw_dist == round(_ref_dtw(vseq, bseq), 4)

    cold = out[2]
    assert not cold.capped and cold.n_views == 25 and cold.n_buys == 25
    cold_ref = _ref_dtw([float(i) for i in range(25)],
                        [float(i) for i in range(25)])
    assert cold.dtw_dist == round(cold_ref, 4)


def test_dtw_identical_sequences_zero():
    from spotify_podcasts_airflow_batch_spark.plans.events2 import dtw_distance

    assert dtw_distance([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]) == 0.0
    assert dtw_distance([1.0], [4.0]) == 3.0
    # warping: repeated elements align for free
    assert dtw_distance([1.0, 2.0], [1.0, 1.0, 2.0]) == 0.0
