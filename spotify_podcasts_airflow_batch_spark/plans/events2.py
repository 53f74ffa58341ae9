"""Events analytics, part 2 (SURVEY.md §2 E31): per-user dynamic-time-
warping alignment between two event streams via COGROUPED
``applyInPandas`` — the per-key two-sided imperative escape hatch the
built-in operators genuinely can't express (the DP recurrence is
inherently sequential per pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.plans.registry import register
from spotify_podcasts_airflow_batch_spark.sources.readers import table

_DTW_SCHEMA = "user_id long, n_views long, n_buys long, dtw_dist double"


def dtw_distance(a, b):
    """O(n·m) dynamic-time-warping distance with |a-b| local cost,
    computed row by row with a numpy rolling array (two rows of state,
    never the full matrix)."""
    import numpy as np

    n, m = len(a), len(b)
    prev = np.empty(m + 1)
    prev[0] = 0.0
    prev[1:] = np.inf
    cur = np.empty(m + 1)
    for i in range(n):
        cur[0] = np.inf
        for j in range(1, m + 1):
            cur[j] = abs(a[i] - b[j - 1]) + min(
                prev[j], prev[j - 1], cur[j - 1]
            )
        prev, cur = cur, prev
    return float(prev[m])


@register("dtw_behavior_align", oracle=None)  # rows-only: sequential DP,
# not SQL-expressible; cross-checked against an independent pure-python
# DP in tests/test_dtw.py
def dtw_behavior_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E31 — behavioral-shape drift per user: DTW distance between the
    chronological `view`-value sequence and `purchase`-value sequence.
    The two streams are COGROUPED on user_id (one shuffle each, Arrow-
    batched into Python once per key group) — the cogrouped
    ``applyInPandas`` surface, for per-key logic that needs BOTH
    relations' rows in order and can't be folded into a join or window
    (the DP recurrence consumes its own output).

    Scale design: state is two per-user sequences, never the corpus;
    cost is Σ_u n_u·m_u, bounded by the per-user activity — hot users
    cost quadratically, so a real deployment caps sequence length
    (here data is bounded by construction). Sequences order by
    (ts, event_id) so results are partition-order independent."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    views = ev.where(F.col("event_type") == "view")
    buys = ev.where(F.col("event_type") == "purchase")

    def align(key, vdf, bdf):
        import pandas as pd

        vdf = vdf.sort_values(["ts", "event_id"])
        bdf = bdf.sort_values(["ts", "event_id"])
        if len(vdf) == 0 or len(bdf) == 0:
            return pd.DataFrame(
                {"user_id": [], "n_views": [], "n_buys": [], "dtw_dist": []}
            )
        d = dtw_distance(vdf["value"].to_numpy(), bdf["value"].to_numpy())
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_views": [len(vdf)],
                "n_buys": [len(bdf)],
                "dtw_dist": [round(d, 4)],
            }
        )

    return (
        views.groupBy("user_id")
        .cogroup(buys.groupBy("user_id"))
        .applyInPandas(align, schema=_DTW_SCHEMA)
    )
