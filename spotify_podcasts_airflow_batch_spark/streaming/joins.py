"""Stream-stream joins (SURVEY.md §2 E7).

The reference only ever joins a batch against a static dimension
(spotify_eps.py:208); the missing continuous pattern is correlating
two live streams — e.g. attribute each purchase to the click that
preceded it. Spark buffers both sides as state; two things bound that
state so it runs forever: a watermark on each side (how late events
may arrive) and a time-range predicate on the join condition (how far
apart matching events may be). Spark derives the state-eviction policy
from the two together — without the range constraint, inner
stream-stream join state would grow without bound at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on ``key`` where the right event
    happens within (left_ts, left_ts + max_gap].

    Both watermarks + the two-sided range predicate are what let Spark
    evict buffered rows: a left row older than
    ``watermark + max_gap`` (event time) can never match again and is
    dropped from state. Outer variants additionally need both
    watermarks to know when an unmatched row is final.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_gap}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])


def click_purchase_attribution(events: DataFrame, max_gap: str = "30 minutes") -> DataFrame:
    """Attribution shape on the events schema: purchases joined to the
    clicks by the same user in the preceding ``max_gap``. Works on a
    batch OR streaming events DataFrame — the logical plan is the
    same; only the source differs (the property the E-series tests
    assert)."""
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    if purchases.isStreaming:
        clicks = clicks.withWatermark("click_ts", "1 hour")
        purchases = purchases.withWatermark("purchase_ts", "1 hour")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")
        )
    )
    return clicks.join(purchases, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "amount",
    )
