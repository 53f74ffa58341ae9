"""Ranking operators.

The reference assigns chart positions with a driver-side enumerate over
a per-region Python loop (``spotify_eps.py:74-90``: ``rank: i+1`` while
iterating one region at a time, 22 sequential HTTP+pandas passes).
Spark-first this is a single window: one shuffle on the group key,
rank assigned in parallel across all groups at once. At 100 TB the
window shuffles each group to one task — group cardinality (region ×
day) is high and per-group size is bounded (chart length), so there is
no skew concern; no global sort is ever performed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group with a dense, deterministic position column.

    ``order_by`` must define a total order (include a unique tiebreaker)
    so results are reproducible run-to-run — the driver-side enumerate
    in the reference was deterministic only because the API returned a
    pre-sorted list.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= F.lit(k))
    )


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep the single most-recent row per key (daily-updated-dataset
    semantics — the reference republishes the full consolidated CSV to
    Kaggle daily, implicitly keeping the latest version per episode;
    ``kaggle_update_dag.py``). One shuffle on the key; map-side nothing
    to pre-aggregate since whole rows are kept."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
