"""Gap-based sessionization over an event stream (batch form).

Not present in the reference (its unit of grouping is the daily file),
but required for event-style analytics at scale. Classic two-window
formulation: a lag() marks gap starts, a running sum numbers sessions —
one shuffle on the user key, per-user sort, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign ``session_id`` (1-based per user) via gap > ``gap_minutes``."""
    order = [F.col(ts_col), F.col(tiebreak_col)]
    w_lag = Window.partitionBy(user_col).orderBy(*order)
    w_run = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer microseconds on both engines (DuckDB oracle: epoch_us) —
    # fractional-second drift can't flip the comparison.
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = (
        F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w_lag)
        > F.lit(gap_us)
    )
    flag = F.when(new_sess, F.lit(1)).otherwise(F.lit(0))
    # first event per user has lag=null → when() yields 0; running sum
    # starts sessions at 0, +1 below for 1-based ids.
    return df.withColumn("session_id", F.sum(flag).over(w_run) + F.lit(1))
