"""Custom stateful streaming operator: per-user session FINALIZATION
with event-time timeouts (``applyInPandasWithState``).

Where streaming/sessionize.py maintains a running per-user aggregate
(update mode — every batch re-emits the key's latest totals), this
operator emits a record ONLY when a session completes: either a later
event arrives past the 30-min gap, or the event-time timeout fires
once the watermark passes ``last_ts + gap``. That emit-on-close
contract is what append-only sinks want — one immutable row per
session — and no built-in windowing expresses it when the payload is
arbitrary per-session state.

(Spark 4.x's ``transformWithStateInPandas`` is the newer runtime for
this shape — typed state variables + explicit timers — but its driver
worker needs ``google.protobuf``, absent from this environment; the
GroupState API expresses identical semantics and is what runs here.)

Scale: state is one fixed-width tuple per ACTIVE user key, hash-
partitioned by user_id across executors; the watermark bounds state
lifetime, so total state is O(users active within the gap horizon),
not O(users ever seen).

No reference analogue (the reference's unit of time is the daily file
drop — dags/spotify/spotify_eps_dag.py); this is the streaming-native
form of operators/sessionize.py's gap semantics.
"""

from __future__ import annotations

import math
from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

GAP_MINUTES = 30

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        # exact integer micro-units (the B9 sessionize convention):
        # per-event floor(value*1e6 + 0.5) summed as int64, so the
        # emitted total is independent of arrival/summation order and
        # bit-equal to any batch/SQL twin — round(sum(double), 4) is
        # neither (float addition is not associative, and engines
        # disagree at half boundaries)
        StructField("session_value_micros", LongType()),
        StructField("closed_by", StringType()),
    ]
)

# (session_start_us, last_ts_us, n_events, total_value_micros)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total_u", LongType()),
    ]
)


def _session_row(
    user_id: int, start_us: int, last_us: int, n: int, total_u: int, how: str
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.to_datetime(start_us, unit="us")],
            "session_end": [pd.to_datetime(last_us, unit="us")],
            "n_events": [n],
            "session_value_micros": [total_u],
            "closed_by": [how],
        }
    )


def _make_finalizer(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def finalize(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last_ts + gap with no new events: the
            # open session is complete
            start_us, last_us, n, total_u = state.get
            state.remove()
            yield _session_row(
                user_id, start_us, last_us, n, total_u, "timer"
            )
            return
        start_us, last_us, n, total_u = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts_us = events["ts"].astype("int64") // 1000
        for us, value in zip(ts_us, events["value"]):
            us = int(us)
            if n > 0 and us - last_us > gap_us:
                yield _session_row(
                    user_id, start_us, last_us, n, total_u, "gap"
                )
                start_us, n, total_u = us, 0, 0
            elif n == 0:
                start_us = us
            last_us = us
            n += 1
            # floor(x*1e6 + 0.5): the same IEEE ops as the Spark/SQL
            # twins — identical everywhere, unlike round()
            total_u += int(math.floor(float(value) * 1_000_000 + 0.5))
        state.update((start_us, last_us, n, total_u))
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    return finalize


def finalize_sessions(
    events: DataFrame, gap_minutes: int = GAP_MINUTES
) -> DataFrame:
    """events stream (user_id, ts, event_id, value) → completed-session
    stream. Caller must have applied ``withWatermark('ts', ...)``."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_finalizer(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
