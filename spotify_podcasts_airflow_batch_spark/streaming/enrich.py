"""Stream-side enrichment and deduplication.

The reference enriches each day's chart batch by calling the episode
API and left-merging on the driver (spotify_eps.py:195-208). The
continuous form of that pattern is a stream-static join: the chart
stream joins a (periodically refreshed) dimension snapshot, broadcast
to every task — no state, no shuffle of the stream side, and the dim
can be swapped between micro-batches.

Streaming dedup is the other standing concern of an append-only
ingest (at-least-once sources redeliver): Spark keeps the seen-key
set as operator state, and the watermark bounds it — keys older than
the delay are forgotten, which is what makes exactly-once-per-key
feasible on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on: list[str] | str, how: str = "left"
) -> DataFrame:
    """Stream-static broadcast join — the streaming form of the
    reference's chart×episodes left merge."""
    return stream.join(F.broadcast(dim), on, how)


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon. State size is
    bounded by keys seen in the last ``delay`` of event time —
    ``dropDuplicatesWithinWatermark`` evicts a key's state once the
    watermark passes its event time, so redeliveries with a perturbed
    timestamp still dedup (plain ``dropDuplicates`` would need the
    exact timestamp in the key to ever clean state)."""
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
