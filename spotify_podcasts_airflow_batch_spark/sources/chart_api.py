"""Chart-API ingest as a Spark Python DataSource (Spark 4.x).

The reference fetches each region's podcast chart with a driver-side
``for region in regions`` loop and ``pd.concat``s the results
(include/spotify_eps.py:89-95 ``get_transformed_podcastcharts``;
spotify_chart_dag.py:12 pins the 22-region list). Re-expressed
Spark-first, ingest IS a data source: one ``InputPartition`` per
region, so on a cluster 22 executors fetch in parallel, failures
retry per-partition, and the result is a DataFrame from the first
operator on — no driver loop, no concat.

The HTTP call itself is stubbed (no network, no credentials in this
environment): ``_fetch_chart_stub`` synthesizes a deterministic chart
for (chart, region, date) from the shared md5 hash family, shaped
exactly like the API items the reference consumes (chartRankMove +
full ``spotify:episode:``/``spotify:show:`` URIs —
include/spotify_eps.py:78-84). A real deployment swaps the stub for
the ``requests.get`` the reference uses; everything else (partitioning,
schema, downstream transforms) is already distributed.

Usage::

    spark.dataSource.register(ChartDataSource)
    df = (spark.read.format("spotify_charts")
          .option("regions", "us,gb,de")
          .option("date", "2024-10-22")
          .option("top_n", "200")
          .load())
"""

from __future__ import annotations

import hashlib
from datetime import date as _date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# spotify_chart_dag.py:12
DEFAULT_REGIONS = (
    "ar,au,at,br,ca,cl,co,fr,de,in,id,ie,it,jp,mx,nz,ph,pl,es,nl,gb,us"
)

# The URI prefixes the reference slices off (include/spotify_eps.py:
# 83-84, `episodeUri[16:]` / `showUri[13:]`). Canonical here — both
# the batch A2 transform and the streaming pipeline import these, so
# the slice lengths can never drift between them.
EPISODE_URI_PREFIX = "spotify:episode:"  # len 16
SHOW_URI_PREFIX = "spotify:show:"  # len 13

SCHEMA = (
    "date date, rank int, region string, chartRankMove string, "
    "episodeUri string, showUri string, episodeName string"
)

_MOVES = ("UP", "DOWN", "SAME", "NEW")


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _fetch_chart_stub(chart: str, region: str, day: str, top_n: int):
    """Deterministic fake of the podcastcharts API response: a ranked
    list of chart items. Pure function of (chart, region, day) — the
    same partition re-read (task retry, speculative exec) yields
    byte-identical rows, which is exactly the idempotence a real
    fetch-at-time-T cannot give you and a test CAN assert."""
    for i in range(top_n):
        # a stable per-region episode pool with cross-region overlap
        ep = _h(f"{chart}:{day}:{region}:{i}") % (top_n * 3)
        show = ep % 97
        yield (
            _date.fromisoformat(day),
            i + 1,
            region,
            _MOVES[_h(f"move:{day}:{region}:{ep}") % 4],
            f"spotify:episode:ep{ep:08d}",
            f"spotify:show:sh{show:05d}",
            f"Episode {ep} of show {show}",
        )


class _RegionPartition(InputPartition):
    def __init__(self, region: str):
        self.region = region


class ChartReader(DataSourceReader):
    def __init__(self, options: dict):
        self.chart = options.get("chart", "top_episodes")
        self.day = options.get("date", "2024-10-22")
        self.top_n = int(options.get("top_n", "200"))
        regions = options.get("regions", DEFAULT_REGIONS)
        self.regions = [r.strip() for r in regions.split(",") if r.strip()]

    def partitions(self):
        return [_RegionPartition(r) for r in self.regions]

    def read(self, partition: _RegionPartition):
        yield from _fetch_chart_stub(
            self.chart, partition.region, self.day, self.top_n
        )


class _DayRegionPartition(InputPartition):
    def __init__(self, day: str, region: str):
        self.day = day
        self.region = region


class ChartStreamReader(DataSourceStreamReader):
    """Unbounded form of the same source: the reference's daily cron
    (spotify_chart_dag.py ``schedule="15 20 * * *"``) becomes a
    microbatch stream whose offset is the number of days ingested.

    Each trigger advances the offset by ``days_per_trigger`` days (the
    poll), bounded by ``end_date`` so tests terminate; a production
    deployment drops the bound and the offset chases the calendar.
    Every (day, region) pair is its own InputPartition — the same
    22-way fetch parallelism as the batch reader, per batch. Offsets
    are checkpointed by Spark: a restart resumes from the committed
    day, giving exactly-once ingest of each daily chart — the property
    the reference gets from Airflow's idempotent per-day tasks.
    """

    def __init__(self, options: dict):
        self.chart = options.get("chart", "top_episodes")
        self.top_n = int(options.get("top_n", "200"))
        regions = options.get("regions", DEFAULT_REGIONS)
        self.regions = [r.strip() for r in regions.split(",") if r.strip()]
        self.start = _date.fromisoformat(options.get("start_date", "2024-10-22"))
        end = options.get("end_date")
        self.total_days = (
            (_date.fromisoformat(end) - self.start).days + 1 if end else None
        )
        self.days_per_trigger = int(options.get("days_per_trigger", "1"))
        self._cursor = 0

    def initialOffset(self) -> dict:
        return {"days": 0}

    def latestOffset(self) -> dict:
        nxt = self._cursor + self.days_per_trigger
        if self.total_days is not None:
            nxt = min(nxt, self.total_days)
        self._cursor = nxt
        return {"days": nxt}

    def partitions(self, start: dict, end: dict):
        # Restart safety: a fresh reader instance starts _cursor at 0,
        # but Spark replans from the CHECKPOINTED start — fast-forward
        # the pacing cursor so latestOffset never runs behind committed
        # progress (which would replan already-ingested days).
        self._cursor = max(self._cursor, start["days"], end["days"])
        parts = []
        for d in range(start["days"], end["days"]):
            day = (self.start + timedelta(days=d)).isoformat()
            parts.extend(_DayRegionPartition(day, r) for r in self.regions)
        return parts

    def read(self, partition: _DayRegionPartition):
        yield from _fetch_chart_stub(
            self.chart, partition.region, partition.day, self.top_n
        )

    def commit(self, end: dict) -> None:
        self._cursor = max(self._cursor, end["days"])


class ChartDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "spotify_charts"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> ChartReader:
        return ChartReader(self.options)

    def streamReader(self, schema) -> ChartStreamReader:
        return ChartStreamReader(self.options)
