"""Episode-metadata enrichment as a Spark Python DataSource.

The reference's second API surface: ``get_transformed_search_eps``
fetches episode metadata in batches of ≤50 ids
(include/spotify_eps.py:115-118 ``range(0, len(episodeUris_list), 50)``)
and flattens the nested ``show.*`` response into a 24-column pandas
frame (include/spotify_eps.py:106-112 column list, :131-156 per-field
extraction). Re-expressed Spark-first, each 50-id batch is one
``InputPartition`` — on a cluster the batches fetch in parallel,
failures retry per-batch (the reference's ``continue``-on-bad-batch
semantics fall out of per-partition retries), and the result is a
DataFrame from the first operator on.

The HTTP call is stubbed (no network/credentials here):
``_fetch_episodes_stub`` derives every field deterministically from
the episode id via the shared md5 hash family, so the DuckDB oracle
of the parity query can recompute the exact same metadata in SQL.
The reference's dotted pandas columns (``show.name``) flatten to
underscore names (``show_name``); ``languages`` (a list in the API)
flattens to a comma-joined string — the catalog is scalar-columns-only
by design.

Usage::

    spark.dataSource.register(EpisodeMetaDataSource)
    df = (spark.read.format("spotify_episodes")
          .option("episode_uris", "ep00000001,ep00000002")
          .load())
"""

from __future__ import annotations

import hashlib
from datetime import date as _date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# include/spotify_eps.py:115 — the API caps a lookup at 50 ids.
BATCH_SIZE = 50

# include/spotify_eps.py:106-112 — the 24 reference columns, dotted
# show.* names flattened to underscores.
EPISODE_META_SCHEMA = (
    "id string, name string, description string, "
    "show_name string, show_description string, show_publisher string, "
    "duration_ms bigint, explicit boolean, is_externally_hosted boolean, "
    "is_playable boolean, language string, languages string, "
    "release_date string, release_date_precision string, "
    "show_copyrights string, show_explicit boolean, show_href string, "
    "show_html_description string, show_is_externally_hosted boolean, "
    "show_languages string, show_media_type string, "
    "show_total_episodes int, show_type string, show_uri string"
)

_LANGS = ("en", "de", "es", "fr", "pt")
_M31 = (1 << 31) - 1


def _h31(s: str) -> int:
    """The shared 31-bit md5 hash (functions/hashing.py md5_hash31):
    identical to Spark ``conv(substr(md5(x),1,8),16,10) & (2^31-1)``
    and DuckDB ``('0x'||substr(md5(x),1,8))::BIGINT & (2^31-1)``."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) & _M31


def episode_meta_row(eid: str) -> tuple:
    """Deterministic metadata for one episode id (``ep%08d`` form).

    Pure function of the id — task retries and the SQL oracle both
    reproduce it bit-for-bit. The show pairing (``ep_num % 97``) and
    the episode name format match the chart stub
    (sources/chart_api.py), so the reference's name-equality
    validation (spotify_eps.py:210-212) holds by construction and a
    mismatch audit is a meaningful zero."""
    ep_num = int(eid[2:]) if eid[2:].isdigit() else _h31("epnum:" + eid) % 600
    show = ep_num % 97
    sid = f"sh{show:05d}"
    lang = _LANGS[_h31("lang:" + eid) % 5]
    rel = _date(2023, 1, 1) + timedelta(days=_h31("rel:" + eid) % 730)
    return (
        eid,
        f"Episode {ep_num} of show {show}",
        f"Description of episode {ep_num}",
        f"Show {show}",
        f"Description of show {show}",
        f"Publisher {show % 13}",
        _h31("dur:" + eid) % 3_600_000 + 60_000,
        _h31("exp:" + eid) % 5 == 0,
        _h31("ext:" + eid) % 10 == 0,
        _h31("play:" + eid) % 50 != 0,
        lang,
        lang,  # single-language episodes; list flattens to CSV string
        rel.isoformat(),
        "day",
        f"(C) Publisher {show % 13}",
        _h31("sexp:" + sid) % 7 == 0,
        f"https://api.spotify.com/v1/shows/{sid}",
        f"<p>Description of show {show}</p>",
        _h31("sext:" + sid) % 10 == 0,
        _LANGS[_h31("slang:" + sid) % 5],
        "audio",
        _h31("stot:" + sid) % 500 + 1,
        "show",
        f"spotify:show:{sid}",
    )


def _fetch_episodes_stub(batch_ids: list[str]):
    """Deterministic fake of one ≤50-id episodes lookup."""
    for eid in batch_ids:
        yield episode_meta_row(eid)


class _BatchPartition(InputPartition):
    def __init__(self, ids: list[str]):
        self.ids = ids


class EpisodeMetaReader(DataSourceReader):
    def __init__(self, options: dict):
        raw = options.get("episode_uris", "")
        self.ids = [e.strip() for e in raw.split(",") if e.strip()]

    def partitions(self):
        # One InputPartition per ≤50-id batch — the reference's
        # sequential `for i in range(0, len, 50)` loop, parallelized.
        return [
            _BatchPartition(self.ids[i : i + BATCH_SIZE])
            for i in range(0, len(self.ids), BATCH_SIZE)
        ] or [_BatchPartition([])]

    def read(self, partition: _BatchPartition):
        yield from _fetch_episodes_stub(partition.ids)


class EpisodeMetaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "spotify_episodes"

    def schema(self) -> str:
        return EPISODE_META_SCHEMA

    def reader(self, schema) -> EpisodeMetaReader:
        return EpisodeMetaReader(self.options)
