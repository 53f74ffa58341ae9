"""Episode-metadata DataSource: batching contract, schema, determinism.

Reference parity: include/spotify_eps.py:115-118 (≤50-id batches),
:106-112 (24-column flattened schema).
"""

from __future__ import annotations

from spotify_podcasts_airflow_batch_spark.sources.episode_meta import (
    BATCH_SIZE,
    EPISODE_META_SCHEMA,
    EpisodeMetaDataSource,
    EpisodeMetaReader,
    episode_meta_row,
)

IDS = [f"ep{i:08d}" for i in range(123)]


def test_partitions_are_50_id_batches():
    reader = EpisodeMetaReader({"episode_uris": ",".join(IDS)})
    parts = reader.partitions()
    assert len(parts) == 3  # ceil(123 / 50)
    assert [len(p.ids) for p in parts] == [50, 50, 23]
    assert all(len(p.ids) <= BATCH_SIZE for p in parts)
    # every id lands in exactly one batch, in order
    assert [i for p in parts for i in p.ids] == IDS


def test_empty_option_yields_one_empty_partition():
    reader = EpisodeMetaReader({})
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].ids == []
    assert list(reader.read(parts[0])) == []


def test_schema_has_24_reference_columns(spark):
    spark.dataSource.register(EpisodeMetaDataSource)
    df = (
        spark.read.format("spotify_episodes")
        .option("episode_uris", ",".join(IDS[:5]))
        .load()
    )
    assert len(df.columns) == 24
    # the reference's dotted show.* columns, flattened
    for c in ("show_name", "show_publisher", "show_total_episodes", "show_uri"):
        assert c in df.columns
    rows = df.collect()
    assert len(rows) == 5


def test_rows_are_deterministic_and_name_matches_chart_stub():
    r1 = episode_meta_row("ep00000042")
    r2 = episode_meta_row("ep00000042")
    assert r1 == r2
    # chart stub name format: "Episode {ep} of show {ep % 97}"
    assert r1[1] == "Episode 42 of show 42"
    assert r1[23] == "spotify:show:sh00042"


def test_read_via_spark_matches_pure_python(spark):
    spark.dataSource.register(EpisodeMetaDataSource)
    df = (
        spark.read.format("spotify_episodes")
        .option("episode_uris", "ep00000007")
        .load()
    )
    row = tuple(df.collect()[0])
    assert row == episode_meta_row("ep00000007")
