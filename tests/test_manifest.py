"""G — manifest-based file skipping over clustered parquet layouts."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.sinks.manifest import (
    build_manifest,
    prune_files,
    pruned_read,
    refresh_manifest,
)
from spotify_podcasts_airflow_batch_spark.sinks.writers import write_sorted_layout
from spotify_podcasts_airflow_batch_spark.sources.readers import table

FILES = 8


def _layout(spark, sf_dir, tmp_path) -> str:
    out = str(tmp_path / "orders_sorted")
    write_sorted_layout(
        table(spark, sf_dir, "orders"), out, ["o_totalprice"], files=FILES
    )
    return out


def test_manifest_covers_every_file_and_row(spark, sf_dir, tmp_path):
    out = _layout(spark, sf_dir, tmp_path)
    man = build_manifest(spark, out, ["o_totalprice"]).collect()
    n_files = len(
        [f for f in os.listdir(out) if f.endswith(".parquet")]
    )
    assert len(man) == n_files
    assert sum(r.n_rows for r in man) == table(spark, sf_dir, "orders").count()
    for r in man:
        assert r.min_o_totalprice is not None
        assert r.min_o_totalprice <= r.max_o_totalprice


def test_pruned_scan_skips_files_and_matches_full_scan(spark, sf_dir, tmp_path):
    out = _layout(spark, sf_dir, tmp_path)
    man = build_manifest(spark, out, ["o_totalprice"])
    full = spark.read.parquet(out)
    lo, hi = (
        full.agg(
            F.expr("percentile(o_totalprice, 0.40)"),
            F.expr("percentile(o_totalprice, 0.45)"),
        ).collect()[0]
    )

    kept = prune_files(man, "o_totalprice", lo, hi)
    assert 0 < len(kept) < FILES  # range-sorted layout ⇒ real skipping

    pruned = pruned_read(spark, man, "o_totalprice", lo, hi).filter(
        F.col("o_totalprice").between(lo, hi)
    )
    want = full.filter(F.col("o_totalprice").between(lo, hi))
    got_keys = {r.o_orderkey for r in pruned.select("o_orderkey").collect()}
    want_keys = {r.o_orderkey for r in want.select("o_orderkey").collect()}
    assert got_keys == want_keys
    # the pruned plan genuinely reads fewer files
    assert set(pruned.inputFiles()) == {f"file://{p}" for p in kept} or set(
        pruned.inputFiles()
    ) == set(kept)


def test_manifest_prunes_timestamp_ranges(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_date")
    write_sorted_layout(
        table(spark, sf_dir, "orders"), out, ["o_orderdate"], files=FILES
    )
    man = build_manifest(spark, out, ["o_orderdate"])
    full = spark.read.parquet(out)
    lo_ts, hi_ts = full.agg(
        F.expr("percentile(unix_micros(o_orderdate), 0.10)"),
        F.expr("percentile(unix_micros(o_orderdate), 0.20)"),
    ).collect()[0]
    kept = prune_files(man, "o_orderdate", lo_ts, hi_ts)
    assert 0 < len(kept) < FILES
    pruned = pruned_read(spark, man, "o_orderdate", lo_ts, hi_ts).filter(
        F.unix_micros("o_orderdate").between(lo_ts, hi_ts)
    )
    want = full.filter(F.unix_micros("o_orderdate").between(lo_ts, hi_ts))
    assert pruned.count() == want.count() > 0


def test_refresh_manifest_is_incremental_and_idempotent(spark, sf_dir, tmp_path):
    out = _layout(spark, sf_dir, tmp_path)
    man_path = str(tmp_path / "manifest")
    first = refresh_manifest(spark, out, man_path, ["o_totalprice"])
    n1 = first.count()
    # no new files → same manifest back, no rewrite needed
    again = refresh_manifest(spark, out, man_path, ["o_totalprice"])
    assert again.count() == n1
    # drop a new file in → exactly one manifest row appears
    extra = table(spark, sf_dir, "orders").limit(10)
    extra.coalesce(1).write.mode("append").parquet(out)
    refreshed = refresh_manifest(spark, out, man_path, ["o_totalprice"])
    assert refreshed.count() == n1 + 1


def test_pruning_is_superset_for_arbitrary_ranges(spark, sf_dir, tmp_path):
    """Property: for ANY [lo, hi], the pruned file set contains every
    row the full scan's filter returns (file skipping may over-read,
    never under-read). Randomized ranges over the z-ordered layout —
    the multi-column case where envelope logic is easiest to get
    wrong."""
    import random

    from spotify_podcasts_airflow_batch_spark.sinks.writers import (
        write_zorder_layout,
    )

    out = str(tmp_path / "orders_z")
    write_zorder_layout(
        table(spark, sf_dir, "orders"),
        out,
        ["o_totalprice", "o_custkey"],
        files=FILES,
    )
    man = build_manifest(spark, out, ["o_totalprice", "o_custkey"])
    full = spark.read.parquet(out)
    rng = random.Random(11)
    lo_all, hi_all = full.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).collect()[0]
    for _ in range(5):
        a, b = sorted(
            (rng.uniform(lo_all, hi_all), rng.uniform(lo_all, hi_all))
        )
        got = (
            pruned_read(spark, man, "o_totalprice", a, b)
            .filter(F.col("o_totalprice").between(a, b))
            .count()
        )
        want = full.filter(F.col("o_totalprice").between(a, b)).count()
        assert got == want


def test_time_travel_versions(spark, sf_dir, tmp_path):
    """Snapshot isolation over the manifest log: version N reads see
    exactly the files committed at N — appends after the pin are
    invisible, deletes produce a new version that excludes the file,
    and an unchanged commit is a no-op returning the same version."""
    from spotify_podcasts_airflow_batch_spark.sinks.manifest import (
        commit_version,
        list_versions,
        read_manifest_version,
        snapshot_read,
    )

    data = str(tmp_path / "orders_versioned")
    mdir = str(tmp_path / "orders_manifest")
    orders = table(spark, sf_dir, "orders")
    batch1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    batch2 = orders.filter(F.col("o_orderkey") % 2 == 1)

    batch1.coalesce(2).write.mode("append").parquet(data)
    v1 = commit_version(spark, data, mdir, ["o_totalprice"])
    assert v1 == 1

    batch2.coalesce(2).write.mode("append").parquet(data)
    v2 = commit_version(spark, data, mdir, ["o_totalprice"])
    assert v2 == 2
    assert list_versions(mdir) == [1, 2]

    # pinned v1 read is isolated from the append
    assert snapshot_read(spark, mdir, 1).count() == batch1.count()
    assert snapshot_read(spark, mdir, 2).count() == orders.count()
    assert snapshot_read(spark, mdir).count() == orders.count()  # latest

    # idempotent: identical state commits nothing
    assert commit_version(spark, data, mdir, ["o_totalprice"]) == 2
    assert list_versions(mdir) == [1, 2]

    # pruning composes with version pins
    lo, hi = (
        batch1.agg(
            F.expr("percentile(o_totalprice, 0.4)"),
            F.expr("percentile(o_totalprice, 0.6)"),
        ).collect()[0]
    )
    pruned = snapshot_read(spark, mdir, 1, "o_totalprice", lo, hi).filter(
        F.col("o_totalprice").between(lo, hi)
    )
    want = batch1.filter(F.col("o_totalprice").between(lo, hi))
    assert pruned.count() == want.count()

    # delete a data file → next commit records the removal
    man1 = read_manifest_version(spark, mdir, 1)
    victim = sorted(r.path for r in man1.select("path").collect())[0]
    os.remove(victim)
    v3 = commit_version(spark, data, mdir, ["o_totalprice"])
    assert v3 == 3
    paths3 = {r.path for r in read_manifest_version(spark, mdir, 3).collect()}
    assert victim not in paths3
    removed_rows = [r.n_rows for r in man1.collect() if r.path == victim][0]
    assert snapshot_read(spark, mdir, 3).count() == orders.count() - removed_rows


def test_optimize_table_compacts_and_preserves_content(spark, sf_dir, tmp_path):
    """OPTIMIZE rewrites the snapshot into fewer files behind a new
    version: same rows, fewer files, version log advanced by one, and
    an immediate re-commit is a no-op."""
    from spotify_podcasts_airflow_batch_spark.sinks.manifest import (
        commit_version,
        list_versions,
        optimize_table,
        read_manifest_version,
        snapshot_read,
    )

    data = str(tmp_path / "orders_opt")
    mdir = str(tmp_path / "opt_manifest")
    orders = table(spark, sf_dir, "orders")
    orders.repartition(8).write.mode("append").parquet(data)
    assert commit_version(spark, data, mdir, ["o_totalprice"]) == 1
    n_files_before = read_manifest_version(spark, mdir, 1).count()
    assert n_files_before == 8

    v = optimize_table(spark, data, mdir, ["o_totalprice"], target_files=2)
    assert v == 2
    assert read_manifest_version(spark, mdir, 2).count() == 2
    got = {r.o_orderkey for r in snapshot_read(spark, mdir).select("o_orderkey").collect()}
    want = {r.o_orderkey for r in orders.select("o_orderkey").collect()}
    assert got == want
    assert commit_version(spark, data, mdir, ["o_totalprice"]) == 2
    assert list_versions(mdir) == [1, 2]
