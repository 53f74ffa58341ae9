"""A13 — snapshot_diff op classification on adversarial synthetic rows."""

from __future__ import annotations

from spotify_podcasts_airflow_batch_spark.operators.cdc import snapshot_diff


def test_all_three_ops_and_null_transitions(spark):
    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, None), (3, 30, "c"), (4, 40, "d")],
        "k long, v long, s string",
    )
    new = spark.createDataFrame(
        [(2, 20, "now-set"), (3, 30, "c"), (4, 41, "d"), (5, 50, "e")],
        "k long, v long, s string",
    )
    got = {
        r.k: (r.op, r.old_v, r.new_v)
        for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()
    }
    assert got == {
        1: ("delete", 10, None),
        2: ("update", 20, 20),  # NULL→value counts as a change
        4: ("update", 40, 41),
        5: ("insert", None, 50),
    }
    assert 3 not in got  # unchanged keys are dropped


def test_identical_snapshots_diff_to_empty(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
    assert snapshot_diff(df, df, ["k"], ["s"]).count() == 0


def test_apply_diff_reconstructs_new_snapshot(spark):
    """Round-trip invariant on randomized keyed tables: applying the
    extracted change feed to the old snapshot yields the new one."""
    import random

    rng = random.Random(7)
    keys = list(range(40))
    old_rows = [
        (k, rng.randint(0, 5), rng.choice(["a", "b", None]))
        for k in keys
        if rng.random() < 0.8
    ]
    new_rows = [
        (k, rng.randint(0, 5), rng.choice(["a", "b", None]))
        for k in keys
        if rng.random() < 0.8
    ]
    from spotify_podcasts_airflow_batch_spark.operators.cdc import (
        apply_diff,
        snapshot_diff,
    )

    old = spark.createDataFrame(old_rows, "k long, v long, s string")
    new = spark.createDataFrame(new_rows, "k long, v long, s string")
    diff = snapshot_diff(old, new, ["k"], ["v", "s"])
    rebuilt = apply_diff(old, diff, ["k"], ["v", "s"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_null_keys_are_matched_not_deleted(spark):
    """A NULL key present on both sides is the SAME key (null-safe
    join): a value change must classify as update, and apply_diff's
    null-safe anti-join must round-trip it."""
    from spotify_podcasts_airflow_batch_spark.operators.cdc import (
        apply_diff,
        snapshot_diff,
    )

    old = spark.createDataFrame([(None, 1), (7, 2)], "k long, v long")
    new = spark.createDataFrame([(None, 9), (7, 2)], "k long, v long")
    diff = snapshot_diff(old, new, ["k"], ["v"])
    got = {(r.k, r.op) for r in diff.collect()}
    assert got == {(None, "update")}
    rebuilt = apply_diff(old, diff, ["k"], ["v"])

    def nsort(rows):
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    assert nsort(map(tuple, rebuilt.collect())) == nsort(
        map(tuple, new.collect())
    )
