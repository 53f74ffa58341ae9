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
