"""connected_components: convergence and labeling invariants."""

from __future__ import annotations

from spotify_podcasts_airflow_batch_spark.operators.graph import (
    connected_components,
)


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = connected_components(edges).collect()
    return {r.node: r.component for r in got}


def test_two_triangles(spark):
    labels = _cc(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)])
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_needs_multiple_rounds(spark):
    # a 12-node path: diameter 11 — exercises the iteration loop and
    # the localCheckpoint lineage reset
    chain = [(i, i + 1) for i in range(1, 12)]
    labels = _cc(spark, chain)
    assert set(labels.values()) == {1}
    assert len(labels) == 12


def test_bridge_merges_components(spark):
    labels = _cc(spark, [(1, 2), (3, 4), (2, 3)])
    assert set(labels.values()) == {1}


def test_representative_filter_semantics(spark):
    # 'keep one per group' = node == component
    labels = _cc(spark, [(5, 9), (9, 7), (20, 21)])
    reps = {n for n, c in labels.items() if n == c}
    assert reps == {5, 20}
