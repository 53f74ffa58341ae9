"""connected_components: convergence and labeling invariants, on both
the single-task union-find fast path and the distributed hook+compress
iteration (forced via local_threshold=0)."""

from __future__ import annotations

import pytest

from spotify_podcasts_airflow_batch_spark.operators.graph import (
    connected_components,
)

PATHS = [pytest.param(10**9, id="local"), pytest.param(0, id="distributed")]


def _cc(spark, pairs, threshold):
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = connected_components(edges, local_threshold=threshold).collect()
    return {r.node: r.component for r in got}


@pytest.mark.parametrize("threshold", PATHS)
def test_two_triangles(spark, threshold):
    labels = _cc(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)], threshold)
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


@pytest.mark.parametrize("threshold", PATHS)
def test_long_chain_needs_multiple_rounds(spark, threshold):
    # a 40-node path: diameter 39 — exercises pointer compression (the
    # distributed path must converge in far fewer than 39 rounds)
    chain = [(i, i + 1) for i in range(1, 40)]
    labels = _cc(spark, chain, threshold)
    assert set(labels.values()) == {1}
    assert len(labels) == 40


@pytest.mark.parametrize("threshold", PATHS)
def test_bridge_merges_components(spark, threshold):
    labels = _cc(spark, [(1, 2), (3, 4), (2, 3)], threshold)
    assert set(labels.values()) == {1}


def test_paths_agree(spark):
    import random

    rng = random.Random(7)
    pairs = [
        (rng.randrange(100), rng.randrange(100)) for _ in range(120)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _cc(spark, pairs, 10**9) == _cc(spark, pairs, 0)


def test_representative_filter_semantics(spark):
    labels = _cc(spark, [(5, 9), (9, 7), (20, 21)], 10**9)
    reps = {n for n, c in labels.items() if n == c}
    assert reps == {5, 20}