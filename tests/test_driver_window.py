"""The correctness driver hash-checks the FIRST 50 registry entries.

Rounds 1-2 only ever sampled the relational B head, so the A/C/D/E/F
families were never driver-verified. The registry now pins an explicit
50-entry head that interleaves every family with oracle-bearing
queries; this test keeps that window from silently regressing.
"""

from __future__ import annotations

import itertools

from spotify_podcasts_airflow_batch_spark.plans.registry import (
    _DRIVER_HEAD,
    all_queries,
)

# family representative prefixes: key -> family letter (see SURVEY §2)
_FAMILY_OF = {
    "chart_rank": "A",
    "text_stats": "C",
    "knn_brute": "D",
    "tumbling_window": "E",
    "media_meta": "F",
}


def test_head_is_first_50_in_registry_order():
    q = all_queries()
    assert len(_DRIVER_HEAD) == 50
    assert tuple(itertools.islice(q, 50)) == _DRIVER_HEAD


def test_head_keys_all_exist_and_are_unique():
    q = all_queries()
    assert len(set(_DRIVER_HEAD)) == 50
    missing = [k for k in _DRIVER_HEAD if k not in q]
    assert not missing, f"driver-head keys not registered: {missing}"


def test_head_is_fully_oracle_checked():
    q = all_queries()
    weak = [k for k in _DRIVER_HEAD if q[k].oracle is None]
    assert not weak, f"rows-only keys in the driver window: {weak}"


def test_head_covers_every_family():
    assert set(_FAMILY_OF) <= set(_DRIVER_HEAD)


def test_no_query_lost_by_reorder():
    # reordering must be a permutation of the raw registry
    from spotify_podcasts_airflow_batch_spark.plans import registry

    q = all_queries()
    assert set(q) == set(registry._REGISTRY)
    assert len(q) == len(registry._REGISTRY)
