"""The correctness driver hash-checks the FIRST 50 registry entries.

Rounds 1-2 only ever sampled the relational B head; round 3 rotated in
the A/C-core/D/E/F representatives; round 4 the text/recsys/events/
statistics wave; the round-5 head holds 47 first-time keys (VERDICT r4
priorities + this round's new entries + registry-order fill) plus 3 B
sentinels kept as cross-round regression anchors. This test keeps that
window oracle-bearing and family-covering so rotation can't silently
regress. Families A (reference-parity, verified r1-r3) and F
(multimodal, verified r4) have no remaining oracle-bearing unverified
keys, so they are deliberately absent from the round-5 window.
"""

from __future__ import annotations

import itertools

import pytest

from spotify_podcasts_airflow_batch_spark.plans.registry import (
    _DRIVER_HEAD,
    all_queries,
)

# family representatives in the CURRENT head: key -> family letter
# (see SURVEY §2); A and F intentionally absent this round (see
# module doc)
_FAMILY_OF = {
    "q1_pricing_summary": "B",
    "lsh_param_sweep": "C",
    "pq_adc_ann": "D",
    "spearman_corr": "E",
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


def test_unregistered_head_key_fails_loudly(monkeypatch):
    # a renamed/removed plan entry must name the missing key, not
    # surface as a bare KeyError deep in the driver contract
    from spotify_podcasts_airflow_batch_spark.plans import registry

    monkeypatch.setattr(
        registry, "_DRIVER_HEAD", registry._DRIVER_HEAD + ("no_such_query",)
    )
    with pytest.raises(RuntimeError, match="no_such_query"):
        registry.all_queries()


def test_no_query_lost_by_reorder():
    # reordering must be a permutation of the raw registry
    from spotify_podcasts_airflow_batch_spark.plans import registry

    q = all_queries()
    assert set(q) == set(registry._REGISTRY)
    assert len(q) == len(registry._REGISTRY)
