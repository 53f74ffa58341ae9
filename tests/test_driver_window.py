"""The correctness driver hash-checks the FIRST 50 registry entries.

Rounds 1-2 only ever sampled the relational B head; round 3 rotated in
the A/C-core/D/E/F representatives; round 4 the text/recsys/events/
statistics wave; round 5 the sampling/PQ-ANN/E-statistics wave; round
6 the analytics/timeseries/ANN-serving wave; round 7 the
served-quantizer/experimentation wave — after which every catalog
entry had at least one driver row. From round 8 the head pivots from
"never verified" to "verified, then CHANGED": the 3 B sentinels, the
keys whose plan or oracle was rewritten AFTER their last driver hash
row (round 9: the PQ/IVF family touched by the √n-cells +
ivf_assign_arrow rewrite, VERDICT r8 item 1 — listed in
registry._CHANGED_SINCE_DRIVER_ROW), the round's additions, then
verified refill. The invariant this file pins: no window slot is
wasted on an already-verified non-sentinel key while unverified
oracle-bearing keys remain, and rows-only fills appear only AFTER
every unverified oracle-bearing key is in the head — a rows-only key
with an old clean row may re-enter ONLY via the changed-since set.
"""

from __future__ import annotations

import itertools

import pytest

from spotify_podcasts_airflow_batch_spark.plans.registry import (
    _DRIVER_HEAD,
    all_queries,
)

pytestmark = pytest.mark.fast  # driver-entry tier (pytest.ini)

# family representatives in the CURRENT head: key -> family letter
# (see SURVEY §2)
_FAMILY_OF = {
    "chart_rank_move": "A",
    "q1_pricing_summary": "B",
    "exact_dedup": "C",
    "knn_brute": "D",
    "tumbling_window": "E",
    "media_decode": "F",
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


def test_head_wastes_no_slots_and_fills_rows_only_last():
    """Every never-driver-verified oracle-bearing key must be in the
    head before any rows-only key takes a slot, and rows-only fills
    must themselves be never-executed (the point of the fill)."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    executed: set[str] = set()
    clean: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            rows = json.load(fh)
        for key, row in rows.items():
            executed.add(key)
            if row.get("err") is None:
                clean.add(key)
            if row.get("rows_match") and row.get("err") is None:
                seen.add(key)
    q = all_queries()
    sentinels = {"q1_pricing_summary", "q9_product_profit", "salted_join"}
    unverified_oracle = {
        k for k, qq in q.items() if qq.oracle is not None and k not in seen
    }
    head = set(_DRIVER_HEAD)
    missing = unverified_oracle - head
    from spotify_podcasts_airflow_batch_spark.plans.registry import (
        _CHANGED_SINCE_DRIVER_ROW,
    )

    rows_only_in_head = [k for k in _DRIVER_HEAD if q[k].oracle is None]
    if rows_only_in_head:
        assert not missing, (
            "rows-only keys take slots while unverified oracle-bearing "
            f"keys remain outside the head: {sorted(missing)}"
        )
        stale = [
            k
            for k in rows_only_in_head
            if k in clean and k not in _CHANGED_SINCE_DRIVER_ROW
        ]
        assert not stale, (
            "rows-only fills must be keys without a clean driver row "
            "(never executed, err'd every time, or changed since their "
            f"last row): {stale}"
        )
    wasted = [
        k for k in _DRIVER_HEAD
        if k in seen and k not in sentinels and q[k].oracle is not None
    ]
    assert unverified_oracle <= head or not wasted, (
        f"verified non-sentinel keys waste slots: {wasted}"
    )


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
