"""Property-based validation of the two-sample statistics (E49/E51)
against an independent numpy reference implementation: the
vocabulary-window rank formulation must equal brute-force average
ranks / CDF gaps for ANY sample pair, including heavy ties, equal
samples, and single-value vocabularies. Each example materializes a
synthetic events.parquet and runs the registered query end-to-end
(reader → plan → collect), not a unit of the formula.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries

QUERIES = all_queries()

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 2-dp-quantized positive values, like the real events.value column;
# small alphabet forces heavy ties.
_vals = st.lists(
    st.integers(min_value=1, max_value=12).map(lambda c: c / 4.0),
    min_size=3,
    max_size=40,
)


def _write_events(tmpdir: str, purchase: list, view: list) -> str:
    n = len(purchase) + len(view)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([1_600_000_000_000_000 + i for i in range(n)],
                           pa.timestamp("us")),
            "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
            "event_type": pa.array(
                ["purchase"] * len(purchase) + ["view"] * len(view)
            ),
            "value": pa.array(purchase + view, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(tbl, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


def _avg_rank(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x))
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


@given(purchase=_vals, view=_vals)
@settings(**SETTINGS)
def test_mann_whitney_matches_numpy(spark, tmp_path_factory, purchase, view):
    sf_dir = _write_events(
        str(tmp_path_factory.mktemp("mw")), purchase, view
    )
    row = QUERIES["mann_whitney_u"].spark_fn(spark, sf_dir).collect()[0]
    p, v = np.array(purchase), np.array(view)
    pooled = np.concatenate([p, v])
    r = _avg_rank(pooled)
    n1, n2 = len(p), len(v)
    R1 = r[:n1].sum()
    U1 = R1 - n1 * (n1 + 1) / 2
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["u1_x2"] == round(2 * U1)
    _, cnts = np.unique(pooled, return_counts=True)
    tie = float((cnts.astype(float) ** 3 - cnts).sum())
    n = n1 + n2
    var = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    if var > 0:
        z = (U1 - n1 * n2 / 2) / math.sqrt(var)
        assert abs(row["z"] - z) < 1e-3
    else:
        assert row["z"] is None or math.isnan(row["z"]) or math.isinf(row["z"])


@given(purchase=_vals, view=_vals)
@settings(**SETTINGS)
def test_ks_two_sample_matches_numpy(spark, tmp_path_factory, purchase, view):
    sf_dir = _write_events(
        str(tmp_path_factory.mktemp("ks")), purchase, view
    )
    row = QUERIES["ks_two_sample"].spark_fn(spark, sf_dir).collect()[0]
    p, v = np.sort(np.array(purchase)), np.sort(np.array(view))
    grid = np.unique(np.concatenate([p, v]))
    c1 = np.searchsorted(p, grid, side="right")
    c2 = np.searchsorted(v, grid, side="right")
    d_scaled = int(np.max(np.abs(c1 * len(v) - c2 * len(p))))
    assert row["n1"] == len(p) and row["n2"] == len(v)
    assert row["d_scaled"] == d_scaled
    assert abs(row["d_stat"] - d_scaled / (len(p) * len(v))) < 1e-3
