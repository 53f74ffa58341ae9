"""Independent replicas for the round-7 experimentation / serving ops:

* mmr_diversify — greedy MMR re-implemented in numpy from the raw
  embeddings (no shared code with the plan): shortlist, pairwise sims,
  greedy λ-tradeoff selection. The registered query must reproduce the
  replica's picks exactly, in order.
* cuped_adjust — θ, adjusted means and variance reduction recomputed
  with numpy moments from the raw events (pre/post split re-derived
  from min/max ts).
* rank_assoc_binned — concordant/discordant pair counts recomputed by
  brute-force O(cells²) numpy loops over an independently-built
  contingency table.

These catch formula mistakes that the DuckDB oracle cannot (the
oracle re-states the same SQL formulas; the replicas re-derive the
STATISTICS)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def _embeddings():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, X


def test_mmr_matches_numpy_greedy(spark):
    ids, X = _embeddings()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T  # full cosine matrix (test scale only)
    lam, mu, k_short, k_pick = 0.7, 0.3, 8, 4

    expected = []
    for q in range(3):
        sims = np.round(S[q], 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[q]),
            key=lambda i: (-sims[i], ids[i]),
        )
        short = order[:k_short]
        picked = []
        for pick in range(1, k_pick + 1):
            if pick == 1:
                best = max(short, key=lambda i: (sims[i], -ids[i]))
                score = sims[best]
            else:
                cands = [i for i in short if i not in picked]
                scored = []
                for c in cands:
                    pen = max(np.round(S[c, p], 6) for p in picked)
                    scored.append(
                        (round(lam * sims[c] - mu * pen, 6), c)
                    )
                score, best = max(scored, key=lambda t: (t[0], -ids[t[1]]))
            picked.append(best)
            expected.append((ids[q], pick, ids[best], float(score)))

    got = [
        (r.query_id, r.pick, r.neighbor_id, r.score)
        for r in QUERIES["mmr_diversify"].spark_fn(spark, SF_DIR).collect()
    ]
    assert [(a, b, c) for a, b, c, _ in got] == [
        (a, b, c) for a, b, c, _ in expected
    ]
    for (_, _, _, gs), (_, _, _, es) in zip(got, expected):
        assert abs(gs - es) < 1e-9


def _hash31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) & ((1 << 31) - 1)


def test_cuped_matches_numpy_moments(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, epoch_us(ts), value FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    mid = ts.min() + (ts.max() - ts.min()) // 2
    per_user: dict[int, list[float]] = {}
    for uid, t, v in rows:
        x, y = per_user.setdefault(uid, [0.0, 0.0])
        if t < mid:
            per_user[uid][0] = x + v
        else:
            per_user[uid][1] = y + v
    uids = sorted(per_user)
    x = np.array([per_user[u][0] for u in uids])
    y = np.array([per_user[u][1] for u in uids])
    arm = np.array([_hash31(f"cuped:{u}") % 2 for u in uids])
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    y_adj = y - theta * (x - x.mean())
    vr = 1 - np.var(y_adj) / np.var(y)

    got = {
        r.arm: r
        for r in QUERIES["cuped_adjust"].spark_fn(spark, SF_DIR).collect()
    }
    assert set(got) == {0, 1}
    for a in (0, 1):
        m = arm == a
        assert got[a].n_users == int(m.sum())
        assert abs(got[a].mean_y - y[m].mean()) < 1e-3
        assert abs(got[a].mean_y_adj - y_adj[m].mean()) < 1e-3
        assert abs(got[a].theta - theta) < 1e-5
        assert abs(got[a].var_reduction - vr) < 1e-5
    # CUPED must not change the pooled outcome mean (identity check)
    pooled_raw = y.mean()
    pooled_adj = y_adj.mean()
    assert abs(pooled_raw - pooled_adj) < 1e-9


def test_rank_assoc_matches_bruteforce_pairs(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT hour(ts), value FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    xs = np.array([r[0] for r in rows], dtype=np.int64)
    vs = np.array([r[1] for r in rows], dtype=np.float64)
    vmin, vmax = vs.min(), vs.max()
    ys = np.minimum(
        np.floor((vs - vmin) / ((vmax - vmin) / 8)), 7
    ).astype(np.int64)
    # independent contingency + O(cells²) pair counting
    from collections import Counter

    cells = Counter(zip(xs.tolist(), ys.tolist()))
    conc = disc = 0
    items = list(cells.items())
    for (x1, y1), n1 in items:
        for (x2, y2), n2 in items:
            if x2 > x1 and y2 > y1:
                conc += n1 * n2
            elif x2 > x1 and y2 < y1:
                disc += n1 * n2
    n = len(rows)
    t0 = n * (n - 1) // 2
    t1 = sum(
        c * (c - 1) // 2 for c in Counter(xs.tolist()).values()
    )
    t2 = sum(
        c * (c - 1) // 2 for c in Counter(ys.tolist()).values()
    )
    gamma = (conc - disc) / (conc + disc)
    tau_b = (conc - disc) / math.sqrt((t0 - t1) * (t0 - t2))

    [r] = QUERIES["rank_assoc_binned"].spark_fn(spark, SF_DIR).collect()
    assert r.n_total == n
    assert r.concordant == conc
    assert r.discordant == disc
    assert abs(r.gamma - gamma) < 1e-5
    assert abs(r.tau_b - tau_b) < 1e-5


def test_permutation_test_matches_numpy_replica(spark):
    """Recompute the observed diff, every replicate's pseudo-arm
    reassignment, and the p-value from the raw parquet with numpy +
    the same md5/universal-family arithmetic — validates the statistic
    itself (bit derivation, integer means, extreme count), which the
    SQL oracle (same formulas, different engine) cannot."""
    from spotify_podcasts_airflow_batch_spark.functions.hashing import (
        MERSENNE_31,
        universal_family,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, event_id, value FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type IN ('view','purchase')"
    ).fetchall()
    vu = np.array(
        [math.floor(v * 1_000_000 + 0.5) for _, _, v in rows], dtype=np.int64
    )
    is_view = np.array([t == "view" for t, _, _ in rows])
    h31 = np.array(
        [_hash31(f"perm:{eid}") for _, eid, _ in rows], dtype=np.int64
    )
    obs = int(vu[is_view].sum()) // int(is_view.sum()) - int(
        vu[~is_view].sum()
    ) // int((~is_view).sum())
    fam = universal_family(40)
    n_ext = 0
    for a, b in fam:
        bit = ((a * h31 + b) % MERSENNE_31) % 2
        m0, m1 = bit == 0, bit == 1
        d0 = int(vu[m0].sum()) // int(m0.sum()) if m0.any() else 0
        d1 = int(vu[m1].sum()) // int(m1.sum()) if m1.any() else 0
        if abs(d0 - d1) >= abs(obs):
            n_ext += 1
    [r] = QUERIES["permutation_test"].spark_fn(spark, SF_DIR).collect()
    assert r.n_a == int(is_view.sum())
    assert r.n_b == int((~is_view).sum())
    assert r.obs_diff_u == obs
    assert r.n_extreme == n_ext
    # the plan reports p rounded to 6 dp
    assert abs(r.p_value - (1 + n_ext) / 41) < 5e-7
