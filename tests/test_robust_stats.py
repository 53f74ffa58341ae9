"""Algorithmic invariants for the round-4 operators — properties the
oracle-equality gate can't express:

- Theil-Sen's POINT: one corrupted day must not move the fitted slope
  (oracle equality would happily agree with a non-robust estimator).
- The Markov stationary vector must actually BE the chain's fixed
  point (pi = pi.P), not just match the oracle's identical iteration.
- The JL projection must be the declared Rademacher transform (signs
  reproducible from the LCG spec) and preserve pairwise distance in
  expectation — the property that makes the sketch usable for ANN.
- Overlap containment must score a verbatim quote inside a longer doc
  at 1.0 where Jaccard scores it below any dedup threshold.
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, value, props)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_theil_sen_ignores_outlier_day(spark, tmp_path):
    """30 days of an exact 3.0/day linear trend with day 15 corrupted
    to 1e6: every pair avoiding day 15 gives slope 3_000_000 micro-
    units/day exactly, 406 of 435 pairs — the median must be the true
    slope, untouched by the spike."""
    from spotify_podcasts_airflow_batch_spark.plans.timeseries import (
        theil_sen_trend,
    )

    rows = []
    for d in range(30):
        v = 1_000_000.0 if d == 15 else 3.0 * d + 10.0
        rows.append((d, d * 86400_000_000, 1, "a", v, "{}"))
    sf = _write_events(tmp_path, rows)
    out = {r.event_type: r for r in theil_sen_trend(spark, sf).collect()}
    r = out["a"]
    assert r.n_days == 30
    assert r.n_pairs == 435
    assert r.slope_med_u == 3_000_000


def test_markov_stationary_is_fixed_point(spark, sf_dir):
    """pi must satisfy pi = pi.P (+ dangling self-loops) to within the
    6dp quantization — recomputed from an independent pandas pass over
    the same events."""
    import pandas as pd

    from spotify_podcasts_airflow_batch_spark.plans.events2 import (
        markov_stationary,
    )

    pi = {
        r.event_type: r.stationary_p
        for r in markov_stationary(spark, sf_dir).collect()
    }
    assert abs(sum(pi.values()) - 1.0) < 1e-4

    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))[
        ["user_id", "event_id", "ts", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"])
    prev = ev.groupby("user_id")["event_type"].shift(1)
    pairs = pd.DataFrame({"src": prev, "dst": ev["event_type"]}).dropna()
    counts = pairs.value_counts()
    nf: dict = {}
    for (s, _d), n in counts.items():
        nf[s] = nf.get(s, 0) + n
    nxt = {s: 0.0 for s in pi}
    for (s, d), n in counts.items():
        nxt[d] += pi[s] * (n / nf[s])
    for s in pi:
        if s not in nf:
            nxt[s] += pi[s]
    for s in pi:
        assert abs(nxt[s] - pi[s]) < 5e-5, (s, nxt[s], pi[s])


def _lcg_sign(i: int, j: int) -> int:
    h = (1103515245 * (i * 8 + j) + 12345) % 2147483648
    return 1 - 2 * ((h >> 16) & 1)


def test_jl_projection_matches_lcg_reference(spark, tmp_path):
    """One-hot vectors read the sign matrix back out: projecting e_i
    must yield exactly (sign(i,0), ..., sign(i,7)) — proving the plan
    computes the DECLARED Rademacher transform, not merely something
    the oracle happens to agree with."""
    from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
        random_projection_jl,
    )

    dim = 16
    vecs = []
    for i in range(dim):
        v = [0.0] * dim
        v[i] = 1.0
        vecs.append(v)
    t = pa.table(
        {
            "vec_id": pa.array(list(range(dim)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * dim, pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "embeddings.parquet"))
    out = {
        r.vec_id: [r[f"p{j}"] for j in range(8)]
        for r in random_projection_jl(spark, str(tmp_path)).collect()
    }
    for i in range(dim):
        assert out[i] == [float(_lcg_sign(i, j)) for j in range(8)], i


def test_jl_projection_preserves_distance_in_expectation(spark, sf_dir):
    """E[||Rx - Ry||^2 / k] = ||x - y||^2 for a Rademacher R: over the
    real embeddings the mean squared-distance ratio (sketch/true,
    scaled by d/k) must sit near 1 — the Johnson-Lindenstrauss
    property that makes 8-dim candidate search faithful."""
    import numpy as np
    import pandas as pd

    from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
        random_projection_jl,
    )

    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb = emb.sort_values("vec_id").head(40)
    X = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    proj = {
        r.vec_id: np.array([r[f"p{j}"] for j in range(8)])
        for r in random_projection_jl(spark, sf_dir).collect()
    }
    P = np.array([proj[v] for v in emb["vec_id"]])
    ratios = []
    for a in range(0, 40, 2):
        b = a + 1
        true = np.sum((X[a] - X[b]) ** 2)
        sk = np.sum((P[a] - P[b]) ** 2) / 8.0
        if true > 1e-9:
            ratios.append(sk / true)
    m = sum(ratios) / len(ratios)
    assert 0.5 < m < 2.0, m


def test_overlap_catches_quote_jaccard_misses(spark):
    """A 12-token doc quoted verbatim inside a 400-token doc: overlap
    = 1.0 (every shingle of the short doc appears in the long one)
    while Jaccard ~ 11/399 — below any dedup threshold."""
    from spotify_podcasts_airflow_batch_spark.operators.dedup import (
        jaccard_pairs,
        overlap_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(12))
    filler = " ".join(f"w{i}" for i in range(388))
    df = spark.createDataFrame(
        [
            (1, quote, "en", "s"),
            (2, filler + " " + quote, "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    ov = overlap_pairs(
        df, "doc_id", "text", ["lang", "source"], shingle_k=2, threshold=0.5
    ).collect()
    assert len(ov) == 1
    assert ov[0].id_a == 1 and ov[0].id_b == 2
    assert math.isclose(ov[0].overlap, 1.0)
    jc = jaccard_pairs(
        df, "doc_id", "text", ["lang", "source"], shingle_k=2, threshold=0.2
    ).collect()
    assert jc == []
