"""D28/D30 — trained IVF coarse quantizer: independent-reference
Lloyd equality, fingerprint-keyed memo invalidation, and the
occupancy dial's conservation/shape contracts."""

from __future__ import annotations

import math
import os

from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
    _EMBED_DIMS,
    _PQ_TRAIN_ITERS,
    _PQ_TRAIN_MOD,
    ivf_n_cells,
    ivf_train_cells,
    ivf_train_cells_cached,
)
from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries


def _q(x: float) -> int:
    scaled = x * 1e6
    return (
        int(math.floor(scaled + 0.5))
        if scaled >= 0
        else int(math.ceil(scaled - 0.5))
    )


def _trunc_div(a: int, b: int) -> int:
    return -((-a) // b) if (a < 0) != (b < 0) else a // b


def _py_full_lloyd(vecs: dict[int, list[float]], iters: int):
    """Independent pure-Python reimplementation of the FULL-VECTOR
    integer micro-unit Lloyd spec (third implementation besides the
    Spark plan and the unrolled SQL twin — a shared spec bug in those
    two would still diverge from this one)."""
    seeds = sorted(vecs)[: ivf_n_cells(len(vecs))]
    cents = [[_q(float(x)) for x in vecs[s]] for s in seeds]
    xu = {
        vid: [_q(float(x)) for x in v]
        for vid, v in vecs.items()
        if vid % _PQ_TRAIN_MOD == 0
    }
    for _ in range(iters):
        assign: dict[int, int] = {}
        for vid, v in xu.items():
            best = None
            for cid, c in enumerate(cents):
                d = sum((v[j] - c[j]) ** 2 for j in range(_EMBED_DIMS))
                if best is None or (d, cid) < best:
                    best = (d, cid)
            assign[vid] = best[1]
        new = []
        for cid, c in enumerate(cents):
            members = [xu[vid] for vid in xu if assign[vid] == cid]
            if not members:
                new.append(c)
            else:
                n = len(members)
                new.append(
                    [
                        _trunc_div(sum(m[j] for m in members), n)
                        for j in range(_EMBED_DIMS)
                    ]
                )
        cents = new
    return cents


def test_coarse_training_matches_independent_python_reference(
    spark, sf_dir
):
    from spotify_podcasts_airflow_batch_spark.sources.readers import table

    vecs = {
        r.vec_id: list(r.embedding)
        for r in table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    got = ivf_train_cells(spark, sf_dir)
    want = _py_full_lloyd(vecs, iters=_PQ_TRAIN_ITERS)
    assert got == want


def _write_embeddings(path: str, rows: list[tuple[int, list[float]]]):
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.string()),
        ]
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array(["a"] * len(rows), pa.string()),
            },
            schema=schema,
        ),
        path,
    )


def test_cell_memo_fingerprint_invalidates_on_rewrite(spark, tmp_path):
    """The trained-constant memo keys on the dataset FINGERPRINT
    (mtime + size), not the path string: regenerating the parquet at
    the same path within one process must retrain, not serve a stale
    model (ADVICE r5)."""
    d = str(tmp_path)
    p = os.path.join(d, "embeddings.parquet")
    rows_a = [
        (i, [((i * 31 + j * 7) % 100) / 100.0 for j in range(_EMBED_DIMS)])
        for i in range(40)
    ]
    _write_embeddings(p, rows_a)
    a = ivf_train_cells_cached(spark, d)
    assert a == ivf_train_cells_cached(spark, d)  # memo hit
    rows_b = [
        (i, [((i * 17 + j * 13) % 100) / 100.0 for j in range(_EMBED_DIMS)])
        for i in range(40)
    ]
    os.remove(p)
    _write_embeddings(p, rows_b)
    b = ivf_train_cells_cached(spark, d)
    assert b != a  # fingerprint changed → retrained on the new data


def test_occupancy_conserves_corpus_and_covers_both_variants(
    spark, sf_dir
):
    from spotify_podcasts_airflow_batch_spark.sources.readers import table

    n_corpus = table(spark, sf_dir, "embeddings").count()
    rows = (
        all_queries()["ivf_cell_occupancy"].spark_fn(spark, sf_dir).collect()
    )
    n_cells = ivf_n_cells(n_corpus)
    by_variant: dict[str, int] = {}
    for r in rows:
        assert 0 <= r.cell_id < n_cells
        assert r.n_vectors >= 0
        by_variant[r.variant] = by_variant.get(r.variant, 0) + r.n_vectors
    # cells PARTITION the corpus under both quantizers
    assert by_variant == {"seeded": n_corpus, "trained": n_corpus}
    # ...and the report covers the √n-scaled cell grid (VERDICT r7
    # item 2: D30 reads the corpus-derived cell count, not a frozen
    # constant)
    assert len(rows) == 2 * n_cells


def test_cell_count_formula_matches_sql_twin():
    """ivf_n_cells (Python) and the oracle's cn CTE (DuckDB) must
    choose the IDENTICAL k for any corpus count — both compute
    clamp(ceil(sqrt(double(n)))) through the same IEEE expression."""
    import duckdb

    from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
        _IVF_CELL_CAP,
    )

    con = duckdb.connect()
    ns = (
        list(range(0, 70))
        + [99, 100, 101, 255, 256, 257, 1 << 20, (1 << 20) + 1]
        + [x * x for x in (23, 45, 100, 448, 1000)]
        + [x * x - 1 for x in (23, 45, 448)]
        + [_IVF_CELL_CAP**2, _IVF_CELL_CAP**2 + 1, 10**12]
    )
    for n in ns:
        (got,) = con.execute(
            f"SELECT greatest(1, least({_IVF_CELL_CAP}, "
            f"CAST(ceil(sqrt(CAST({n} AS DOUBLE))) AS BIGINT)))"
        ).fetchone()
        assert got == ivf_n_cells(n), n


def test_train_stride_formula_matches_sql_twin():
    """ivf_train_mod (Python) and the cm CTE (DuckDB) must pick the
    identical sample stride for any corpus count — and the stride must
    stay _PQ_TRAIN_MOD at every test SF so pre-round-8 driver rows
    remain valid."""
    import duckdb

    from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
        _IVF_CELL_CAP,
        ivf_train_mod,
    )

    con = duckdb.connect()
    for n in [0, 1, 4, 500, 2000, 150_000, 200_000, 10**6, 10**9]:
        (got,) = con.execute(
            f"""WITH cn AS (SELECT greatest(1, least({_IVF_CELL_CAP},
                CAST(ceil(sqrt(CAST({n} AS DOUBLE))) AS BIGINT))) AS k)
                SELECT greatest({_PQ_TRAIN_MOD}, {n} // (96 * k))
                FROM cn"""
        ).fetchone()
        assert got == ivf_train_mod(n), n
    assert ivf_train_mod(500) == _PQ_TRAIN_MOD
    assert ivf_train_mod(2000) == _PQ_TRAIN_MOD
