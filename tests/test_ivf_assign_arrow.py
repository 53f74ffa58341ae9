"""ivf_assign_arrow — the exact-integer Arrow cell-assignment kernel
behind the √n-cells IVF family: distances must equal the pure-integer
spec (quantize → squared L2 → (d2u, cell_id) argmin) bit-for-bit,
including quantization half-boundaries, ties, zero vectors, and
negative components; emits must agree across modes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
    ivf_assign_arrow,
)

_DIMS = 64


def _q(x: float) -> int:
    scaled = x * 1e6
    return (
        int(math.floor(scaled + 0.5))
        if scaled >= 0
        else int(math.ceil(scaled - 0.5))
    )


def _py_assign(vecs, cells_u, top):
    """Pure-Python integer reference: per vector, rank cells by
    (d2u, cell_id), return the first ``top``."""
    out = {}
    for vid, v in vecs:
        xu = [_q(float(x)) for x in v]
        ranked = sorted(
            (
                (
                    sum((xu[j] - c[j]) ** 2 for j in range(_DIMS)),
                    cid,
                )
                for cid, c in enumerate(cells_u)
            )
        )
        out[vid] = [cid for _, cid in ranked[:top]]
    return out


def _adversarial_corpus():
    """Vectors engineered at the kernel's edges: exact ties (equal
    vectors), the zero vector, negative components, values on the
    0.5e-6 quantization boundary, and large-ish magnitudes."""
    vecs = []
    for i in range(24):
        v = []
        for j in range(_DIMS):
            k = (i * 37 + j * 11) % 9
            v.append(
                [
                    0.0,
                    1.0,
                    -1.0,
                    0.0000005,  # rounds to 1 micro-unit (HALF_UP)
                    -0.0000005,  # rounds to -1 (away from zero)
                    0.1234567,
                    -2.5,
                    1.9999995,
                    ((i + j) % 7 - 3) / 3.0,
                ][k]
            )
        vecs.append((i, v))
    # duplicates of rows 0 and 5 → guaranteed distance ties with a
    # lower-cell_id winner to pin the tie-break
    vecs.append((100, list(vecs[0][1])))
    vecs.append((101, list(vecs[5][1])))
    return vecs


def test_kernel_matches_integer_spec_all_emits(spark):
    vecs = _adversarial_corpus()
    # cells = quantized copies of a few corpus rows (exact ties by
    # construction) plus a zero centroid
    cells_u = [
        [_q(float(x)) for x in vecs[i][1]] for i in (0, 3, 5, 7)
    ] + [[0] * _DIMS]
    df = spark.createDataFrame(
        [(vid, [float(x) for x in v]) for vid, v in vecs],
        "vec_id long, embedding array<float>",
    )
    # NOTE: float32 storage — the reference must quantize the FLOAT32
    # value, exactly as the kernel receives it through Arrow
    f32 = {
        r.vec_id: list(r.embedding)
        for r in df.select("vec_id", "embedding").collect()
    }
    vecs32 = [(vid, f32[vid]) for vid, _ in vecs]

    for top in (1, 3):
        want = _py_assign(vecs32, cells_u, top)
        got_rows = ivf_assign_arrow(
            df, cells_u, top=top, emit="cell"
        ).collect()
        got: dict[int, list[int]] = {}
        for r in got_rows:
            got.setdefault(r.vec_id, []).append(r.cell_id)
        # "cell" emit returns rows in rank order within each vec_id
        assert {k: v for k, v in got.items()} == want, top

    # cell+ru: residual = xu − cu[best], exact integers
    want1 = _py_assign(vecs32, cells_u, 1)
    for r in ivf_assign_arrow(df, cells_u, emit="cell+ru").collect():
        assert [r.cell_id] == want1[r.vec_id]
        xu = [_q(float(x)) for x in f32[r.vec_id]]
        cu = cells_u[r.cell_id]
        assert list(r.ru) == [xu[j] - cu[j] for j in range(_DIMS)]

    # cell+xu: the quantized vector itself
    for r in ivf_assign_arrow(df, cells_u, emit="cell+xu").collect():
        assert list(r.xu) == [_q(float(x)) for x in f32[r.vec_id]]

    # cell+vec: embedding passes through the Arrow exchange losslessly
    for r in ivf_assign_arrow(df, cells_u, emit="cell+vec").collect():
        assert list(r.embedding) == f32[r.vec_id]
        assert [r.cell_id] == want1[r.vec_id]


def test_kernel_matches_jvm_fold_on_fixture_corpus(spark, sf_dir):
    """Cross-implementation: the kernel's best cell equals the JVM
    interpreted-fold argmin (the pre-round-8 plan) on the real
    fixture embeddings."""
    from spotify_podcasts_airflow_batch_spark.plans.similarity2 import (
        ivf_train_cells_cached,
    )
    from spotify_podcasts_airflow_batch_spark.sources.readers import table

    cells_u = ivf_train_cells_cached(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    got = {
        r.vec_id: r.cell_id
        for r in ivf_assign_arrow(e, cells_u, emit="cell").collect()
    }
    xu = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.round(x * 1e6, 0).cast("long"),
    )
    ccs = F.array(
        *[F.array(*[F.lit(int(v)) for v in c]) for c in cells_u]
    )
    dists = F.transform(
        ccs,
        lambda c: F.aggregate(
            F.zip_with(F.col("__xu"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    want = {
        r.vec_id: r.cell_id
        for r in e.withColumn("__xu", xu)
        .select(
            "vec_id",
            (
                F.array_position(dists, F.array_min(dists)) - 1
            ).cast("int").alias("cell_id"),
        )
        .collect()
    }
    assert got == want
