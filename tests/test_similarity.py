"""Property tests for similarity search (D2's recall floor — the part
the oracle can't check because LSH is approximate by design)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from spotify_podcasts_airflow_batch_spark.operators.similarity import (
    knn_brute_force,
    knn_lsh,
    lsh_bucket,
)

DIMS = 8


def _vecs(spark):
    import math

    rows = []
    for i in range(40):
        # deterministic points on a few directions + noise-free dups
        base = [math.sin(0.7 * i + d) for d in range(DIMS)]
        rows.append((i, [float(x) for x in base]))
    rows.append((100, rows[7][1]))  # exact duplicate of vec 7
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_identical_vectors_share_bucket(spark):
    df = _vecs(spark)
    b = df.select(
        "vec_id", lsh_bucket(F.col("embedding"), DIMS).alias("bucket")
    ).collect()
    buckets = {r.vec_id: r.bucket for r in b}
    assert buckets[7] == buckets[100]
    assert all(0 <= v < 256 for v in buckets.values())


def test_lsh_finds_exact_duplicate(spark):
    df = _vecs(spark)
    queries = df.where(F.col("vec_id") == 7)
    res = knn_lsh(df, queries, dims=DIMS, k=5).collect()
    top = [r.neighbor_id for r in res if r.rank == 1]
    assert top == [100]  # the planted duplicate is rank 1, cos=1
    assert res[0].cos_sim == 1.0


def test_brute_force_is_exact_reference(spark):
    df = _vecs(spark)
    queries = df.where(F.col("vec_id") == 7)
    brute = knn_brute_force(df, queries, k=5).collect()
    assert [r.neighbor_id for r in brute if r.rank == 1] == [100]
    # LSH results are a subset of the same scoring order
    lsh = knn_lsh(df, queries, dims=DIMS, k=5).collect()
    brute_order = [r.neighbor_id for r in brute]
    lsh_order = [r.neighbor_id for r in lsh]
    assert [n for n in brute_order if n in set(lsh_order)] == lsh_order


def test_hamming_rerank_recall_vs_brute(spark):
    """D9 recall floor on real data: the quantized shortlist reranked
    exactly must recover most of the true top-10 (sf0.001 corpus)."""
    from spotify_podcasts_airflow_batch_spark.plans.similarity import (
        ann_hamming_rerank,
        knn_brute,
    )

    sf = "/root/testdata/sf0.001"
    brute = {
        (r.query_id, r.neighbor_id) for r in knn_brute(spark, sf).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in ann_hamming_rerank(spark, sf).collect()
    }
    assert len(quant) == len(brute)
    recall = len(quant & brute) / len(brute)
    assert recall >= 0.5, recall


def test_hamming_rerank_planted_duplicate(spark):
    """An exact duplicate has Hamming distance 0 and cosine 1 — it must
    survive the prefilter and land at rank 1."""
    from spotify_podcasts_airflow_batch_spark.operators.similarity import (
        knn_hamming_rerank,
    )

    df = _vecs(spark)
    res = knn_hamming_rerank(
        df,
        df.where(F.col("vec_id") == 7),
        thresholds=[0.0] * DIMS,
        k=5,
    ).collect()
    top = [r for r in res if r.rank == 1]
    assert [r.neighbor_id for r in top] == [100]
    assert top[0].hamming == 0 and top[0].cos_sim == 1.0


def test_ann_recall_metric_exact(spark, sf_dir):
    """D15: the recall table is cross-checked value-for-value against an
    independent numpy recomputation — exact top-10 and bucket-restricted
    LSH top-10 from the same deterministic hyperplanes. (No quality
    floor: on isotropic synthetic vectors single-probe 8-plane LSH is
    LEGITIMATELY poor — surfacing that is the point of the op.)"""
    import numpy as np

    from spotify_podcasts_airflow_batch_spark.operators.similarity import (
        NUM_PLANES,
        hyperplanes,
    )
    from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries
    from spotify_podcasts_airflow_batch_spark.sources.readers import table

    rows = all_queries()["ann_recall"].spark_fn(spark, sf_dir).collect()
    got = {r.query_id: r.recall_at_k for r in rows}
    assert all(r.k == 10 for r in rows)

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in e])
    X = np.array([list(r.embedding) for r in e], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    H = np.array(hyperplanes(X.shape[1], NUM_PLANES))
    buckets = ((X @ H.T) >= 0) @ (1 << np.arange(NUM_PLANES))

    def topk(q_idx, cand_mask, k=10):
        cos = Xn[cand_mask] @ Xn[q_idx]
        cand_ids = ids[cand_mask]
        order = sorted(
            range(len(cand_ids)), key=lambda i: (-round(cos[i], 6), cand_ids[i])
        )
        return [cand_ids[i] for i in order[:k]]

    for qi in range(len(ids)):
        if ids[qi] >= 5:
            continue
        exact = topk(qi, ids != ids[qi])
        approx = set(topk(qi, (buckets == buckets[qi]) & (ids != ids[qi])))
        want = round(len([n for n in exact if n in approx]) / len(exact), 4)
        assert got[ids[qi]] == want, (ids[qi], got[ids[qi]], want)
