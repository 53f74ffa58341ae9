"""Similarity / embedding-quality operators, part 2 (SURVEY.md §2
D14-D15): SemDeDup-style semantic dedup output and a first-class
ANN-recall evaluation query.

D14 turns the near-dup PAIR diagnostic (D-series `embed_near_dup`)
into the artifact a training pipeline actually ships — the kept
corpus; D15 turns the test-only recall assertion into a queryable
evaluation table, because at 100 TB you tune LSH plane counts from a
recall dashboard, not a unit test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.operators.similarity import (
    blocked_allpairs_cosine,
    knn_brute_force,
    knn_lsh,
)
from spotify_podcasts_airflow_batch_spark.plans.registry import register
from spotify_podcasts_airflow_batch_spark.sources.readers import table

_SEMDEDUP_TAU = 0.3
_EMBED_DIMS = 64


@register(
    "semdedup_keep",
    oracle=f"""
    SELECT a.vec_id, a.label
    FROM embeddings a
    WHERE NOT EXISTS (
        SELECT 1 FROM embeddings b
        WHERE b.label = a.label
          AND b.vec_id < a.vec_id
          AND list_cosine_similarity(
                  a.embedding::DOUBLE[], b.embedding::DOUBLE[]
              ) >= {_SEMDEDUP_TAU}
    )
    """,
)
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14 — SemDeDup (Abbas et al. 2023) cleaned-corpus output: a
    vector is dropped when ANY earlier vector (smaller id) in its
    cluster is cosine-similar ≥ τ. The rule is a pure function of the
    pair set — no sequential greedy pass — so it parallelizes: compute
    blocked all-pairs once (numpy GEMM per cluster block, cost bounded
    by Σ block², never corpus²), distinct the later-id side, anti-join
    the corpus against it. The oracle keeps the quadratic NOT EXISTS
    form. At 100 TB the cluster blocks come from k-means cells
    (D7/D3); here the pre-assigned ``label`` stands in."""
    e = table(spark, sf_dir, "embeddings")
    pairs = blocked_allpairs_cosine(
        e, block_col="label", id_col="vec_id", vec_col="embedding",
        tau=_SEMDEDUP_TAU, round_dp=4,
    )
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return e.join(dropped, "vec_id", "left_anti").select("vec_id", "label")


@register("ann_recall", oracle=None)  # rows-only: grades an approximate index
def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15 — recall@10 of the LSH index (D2) against exact brute force
    (D1), per query: |approx ∩ exact| / |exact|. The join is on
    (query, neighbor) between two top-k tables that are tiny by
    construction (queries × k rows) — the expensive parts are the
    underlying scans, each of which runs exactly once. Rows-only by
    nature (it GRADES an approximate structure); the metric itself is
    cross-checked value-for-value against an independent numpy
    recomputation in tests/test_similarity.py."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    exact = knn_brute_force(corpus=e, queries=q, k=10).select(
        "query_id", "neighbor_id"
    )
    approx = knn_lsh(corpus=e, queries=q, dims=_EMBED_DIMS, k=10).select(
        "query_id", F.col("neighbor_id").alias("approx_id")
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.approx_id),
        "left",
    ).select(exact.query_id, F.col("approx_id").isNotNull().alias("hit"))
    return hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.round(F.avg(F.col("hit").cast("double")), 4).alias("recall_at_k"),
    )


@register(
    "embed_norms_arrow",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_aggregate(
               list_transform(embedding::DOUBLE[], x -> x * x), 'sum')), 6)
               AS l2_norm,
           len(embedding) AS dim
    FROM embeddings
    """,
)
def embed_norms_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D16 — per-vector L2 norms via ``mapInArrow``: the zero-copy
    Arrow-batch escape hatch below even Pandas (no Series boxing — the
    fixed-size-list column is viewed as one flat numpy buffer and
    reshaped, one BLAS reduction per batch). The norm table is what a
    vector pipeline materializes before cosine work so downstream dots
    skip the sqrt. Embarrassingly parallel: no shuffle, cost linear in
    rows, constant memory per batch. Float parity: the squared terms
    sum in array order in both engines (numpy row reduction ≡ DuckDB
    list_aggregate fold), round(6) absorbs the last ulp."""
    import pyarrow as pa

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def norms(batches):
        import numpy as np

        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column("vec_id").to_numpy()
            lst = batch.column("embedding")
            # list<float> → flat values buffer (no per-row boxing),
            # reshaped on the uniform vector length
            X = lst.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64
            ).reshape(len(ids), -1)
            l2 = np.sqrt(np.einsum("ij,ij->i", X, X))
            yield pa.record_batch(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(np.round(l2, 6), type=pa.float64()),
                    pa.array(np.full(len(ids), X.shape[1]), type=pa.int64()),
                ],
                names=["vec_id", "l2_norm", "dim"],
            )

    return emb.mapInArrow(norms, "vec_id long, l2_norm double, dim long")
