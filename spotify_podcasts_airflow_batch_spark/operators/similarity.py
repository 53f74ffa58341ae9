"""Similarity-search operators (SURVEY.md §2 D1-D2).

Brute-force cosine top-k is the exactness baseline: broadcast the
(small) query set against the corpus — the corpus is never shuffled,
so the plan is a single scan however large the corpus gets.

The scale path is random-hyperplane LSH: each vector gets a bucket id
from the sign pattern of 8 fixed hyperplanes (deterministically derived
from the md5 hash family, so buckets are reproducible across runs and
engines). Candidate generation is an equi-join on the bucket id —
cost rides bucket occupancy, not corpus size. Identical vectors always
share a bucket, so exact-duplicate recall is 1.0 by construction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.functions.vectors import (
    dot,
    l2_normalized,
)

NUM_PLANES = 8


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random value in [-1, 1] from the shared
    md5-derived hash family (same construction as functions/hashing)."""
    h = hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()
    return (int(h[:15], 16) / float(1 << 60)) * 2.0 - 1.0


def hyperplanes(dims: int, planes: int = NUM_PLANES) -> list[list[float]]:
    return [
        [_plane_component(p, d) for d in range(dims)] for p in range(planes)
    ]


def lsh_bucket(vec: Column, dims: int, planes: int = NUM_PLANES) -> Column:
    """Sign-pattern bucket id in [0, 2^planes)."""
    bucket = F.lit(0)
    for p, plane in enumerate(hyperplanes(dims, planes)):
        plane_col = F.array(*[F.lit(v) for v in plane])
        bit = (dot(vec, plane_col) > 0).cast("int")
        bucket = bucket + bit * F.lit(1 << p)
    return bucket


def knn_brute_force(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan corpus × per-query
    window. Ordering uses round(cos, 6) + id so ranks are reproducible
    bit-for-bit against the oracle. Both sides are L2-normalized once
    per row, so each of the |Q|×|C| pairs costs one dot product."""
    q = F.broadcast(
        l2_normalized(queries, vec_col, "__nq").select(
            F.col(id_col).alias("query_id"), F.col("__nq").alias("qvec")
        )
    )
    c = l2_normalized(corpus, vec_col, "__nc").select(
        F.col(id_col).alias("neighbor_id"), F.col("__nc").alias("cvec")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_raw", dot(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_raw"), 4).alias("cos_sim"),
            "rank",
        )
    )


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    n_probe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: nearest-centroid cell assignment + probed search.

    Coarse centroids are the first ``n_cells`` corpus vectors by id —
    deterministic without a training pass (swap in k-means centroids
    from `label_centroids`-style aggregation for real data). Corpus
    rows join only the broadcast centroid set (argmax via max_by);
    queries probe their ``n_probe`` best cells. All joins are
    broadcast-or-bucket — the corpus never self-joins."""
    cents = F.broadcast(
        l2_normalized(corpus.orderBy(id_col).limit(n_cells), vec_col, "__ncent")
        .select(
            F.col(id_col).alias("cell_id"), F.col("__ncent").alias("cvec_cent")
        )
    )

    def assign(df: DataFrame, idc: str, vc: str, n: int) -> DataFrame:
        # df's vc is already normalized; centroids normalized above →
        # cell affinity is a dot product
        scored = df.crossJoin(cents).withColumn(
            "cell_cos", dot(F.col(vc), F.col("cvec_cent"))
        )
        w = Window.partitionBy(idc).orderBy(
            F.round(F.col("cell_cos"), 6).desc(), F.col("cell_id")
        )
        return (
            scored.withColumn("__cr", F.row_number().over(w))
            .where(F.col("__cr") <= n)
            .drop("__cr", "cvec_cent", "cell_cos")
        )

    bc = assign(
        l2_normalized(corpus, vec_col, "__nv").select(
            F.col(id_col).alias("neighbor_id"), F.col("__nv").alias("cvec")
        ),
        "neighbor_id",
        "cvec",
        1,
    )
    bq = assign(
        l2_normalized(queries, vec_col, "__nv").select(
            F.col(id_col).alias("query_id"), F.col("__nv").alias("qvec")
        ),
        "query_id",
        "qvec",
        n_probe,
    )
    scored = (
        F.broadcast(bq)
        .join(bc, "cell_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_raw", dot(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_raw"), 4).alias("cos_sim"),
            "rank",
        )
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = NUM_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine within. Same output shape as brute force;
    recall is a function of `planes` (8 → 256 buckets)."""
    bq = l2_normalized(queries, vec_col, "__nv").select(
        F.col(id_col).alias("query_id"),
        F.col("__nv").alias("qvec"),
        lsh_bucket(F.col(vec_col), dims, planes).alias("bucket"),
    )
    bc = l2_normalized(corpus, vec_col, "__nv").select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__nv").alias("cvec"),
        lsh_bucket(F.col(vec_col), dims, planes).alias("bucket"),
    )
    scored = (
        F.broadcast(bq)
        .join(bc, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_raw", dot(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_raw"), 4).alias("cos_sim"),
            "rank",
        )
    )
