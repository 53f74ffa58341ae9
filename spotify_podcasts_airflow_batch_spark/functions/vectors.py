"""Vector column functions over ``array<float>`` embeddings.

All JVM-side higher-order functions (``zip_with`` + ``aggregate``) with
double accumulation — no UDF, no Arrow transfer, fully codegen'd. For
very wide vectors a Pandas-UDF BLAS path could win; at 64-dim the
built-ins are faster than the Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero (failed-embedding) vector has no direction —
    # cosine is NULL, not an ANSI divide-by-zero crash; NULLs sort
    # last under desc, so zero vectors never rank as neighbors
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_normalized(df, vec_col: str, out_col: str):
    """Attach an L2-normalized copy of ``vec_col``.

    The norm is staged as its own column so it is computed ONCE per
    row — pair-wise cosine after a join then reduces to a plain dot
    product: O(rows) norm evaluations instead of O(pairs). (Inlining
    ``x / norm(a)`` inside the transform lambda would re-evaluate the
    norm per ELEMENT.)"""
    n = norm(F.col(vec_col))
    return (
        df.withColumn("__norm", n)
        .withColumn(
            out_col,
            # try_divide: a zero vector normalizes to NULL elements
            # (→ NULL downstream dots, sorted last) instead of an
            # ANSI divide-by-zero crash
            F.transform(
                F.col(vec_col),
                lambda x: F.try_divide(x.cast("double"), F.col("__norm")),
            ),
        )
        .drop("__norm")
    )
