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
    return dot(a, b) / (norm(a) * norm(b))
