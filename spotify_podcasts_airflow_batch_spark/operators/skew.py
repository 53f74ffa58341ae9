"""Skew-handling join (SURVEY.md §6).

AQE's skew-join splitting handles most skew at runtime; explicit
salting is the static fallback for the pathological case AQE can't
fix — a single hot key overwhelming one reducer in a shuffle join
where neither side broadcasts. The left (large, skewed) side gets a
random-ish salt derived deterministically from a unique column; the
right side is replicated ``salt_buckets`` times. Join key becomes
(key, salt) — the hot key's rows spread over ``salt_buckets``
reducers. Result is identical to the unsalted join (verified by the
`salted_join` oracle query)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_source: Column,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the left side salted on ``pmod(hash(salt_source))``.

    ``salt_source`` must be a column of the left frame (any
    well-distributed value, e.g. a line number or unique id) so the
    salt is deterministic — no rand(), which would break retries and
    reproducibility."""
    l_salted = left.withColumn(
        "__salt", F.pmod(F.hash(salt_source), F.lit(salt_buckets))
    )
    r_replicated = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    joined = l_salted.join(
        r_replicated,
        (l_salted[left_key] == r_replicated[right_key])
        & (l_salted["__salt"] == r_replicated["__salt"]),
        how,
    )
    return joined.drop("__salt")
