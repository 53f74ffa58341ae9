"""Snapshot differencing (CDC extraction between table versions).

The reference republishes its consolidated dataset daily
(kaggle_update_dag.py — each run overwrites the Kaggle version with a
fresh full snapshot). The dual of "publish a full snapshot" is
"publish the delta": given yesterday's and today's versions of a keyed
relation, emit one row per changed key tagged insert/update/delete —
the change feed a downstream consumer can apply incrementally instead
of re-reading 100 TB.

Spark-first shape: one full outer shuffle join on the key, null-checks
classify the op. Both sides partial-aggregate/prune before the join;
at scale the two snapshots should share a bucketed layout on the key
(operators/bucketing.py) so the diff is Exchange-free. Value equality
is null-safe (``<=>``), so NULL→value and value→NULL transitions count
as updates, not noise.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare: list[str]
) -> DataFrame:
    """Diff two versions of a keyed relation.

    Returns ``keys…, op, old_<c>…, new_<c>…`` with one row per key
    whose presence or compared values changed; unchanged keys are
    dropped (a change feed carries changes only).
    """
    # Presence markers, not key-nullability: the join itself is
    # null-safe, so a NULL-keyed row can legitimately exist on both
    # sides — testing the key columns for NULL would misread it as
    # absent and tag a value change as delete+insert.
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare],
        F.lit(True).alias("__in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}")) for k in keys],
    )
    joined = o.join(n, cond, "full_outer")

    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    same_vals = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare
        ],
        F.lit(True),
    )
    op = (
        F.when(~in_new, F.lit("delete"))
        .when(~in_old, F.lit("insert"))
        .when(~same_vals, F.lit("update"))
        .otherwise(F.lit("same"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op") != "same")
        .select(
            *[
                F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
                for k in keys
            ],
            "op",
            *[F.col(f"old_{c}") for c in compare],
            *[F.col(f"new_{c}") for c in compare],
        )
    )


def apply_diff(
    old: DataFrame, diff: DataFrame, keys: list[str], compare: list[str]
) -> DataFrame:
    """Apply a change feed back onto a snapshot: the consumer-side dual
    of :func:`snapshot_diff`. ``apply_diff(old, snapshot_diff(old, new))
    == new`` — the invariant tests/test_cdc.py asserts on arbitrary
    inputs.

    Plan shape: one left anti join drops deleted/updated keys from the
    base, then the feed's insert/update images union in. Both sides
    partition on the key, so on bucketed layouts this is Exchange-free
    — the same property the diff side has.
    """
    changed_keys = diff.select(*[F.col(k).alias(f"__ck_{k}") for k in keys])
    anti_cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__ck_{k}"))  # NULL keys must match
        anti_cond = c if anti_cond is None else (anti_cond & c)
    kept = old.join(changed_keys, anti_cond, "left_anti")
    upserts = diff.filter(F.col("op") != "delete").select(
        *[F.col(k) for k in keys],
        *[F.col(f"new_{c}").alias(c) for c in compare],
    )
    return kept.unionByName(upserts)
