"""Join operators: validated enrichment join and scalable as-of join.

Reference parity: ``spotify_eps.py:204-214`` does ``pd.merge(chart_df,
eps_df, left_on='episodeUri', right_on='id', how='left')`` one region
at a time on the driver, then raises if any ``episodeName != name``
row exists, then drops the duplicated join columns. Here the merge is
one distributed join (dimension side broadcast when small), and the
validation is an aggregate over the joined frame instead of a
driver-side boolean."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def validated_left_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    validate: Column | None = None,
    broadcast_right: bool = True,
    drop_right_key: bool = True,
) -> DataFrame:
    """Left-enrichment join with an optional row-level validation flag.

    ``validate`` is a boolean Column over the joined frame; rows where
    it is False get ``__mismatch = true``. Callers either filter on it
    (audit query) or assert none exist (pipeline), replacing the
    reference's ValueError on ``episodeName != name``.
    """
    r = F.broadcast(right) if broadcast_right else right
    joined = left.join(r, on=left[left_on] == r[right_on], how="left")
    if drop_right_key:
        joined = joined.drop(r[right_on])
    if validate is not None:
        joined = joined.withColumn(
            "__mismatch", ~F.coalesce(validate, F.lit(True))
        )
    return joined


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    right_tiebreak: Column | None = None,
) -> DataFrame:
    """As-of join: for every left row, the payload of the latest right
    row with ``right.ts <= left.ts`` for the same key.

    Implemented with the union+window trick rather than a pairwise
    range join: tag both sides, union, and carry the last non-null
    payload forward within each key ordered by time. Cost is one
    shuffle on the key and a per-key sort — linear in |L|+|R|, vs the
    |L|×|R| blow-up of a naive range join. This is the plan that holds
    at 100 TB; Catalyst cannot derive it from a correlated subquery.
    """
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in payload_cols:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rt = (
        right.select(
            F.col(right_key).alias(key),
            F.col(right_ts).alias("__t"),
            F.lit(0).alias("__side"),
            *[F.col(c) for c in payload_cols],
        )
    )
    # Deterministic winner among right rows sharing (key, ts): rather
    # than pre-deduping with a row_number window partitioned by
    # (key, ts) — a SECOND shuffle+sort of the whole right side — fold
    # the tiebreak into the one window's sort order. Ascending, so the
    # frame's LAST right row at the greatest timestamp is the max-
    # tiebreak one, which is exactly what last(ignorenulls) picks up.
    order = [F.col("__t"), F.col("__side")]
    if right_tiebreak is not None:
        rt = rt.withColumn("__tb", right_tiebreak)
        order.append(F.col("__tb").asc_nulls_first())
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # right rows (__side=0) sort before left rows at equal timestamps →
    # "<=" as-of semantics.
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in payload_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out.where(F.col("__side") == 1).drop("__side", "__t", "__tb")
