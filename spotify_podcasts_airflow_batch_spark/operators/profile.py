"""One-pass table profiling (SURVEY.md §2 C26).

The data-quality summary every ingest run computes before anything
else: per-column row/null/distinct counts and min/max. One aggregate
over one scan — Spark plans the multiple count(distinct) via a single
Expand (each input row fans into one record per distinct group), so
the table is read once however many columns are profiled. The wide
1-row aggregate is then unpivoted to long form with ``stack``, which
is a projection (Expand), not a shuffle.

At 100 TB swap ``count_distinct`` for ``approx_count_distinct``: the
Expand fan-out disappears and the whole profile becomes one
map-side-combinable pass with HLL sketch state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-form profile: (column_name, n_rows, n_null, n_distinct,
    min_v, max_v). min/max compare in the column's native type and
    cast to string only for the unified output schema."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.extend(
            [
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
                F.count_distinct(F.col(c)).alias(f"{c}__nd"),
                F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
                F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
            ]
        )
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column_name, n_null, n_distinct, min_v, max_v)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v")
