"""Shared statistical aggregate algebra used by more than one plan.

The k-group one-way-ANOVA tail (per-group (n, mean, var_samp) →
between/within sums of squares → F statistic) is the core of both
E65 `anova_f` (on raw values) and E66 `levene_bf` (on |value −
median| deviations). Both the DataFrame algebra and the oracle SQL
fragment live here ONCE so a fix to the algebra (e.g. a
degenerate-input guard) cannot silently apply to only one of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anova_tail_sql(stat_alias: str, include_eta: bool) -> str:
    """Oracle tail over a CTE ``s(group, n, m, v)``: the ``g``
    aggregate plus the final SELECT. Plain ``/`` is NULL-on-zero in
    DuckDB, matching the Spark side's try_divide."""
    eta = (
        ",\n           round((snmm - snm * snm / n_tot)"
        "\n                 / ((snmm - snm * snm / n_tot) + ssw), 6)"
        " AS eta_sq"
        if include_eta
        else ""
    )
    return f"""
    g AS (
        SELECT count(*) AS k, sum(n) AS n_tot,
               sum(n * m) AS snm, sum(n * m * m) AS snmm,
               sum((n - 1) * v) AS ssw
        FROM s
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(n_tot AS BIGINT) AS n_total,
           round(((snmm - snm * snm / n_tot) / (k - 1))
                 / (ssw / (n_tot - k)), 4) AS {stat_alias},
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(n_tot - k AS BIGINT) AS df_within{eta}
    FROM g
    """


def anova_tail(s: DataFrame, stat_alias: str, include_eta: bool) -> DataFrame:
    """DataFrame tail over a per-group relation ``s(n, m, v)``.

    try_divide ≡ DuckDB's NULL-on-zero: constant values (SS_within =
    0, and SS_total = 0 for eta²) or a single group (k − 1 = 0) make
    the statistic undefined, not an ANSI divide-by-zero crash."""
    g = s.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum(F.col("n") * F.col("m")).alias("snm"),
        F.sum(F.col("n") * F.col("m") * F.col("m")).alias("snmm"),
        F.sum((F.col("n") - 1) * F.col("v")).alias("ssw"),
    )
    ssb = F.col("snmm") - F.col("snm") * F.col("snm") / F.col("n_tot")
    cols = [
        F.col("k").cast("long").alias("k"),
        F.col("n_tot").cast("long").alias("n_total"),
        F.round(
            F.try_divide(
                F.try_divide(ssb, F.col("k") - 1),
                F.try_divide(F.col("ssw"), F.col("n_tot") - F.col("k")),
            ),
            4,
        ).alias(stat_alias),
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("n_tot") - F.col("k")).cast("long").alias("df_within"),
    ]
    if include_eta:
        cols.append(
            F.round(F.try_divide(ssb, ssb + F.col("ssw")), 6).alias(
                "eta_sq"
            )
        )
    return g.select(*cols)
