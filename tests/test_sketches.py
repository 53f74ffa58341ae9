"""Sketch accuracy bounds: the approximate operators (B37/B38) vs
their exact counterparts on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries
from spotify_podcasts_airflow_batch_spark.sources.readers import table

QUERIES = all_queries()


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    """Each GK estimate must sit within ±1% of the requested rank
    (accuracy=10000 → ε=1e-4; we assert a much looser 1% rank bound
    computed against the exact sorted values)."""
    # long form: one row per (group, pct) with scalar approx_value
    rows = QUERIES["approx_quantiles"].spark_fn(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem")
    exact: dict[str, list[float]] = {}
    for r in rows:
        flag, q, est = r["l_returnflag"], r["pct"], r["approx_value"]
        if flag not in exact:
            exact[flag] = sorted(
                x["l_extendedprice"]
                for x in li.where(F.col("l_returnflag") == flag)
                .select("l_extendedprice")
                .collect()
            )
        vals = exact[flag]
        n = len(vals)
        lo = sum(1 for v in vals if v < est)
        hi = sum(1 for v in vals if v <= est)
        assert lo / n - 0.01 <= q <= hi / n + 0.01, (flag, q, est)


def test_approx_distinct_within_3rsd(spark, sf_dir):
    """B11's HLL estimate must land within 3·rsd (rsd=1%) of B11b's
    exact distinct count per group. This is where the sketch-accuracy
    guarantee lives — the driver oracle for the audit compares only
    the exact columns, so a probability-tail miss fails HERE as an
    accuracy regression, never as a correctness hash-mismatch."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["approx_distinct"].spark_fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n_users_exact"]
        for r in QUERIES["approx_distinct_audit"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, n in exact.items():
        err = abs(approx[etype] - n) / max(n, 1)
        assert err <= 3 * 0.01, (etype, approx[etype], n)


def test_heavy_hitters_contain_exact_answer(spark, sf_dir):
    """Every priority with true share > support (0.15) must appear —
    the sketch may over-report, never under-report."""
    got = {
        r["frequent_priority"]
        for r in QUERIES["heavy_hitters"].spark_fn(spark, sf_dir).collect()
    }
    o = table(spark, sf_dir, "orders")
    n = o.count()
    exact = {
        r["o_orderpriority"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 0.15 * n)
        .collect()
    }
    assert exact, "fixture data must have at least one true heavy hitter"
    assert exact <= got


def test_hll_daily_union_near_exact(spark, sf_dir):
    """The unioned daily HLL estimates per type must land within 5% of
    the exact distinct-user counts (lgK=12 → ~1.6% RSE), and must
    cover every day present in the data."""
    got = {
        r["event_type"]: r
        for r in QUERIES["hll_daily_union"].spark_fn(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    days = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for etype, row in got.items():
        assert row["n_days"] == days[etype]
        err = abs(row["approx_users"] - exact[etype]) / max(exact[etype], 1)
        assert err <= 0.05, (etype, row["approx_users"], exact[etype])
