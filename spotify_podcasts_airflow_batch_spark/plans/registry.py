"""Query catalog registry.

Each capability from SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (where expressible)
the equivalent ANSI SQL a DuckDB oracle can run on the same parquet
tables. ``__spark_entry__`` exposes the registry to the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

_PLAN_MODULES = (
    "spotify_podcasts_airflow_batch_spark.plans.relational",
    "spotify_podcasts_airflow_batch_spark.plans.relational2",
    "spotify_podcasts_airflow_batch_spark.plans.relational3",
    "spotify_podcasts_airflow_batch_spark.plans.relational4",
    "spotify_podcasts_airflow_batch_spark.plans.recsys",
    "spotify_podcasts_airflow_batch_spark.plans.reference_parity",
    "spotify_podcasts_airflow_batch_spark.plans.text",
    "spotify_podcasts_airflow_batch_spark.plans.text2",
    "spotify_podcasts_airflow_batch_spark.plans.text3",
    "spotify_podcasts_airflow_batch_spark.plans.llm_pipeline",
    "spotify_podcasts_airflow_batch_spark.plans.llm_pipeline2",
    "spotify_podcasts_airflow_batch_spark.plans.analytics",
    "spotify_podcasts_airflow_batch_spark.plans.analytics2",
    "spotify_podcasts_airflow_batch_spark.plans.similarity",
    "spotify_podcasts_airflow_batch_spark.plans.similarity2",
    "spotify_podcasts_airflow_batch_spark.plans.similarity3",
    "spotify_podcasts_airflow_batch_spark.plans.similarity4",
    "spotify_podcasts_airflow_batch_spark.plans.stream_state",
    "spotify_podcasts_airflow_batch_spark.plans.events",
    "spotify_podcasts_airflow_batch_spark.plans.events2",
    "spotify_podcasts_airflow_batch_spark.plans.timeseries",
    "spotify_podcasts_airflow_batch_spark.plans.experiments",
    "spotify_podcasts_airflow_batch_spark.plans.multimodal",
)


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check


# The correctness driver samples the FIRST 50 registry entries in
# iteration order. This explicit head is ROTATED each round toward
# never-driver-verified keys so the whole catalog eventually gets a
# driver-checked row: rounds 1-2 verified the relational (B) head,
# round 3 the A/C-core/D/E/F representatives, round 4 the text/
# recsys/events/statistics wave, round 5 the sampling/PQ-ANN/
# E-statistics wave, round 6 the analytics/timeseries/ANN-serving
# wave, round 7 the served-quantizer/experimentation wave — after
# which every catalog entry had at least one driver row. From round 8
# the window pivots from "never verified" to "verified, then
# CHANGED": keys whose plan or oracle was rewritten AFTER their last
# driver hash row come first (round 8: the r7 degenerate fixes, all
# re-verified green; round 9: the PQ/IVF family rewritten by the
# round-8 √n-cells + ivf_assign_arrow change, VERDICT r8 item 1),
# then the round's additions, then refill with already-verified
# oracle-bearing keys in registry order so the window never runs
# short. Queries outside the head stay covered by the local
# driver-strict suite (tests/test_queries_oracle.py), which runs the
# same row-count / schema / canonicalized-hash comparison on every
# registered query.

# Keys whose plan or oracle text changed after their most recent
# driver hash row — the rotation's first-priority fill, and the
# documented exemption that lets a rows-only key with an old clean
# row re-enter the head (tests/test_driver_window.py).
_CHANGED_SINCE_DRIVER_ROW = (
    # round-10 plan changes after the r9 rows: the size-gated
    # tombstone broadcast + hot-cell-splitting compaction touch the
    # D39/D40/D41 serve plans and B68's memo key; the PQ/OPQ trainer
    # corpus<k seeding fix (len()-bounded centroid lists — behavior-
    # identical at every driver SF, where the corpus is 500 vectors)
    # touches the shared trainers, re-proven through one serving
    # representative per trainer variant (plain PQ, IVF-PQ trained
    # cb_row, residual cb_row, OPQ trainer x2)
    "ivfpq_incremental_served",
    "ann_staleness_recall",
    "ivfpq_compacted_served",
    "bucketed_colocated_join",
    "pq_adc_ann_served",
    "ivfpq_ann_served",
    "ivfpq_residual_ann_served",
    "opq_ann",
    "opq_recall",
)

_DRIVER_HEAD = (
    "q1_pricing_summary",  # sentinel
    "q9_product_profit",  # sentinel
    "salted_join",  # sentinel
    # -- changed after their last driver row (see above)
    *_CHANGED_SINCE_DRIVER_ROW,
    # -- round-10 additions (ANN lifecycle completion + promotions)
    "ivfpq_retrained_served",
    "ivfpq_retrained_recall",
    "ivfpq_streamed_served",
    "stream_latest_state",
    "token_budget_mix",
    "stream_daily_table",
    "stream_closed_sessions",
    "stream_enriched_events",
    # -- freshness rotation (VERDICT r9 follow-up #3): the oldest 34
    #    of the 61 keys whose most recent driver row is r1-r3 (sorted
    #    by last-row round, then registry order, with media_features
    #    swapped in for the F-family representative; the stale keys that
    #    no longer fit — 31 with the round's late additions — rotate
    #    next round)
    "recursive_bom_depth",
    "k_anonymity_audit",
    "weighted_median_price",
    "approx_distinct_audit",
    "global_row_number",
    "stats_summary",
    "heavy_hitters_contain",
    "fuzzy_name_match",
    "join_size_estimate",
    "revenue_gini",
    "supplier_hhi",
    "pareto_8020",
    "approx_quantiles_audit",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_excess_suppliers",
    "chart_rank",
    "chart_transform",
    "enrich_left_join",
    "join_mismatch_audit",
    "union_consolidate",
    "daily_snapshot",
    "region_pivot",
    "latest_per_key",
    "scd2_intervals",
    "snapshot_diff",
    "dq_expectations",
    "doc_fingerprint",
    "media_features",
)


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _DRIVER_HEAD if n not in _REGISTRY]
    if missing:
        raise RuntimeError(
            "_DRIVER_HEAD keys not registered by any plan module "
            f"(renamed or removed?): {missing}"
        )
    head = {n: _REGISTRY[n] for n in _DRIVER_HEAD}
    rest = {n: q for n, q in _REGISTRY.items() if n not in head}
    return {**head, **rest}
