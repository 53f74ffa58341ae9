"""End-to-end corpus-preparation pipeline (pipeline/llm_corpus.py):
stage monotonicity, output invariants, idempotent re-run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.pipeline.llm_corpus import (
    CorpusPipeline,
)


@pytest.fixture(scope="module")
def run(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus") / "prepared")
    pipe = CorpusPipeline(spark, sf_dir, out)
    stats = pipe.run()
    return pipe, stats, out


def test_stage_counts_monotone_and_nonempty(run):
    _, stats, _ = run
    assert (
        stats["n_input"]
        >= stats["n_quality"]
        >= stats["n_after_exact"]
        >= stats["n_after_near"]
        > 0
    )
    # the gate must actually shed something on the synthetic corpus
    assert stats["n_quality"] < stats["n_input"]


def test_output_has_no_exact_duplicates(run, spark):
    _, _, out = run
    back = spark.read.parquet(out)
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    assert (
        back.select(fp.alias("fp")).distinct().count() == back.count()
    )


def test_split_partitions_complete_and_disjoint(run, spark):
    _, stats, out = run
    back = spark.read.parquet(out)
    assert set(stats["splits"]) <= {"train", "val", "test"}
    assert sum(stats["splits"].values()) == stats["n_after_near"]
    assert back.count() == stats["n_after_near"]
    # split is a pure function of doc_id → no doc in two splits
    assert back.select("doc_id").distinct().count() == back.count()


def test_rerun_is_idempotent(run, spark):
    pipe, stats, out = run
    stats2 = CorpusPipeline(spark, pipe.sf_dir, out).run()
    assert stats2 == stats


def test_domain_cap_stage_bounds_groups(spark, sf_dir, tmp_path):
    """With domain_quota set, no (source, lang) group in the written
    corpus exceeds the quota, the kept docs are the longest of each
    group, and the run stays deterministic."""
    out = str(tmp_path / "capped")
    pipe = CorpusPipeline(spark, sf_dir, out, domain_quota=2)
    stats = pipe.run()
    assert stats["n_after_near"] > 0

    written = spark.read.parquet(out)
    counts = written.groupBy("source", "lang").count().collect()
    assert counts and all(r["count"] <= 2 for r in counts)

    # re-run → byte-identical membership
    out2 = str(tmp_path / "capped2")
    CorpusPipeline(spark, pipe.sf_dir, out2, domain_quota=2).run()
    ids1 = sorted(r.doc_id for r in written.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id for r in spark.read.parquet(out2).select("doc_id").collect()
    )
    assert ids1 == ids2
