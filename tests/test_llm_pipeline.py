"""Unit tests for the LLM-pipeline operators (SURVEY.md §2 C13-C17,
D6-D7) beyond the generic oracle gate: split reproducibility, quantizer
range/endpoints, k-means determinism and convergence direction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.plans.llm_pipeline import (
    _KMEANS_K,
    kmeans_lloyd,
    quality_filter,
    tfidf_cosine_pairs,
    train_split,
    vector_quantize,
)


def test_train_split_is_reproducible_and_total(spark, sf_dir):
    a = train_split(spark, sf_dir).collect()
    b = train_split(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = len(a)
    by = {}
    for r in a:
        by.setdefault(r.split, 0)
        by[r.split] += 1
    assert by["train"] + by.get("val", 0) + by.get("test", 0) == n
    # 80/10/10 within loose tolerance at sf0.001 (50 docs)
    assert by["train"] / n > 0.6


def test_train_split_partition_invariant(spark, sf_dir):
    base = train_split(spark, sf_dir)
    shuffled = base.repartition(7).collect()
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shuffled))


def test_quality_filter_bounds(spark, sf_dir):
    rows = quality_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 30 <= r.n_tokens <= 1000
        assert 3.0 <= r.mean_tok_len <= 5.0
        assert r.distinct_ratio >= 0.3


def test_vector_quantize_range_and_endpoints(spark, sf_dir):
    q = vector_quantize(spark, sf_dir)
    stats = q.agg(
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
        F.countDistinct("dim").alias("dims"),
    ).collect()[0]
    assert -128 <= stats.lo and stats.hi <= 127
    assert stats.dims == 64
    # per dim, the global min maps to -128 and the global max to 127
    ends = (
        q.groupBy("dim")
        .agg(F.min("code").alias("lo"), F.max("code").alias("hi"))
        .collect()
    )
    for r in ends:
        assert r.lo == -128 and r.hi == 127


def test_kmeans_deterministic_and_partitioned(spark, sf_dir):
    a = kmeans_lloyd(spark, sf_dir).collect()
    b = kmeans_lloyd(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    clusters = {r.cluster for r in a}
    assert clusters <= set(range(_KMEANS_K))
    n_vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert len(a) == n_vecs


def test_sequence_pack_invariants(spark, sf_dir):
    from spotify_podcasts_airflow_batch_spark.plans.llm_pipeline import (
        _PACK_BUDGET,
        _PACK_SHARDS,
        sequence_pack,
    )

    rows = sequence_pack(spark, sf_dir).collect()
    assert rows
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < _PACK_SHARDS
        assert 0 <= r.offset < _PACK_BUDGET
        by_shard.setdefault((r.lang, r.shard), []).append(r)
    for group in by_shard.values():
        group.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in group:
            # bin/offset are exactly the start-offset layout
            assert r.bin == cum // _PACK_BUDGET
            assert r.offset == cum % _PACK_BUDGET
            cum += r.n_tokens


def test_tfidf_pairs_symmetric_bounds(spark, sf_dir):
    rows = tfidf_cosine_pairs(spark, sf_dir).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.8 <= r.cos_sim <= 1.0001


def test_token_budget_mix_properties(spark, sf_dir):
    """C71 invariants beyond the oracle hash: every source's kept
    tokens fit its budget with a TIGHT prefix (the next doc in draw
    order would overflow), the draw is deterministic across runs, and
    the sqrt temperature up-weights the smallest source (its kept
    FRACTION of own mass is >= the largest source's)."""
    import pyspark.sql.functions as F

    from spotify_podcasts_airflow_batch_spark.plans.llm_pipeline2 import (
        token_budget_mix,
    )
    from spotify_podcasts_airflow_batch_spark.sources.readers import table

    got = token_budget_mix(spark, sf_dir)
    rows = got.collect()
    if not rows:
        return
    per_src = {}
    for r in rows:
        cur = per_src.setdefault(
            r.source, {"kept": 0, "budget": r.budget, "max_cum": 0}
        )
        cur["kept"] += r.n_tokens
        cur["max_cum"] = max(cur["max_cum"], r.cum_tokens)
    for src, st in per_src.items():
        assert st["max_cum"] <= st["budget"], src
        assert st["kept"] == st["max_cum"], src  # contiguous prefix
    # deterministic: a second invocation returns the identical set
    again = {tuple(r) for r in token_budget_mix(spark, sf_dir).collect()}
    assert again == {tuple(r) for r in rows}
    # temperature: smallest source keeps a fraction of its own mass
    # at least as large as the biggest source's
    mass = {
        r.source: r.t
        for r in table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(
                F.size(F.split(F.trim(F.col("text")), r"\s+"))
            ).alias("t")
        )
        .collect()
    }
    if len(mass) >= 2:
        small = min(mass, key=mass.get)
        big = max(mass, key=mass.get)
        if small != big and small in per_src and big in per_src:
            f_small = per_src[small]["kept"] / mass[small]
            f_big = per_src[big]["kept"] / mass[big]
            assert f_small >= f_big
