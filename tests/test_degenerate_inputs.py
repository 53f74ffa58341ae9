"""Degenerate-input robustness: constant-valued metrics.

The empty-input sweep (test_empty_inputs) covers 0-row tables; this
covers the OTHER routine degeneracy at 100 TB — a metric column that
is constant over the scanned slice (a stuck sensor, a single-price
SKU, a filtered stratum with one value). Zero variance turns every
variance-normalized statistic's denominator to 0, and Spark's ANSI
mode raises DIVIDE_BY_ZERO where DuckDB yields NULL — this sweep
caught exactly that in four shipped tests (ab_welch_ttest, anova_f,
levene_bf, rank_assoc_binned), fixed with try_divide (≡ DuckDB's
NULL-on-zero semantics).

Two layers: (1) the FULL registry must execute without raising on a
constant-value events table; (2) the variance-sensitive statistics
must be driver-strict EQUAL to their DuckDB oracles on it — NULLs
included — so both engines agree on what "undefined" looks like.
"""

from __future__ import annotations

import glob
import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries
from tests.conftest import SF_DIR
from tests.test_queries_oracle import _spark_pdf, canon_pdf

QUERIES = all_queries()

# every oracle-bearing statistic whose denominator is a variance /
# deviation mass / pair count that a constant metric zeroes out
STATS_KEYS = (
    "ab_welch_ttest",
    "anova_f",
    "levene_bf",
    "rank_assoc_binned",
    "cuped_adjust",
    "permutation_test",
    "mcnemar_paired",
    "power_mde",
    "spearman_corr",
    "ols_trend",
    "value_histogram",
)


@pytest.fixture(scope="module")
def const_sf_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_const"))
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        shutil.copy(f, os.path.join(out, os.path.basename(f)))
    n = 200
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [1_600_000_000_000_000 + i * 1_000_000 for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
            "event_type": pa.array(
                ["view", "purchase", "click", "error", "signup"][i % 5]
                for i in range(n)
            ),
            "value": pa.array([2.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))
    return out


def test_every_query_survives_constant_values(spark, const_sf_dir):
    failures = []
    for name, q in QUERIES.items():
        try:
            q.spark_fn(spark, const_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # pragma: no cover - failure reporting
            failures.append(f"{name}: {str(ex).splitlines()[0][:160]}")
    assert not failures, "\n".join(failures)


def test_stats_agree_with_oracle_on_constant_values(spark, const_sf_dir):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(const_sf_dir, "*.parquet")):
        t = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")
    for name in STATS_KEYS:
        q = QUERIES[name]
        sdf = _spark_pdf(q.spark_fn(spark, const_sf_dir))
        odf = con.execute(q.oracle).df()
        assert canon_pdf(sdf, name) == canon_pdf(odf, name), name


@pytest.fixture(scope="module")
def zerovec_sf_dir(tmp_path_factory):
    """Corpus where every 10th embedding (including probe vec_id 0) is
    the zero vector — a failed/absent embedding, routine at scale."""
    out = str(tmp_path_factory.mktemp("sf_zerovec"))
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        shutil.copy(f, os.path.join(out, os.path.basename(f)))
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    emb = t["embedding"].to_pylist()
    labels = t["label"].to_pylist()
    for i in range(0, len(emb), 10):
        emb[i] = [0.0] * len(emb[i])
    # ...and one WHOLE label's batch zeroed (a failed-encoder ingest),
    # so (label, side) centroid aggregates are zero vectors too — the
    # centroid_drift case the review caught
    for i, lab in enumerate(labels):
        if lab == 0:
            emb[i] = [0.0] * len(emb[i])
    pq.write_table(
        pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": pa.array(emb, pa.list_(pa.float32())),
                "label": t["label"],
            }
        ),
        os.path.join(out, "embeddings.parquet"),
    )
    return out


def test_vector_queries_survive_zero_vectors(spark, zerovec_sf_dir):
    """A zero vector has no direction: cosine against it is NULL
    (functions/vectors.py try_divide) on the JVM paths and the -1.0
    DuckDB-list_cosine sentinel on the GEMM paths, never an ANSI
    crash — this sweep caught 5 live DIVIDE_BY_ZEROs on first run
    (ivf_ann, ann_lsh, ann_recall, ivf_nprobe_recall,
    ann_hamming_rerank)."""
    failures = []
    for name, q in QUERIES.items():
        mod = q.spark_fn.__module__
        if "similarity" not in mod and "analytics" not in mod:
            continue
        try:
            q.spark_fn(spark, zerovec_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # pragma: no cover - failure reporting
            failures.append(f"{name}: {str(ex).splitlines()[0][:160]}")
    assert not failures, "\n".join(failures)


# GEMM-kernel-backed keys: their numpy cosine must agree with the
# DuckDB list_cosine_similarity oracle VALUE-for-value on a corpus
# with zero vectors — not merely not-crash. Before the ZERO_NORM_COS
# guard (operators/similarity.py), X/||X|| produced NaN and Spark
# ranks NaN FIRST under desc, so a dead embedding ranked as every
# query's top neighbor while DuckDB ranked it last (ADVICE r7).
GEMM_ORACLE_KEYS = (
    "knn_brute",
    "ann_filtered",
    "mmr_diversify",
    "hybrid_rrf_fusion",
    "embed_near_dup",
    # served-ANN representatives (ADVICE r7): L2/ADC paths never
    # divide by a norm, so zero vectors are ordinary points — pinned
    # strict here so a future cosine-flavored rewrite can't silently
    # break the degenerate corpus
    "pq_adc_ann_served",
    "sq8_ann_served",
    "ivfpq_ann_served",
    # OPQ (VERDICT r8 item 6): energy ranking and the distortion gate
    # run on quantized integers (zero vectors → zero energy, ordinary
    # points), but the ROTATED Lloyd chain had never run on the
    # zero-vector fixture — pinned strict here
    "opq_ann",
    "opq_recall",
)


def test_gemm_keys_agree_with_oracle_on_zero_vectors(
    spark, zerovec_sf_dir
):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(zerovec_sf_dir, "*.parquet")):
        t = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")
    for name in GEMM_ORACLE_KEYS:
        q = QUERIES[name]
        sdf = _spark_pdf(q.spark_fn(spark, zerovec_sf_dir))
        odf = con.execute(q.oracle).df()
        assert canon_pdf(sdf, name) == canon_pdf(odf, name), name


BLANK_TEXT_KEYS = (
    "text_stats",
    "lang_id",
    "truncation_loss",
    "fold_balance_audit",
    "output_file_plan",
)


@pytest.fixture(scope="module")
def blanktext_sf_dir(tmp_path_factory):
    """Corpus where every document's text is blank (a scrape that
    returned headers only / an over-aggressive cleaning pass)."""
    out = str(tmp_path_factory.mktemp("sf_blanktext"))
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        shutil.copy(f, os.path.join(out, os.path.basename(f)))
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    n = t.num_rows
    pq.write_table(
        pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array([""] * n),
                "lang": t["lang"],
                "source": t["source"],
                "n_chars": pa.array([0] * n, pa.int64()),
            }
        ),
        os.path.join(out, "documents.parquet"),
    )
    return out


def test_text_queries_survive_blank_documents(spark, blanktext_sf_dir):
    """First run caught 5 live DIVIDE_BY_ZEROs (text_stats, lang_id,
    truncation_loss, fold_balance_audit, output_file_plan) plus a
    token-convention mismatch: the C1/C2 oracles counted a blank doc
    as ONE token (len(split('')) = 1) while tokens() counts 0."""
    failures = []
    for name, q in QUERIES.items():
        mod = q.spark_fn.__module__.split(".")[-1]
        if mod not in (
            "text", "text2", "text3", "llm_pipeline", "llm_pipeline2",
            "multimodal",
        ):
            continue
        try:
            q.spark_fn(spark, blanktext_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # pragma: no cover - failure reporting
            failures.append(f"{name}: {str(ex).splitlines()[0][:160]}")
    assert not failures, "\n".join(failures)


def test_text_stats_agree_with_oracle_on_blank_documents(
    spark, blanktext_sf_dir
):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(blanktext_sf_dir, "*.parquet")):
        t = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")
    for name in BLANK_TEXT_KEYS:
        q = QUERIES[name]
        sdf = _spark_pdf(q.spark_fn(spark, blanktext_sf_dir))
        odf = con.execute(q.oracle).df()
        assert canon_pdf(sdf, name) == canon_pdf(odf, name), name


def _events_variant(tmp_path_factory, name: str, **overrides):
    out = str(tmp_path_factory.mktemp(name))
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        shutil.copy(f, os.path.join(out, os.path.basename(f)))
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    cols = {c: t[c] for c in t.column_names}
    cols.update(overrides(t) if callable(overrides) else overrides)
    pq.write_table(pa.table(cols), os.path.join(out, "events.parquet"))
    return out


@pytest.fixture(scope="module")
def onetype_sf_dir(tmp_path_factory):
    """Every event the same type — a filtered slice (one funnel step)."""
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    return _events_variant(
        tmp_path_factory,
        "sf_onetype",
        event_type=pa.array(["view"] * t.num_rows),
    )


@pytest.fixture(scope="module")
def oneinstant_sf_dir(tmp_path_factory):
    """Every event at the same instant — a bulk backfill batch."""
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    return _events_variant(
        tmp_path_factory,
        "sf_oneinstant",
        ts=pa.array(
            [1_600_000_000_000_000] * t.num_rows, pa.timestamp("us")
        ),
    )


_EVENT_MODULES = (
    "events", "events2", "timeseries", "experiments", "analytics",
    "analytics2", "recsys",
)


def _sweep_event_queries(spark, sf_dir):
    failures = []
    for name, q in QUERIES.items():
        if q.spark_fn.__module__.split(".")[-1] not in _EVENT_MODULES:
            continue
        try:
            q.spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # pragma: no cover - failure reporting
            failures.append(f"{name}: {str(ex).splitlines()[0][:160]}")
    assert not failures, "\n".join(failures)


def test_event_queries_survive_single_type(spark, onetype_sf_dir):
    """First run caught permutation_test's observed-diff `div` on an
    empty arm (DuckDB `// 0` is NULL; ANSI div raises)."""
    _sweep_event_queries(spark, onetype_sf_dir)


def test_event_queries_survive_single_instant(spark, oneinstant_sf_dir):
    """First run caught interarrival_stats' CV division by an all-zero
    mean gap."""
    _sweep_event_queries(spark, oneinstant_sf_dir)
