"""Scale measurement for the end-to-end corpus pipeline (SURVEY §2-G,
pipeline/llm_corpus.py) — the one §G surface the headline bench does
not cover, since it is a multi-stage WRITE job, not a single query.

Runs CorpusPipeline twice and prints ONE JSON line:

* 1× — the documents table at $SPARK_GRAFT_SF_DIR (default sf0.1);
* 10× — the same table replicated ×10 via DuckDB id-offset unnest
  (the SURVEY §6 replicate recipe). Replicas k ≥ 1 get one extra
  token appended to the text: that defeats EXACT dedup (distinct
  md5) while keeping shingle Jaccard ≈ 0.98 ≫ the 0.8 near-dup
  threshold — so the expensive path (MinHash → LSH banding →
  candidate pairs → connected components → representative keep) is
  what absorbs the 10× growth, forming ~n_docs clusters of size 10
  that the pipeline must collapse back to ~1×.

The interesting number is wall_10x / wall_1x: the stage order (map
gates shed first, exact dedup before MinHash) plus band-bucket join
pruning should hold the ratio near-linear even though the candidate
generation space grew 100×.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_replicate(src_sf_dir: str, out_dir: str, copies: int = 10) -> None:
    import duckdb

    con = duckdb.connect()
    # Replica ids offset by a data-derived stride: a fixed 1e6 would
    # collide with base ids at larger scale factors, silently merging
    # documents and corrupting the scaling measurement. coalesce keeps
    # the empty-corpus case a valid (empty) replicate instead of a
    # TypeError on int(None).
    (stride,) = con.execute(
        "SELECT coalesce(max(doc_id) + 1, 1) "
        f"FROM '{src_sf_dir}/documents.parquet'"
    ).fetchone()
    con.execute(
        f"""
        COPY (
            SELECT d.doc_id + k.k * {int(stride)} AS doc_id,
                   d.source, d.lang,
                   CASE WHEN k.k = 0 THEN d.text
                        ELSE d.text || ' replica' || k.k END AS text,
                   d.* EXCLUDE (doc_id, source, lang, text)
            FROM '{src_sf_dir}/documents.parquet' d,
                 (SELECT unnest(range({copies})) AS k) k
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


def run_pipeline(spark, sf_dir: str, out_dir: str) -> tuple[float, dict]:
    from spotify_podcasts_airflow_batch_spark.pipeline.llm_corpus import (
        CorpusPipeline,
    )

    t0 = time.perf_counter()
    stats = CorpusPipeline(
        spark, sf_dir, out_dir, domain_quota=100_000
    ).run()
    return round(time.perf_counter() - t0, 3), stats


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from spotify_podcasts_airflow_batch_spark.session import get_spark

    spark = get_spark("bench-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_corpus_")
    try:
        rep_dir = os.path.join(work, "x10")
        os.makedirs(rep_dir)
        build_replicate(sf_dir, rep_dir, copies=10)

        # warm-up at 1× so both timed runs see compiled codegen paths
        run_pipeline(spark, sf_dir, os.path.join(work, "warm"))

        wall_1x, stats_1x = run_pipeline(
            spark, sf_dir, os.path.join(work, "out1")
        )
        wall_10x, stats_10x = run_pipeline(
            spark, rep_dir, os.path.join(work, "out10")
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "corpus_pipeline_wall",
                "unit": "sec",
                "sf_dir": sf_dir,
                "wall_1x": wall_1x,
                "wall_10x": wall_10x,
                "scale_ratio": round(wall_10x / wall_1x, 2),
                "stats_1x": stats_1x,
                "stats_10x": stats_10x,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
