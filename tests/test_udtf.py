"""G — Python UDTF (Spark 4): lateral multi-row expansion from the
Python worker, DataFrame and SQL forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.functions.udtfs import (
    SplitSentences,
    register_udtfs,
)


def test_udtf_dataframe_api_splits_sentences(spark):
    df = spark.createDataFrame(
        [(1, "One. Two two! Three?"), (2, "No terminator here")],
        "doc_id long, text string",
    )
    out = df.lateralJoin(
        SplitSentences(F.col("text").outer()).alias("s")
    ).select("doc_id", "s.sentence_idx", "s.sentence", "s.n_tokens")
    rows = sorted(map(tuple, out.collect()))
    assert rows == [
        (1, 0, "One.", 1),
        (1, 1, "Two two!", 2),
        (1, 2, "Three?", 1),
        (2, 0, "No terminator here", 3),
    ]


def test_udtf_sql_lateral_matches_corpus_token_total(spark, sf_dir):
    """Over real documents: sentence token counts re-aggregate to the
    whitespace token total (no tokens lost at sentence boundaries)."""
    from spotify_podcasts_airflow_batch_spark.sources.readers import table

    register_udtfs(spark)
    docs = table(spark, sf_dir, "documents").limit(200)
    docs.createOrReplaceTempView("udtf_docs")
    per_sentence = spark.sql(
        "SELECT d.doc_id, s.n_tokens"
        " FROM udtf_docs d, LATERAL split_sentences(d.text) s"
    )
    got = (
        per_sentence.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("n"))
        .collect()
    )
    want = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n"),
        ).collect()
    }
    assert len(got) > 0
    for r in got:
        assert r.n == want[r.doc_id]
