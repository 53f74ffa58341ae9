"""Multimodal queries (SURVEY.md §2 F1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.operators.multimodal import attach_media
from spotify_podcasts_airflow_batch_spark.plans.registry import register
from spotify_podcasts_airflow_batch_spark.sources.readers import table


@register(
    "media_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS payload_md5,
           octet_length(encode(text)) // 1024 AS size_bucket_kb
    FROM documents
    """,
)
def media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — binary-column metadata over the synthesized payloads:
    byte length, content digest, size bucket. All JVM-side; the binary
    column never crosses into Python."""
    d = attach_media(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.floor(F.length("payload") / 1024).cast("long").alias("size_bucket_kb"),
    )
