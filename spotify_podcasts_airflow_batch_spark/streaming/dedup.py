"""Streaming incremental near-duplicate detection — the streaming
twin of C24/C24b (daily-ingest dedup) built on the C6 MinHash-LSH
machinery (VERDICT r7 item 7).

Shape: a historical SIGNATURE INDEX — (doc_id, band_id, band_hash)
band rows, 3 small columns per doc·band, never text — lives as a
parquet table. Each micro-batch of incoming documents computes its
own band rows, probes the index with a banded semi-join (cost rides
bucket occupancy, exactly the batch C6 law), flags collisions, then
APPENDS its band rows to the index so later batches dedup against
earlier ones. At 100 TB the index is the only state and it is
fingerprint-sized; the probe join broadcasts the micro-batch side.

Determinism contract (what makes stream ≡ batch testable): a document
is near-dup iff it band-collides with the history OR with an
already-ingested document — "already" meaning a smaller doc_id, and
ingest files arriving in monotone doc_id ranges (the standard
daily-ingest layout). Under that contract the flags are identical for
ANY micro-batch partitioning of the same files, pinned by
tests/test_streaming_dedup.py.

Reference: the batch relatives are plans/llm_pipeline.py
incremental_dedup (C24, exact fp) and plans/text.py minhash_lsh (C6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.operators.dedup import (
    LSH_BANDS,
    NUM_MINHASHES,
    _banded,
    minhash_signatures,
)


def banded_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_hash) band rows for a document slice —
    the index schema AND the probe schema (docs with < shingle_k
    tokens produce no rows, matching the batch C6 convention)."""
    sig = minhash_signatures(docs, "doc_id", "text")
    return _banded(sig, "doc_id", NUM_MINHASHES, LSH_BANDS).select(
        "doc_id", "band_id", "band_hash"
    )


def build_signature_index(
    spark: SparkSession, docs: DataFrame, index_path: str
) -> str:
    """One-off: materialize the history's band rows as the index.

    Partitioned by ``epoch`` (history = epoch -1) so micro-batch
    appends land in their own ``epoch=N`` partition and a replayed
    batch can dynamically OVERWRITE its partition instead of
    double-appending (at-least-once safety, ADVICE r8)."""
    (
        banded_signatures(docs)
        .withColumn("epoch", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(index_path)
    )
    return index_path


def near_dup_flags(
    new_docs: DataFrame, hist_banded: DataFrame
) -> DataFrame:
    """(doc_id, is_near_dup) for a new-document slice: collision with
    the history index OR with a SMALLER-doc_id document of the same
    slice (the intra-batch half of the ingest-order contract). Both
    probes are banded equi-joins — pair work rides bucket occupancy,
    and the distinct band-key relation of the history is all the big
    side ever shuffles."""
    nb = banded_signatures(new_docs)
    hist_hit = (
        nb.join(
            hist_banded.select("band_id", "band_hash").distinct(),
            ["band_id", "band_hash"],
            "semi",
        )
        .select("doc_id")
        .distinct()
    )
    # intra-batch half WITHOUT a pair join: "collides with a smaller
    # doc_id in this bucket" ⇔ "doc_id > min(doc_id) of the bucket",
    # so one min-window per band key is enough. A boilerplate-heavy
    # micro-batch (50 identical docs in one bucket) stays LINEAR in
    # band rows — the pathology C61's max_bucket cap solves in batch
    # mode simply cannot occur here (VERDICT r8 item 7).
    bucket = Window.partitionBy("band_id", "band_hash")
    self_hit = (
        nb.withColumn("__min_id", F.min("doc_id").over(bucket))
        .where(F.col("doc_id") > F.col("__min_id"))
        .select("doc_id")
        .distinct()
    )
    hits = hist_hit.unionByName(self_hit).distinct().withColumn(
        "__hit", F.lit(1)
    )
    return new_docs.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("__hit").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_near_dup"),
    )


def stream_incremental_near_dup(
    spark: SparkSession,
    docs_stream_dir: str,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """foreachBatch driver: probe each micro-batch against the index,
    write (doc_id, is_near_dup) into ``out_path``'s ``epoch=N``
    partition, then write the batch's own band rows into the index's
    ``epoch=N`` partition. Both writes dynamically overwrite their own
    epoch partition — replays are idempotent. Returns the started
    query (Trigger.AvailableNow — drains what is present, the
    daily-ingest shape; leave it running with a processing-time
    trigger for a live feed)."""
    # file streams need an explicit schema: sniff it from a one-file
    # batch read (the sources/readers.py file-stream convention)
    schema = spark.read.parquet(docs_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_stream_dir)
    )

    def probe(batch_df: DataFrame, epoch_id: int) -> None:
        # Idempotent per epoch (ADVICE r8): foreachBatch is
        # at-least-once, and a crash between the index append and the
        # checkpoint commit replays the batch against an index that
        # already holds its OWN band rows. Two defenses: (1) drop the
        # batch's own doc_ids from the history before probing, so a
        # replay cannot self-collide; (2) both writes dynamically
        # OVERWRITE their epoch=N partition (epoch_id is stable across
        # replays of the same batch), so neither flags nor band rows
        # ever duplicate.
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        hist = (
            sess.read.parquet(index_path)
            .join(F.broadcast(batch_df.select("doc_id")), "doc_id", "anti")
        )
        flags = near_dup_flags(batch_df, hist)
        (
            flags.withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_path)
        )
        (
            banded_signatures(batch_df)
            .withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(index_path)
        )

    return (
        stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
