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


_DECODE_META_SQL = """
    SELECT doc_id,
           'application/octet-stream' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
           CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INT) AS height,
           CAST(1 + octet_length(encode(text)) % 8 AS INT) AS n_frames
    FROM documents
"""


@register("media_decode", oracle=_DECODE_META_SQL)
def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — the Arrow-batched ``mapInPandas`` decode pass, verified
    END-TO-END against SQL: the stub decoder's metadata is a pure
    function of the payload bytes, so the oracle recomputes it
    arithmetically and the hash-match proves the Python exchange
    (schema, Arrow round-trip, batch iteration) is lossless — the part
    that stays when the fake kernel is swapped for a real codec. The
    thumb (binary) column is dropped from the comparison surface;
    everything else is bit-checked."""
    from spotify_podcasts_airflow_batch_spark.operators.multimodal import (
        decode_media,
    )

    d = attach_media(table(spark, sf_dir, "documents"))
    return decode_media(d).drop("thumb")


@register(
    "media_frames",
    oracle=f"""
    WITH m AS ({_DECODE_META_SQL})
    SELECT doc_id,
           CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx,
           width, height
    FROM m
    """,
)
def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — frame sampling (every 2nd frame) downstream of the decode
    pass: the expansion is a JVM-side posexplode of a generated
    sequence — Python ran exactly once per payload at decode, never
    per frame. At 100 TB of video this ordering (decode once, expand
    JVM-side, push frame-level work back into vectorized kernels) is
    the difference between one Python exchange and n_frames of them."""
    from spotify_podcasts_airflow_batch_spark.operators.multimodal import (
        decode_media,
        frame_sample,
    )

    d = attach_media(table(spark, sf_dir, "documents"))
    return frame_sample(decode_media(d), every=2)


@register(
    "media_resize_plan",
    oracle=f"""
    WITH m AS ({_DECODE_META_SQL})
    SELECT doc_id, width, height,
           greatest(1, CAST(round(width
               * least(1.0, 32 / CAST(greatest(width, height) AS DOUBLE)),
               0) AS INT)) AS target_width,
           greatest(1, CAST(round(height
               * least(1.0, 32 / CAST(greatest(width, height) AS DOUBLE)),
               0) AS INT)) AS target_height
    FROM m
    """,
)
def media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — resize geometry planning downstream of decode: aspect-
    preserving target dims capped at 32 on the long side, never
    upscaled. Pure JVM arithmetic over the decode output (plan-
    asserted in tests/test_multimodal.py) — the pixel transform is the
    only part that would touch Python, and it would ride the SAME
    Arrow batch as the decode. round(x, 0) half-boundaries are always
    dyadic-exact (k + 0.5), so the rounding is engine-portable."""
    from spotify_podcasts_airflow_batch_spark.operators.multimodal import (
        decode_media,
        resize_plan,
    )

    d = attach_media(table(spark, sf_dir, "documents"))
    return resize_plan(decode_media(d), max_dim=32)


@register(
    "media_features",
    oracle="""
    WITH t AS (
        SELECT doc_id, hex(encode(text)) AS h,
               least(16, octet_length(encode(text))) AS tl
        FROM documents
    ),
    b AS (
        SELECT doc_id,
               ('0x' || substr(h, CAST(2 * i + 1 AS INT), 2))::INT // 16
                   AS bin
        FROM t, unnest(range(tl)) AS u(i)
    ),
    c AS (SELECT doc_id, bin, count(*) AS n FROM b GROUP BY 1, 2),
    g AS (
        SELECT t.doc_id, CAST(gb.g AS INT) AS bin_idx
        FROM t, range(16) AS gb(g)
    )
    SELECT g.doc_id, g.bin_idx,
           CAST(coalesce(c.n, 0) AS INT) AS n_bytes_in_bin
    FROM g LEFT JOIN c ON c.doc_id = g.doc_id AND c.bin = g.bin_idx
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — feature extraction through the vectorized Pandas-UDF batch
    interface, verified END-TO-END: the stub kernel's byte histogram
    (16 bins over the 16-byte thumb) is recomputed by the oracle from
    a hex expansion of the same bytes, so the hash-match proves the
    Arrow batch shape (pd.Series of bytes in → fixed-width vector
    out — exactly what an ONNX/torch batch-infer consumes) is
    lossless. Integer counts fully determine the L1-normalized float
    vector (`extract_features`), keeping the compared surface scalar
    and exact. One Python exchange per ~10k-row Arrow batch; the
    explode to long form is JVM-side."""
    from spotify_podcasts_airflow_batch_spark.operators.multimodal import (
        decode_media,
        thumb_histogram_counts,
    )

    d = attach_media(table(spark, sf_dir, "documents"))
    counts = thumb_histogram_counts(decode_media(d))
    return counts.select(
        "doc_id",
        F.posexplode("counts").alias("bin_idx", "n_bytes_in_bin"),
    )


@register(
    "media_dedup",
    oracle="""
    WITH h AS (
        SELECT doc_id, md5(text) AS payload_md5 FROM documents
    ),
    g AS (
        SELECT payload_md5, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM h GROUP BY payload_md5
    )
    SELECT h.doc_id, h.payload_md5, g.keep_id,
           CAST(g.n_copies AS BIGINT) AS n_copies,
           h.doc_id = g.keep_id AS is_kept
    FROM h JOIN g USING (payload_md5)
    """,
)
def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — exact media dedup by CONTENT DIGEST: the image/audio twin
    of C4's text dedup — identical payload bytes keep one canonical
    copy (lowest doc_id), every row reports its digest group's keeper
    and size. Digesting is JVM-side md5 over the binary column (the
    payload never crosses into Python); the group rollup shuffles
    16-byte digests, not payloads — at 100 TB of media the shuffle
    carries ~1/10^6 of the corpus bytes, which is the only shape
    content-dedup can afford at that scale."""
    h = attach_media(table(spark, sf_dir, "documents")).select(
        "doc_id", F.md5("payload").alias("payload_md5")
    )
    g = h.groupBy("payload_md5").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return h.join(g, "payload_md5").select(
        "doc_id",
        "payload_md5",
        "keep_id",
        F.col("n_copies").cast("long").alias("n_copies"),
        (F.col("doc_id") == F.col("keep_id")).alias("is_kept"),
    )


_MEDIA_CHUNK = 4096  # bytes per transfer/processing chunk


@register(
    "media_chunk_plan",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_bytes,
               CAST(unnest(range(0,
                   (n_bytes + {_MEDIA_CHUNK - 1}) // {_MEDIA_CHUNK}))
                   AS INT) AS chunk_idx
        FROM n
    )
    SELECT doc_id, chunk_idx,
           CAST(chunk_idx * {_MEDIA_CHUNK} AS BIGINT) AS byte_offset,
           CAST(least({_MEDIA_CHUNK},
                      n_bytes - chunk_idx * {_MEDIA_CHUNK}) AS BIGINT)
               AS n_chunk_bytes
    FROM c
    """,
)
def media_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — byte-range chunk planning for large payloads: every
    payload splits into fixed 4 KiB ranges (offset + length per
    chunk), the plan a loader uses to stream media through
    bounded-memory decode/transfer without materializing whole files.
    The expansion is a JVM-side explode of a generated sequence over
    the LENGTH only — payload bytes are never touched, so the plan
    costs the same whether chunks are 4 KiB of 100 TB of video or of
    synthesized test bytes (the F3 frame-sampling discipline applied
    to the byte axis). Zero-byte payloads produce no chunks on both
    engines."""
    d = attach_media(table(spark, sf_dir, "documents")).select(
        "doc_id", F.length("payload").alias("n_bytes")
    )
    n_chunks = F.ceil(F.col("n_bytes") / F.lit(_MEDIA_CHUNK)).cast("int")
    return (
        d.where(F.col("n_bytes") > 0)
        .select(
            "doc_id",
            "n_bytes",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx").cast("long") * _MEDIA_CHUNK).alias(
                "byte_offset"
            ),
            F.least(
                F.lit(_MEDIA_CHUNK).cast("long"),
                F.col("n_bytes") - F.col("chunk_idx") * _MEDIA_CHUNK,
            ).alias("n_chunk_bytes"),
        )
    )
