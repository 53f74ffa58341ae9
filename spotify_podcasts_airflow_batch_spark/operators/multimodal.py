"""Multimodal column plumbing (SURVEY.md §2 F1-F2).

Media payloads are opaque ``binary`` columns with typed metadata
alongside. The Spark-side contract is real and tested: schema,
Arrow-batched ``mapInPandas`` signatures, and partition-size hygiene.
The actual codecs (PIL/ffmpeg/librosa) are absent from this
environment, so the decode kernel is a clearly marked deterministic
stub (`_fake_decode`) behind the same interface a real decoder would
implement — swap the kernel, keep the plumbing.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload column + metadata (the
    testdata has no real media; payload = utf-8 bytes of the text,
    which exercises the full binary-column path)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder — deterministic fake. A real implementation would
    be e.g. PIL.Image.open(io.BytesIO(payload)); the container has no
    media libraries, so dimensions are derived from the byte content
    (stable across runs/engines)."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 16 + (n % 64),
        "height": 16 + ((n // 64) % 64),
        "n_frames": 1 + (n % 8),
        "thumb": payload[:16],
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode via mapInPandas: one Python roundtrip per
    ~10k-row batch (spark.sql.execution.arrow.maxRecordsPerBatch), not
    per row. Output is a fresh frame with the DECODED_SCHEMA contract."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(meta)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def frame_sample(decoded: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling plumbing: expand n_frames → one row per sampled
    frame index (posexplode of a JVM-generated sequence — the Python
    stub only ran once, at decode)."""
    return decoded.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
        "width",
        "height",
    )


def resize_plan(decoded: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize geometry — pure JVM arithmetic, NO Python: target dims
    preserve aspect ratio, capped at ``max_dim`` on the longer side,
    never upscaled. Only the pixel transform itself would be a Pandas
    UDF kernel (absent codec → the byte payload is untouched here);
    computing geometry in the JVM keeps the Python exchange to the one
    decode pass."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim)
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.greatest(
            F.lit(1), F.round(F.col("width") * scale).cast("int")
        ).alias("target_width"),
        F.greatest(
            F.lit(1), F.round(F.col("height") * scale).cast("int")
        ).alias("target_height"),
    )


FEATURE_DIM = 16


def extract_features(decoded: DataFrame) -> DataFrame:
    """Feature extraction via a vectorized (Arrow-batched) Pandas UDF:
    payload bytes → fixed-width float vector. STUB kernel — a byte-
    value histogram of the thumb, L1-normalized; a real implementation
    would run a vision/audio encoder over the same batch interface.
    The batch shape (pd.Series of bytes → pd.Series of list[float])
    is exactly what an ONNX/torch batch-infer call consumes."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def thumb_histogram(thumbs: pd.Series) -> pd.Series:
        out = []
        for t in thumbs:
            arr = np.frombuffer(bytes(t), dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
            total = hist.sum()
            out.append((hist / total if total else hist).astype("float32"))
        return pd.Series(out)

    return decoded.select(
        "doc_id", thumb_histogram(F.col("thumb")).alias("features")
    )


def thumb_histogram_counts(decoded: DataFrame) -> DataFrame:
    """Integer byte-value histogram (16 bins of width 16) of the thumb
    via a vectorized Pandas UDF — the INTEGER form of
    ``extract_features``'s kernel, exactly recomputable in SQL (hex
    expansion of the same bytes), so the whole Python exchange is
    hash-checkable end-to-end. The normalized float vector is
    ``counts / counts.sum()`` — integers fully determine it."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def hist_counts(thumbs: pd.Series) -> pd.Series:
        out = []
        for t in thumbs:
            arr = np.frombuffer(bytes(t), dtype=np.uint8)
            counts = np.bincount(arr // 16, minlength=FEATURE_DIM)
            out.append(counts.astype("int32"))
        return pd.Series(out)

    return decoded.select(
        "doc_id", hist_counts(F.col("thumb")).alias("counts")
    )
