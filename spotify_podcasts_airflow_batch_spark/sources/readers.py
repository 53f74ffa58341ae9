"""Source connectors.

The reference lists S3 keys with ``S3Hook.list_keys`` and downloads +
``pd.read_parquet``s them one by one on the driver
(spotify_eps_union_dag.py:17-38). Spark-first, the whole pattern is one
declarative multi-file scan: file listing is distributed, column
pruning and predicate pushdown reach each footer, and nothing flows
through the driver.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated table (``{sf_dir}/{name}.parquet``).

    The events table carries parquet TIMESTAMP(NANOS), which Spark
    cannot read natively; ``nanosAsLong`` (a runtime SQL conf) reads it
    as int64 nanoseconds and we convert with exact integer division to
    microseconds — the same truncation DuckDB applies, so both engines
    see identical values.

    Timestamps without a timezone (isAdjustedToUTC=false) must read as
    plain TIMESTAMP, not TIMESTAMP_NTZ: with ``inferTimestampNTZ``
    disabled the stored micros are used directly as epoch micros — the
    exact value DuckDB's naive timestamp sees — and every downstream
    ``unix_micros``/``window`` call works on any session. Session
    timezone is pinned UTC so date extraction from those micros matches
    the oracle even under a caller-provided SparkSession.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_parquet_many(
    spark: SparkSession, paths: list[str], merge_schema: bool = True
) -> DataFrame:
    """Scan many parquet files/dirs as one DataFrame.

    Replaces the reference's driver-side download-and-concat loop; with
    ``mergeSchema`` the union tolerates schema drift across daily
    snapshots (old snapshots missing later-added columns read as null).
    """
    reader = spark.read.option("mergeSchema", str(merge_schema).lower())
    return reader.parquet(*paths)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def list_data_files(root: str, suffix: str = ".parquet") -> list[str]:
    """Local analogue of ``S3Hook.list_keys(prefix=...)`` — enumerate
    data files under a prefix. On a cluster this is the object-store
    listing; Spark's own parallel listing is preferred (pass the
    directory straight to ``read_parquet_many``)."""
    return sorted(
        p
        for p in glob.glob(os.path.join(root, "**", f"*{suffix}"), recursive=True)
        if os.path.isfile(p)
    )


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC scan (native, vectorized, predicate-pushdown like parquet).
    The engine treats parquet and ORC as interchangeable columnar
    sources — same pruning/pushdown behavior through the DataSource V2
    path."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
