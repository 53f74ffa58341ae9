"""Deterministic 60-bit hash family shared with the DuckDB oracle.

``h(x) = int(md5(x)[:15 hex], 16)`` — 60 bits, fits a signed int64 on
both engines (Spark: ``conv(substring(md5(x),1,15),16,10)``; DuckDB:
``('0x' || substr(md5(x),1,15))::BIGINT``). Seeded variants prefix the
seed, giving the independent hash family MinHash needs. Everything is
JVM-side built-ins — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def md5_hash60(col: Column) -> Column:
    """60-bit integer hash of a string column (md5-derived)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash60_seeded(col: Column, seed: Column | int) -> Column:
    """Seeded member of the hash family: ``h_s(x) = h(s || ':' || x)``."""
    s = F.lit(seed) if isinstance(seed, int) else seed
    return md5_hash60(F.concat(s.cast("string"), F.lit(":"), col))


def oracle_hash60(expr: str) -> str:
    """DuckDB SQL fragment computing the same 60-bit hash."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def oracle_hash60_seeded(expr: str, seed_expr: str) -> str:
    return oracle_hash60(f"CAST({seed_expr} AS VARCHAR) || ':' || {expr}")
