"""Local replica of the driver's t2 gate: run every registered query
on Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive stringified cell values.

DRIVER-STRICT canonicalization (round-1 lesson): the driver collects
both sides into pandas, sorts columns by name, stringifies every cell
verbatim, and hash-compares. That means:

* int64 ``3882`` vs float64 ``3882.0`` is a MISMATCH (DuckDB HUGEINT
  sums decay to float64 in pandas — oracles must CAST(... AS BIGINT));
* doubles must be bit-identical, not 6-sig-fig close — plans use
  integer micro-units / per-row rounding so both engines run the same
  IEEE ops;
* list/array/map cells are NOT canonicalizable (pandas sort dies on
  ``unhashable type: 'list'``) — every query, including rows-only
  ones, must emit scalar columns only.

This file intentionally reproduces that strictness so the class of
failure can never reach the driver again.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries

QUERIES = all_queries()

pytestmark = pytest.mark.fast  # driver-entry tier (pytest.ini)

_UNHASHABLE = (list, tuple, dict, set, np.ndarray)


def _cell_str(v) -> str:
    """Stringify one cell the way a pandas-astype(str) canonicalizer
    sees it — type-distinguishing (int vs float), value-verbatim."""
    if v is None:
        return "None"
    if isinstance(v, float) and v != v:  # NaN
        return "nan"
    if v is pd.NaT:
        return "NaT"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return str(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return str(pd.Timestamp(v))
    if isinstance(v, datetime.date):
        return str(v)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return str(v)


def canon_pdf(pdf: pd.DataFrame, name: str) -> list[tuple[str, ...]]:
    """Sorted, stringified rows with columns in name order. Raises on
    unhashable (array/map/struct) cells — those crash the driver."""
    pdf = pdf.reindex(sorted(pdf.columns, key=lambda c: c.lower()), axis=1)
    rows = []
    for raw in pdf.itertuples(index=False, name=None):
        cells = []
        for v in raw:
            assert not isinstance(v, _UNHASHABLE), (
                f"{name}: non-scalar cell {type(v).__name__} — "
                "array/map outputs are not driver-canonicalizable; "
                "explode to long form"
            )
            cells.append(_cell_str(v))
        rows.append(tuple(cells))
    rows.sort()
    return rows


def _spark_pdf(sdf) -> pd.DataFrame:
    # toPandas (not collect): the driver compares pandas frames, and
    # pandas' null coercions (NULL double → NaN, nullable int → float)
    # must hit BOTH sides identically or we'd flag phantom diffs.
    return sdf.toPandas()


@pytest.fixture(autouse=True)
def _clear_cache_between_queries(spark):
    # A few plans persist() an intermediate; clear between queries so
    # cached relations can't accumulate across the 200+ query sweep.
    yield
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.spark_fn(spark, sf_dir)
    spdf = _spark_pdf(sdf)
    spdf.columns = [c.lower() for c in spdf.columns]

    if q.oracle is None:
        # rows-only: it runs AND its output is canonicalizable.
        canon_pdf(spdf, name)
        return

    opdf = duck.execute(q.oracle).df()
    opdf.columns = [c.lower() for c in opdf.columns]

    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{name}: column mismatch {sorted(spdf.columns)} "
        f"!= {sorted(opdf.columns)}"
    )
    assert len(spdf) == len(opdf), (
        f"{name}: row count {len(spdf)} != {len(opdf)}"
    )
    s_canon = canon_pdf(spdf, name)
    o_canon = canon_pdf(opdf, name)
    mismatches = [(a, b) for a, b in zip(s_canon, o_canon) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; "
        f"first diffs {mismatches[:3]}"
    )
