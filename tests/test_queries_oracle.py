"""Local replica of the driver's t2 gate: run every registered query
on Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive values (floats to 6 sig figs).
"""

from __future__ import annotations

import math

import pytest

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries

QUERIES = all_queries()


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return float(f"{v:.6g}")
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    try:  # Decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return _canon_value(float(v))
    except Exception:
        pass
    if hasattr(v, "isoformat"):
        if getattr(v, "tzinfo", None) is not None:
            import datetime

            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()[:26]
    return v


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.spark_fn(spark, sf_dir)
    srows = sdf.collect()
    scols = [c.lower() for c in sdf.columns]

    if q.oracle is None:
        assert len(srows) >= 0  # rows-only check: it runs
        return

    ores = duck.execute(q.oracle)
    ocols = [d[0].lower() for d in ores.description]
    orows = ores.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    s_canon = _canon_rows(scols, [tuple(r) for r in srows])
    o_canon = _canon_rows(ocols, orows)
    mismatches = [
        (a, b) for a, b in zip(s_canon, o_canon) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"
