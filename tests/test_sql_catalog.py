"""G — the SQL front-end surface: every Spark-SQL text in SQL_QUERIES
produces EXACTLY the rows of the same-named DataFrame catalog entry
(same Catalyst, two syntaxes), and arbitrary user SQL runs against the
registered views."""

from __future__ import annotations

from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries
from spotify_podcasts_airflow_batch_spark.sql_catalog import (
    SQL_QUERIES,
    register_views,
    run_sql,
)

QUERIES = all_queries()


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_sql_forms_match_dataframe_catalog(spark, sf_dir):
    for name, sql in SQL_QUERIES.items():
        got = _rows(run_sql(spark, sf_dir, sql))
        want = _rows(QUERIES[name].spark_fn(spark, sf_dir))
        assert got == want, name


def test_arbitrary_user_sql_runs(spark, sf_dir):
    register_views(spark, sf_dir)
    df = spark.sql(
        """
        SELECT n_name, count(*) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_suppliers DESC, n_name LIMIT 3
        """
    )
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0].n_suppliers >= rows[-1].n_suppliers


def test_sql_view_scan_still_prunes(spark, sf_dir):
    """Views are not a pushdown barrier: a filtered SQL query over the
    view must reach the parquet scan with PushedFilters."""
    register_views(spark, sf_dir)
    df = spark.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority" in plan
    scan_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" not in scan_schema
