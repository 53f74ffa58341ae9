"""SQL front-end surface (SURVEY.md §2 G): the same engine through
``spark.sql``.

Everything in the catalog is a DataFrame plan, but a user of the
reference who lives in SQL should not need the Python API:
``register_views`` publishes the star schema as temp views and
``run_sql`` executes any ANSI query against them through Catalyst —
same optimizer, same physical plans as the DataFrame forms (asserted
equal in tests/test_sql_catalog.py). Spark-SQL texts for a few
headline shapes live here as executable documentation; arbitrary user
SQL works the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spotify_podcasts_airflow_batch_spark.sources.readers import table

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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Publish every base table as a session temp view. Views are
    lazy — registering costs nothing; each query's scan still gets
    filter pushdown and column pruning from Catalyst."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


# Spark-SQL texts (ANSI; NOT the DuckDB oracle dialect) for headline
# shapes — executable documentation that the SQL surface expresses the
# same queries users run through the DataFrame catalog.
SQL_QUERIES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                       AS sum_qty,
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   / CAST(100 AS DOUBLE)                                       AS sum_base_price,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                        AS BIGINT)) / CAST(100 AS DOUBLE)                      AS sum_disc_price,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              * 100 + 0.5) AS BIGINT))
                   / CAST(100 AS DOUBLE)                                       AS sum_charge,
               round(avg(l_quantity), 4)                                       AS avg_qty,
               round(avg(l_extendedprice), 4)                                  AS avg_price,
               round(avg(l_discount), 4)                                       AS avg_disc,
               count(*)                                                        AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 25
    """,
    "exact_dedup": """
        SELECT md5(lower(trim(text))) AS fingerprint,
               min(doc_id) AS rep_id,
               count(*)    AS n_dupes
        FROM documents
        GROUP BY 1
    """,
    "rebalance_sample": """
        SELECT doc_id, lang, bucket
        FROM (
            SELECT doc_id, lang,
                   (CAST(conv(substring(md5(concat('rebal:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)
                        & 2147483647) % 1000 AS bucket
            FROM documents
        )
        WHERE bucket < CASE WHEN lang = 'en' THEN 200 ELSE 600 END
    """,
    "latest_per_key": """
        SELECT o_custkey, o_orderkey AS latest_orderkey,
               o_orderdate AS latest_orderdate,
               round(o_totalprice, 2) AS latest_totalprice
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC
            ) AS rn FROM orders
        ) WHERE rn = 1
    """,
}
