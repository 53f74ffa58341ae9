"""Extended relational coverage (SURVEY.md §2 B13-B19): more TPC-H
derivations, percentiles, ranking variants, and the salted-join
equivalence proof."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.operators.skew import salted_join
from spotify_podcasts_airflow_batch_spark.plans.registry import register
from spotify_podcasts_airflow_batch_spark.sources.readers import table


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: semi join feeding an aggregate."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL '30' DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure scan-aggregate — every predicate must reach
    the parquet reader (asserted in test_plan_shape)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
             100.00 * sum(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregate over a broadcast dim join."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-03-01 00:00:00").cast("timestamp"))
    )
    p = F.broadcast(table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q18_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(total_qty, 2)    AS total_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: aggregate-then-join (the aggregate shrinks the fact
    before it ever shuffles into the join — never join-then-aggregate)."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty_raw"))
        .where(F.col("total_qty_raw") > 150)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            F.round(F.col("total_qty_raw"), 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "quantiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(quantile_cont(l_quantity, 0.5), 4)      AS p50_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext — exact interpolated percentiles per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``). At 100 TB swap in
    approx_percentile (t-digest, mergeable) — same plan shape."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
    )


@register(
    "rank_variants",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(c_acctbal, 2) AS c_acctbal,
           rank()       OVER w AS bal_rank,
           dense_rank() OVER w AS bal_dense_rank,
           ntile(4)     OVER w AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext — rank/dense_rank/ntile in one window pass (one shuffle on
    the segment key serves all three)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@register(
    "salted_join",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_lineitems,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
               AS total_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def salted_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext — skew-salted shuffle join ≡ plain join (the oracle IS the
    unsalted join — proving the salting transform is semantics-free).
    operators/skew.py spreads any hot orderkey over 8 reducers."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join(
        li,
        o,
        left_key="l_orderkey",
        right_key="o_orderkey",
        salt_source=F.col("l_linenumber"),
        salt_buckets=8,
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        # exact integer cents (see q1): whole-fact sums per status.
        (
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
            / 100.0
        ).alias("total_price"),
    )


@register(
    "global_row_number",
    oracle="""
    SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS global_id
    FROM documents
    """,
)
def global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B43 — contiguous global sequence numbers in key order WITHOUT a
    single-task global sort. ``row_number() OVER (ORDER BY key)`` puts
    the whole table in one window partition — the classic scale trap.
    Instead: range-repartition on the key (disjoint ordered ranges),
    rank locally within each partition, and add per-partition row-count
    offsets (a tiny aggregate, broadcast back). The result is invariant
    to where the range boundaries land, so sampling jitter in the range
    partitioner cannot change a single assigned id. This is the sample
    id assignment step of a training-data pipeline — at 100 TB it runs
    with per-task state equal to one partition's sort, never one task
    holding the table."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    parts = docs.repartitionByRange(16, F.col("doc_id")).withColumn(
        "pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "rn", F.row_number().over(Window.partitionBy("pid").orderBy("doc_id"))
    )
    counts = parts.groupBy("pid").agg(F.count(F.lit(1)).alias("c"))
    offsets = counts.withColumn(
        "off",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("pid", "off")
    return local.join(F.broadcast(offsets), "pid").select(
        "doc_id", (F.col("off") + F.col("rn")).cast("long").alias("global_id")
    )
