"""Relational core queries (SURVEY.md §2 B1-B12).

Engine-completeness catalog over the TPC-H-ish tables. Every query is
declarative DataFrame code — Catalyst gets full freedom to push
filters into the parquet scans, prune columns, and pick broadcast
joins for the dimensions. Money aggregates are rounded to 2 decimals
(ratios to 4) in BOTH engines so the oracle value-hash is insensitive
to float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.operators.joins import asof_join
from spotify_podcasts_airflow_batch_spark.operators.sessionize import sessionize
from spotify_podcasts_airflow_batch_spark.plans.registry import register
from spotify_podcasts_airflow_batch_spark.sources.readers import table


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
               AS sum_base_price,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                    AS BIGINT)) / 100.0                                     AS sum_disc_price,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          * 100 + 0.5) AS BIGINT)) / 100.0                  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: wide scan + single hash aggregate. The filter is pushed
    to the parquet scan; partial aggregation happens map-side, so the
    shuffle carries ≤ |groups|×|tasks| rows regardless of input size.

    Money sums are exact integer cents (per-row floor(x·100+0.5)):
    these groups aggregate the WHOLE fact, so a round(sum(double))
    would sit one summation-order ulp from a 2-dp boundary at scale.
    sum_qty stays a plain sum (quantities are integer-valued doubles —
    exact under any order); the averages are ratio-of-exact-sums whose
    ulp is ~1e-12 of the 4-dp boundary."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def cents(col):
        return F.sum(F.floor(col * 100 + 0.5).cast("long")) / 100.0

    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            cents(F.col("l_extendedprice")).alias("sum_base_price"),
            cents(disc_price).alias("sum_disc_price"),
            cents(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → join → agg → top-10. The
    customer side shrinks ~5× before the join; AQE converts it to a
    broadcast at runtime when small. Tiebreak on l_orderkey makes the
    LIMIT deterministic across engines."""
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle="""
    SELECT n_name,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                    AS BIGINT)) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join. The dim chain supplier⋈nation⋈region is
    collapsed FIRST (still KBs even at 100 TB fact scale) into an
    ASIA-only supplier list, then broadcast into the lineitem scan —
    the selective region predicate thins the fact ~4/5 BEFORE the
    orderkey shuffle instead of after it. The only shuffles are the
    customer⋈orders⋈lineitem fact joins, each on pre-filtered rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_sup = (
        table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(F.broadcast(asia_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
                "o_orderkey", "c_nationkey"
            ),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        # exact integer cents (see q1): 5 nation groups each summing
        # ~a fifth of the slice — the large-sum boundary-ulp profile.
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                        + 0.5
                    ).cast("long")
                )
                / 100.0
            ).alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0
               AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy region→nation→grand-total in one pass (Spark
    expands grouping sets without rescanning the input)."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        # exact integer cents (see q1): the grand-total row sums the
        # whole table — the large-sum boundary-ulp profile.
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long"))
                / 100.0
            ).alias("total_acctbal"),
        )
    )


@register(
    "semi_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that never ordered — left_anti join (no row
    duplication, right side reduced to its join key before shuffling)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "exists_subquery",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    """,
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with a lineitem shipped >90 days after order date —
    decorrelated into a left_semi join with a non-equi condition on top
    of the orderkey equi-join (so it still hash-partitions, the range
    predicate is evaluated post-match)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL '90' DAY")
    )
    return o.join(li, cond, "left_semi").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
    )


@register(
    "window_running",
    oracle="""
    SELECT event_id, user_id, ts, event_type,
           round(sum(value) OVER w_cum, 4)  AS running_total,
           round(avg(value) OVER w_mov, 4)  AS moving_avg_4,
           row_number() OVER w_ord          AS event_seq
    FROM events
    WINDOW
      w_ord AS (PARTITION BY user_id ORDER BY ts, event_id),
      w_cum AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_mov AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals + 4-row moving average per user. One shuffle on
    user_id serves all three window frames (same partitioning/order)."""
    ev = table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = w.rowsBetween(-3, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.round(F.sum("value").over(w_cum), 4).alias("running_total"),
        F.round(F.avg("value").over(w_mov), 4).alias("moving_avg_4"),
        F.row_number().over(w).alias("event_seq"),
    )


@register(
    "sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(1 + sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           count(*)            AS n_events,
           min(ts)             AS session_start,
           max(ts)             AS session_end,
           CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS session_value_micros
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) + per-session rollup. See
    operators/sessionize.py for the scalable two-window formulation.

    ``session_value_micros`` is summed in exact integer micro-units
    (per-row ``round(value·1e6)`` before the sum) so the result is
    independent of summation order and identical across engines —
    ``round(sum(double), 4)`` is not, because float addition is not
    associative and engines disagree at half boundaries."""
    ev = table(spark, sf_dir, "events")
    sess = sessionize(ev, gap_minutes=30)
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        # floor(x·1e6 + 0.5), not round(): engine round() disagrees on
        # half-boundary doubles (Java rounds the shortest decimal repr,
        # DuckDB the exact binary value); floor of the same IEEE ops is
        # identical everywhere.
        F.sum(
            F.floor(F.col("value") * 1000000 + 0.5).cast("long")
        ).alias("session_value_micros"),
    )


@register(
    "count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*)               AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (Spark expands to a
    two-phase partial-distinct aggregate — no driver involvement)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("approx_distinct", oracle=None)  # rows-only: HLL is approximate
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct counting — the 100 TB path where exact
    distinct would shuffle every key. rsd=1%; mergeable across
    partitions so the shuffle carries sketches, not keys."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "approx_distinct_audit",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11b — the exact companion to the B11 HLL rollup: per group,
    the EXACT distinct count the sketch must approximate, fully
    hash-compared against the oracle. The 3·rsd accuracy bound itself
    is asserted in tests/test_sketches.py (B11 estimate joined against
    this exact relation) rather than pinned as a TRUE constant in the
    oracle — a datagen re-roll landing in the sketch's probability
    tail must surface as an accuracy-test failure, never as a phantom
    correctness mismatch. At 100 TB the audit runs on a sampled slice
    next to the sketch-only production rollup."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "asof_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           o.o_orderkey  AS last_orderkey,
           round(o.o_totalprice, 2) AS last_totalprice
    FROM events e
    ASOF LEFT JOIN (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders
        QUALIFY rn = 1
    ) o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    """,
)
def asof_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most recent order as-of each event (per user). Spark lacks a
    native as-of join; operators/joins.py implements the linear
    union+window plan (DuckDB's native ASOF JOIN is the oracle)."""
    ev = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    joined = asof_join(
        ev,
        o,
        key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak=F.col("o_orderkey"),
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.col("o_orderkey").alias("last_orderkey"),
        F.round(F.col("o_totalprice"), 2).alias("last_totalprice"),
    )
