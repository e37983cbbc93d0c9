"""Additional TPC-H-shaped query coverage (SURVEY.md §5: the fixture's
star schema supports hand-written analogues of the published TPC-H
shapes without the official kit). Each exercises a distinct plan
shape: HAVING + join-back, distribution-of-counts, conditional
aggregation over join pairs, top-k revenue report, and multi-
granularity time rollup (the 'hypertable continuous aggregate' shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4, dsum, fmt_ts, ts_ntz
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


@register(
    "q13_order_distribution",
    tags=("B19", "B1"),
    oracle="""
        SELECT n_orders, count(*) AS n_customers
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        )
        GROUP BY n_orders
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count — a
    left join feeding a second aggregation (two shuffles, the second
    over a tiny domain)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "q18_large_orders",
    tags=("B19", "B1", "B11"),
    oracle="""
        SELECT o.o_orderkey, o.o_custkey,
               CAST(sum(CAST(l.l_quantity AS DECIMAL(10,4))) AS DOUBLE) AS total_qty
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_custkey
        HAVING sum(CAST(l.l_quantity AS DECIMAL(10,4))) > 140
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate + HAVING on the aggregate. The filter
    applies post-aggregation (cannot push down), but partial agg still
    collapses the join output before the exchange."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(dec4("l_quantity")).alias("tq"))
        .filter(F.col("tq") > 140)
        .select("o_orderkey", "o_custkey", F.col("tq").cast("double").alias("total_qty"))
    )


@register(
    "q10_returned_items",
    tags=("B19", "B11"),
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    window — join + agg + TakeOrderedAndProject."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_ntz("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_ntz("1997-07-01 00:00:00"))
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    one = F.lit(1).cast("decimal(10,4)")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(dec4("l_extendedprice") * (one - dec4("l_discount"))), 4)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q7_nation_trade",
    tags=("B19", "B33"),
    oracle="""
        SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
               year(l.l_shipdate) AS l_year,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
          AND n1.n_nationkey <> n2.n_nationkey
        GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade flows — the same dimension
    table joined twice under different roles (customer nation vs
    supplier nation), grouped by a derived year."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 3)
    n1 = n.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")
    )
    one = F.lit(1).cast("decimal(10,4)")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("nk1") == F.col("c_nationkey"))
        .join(F.broadcast(n2), F.col("nk2") == F.col("s_nationkey"))
        .filter(F.col("nk1") != F.col("nk2"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.round(F.sum(dec4("l_extendedprice") * (one - dec4("l_discount"))), 4)
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "hypertable_rollup",
    tags=("C6", "B36"),
    oracle="""
        SELECT granularity,
               strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               event_type,
               count(*)                                          AS n_events,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM (
            SELECT unnest(['hour', 'day']) AS granularity,
                   unnest([date_trunc('hour', ts), date_trunc('day', ts)]) AS bucket,
                   event_type, value
            FROM events
        )
        GROUP BY granularity, bucket, event_type
    """,
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (the timescale-style 'continuous
    aggregate' / hypertable rollup shape): hour and day buckets per
    event type computed in ONE pass via explode over the granularity
    axis — one scan, one shuffle, instead of one job per granularity.
    At scale this materializes as a partitioned sink keyed by
    (granularity, bucket)."""
    ev = tbl(spark, sf_dir, "events")
    buckets = F.array(
        F.struct(F.lit("hour").alias("granularity"), F.date_trunc("hour", "ts").alias("bucket")),
        F.struct(F.lit("day").alias("granularity"), F.date_trunc("day", "ts").alias("bucket")),
    )
    return (
        ev.select(F.explode(buckets).alias("g"), "event_type", "value")
        .groupBy(
            F.col("g.granularity").alias("granularity"),
            F.col("g.bucket").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            "granularity",
            fmt_ts("bucket").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
