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
from pyspark.sql import Window as W

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


@register(
    "q17_small_qty_revenue",
    tags=("B19", "B2", "B33"),
    oracle="""
        WITH th AS (
            SELECT l_partkey,
                   sum(CAST(CAST(l_quantity AS DECIMAL(10,4)) * 10000 AS BIGINT)) AS sum_qi,
                   count(*) AS cnt
            FROM lineitem
            GROUP BY l_partkey
        )
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))) AS DOUBLE) / 7.0
                   AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN th    ON th.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND CAST(CAST(l.l_quantity AS DECIMAL(10,4)) * 10000 AS BIGINT)
                  * 5 * th.cnt < th.sum_qi
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand,
    where 'small' is a correlated per-part threshold (qty < 0.2 * the
    part's average quantity). Spark-first: the brand dim broadcasts to
    prune lineitem FIRST (1/25 of parts survive), then the correlated
    scalar subquery becomes a window aggregate over l_partkey on the
    pruned rows — one shuffle, no join-back, and nothing driver- or
    broadcast-materialized that grows with the part domain.
    Cross-engine exactness: the 0.2*avg comparison is multiplied out
    into pure BIGINT arithmetic (quantity has exactly 4 decimals), so
    the filter decision is bit-identical in both engines instead of
    racing IEEE division at the boundary."""
    li = tbl(spark, sf_dir, "lineitem")
    qi = (dec4("l_quantity") * F.lit(10000)).cast("long")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    w = W.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .withColumn("qi", qi)
        .withColumn("sum_qi", F.sum("qi").over(w))
        .withColumn("cnt", F.count("*").over(w))
        .filter(F.col("qi") * F.lit(5) * F.col("cnt") < F.col("sum_qi"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q21_last_shipper",
    tags=("B19", "B20", "B11"),
    oracle="""
        WITH om AS (
            SELECT l_orderkey, max(l_shipdate) AS max_ship,
                   count(DISTINCT l_suppkey) AS nsupp
            FROM lineitem
            GROUP BY l_orderkey
        ),
        last AS (
            SELECT DISTINCT l.l_orderkey, l.l_suppkey
            FROM lineitem l JOIN om ON om.l_orderkey = l.l_orderkey
            WHERE l.l_shipdate = om.max_ship AND om.nsupp >= 2
        ),
        sole AS (
            SELECT l_orderkey FROM last GROUP BY l_orderkey HAVING count(*) = 1
        )
        SELECT s.s_name, count(*) AS numwait
        FROM last
        JOIN sole USING (l_orderkey)
        JOIN supplier s ON s.s_suppkey = last.l_suppkey
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
)
def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS): suppliers who were the
    SOLE last shipper on multi-supplier orders. The two correlated
    existence tests become relational building blocks: the EXISTS side
    is a window aggregate over l_orderkey (max shipdate + distinct-
    supplier count on the SAME single shuffle — no join-back), and the
    NOT EXISTS (no OTHER supplier also shipped at the max) is a second
    window (count of distinct last-shippers per order) that rides the
    SAME l_orderkey partitioning — so lineitem is scanned once and
    shuffled once for both existence tests. The supplier dim
    broadcasts. Top-10 is total-ordered (numwait desc, s_name) for a
    deterministic hash."""
    li = tbl(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey")
    last = (
        li.withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("nsupp", F.size(F.collect_set("l_suppkey").over(w)))
        .filter((F.col("l_shipdate") == F.col("max_ship")) & (F.col("nsupp") >= 2))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = last.withColumn("nlast", F.count("*").over(w)).filter(F.col("nlast") == 1)
    s = tbl(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "q4_priority_semi",
    tags=("B20", "B1"),
    oracle="""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o.o_orderpriority
    """,
)
def q4_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority that had at least one
    late-shipping lineitem (shipped >30 days after the order date),
    over one quarter. The EXISTS is a LEFT SEMI join with an extra
    non-equi predicate — Spark keeps the equi key (orderkey) as the
    join key and applies the date comparison as a join-time filter, so
    it stays a hash semi-join, not a theta product. The quarter filter
    prunes orders BEFORE the join (predicate pushdown to the scan)."""
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_ntz("1996-04-01 00:00:00"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))
