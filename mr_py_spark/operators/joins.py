"""Join patterns (SURVEY.md §2B: B19-B26; [MRDP ch.5]).

The reference implements joins as reduce-side (tag + shuffle + merge
per key), replicated/map-side (small table loaded into every mapper),
and composite (pre-sorted inputs) — each a hand-built job. Here they
are one `join` call; Catalyst + AQE pick broadcast / shuffled-hash /
sort-merge per side sizes, which is the 100 TB-relevant part: the
dimension tables (region/nation/customer at TPC-H ratios) broadcast,
so the fact-table scan never shuffles for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import davg, dec4, dsum, fmt_ts, ts_ntz
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl
from mr_py_spark.util import shuffle_width


@register(
    "join_agg",
    tags=("B19",),
    oracle="""
        SELECT c.c_mktsegment,
               count(*)                     AS n_orders,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(10,4))) AS DOUBLE) AS segment_value
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
)
def join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregation ([MRDP ch.5] reduce-side join).
    customer is small relative to orders at every TPC-H sf, so the
    planner broadcasts it — the 'replicated join' pattern chosen
    automatically."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("segment_value"),
        )
    )


@register(
    "q3_shipping_priority",
    tags=("B19", "B21", "B11", "B1"),
    oracle="""
        SELECT l.l_orderkey,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE) AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S')          AS order_date,
               o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q3-shaped 3-way join + agg + top-10.

    Plan shape to want at scale: customer filter pushed to scan →
    broadcast to orders; orders⋈lineitem shuffles on the orderkey only
    after both filters pruned the fact tables; top-10 via
    TakeOrderedAndProject (no global sort). Tie-break (revenue, key) is
    total so the limit boundary is deterministic vs the oracle.
    """
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderdate") < ts_ntz("1998-01-01 00:00:00"))
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > ts_ntz("1998-01-01 00:00:00"))
    one = F.lit(1).cast("decimal(10,4)")
    revenue = F.round(F.sum(dec4("l_extendedprice") * (one - dec4("l_discount"))), 4).cast("double")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            fmt_ts("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
    )


@register(
    "q5_local_supplier",
    tags=("B19", "B21", "B27"),
    oracle="""
        SELECT n.n_name,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way star join ([MRDP ch.6] job chaining — the
    reference would need 5 sequential MR jobs with materialized
    intermediates; here it is one lazy plan).

    Join order is chosen for scale: the most selective predicate
    (region='ASIA', ~1/5 of nations) is applied FIRST by deriving the
    tiny asia nation frame and broadcasting it into supplier and
    customer, so lineitem is pruned to ASIA-supplied rows map-side (a
    broadcast hash join, no shuffle) before its only shuffle. The old
    formulation joined all-region customer⋈orders⋈lineitem and only
    discarded ~80% of the shuffled rows at the final nation/region
    joins — measured 1.9x slower at sf10 (7.4 s vs 4.0 s, SCALE.md).
    The customer⋈orders side and the final orderkey join are left
    declarative: AQE's runtime re-plan converts both to broadcast when
    post-filter sizes permit (observed in the executed plan at sf10)
    and falls back to shuffle joins at 100 TB where they would not.
    """
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    s = (
        tbl(spark, sf_dir, "supplier")
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    c = (
        tbl(spark, sf_dir, "customer")
        .join(
            F.broadcast(asia.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey")
    )
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_ntz("1998-01-01 00:00:00"))
    ).select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # The hint matters: without it the static planner cannot bound the
    # supplier⋈asia join-output estimate, plans lineitem⋈supplier as
    # SMJ, and AQE only converts after lineitem's shuffle map write
    # (measured 15% slower at sf10, interleaved A/B). The hint asserts
    # the region-pruned supplier dim is catalog-like (fits an executor);
    # on a deployment where suppliers scale with the corpus, drop it
    # and the declarative fallback above still computes correctly.
    li_asia = li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    co = c.join(o, F.col("c_custkey") == F.col("o_custkey"))
    return (
        li_asia.join(
            co,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    dec4("l_extendedprice")
                    * (F.lit(1).cast("decimal(10,4)") - dec4("l_discount"))
                ),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "join_left_outer",
    tags=("B19",),
    oracle="""
        SELECT c.c_custkey,
               count(o.o_orderkey)                      AS n_orders,
               coalesce(CAST(sum(CAST(o.o_totalprice AS DECIMAL(10,4))) AS DOUBLE), 0) AS customer_value
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join ([MRDP ch.5] reduce-side join, outer variant):
    customers with zero orders survive with count 0."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("customer_value"),
        )
    )


@register(
    "full_outer_join",
    tags=("B19",),
    oracle="""
        WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
             sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
        SELECT coalesce(cn.nk, sn.nk)     AS nationkey,
               coalesce(cn.n_cust, 0)     AS n_cust,
               coalesce(sn.n_supp, 0)     AS n_supp
        FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nations seen from either side survive."""
    c = tbl(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_cust")
    )
    s = tbl(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count("*").alias("n_supp")
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "semi_join",
    tags=("B20",),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        )
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ([MRDP ch.5]): existence filter, never duplicates
    the left side — only join keys cross the wire for the right side."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join",
    tags=("B20",),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ([MRDP ch.5]): customers with no orders."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "broadcast_dim_join",
    tags=("B21",),
    oracle="""
        SELECT r.r_name,
               count(*)                      AS n_suppliers,
               CAST(sum(CAST(s.s_acctbal AS DECIMAL(10,4))) AS DOUBLE) / count(*) AS avg_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicated/map-side join ([MRDP ch.5]): explicit `broadcast()`
    hints — the MR pattern's 'load the small table in every mapper',
    minus the per-mapper rebuild. No shuffle of the fact side at all."""
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            davg("s_acctbal").alias("avg_acctbal"),
        )
    )


@register(
    "merge_join_copartitioned",
    tags=("B22",),
    oracle="""
        SELECT o.o_orderstatus, count(*) AS n_lines, CAST(sum(CAST(l.l_quantity AS DECIMAL(10,4))) AS DOUBLE) AS total_qty
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
    """,
)
def merge_join_copartitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite/merge join on co-partitioned, pre-sorted inputs
    ([MRDP ch.5]). Both sides are explicitly hash-partitioned and
    sorted on the key, so the sort-merge join needs no extra sort; the
    durable form of this is bucketed tables
    (`write.bucketBy(n, key).sortBy(key)`, tests/test_sinks.py), which
    removes the shuffle for every future join on the key — the 100 TB
    answer for repeatedly-joined fact tables.
    """
    n_parts = shuffle_width(spark)
    o = (
        tbl(spark, sf_dir, "orders")
        .repartition(n_parts, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    li = (
        tbl(spark, sf_dir, "lineitem")
        .repartition(n_parts, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
    )
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            dsum("l_quantity").alias("total_qty"),
        )
    )


@register(
    "cross_join",
    tags=("B23",),
    oracle="""
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
    """,
)
def cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product ([MRDP ch.5]): only sane between small inputs;
    planned as BroadcastNestedLoopJoin. At scale, cross joins must be
    LSH/block-bounded (see operators/similarity.py)."""
    r = tbl(spark, sf_dir, "region")
    n = tbl(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "theta_join",
    tags=("B24",),
    oracle="""
        SELECT s.s_nationkey AS nationkey,
               count(*)      AS n_pairs
        FROM supplier s
        JOIN customer c
          ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
        GROUP BY s.s_nationkey
    """,
)
def theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join ([MRDP ch.5]): equi-key plus an inequality conjunct.
    The MR expression is cartesian-within-key + filter; Spark plans the
    equi part as the join key and evaluates the inequality as a join
    residual — no cartesian blow-up beyond each key group."""
    s = tbl(spark, sf_dir, "supplier")
    c = tbl(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "range_join",
    tags=("B24",),
    oracle="""
        SELECT o.o_orderstatus, count(*) AS n_shipped_in_window
        FROM orders o
        JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate <  o.o_orderdate + INTERVAL 90 DAY
        GROUP BY o.o_orderstatus
    """,
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/band join ([MRDP ch.5]): ship events within 90 days of the
    order date. Keyed on the equi conjunct; the band predicate is a
    residual filter, so cost stays O(matching key pairs)."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_shipped_in_window"))
    )


@register(
    "set_union",
    tags=("B25",),
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union with dedup (B25)."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "set_intersect",
    tags=("B26",),
    oracle="""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (B26): nations having both customers and suppliers."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    tags=("B26",),
    oracle="""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (B26): nations with customers but no suppliers.
    `subtract` is EXCEPT DISTINCT semantics (exceptAll would keep keys
    that merely occur more often on the left)."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)
