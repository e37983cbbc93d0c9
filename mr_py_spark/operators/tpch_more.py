"""Second batch of TPC-H-shaped coverage (SURVEY.md §5). The fixture
has no partsupp table, so the partsupp-dependent shapes (Q9/Q15/Q16)
are adapted to the lineitem-derived (part, supplier) pair set; the
plan shapes — scalar-subquery thresholds, disjunctive pushdown,
conditional aggregation ratios, distinct-count with an exclusion
anti-join — are the point, not the official spec text.

Float policy per mr_py_spark/functions/__init__.py: money math in
DECIMAL(10,4), one cast to double at the end; ratios divide two
identically-derived doubles (same IEEE op both engines); date parts
cast to long to match DuckDB's BIGINT year().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4, dsum, ts_ntz
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl
from mr_py_spark.util import scale_form_threshold, table_rows

def _one():
    """DECIMAL(10,4) literal 1 (built lazily: F.lit needs an active session)."""
    return F.lit(1).cast("decimal(10,4)")


@register(
    "q14_promo_revenue",
    tags=("B19", "B33"),
    oracle="""
        SELECT CAST(100 AS DOUBLE) * (
                 CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
                               THEN CAST(l.l_extendedprice AS DECIMAL(10,4))
                                    * (1 - CAST(l.l_discount AS DECIMAL(10,4)))
                               ELSE 0 END), 4) AS DOUBLE)
                 / CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))
                            * (1 - CAST(l.l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE)
               ) AS promo_pct
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional aggregation ratio
    in one pass. part is a broadcast dim (grows ~sub-linearly with the
    fact table); the date filter pushes to the lineitem scan."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_ntz("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < ts_ntz("1997-10-01 00:00:00"))
    )
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec4("l_extendedprice") * (_one() - dec4("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(10,4)")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            # round(sum, 4) BEFORE the double cast (the q3/q5 house
            # pattern): a scale-8 decimal sum past ~9e7 needs > 53
            # bits scaled, and DuckDB's int128/10^8 conversion then
            # DOUBLE-ROUNDS where Spark's BigDecimal is correctly
            # rounded — measured 1-ULP divergence at sf1 (SCALE.md
            # r9). Scale-4 stays single-rounded through ~9e11.
            F.round(F.sum(promo), 4).cast("double").alias("pr"),
            F.round(F.sum(rev), 4).cast("double").alias("tr"),
        )
        .select(
            (F.lit(100.0) * (F.col("pr") / F.col("tr"))).alias("promo_pct")
        )
    )


@register(
    "q19_disjunctive_revenue",
    tags=("B19", "B8", "B33"),
    oracle="""
        SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))
                     * (1 - CAST(l.l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 1 AND l.l_quantity <= 21)
           OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity >= 10 AND l.l_quantity <= 30)
           OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive (OR-of-conjunctions) predicate spanning
    both join sides. Catalyst splits the single-side conjuncts out of
    the OR for pushdown (brand/size terms reach the part scan;
    quantity terms the lineitem scan) while the cross-side residual
    evaluates post-join — worth asserting when tuning at scale."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & (q >= 1) & (q <= 21))
        | ((b == "Brand#7") & s.between(10, 30) & (q >= 10) & (q <= 30))
        | ((b == "Brand#21") & s.between(20, 50) & (q >= 20) & (q <= 40))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(dec4("l_extendedprice") * (_one() - dec4("l_discount"))), 4
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q15_top_supplier",
    tags=("B19", "B11", "B27"),
    oracle="""
        WITH revs AS (
            SELECT l_suppkey,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(10,4))
                        * (1 - CAST(l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM revs r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revs)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue.
    The scalar max comes from a 1-row broadcast join against the same
    aggregated frame — no single-partition global window, so the
    revenue aggregation keeps its full parallelism at scale. Exact
    double equality is safe: both sides of the comparison are the
    same decimal-sum-cast-double values."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_ntz("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts_ntz("1997-04-01 00:00:00"))
    )
    revs = li.groupBy("l_suppkey").agg(
        F.round(F.sum(dec4("l_extendedprice") * (_one() - dec4("l_discount"))), 4)
        .cast("double")
        .alias("total_revenue")
    )
    mx = revs.agg(F.max("total_revenue").alias("mx"))
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revs.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q22_idle_customers",
    tags=("B19", "B20", "B27"),
    oracle="""
        SELECT c.c_nationkey,
               count(*) AS n_cust,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(10,4))) AS DOUBLE) AS total_acctbal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(10,4))) AS DOUBLE) / count(*)
                FROM customer WHERE c_acctbal > 0
              )
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c.c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders
    — scalar-subquery threshold (1-row broadcast) + anti join +
    aggregate. The anti join shuffles on o_custkey once; at scale the
    orders side is pre-projected to the single join column."""
    c = tbl(spark, sf_dir, "customer")
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec4("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    o = tbl(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@register(
    "q16_supplier_counts",
    tags=("B19", "B20", "B37"),
    oracle="""
        SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type <> 'PROMO'
          AND p.p_size BETWEEN 1 AND 25
          AND l.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
              )
        GROUP BY p.p_brand, p.p_size
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp adapted to lineitem-derived pairs):
    distinct suppliers per (brand, size), excluding a supplier
    blacklist via anti join — the NOT IN becomes a broadcast anti
    join, never a shuffle of the fact table against the blacklist."""
    li = tbl(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = tbl(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").between(1, 25)
    )
    bad = (
        tbl(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
              F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q9_product_profit",
    tags=("B19", "B29", "B33"),
    oracle="""
        SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
               CAST(round(sum(
                   CAST(l.l_extendedprice AS DECIMAL(10,4))
                     * (1 - CAST(l.l_discount AS DECIMAL(10,4)))
                   - CAST(l.l_quantity AS DECIMAL(10,4))
                     * CAST(0.6 AS DECIMAL(10,4))
                     * CAST(p.p_retailprice AS DECIMAL(10,4))
               ), 4) AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%rod%'
        GROUP BY n.n_name, year(l.l_shipdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for parts
    matching a name pattern. No partsupp table, so unit cost is a
    deterministic 0.6 * p_retailprice — the star-join + derived-year
    rollup plan shape is identical. All money math exact DECIMAL
    until the final round-to-4 / cast."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("%rod%"))
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = F.lit(0.6).cast("decimal(10,4)")
    profit = dec4("l_extendedprice") * (_one() - dec4("l_discount")) - dec4(
        "l_quantity"
    ) * cost * dec4("p_retailprice")
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_retailprice")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 4).cast("double").alias("profit"))
    )


@register(
    "q8_market_share",
    tags=("B19", "B33"),
    oracle="""
        SELECT year(o.o_orderdate) AS o_year,
               CAST(round(sum(CASE WHEN n2.n_nationkey = 1
                             THEN CAST(l.l_extendedprice AS DECIMAL(10,4))
                                  * (1 - CAST(l.l_discount AS DECIMAL(10,4)))
                             ELSE 0 END), 4) AS DOUBLE)
                 / CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))
                            * (1 - CAST(l.l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE)
                 AS mkt_share
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE n1.n_regionkey = 0
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY year(o.o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of revenue sold into one region,
    per year — the nation dim joined twice under different roles, a
    conditional-aggregation ratio on top. The two sums are rounded to
    4 dp IN DECIMAL before their double casts (q14's double-rounding
    note); the ratio then divides bit-identical doubles."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_ntz("1998-01-01 00:00:00"))
    )
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = (
        tbl(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("nk1"))
    )
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = dec4("l_extendedprice") * (_one() - dec4("l_discount"))
    target = F.when(F.col("s_nationkey") == 1, rev).otherwise(
        F.lit(0).cast("decimal(10,4)")
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("nk1") == F.col("c_nationkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            # round-before-cast: see q14_promo_revenue's note.
            F.round(F.sum(target), 4).cast("double").alias("tr"),
            F.round(F.sum(rev), 4).cast("double").alias("ar"),
        )
        .select("o_year", (F.col("tr") / F.col("ar")).alias("mkt_share"))
    )


@register(
    "q12_priority_by_status",
    tags=("B19", "B33"),
    oracle="""
        SELECT l.l_linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode column — grouped by linestatus):
    pivot-style conditional counts of order priority per line status.
    Counts are exact longs; nothing float-sensitive."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_ntz("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts_ntz("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "retention_cohorts",
    tags=("B19", "B30", "B1"),
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   min(date_trunc('month', o_orderdate)) AS cohort
            FROM orders GROUP BY 1
        )
        SELECT strftime(f.cohort, '%Y-%m') AS cohort_month,
               CAST((year(o.o_orderdate) - year(f.cohort)) * 12
                    + (month(o.o_orderdate) - month(f.cohort))
                    AS BIGINT)                            AS months_since,
               count(DISTINCT o.o_custkey)                AS active_customers
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix (the classic growth-analytics OLAP
    shape): customers grouped by the month of their FIRST order,
    crossed with months-since-cohort, counting distinct active
    customers per cell. Two keyed aggregations and one equi-join —
    the firsts frame is one row per customer (a candidate for
    broadcast or, at 10^9 customers, a plain co-partitioned shuffle
    join on the same key the second groupBy needs, so AQE reuses the
    exchange). month arithmetic stays in INTEGER year/month parts
    (identical on both engines — no interval/float date math), and
    the output grid is bounded by (#months)^2 cells regardless of
    order volume."""
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cohort")
    )
    months_since = (
        (F.year("o_orderdate") - F.year("cohort")) * 12
        + (F.month("o_orderdate") - F.month("cohort"))
    ).cast("long")
    return (
        o.join(firsts, "o_custkey")
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            months_since.alias("months_since"),
            "o_custkey",
        )
        .groupBy("cohort_month", "months_since")
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


@register(
    "basket_pairs_topk",
    tags=("B19", "B11", "B1"),
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_orders
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, part_a, part_b
        LIMIT 20
    """,
)
def basket_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the frequent-itemset primer): the
    20 part pairs most often ordered together. Pair generation is the
    shared ``graph.basket_pairs`` basket self-equi-join (scale-safe:
    fan-out bounded by basket size, no cartesian — see its
    docstring); this query is that pair stream groupBy-counted.
    ``copurchase_edges`` is the same stream distinct'ed — one copy of
    the join predicate serves both. Top-20 with a total tie-break is
    a TakeOrdered merge, no global sort."""
    from mr_py_spark.operators.graph import basket_pairs

    return (
        basket_pairs(spark, sf_dir)
        .groupBy(
            F.col("src").alias("part_a"),
            F.col("dst").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@register(
    "rfm_segments",
    tags=("B34", "B1", "B30"),
    oracle="""
        WITH m AS (
            SELECT o_custkey,
                   max(o_orderdate)                            AS last_order,
                   count(*)                                    AS frequency,
                   sum(CAST(o_totalprice AS DECIMAL(12,4)))    AS monetary
            FROM orders GROUP BY 1
        ),
        scored AS (
            SELECT ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
                   ntile(4) OVER (ORDER BY frequency DESC, o_custkey)  AS f,
                   ntile(4) OVER (ORDER BY monetary DESC, o_custkey)   AS mm,
                   monetary
            FROM m
        )
        SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
               CAST(mm AS BIGINT) AS m,
               count(*) AS n_customers,
               CAST(sum(monetary) AS DOUBLE) AS total_monetary
        FROM scored
        GROUP BY 1, 2, 3
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (B34 capstone): recency / frequency /
    monetary quartiles per customer (ntile with a TOTAL tie-break, so
    bucket assignment is deterministic on both engines), rolled up to
    the 64-cell segment grid with customer counts and exact-DECIMAL
    monetary totals.

    Size-adaptive: each ntile here is an unpartitioned window — ONE
    task sorts all customers. Fine while the windowed frame (the
    per-customer AGGREGATE, bounded by |customers|) is small; above
    ``scale_form_threshold()`` the default name dispatches to
    ``rfm_segments_scaled`` (same oracle, bitwise-identical output),
    which replaces all three windows with the two-pass
    range-partitioned rank machinery."""
    o = tbl(spark, sf_dir, "orders")
    if table_rows(o, sf_dir, "orders") > scale_form_threshold():
        return rfm_segments_scaled(spark, sf_dir)
    m = _rfm_metrics(o)
    from pyspark.sql import Window as W

    def quartile(order_col):
        return F.ntile(4).over(
            W.orderBy(F.desc(order_col), F.asc("o_custkey"))
        )

    scored = m.select(
        quartile("last_order").cast("long").alias("r"),
        quartile("frequency").cast("long").alias("f"),
        quartile("monetary").cast("long").alias("m"),
        "monetary",
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_customers"),
        F.sum("monetary").cast("double").alias("total_monetary"),
    )


def _rfm_metrics(o: DataFrame) -> DataFrame:
    """Per-customer (last_order, frequency, monetary) — the shared
    first pass of both rfm_segments forms."""
    return o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(12,4)")).alias("monetary"),
    )


@register(
    "rfm_segments_scaled",
    tags=("B34", "B16", "B1"),
    oracle="""
        WITH m AS (
            SELECT o_custkey,
                   max(o_orderdate)                            AS last_order,
                   count(*)                                    AS frequency,
                   sum(CAST(o_totalprice AS DECIMAL(12,4)))    AS monetary
            FROM orders GROUP BY 1
        ),
        scored AS (
            SELECT ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
                   ntile(4) OVER (ORDER BY frequency DESC, o_custkey)  AS f,
                   ntile(4) OVER (ORDER BY monetary DESC, o_custkey)   AS mm,
                   monetary
            FROM m
        )
        SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
               CAST(mm AS BIGINT) AS m,
               count(*) AS n_customers,
               CAST(sum(monetary) AS DOUBLE) AS total_monetary
        FROM scored
        GROUP BY 1, 2, 3
    """,
)
def rfm_segments_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rfm_segments``' exact result (same oracle, bitwise) with NO
    WindowExec: each of the three unpartitioned ntile(4)s becomes a
    ``global_ntile`` two-pass range-partition rank (splittable
    contiguous slices + a metadata-sized offset histogram — see its
    docstring), joined back on o_custkey. The per-customer aggregate
    is persisted once and feeds all three rank passes plus the final
    rollup; the three joins co-partition on the customer key. At 10^9
    customers every stage is splittable — no single-task sort
    anywhere. Quartile assignment uses SQL's ceil-first-tiles ntile
    rule from the two-pass rank, so tiles — and therefore the 64-cell
    grid, counts, and exact-DECIMAL monetary sums — are
    bitwise-identical to the window form."""
    from pyspark import StorageLevel

    from mr_py_spark.operators.windows import global_ntile

    o = tbl(spark, sf_dir, "orders")
    m = _rfm_metrics(o).persist(StorageLevel.MEMORY_AND_DISK)
    r = global_ntile(
        spark,
        m.select("o_custkey", "last_order"),
        "o_custkey",
        [F.col("last_order").desc(), F.col("o_custkey")],
        tile_col="r",
    )
    f = global_ntile(
        spark,
        m.select("o_custkey", "frequency"),
        "o_custkey",
        [F.col("frequency").desc(), F.col("o_custkey")],
        tile_col="f",
    )
    mm = global_ntile(
        spark,
        m.select("o_custkey", "monetary"),
        "o_custkey",
        [F.col("monetary").desc(), F.col("o_custkey")],
        tile_col="m",
    )
    return (
        m.select("o_custkey", "monetary")
        .join(r, "o_custkey")
        .join(f, "o_custkey")
        .join(mm, "o_custkey")
        .groupBy("r", "f", "m")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary").cast("double").alias("total_monetary"),
        )
    )
