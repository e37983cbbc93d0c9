"""SQL entry point + advanced relational shapes (SURVEY.md §3, §4).

The reference has no declarative layer — every query is hand-written
Python ([R-API], SURVEY.md §3). This engine treats SQL as first-class:
`mr_py_spark.sources.sql(spark, sf_dir, "...")` runs ANSI SQL over the
fixture views, producing the same Catalyst plans as the DataFrame API.
The queries here exercise optimizer features the reference's users
would have to hand-roll: subquery decorrelation, grouping sets, and
scalar subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import fmt_ts
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl
from mr_py_spark.sources.catalog import sql


@register(
    "sql_correlated_subquery",
    tags=("B19", "B3"),
    oracle="""
        SELECT s_suppkey, s_nationkey
        FROM supplier s
        WHERE s.s_acctbal > (
            SELECT CAST(sum(CAST(s2.s_acctbal AS DECIMAL(10,4))) AS DOUBLE) / count(*)
            FROM supplier s2
            WHERE s2.s_nationkey = s.s_nationkey
        )
    """,
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: suppliers above their nation's mean
    balance. Catalyst decorrelates this into an aggregate + join — the
    rewrite the reference's users perform by hand (two MR jobs + a
    replicated join). The inner average follows the exact-DECIMAL
    policy so both engines compare against the bit-identical mean."""
    return sql(
        spark,
        sf_dir,
        """
        SELECT s_suppkey, s_nationkey
        FROM supplier s
        WHERE s.s_acctbal > (
            SELECT CAST(sum(CAST(s2.s_acctbal AS DECIMAL(10,4))) AS DOUBLE) / count(*)
            FROM supplier s2
            WHERE s2.s_nationkey = s.s_nationkey
        )
        """,
    )


@register(
    "sql_grouping_sets",
    tags=("B36",),
    oracle="""
        SELECT c_mktsegment, c_nationkey, count(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (B36): per-segment, per-nation, and grand
    total in one pass (a single Expand + aggregate, not three scans)."""
    return sql(
        spark,
        sf_dir,
        """
        SELECT c_mktsegment, c_nationkey, count(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """,
    )


@register(
    "sql_q6_forecast",
    tags=("B2", "B8"),
    oracle="""
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(10,4))
                        * CAST(l_discount AS DECIMAL(10,4))), 4) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
)
def sql_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped selective scan: every predicate pushes to
    parquet (range + between + less-than), then a single global
    aggregate — the purest pushdown benchmark shape."""
    return sql(
        spark,
        sf_dir,
        """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(10,4))
                        * CAST(l_discount AS DECIMAL(10,4))), 4) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
        """,
    )


@register(
    "unpivot_long",
    tags=("B36",),
    oracle="""
        WITH per_nation AS (
            SELECT n.n_nationkey,
                   (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_cust,
                   (SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_supp
            FROM nation n
        )
        SELECT n_nationkey, 'n_cust' AS metric, n_cust AS metric_value FROM per_nation
        UNION ALL
        SELECT n_nationkey, 'n_supp' AS metric, n_supp AS metric_value FROM per_nation
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt wide->long (inverse of pivot_wide) via the native
    `unpivot`; the oracle expresses the same reshape as UNION ALL."""
    n = tbl(spark, sf_dir, "nation")
    c = tbl(spark, sf_dir, "customer").groupBy(
        F.col("c_nationkey").alias("nk")
    ).agg(F.count("*").alias("n_cust"))
    s = tbl(spark, sf_dir, "supplier").groupBy(
        F.col("s_nationkey").alias("nk")
    ).agg(F.count("*").alias("n_supp"))
    wide = (
        n.join(c, n.n_nationkey == c.nk, "left")
        .join(s, n.n_nationkey == s.nk, "left")
        .select(
            "n_nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )
    return wide.unpivot(
        ids=["n_nationkey"],
        values=["n_cust", "n_supp"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


@register(
    "asof_join",
    tags=("B24", "C6"),
    oracle="""
        SELECT e.event_id, e.user_id,
               strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') e
        ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
          ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest signup at-or-
    before it, per user. Spark lacks a native ASOF; the scalable
    expression is tag + a running `last(ignorenulls)` window — one
    shuffle on (user_id), one in-partition sort, no range
    cross-product. (DuckDB's native ASOF JOIN is the oracle.)

    Both join sides live in the same events table, so rather than the
    textbook two-scans-plus-union the tag is a conditional projection
    over ONE scan (pushed `event_type IN (purchase, signup)` filter):
    signup rows carry their ts in `signup_ts`, purchase rows carry
    NULL there and their id in `event_id`. Halves the scan I/O of the
    union form and feeds the same window bitwise-identically.

    Ambiguity guard: the fixture's ns timestamps make exact purchase/
    signup ts collisions effectively impossible, so 'at-or-before' is
    well-defined on both sides.

    100 TB: the single exchange keys on user_id, whose per-key row
    count is human-bounded (a user's events, not the corpus), so the
    unsplittable window partition is safe here — unlike a gram- or
    token-keyed window. For a standing event warehouse, bucket the
    events table by user_id (``write_bucketed`` in sources/sinks.py):
    the bucketed scan already satisfies the window's required
    clustering, so the exchange disappears and repeated as-of joins
    are scan-bound — proven by plan assertion in
    tests/test_sinks.py (test_asof_over_bucketed_no_exchange). A
    degenerate key (one synthetic user owning billions of rows)
    should be pre-split by a time-epoch salt carried into the tag
    instead.
    """
    from pyspark.sql import Window as W

    ev = tbl(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias("event_id"),
        "user_id",
        "ts",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    # signup rows sort before purchase rows at identical ts (is_purchase asc)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("event_id").isNotNull().cast("int"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("last_signup", F.last("signup_ts", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            fmt_ts("last_signup").alias("signup_ts"),
        )
    )


@register(
    "sql_recursive_cte",
    tags=("A9", "B27", "B19"),
    oracle="""
        WITH RECURSIVE chain(c_custkey, depth) AS (
            SELECT c_custkey, CAST(0 AS BIGINT) FROM customer
            WHERE c_custkey = 0
            UNION ALL
            SELECT c.c_custkey, ch.depth + 1
            FROM customer c JOIN chain ch ON c.c_custkey // 10 = ch.c_custkey
            WHERE c.c_custkey > 0
        )
        SELECT depth, count(*) AS n_nodes,
               CAST(sum(c_custkey) AS BIGINT) AS key_sum
        FROM chain GROUP BY depth
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4 WITH RECURSIVE): walk the implicit
    management tree parent(c) = c DIV 10 from the root customer, one
    level per recursive step, and profile the tree by depth. The same
    traversal family as ``khop_reach``/``recursive_hierarchy``, but
    executed by the ENGINE's recursion operator instead of a
    hand-rolled driver loop — the declarative form users of a SQL
    warehouse reach for first, now expressible in Spark itself (the
    oracle is the same statement in DuckDB dialect, `//` for DIV).

    Scale note: each recursion level is one equi-join of the frontier
    against the customer scan — the same per-level plan as the manual
    BFS, with Spark managing the loop and the union. Depth is bounded
    by log10(max key), so the plan depth is ~7 at 10^9 customers; the
    frontier anti-join trick (bfs_min_dist) is unnecessary because the
    DIV-10 tree has no cycles or revisits by construction."""
    return sql(
        spark,
        sf_dir,
        """
        WITH RECURSIVE chain(c_custkey, depth) AS (
            SELECT c_custkey, CAST(0 AS BIGINT) FROM customer
            WHERE c_custkey = 0
            UNION ALL
            SELECT c.c_custkey, ch.depth + 1
            FROM customer c JOIN chain ch ON c.c_custkey DIV 10 = ch.c_custkey
            WHERE c.c_custkey > 0
        )
        SELECT depth, count(*) AS n_nodes,
               CAST(sum(c_custkey) AS BIGINT) AS key_sum
        FROM chain GROUP BY depth
        """,
    )


@register(
    "sql_lateral_topk",
    tags=("B19", "B11", "B34"),
    oracle="""
        SELECT s.c_mktsegment, t.c_custkey, t.c_acctbal
        FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
        LATERAL (
            SELECT c_custkey, c_acctbal FROM customer c
            WHERE c.c_mktsegment = s.c_mktsegment
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (the SQL-standard form of top-k per
    group): for each market segment, its two largest account balances
    with a total (acctbal DESC, custkey) tie-break. Semantically
    identical to ``topk_window``'s row_number filter — registered to
    prove the LATERAL surface itself, which Spark de-correlates into
    a join + per-group limit rather than executing row-at-a-time (so
    the 100 TB shape is the same windowed plan, written the way a SQL
    user would write it)."""
    return sql(
        spark,
        sf_dir,
        """
        SELECT s.c_mktsegment, t.c_custkey, t.c_acctbal
        FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
        LATERAL (
            SELECT c_custkey, c_acctbal FROM customer c
            WHERE c.c_mktsegment = s.c_mktsegment
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t
        """,
    )
