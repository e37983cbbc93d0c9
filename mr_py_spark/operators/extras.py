"""Remaining inventory refinements (SURVEY.md §2): bag-semantics set
operations (B26), approximate percentiles (B4), map-typed columns
(B32), and range-frame windows (B35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


@register(
    "set_intersect_all",
    tags=("B26",),
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (B26 bag semantics): each nation key survives
    min(customer-count, supplier-count) times."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "set_except_all",
    tags=("B26",),
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (B26 bag semantics): occurrences in customer minus
    occurrences in supplier, per key."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register("percentile_approx_digest", tags=("B4",), oracle=None)
def percentile_approx_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (B4): Spark's quantile digest. Rows-only
    (sketch algorithms differ across engines by design); pytest bounds
    the estimate against the exact percentile. At 100 TB this is the
    only sane percentile: fixed-size mergeable state instead of a
    per-group sort."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
        F.percentile("l_extendedprice", 0.5).alias("exact_median"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("approx_p99"),
    )


@register(
    "map_fns",
    tags=("B32",),
    oracle="""
        WITH kv AS (
            SELECT unnest(json_keys(props)) AS map_key, props
            FROM events
        )
        SELECT CAST(json_extract_string(props, '$.' || map_key) AS BIGINT) % 10 AS k_mod,
               map_key,
               count(*) AS n
        FROM kv
        GROUP BY 1, 2
    """,
)
def map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column manipulation (B32): props parsed into a real
    MapType via from_json, then exploded into (key, value) rows —
    the dynamic-schema path when JSON keys are not known up front
    (vs get_json_object for known paths, see json_fns)."""
    ev = tbl(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    kv = ev.select(F.explode(m).alias("map_key", "map_val"))
    return kv.groupBy(
        (F.col("map_val") % 10).alias("k_mod"), "map_key"
    ).agg(F.count("*").alias("n"))


@register(
    "secondary_sort",
    tags=("A6", "B18"),
    oracle="""
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY ts, event_id) AS journey,
               count(*) AS n_events
        FROM events
        GROUP BY user_id
    """,
)
def secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MR secondary sort (A6), natively: values arrive at the reducer
    ordered by a non-key column. The MR form is composite keys + a
    custom partitioner + sorted shuffle ([MRDP ch.4]); Spark's form is
    an ordered aggregation — here each user's event-type journey in
    time order, via sorted structs -> transform (no UDF)."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ",",
            ).alias("journey"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "first_last_window",
    tags=("B35",),
    oracle="""
        SELECT user_id, event_id,
               first_value(value) OVER w AS first_value_seen,
               last_value(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS final_value,
               nth_value(value, 2) OVER w AS second_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def first_last_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth analytic functions (B35). last_value needs the
    full-partition frame (the default frame ends at CURRENT ROW —
    classic SQL footgun, made explicit here on both sides)."""
    from pyspark.sql import Window as W

    ev = tbl(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_value_seen"),
        F.last("value").over(w_full).alias("final_value"),
        F.nth_value("value", 2).over(w).alias("second_value"),
    )


@register(
    "range_frame_window",
    tags=("B35",),
    oracle="""
        SELECT user_id, event_id,
               count(*) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
        FROM events
    """,
)
def range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame (B35): events per user in the trailing
    hour, per event. Unlike ROWS frames, the frame is defined by the
    ordering VALUE (epoch micros), so it is insensitive to row ties —
    the streaming analog is a sliding window; this is the batch
    point-in-time form."""
    ev = tbl(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # session TZ pinned UTC
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


@register(
    "null_semantics_audit",
    tags=("B33", "B1", "B19"),
    oracle="""
        WITH t AS (
            SELECT nullif(l_linenumber % 3, 0) AS k,
                   CASE WHEN l_quantity > 45 THEN NULL
                        ELSE CAST(l_quantity AS DECIMAL(10,4)) END AS v,
                   l_orderkey
            FROM lineitem
        ),
        d AS (SELECT nullif(o_orderkey % 7, 0) AS jk, o_orderkey AS dk
              FROM orders),
        j AS (
            SELECT t.k, t.v, d.dk
            FROM t LEFT JOIN d ON nullif(t.l_orderkey % 7, 0) = d.jk
                               AND t.l_orderkey = d.dk
        )
        SELECT k,
               count(*)                          AS n_rows,
               count(v)                          AS n_nonnull,
               count(dk)                         AS n_matched,
               CAST(sum(v) AS DOUBLE)            AS v_sum,
               count(DISTINCT v)                 AS n_distinct_nonnull
        FROM j
        GROUP BY k
    """,
)
def null_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI NULL semantics, audited cross-engine (B33): the fixture
    tables are dense, so nothing else exercises the NULL edge rules a
    migrating user relies on — this query manufactures NULLs with
    nullif and pins four of them at once: (1) GROUP BY collects NULL
    keys into ONE group (grouping equality), while (2) a JOIN predicate
    on a NULL key matches NOTHING (comparison semantics — the same
    value behaving differently in the two contexts is the classic
    trap); (3) count(*) counts rows but count(v)/count(DISTINCT v)
    skip NULLs; (4) sum(v) ignores NULLs and stays DECIMAL-exact.
    The join-null rule is made OBSERVABLE through n_matched =
    count(d-side key): a lineitem whose manufactured key is NULL must
    null-extend (ANSI: NULL = NULL is unknown), so an engine that
    matched NULL keys would inflate n_matched — merely counting rows
    could not tell, since the dk equality keeps the join 1:<=1
    either way.

    Scale shape: one scan each side, a shuffle equi-join on the
    composite key (orders is a FACT table — no broadcast hint; AQE
    may still choose one at small sf), one keyed aggregate — the
    semantics are the point, the plan is routine."""
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    t = li.select(
        F.nullif(F.col("l_linenumber") % 3, F.lit(0)).alias("k"),
        F.when(F.col("l_quantity") > 45, F.lit(None))
        .otherwise(F.col("l_quantity").cast("decimal(10,4)"))
        .alias("v"),
        "l_orderkey",
    )
    d = orders.select(
        F.nullif(F.col("o_orderkey") % 7, F.lit(0)).alias("jk"),
        F.col("o_orderkey").alias("dk"),
    )
    j = t.join(
        d,
        (F.nullif(F.col("l_orderkey") % 7, F.lit(0)) == F.col("jk"))
        & (F.col("l_orderkey") == F.col("dk")),
        "left",
    ).select("k", "v", "dk")
    return j.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        F.count("dk").alias("n_matched"),
        F.sum("v").cast("double").alias("v_sum"),
        F.countDistinct("v").alias("n_distinct_nonnull"),
    )


@register(
    "empty_set_agg_audit",
    tags=("B2", "B33", "B19"),
    oracle="""
        WITH r AS (SELECT r_regionkey FROM region),
        agg AS (
            SELECT n_regionkey,
                   count(*)                    AS n_rows,
                   CAST(sum(CASE WHEN n_nationkey > 9999
                                 THEN n_nationkey END) AS BIGINT) AS s_none,
                   max(CASE WHEN n_nationkey > 9999
                            THEN n_nationkey END)      AS m_none
            FROM nation GROUP BY n_regionkey
        )
        SELECT r.r_regionkey,
               coalesce(a.n_rows, -1)  AS n_rows,
               a.s_none                AS s_none,
               a.m_none                AS m_none,
               (SELECT count(*) FROM nation WHERE n_nationkey > 9999)
                                       AS global_count_empty,
               (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation
                WHERE n_nationkey > 9999) AS global_sum_empty
        FROM r LEFT JOIN agg a ON a.n_regionkey = r.r_regionkey
    """,
)
def empty_set_agg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-set aggregate semantics (B2/B33): the ANSI rules a port
    silently gets wrong — a GLOBAL aggregate over zero rows returns
    ONE row with count = 0 and sum/max = NULL (never an empty result,
    never 0 for sum), while a GROUP BY over zero rows returns NO rows
    (surfaced here through a dimension left join); and an all-NULL
    argument inside a non-empty group likewise sums/maxes to NULL
    while count(*) still counts. All three distinctions are pinned in
    one result: per-region rows with NULL-on-empty conditional
    aggregates, plus the global empty-filter count (0) and sum (NULL)
    glued on as 1-row broadcast aggregates (the bounded class)."""
    nation = tbl(spark, sf_dir, "nation")
    region = tbl(spark, sf_dir, "region").select("r_regionkey")
    none_val = F.when(F.col("n_nationkey") > 9999, F.col("n_nationkey"))
    agg = nation.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(none_val).cast("long").alias("s_none"),
        F.max(none_val).alias("m_none"),
    )
    empty = nation.filter(F.col("n_nationkey") > 9999).agg(
        F.count(F.lit(1)).alias("global_count_empty"),
        F.sum("n_nationkey").cast("long").alias("global_sum_empty"),
    )
    return (
        region.join(agg, region.r_regionkey == agg.n_regionkey, "left")
        .crossJoin(F.broadcast(empty))
        .select(
            "r_regionkey",
            F.coalesce("n_rows", F.lit(-1)).alias("n_rows"),
            "s_none",
            "m_none",
            "global_count_empty",
            "global_sum_empty",
        )
    )
