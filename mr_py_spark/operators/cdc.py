"""CDC / upsert emulation (guide 'Common OLAP patterns': MERGE INTO
needs Delta/Iceberg jars, absent in this image — the portable form is
full-outer-join + coalesce, shown here with an exact oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4, fmt_ts_us
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE-shaped upsert: a matched update row overrides the target
    row IN FULL — including columns the update sets to NULL (true
    WHEN MATCHED THEN UPDATE semantics, keyed on the update's non-null
    join key rather than per-column coalesce, which could never null a
    column out). Unmatched updates insert, unmatched target rows
    survive. Both inputs must share a schema. One shuffle on the key
    (or none, if both sides are bucketed on it —
    sources/sinks.write_bucketed)."""
    t = target.alias("t")
    u = updates.alias("u")
    cols = target.columns
    matched = F.col(f"u.{key}").isNotNull()
    return t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full").select(
        *[
            F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )


@register(
    "cdc_upsert",
    tags=("B19", "B33"),
    oracle="""
        WITH updates AS (
            SELECT c.c_custkey,
                   max(c.c_name)                              AS c_name,
                   CAST(round(max(CAST(c.c_acctbal AS DECIMAL(10,4)))
                        + count(o.o_orderkey), 4) AS DOUBLE)  AS c_acctbal
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY c.c_custkey
        )
        SELECT CASE WHEN u.c_custkey IS NOT NULL THEN u.c_custkey ELSE c.c_custkey END AS c_custkey,
               CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name    ELSE c.c_name    END AS c_name,
               CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE c.c_acctbal END AS c_acctbal
        FROM customer c FULL OUTER JOIN updates u ON u.c_custkey = c.c_custkey
    """,
)
def cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change set to a dimension table: customers with filled
    orders get their balance bumped by their order count (a synthetic
    but deterministic change feed); everyone else passes through. The
    update arithmetic follows the exact-DECIMAL policy."""
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    updates = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.max("c_name").alias("c_name"),
            F.round(
                F.max(F.col("c_acctbal").cast("decimal(10,4)"))
                + F.count("o_orderkey"),
                4,
            )
            .cast("double")
            .alias("c_acctbal"),
        )
    )
    return merge_upsert(c, updates, "c_custkey")


@register(
    "scd2_dim",
    tags=("B19", "B35", "C9"),
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        changes AS (
            SELECT user_id, event_type, ts, event_id FROM ordered
            WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               coalesce(strftime(lead(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id),
                                 '%Y-%m-%d %H:%M:%S.%f'),
                        '9999-12-31 00:00:00.000000') AS valid_to,
               CAST(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                    AS BIGINT) AS is_current
        FROM changes
    """,
)
def scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build (CDC companion): collapse
    each user's event stream into versioned state rows — a new version
    opens whenever event_type changes, valid_to chains to the next
    version's valid_from, the open version is flagged current. Two
    windows over the same (user_id; ts, event_id) sort, so the plan is
    ONE shuffle + one in-partition sort reused by both; at 100 TB this
    is the standard dimension-history build off a CDC feed (the upsert
    counterpart is cdc_upsert)."""
    ev = tbl(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "event_type",
        fmt_ts_us("ts").alias("valid_from"),
        F.coalesce(fmt_ts_us(nxt), F.lit("9999-12-31 00:00:00.000000")).alias(
            "valid_to"
        ),
        nxt.isNull().cast("long").alias("is_current"),
    )


@register(
    "table_diff",
    tags=("B19", "B33", "B8"),
    oracle="""
        WITH snap_a AS (
            SELECT o_orderkey AS k,
                   CAST(o_totalprice AS DECIMAL(10,4)) AS pa
            FROM orders WHERE o_orderkey % 97 <> 3
        ), snap_b AS (
            SELECT o_orderkey AS k,
                   CASE WHEN o_orderkey % 13 = 5
                        THEN CAST(o_totalprice AS DECIMAL(10,4))
                             + CAST(1.5 AS DECIMAL(10,4))
                        ELSE CAST(o_totalprice AS DECIMAL(10,4))
                   END AS pb
            FROM orders WHERE o_orderkey % 89 <> 7
        )
        SELECT k AS o_orderkey,
               CASE WHEN pa IS NULL THEN 'added'
                    WHEN pb IS NULL THEN 'removed'
                    ELSE 'changed' END AS status,
               CAST(pa AS DOUBLE) AS old_price,
               CAST(pb AS DOUBLE) AS new_price
        FROM snap_a FULL OUTER JOIN snap_b USING (k)
        WHERE pa IS NULL OR pb IS NULL OR pa <> pb
    """,
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot table diff — the data-reconciliation primitive behind
    CDC backfills, migration sign-off, and replica drift checks: two
    versions of a keyed table full-outer-joined on the key, each row
    classified added / removed / changed, unchanged rows dropped
    BEFORE anything is materialized. The snapshots here are two
    deterministic modulo-carved views of orders (B lacks some of A's
    keys, has some new ones, and bumps every 13th price by 1.50), so
    all three classes are non-empty on every fixture.

    Scale shape: ONE co-partitioned shuffle on the key — at 100 TB
    both snapshots usually live bucketed on the key (sinks.
    write_bucketed), making the diff shuffle-free; the changed-test
    compares typed columns (exact DECIMAL here), and for wide tables
    the same plan compares a single md5/xxhash64 row digest instead,
    so the shuffle carries key+digest, never the payload. Output is
    proportional to the DRIFT, not the table."""
    orders = tbl(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    price = dec4(F.col("o_totalprice"))
    snap_a = orders.filter(key % 97 != 3).select(
        key.alias("k"), price.alias("pa")
    )
    snap_b = orders.filter(key % 89 != 7).select(
        key.alias("k"),
        F.when(
            key % 13 == 5, price + F.lit("1.5").cast("decimal(10,4)")
        )
        .otherwise(price)
        .alias("pb"),
    )
    pa, pb = F.col("pa"), F.col("pb")
    return (
        snap_a.join(snap_b, "k", "full")
        .filter(pa.isNull() | pb.isNull() | (pa != pb))
        .select(
            F.col("k").alias("o_orderkey"),
            F.when(pa.isNull(), "added")
            .when(pb.isNull(), "removed")
            .otherwise("changed")
            .alias("status"),
            pa.cast("double").alias("old_price"),
            pb.cast("double").alias("new_price"),
        )
    )


#: incremental_mv_merge state split: rows before this date are the
#: standing materialized state, rows on/after are the delta batch.
_MV_SPLIT = "1995-01-01"


@register(
    "incremental_mv_merge",
    tags=("B2", "B27", "B36"),
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(10,4))) AS DOUBLE)
                   AS total,
               CAST(sum(CAST(o_totalprice AS DECIMAL(10,4))) AS DOUBLE)
                   / count(*) AS avg_price
        FROM orders
        GROUP BY 1, 2
    """,
)
def incremental_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the standing MV
    state (orders before the split date, already aggregated) merges
    with the new delta batch (on/after the split, aggregated alone)
    by UNION + re-aggregate of the partial states — sum of counts,
    sum of exact-DECIMAL partial sums — instead of re-scanning
    history. The oracle is the from-scratch aggregate: the query
    proves algebraically-mergeable state gives the identical answer
    (decimal partial sums are exactly associative; avg is DERIVED
    from merged sum/count, never averaged-of-averages).

    At 100 TB this is the difference between touching one day's
    partition and re-scanning years: any sum/count/min/max MV
    maintains in O(delta), and the merge shuffle carries one row per
    (group x state), not per source row. The non-mergeable aggregates
    (exact median) are exactly the ones the engine's sketch surface
    (percentile_approx_digest, hll_rollup_merge) exists for."""
    orders = tbl(spark, sf_dir, "orders")
    split = F.lit(_MV_SPLIT).cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderstatus",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec4(F.col("o_totalprice"))).alias("tot_dec"),
        )

    state = partial(orders.filter(F.to_date("o_orderdate") < split))
    delta = partial(orders.filter(F.to_date("o_orderdate") >= split))
    merged = (
        state.unionByName(delta)
        .groupBy("month", "o_orderstatus")
        .agg(
            F.sum("n").alias("n_orders"),
            F.sum("tot_dec").alias("dec_total"),
        )
    )
    total = F.col("dec_total").cast("double")
    return merged.select(
        "month",
        "o_orderstatus",
        "n_orders",
        total.alias("total"),
        (total / F.col("n_orders")).alias("avg_price"),
    )
