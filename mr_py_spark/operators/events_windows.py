"""Time-window aggregation over the events table (SURVEY.md §2C: C6-C7).

The reference has no time/streaming surface at all; these are the
batch forms of Spark's windowing functions — the *same* expressions
run unchanged on `readStream` (see mr_py_spark/streaming/), which is
the point of Structured Streaming's unified model. Oracle SQL
expresses the identical bucketing with date_trunc / gap-and-island
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dsum, fmt_ts
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


@register(
    "tumbling_window",
    tags=("C6",),
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
               count(*)             AS n_events,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1
    """,
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate (C6) via the native `window`
    function; bucket rendered as text for a representation-stable hash."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(fmt_ts(F.col("w.start")).alias("bucket"), "n_events", "total_value")
    )


@register(
    "sliding_window",
    tags=("C6",),
    oracle="""
        SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               count(*)             AS n_events,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM (
            SELECT unnest([date_trunc('hour', ts),
                           date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS bucket,
                   value
            FROM events
        )
        GROUP BY 1
    """,
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour window sliding by 1 hour (C6): every event lands in two
    buckets. The oracle expresses the same assignment by exploding each
    event into its two bucket starts."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(fmt_ts(F.col("w.start")).alias("bucket"), "n_events", "total_value")
    )


@register(
    "session_window",
    tags=("C7",),
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             >= INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), numbered AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_last,
               count(*)             AS n_events,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS session_value
        FROM numbered
        GROUP BY user_id, session_id
    """,
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows, 30-minute gap (C7), via the native
    `session_window` function. Spark merges an event into the current
    session iff ts < last_ts + gap (strict), so the oracle's
    gap-and-island starts a new session when the gap is >= 30 min.
    session end is reported as max(ts) (Spark's window.end = last+gap,
    which is a representation choice, not data)."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_last"),
            F.count("*").alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            fmt_ts("s_start").alias("session_start"),
            fmt_ts("s_last").alias("session_last"),
            "n_events",
            "session_value",
        )
    )


@register(
    "audience_overlap",
    tags=("B19", "B37", "B10"),
    oracle="""
        WITH ut AS (
            SELECT DISTINCT user_id, event_type FROM events
        ), totals AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut
            GROUP BY event_type
        ), pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_both
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_both,
               CAST(n_both AS DOUBLE)
                   / CAST(ta.n + tb.n - n_both AS DOUBLE) AS jaccard
        FROM pairs
        JOIN totals ta ON ta.event_type = type_a
        JOIN totals tb ON tb.event_type = type_b
    """,
)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap matrix: for every pair of event types,
    how many distinct users did BOTH, plus each side's reach and the
    Jaccard overlap — the segment-intersection query behind campaign
    planning and cohort design. The sketch version of this is
    hll_rollup_merge; this is the exact form, and its scale shape is
    what makes exactness affordable: dedup to (user, type) FIRST (one
    shuffle, map-side combinable), so the self-join runs on the
    deduped frame where each user contributes at most C(T,2) pairs —
    bounded by the TYPE alphabet (T=5 here), never by the user's
    event count. The totals join is T rows, broadcast.

    Jaccard = n_both / (n_a + n_b - n_both), one double division,
    identical both engines."""
    ev = tbl(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    totals = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = F.broadcast(totals.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a")))
    tb = F.broadcast(totals.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b")))
    return (
        pairs.join(ta, "type_a")
        .join(tb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
            ).alias("jaccard"),
        )
    )
