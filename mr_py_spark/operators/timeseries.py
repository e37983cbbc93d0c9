"""Time-series & iterative relational shapes (SURVEY.md §2 C6 adjuncts).

The reference's pattern catalog stops at windowed aggregation; real
event-analytics workloads also need a dense date spine (gap fill),
ordered multi-stage funnels, statistical outlier flagging, and
recursive hierarchy traversal. Each is expressed declaratively so
Catalyst plans it: the spine is a tiny exploded sequence that
broadcast-joins the aggregated facts, the funnel is a chain of keyed
min-aggregations, and recursion uses Spark 4's native WITH RECURSIVE
(iterative distributed joins, no driver-side loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from mr_py_spark.functions import dec4, fmt_ts_us
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl
from mr_py_spark.sources.catalog import sql


@register(
    "gap_fill_daily",
    tags=("C6", "B2"),
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1
        ),
        span AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
                 FROM events),
        days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
                 FROM span)
        SELECT strftime(days.day, '%Y-%m-%d') AS day,
               coalesce(daily.n_events, 0)    AS n_events,
               coalesce(daily.total_value, 0.0) AS total_value
        FROM days LEFT JOIN daily ON daily.day = days.day
    """,
)
def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily rollup (C6): zero-fill days with no events so the
    series has one row per calendar day. The facts aggregate FIRST
    (one shuffle, output = #days rows), then left-join a date spine
    exploded from a single min/max row — the spine is always tiny
    (#days), so at 100 TB the join is a broadcast against an already-
    reduced frame, never a join against raw events. Money through
    DECIMAL per the float policy; days compared as strings."""
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec4("value")).cast("double").alias("total_value"),
    )
    span = ev.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    days = span.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    return days.join(daily, "day", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


@register(
    "funnel_conversion",
    tags=("C6", "B1", "B19"),
    oracle="""
        WITH s AS (SELECT user_id, min(ts) AS ts_signup
                   FROM events WHERE event_type = 'signup' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS ts_click
              FROM events e JOIN s ON s.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > s.ts_signup
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS ts_purchase
              FROM events e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.ts_click
              GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM s) AS n_signup,
               (SELECT count(*) FROM c) AS n_click_after,
               (SELECT count(*) FROM p) AS n_purchase_after
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (C6): users who signed up, then clicked after
    signing up, then purchased after that click. Each stage is a keyed
    min-aggregation joined to the previous stage's anchor timestamp —
    every shuffle is on user_id, so the three stages co-partition and
    AQE collapses the later joins to broadcasts (each stage's output
    only shrinks). No window over the full event stream is needed."""
    ev = tbl(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_signup"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("ts_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ts_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_purchase"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


# Uniform-ish fixture values have no 2-sigma tail; 1.5 sigma flags a
# real (but small) outlier set at every scale factor.
_Z_THRESHOLD = 1.5


@register(
    "anomaly_zscore",
    tags=("C6", "B4"),
    oracle=f"""
        WITH st AS (
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) / count(*)
                       AS mean_value,
                   sqrt((CAST(round(sum(CAST(value AS DECIMAL(10,4))
                                       * CAST(value AS DECIMAL(10,4))), 0) AS DOUBLE)
                         - CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE)
                           * CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) / count(*))
                        / NULLIF(count(*) - 1, 0)) AS sd_value
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, st.n_events, st.mean_value, st.sd_value,
               CAST(sum(CASE WHEN abs(e.value - st.mean_value)
                                  > {_Z_THRESHOLD} * st.sd_value
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e JOIN st ON st.event_type = e.event_type
        GROUP BY e.event_type, st.n_events, st.mean_value, st.sd_value
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier flagging (C6/B4): per-type mean/stddev, then
    count events beyond 1.5 sigma. The stats frame is #event_types rows
    and broadcasts back onto the stream — two scans, one tiny shuffle,
    no window over raw events. Stddev follows the group_medians exact-
    decimal reformulation (sum + integer-rounded sum-of-squares) so
    both engines evaluate the identical IEEE expression; the outlier
    predicate then compares bit-identical doubles on both sides."""
    ev = tbl(spark, sf_dir, "events")
    # dec4 product is DECIMAL(21,8) — exact. DECIMAL(19,4)^2 would be
    # (39,8) > 38 and silently truncate to (38,7), a ~5e-8/row error
    # the exact DuckDB oracle would not share.
    p4 = dec4("value")
    s1 = F.sum(p4).cast("double")
    s2 = F.round(F.sum(p4 * p4), 0).cast("double")
    n = F.count(F.lit(1))
    stats = ev.groupBy("event_type").agg(
        n.alias("n_events"),
        (s1 / n).alias("mean_value"),
        # NULL (not ANSI DIVIDE_BY_ZERO) on single-row groups, mirroring
        # the oracle's NULLIF(count(*)-1, 0).
        F.when(
            n > F.lit(1), F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1)))
        ).alias("sd_value"),
    )
    # when/otherwise, not a boolean cast: with NULL sd the predicate is
    # NULL and must count as 0 exactly like the oracle's CASE ... ELSE 0.
    outlier = F.when(
        F.abs(F.col("value") - F.col("mean_value"))
        > F.lit(_Z_THRESHOLD) * F.col("sd_value"),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n_events", "mean_value", "sd_value")
        .agg(F.sum(outlier).alias("n_outliers"))
    )


@register(
    "recursive_hierarchy",
    tags=("B27", "B19"),
    oracle="""
        WITH RECURSIVE tree(n_nationkey, n_name, depth, path) AS (
            SELECT n_nationkey, n_name, CAST(0 AS BIGINT),
                   CAST(n_nationkey AS VARCHAR)
            FROM nation WHERE n_nationkey = 0
            UNION ALL
            SELECT c.n_nationkey, c.n_name, t.depth + 1,
                   t.path || '/' || CAST(c.n_nationkey AS VARCHAR)
            FROM nation c JOIN tree t ON (c.n_nationkey - 1) // 2 = t.n_nationkey
            WHERE c.n_nationkey > 0
        )
        SELECT n_nationkey, n_name, depth, path FROM tree
    """,
)
def recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal (org-chart/BOM shape) via Spark 4
    native WITH RECURSIVE: nation keys form a synthetic binary tree
    (parent = (k-1) div 2), and the recursion computes each node's
    depth and root path. Executes as iterated distributed joins — one
    per level, O(log n) rounds for a balanced hierarchy — with no
    driver-side loop; the same plan shape serves real parent-child
    dimensions at any size. Depth is BIGINT on both sides (integer-
    width alignment)."""
    return sql(
        spark,
        sf_dir,
        """
        WITH RECURSIVE tree(n_nationkey, n_name, depth, path) AS (
            SELECT n_nationkey, n_name, CAST(0 AS BIGINT),
                   CAST(n_nationkey AS STRING)
            FROM nation WHERE n_nationkey = 0
            UNION ALL
            SELECT c.n_nationkey, c.n_name, t.depth + 1,
                   t.path || '/' || CAST(c.n_nationkey AS STRING)
            FROM nation c JOIN tree t ON (c.n_nationkey - 1) div 2 = t.n_nationkey
            WHERE c.n_nationkey > 0
        )
        SELECT n_nationkey, n_name, depth, path FROM tree
        """,
    )


@register(
    "attribution_last_touch",
    tags=("B35", "B33"),
    oracle="""
        WITH t AS (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type IN ('click', 'view')
                                   THEN struct_pack(ts := ts,
                                                    event_id := event_id,
                                                    event_type := event_type)
                              END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS touch
            FROM events
        )
        SELECT event_id AS purchase_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               touch.event_id AS touch_event,
               touch.event_type AS channel,
               epoch_us(ts) - epoch_us(touch.ts) AS latency_us
        FROM t WHERE event_type = 'purchase'
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent preceding click/view. One per-user ordered
    window (``last(..., ignorenulls)`` over unbounded-preceding..1-
    preceding) carries the latest touch forward — a single keyed
    shuffle on user_id, no self-join, no per-row lookback scan; the
    classic sessionization-adjacent pattern at clickstream scale.
    (ts, event_id) ordering makes the frame total, latency is an
    exact microsecond LONG difference, and the touch struct rides the
    window so id/type/ts stay mutually consistent when two touches
    share a microsecond. Purchases with no prior touch keep NULL
    touch columns (organic traffic)."""
    ev = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("click", "view"),
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.col("event_type"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_id", "user_id", "ts", "event_type", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            fmt_ts_us("ts").alias("purchase_ts"),
            F.col("touch.event_id").alias("touch_event"),
            F.col("touch.event_type").alias("channel"),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("touch.ts").cast("timestamp"))
            ).alias("latency_us"),
        )
    )


@register(
    "interpolate_linear",
    tags=("B35", "C6", "B33"),
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS v
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ), span AS (
            SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
            FROM events
        ), days AS (
            SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM span
        ), grid AS (
            SELECT u.user_id, days.day, daily.v
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN days
            LEFT JOIN daily ON daily.user_id = u.user_id
                           AND daily.day = days.day
        ), ctx AS (
            SELECT user_id, day, v,
                   last_value(v IGNORE NULLS) OVER w_prev  AS prev_v,
                   last_value(CASE WHEN v IS NOT NULL THEN day END
                              IGNORE NULLS) OVER w_prev    AS prev_day,
                   first_value(v IGNORE NULLS) OVER w_next AS next_v,
                   first_value(CASE WHEN v IS NOT NULL THEN day END
                               IGNORE NULLS) OVER w_next   AS next_day
            FROM grid
            WINDOW w_prev AS (PARTITION BY user_id ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW),
                   w_next AS (PARTITION BY user_id ORDER BY day
                              ROWS BETWEEN CURRENT ROW
                                       AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                        prev_v + (next_v - prev_v)
                            * (CAST(day - prev_day AS DOUBLE)
                               / CAST(next_day - prev_day AS DOUBLE))
               END AS value,
               CASE WHEN v IS NOT NULL THEN 'actual'
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                        THEN 'interp'
                    ELSE 'edge'
               END AS status
        FROM ctx
    """,
)
def interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of gaps in a per-user daily series (the
    time-series RESAMPLE+FILL pattern): daily purchase totals land on
    a dense user×day grid, interior missing days are filled by linear
    interpolation between the nearest observed neighbors, and edge
    days with no observation on one side stay NULL ('edge'). Two
    per-user ordered windows (carry-forward / carry-backward with
    ignorenulls) find both neighbors in one pass each — no self-join,
    no per-gap scan. The facts aggregate BEFORE the grid join, the
    date spine explodes from a 1-row min/max aggregate (broadcast),
    so grid size is users × days, never events × days.

    Determinism: observed values are exact decimal sums cast to
    double once; the interpolation is the identical IEEE chain
    (prev + (next-prev) * (ddays/dspan)) on both engines; day-deltas
    are exact integer datediffs."""
    ev = tbl(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(dec4("value")).cast("double").alias("v"))
    )
    span = ev.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    days = span.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(days))
        .join(daily, ["user_id", "day"], "left")
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = grid.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_day"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("next_day"),
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        F.datediff("day", "prev_day").cast("double")
        / F.datediff("next_day", "prev_day").cast("double")
    )
    both = F.col("prev_v").isNotNull() & F.col("next_v").isNotNull()
    return ctx.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(both, interp)
        .alias("value"),
        F.when(F.col("v").isNotNull(), F.lit("actual"))
        .when(both, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("status"),
    )


@register(
    "event_trigrams",
    tags=("B35", "B11", "B5"),
    oracle="""
        WITH s AS (
            SELECT event_type AS e1,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        FROM s WHERE e3 IS NOT NULL
        GROUP BY e1, e2, e3
        ORDER BY n DESC, e1, e2, e3
        LIMIT 20
    """,
)
def event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: the 20 most frequent 3-step
    event-type sequences across all users — the prep query for
    next-event models and funnel discovery. Each user's ordered
    stream becomes trigrams via two lead() calls over ONE per-user
    window (a single keyed shuffle; no self-joins, no collect_list
    materializing a user's whole history), then a global count and a
    fully-deterministic top-20 (n DESC, then lexicographic — a total
    order, so LIMIT is stable cross-engine). At clickstream scale the
    trigram alphabet is |types|^3, so the count shuffle moves a
    bounded key set regardless of row count; the top-k compiles to
    TakeOrdered, never a global sort."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(20)
    )


@register(
    "attribution_multi_touch",
    tags=("B35", "B2", "B33"),
    oracle="""
        WITH t AS (
            SELECT event_id, event_type,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS conv_id
            FROM events
        ), touches AS (
            SELECT conv_id, event_type AS channel
            FROM t
            WHERE event_type IN ('click', 'view') AND conv_id IS NOT NULL
        ), paths AS (
            SELECT conv_id, channel,
                   count(*) OVER (PARTITION BY conv_id) AS n_path
            FROM touches
        )
        SELECT channel,
               count(*)                 AS n_touches,
               count(DISTINCT conv_id)  AS n_conversions,
               CAST(sum(CAST(floor(1000000000.0 / n_path) AS BIGINT))
                    AS BIGINT)          AS credit_ns
        FROM paths GROUP BY channel
    """,
)
def attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution (the fractional-credit companion
    to ``attribution_last_touch``): every click/view is assigned to the
    user's NEXT purchase (its conversion), each conversion's credit is
    split equally across its path, and credit rolls up per channel.

    Cross-engine exactness design: fractional credit is the bitwise
    trap here — summing 1/n doubles is accumulation-order-dependent,
    so per-channel totals could never compare across engines. Credit is
    therefore INTEGER NANOCREDITS: floor(1e9 / n_path) as a LONG. The
    division is one IEEE op on identical inputs (identical bits both
    engines) and floor is tie-free (unlike round-half cases), so the
    long sums are exact and order-free — the PageRank DECIMAL-quantize
    argument with integers. A conversion's total credit is then
    n_path * floor(1e9/n_path), deliberately <= 1e9: deterministic
    truncation beats non-comparable exactness. The oracle's outer sum
    is CAST back to BIGINT because DuckDB promotes sum(BIGINT) to
    HUGEINT, which pandas materializes as float64 and the driver hash
    then sees a different dtype than Spark's long — the r7 skew_audit
    false-red class. Safe: each credit <= 1e9, so the per-channel sum
    stays < 2^63 up to ~9.2e9 touches per channel (cardinality bound,
    not a fixture bound).

    Scale shape: ONE keyed shuffle total. The per-user DESC window
    carries the next-purchase id backwards (the attribution_last_touch
    frame, time-reversed); the path-size count then windows on
    (user_id, conv_id) — NOT bare conv_id — because a conversion
    belongs to exactly one user, so the counts are identical while the
    existing hashpartitioning(user_id) already satisfies the clustered
    distribution: Spark inserts only a partition-local Sort, no second
    Exchange (plan-asserted in tests/test_plans.py; the bare-conv_id
    form re-shuffled the full touch stream). A channel-cardinality
    aggregate finishes. No self-join, no per-row lookback; touches
    after a user's last purchase never convert and drop out, matching
    the oracle."""
    ev = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conv = F.last(
        F.when(F.col("event_type") == "purchase", F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    touches = (
        ev.select("event_id", "user_id", "event_type", conv.alias("conv_id"))
        .filter(
            F.col("event_type").isin("click", "view")
            & F.col("conv_id").isNotNull()
        )
        .select("user_id", "conv_id", F.col("event_type").alias("channel"))
    )
    paths = touches.withColumn(
        "n_path",
        F.count(F.lit(1)).over(Window.partitionBy("user_id", "conv_id")),
    )
    credit = F.floor(F.lit(1000000000.0) / F.col("n_path")).cast("long")
    return paths.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("conv_id").alias("n_conversions"),
        F.sum(credit).alias("credit_ns"),
    )


@register(
    "ewma_daily",
    tags=("B39", "B35", "B30"),
    oracle="""
        WITH RECURSIVE daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS x,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY date_trunc('day', ts)) AS rn
            FROM events
            GROUP BY 1, 2
        ),
        walk(event_type, day, rn, x, ewma) AS (
            SELECT event_type, day, rn, x, x FROM daily WHERE rn = 1
            UNION ALL
            SELECT d.event_type, d.day, d.rn, d.x, (d.x + w.ewma) / 2
            FROM daily d JOIN walk w
              ON d.event_type = w.event_type AND d.rn = w.rn + 1
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x AS daily_value,
               ewma
        FROM walk
    """,
)
def ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily event value per
    type (alpha = 1/2) — the smoothing/forecast primitive (the
    recurrence is Holt's level equation; the next-day forecast IS the
    last EWMA). A sequential per-key recurrence is the one aggregate
    shape neither a window frame nor a commutative reduce expresses —
    the canonical ``applyInPandas`` stateful fold (B39).

    Cross-engine exactness design: alpha = 1/2 makes every update
    ``(x + prev) / 2`` — one IEEE add and one exponent decrement, both
    exact functions of their inputs — and the day totals enter through
    the DECIMAL(10,4)-sum policy, so the whole chain is bitwise
    reproducible. The oracle replays the identical recurrence as a
    RECURSIVE CTE stepping row_number order; Spark replays it as a
    per-group pandas fold over day-sorted rows. An arbitrary alpha
    would still match (same literal, same op order) but 1/2 keeps the
    values exactly representable, removing even the shared-rounding
    caveat.

    Scale shape: the daily aggregate is one keyed shuffle; the fold
    groups by event_type with each group bounded by CALENDAR LENGTH
    (days), not data size — at 10^9 events a group is still <= a few
    thousand rows, and a per-user variant partitions the same way.
    The day totals, not raw events, cross into Python."""
    import pandas as pd

    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(dec4("value")).cast("double").alias("x"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ew = []
        prev = None
        for x in pdf["x"]:
            prev = x if prev is None else (x + prev) / 2
            ew.append(prev)
        pdf["ewma"] = ew
        return pdf

    out = daily.groupBy("event_type").applyInPandas(
        fold, "event_type string, day timestamp_ntz, x double, ewma double"
    )
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("daily_value"),
        "ewma",
    )
