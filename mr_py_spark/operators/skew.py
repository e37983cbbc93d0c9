"""Skew-handling patterns (SURVEY.md §4 'Skew handling').

The reference handles skew with a custom partitioner ([MR04 §4.1]) —
a human noticing a hot key and hand-routing it. Spark gives two
mechanisms, both shown here:

1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
   on by default in 4.x) — runtime re-planning, nothing to write.
2. Salting — the explicit two-phase form for aggregations, where AQE
   cannot help because a single group key lands in a single reducer by
   definition. `salted_agg` demonstrates it with an oracle proving the
   result identical to the direct aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl
from mr_py_spark.util import shuffle_width

def _n_salts(spark: SparkSession) -> int:
    """Salt fan-out sized to the session's shuffle parallelism: the
    point of salting is to spread each hot key over every reducer, so
    a FIXED salt count under-parallelizes the moment the cluster is
    wider than it (8 salts on 1000 executors = 0.8% utilization on a
    5-key aggregate). shuffle.partitions is the deployment's own
    statement of reducer width; clamp [8, 1024] keeps small-session
    behavior stable and bounds the dim-replication factor in
    salted_join (dim_rows x salts)."""
    return max(8, min(1024, shuffle_width(spark, default=8)))


@register(
    "salted_agg",
    tags=("A5", "B2"),
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
    """,
)
def salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (hence
    maximally skewed) key: events has 5 event_types, so a direct
    groupBy puts ~20% of the table in each of 5 reducer tasks no matter
    how many executors exist.

    Phase 1 groups on (key, salt) — fan-out N_SALTS x, every core
    busy; phase 2 merges the N_SALTS partials per key — tiny. Decimal
    partials re-sum exactly, so the oracle is the plain aggregate:
    salting must be invisible in the result.
    """
    ev = tbl(spark, sf_dir, "events")
    n_salts = _n_salts(spark)
    salted = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(n_salts)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(dec4("value")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.sum("pv").cast("double").alias("total_value"),
    )


@register(
    "salted_join",
    tags=("A5", "B19"),
    oracle="""
        SELECT n.n_name, count(*) AS n_events,
               CAST(sum(CAST(e.value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
        GROUP BY n.n_name
    """,
)
def salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated skew join (A5/B19): the fact side's join key is
    extremely low-cardinality (user_id % 25 — every row lands on one
    of 25 reducer keys), so a plain shuffle join stalls on its hottest
    key no matter the cluster size. The explicit cure when the small
    side fits nowhere near memory: fact rows get a deterministic salt,
    the dim side is replicated once per salt value (explode over a
    literal range — dim_rows x N_SALTS, still tiny), and the join key
    becomes (key, salt) — fan-out N_SALTS x on the hot keys. Salting
    must be invisible in the result: the oracle is the unsalted join.
    (When the dim side simply fits in memory, broadcast beats salting
    — that form is broadcast_dim_join; AQE's skew-join handles the
    sort-merge case. This is the explicit pattern for when neither
    applies.)"""
    n_salts = _n_salts(spark)
    ev = tbl(spark, sf_dir, "events").withColumns(
        {
            "jk": F.col("user_id") % 25,
            "salt": F.pmod(F.col("event_id"), F.lit(n_salts)).cast("int"),
        }
    )
    dim = (
        tbl(spark, sf_dir, "nation")
        .select(
            "n_nationkey",
            "n_name",
            F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("salt"),
        )
    )
    return (
        ev.join(dim, (ev.jk == dim.n_nationkey) & (ev.salt == dim.salt))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec4("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "skew_join_stress",
    tags=("A5", "B19"),
    oracle="""
        WITH f AS (
            SELECT event_type,
                   1000 // ((event_id % 1000) + 1) AS jk,
                   CAST(value AS DECIMAL(10,4)) AS v
            FROM events
        ), d AS (
            SELECT jk, count(*) AS key_rows FROM f GROUP BY jk
        )
        SELECT CASE WHEN d.key_rows * 20 >= (SELECT sum(key_rows) FROM d)
                    THEN 'hot' ELSE 'cold' END AS band,
               count(*)              AS n_events,
               count(DISTINCT f.jk)  AS n_keys,
               CAST(sum(f.v) AS DOUBLE) AS total_value
        FROM f JOIN d ON f.jk = d.jk
        GROUP BY 1
    """,
)
def skew_join_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately zipf-keyed shuffle join — the stress shape AQE's
    skew-join splitting exists for (§4 skew handling, the one lever
    previously exercised only implicitly). The join key is the exact
    zipf transform jk = 1000 div ((event_id % 1000) + 1): key 1 owns
    ~50% of the fact rows, key 2 ~17%, key 3 ~8%... so a plain
    sort-merge join stalls on the key-1 reducer no matter the cluster
    width. The dim side is the per-key count (the classic enrich-with-
    group-stats join back), banded hot/cold at a >= 5% row share.

    The query itself stays DECLARATIVE — no salt, no hint: at scale
    AQE detects the oversized post-shuffle partition and splits it
    while replicating the matching dim partition
    (OptimizeSkewedJoin), which tests/test_plans.py proves
    end-to-end by lowering the skew thresholds to fixture size and
    asserting the executed plan carries the skew=true SMJ. Contrast
    with ``salted_join`` (the explicit cure when neither broadcast
    nor AQE applies) and ``salted_agg`` (aggregation skew, where AQE
    cannot help). The global-total window runs over the dim frame,
    bounded at <= 1000 rows by the key transform's range — the
    bounded-metadata class, never data-sized.

    Measured at sf100 (100M events, SCALE.md r10): with default confs
    AQE sidesteps the skew entirely by runtime-BROADCASTING the tiny
    dim (22 s, no straggler) — the split is the fallback for when
    both sides are big. Forcing SMJ, the split needs
    ``forceOptimizeSkewedJoin=true`` (now set by harden()): vanilla
    OptimizeSkewedJoin vetoes any split that would add an exchange,
    and this join's output feeds a different-key aggregation, so the
    veto always fires on exactly the shape that needs help. With
    force: 9.4 s vs 27-32 s unsplit (3.3x)."""
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events")
    f = ev.select(
        "event_type",
        F.expr("1000 div ((event_id % 1000) + 1)").alias("jk"),
        dec4("value").alias("v"),
    )
    d = f.groupBy("jk").agg(F.count(F.lit(1)).alias("key_rows"))
    d = d.withColumn(
        "band",
        F.when(
            F.col("key_rows") * 20 >= F.sum("key_rows").over(Window.partitionBy()),
            F.lit("hot"),
        ).otherwise(F.lit("cold")),
    ).select("jk", "band")
    return (
        f.join(d, "jk")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("jk").alias("n_keys"),
            F.sum("v").cast("double").alias("total_value"),
        )
    )


@register(
    "skew_audit",
    tags=("A5", "B7"),
    oracle="""
        WITH c AS (
            SELECT user_id, count(*) AS n FROM events GROUP BY user_id
        ),
        top10 AS (
            -- CAST: DuckDB sum(BIGINT) is HUGEINT, which pandas
            -- canonicalizes as float64 (828.0) while Spark's sum(long)
            -- stays bigint (828) -> value-hash mismatch on identical
            -- values (the round-7 red row). Same width-alignment
            -- invariant already applied to n_rows below.
            SELECT CAST(sum(n) AS BIGINT) AS top_rows
            FROM (SELECT n FROM c ORDER BY n DESC, user_id LIMIT 10)
        )
        SELECT count(*)                                    AS n_keys,
               CAST(sum(c.n) AS BIGINT)                    AS n_rows,
               max(c.n)                                    AS max_key_rows,
               CAST(max(c.n) AS DOUBLE) * count(*) / sum(c.n) AS skew_ratio,
               (SELECT top_rows FROM top10)                AS top10_rows
        FROM c
    """,
)
def skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostic (A5/B7): the measurement you run
    BEFORE deciding whether a join/agg key needs salting, AQE skew
    splitting, or nothing — key count, max-key row count, skew ratio
    (max/avg: 1.0 = perfectly even, >> 1 = a hot key owns the
    shuffle), and the row share of the 10 hottest keys.

    Scale shape: one partial-agg'd groupBy on the audited key; the
    per-key count frame is then reduced twice — a global 1-row
    aggregate and a TakeOrdered top-10 — both metadata-sized. The
    1-row crossJoin gluing them is the bounded-aggregate exemption
    (CLAUDE.md). skew_ratio is one IEEE multiply+divide of exact
    integers, bitwise identical on both engines."""
    ev = tbl(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    stats = c.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        (
            F.max("n").cast("double") * F.count("*") / F.sum("n")
        ).alias("skew_ratio"),
    )
    top10 = (
        c.orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
        .agg(F.sum("n").alias("top10_rows"))
    )
    return stats.crossJoin(F.broadcast(top10)).select(
        "n_keys", "n_rows", "max_key_rows", "skew_ratio", "top10_rows"
    )
