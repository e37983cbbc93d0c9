"""Filtering patterns (SURVEY.md §2B: B8-B13; [MRDP ch.3]).

In the reference these are map-only jobs (mapper emits the record or
nothing [MRDP ch.3]); here they are `filter`/`select`/`distinct`/
`limit` — and unlike the reference, the predicate and projection reach
the parquet scan (PushedFilters / ReadSchema in `.explain`), so at
100 TB the filter skips row groups instead of reading-then-dropping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4, dsum, fmt_ts
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


@register(
    "filter_grep",
    tags=("B8",),
    oracle="""
        SELECT event_id, user_id, value,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        FROM events
        WHERE event_type = 'error' AND value >= 200.0
    """,
)
def filter_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filter ([MRDP ch.3] filtering). Both conjuncts push
    down to the parquet scan."""
    ev = tbl(spark, sf_dir, "events")
    return ev.filter((F.col("event_type") == "error") & (F.col("value") >= 200.0)).select(
        "event_id",
        "user_id",
        "value",
        fmt_ts("ts").alias("ts_s"),
    )


@register(
    "regex_grep",
    tags=("B8",),
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE regexp_matches(text, 'sort [a-z]+ key') AND lang = 'en'
    """,
)
def regex_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex grep ([MRDP ch.3]): `rlike` — the mapper's `re.search`
    equivalent, evaluated JVM-side."""
    docs = tbl(spark, sf_dir, "documents")
    return docs.filter(
        F.col("text").rlike("sort [a-z]+ key") & (F.col("lang") == "en")
    ).select("doc_id", "lang", "n_chars")


@register(
    "projection",
    tags=("B9",),
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(10,4))
                    * (1 - CAST(l_discount AS DECIMAL(10,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-02-01 00:00:00'
    """,
)
def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed column ([MRDP ch.3]). Catalyst prunes the
    scan to the 5 referenced columns of 11 (check ReadSchema)."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-02-01 00:00:00").cast("timestamp_ntz"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        (dec4("l_extendedprice") * (F.lit(1).cast("decimal(10,4)") - dec4("l_discount")))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "distinct_rows",
    tags=("B10",),
    oracle="""
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct ([MRDP ch.3] dedup pattern): planned as partial+final
    hash aggregate on all columns — the MR 'emit record as key' trick,
    with the combiner for free."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "top_k",
    tags=("B11",),
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice AS total_price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k ([MRDP ch.3] top ten). Spark plans
    TakeOrderedAndProject: each partition keeps its local k, the driver
    merges — O(k) memory, no global sort. Tie-broken by key so the
    boundary is deterministic."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("total_price"))
    )


@register("sample_seeded", tags=("B12",), oracle=None)
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded random sampling ([MRDP ch.3]). Rows-only: RNG streams are
    engine-specific, so no cross-engine oracle exists; the pytest suite
    asserts determinism across runs and fraction tolerance instead.
    Includes stratified sampleBy (per-stratum fractions)."""
    ev = tbl(spark, sf_dir, "events")
    plain = ev.sample(fraction=0.1, seed=42).select("event_id")
    strat = ev.sampleBy("event_type", {"click": 0.2, "view": 0.05}, seed=42).select("event_id")
    return (
        plain.agg(F.count("*").alias("n"))
        .withColumn("which", F.lit("plain"))
        .unionByName(strat.agg(F.count("*").alias("n")).withColumn("which", F.lit("stratified")))
    )


@register(
    "bloom_semi_filter",
    tags=("B13", "B20"),
    oracle="""
        SELECT l.l_orderkey, count(*) AS n_items,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))) AS DOUBLE) AS items_value
        FROM lineitem l
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000.0
        )
        GROUP BY l.l_orderkey
    """,
)
def bloom_semi_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter ([MRDP ch.3] bloom filtering).

    The MR pattern ships a pre-built bloom file to every mapper. Spark
    subsumes it: the optimizer injects a bloom built from the selective
    side into the probe-side scan of this semi-join
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by default
    in Spark 3.4+), which is exactly the pattern, minus false positives
    in the result — so the oracle is the exact EXISTS semantics.
    """
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("items_value"),
        )
    )
