"""Data-organization patterns (SURVEY.md §2B: B14-B18; [MRDP ch.4]).

MR expresses these with custom partitioners and secondary sort; Spark
expresses them as writes with `partitionBy`, `orderBy` (built-in
range-partitioned total sort), and nest/unnest via collect/explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dsum
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


@register(
    "partition_counts",
    tags=("B14",),
    oracle="""
        SELECT source, lang, count(*) AS n_docs
        FROM documents
        GROUP BY source, lang
    """,
)
def partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-output routing keys ([MRDP ch.4] partitioning).

    The MR pattern routes records to named output buckets via a custom
    partitioner; the Spark-native form is
    ``df.write.partitionBy('source', 'lang')`` (exercised with a real
    write in tests/test_sinks.py). This query verifies the routing key
    distribution the writer would produce.
    """
    docs = tbl(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(F.count("*").alias("n_docs"))


@register(
    "binning",
    tags=("B15", "B33"),
    oracle="""
        SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                    WHEN o_totalprice < 300000 THEN 'medium'
                    ELSE 'large' END          AS bucket,
               count(*)                       AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(10,4))) AS DOUBLE) AS bucket_value
        FROM orders
        GROUP BY 1
    """,
)
def binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binning ([MRDP ch.4]): categorize rows, one record may inform
    exactly one bin — a `when/otherwise` chain, codegen'd."""
    o = tbl(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("bucket_value"),
        )
    )


@register(
    "total_sort",
    tags=("B16",),
    oracle="""
        SELECT o_orderkey, o_totalprice AS total_price
        FROM orders
        WHERE o_orderstatus = 'F'
        ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def total_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order sort ([MRDP ch.4]; [MR04 §4.2]). MR needs a sampled
    custom partitioner for this; Spark's `orderBy` IS that plan —
    sample, range-partition, sort within partitions."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.col("o_totalprice").alias("total_price"))
    )


@register("shuffle_random", tags=("B17",), oracle=None)
def shuffle_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random permutation ([MRDP ch.4] shuffling): sort by seeded rand.
    Rows-only (permutation order is engine-specific); pytest asserts it
    is a permutation (same multiset) and seed-stable."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.orderBy(F.rand(seed=42))
        .select("o_orderkey")
        .limit(100)
    )


@register(
    "hierarchical_nest",
    tags=("B18",),
    oracle="""
        SELECT l_orderkey,
               count(*) AS n_items,
               string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS item_lines,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(10,4))) AS DOUBLE) AS order_value
        FROM lineitem
        GROUP BY l_orderkey
    """,
)
def hierarchical_nest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-to-hierarchical ([MRDP ch.4]): nest children under the
    parent key. Here the nesting is the semantics, so collect_list is
    justified; the list is rendered as ordered text for hash stability.
    The inverse (hierarchical-to-flat) is `explode`, exercised in
    wordcount/inverted_index."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        F.array_join(
            F.sort_array(F.collect_list("l_linenumber")).cast("array<string>"), ","
        ).alias("item_lines"),
        dsum("l_extendedprice").alias("order_value"),
    )


_DPP_CACHE_ROOT_NAME = "spark_graft_dpp"


def _events_warehouse(spark: SparkSession, sf_dir: str) -> str:
    """Date-partitioned events warehouse + day dimension, built ONCE
    per sf_dir under a deterministic temp cache (the csv_source cache
    pattern; a _COMPLETE marker makes the build idempotent across
    runs). ``fact/`` is the events table written with
    ``partitionBy("day")`` — the physical layout that makes partition
    pruning (static AND dynamic) possible; ``day_dim/`` is the
    one-row-per-day dimension (day, dow) a star schema would join.
    Returns the warehouse root."""
    import os
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(),
        _DPP_CACHE_ROOT_NAME,
        sf_dir.rstrip("/").replace("/", "_"),
    )
    done = os.path.join(root, "_COMPLETE")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        ev = tbl(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
        ev.write.mode("overwrite").partitionBy("day").parquet(
            os.path.join(root, "fact")
        )
        dim = (
            ev.select("day")
            .distinct()
            .select("day", F.dayofweek("day").alias("dow"))
        )
        dim.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, "day_dim")
        )
        open(done, "w").close()
    return root


@register(
    "dpp_weekend_events",
    tags=("B14", "B19", "A7"),
    oracle="""
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM events
        WHERE isodow(ts) IN (6, 7)
        GROUP BY 1
    """,
)
def dpp_weekend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over a date-partitioned warehouse
    (B14's payoff at read time): the fact scan is joined to a FILTERED
    day dimension on the partition column, and Catalyst inserts a
    dynamicpruning subquery into the fact scan's PartitionFilters —
    the broadcast of the 8 weekend days prunes 22 of 30 date
    partitions BEFORE any fact bytes are read (plan-asserted in
    tests/test_plans.py). At 100 TB this is the difference between
    scanning the whole warehouse and scanning the qualifying days:
    the dim filter is not statically known to the fact scan, only the
    runtime join makes it available — exactly the star-schema shape
    DPP exists for. Weekend selection: Spark ``dayofweek`` IN (1,7)
    (1=Sunday) on the dim; DuckDB ``isodow`` IN (6,7) — the same day
    set, each engine's own calendar convention."""
    import os

    root = _events_warehouse(spark, sf_dir)
    fact = spark.read.parquet(os.path.join(root, "fact"))
    dim = (
        spark.read.parquet(os.path.join(root, "day_dim"))
        .filter(F.col("dow").isin(1, 7))
        .select("day")
    )
    return (
        fact.join(F.broadcast(dim), "day")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


def _interleave_sql(bx: str, by: str, bits: int) -> str:
    """SQL expression interleaving the low `bits` bits of bx (odd
    positions) and by (even positions) — identical text runs on both
    engines (pure integer bit ops)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


#: zorder_clustering geometry: 8-bit bins per dimension, bucket = the
#: top 8 of the 16 interleaved bits -> each bucket is EXACTLY a 16x16
#: rectangle of (cust_bin, day_bin) space.
_Z_BITS = 8
_Z_BUCKET_SHIFT = 8


@register(
    "zorder_clustering",
    tags=("B14", "B16", "B31"),
    oracle=f"""
        WITH span AS (
            SELECT min(o_custkey) AS c_lo, max(o_custkey) AS c_hi,
                   min(CAST(o_orderdate AS DATE)) AS d_lo,
                   max(CAST(o_orderdate AS DATE)) AS d_hi
            FROM orders
        ), b AS (
            SELECT ((o_custkey - c_lo) * {1 << _Z_BITS})
                       // (c_hi - c_lo + 1)                    AS bx,
                   (datediff('day', d_lo, CAST(o_orderdate AS DATE))
                        * {1 << _Z_BITS})
                       // (datediff('day', d_lo, d_hi) + 1)    AS by
            FROM orders CROSS JOIN span
        )
        SELECT CAST(({_interleave_sql('bx', 'by', _Z_BITS)})
                        >> {_Z_BUCKET_SHIFT} AS BIGINT) AS z_bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(bx) AS BIGINT) AS cust_bin_lo,
               CAST(max(bx) AS BIGINT) AS cust_bin_hi,
               CAST(min(by) AS BIGINT) AS day_bin_lo,
               CAST(max(by) AS BIGINT) AS day_bin_hi
        FROM b GROUP BY 1
    """,
)
def zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout keys — the multi-dimensional
    clustering that makes min/max file skipping work on TWO query
    dimensions at once (Delta OPTIMIZE ZORDER BY / Iceberg sort-order
    semantics, built from plain bit arithmetic): customer key and
    order day are each quantized to 8-bit bins against the table's
    span, the bins' bits are interleaved into a 16-bit Morton code,
    and rows land in bucket = code >> 8. Emits each bucket's row count
    and its (cust, day) bin extents — by construction every bucket is
    a 16x16 rectangle, so a predicate on EITHER dimension prunes
    ~15/16 of buckets from their min/max stats alone, where a
    single-column sort layout prunes only its leading dimension.

    At 100 TB the same expression is the repartitionByRange /
    sortWithinPartitions key before the parquet write (the write-side
    demo lives in tests/test_sinks.py's partitioned warehouse); this
    registered form verifies the code assignment and the bounded
    extents cross-engine. The span is a 1-row broadcast aggregate
    (bounded-metadata exemption class); all math is exact integer
    floor division, identical both engines."""
    orders = tbl(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate")
    span = orders.agg(
        F.min("o_custkey").alias("c_lo"),
        F.max("o_custkey").alias("c_hi"),
        F.min(day).alias("d_lo"),
        F.max(day).alias("d_hi"),
    )
    n = 1 << _Z_BITS
    # Integer `div` both engines (DuckDB `//`) — a double-division
    # floor() is exact here but only by a magnitude argument; div is
    # exact by construction at ANY key range.
    b = (
        orders.crossJoin(F.broadcast(span))
        .withColumn("o_day", day)
        .select(
            F.expr(
                f"(o_custkey - c_lo) * {n} div (c_hi - c_lo + 1)"
            ).alias("bx"),
            F.expr(
                f"datediff(o_day, d_lo) * {n}"
                " div (datediff(d_hi, d_lo) + 1)"
            ).alias("by"),
        )
    )
    z = F.expr(_interleave_sql("bx", "by", _Z_BITS))
    return (
        b.groupBy(
            F.shiftright(z, _Z_BUCKET_SHIFT).cast("long").alias("z_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("bx").cast("long").alias("cust_bin_lo"),
            F.max("bx").cast("long").alias("cust_bin_hi"),
            F.min("by").cast("long").alias("day_bin_lo"),
            F.max("by").cast("long").alias("day_bin_hi"),
        )
    )
