"""Text/CSV source surface (SURVEY.md §2 A7).

The reference pattern catalog's canonical input is line-oriented text
parsed ad hoc per mapper; the Spark-first form is a schema'd CSV scan
(header, quoting, typed columns) — same DataFrame downstream as any
parquet table, so every operator composes with it unchanged. The
parquet catalog (sources/catalog.py) stays the performance path;
this proves the non-columnar ingest path end-to-end with a driver
oracle (round 1 covered it only in pytest round-trips,
tests/test_sources.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.registry import register
from mr_py_spark.sources import tbl

_CSV_CACHE_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_csv")


@register(
    "csv_source_agg",
    tags=("A7", "B1"),
    oracle="""
        SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
        FROM nation
        GROUP BY n_regionkey
    """,
)
def csv_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the nation table through a real CSV file, then read it
    back with an explicit schema and aggregate. The oracle runs the
    same aggregate over the parquet view, so any CSV write/read
    mangling (quoting, header, type coercion) breaks parity. Scale
    note: an explicit schema (never inferSchema) is mandatory at 100 TB
    — inference is an extra full scan of the input."""
    path = os.path.join(
        _CSV_CACHE_ROOT, sf_dir.rstrip("/").replace("/", "_"), "nation"
    )
    nation = tbl(spark, sf_dir, "nation")
    nation.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    csv = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", True)
        .csv(path)
    )
    return csv.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"), F.min("n_name").alias("first_name")
    )


@register(
    "json_source_agg",
    tags=("A7", "B1"),
    oracle="""
        SELECT c_mktsegment, count(*) AS n_cust, max(c_name) AS last_name
        FROM customer
        GROUP BY c_mktsegment
    """,
)
def json_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the customer table through JSON-lines files, read
    back with an explicit schema, aggregate — the semi-structured
    ingest path (A7). Same discipline as the CSV variant: explicit
    schema (JSON inference is a full extra scan at 100 TB), and the
    oracle runs over the parquet view so any serialization mangling
    (unicode, number formatting, null encoding) breaks parity."""
    path = os.path.join(
        _CSV_CACHE_ROOT, sf_dir.rstrip("/").replace("/", "_"), "customer_json"
    )
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    cust.coalesce(1).write.mode("overwrite").json(path)
    js = spark.read.schema("c_custkey long, c_name string, c_mktsegment string").json(
        path
    )
    return js.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"), F.max("c_name").alias("last_name")
    )


@register(
    "orc_source_agg",
    tags=("A7", "B1"),
    oracle="""
        SELECT p_type, count(*) AS n_parts, min(p_retailprice) AS min_price
        FROM part
        GROUP BY p_type
    """,
)
def orc_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the part table through ORC — the third columnar
    format the engine ingests natively (parquet is the catalog's
    performance path, CSV/JSONL the text paths). ORC keeps types
    end-to-end so no explicit schema is needed on re-read; the oracle
    runs over the parquet view, so any type mangling in the ORC
    round-trip breaks parity."""
    path = os.path.join(
        _CSV_CACHE_ROOT, sf_dir.rstrip("/").replace("/", "_"), "part_orc"
    )
    part = tbl(spark, sf_dir, "part").select("p_partkey", "p_type", "p_retailprice")
    part.coalesce(1).write.mode("overwrite").orc(path)
    orc = spark.read.orc(path)
    return orc.groupBy("p_type").agg(
        F.count("*").alias("n_parts"), F.min("p_retailprice").alias("min_price")
    )


_AVRO_SUPPLIER_SCHEMA = {
    "type": "record",
    "name": "supplier",
    "fields": [
        {"name": "s_suppkey", "type": "long"},
        {"name": "s_nationkey", "type": "int"},
        {"name": "s_acctbal", "type": "double"},
    ],
}


@register(
    "avro_source_agg",
    tags=("A7", "B1"),
    oracle="""
        SELECT s_nationkey, count(*) AS n_supp, max(s_acctbal) AS max_bal
        FROM supplier
        GROUP BY s_nationkey
    """,
)
def avro_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the supplier table through Avro — the row-oriented
    binary interchange format (Kafka/streaming ingest lingua franca).

    spark-avro's jar is an external module absent from this container,
    so BOTH paths are this repo's own container-spec implementation
    (sources/avro_py.py): the WRITE encodes one container file per
    partition executor-side (write_avro_distributed — no driver
    materialization at any size), the READ is a binaryFile scan + an
    Arrow-batched mapInPandas block decoder — no external jar, same
    explicit-schema discipline as the CSV/JSON sources, oracle-checked
    against the parquet view."""
    from mr_py_spark.sources.avro_py import read_avro, write_avro_distributed

    path = os.path.join(
        _CSV_CACHE_ROOT, sf_dir.rstrip("/").replace("/", "_"), "supplier_avro"
    )
    supp = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    # wipe stale files first: partition count (= file count) varies
    # across sessions, so an overwrite could otherwise leave orphans
    # from a wider previous run in the glob
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    write_avro_distributed(supp, path, _AVRO_SUPPLIER_SCHEMA)
    av = read_avro(spark, path, _AVRO_SUPPLIER_SCHEMA)
    return av.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"), F.max("s_acctbal").alias("max_bal")
    )


@register(
    "schema_evolution_merge",
    tags=("A7", "B2", "B33"),
    oracle="""
        SELECT o_orderpriority,
               count(*)                                        AS n_orders,
               count(o_note)                                   AS n_with_note,
               CAST(sum(CASE WHEN o_note IS NOT NULL
                             THEN o_custkey END) AS BIGINT) AS cust_sum
        FROM (
            SELECT o_orderpriority, o_custkey, NULL AS o_note
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL BY NAME
            SELECT o_orderpriority, o_custkey,
                   'rush' AS o_note
            FROM orders WHERE o_orderkey % 2 = 1
        )
        GROUP BY o_orderpriority
    """,
)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (A7): a warehouse directory whose parquet
    files were written by TWO generations of a pipeline — generation 1
    without the ``o_note`` column, generation 2 with it — read back as
    ONE table via ``mergeSchema``, old files surfacing NULL for the
    new column. This is the steady state of any long-lived 100 TB
    ingest (columns get added; history is never rewritten), and the
    footer-union read is the capability the plain catalog path never
    exercises.

    Scale note: ``mergeSchema`` unions schemas from file FOOTERS (a
    metadata pass, cheap relative to data) but is off by default for a
    reason — on millions of files prefer a declared read schema or a
    table format carrying schema in the catalog; the docstringed
    alternative IS that read-schema form, this query proves the
    discovery form. The aggregate distinguishes generations through
    count/sum-by-presence, so a wrong NULL-fill (or a silently dropped
    column) breaks parity bitwise."""
    root = os.path.join(
        _CSV_CACHE_ROOT, sf_dir.rstrip("/").replace("/", "_"), "orders_evo"
    )
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_custkey"
    )
    gen1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    gen2 = orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_note", F.lit("rush")
    )
    gen1.write.mode("overwrite").parquet(os.path.join(root, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(root, "gen=2"))
    evo = spark.read.option("mergeSchema", True).option(
        "recursiveFileLookup", True
    ).parquet(root)
    return evo.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("o_note").alias("n_with_note"),
        F.sum(F.when(F.col("o_note").isNotNull(), F.col("o_custkey")))
        .cast("long")
        .alias("cust_sum"),
    )


@register(
    "python_datasource_agg",
    tags=("A7", "B1"),
    oracle="""
        SELECT ((i * i) % 997) % 10 AS val_bucket,
               count(*)             AS n,
               CAST(sum(i) AS BIGINT)      AS id_sum,
               max((i * i) % 997)   AS val_max
        FROM (SELECT unnest(generate_series(0, 99999)) AS i)
        GROUP BY 1
    """,
)
def python_datasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON DATA SOURCE read (A7, the Spark 4 DataSource API):
    100k rows generated by executor-side Python through
    ``spark.read.format("intgen")`` — the connector contract for any
    system without a built-in reader (REST cursors, KV stores,
    queues), demonstrated with exact arithmetic so DuckDB can replay
    the generation in SQL.

    Scale shape: the reader declares partition bounds up front
    (sources/pygen.py ``partitions()``), so Spark schedules one task
    per slice — generation is embarrassingly parallel, the driver
    holds only bounds, and a real connector would page through its
    slice the same way. The aggregate proves values AND completeness
    (count per bucket catches a dropped or duplicated partition)."""
    from mr_py_spark.session import harden
    from mr_py_spark.sources.pygen import IntGenDataSource

    # Executors unpickle _Slice/IntGenReader from mr_py_spark.sources.
    # pygen — every other query ships the package zip via tbl()'s
    # harden(); this one reads no table, so harden explicitly (it is
    # idempotent) or a fresh external session would fail worker-side.
    harden(spark)
    try:
        spark.dataSource.register(IntGenDataSource)
    except Exception:  # already registered in this session
        pass
    gen = (
        spark.read.format("intgen")
        .option("n", 100000)
        .option("numPartitions", 8)
        .load()
    )
    return gen.groupBy((F.col("val") % 10).alias("val_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("id_sum"),
        F.max("val").alias("val_max"),
    )


@register(
    "xml_source_agg",
    tags=("A7", "B1"),
    oracle="""
        SELECT r_regionkey, count(*) AS n_regions, min(r_name) AS first_name
        FROM region
        GROUP BY r_regionkey
    """,
)
def xml_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the region table through XML (A7; Spark 4 ships the
    XML source in core — no external jar), read back with an explicit
    schema, aggregate. Completes the ingest-format matrix next to
    csv/json/orc/avro/parquet: the oracle runs over the parquet view,
    so any XML escaping/typing mangling breaks parity. Same 100 TB
    discipline as the CSV variant: explicit read schema, never
    rowTag inference over the data."""
    path = os.path.join(
        _CSV_CACHE_ROOT, sf_dir.rstrip("/").replace("/", "_"), "region_xml"
    )
    region = tbl(spark, sf_dir, "region")
    region.coalesce(1).write.mode("overwrite").option("rootTag", "regions").option(
        "rowTag", "region"
    ).format("xml").save(path)
    xml = (
        spark.read.schema("r_regionkey long, r_name string")
        .option("rowTag", "region")
        .format("xml")
        .load(path)
    )
    return xml.groupBy("r_regionkey").agg(
        F.count(F.lit(1)).alias("n_regions"), F.min("r_name").alias("first_name")
    )
