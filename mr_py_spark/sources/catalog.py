"""Table catalog over the driver parquet fixtures (A7 — scans).

The reference engine reads text lines and parses ad hoc inside each
mapper (SURVEY.md §1.1 [HS]); our canonical source is columnar parquet
with a typed schema, so predicate pushdown and column pruning reach the
scan (check with ``df.explain``: PushedFilters / ReadSchema).

Scale notes: each table is one parquet file locally, but nothing here
assumes that — ``spark.read.parquet`` takes directories/globs, and the
events nanosecond normalization is a per-row projection that runs
wherever the scan runs. At 100 TB you would point the same loader at a
partitioned directory tree and get partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.session import harden

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def _catalog_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame | None:
    """Opt-in CBO path (verdict r5 item 5): when SPARK_GRAFT_USE_CATALOG
    names a database populated by ``stats.register_stats_tables``,
    ``tbl`` serves ``spark.table(db.name)`` so every registered query
    reads through the catalog and the static planner sees ANALYZE'd
    row-count/NDV statistics — the deployed form of the hint-free q5
    plan SCALE.md measured beating the broadcast hint at sf10.

    Safety: the table's registered Location must point at THIS sf_dir's
    parquet (a db ANALYZE'd at sf0.01 must never serve an sf0.1 query);
    any mismatch, missing table, or lookup error falls back to the
    parquet path. ``events`` is excluded — its TIMESTAMP(NANOS) column
    needs the nanosAsLong normalization below, which a bare catalog
    read bypasses."""
    db = os.environ.get("SPARK_GRAFT_USE_CATALOG")
    if not db or name == "events":
        return None
    expected = f"{sf_dir.rstrip('/')}/{name}.parquet"
    try:
        detail = spark.sql(f"DESCRIBE FORMATTED {db}.{name}").collect()
        loc = next((r.data_type for r in detail if r.col_name == "Location"), None)
        if loc is None or not loc.rstrip("/").endswith(expected):
            return None
        return spark.table(f"{db}.{name}")
    except Exception:
        return None


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with normalized types.

    Loaded plans are cached ON the session object (DataFrames are plans,
    not data — this only avoids re-listing files and re-reading footers
    per query). Keying by the session itself, not id(spark), means the
    cache dies with the session and a recycled object address can never
    serve plans bound to a stopped SparkContext.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    cache: dict[tuple[str, str, str], DataFrame] = spark.__dict__.setdefault(
        "_mrps_tbl_cache", {}
    )
    key = (os.environ.get("SPARK_GRAFT_USE_CATALOG", ""), sf_dir.rstrip("/"), name)
    if key in cache:
        return cache[key]
    harden(spark)  # nanosAsLong + UTC + AQE; driver sessions lack these
    df = _catalog_table(spark, sf_dir, name)
    if df is None:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) surfaced as long via nanosAsLong: truncate to
        # micros (matching DuckDB's read of the same file) as TIMESTAMP_NTZ.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    cache[key] = df
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table (lazy plans; no data is read)."""
    return {name: tbl(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry point.

    `spark.sql(...)` over these views and the DataFrame API produce the
    same Catalyst plans; the SQL surface is first-class in this engine
    (the reference has no declarative layer at all, SURVEY.md §3).
    """
    for name, df in load(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """SQL entry point: run ANSI SQL over the fixture tables."""
    register_views(spark, sf_dir)
    return spark.sql(query)
