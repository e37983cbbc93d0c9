"""Catalog statistics (CBO) — the durable alternative to join hints.

SCALE.md documents that ``q5_local_supplier``'s supplier-side broadcast
hint is load-bearing: from bare parquet paths the static planner has
only file sizes, estimates a join's output as the product of its
inputs, and therefore plans lineitem⋈supplier as a sort-merge join
(AQE converts it only after lineitem's shuffle map write — measured
15% slower at sf10). On a real deployment the answer is not a hint but
``ANALYZE TABLE … COMPUTE STATISTICS``: with row counts + column NDVs
in the catalog and ``spark.sql.cbo.enabled``, join cardinality
estimation bounds the supplier⋈asia output and the static planner
chooses the broadcast by itself — before any shuffle exists.

This module demonstrates exactly that (verdict r4 item 4):
``register_stats_tables`` registers the fixture parquet as external
catalog tables and ANALYZEs them; ``q5_local_supplier_nohint`` is the
identical q5 plan with every hint removed, reading through the
catalog. tests/test_cbo.py asserts the static planner (AQE disabled)
picks the supplier broadcast with stats and does NOT without them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4, ts_ntz
from mr_py_spark.session import harden

#: Tables q5 touches and the columns worth NDV/min-max stats (join keys
#: + selective filters). TIMESTAMP_NTZ columns (o_orderdate) are
#: deliberately EXCLUDED: Spark's CBO filter estimation has no case for
#: TimestampNTZType and a plan touching an NTZ column WITH column stats
#: dies with scala.MatchError (reproduced on 4.1.x); without column
#: stats the estimator falls back to default selectivity and the
#: row-count/size stats still carry the broadcast decision.
Q5_STATS_COLUMNS = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_regionkey", "n_name"),
    "customer": ("c_custkey", "c_nationkey"),
    "supplier": ("s_suppkey", "s_nationkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_suppkey"),
}
Q5_TABLES = tuple(Q5_STATS_COLUMNS)


def register_stats_tables(
    spark: SparkSession, sf_dir: str, db: str = "mrps_stats"
) -> str:
    """Register fixture parquet files as external catalog tables in
    ``db`` and ANALYZE them (table + all-column statistics). Idempotent.
    Returns the database name. External LOCATION tables never copy or
    mutate the fixture data; stats live in the session catalog (on a
    cluster: the metastore, where one nightly ANALYZE serves every
    reader)."""
    harden(spark)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for t in Q5_TABLES:
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.{t} USING parquet "
            f"LOCATION '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
        cols = ", ".join(Q5_STATS_COLUMNS[t])
        spark.sql(f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS FOR COLUMNS {cols}")
    return db


def q5_local_supplier_nohint(
    spark: SparkSession, sf_dir_or_db: str, via_catalog: bool = True
) -> DataFrame:
    """q5 with ZERO broadcast hints — the plan the CBO must get right on
    its own. Same join shape and arithmetic as the registered
    ``q5_local_supplier`` (operators/joins.py), minus every
    ``F.broadcast``; reads ``spark.table(db.t)`` when ``via_catalog``
    (stats available) else bare parquet paths (the no-stats control)."""

    def t(name: str) -> DataFrame:
        if via_catalog:
            return spark.table(f"{sf_dir_or_db}.{name}")
        harden(spark)
        return spark.read.parquet(f"{sf_dir_or_db.rstrip('/')}/{name}.parquet")

    n = t("nation")
    r = t("region").filter(F.col("r_name") == "ASIA")
    asia = n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    s = t("supplier").join(asia, F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    c = t("customer").join(
        asia.select("n_nationkey"), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey")
    o = t("orders").filter(
        (F.col("o_orderdate") >= ts_ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_ntz("1998-01-01 00:00:00"))
    ).select("o_orderkey", "o_custkey")
    li = t("lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast("decimal(10,4)")
    li_asia = li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
    co = c.join(o, F.col("c_custkey") == F.col("o_custkey"))
    return (
        li_asia.join(
            co,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(dec4("l_extendedprice") * (one - dec4("l_discount"))), 4)
            .cast("double")
            .alias("revenue")
        )
    )
