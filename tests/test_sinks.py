"""Sink tests (B14 partitioned write, B22 bucketed tables)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mr_py_spark.sources import tbl
from mr_py_spark.sources.sinks import write_bucketed, write_partitioned
from tests.conftest import SF_DIR


def test_partitioned_write_roundtrip(spark, tmp_path):
    docs = tbl(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_part")
    write_partitioned(docs, out, "source")
    # hive-style layout on the routing key
    assert any(d.startswith("source=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition pruning: reading one partition touches one directory
    one = back.filter(F.col("source") == "src0")
    expected = docs.filter(F.col("source") == "src0").count()
    assert one.count() == expected


def test_bucketed_join_skips_shuffle(spark):
    orders = tbl(spark, SF_DIR, "orders")
    lineitem = tbl(spark, SF_DIR, "lineitem")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "k"), "t_orders_b", "k", 4)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "k"), "t_lineitem_b", "k", 4)
    # force the sort-merge path (tiny test tables would broadcast, which
    # bypasses bucketing entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed sort-merge join: no shuffle on either side
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
