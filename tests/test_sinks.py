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


def test_asof_over_bucketed_no_exchange(spark):
    """The asof_join docstring's durable-warehouse claim, proven: over
    an events table bucketed by user_id, the as-of window needs no
    exchange — the plan is scan + in-partition sort + window, so the
    repeated-join cost is scan-bound."""
    from pyspark.sql import Window as W

    from mr_py_spark.operators.sql_surface import asof_join

    ev = tbl(spark, SF_DIR, "events")
    write_bucketed(ev, "t_events_b", "user_id", 4)
    b = spark.table("t_events_b")
    tagged = b.filter(F.col("event_type").isin("purchase", "signup")).select(
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias("event_id"),
        "user_id",
        "ts",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("event_id").isNotNull().cast("int"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        tagged.withColumn("last_signup", F.last("signup_ts", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .select("event_id", "user_id", F.col("last_signup").alias("signup_ts"))
    )
    out.collect()  # execute so the AQE-final plan is inspected
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan[:2000]
    assert "Exchange" not in plan, plan[:2000]
    # same answer as the registered shuffle form
    expected = {
        (r.event_id, r.user_id, r.signup_ts)
        for r in asof_join(spark, SF_DIR)
        .select("event_id", "user_id", "signup_ts")
        .collect()
    }
    got = {
        (r.event_id, r.user_id, r.signup_ts)
        for r in out.select(
            "event_id",
            "user_id",
            F.date_format("signup_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        ).collect()
    }
    assert got == expected


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


def test_bucketed_warehouse_rebuilds_on_fixture_regeneration(spark, tmp_path):
    """The warehouse cache is content-stamped: regenerating the source
    fixture at the SAME path must invalidate the cached buckets (a
    stale copy would silently diverge from what every other query and
    the DuckDB oracle read)."""
    import shutil as _sh

    from mr_py_spark.operators.bucketed import _bucketed_table
    from tests.conftest import SF_DIR as _SF

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        _sh.copy(f"{_SF}/{t}.parquet", f"{sf}/{t}.parquet")
    n1 = _bucketed_table(spark, sf, "orders", "o_orderkey").count()
    # regenerate: halve the fixture in place (new size + mtime)
    half = spark.read.parquet(f"{_SF}/orders.parquet").limit(700)
    tmp_out = str(tmp_path / "half")
    half.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = next(p for p in os.listdir(tmp_out) if p.endswith(".parquet"))
    _sh.copy(os.path.join(tmp_out, part), f"{sf}/orders.parquet")
    n2 = _bucketed_table(spark, sf, "orders", "o_orderkey").count()
    assert n1 > 700 and n2 == 700, (n1, n2)
