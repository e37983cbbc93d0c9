#!/usr/bin/env python
"""Warehouse-layout demonstration for the q5 join shape (SCALE.md r4).

Measures TPC-H-Q5-shaped revenue-by-nation three ways at a given
fixture dir (default /tmp/sparkgraft/sf10 — generate with
scripts/gen_sf.py):

1. plain      — the registered layout-agnostic plan over raw parquet
                (ASIA pruned before the fact joins, AQE broadcasts);
2. bucketed   — lineitem+orders bucketed by orderkey only: measured
                SLOWER, because the final join's equi-keys are the
                composite (orderkey, nationkey) and a single-key
                bucket layout satisfies neither side;
3. denorm     — the layout a daily-run q5 would use at 100 TB:
                customer nation denormalized into orders at ingest
                (one join at write time), both facts bucketed by
                orderkey; the bucket alignment then satisfies the
                composite-key clustering (hash on a subset of the
                join keys clusters them) and the query drops its big
                shuffles. ~1.5x the plain plan at sf10.

Each variant's revenue rows are asserted identical. Prints one JSON
line per variant. Bucketed tables live in the session's in-memory
catalog — the warehouse dir holds only data files and is safe to
delete afterwards.

Usage: python scripts/layout_demo.py [sf_dir] [warehouse_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4, ts_ntz
from mr_py_spark.session import harden

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
BUCKETS = 32


def _asia_dims(spark: SparkSession, sf: str):
    n = spark.read.parquet(f"{sf}/nation.parquet")
    r = spark.read.parquet(f"{sf}/region.parquet").filter(F.col("r_name") == "ASIA")
    asia = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    s = (
        spark.read.parquet(f"{sf}/supplier.parquet")
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return asia, s


def _revenue(joined):
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(
                dec4("l_extendedprice")
                * (F.lit(1).cast("decimal(10,4)") - dec4("l_discount"))
            ),
            4,
        )
        .cast("double")
        .alias("revenue")
    )


def q5_plain(spark: SparkSession, sf: str):
    from mr_py_spark.registry import load_all

    return load_all()["q5_local_supplier"].fn(spark, sf)


def q5_bucketed(spark: SparkSession, sf: str):
    asia, s = _asia_dims(spark, sf)
    c = (
        spark.read.parquet(f"{sf}/customer.parquet")
        .join(
            F.broadcast(asia.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey")
    )
    o = spark.table("li_demo_orders").filter(
        (F.col("o_orderdate") >= ts_ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_ntz("1998-01-01 00:00:00"))
    )
    li_asia = spark.table("li_demo_lineitem").join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    )
    co = c.join(o, F.col("c_custkey") == F.col("o_custkey"))
    return _revenue(
        li_asia.join(
            co,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )


def q5_denorm(spark: SparkSession, sf: str):
    _, s = _asia_dims(spark, sf)
    oe = spark.table("li_demo_orders_denorm").filter(
        (F.col("o_orderdate") >= ts_ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_ntz("1998-01-01 00:00:00"))
    )
    li_asia = spark.table("li_demo_lineitem").join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    )
    return _revenue(
        li_asia.join(
            oe,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft/sf10"
    wh = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft/layout_wh"
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.warehouse.dir", wh)
        # 32 concurrent bucket writers over a GB-scale fact need real
        # heap; only effective when this process launches the JVM.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .getOrCreate()
    )
    harden(spark)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    li.write.mode("overwrite").bucketBy(BUCKETS, "l_orderkey").sortBy(
        "l_orderkey"
    ).format("parquet").saveAsTable("li_demo_lineitem")
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    o.write.mode("overwrite").bucketBy(BUCKETS, "o_orderkey").sortBy(
        "o_orderkey"
    ).format("parquet").saveAsTable("li_demo_orders")
    c = spark.read.parquet(f"{sf}/customer.parquet").select("c_custkey", "c_nationkey")
    oe = o.join(c, F.col("c_custkey") == F.col("o_custkey")).select(
        "o_orderkey", "o_orderdate", "c_nationkey"
    )
    oe.write.mode("overwrite").bucketBy(BUCKETS, "o_orderkey").sortBy(
        "o_orderkey"
    ).format("parquet").saveAsTable("li_demo_orders_denorm")
    ingest_s = round(time.perf_counter() - t0, 1)

    variants = {"plain": q5_plain, "bucketed": q5_bucketed, "denorm": q5_denorm}
    expect = None
    for name, fn in variants.items():
        rows = sorted((r.n_name, r.revenue) for r in fn(spark, sf).collect())
        if expect is None:
            expect = rows
        assert rows == expect, f"{name} diverged from plain"
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(N_RUNS):
            t1 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t1)
        print(
            json.dumps(
                {
                    "variant": name,
                    "best_sec": round(min(ts), 3),
                    "runs": [round(x, 2) for x in ts],
                    "one_time_ingest_sec": ingest_s if name != "plain" else 0,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
