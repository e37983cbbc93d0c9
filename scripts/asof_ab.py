#!/usr/bin/env python
"""Interleaved A/B for the as-of join at scale (verdict r6 item 6).

Arms, launched round-robin in ONE session (the repo's variance rule:
only interleaved same-session comparisons are evidence):

  single  - the registered asof_join: ONE events scan, conditional
            tag projection, window over user_id
  union   - the pre-r7 textbook form: two filtered scans + unionByName
            into the same window (kept here as the A/B control)
  duckdb  - DuckDB's native ASOF LEFT JOIN (the oracle SQL)

Spark arms execute via the noop sink (bench.py protocol); DuckDB via
fetchall. One warm-up round, then N_ROUNDS interleaved timed rounds,
min per arm reported.

Usage: python scripts/asof_ab.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def union_form(spark, sf_dir):
    """The pre-r7 two-scan union expression (A/B control)."""
    from mr_py_spark.sources import tbl
    from mr_py_spark.functions import fmt_ts

    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup")
    tagged = purchases.select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp_ntz").alias("signup_ts")
    ).unionByName(
        signups.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.col("ts").alias("signup_ts"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("event_id").isNotNull().cast("int"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("last_signup", F.last("signup_ts", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .select("event_id", "user_id", fmt_ts("last_signup").alias("signup_ts"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft/sf10"
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from mr_py_spark.registry import load_all
    from mr_py_spark.session import get_spark
    from mr_py_spark.operators.sql_surface import asof_join

    spark = get_spark("asof-ab")
    reg = load_all()
    oracle_sql = reg["asof_join"].oracle

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )

    def run_single():
        asof_join(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_union():
        union_form(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_duckdb():
        con.execute(oracle_sql).fetchall()

    arms = {"single": run_single, "union": run_union, "duckdb": run_duckdb}
    best: dict[str, float] = {}
    for rnd in range(n_rounds + 1):  # round 0 = warm-up
        for name, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            tag = "warmup" if rnd == 0 else f"round{rnd}"
            print(f"  {tag} {name}: {dt:.2f}s", flush=True)
            if rnd > 0:
                best[name] = min(best.get(name, float("inf")), dt)

    print(json.dumps({"sf_dir": sf_dir, "best": {k: round(v, 3) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
