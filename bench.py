#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method: one warm-up execution per query (JIT, code cache, broadcast
build), then best of 3 timed runs. Plans are executed with the `noop`
sink so the full physical plan runs without driver-side result
transfer skewing the numbers. The query set mirrors BASELINE.md's
DuckDB-measured rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "topk_window",
    "distinct_agg",
    "wordcount",
    "knn_selfjoin",
    "tumbling_window",
]

# Best-of-N timed runs after one warm-up. Override for large scale
# factors where a single execution is already seconds-long and
# run-to-run variance is negligible relative to the runtime.
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mr_py_spark.registry import load_all
    from mr_py_spark.session import get_spark

    spark = get_spark("mr_py_spark-bench")
    reg = load_all()

    def execute(name: str) -> None:
        df = reg[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    # Skip list for large-sf runs (mirrors duckdb_baseline's
    # SKIP_QUERIES): e.g. exact knn is O(n^2)-inherent and excluded at
    # sf >= 1 on both engines. The driver sets no env, so its per-round
    # sf0.1 run is unaffected.
    skip = set(os.environ.get("SPARK_GRAFT_SKIP", "").split(",")) - {""}

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name in skip:
            continue
        execute(name)  # warm-up
        best = min(
            (lambda t0: (execute(name), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(N_RUNS)
        )
        timings[name] = round(best, 4)

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None  # non-standard dir name; don't discard the timings over it
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
