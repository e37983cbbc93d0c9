#!/usr/bin/env python
"""DuckDB baseline for the bench queries, same protocol as bench.py
(one warm-up, best of N_RUNS), over any fixture dir. The query texts
are the registry's own oracle SQL — the exact statements the driver
uses for correctness — so the two engines run semantically identical
queries.

Usage: python scripts/duckdb_baseline.py [sf_dir]
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, N_RUNS  # noqa: E402
from mr_py_spark.registry import load_all  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skip = set(os.environ.get("SKIP_QUERIES", "").split(",")) - {""}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    reg = load_all()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        sql = reg[name].oracle
        if sql is None or name in skip:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        first = time.perf_counter() - t0
        if first >= 5.0:
            # long query: cold ~= warm, one measured run is enough
            timings[name] = round(first, 4)
            continue
        best = float("inf")  # `first` was the warm-up
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
