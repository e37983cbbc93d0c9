"""Round-16 serve-tier measurement, superseding the byte table in
scripts/r15_pq_bytes.py (VERDICT r15 item 1 follow-through).

Two corrections to the r15 method, both found while landing the
candidate-scan prune:

1. **`inputBytes` is NOT comparable across scans that differ in pushed
   filters.** Measured on the 822 MB hier_assign_full table (2M rows):
   an UNFILTERED full scan decodes all 2,000,000 records in the same
   ~5 s wall as a filtered one but reports 20.9 MB input, while the
   same scan under a 483-value `isin` reports 527 MB — the unfiltered
   parquet read path bypasses the FS-statistics stream the metric
   sums. The r15 table compared a filtered (exact tier) against an
   unfiltered (pq tier) pipeline, so its "6.6× more input" was an
   accounting artifact, not bytes. This script reports WALL, TASK
   TIME, and RECORDS as the primary signals and labels inputBytes
   comparisons as filtered-vs-filtered only.

2. **The probed-root `isin` prune is shape-dependent.** At the r15
   parity shape (50 queries × 48 root probes) the probed set covers
   483 of 488 roots — NO scan prune is possible for any tier, so the
   r16 candidate-scan isin (hier.py) is measured at BOTH that shape
   and a latency shape (5 queries × 8 probes, ~8% of roots) where the
   prune has room to act.

Also records the standing-table FILE COUNTS: the r15 spread=nroot
build layout leaked its 488 partitions into the bucketed writes
(~9,000 files per 2M standing table ≈ 27 MB of footers + 9k file opens
per scan); write_bucketed now aligns writes to the bucket spec (one
file per bucket per write — sinks.py r16).

Usage: python scripts/r16_pq_serve_ab.py [--sf-dir /tmp/sparkgraft/sf100mut]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _stages(ui: str) -> list:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf100mut")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from mr_py_spark.session import harden

    spark = harden(
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]"
        )
        .appName("r16_pq_serve_ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        # get_spark sets this for the product sessions; this script
        # builds its own UI-enabled session, so mirror it (the In
        # pushdown the probed-root isin depends on — session.py r16)
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
        .config(
            "spark.sql.warehouse.dir",
            "/tmp/sparkgraft/r16_pq_serve_warehouse",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    sf = args.sf_dir

    from mr_py_spark.operators.bucketed import _table_location
    from mr_py_spark.operators.hier import (
        _hier_pq_books,
        _hier_probe_cells,
        hier_index,
        hier_pq_codes,
        hier_topk_pq_with,
        hier_topk_with,
    )
    from mr_py_spark.operators.similarity import _emb_double
    from mr_py_spark.sources import tbl

    t0 = time.time()
    root_cent, leaf_cent, assigned = hier_index(spark, sf)
    books = _hier_pq_books(spark, sf)
    codes = hier_pq_codes(spark, sf, assigned, books)
    codes.count()
    print(
        f"index+codes ready in {time.time()-t0:.1f}s;"
        f" loadavg={os.getloadavg()}",
        flush=True,
    )
    for t in ("mrps_bkt_hier_assign_full", "mrps_bkt_hier_pq_codes"):
        full = next(
            n for n in spark.catalog.listTables() if n.name.startswith(t)
        ).name
        loc = _table_location(spark, full)
        n_files = sum(
            1
            for _, _, fs in os.walk(loc)
            for f in fs
            if f.endswith(".parquet")
        )
        size = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(loc)
            for f in fs
        )
        print(f"{t}: {n_files} files, {size/1e6:.0f} MB", flush=True)

    e = _emb_double(tbl(spark, sf, "embeddings"), "v")
    nroot = root_cent.count()

    def q_of(n_q: int):
        return (
            e.filter(F.col("vec_id") < n_q)
            .withColumnRenamed("vec_id", "q_id")
            .withColumnRenamed("v", "qv")
        )

    shapes = [("parity 50q 48x24 r20", 50, 48, 24), ("latency 5q 8x8 r20", 5, 8, 8)]
    for label, n_q, rp, lp in shapes:
        queries = q_of(n_q)
        probed = (
            _hier_probe_cells(root_cent, leaf_cent, queries, rp, lp)
            .select("bucket")
            .distinct()
            .count()
        )
        print(f"-- {label}: probed {probed}/{nroot} roots", flush=True)
        tiers = [
            (
                "exact",
                lambda q=queries, a=rp, b=lp: hier_topk_with(
                    root_cent, leaf_cent, assigned, q,
                    k=5, root_probe=a, leaf_probe=b,
                ),
            ),
            (
                "pq   ",
                lambda q=queries, a=rp, b=lp: hier_topk_pq_with(
                    root_cent, leaf_cent, codes, assigned, q, books,
                    k=5, root_probe=a, leaf_probe=b, rerank=20,
                ),
            ),
        ]
        for name, fn in tiers:  # warm-up
            fn().write.format("noop").mode("overwrite").save()
        for rep in range(args.reps):
            for name, fn in tiers:
                seen = {s["stageId"] for s in _stages(ui)}
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                new = [s for s in _stages(ui) if s["stageId"] not in seen]
                ib = sum(s.get("inputBytes", 0) for s in new)
                ir = sum(s.get("inputRecords", 0) for s in new)
                tt = sum(s.get("executorRunTime", 0) for s in new)
                print(
                    f"rep {rep} {name} {label}: wall {wall:6.2f}s"
                    f" task_time {tt/1e3:7.1f}s input_records {ir:>9}"
                    f" input(filtered-only) {ib/1e6:8.1f} MB",
                    flush=True,
                )
    print(f"loadavg end={os.getloadavg()}", flush=True)


if __name__ == "__main__":
    main()
