"""SUPERSEDED (r16): the input-bytes table this script produced
compared filtered against unfiltered scans, and Spark's stage
`inputBytes` does not count the unfiltered parquet read path (same
wall + records, 25× different bytes — SCALE.md r16). Use
scripts/r16_pq_serve_ab.py, which reports wall / task time / records.
Kept for the round-15 ledger's provenance.

Round-15 measurement — the PQ serve tier's BYTE claim, measured
(VERDICT r14 item 2/"missing #2": SCALE.md r14 recorded single-node
wall-time parity and INFERRED the multi-executor win from per-row
widths — ~80 B/candidate with 16-byte codes vs ~530 B with the full
double vector. This script reads the actual stage metrics).

Method: a UI-enabled session (get_spark disables the UI, so the
session is built here and passed through harden()) exposes Spark's
REST status API; each serve-tier execution is bracketed by cumulative
stage-metric snapshots (shuffle read/write bytes, input bytes, task
time), so the diff is that execution's own traffic — sequential runs,
one session, interleaved reps (CLAUDE.md noise-band rule). Arrow
transfer into the Python workers is not a first-class StageMetric;
the candidate byte volume is additionally estimated from the measured
candidate row count x the Arrow-serialized row width of each tier's
candidate schema, and labeled as the estimate it is.

Usage: python scripts/r15_pq_bytes.py --sf-dir /tmp/sparkgraft/sf100mut
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


def _metrics(ui: str) -> dict:
    """Cumulative stage-metric sums across all completed stages."""
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    out = {"shuffle_read": 0, "shuffle_write": 0, "input": 0, "task_ms": 0}
    for s in stages:
        out["shuffle_read"] += s.get("shuffleReadBytes", 0)
        out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        out["input"] += s.get("inputBytes", 0)
        out["task_ms"] += s.get("executorRunTime", 0)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf100mut")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", type=int, default=50)
    args = ap.parse_args()

    from mr_py_spark.session import harden

    spark = harden(
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]"
        )
        .appName("r15_pq_bytes")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config(
            "spark.sql.warehouse.dir",
            "/tmp/sparkgraft/r15_pq_bytes_warehouse",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    sf = args.sf_dir

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
    print(f"index+codes ready in {time.time()-t0:.1f}s;"
          f" loadavg={os.getloadavg()}", flush=True)

    e = _emb_double(tbl(spark, sf, "embeddings"), "v")
    queries = (
        e.filter(F.col("vec_id") < args.queries)
        .withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("v", "qv")
    )

    # candidate volume at the shared probe setting (48x24), counted
    # once: both tiers visit the SAME cells; only the payload differs.
    cells = _hier_probe_cells(root_cent, leaf_cent, queries, 48, 24)
    n_cand = cells.select("q_id", "bucket", "leaf").join(
        codes, ["bucket", "leaf"]
    ).count()
    # Arrow-serialized per-row width of each tier's candidate payload
    # (estimate: schema width, not a StageMetric — labeled as such)
    dim = len(e.select("v").head()["v"])
    w_exact = 8 + 8 + 8 * dim       # q_id, vec_id, double vector
    w_pq = 8 + 8 + 4 * books.shape[0]  # q_id, vec_id, int32 codes
    print(f"candidates @48x24 for {args.queries} queries: {n_cand}"
          f" (est. candidate payload: exact {n_cand*w_exact/1e6:.1f} MB"
          f" vs pq {n_cand*w_pq/1e6:.1f} MB, {w_exact/w_pq:.1f}x/row)",
          flush=True)

    settings = [
        ("exact 48x24", lambda: hier_topk_with(
            root_cent, leaf_cent, assigned, queries, k=5,
            root_probe=48, leaf_probe=24)),
        ("pq    48x24 r20", lambda: hier_topk_pq_with(
            root_cent, leaf_cent, codes, assigned, queries, books, k=5,
            root_probe=48, leaf_probe=24, rerank=20)),
    ]
    for label, fn in settings:  # warm-up
        fn().write.format("noop").mode("overwrite").save()
    for rep in range(args.reps):
        for label, fn in settings:
            before = _metrics(ui)
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            d = {k: _metrics(ui)[k] - v for k, v in before.items()}
            print(
                f"rep {rep} {label}: wall {wall:.2f}s"
                f" shuffle_read {d['shuffle_read']/1e6:.1f} MB"
                f" shuffle_write {d['shuffle_write']/1e6:.1f} MB"
                f" input {d['input']/1e6:.1f} MB"
                f" task_time {d['task_ms']/1e3:.1f}s",
                flush=True,
            )
    print(f"loadavg end={os.getloadavg()}")
    spark.stop()


if __name__ == "__main__":
    main()
