"""Columnar/memory/codegen knob A/B on the scan-floor queries
(verdict r5 item 4).

Rounds 4-5 profiled the five >2x-of-DuckDB headline queries down to a
per-core parquet-scan/aggregation floor with no plan defect left. The
remaining free knobs that could plausibly move an engine floor:

  batch   spark.sql.parquet.columnarReaderBatchSize 4096 -> 16384
          (fewer reader loop iterations per scan, larger columnar
          batches through whole-stage codegen)
  offheap spark.memory.offHeap.enabled + 16g (Tungsten buffers out of
          the JVM heap; static conf, needs its own JVM)
  vecagg  spark.sql.codegen.aggregate.map.vectorized.enable (the
          vectorized first-level hash map in codegen'd HashAggregate)

Off-heap is a STATIC conf, so each arm runs in its own subprocess JVM;
arms are launched interleaved (A,B,C,D, A,B,C,D, ...) and each
subprocess does one warm-up plus best-of-3 via the noop sink, exactly
bench.py's method. Only same-session relative deltas are meaningful
(CLAUDE.md: +-30% cross-session machine-load variance), which the
interleaving approximates at subprocess granularity.

Usage:
  python scripts/knob_ab.py [--sf-dir /tmp/sparkgraft/sf10] [--rounds 2]
  python scripts/knob_ab.py --worker --conf k=v ... --sf-dir D   # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["q1_pricing_summary", "distinct_agg", "tumbling_window"]

ARMS: dict[str, dict[str, str]] = {
    "baseline": {},
    "batch16k": {"spark.sql.parquet.columnarReaderBatchSize": "16384"},
    "offheap": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "16g",
    },
    "vecagg": {"spark.sql.codegen.aggregate.map.vectorized.enable": "true"},
}


def worker(sf_dir: str, confs: dict[str, str]) -> None:
    from pyspark.sql import SparkSession

    from mr_py_spark.registry import load_all
    from mr_py_spark.session import harden

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("knob_ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    harden(spark)
    reg = load_all()

    def execute(name: str) -> None:
        df = reg[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in QUERIES:
        execute(name)  # warm-up
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            execute(name)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    print("RESULT " + json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf10")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    if args.worker:
        worker(args.sf_dir, dict(c.split("=", 1) for c in args.conf))
        return

    results: dict[str, dict[str, list[float]]] = {
        a: {q: [] for q in QUERIES} for a in ARMS
    }
    for rnd in range(args.rounds):
        for arm, confs in ARMS.items():
            cmd = [
                sys.executable,
                os.path.abspath(__file__),
                "--worker",
                "--sf-dir",
                args.sf_dir,
            ]
            for k, v in confs.items():
                cmd += ["--conf", f"{k}={v}"]
            proc = subprocess.run(
                cmd, capture_output=True, text=True, cwd=REPO
            )
            line = next(
                (
                    ln
                    for ln in proc.stdout.splitlines()
                    if ln.startswith("RESULT ")
                ),
                None,
            )
            if line is None:
                print(
                    f"# arm {arm} round {rnd} FAILED:\n{proc.stderr[-2000:]}",
                    file=sys.stderr,
                )
                continue
            timing = json.loads(line[len("RESULT ") :])
            for q, t in timing.items():
                results[arm][q].append(t)
            print(f"# round {rnd} {arm}: {timing}", file=sys.stderr)

    summary = {
        arm: {q: (min(ts) if ts else None) for q, ts in byq.items()}
        for arm, byq in results.items()
    }
    print(json.dumps({"sf_dir": args.sf_dir, "best": summary, "all": results}))


if __name__ == "__main__":
    main()
