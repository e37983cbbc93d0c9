"""Round-12 profile of dedup_containment at sf100mut (VERDICT r12
item 6): which stages spill, how much, and whether reps degrade.

Runs the registered query N times in one session (UI enabled so the
REST API exposes per-stage shuffle/spill metrics), then prints the
top stages by spill and by shuffle write for each rep.

Usage: python scripts/r12_containment_profile.py --sf-dir /tmp/sparkgraft/sf100mut --reps 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import SparkSession

from mr_py_spark.registry import load_all
from mr_py_spark.session import _RUNTIME_CONFS, harden


def get_spark_ui(cpus: int = 32) -> SparkSession:
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r12-containment-profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config(
            "spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="mrps_warehouse_")
        )
    )
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return harden(spark)


def stage_metrics(ui: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf100mut")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--query", default="dedup_containment")
    args = ap.parse_args()

    spark = get_spark_ui()
    ui = spark.sparkContext.uiWebUrl
    reg = load_all()
    seen: set[int] = set()
    for rep in range(args.reps):
        t0 = time.time()
        df = reg[args.query].fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        stages = [s for s in stage_metrics(ui) if s["stageId"] not in seen]
        seen.update(s["stageId"] for s in stages)
        print(f"\n=== rep {rep}: {wall:.1f} s ===")
        stages.sort(key=lambda s: -(s.get("diskBytesSpilled", 0)))
        for s in stages[:6]:
            print(
                f"  stage {s['stageId']:>3} tasks={s['numCompleteTasks']:<4}"
                f" spillMem={s.get('memoryBytesSpilled', 0)/2**30:6.1f}G"
                f" spillDisk={s.get('diskBytesSpilled', 0)/2**30:6.1f}G"
                f" shufW={s.get('shuffleWriteBytes', 0)/2**30:6.1f}G"
                f" shufR={s.get('shuffleReadBytes', 0)/2**30:6.1f}G"
                f" in={s.get('inputBytes', 0)/2**30:6.1f}G"
                f" t={s.get('executorRunTime', 0)/1000:7.0f}s  {s['name'].split(chr(10))[0][:60]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
