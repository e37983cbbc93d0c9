"""Round-15 measurement — WHERE the hier index build's 2M->8M growth
lives (VERDICT r14 item 5: 78.7 s -> 536.4 s is 6.8x for 4x the data
on a width-constant design; determine whether leaf training is
compute-bound — fine on one 32-core node — or GROUP-SKEWED, which
k_leaf-weighted group packing could fix).

Method: the three build phases are timed separately against a
UI-enabled session, exactly as the production builders compose them
(hier_index's _bucketed_table builders re-derive the root assignment
per phase, so the phase timings here match what a fresh build pays);
after each phase the REST status API attributes the window's stages,
and the heaviest stage's per-task run-time QUANTILES are fetched —
max/median task time is the skew verdict: ~1 means compute-bound
across even groups, >>1 means a few hot root groups serialize the
stage.

Usage: python scripts/r15_hier_profile.py --sf-dir /tmp/sparkgraft/sf100mut
       python scripts/r15_hier_profile.py --sf-dir /tmp/sparkgraft/sf400mut
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


def _stages(ui: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )


def _task_quantiles(ui: str, stage_id: int, attempt: int) -> list[float]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    q = "0.0,0.5,0.95,1.0"
    s = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages/{stage_id}/{attempt}"
            f"/taskSummary?quantiles={q}"
        )
    )
    return s.get("executorRunTime", [])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf100mut")
    args = ap.parse_args()

    from mr_py_spark.session import harden

    spark = harden(
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]"
        )
        .appName("r15_hier_profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config(
            "spark.sql.warehouse.dir",
            "/tmp/sparkgraft/r15_hier_profile_warehouse",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    sf = args.sf_dir

    from mr_py_spark.operators.hier import (
        _hier_nroot,
        hier_assign,
        hier_leaf_centroids,
    )
    from mr_py_spark.operators.similarity import (
        _emb_double,
        _ivf_centroids,
        ivf_assign_with,
    )
    from mr_py_spark.sources import tbl
    from mr_py_spark.util import table_rows

    e = _emb_double(tbl(spark, sf, "embeddings"), "v")
    n = table_rows(e, sf, "embeddings")
    nroot = min(_hier_nroot(n), max(1, n))
    print(f"n={n} nroot={nroot} loadavg={os.getloadavg()}", flush=True)

    def phase(label: str, fn):
        seen = {(s["stageId"], s["attemptId"]) for s in _stages(ui)}
        t0 = time.time()
        out = fn()
        wall = time.time() - t0
        new = [
            s for s in _stages(ui)
            if (s["stageId"], s["attemptId"]) not in seen
        ]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"== {label}: wall {wall:.1f}s, {len(new)} stages", flush=True)
        for s in new[:4]:
            qs = _task_quantiles(ui, s["stageId"], s["attemptId"])
            skew = (
                f" task p0/p50/p95/max = "
                + "/".join(f"{v/1e3:.1f}s" for v in qs)
                + (f" (max/p50 {qs[-1]/max(qs[1],1):.1f}x)" if qs else "")
            ) if qs else ""
            print(
                f"   stage {s['stageId']} ({s['name'].split()[0]}):"
                f" task_time {s.get('executorRunTime',0)/1e3:.1f}s"
                f" tasks {s.get('numCompleteTasks')}{skew}",
                flush=True,
            )
        return out

    # phase 1: root centroid training (bounded-sample k-means)
    root_cent = phase("root train", lambda: spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in
         enumerate(_ivf_centroids(spark, e, nroot))],
        "cid long, cv array<double>",
    ))
    # phase 2: per-root leaf training (ONE applyInPandas pass), incl.
    # the root-assignment recompute exactly like the production builder
    # (spread=nroot is the r15 skew fix the builders now pass)
    def build_leaf():
        lc = hier_leaf_centroids(
            ivf_assign_with(root_cent, e), spread=nroot
        ).persist()
        lc.count()
        return lc

    leaf_cent = phase("leaf train (incl. root assign)", build_leaf)
    # phase 3: full-corpus cell assignment (cogroup on root bucket)
    phase(
        "assign (incl. root assign)",
        lambda: hier_assign(ivf_assign_with(root_cent, e), leaf_cent, spread=nroot)
        .write.format("noop").mode("overwrite").save(),
    )
    print(f"loadavg end={os.getloadavg()}")
    spark.stop()


if __name__ == "__main__":
    main()
