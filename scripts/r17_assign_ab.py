"""Round-17 interleaved A/B + bit-equality pin for the broadcast-argmax
assignment kernel (VERDICT r16 item 4, guide §4.2): the r16
mapInPandas form (inlined below, verbatim) vs the r17 mapInArrow
zero-copy form (`similarity._ivf_assign_pass`), on the SAME centroid
frame over the SAME vectors, alternating in ONE session.

Reports per-rep wall through the noop sink plus the pass's task time
(executorRunTime of the heaviest stage) via a UI-enabled session, and
asserts the (vec_id -> bucket) assignment maps are IDENTICAL — the
argmax rides the same float64 `m @ cmat.T` dgemm either way, so this
must be exact, not approximate.

Usage: python scripts/r17_assign_ab.py \
          [--sf-dir /tmp/sparkgraft/sf100mut] [--reps 3] [--nroot auto]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def old_assign_pass(cent, vectors, _bc):
    """The r16 mapInPandas kernel, verbatim (with_score=False path)."""
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    cmat0 = np.asarray(
        [r.cv for r in cent.orderBy("cid").collect()], dtype=np.float64
    )
    b_cmat = _bc(spark, cmat0)

    def gen(batches):
        cmat = np.asarray(b_cmat.value, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray(list(pdf["v"]), dtype=np.float64)
            sims = m @ cmat.T
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "bucket": sims.argmax(1).astype(np.int64),
                    "v": pdf["v"],
                }
            )

    return vectors.mapInPandas(gen, "vec_id long, bucket long, v array<double>")


def _stage_task_time(ui: str, since_stage: int) -> tuple[int, float]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    new = [s for s in stages if s["stageId"] > since_stage]
    if not new:
        return since_stage, 0.0
    heaviest = max(new, key=lambda s: s.get("executorRunTime", 0))
    top = max(s["stageId"] for s in stages)
    return top, heaviest.get("executorRunTime", 0) / 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf100mut")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mr_py_spark.session import harden
    from mr_py_spark.operators.similarity import (
        _bc,
        _emb_double,
        _ivf_centroids,
        ivf_assign_with,
    )
    from mr_py_spark.operators.hier import _hier_nroot
    from mr_py_spark.sources import tbl

    spark = harden(
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]"
        )
        .appName("r17-assign-ab")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"

    e = _emb_double(tbl(spark, args.sf_dir, "embeddings"), "v")
    n = e.count()
    nroot = _hier_nroot(n)
    print(f"n={n} nroot={nroot} loadavg={os.getloadavg()}", flush=True)
    cents = _ivf_centroids(spark, e, nroot)
    cent = spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(cents)],
        "cid long, cv array<double>",
    )

    last_stage = -1
    walls = {"old": [], "new": []}
    ttimes = {"old": [], "new": []}
    for rep in range(args.reps):
        for side in ("old", "new"):
            df = (
                old_assign_pass(cent, e, _bc)
                if side == "old"
                else ivf_assign_with(cent, e)
            )
            spark.sparkContext.setJobDescription(f"assign-{side}-{rep}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            last_stage, tt = _stage_task_time(ui, last_stage)
            walls[side].append(wall)
            ttimes[side].append(tt)
            print(
                f"rep {rep} {side}: wall {wall:6.1f}s  task-time {tt:8.1f}s",
                flush=True,
            )
    for side in ("old", "new"):
        print(
            f"{side}: best wall {min(walls[side]):.1f}s  "
            f"best task-time {min(ttimes[side]):.1f}s",
            flush=True,
        )

    # bit-equality: identical (vec_id -> bucket) maps
    from pyspark.sql import functions as F

    a = old_assign_pass(cent, e, _bc).select("vec_id", "bucket")
    b = ivf_assign_with(cent, e).select("vec_id", "bucket")
    diff = a.join(b, "vec_id").filter(a["bucket"] != b["bucket"]).count()
    na, nb = a.count(), b.count()
    print(f"bit-equality: {na} vs {nb} rows, {diff} bucket mismatches", flush=True)
    assert na == nb and diff == 0
    print("ASSIGNMENTS BIT-IDENTICAL", flush=True)
    print(f"loadavg end={os.getloadavg()}")
    spark.stop()


if __name__ == "__main__":
    main()
