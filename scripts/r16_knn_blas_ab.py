"""sf1 knn_selfjoin variance A/B (VERDICT r15 item 5): worker BLAS
threads 1 (shipped default, session.py r16) vs unpinned (the r15
behavior — this container's OpenBLAS runs a thread per core per
process, so 32 concurrent Arrow-cogroup workers oversubscribed ~1k
BLAS threads for a measured ~1.25× single-matmul gain).

Interleaved across alternating sessions (env is session-static):
A(pinned), B(unpinned), A, B, ... reps within each session too, so
both in-session spread and cross-session band shift are visible.

Usage: python scripts/r16_knn_blas_ab.py [--sf-dir /tmp/sparkgraft/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_session(pinned: bool, sf: str, reps: int) -> list[float]:
    os.environ["SPARK_GRAFT_WORKER_BLAS_THREADS"] = (
        "1" if pinned else str(os.cpu_count() or 32)
    )
    from mr_py_spark.session import get_spark
    from mr_py_spark.operators.similarity import knn_selfjoin

    spark = get_spark("r16_knn_blas_ab")
    spark.sparkContext.setLogLevel("ERROR")
    walls = []
    knn_selfjoin(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    for _ in range(reps):
        t0 = time.time()
        knn_selfjoin(spark, sf).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    spark.stop()
    return walls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    out = {"pinned": [], "unpinned": []}
    for rnd in range(args.rounds):
        for label, pinned in (("pinned", True), ("unpinned", False)):
            walls = run_session(pinned, args.sf_dir, args.reps)
            out[label].extend(walls)
            print(
                f"round {rnd} {label:9s}: "
                + " ".join(f"{w:6.2f}" for w in walls)
                + f"  loadavg={os.getloadavg()[0]:.1f}",
                flush=True,
            )
    for label, walls in out.items():
        print(
            f"{label:9s}: best {min(walls):.2f} worst {max(walls):.2f}"
            f" spread {max(walls)/min(walls):.2f}x over {len(walls)} reps"
        )


if __name__ == "__main__":
    main()
