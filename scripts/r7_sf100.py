#!/usr/bin/env python
"""Timed noop-sink runs of the round-7 operators at a scale fixture.

Same protocol as the round-6 sf100 paragraph in SCALE.md: one warm-up
run, one timed run per operator, executed solo (no interleaving — these
are absolute linearity checks, not cross-engine ratios).

Usage: python scripts/r7_sf100.py [sf_dir] [comma-separated-names]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_NAMES = "heavy_hitters,cosine_dup_clusters,asof_join"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft/sf100"
    names = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT_NAMES).split(",")

    from mr_py_spark.registry import load_all
    from mr_py_spark.session import get_spark

    spark = get_spark("r7-sf100")
    reg = load_all()
    timed: dict[str, float] = {}
    for name in names:
        fn = reg[name].fn
        for tag in ("warmup", "timed"):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"  {name} {tag}: {dt:.2f}s", flush=True)
        timed[name] = round(dt, 2)
    print(json.dumps({"sf_dir": sf_dir, "timed": timed}))


if __name__ == "__main__":
    main()
