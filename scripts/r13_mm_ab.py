"""Round-13 scale A/B — standing multimodal indexes vs per-run
recompute (VERDICT r12 item 4's done criterion: sf10 interleaved A/B).

Per family (video / image / audio): build/attach the standing index
(one-time cost reported separately), then interleave reps of the
per-run *_dup_pairs form (decodes every payload per execution) against
the *_dup_pairs_indexed form (bucketed-table scan, zero decode). Use
the MUTATED sf10 fixture: byte-identical document replication would
give every payload ~factor exact twins and the pair output itself
becomes quadratic in the factor (the CLAUDE.md near-dup fixture rule).

Usage: python scripts/r13_mm_ab.py --sf-dir /tmp/sparkgraft/sf10mut [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_py_spark.registry import load_all
from mr_py_spark.session import get_spark


def _run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf10mut")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--families", default="video,image,audio")
    args = ap.parse_args()

    spark = get_spark()
    reg = load_all()
    sf = args.sf_dir

    from mr_py_spark.operators.multimodal import (
        audio_band_index,
        image_band_index,
        video_frame_index,
    )

    builders = {
        "video": video_frame_index,
        "image": image_band_index,
        "audio": audio_band_index,
    }
    for fam in args.families.split(","):
        t0 = time.time()
        builders[fam](spark, sf)
        print(f"{fam}: one-time index build(+attach) {time.time() - t0:.2f} s",
              flush=True)
        for rep in range(args.reps):
            t_rec = _run(reg[f"{fam}_dup_pairs"].fn(spark, sf))
            t_idx = _run(reg[f"{fam}_dup_pairs_indexed"].fn(spark, sf))
            print(
                f"{fam} rep {rep}: recompute {t_rec:.2f} s | indexed {t_idx:.2f} s",
                flush=True,
            )


if __name__ == "__main__":
    main()
