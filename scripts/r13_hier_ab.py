"""Round-13 scale A/B — hierarchical vs flat semantic standing index
(VERDICT r12 item 1's done criterion: an sf100 interleaved A/B showing
occupancy and per-snapshot triage time flat where the flat quantizer's
grow).

Per sf dir: build/attach both standing corpus indexes (one-time costs
reported separately), print the occupancy audit (the flat index's mean
bucket occupancy vs the hierarchical index's mean CELL occupancy),
then interleave reps of the two registered delta-triage queries —
``incremental_semantic_dedup`` (flat coarse buckets, pair work grows
with bucket occupancy past the 4096-centroid cap) and
``incremental_semantic_dedup_hier`` (two-level cells, pair work pinned
at the ~64-row leaf grain at any n). Only same-session interleaved
pairs are evidence (CLAUDE.md noise-band rule).

Usage: python scripts/r13_hier_ab.py --sf-dir /tmp/sparkgraft/sf100 [--reps 3]
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
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf100")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark()
    reg = load_all()
    sf = args.sf_dir

    from mr_py_spark.operators.hier import hier_corpus_index
    from mr_py_spark.operators.similarity import ivf_corpus_index

    t0 = time.time()
    ivf_corpus_index(spark, sf)
    print(f"one-time flat IVF corpus index build(+attach): {time.time() - t0:.2f} s",
          flush=True)
    t0 = time.time()
    hier_corpus_index(spark, sf)
    print(f"one-time hier corpus index build(+attach):     {time.time() - t0:.2f} s",
          flush=True)

    for r in reg["hier_index_occupancy"].fn(spark, sf).collect():
        print(
            f"occupancy {r['index']}: n_vecs={r['n_vecs']} "
            f"n_cells={r['n_cells']} mean={r['mean_occ']:.1f} "
            f"max={r['max_occ']}",
            flush=True,
        )

    for rep in range(args.reps):
        t_flat = _run(reg["incremental_semantic_dedup"].fn(spark, sf))
        t_hier = _run(reg["incremental_semantic_dedup_hier"].fn(spark, sf))
        print(
            f"rep {rep}: flat triage {t_flat:.2f} s | hier triage {t_hier:.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
