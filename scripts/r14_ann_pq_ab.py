"""Round-14 scale A/B — ADC pre-rank (knn_hier_pq_topk_indexed) vs the
exact hier serve tier, on the honest mutated fixture.

The claim under test (VERDICT r13 item 6): all-neighbor recall's only
knob was probes, and probes paid LINEARLY in 512-byte full-vector
candidates (r13 sweep: 0.572@12x12/9.2k cands -> 0.772@48x24). The PQ
tier makes wider probes affordable — candidate rows carry 16 one-byte
codes (~80 B/row with keys vs ~530 B), ADC is one Arrow gather+sum per
candidate, and only the ADC top rerank*k per query touch full vectors.
If the recall-vs-WALL-TIME curve of the PQ tier dominates the exact
tier's, item 6 is closed the ADC way; if not, multi-assignment is the
fallback. Only same-session interleaved reps are evidence (CLAUDE.md
noise-band rule).

Usage: python scripts/r14_ann_pq_ab.py --sf-dir /tmp/sparkgraft/sf100mut [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mr_py_spark.registry import load_all
from mr_py_spark.session import get_spark


def _run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf100mut")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark()
    reg = load_all()
    sf = args.sf_dir

    from mr_py_spark.operators.hier import (
        _hier_pq_books,
        hier_index,
        hier_pq_codes,
        hier_topk_pq_with,
        hier_topk_with,
    )
    from mr_py_spark.operators.similarity import _emb_double
    from mr_py_spark.sources import tbl

    t0 = time.time()
    root_cent, leaf_cent, assigned = hier_index(spark, sf)
    print(f"one-time hier index build(+attach): {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    books = _hier_pq_books(spark, sf)
    codes = hier_pq_codes(spark, sf, assigned, books)
    codes.count()
    print(f"one-time PQ books+codes build(+attach): {time.time() - t0:.1f} s", flush=True)

    e = _emb_double(tbl(spark, sf, "embeddings"), "v")
    queries = (
        e.filter(F.col("vec_id") < 50)
        .withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("v", "qv")
    )

    brute_rows = reg["knn_cosine_topk"].fn(spark, sf).collect()
    brute = {(r.q_id, r.nn_id) for r in brute_rows}
    strong = {(r.q_id, r.nn_id) for r in brute_rows if r.sim >= 0.9}

    settings = [
        ("exact 12x12", lambda: hier_topk_with(
            root_cent, leaf_cent, assigned, queries, k=5,
            root_probe=12, leaf_probe=12)),
        ("exact 24x24", lambda: hier_topk_with(
            root_cent, leaf_cent, assigned, queries, k=5,
            root_probe=24, leaf_probe=24)),
        ("exact 48x24", lambda: hier_topk_with(
            root_cent, leaf_cent, assigned, queries, k=5,
            root_probe=48, leaf_probe=24)),
        ("pq    24x24 r20", lambda: hier_topk_pq_with(
            root_cent, leaf_cent, codes, assigned, queries, books, k=5,
            root_probe=24, leaf_probe=24, rerank=20)),
        ("pq    48x24 r20", lambda: hier_topk_pq_with(
            root_cent, leaf_cent, codes, assigned, queries, books, k=5,
            root_probe=48, leaf_probe=24, rerank=20)),
        ("pq    64x32 r20", lambda: hier_topk_pq_with(
            root_cent, leaf_cent, codes, assigned, queries, books, k=5,
            root_probe=64, leaf_probe=32, rerank=20)),
    ]

    # candidate rows per query per setting (from the probe stage: the
    # PQ tier probes the same cells, only the payload differs)
    from mr_py_spark.operators.hier import _hier_probe_cells

    for label, rp, lp in (
        ("12x12", 12, 12), ("24x24", 24, 24), ("48x24", 48, 24),
        ("64x32", 64, 32),
    ):
        cells = _hier_probe_cells(root_cent, leaf_cent, queries, rp, lp)
        cand = cells.select("q_id", "bucket", "leaf").join(
            codes, ["bucket", "leaf"]
        )
        per_q = (
            cand.groupBy("q_id").agg(F.count(F.lit(1)).alias("c"))
            .agg(F.avg("c"), F.max("c")).collect()[0]
        )
        print(f"candidates/query @ {label}: mean={per_q[0]:.0f} max={per_q[1]}",
              flush=True)

    # warm-up then interleaved timed reps
    for label, fn in settings:
        fn().write.format("noop").mode("overwrite").save()
    for rep in range(args.reps):
        for label, fn in settings:
            print(f"rep {rep}: {label}: {_run(fn()):.2f} s", flush=True)

    for label, fn in settings:
        got = {(r.q_id, r.nn_id) for r in fn().collect()}
        s = (
            f" strong={len(strong & got) / len(strong):.3f}" if strong else ""
        )
        print(f"recall@5 {label}: {len(brute & got) / len(brute):.3f}{s}",
              flush=True)


if __name__ == "__main__":
    main()
