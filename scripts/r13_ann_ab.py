"""Round-13 scale A/B — constant-cost hier ANN serve tier vs the flat
indexed IVF form.

The claim under test: the flat form's probed-fraction rule makes
per-query candidate work Θ(n/4) (n_probe scales with nlist to hold
~25% probed), while ``knn_hier_topk_indexed``'s candidate work is
root_probe·leaf_probe·~64 rows — CONSTANT in corpus size. Per sf dir:
build/attach both full-table standing indexes (one-time costs reported
separately), audit actual candidate counts per query from the standing
tables, interleave timed reps of the two registered queries, then
score recall@5 of both against the exact brute-force form. Only
same-session interleaved pairs are evidence (CLAUDE.md noise-band
rule).

Usage: python scripts/r13_ann_ab.py --sf-dir /tmp/sparkgraft/sf100mut [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark()
    reg = load_all()
    sf = args.sf_dir

    from mr_py_spark.functions import dot
    from mr_py_spark.operators.hier import hier_index, hier_topk_with
    from mr_py_spark.operators.similarity import _N_PROBE, _emb_double, ivf_index
    from mr_py_spark.sources import tbl

    t0 = time.time()
    cent, assigned, nlist = ivf_index(spark, sf)
    print(f"one-time flat IVF full index build(+attach): {time.time() - t0:.2f} s",
          flush=True)
    t0 = time.time()
    root_cent, leaf_cent, h_assigned = hier_index(spark, sf)
    print(f"one-time hier full index build(+attach):     {time.time() - t0:.2f} s",
          flush=True)

    # --- candidate audit (per-query candidate rows, from the standing
    # tables themselves — the quantity the Θ(n/4)-vs-constant claim is
    # actually about) ---
    e = _emb_double(tbl(spark, sf, "embeddings"), "v")
    queries = (
        e.filter(F.col("vec_id") < 50)
        .withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("v", "qv")
    )
    n_probe = max(_N_PROBE, nlist // 4)
    wq = W.partitionBy("q_id").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        queries.join(F.broadcast(cent), how="cross")
        .select("q_id", "cid", dot("qv", "cv").alias("csim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("q_id", F.col("cid").alias("bucket"))
    )
    bucket_sizes = assigned.groupBy("bucket").agg(F.count(F.lit(1)).alias("bn"))
    flat_per_q = (
        probes.join(bucket_sizes, "bucket")
        .groupBy("q_id").agg(F.sum("bn").alias("cand"))
        .agg(F.avg("cand"), F.max("cand")).collect()[0]
    )
    hier_per_q = (
        hier_topk_with(root_cent, leaf_cent, h_assigned, queries,
                       emit_candidates=True)
        .groupBy("q_id").agg(F.count(F.lit(1)).alias("cand"))
        .agg(F.avg("cand"), F.max("cand")).collect()[0]
    )
    print(f"candidates/query flat (nlist={nlist}, n_probe={n_probe}): "
          f"mean={flat_per_q[0]:.0f} max={flat_per_q[1]}", flush=True)
    from mr_py_spark.operators.hier import _LEAF_PROBE, _ROOT_PROBE

    print(f"candidates/query hier ({_ROOT_PROBE}x{_LEAF_PROBE} probes): "
          f"mean={hier_per_q[0]:.0f} max={hier_per_q[1]}", flush=True)

    for rep in range(args.reps):
        t_flat = _run(reg["knn_ivf_topk_indexed"].fn(spark, sf))
        t_hier = _run(reg["knn_hier_topk_indexed"].fn(spark, sf))
        print(f"rep {rep}: flat serve {t_flat:.2f} s | hier serve {t_hier:.2f} s",
              flush=True)

    brute_rows = reg["knn_cosine_topk"].fn(spark, sf).collect()
    brute = {(r.q_id, r.nn_id) for r in brute_rows}
    # strong neighbors (cosine >= 0.9): the planted near-dup twins —
    # the target set the dedup/near-dup tier actually needs; the rest
    # of the mutated fixture's top-5 are ~N(0, 1/64) noise directions
    # no bucketing scheme co-locates
    strong = {(r.q_id, r.nn_id) for r in brute_rows if r.sim >= 0.9}
    flat = {(r.q_id, r.nn_id)
            for r in reg["knn_ivf_topk_indexed"].fn(spark, sf).collect()}
    hier = {(r.q_id, r.nn_id)
            for r in reg["knn_hier_topk_indexed"].fn(spark, sf).collect()}
    print(f"recall@5 vs brute: flat {len(brute & flat) / len(brute):.3f} | "
          f"hier {len(brute & hier) / len(brute):.3f}", flush=True)
    if strong:
        print(
            f"strong-neighbor (>=0.9) recall: "
            f"flat {len(strong & flat) / len(strong):.3f} | "
            f"hier {len(strong & hier) / len(strong):.3f} "
            f"({len(strong)} strong pairs)",
            flush=True,
        )


if __name__ == "__main__":
    main()
