"""Round-11 scale measurements — the session A/Bs behind this round's
SCALE.md entries (CLAUDE.md: only same-session interleaved A/Bs are
evidence).

1. Standing LSH index study (sf10): incremental_minhash_dedup (corpus
   signatures recomputed from text every snapshot) vs
   incremental_minhash_dedup_indexed (standing band_key-bucketed
   index), interleaved; one-time index build cost reported separately.
2. Fixed-delta-vs-corpus-size study: the SAME 5k-doc delta triaged
   against the sf1 index (~45k corpus docs) and the sf10 index
   (~450k corpus docs) — the per-snapshot-cost-vs-corpus-size curve
   the O(delta) claim predicts to be flat up to bucket occupancy.
3. Mutated-replica near-dup evidence (sf dir generated with
   gen_sf.py --mutate): dedup_minhash / incremental_minhash_dedup /
   dedup_containment ledger rows at a scale where the byte-identical
   fixture DNF'd (SCALE.md r10).

Usage: python scripts/r11_scale.py --study index --sf10 /tmp/sparkgraft/sf10
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


def index_study(spark, reg, sf_dir: str, reps: int) -> None:
    from mr_py_spark.operators.dedup import corpus_lsh_index

    t0 = time.time()
    corpus_lsh_index(spark, sf_dir)
    print(f"one-time index build(+attach): {time.time() - t0:.2f} s")
    for rep in range(reps):
        t_idx = _run(reg["incremental_minhash_dedup_indexed"].fn(spark, sf_dir))
        t_rec = _run(reg["incremental_minhash_dedup"].fn(spark, sf_dir))
        print(f"rep {rep}: indexed {t_idx:.2f} s | recompute {t_rec:.2f} s")


def delta_vs_corpus_study(spark, sf1: str, sf10: str, reps: int) -> None:
    from mr_py_spark.operators.dedup import (
        _INC_BUCKETS,
        _INC_DELTA_BUCKET,
        _INC_MULT,
        corpus_lsh_index,
        minhash_delta_status,
    )
    from mr_py_spark.sources import tbl

    b = (F.col("doc_id") * F.lit(_INC_MULT)) % F.lit(_INC_BUCKETS)
    delta = tbl(spark, sf1, "documents").filter(b == _INC_DELTA_BUCKET)
    n = delta.count()
    idx1, idx10 = corpus_lsh_index(spark, sf1), corpus_lsh_index(spark, sf10)
    n1, n10 = idx1.count(), idx10.count()
    print(f"delta: {n} docs; index rows sf1={n1} sf10={n10}")
    for rep in range(reps):
        t1 = _run(minhash_delta_status(None, delta, corpus_bands=idx1))
        t10 = _run(minhash_delta_status(None, delta, corpus_bands=idx10))
        print(f"rep {rep}: vs sf1 index {t1:.2f} s | vs sf10 index {t10:.2f} s")


def mutated_neardup_study(spark, reg, sf_dir: str, reps: int) -> None:
    for name in (
        "dedup_minhash",
        "incremental_minhash_dedup",
        "incremental_minhash_dedup_indexed",
        "dedup_containment",
    ):
        for rep in range(reps):
            t = _run(reg[name].fn(spark, sf_dir))
            print(f"{name} rep {rep}: {t:.2f} s")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--study", required=True,
                    choices=["index", "delta_vs_corpus", "mutated"])
    ap.add_argument("--sf1", default="/tmp/sparkgraft/sf1")
    ap.add_argument("--sf10", default="/tmp/sparkgraft/sf10")
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("r11-scale")
    reg = load_all()
    if args.study == "index":
        index_study(spark, reg, args.sf_dir or args.sf10, args.reps)
    elif args.study == "delta_vs_corpus":
        delta_vs_corpus_study(spark, args.sf1, args.sf10, args.reps)
    else:
        mutated_neardup_study(spark, reg, args.sf_dir, args.reps)
    spark.stop()


if __name__ == "__main__":
    main()
