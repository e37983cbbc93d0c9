#!/usr/bin/env python
"""Sketch-vs-naive A/B for heavy_hitters on a LARGE-vocabulary corpus.

The shipped fixture's 31-word vocabulary (916 possible bigrams) makes
the naive plan trivially cheap: partial aggregation collapses every
task's stream to <= 916 rows before the exchange, so a sketch cannot
win there. The regime the two-pass design targets is a web-scale
vocabulary — most bigrams near-unique — where the naive exchange
carries roughly one row PER OCCURRENCE (map-side combine finds nothing
to combine) while the sketch's only wide exchanges carry candidate
rows. This script builds that regime with the zipf corpus generator
shared with scripts/zipf_ab.py and times both plans interleaved:

  naive  - explode bigrams -> groupBy(bigram).count() -> total from the
           counted frame -> HAVING filter (one corpus scan, one
           vocabulary-wide exchange)
  sketch - the registered heavy_hitters (two corpus scans, exchanges
           carry only MG candidates)

Both arms produce identical rows (asserted once before timing).

Usage:
  python scripts/hh_ab.py [--docs 600000] [--words 60] [--zipf 1.25]
                          [--out /tmp/sparkgraft/zipf_hh] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.zipf_ab import gen_corpus  # noqa: E402


def naive_form(spark, sf_dir):
    from pyspark.sql import functions as F

    from mr_py_spark.functions import words
    from mr_py_spark.operators.text import _HH_DENOM
    from mr_py_spark.sources import tbl

    docs = tbl(spark, sf_dir, "documents")
    w = words(F.lower("text"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    counts = (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _HH_DENOM >= F.col("n"))
        .select("bigram", "cnt")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600_000)
    ap.add_argument("--words", type=int, default=60)
    ap.add_argument("--zipf", type=float, default=1.25)
    ap.add_argument("--out", default="/tmp/sparkgraft/zipf_hh")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.out, "documents.parquet")):
        print(f"generating {args.docs} zipf docs -> {args.out}", flush=True)
        gen_corpus(args.out, args.docs, args.words, args.zipf)

    from mr_py_spark.registry import load_all
    from mr_py_spark.session import get_spark

    spark = get_spark("hh-ab")
    reg = load_all()

    sketch_df = reg["heavy_hitters"].fn(spark, args.out)
    naive_df = naive_form(spark, args.out)
    s = {(r.bigram, r.cnt) for r in sketch_df.collect()}
    nv = {(r.bigram, r.cnt) for r in naive_df.collect()}
    assert s == nv, f"arms disagree: {len(s)} vs {len(nv)} rows"
    print(f"arms agree: {len(s)} heavy hitters", flush=True)

    def run_sketch():
        reg["heavy_hitters"].fn(spark, args.out).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_naive():
        naive_form(spark, args.out).write.format("noop").mode("overwrite").save()

    arms = {"sketch": run_sketch, "naive": run_naive}
    best: dict[str, float] = {}
    for trial in range(args.trials + 1):  # trial 0 = warm-up
        for name, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            tag = "warmup" if trial == 0 else f"trial{trial}"
            print(f"  {tag} {name}: {dt:.2f}s", flush=True)
            if trial > 0:
                best[name] = min(best.get(name, float("inf")), dt)

    print(
        json.dumps(
            {
                "docs": args.docs,
                "n_heavy": len(s),
                "best": {k: round(v, 3) for k, v in best.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
