#!/usr/bin/env python
"""A/B: heavy_hitters' Arrow-MG candidate pass vs a pure-JVM pass-1
built on Spark's own frequent-items sketch (df.stat.freqItems — the
Karp/Schenker/Papadimitriou streaming algorithm, same candidates-are-
a-superset guarantee, treeAggregated to a bounded driver-side array).

Both arms share pass 2 (exact recount + integer HAVING), so outputs
must be identical (asserted before timing).

Usage: python scripts/hh_jvm_ab.py [sf_dir] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def freqitems_form(spark, sf_dir):
    from pyspark.sql import functions as F

    from mr_py_spark.functions import words
    from mr_py_spark.operators.text import _HH_DENOM, _HH_K
    from mr_py_spark.sources import tbl

    docs = tbl(spark, sf_dir, "documents")
    w = words(F.lower("text"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    grams = docs.select(F.explode(bigrams).alias("bigram"))
    cands = list(grams.stat.freqItems(["bigram"], 1.0 / _HH_K).first()[0])
    total = docs.select((F.size(w) - F.lit(1)).alias("m")).agg(F.sum("m").alias("n"))
    return (
        grams.filter(F.col("bigram").isin(cands))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _HH_DENOM >= F.col("n"))
        .select("bigram", "cnt")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft/sf100"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from mr_py_spark.registry import load_all
    from mr_py_spark.session import get_spark

    spark = get_spark("hh-jvm-ab")
    reg = load_all()

    a = {(r.bigram, r.cnt) for r in reg["heavy_hitters"].fn(spark, sf_dir).collect()}
    b = {(r.bigram, r.cnt) for r in freqitems_form(spark, sf_dir).collect()}
    assert a == b, f"arms disagree: {len(a)} vs {len(b)}"
    print(f"arms agree: {len(a)} heavy hitters", flush=True)

    def run_mg():
        reg["heavy_hitters"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_jvm():
        freqitems_form(spark, sf_dir).write.format("noop").mode("overwrite").save()

    arms = {"arrow_mg": run_mg, "jvm_freqitems": run_jvm}
    best: dict[str, float] = {}
    for t in range(trials):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            print(f"  trial{t} {name}: {dt:.2f}s", flush=True)
            best[name] = min(best.get(name, float("inf")), dt)

    print(json.dumps({"sf_dir": sf_dir, "best": {k: round(v, 3) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
