"""Round-9 (late) scale measurements — the session A/Bs behind this
round's SCALE.md entries (CLAUDE.md: only same-session interleaved
A/Bs are evidence; this script re-runs them in one process).

1. dedup_containment candidate-generation form study at sf1:
   (a) gram-stream self-join on rare keys (two full gram shuffles),
   (b) collect_set-then-filter (REJECTED: unbounded hot-gram arrays),
   (c) shipped df-filter-first bounded collect (one full gram shuffle).
2. attribution_multi_touch window-key study at sf10: path-size window
   on bare conv_id (second full-stream Exchange) vs (user_id, conv_id)
   (subsumed by the first window's partitioning — local Sort only).
3. sf10 throughput rows for the round's new operators (interleaved
   Spark/DuckDB where the oracle is feasible at that scale).

Usage: python scripts/r9_scale.py [--sf1 DIR] [--sf10 DIR]
Fixtures: python scripts/gen_sf.py --out /tmp/sparkgraft/sf1 --factor 10
          python scripts/gen_sf.py --out /tmp/sparkgraft/sf10 --factor 100
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mr_py_spark.functions import ngrams_arr, words
from mr_py_spark.registry import load_all
from mr_py_spark.session import get_spark
from mr_py_spark.sources import tbl


def _run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def containment_forms(spark, sf_dir: str) -> None:
    """Form study (1): shipped form is reg['dedup_containment']."""

    def base(sf):
        toks = tbl(spark, sf, "documents").select(
            "doc_id", words(F.lower("text")).alias("w")
        )
        grams = toks.select(
            "doc_id", F.explode(F.array_distinct(ngrams_arr("w", 3))).alias("g")
        )
        t = grams.groupBy("doc_id").agg(F.collect_set("g").alias("gs"))
        return grams, t

    def finish(cand, t):
        ta = t.select(F.col("doc_id").alias("doc_a"), F.col("gs").alias("gsa"))
        tb = t.select(F.col("doc_id").alias("doc_b"), F.col("gs").alias("gsb"))
        c = F.size(F.array_intersect("gsa", "gsb")).cast("double") / F.least(
            F.size("gsa"), F.size("gsb")
        )
        return (
            cand.join(ta, "doc_a")
            .join(tb, "doc_b")
            .select("doc_a", "doc_b", c.alias("containment"))
            .filter(F.col("containment") >= 0.8)
        )

    def self_join_form(sf):
        grams, t = base(sf)
        rare = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df").between(2, 4))
            .select("g")
        )
        a = grams.join(rare, "g").alias("a")
        b = grams.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.g") == F.col("b.g"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
        return finish(cand, t)

    def collect_first_form(sf):  # the rejected one — unbounded hot grams
        grams, t = base(sf)
        ds = F.array_sort(F.collect_set("doc_id"))
        pairs = F.flatten(
            F.transform(
                "ds",
                lambda x, i: F.transform(
                    F.slice("ds", i + F.lit(2), F.size("ds")),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        )
        cand = (
            grams.groupBy("g")
            .agg(ds.alias("ds"))
            .filter(F.size("ds").between(2, 4))
            .select(F.explode(pairs).alias("p"))
            .select("p.doc_a", "p.doc_b")
            .distinct()
        )
        return finish(cand, t)

    shipped = load_all()["dedup_containment"].fn
    _run(self_join_form(sf_dir)), _run(collect_first_form(sf_dir)), _run(
        shipped(spark, sf_dir)
    )  # warm-up
    for rep in range(3):
        a = _run(self_join_form(sf_dir))
        b = _run(collect_first_form(sf_dir))
        c = _run(shipped(spark, sf_dir))
        print(
            f"containment rep{rep}: self-join={a:.2f}s collect-first={b:.2f}s"
            f" shipped={c:.2f}s",
            flush=True,
        )


def multi_touch_forms(spark, sf_dir: str) -> None:
    """Window-key study (2): shipped form is reg['attribution_multi_touch']."""

    def bare_conv_form(sf):
        ev = tbl(spark, sf, "events")
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.desc("ts"), F.desc("event_id"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        conv = F.last(
            F.when(F.col("event_type") == "purchase", F.col("event_id")),
            ignorenulls=True,
        ).over(w)
        touches = (
            ev.select("event_id", "event_type", conv.alias("conv_id"))
            .filter(
                F.col("event_type").isin("click", "view")
                & F.col("conv_id").isNotNull()
            )
            .select("conv_id", F.col("event_type").alias("channel"))
        )
        paths = touches.withColumn(
            "n_path", F.count(F.lit(1)).over(Window.partitionBy("conv_id"))
        )
        credit = F.floor(F.lit(1000000000.0) / F.col("n_path")).cast("long")
        return paths.groupBy("channel").agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("conv_id").alias("n_conversions"),
            F.sum(credit).alias("credit_ns"),
        )

    shipped = load_all()["attribution_multi_touch"].fn
    _run(bare_conv_form(sf_dir)), _run(shipped(spark, sf_dir))
    for rep in range(3):
        a = _run(bare_conv_form(sf_dir))
        b = _run(shipped(spark, sf_dir))
        print(f"multi_touch rep{rep}: bare-conv={a:.2f}s subsumed-key={b:.2f}s", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sparkgraft/sf1")
    ap.add_argument("--sf10", default="/tmp/sparkgraft/sf10")
    args = ap.parse_args()
    spark = get_spark("r9-scale")
    print("== containment form study @ sf1 ==", flush=True)
    containment_forms(spark, args.sf1)
    print("== multi-touch window-key study @ sf10 ==", flush=True)
    multi_touch_forms(spark, args.sf10)


if __name__ == "__main__":
    main()
