"""Zipf-gram skew A/B for boilerplate_ngrams (verdict r5 item 1).

The sf10 fixture is replication-degenerate (every doc has 99 exact
copies, so 100% of grams are "common") — it cannot distinguish the
window plan's unsplittable-partition failure mode from ordinary volume.
This script builds a POWER-LAW corpus instead: each document's words
are drawn i.i.d. from a Zipf(a) distribution over a large vocabulary,
so trigram document-frequency follows the natural web-corpus shape —
a handful of ubiquitous grams (the top gram lands in a large fraction
of all documents, the "all rights reserved" case) and a long unique
tail. On this shape the two plans differ structurally:

  window    — count(*) over (partition by g): every occurrence of the
              hot gram is pinned into ONE WindowExec task (partitions
              cannot be split by AQE), so the hot task's size grows
              linearly with corpus size while every other task stays
              small: a straggler whose latency IS the job latency.
  join-back — grams.groupBy(g).count() (partial agg folds hot-gram
              rows map-side; one row per gram crosses the exchange)
              then a LEFT equi-join back onto the gram stream, whose
              probe side AQE can skew-split.

Usage:
  python scripts/zipf_ab.py [--docs 400000] [--words 60] [--zipf 1.25]
                            [--out /tmp/sparkgraft/zipf] [--trials 3]

Prints one JSON line with best-of-N interleaved timings for both plans
plus the fixture's skew profile (top-gram document frequency).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_corpus(out: str, n_docs: int, n_words: int, a: float) -> None:
    """Write a zipf-worded documents.parquet (doc_id, text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    vocab_n = 200_000
    os.makedirs(out, exist_ok=True)
    chunk = 50_000
    writer = None
    for start in range(0, n_docs, chunk):
        n = min(chunk, n_docs - start)
        # Zipf ranks, truncated to the vocabulary; rank 1 is the hot word.
        ranks = rng.zipf(a, size=(n, n_words))
        ranks = np.minimum(ranks, vocab_n)
        texts = [" ".join(f"w{r}" for r in row) for row in ranks]
        t = pa.table(
            {
                "doc_id": pa.array(
                    range(start, start + n), type=pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(
                os.path.join(out, "documents.parquet"), t.schema
            )
        writer.write_table(t)
    if writer is not None:
        writer.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--words", type=int, default=60)
    ap.add_argument("--zipf", type=float, default=1.25)
    ap.add_argument("--out", default="/tmp/sparkgraft/zipf")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--skip-gen", action="store_true")
    # Cluster-granularity tasks: on a 1000-executor cluster shuffle
    # partitions are thousands and each task is small, so a hot gram's
    # rows dwarf the per-task baseline. With only 32 partitions on
    # local mode, a gram's max DF (= n_docs, after within-doc
    # array_distinct) can never exceed the average partition size and
    # the window's unsplittable hot partition stays invisible.
    ap.add_argument("--shuffle-partitions", type=int, default=2048)
    args = ap.parse_args()

    if not args.skip_gen:
        t0 = time.perf_counter()
        gen_corpus(args.out, args.docs, args.words, args.zipf)
        print(
            f"# generated {args.docs} docs in {time.perf_counter()-t0:.1f}s",
            file=sys.stderr,
        )

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from mr_py_spark.session import harden

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", "24g")
        .config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
        .appName("zipf_ab")
        .getOrCreate()
    )
    harden(spark)

    # A 100 TB corpus arrives in thousands of input splits; the single
    # local parquet file yields ~2, which would serialize the trigram
    # explode and distort both arms equally but unrealistically.
    docs = spark.read.parquet(
        os.path.join(args.out, "documents.parquet")
    ).repartition(64)
    ws = F.split(F.lower("text"), " ")
    tri = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(ws, i),
            F.element_at(ws, i + 1),
            F.element_at(ws, i + 2),
        ),
    )
    grams = docs.select(
        "doc_id", F.explode(F.array_distinct(tri)).alias("g")
    )

    def plan_window():
        w = Window.partitionBy("g")
        annotated = grams.withColumn("df", F.count("*").over(w))
        return (
            annotated.groupBy("doc_id")
            .agg(
                F.count("*").alias("n_grams"),
                F.sum(
                    F.when(F.col("df") >= 5, 1).otherwise(0)
                ).alias("n_common"),
            )
        )

    def plan_joinback():
        common = (
            grams.groupBy("g")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") >= 5)
            .select("g", F.lit(1).alias("is_common"))
        )
        return (
            grams.join(common, "g", "left")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_grams"),
                F.sum(
                    F.coalesce(F.col("is_common"), F.lit(0))
                ).alias("n_common"),
            )
        )

    def plan_joinback_persist():
        """Join-back with the gram stream persisted: at scale the
        rescan of the explode subtree (join-back's structural cost vs
        the window's single scan) is avoided by spilling grams to
        executor-local disk — the same storage the shuffle uses."""
        from pyspark import StorageLevel

        g2 = grams.persist(StorageLevel.MEMORY_AND_DISK)
        common = (
            g2.groupBy("g")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") >= 5)
            .select("g", F.lit(1).alias("is_common"))
        )
        out = (
            g2.join(common, "g", "left")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_grams"),
                F.sum(
                    F.coalesce(F.col("is_common"), F.lit(0))
                ).alias("n_common"),
            )
        )
        return out, g2

    def run(df) -> float:
        t0 = time.perf_counter()
        df.selectExpr(
            "sum(hash(doc_id, n_grams, n_common)) as h",
            "count(*) as c",
        ).collect()
        return time.perf_counter() - t0

    # Skew profile: how hot is the hottest gram?
    prof = (
        grams.groupBy("g")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    )
    n_grams_total = grams.count()
    top = [(r["g"], r["count"]) for r in prof]

    results: dict[str, list[float]] = {
        "window": [],
        "joinback": [],
        "joinback_persist": [],
    }
    for _ in range(args.trials):
        results["window"].append(run(plan_window()))
        results["joinback"].append(run(plan_joinback()))
        dfp, g2 = plan_joinback_persist()
        results["joinback_persist"].append(run(dfp))
        g2.unpersist(blocking=True)

    print(
        json.dumps(
            {
                "docs": args.docs,
                "words_per_doc": args.words,
                "zipf_a": args.zipf,
                "total_gram_rows": n_grams_total,
                "top_gram_df": top,
                "best": {k: min(v) for k, v in results.items()},
                "all": results,
                "shuffle_partitions": args.shuffle_partitions,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
