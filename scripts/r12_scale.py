"""Round-12 scale measurements — the session A/Bs behind this round's
SCALE.md entries (CLAUDE.md: only same-session interleaved A/Bs are
evidence).

1. ``semantic`` (sf10): incremental_semantic_dedup (delta triaged
   against the STANDING IVF corpus index) vs semantic_dedup (the
   per-run Lloyd retrain chain, kmeans.py), interleaved; the one-time
   index build/attach cost reported separately. This is VERDICT r12
   item 4's A/B: the same per-snapshot-recompute elimination the r11
   indexes bought for text dedup and kNN, now for semantic dedup.
2. ``compaction`` (sf10): the small-file debt ledger — build a private
   LSH band index, grow it with N appends, then compact_bucketed_table
   back to one file per bucket. Reports data-file count, the scan TASK
   count of a forced-shuffle candidate join probe, probe latency
   before/after (interleaved per rep), and that the row set is
   bit-identical (count + per-bucket checksum).

Usage: python scripts/r12_scale.py --study semantic --sf10 /tmp/sparkgraft/sf10
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


def semantic_study(spark, reg, sf_dir: str, reps: int) -> None:
    from mr_py_spark.operators.similarity import ivf_corpus_index

    t0 = time.time()
    ivf_corpus_index(spark, sf_dir)
    print(f"one-time IVF corpus index build(+attach): {time.time() - t0:.2f} s")
    for rep in range(reps):
        t_idx = _run(reg["incremental_semantic_dedup"].fn(spark, sf_dir))
        t_km = _run(reg["semantic_dedup"].fn(spark, sf_dir))
        print(f"rep {rep}: indexed-delta {t_idx:.2f} s | kmeans-chain {t_km:.2f} s")


def compaction_study(spark, sf_dir: str, reps: int, appends: int = 5) -> None:
    import re
    import shutil
    import tempfile

    from mr_py_spark.operators.bucketed import (
        _BUCKETS,
        _data_files,
        _table_location,
        compact_bucketed_table,
    )
    from mr_py_spark.operators.dedup import (
        _INC_BUCKETS,
        _INC_DELTA_BUCKET,
        _INC_MULT,
        _LSH_INDEX_KEYS,
        lsh_band_entries,
        lsh_index_append,
        minhash_delta_status,
        minhash_signatures,
    )
    from mr_py_spark.sources import tbl
    from mr_py_spark.sources.sinks import write_bucketed

    table = "mrps_r12_compact_study"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    path = os.path.join(tempfile.gettempdir(), "sparkgraft_r12_compact")
    shutil.rmtree(path, ignore_errors=True)
    docs = tbl(spark, sf_dir, "documents")
    b = (F.col("doc_id") * F.lit(_INC_MULT)) % F.lit(_INC_BUCKETS)
    corpus = docs.filter(b != _INC_DELTA_BUCKET)
    delta = docs.filter(b == _INC_DELTA_BUCKET)
    # initial build from one slice, then N append snapshots
    slice_col = F.col("doc_id") % (appends + 1)
    t0 = time.time()
    write_bucketed(
        lsh_band_entries(minhash_signatures(corpus.filter(slice_col == 0))),
        table, _LSH_INDEX_KEYS, _BUCKETS, path=path,
    )
    for i in range(1, appends + 1):
        lsh_index_append(corpus.filter(slice_col == i), table)
    print(f"build + {appends} appends: {time.time() - t0:.2f} s")

    def checksum() -> tuple:
        r = (
            spark.table(table)
            .agg(
                F.count(F.lit(1)).alias("n"),
                # hash EVERY column (review r12: the mh0..15 signature
                # columns are what the probe verifies against — a
                # checksum over the key columns alone would print
                # 'bit-identical' past a signature-corrupting bug)
                F.expr("bit_xor(xxhash64(*))").alias("x"),
            )
            .head()
        )
        return (r.n, r.x)

    def probe() -> float:
        return _run(minhash_delta_status(None, delta,
                                         corpus_bands=spark.table(table)))

    def scan_tasks() -> int:
        # unconstrained scan task count: file-group splits, the direct
        # cost of small files (a bucketed-requirement scan is 1 task
        # per bucket regardless, but pays the same open/footer count)
        return spark.table(table).rdd.getNumPartitions()

    before_sum = checksum()
    files_b = len(_data_files(_table_location(spark, table)))
    tasks_b = scan_tasks()
    probes_b = [probe() for _ in range(reps)]
    t0 = time.time()
    stats = compact_bucketed_table(spark, table, _LSH_INDEX_KEYS)
    t_compact = time.time() - t0
    after_sum = checksum()
    tasks_a = scan_tasks()
    probes_a = [probe() for _ in range(reps)]
    print(f"files before={files_b} after={stats['files_after']} "
          f"(compact pass {t_compact:.2f} s, {stats['rows']} rows)")
    print(f"scan tasks before={tasks_b} after={tasks_a}")
    print(f"bit-identical: {before_sum == after_sum} ({before_sum} vs {after_sum})")
    print("probe (delta triage vs index) before:",
          " ".join(f"{t:.2f}" for t in probes_b))
    print("probe after:                        ",
          " ".join(f"{t:.2f}" for t in probes_a))
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(path, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--study", required=True, choices=["semantic", "compaction"])
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf10")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("r12-scale")
    reg = load_all()
    if args.study == "semantic":
        semantic_study(spark, reg, args.sf_dir, args.reps)
    else:
        compaction_study(spark, args.sf_dir, args.reps)
    spark.stop()


if __name__ == "__main__":
    main()
