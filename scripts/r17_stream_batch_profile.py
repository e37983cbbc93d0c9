"""Round-17 streaming per-batch profile — the r16 script's phases, with
the step body updated to match the r17 `_lsh_maintenance_step`: ONE agg
over the persisted status frame (P4a) supplies (count, min, max) of the
admitted ids to replay_guard (minmax=) and lsh_index_append
(delta_stats=), so the guard's fresh path and the append's
watermark/gauge stats run zero delta aggs of their own (VERDICT r16
item 2). Compare against scripts/r16_stream_batch_profile.py run in the
same session block for the before/after.

Usage: python scripts/r17_stream_batch_profile.py \
           [--sf-dir /tmp/sparkgraft/sf1mut] [--batches 6]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf1mut")
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch-docs", type=int, default=1000)
    args = ap.parse_args()

    from mr_py_spark.session import get_spark

    spark = get_spark("r17-stream-batch-profile")
    sc = spark.sparkContext

    from mr_py_spark.operators.bucketed import _BUCKETS, replay_guard
    from mr_py_spark.operators.dedup import (
        _LSH_INDEX_KEYS,
        lsh_band_entries,
        lsh_index_append,
        lsh_table_band_rows,
        minhash_delta_status,
        minhash_signatures,
    )
    from mr_py_spark.sources import tbl
    from mr_py_spark.sources.sinks import write_bucketed

    sf = args.sf_dir
    docs = tbl(spark, sf, "documents").select("doc_id", "text")
    n = docs.count()
    print(f"corpus {n} docs; loadavg={os.getloadavg()}", flush=True)

    table = "mrps_r17_profile_loop"
    root = "/tmp/sparkgraft/r17_profile"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    t0 = time.time()
    write_bucketed(
        lsh_band_entries(minhash_signatures(docs)), table,
        _LSH_INDEX_KEYS, _BUCKETS, path=os.path.join(root, "idx"),
    )
    print(
        f"index {spark.table(table).count()} band rows "
        f"in {time.time()-t0:.1f}s", flush=True,
    )
    base = docs.limit(args.batch_docs * args.batches).collect()
    out = os.path.join(root, "out")

    tracker = sc.statusTracker()

    def phase(name: str, fn):
        sc.setJobGroup(f"ph-{name}", name)
        t = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t
        jobs = len(tracker.getJobIdsForGroup(f"ph-{name}"))
        sc.setLocalProperty("spark.jobGroup.id", None)
        return r, dt, jobs

    totals: dict[str, list] = {}
    for b in range(args.batches):
        rows_b = [
            (60_000_000 + b * args.batch_docs + i,
             r.text + f" r17prof {b} {i}")
            for i, r in enumerate(
                base[b * args.batch_docs:(b + 1) * args.batch_docs]
            )
        ]
        bdf = spark.createDataFrame(rows_b, "doc_id long, text string")
        batch = bdf.select("doc_id", "text")
        ids = batch.select("doc_id")
        marks = []

        def rec(name, fn):
            r, dt, jobs = phase(f"{name}-{b}", fn)
            marks.append((name, dt, jobs))
            totals.setdefault(name, []).append(dt)
            return r

        cur = rec(
            "P0 band_rows+exists",
            lambda: (
                lsh_table_band_rows(spark, table)
                if spark.catalog.tableExists(table)
                else None
            ),
        )
        status = rec(
            "P1 build (py4j)",
            lambda: minhash_delta_status(
                None,
                batch,
                corpus_bands=spark.table(table).join(
                    ids, "doc_id", "left_anti"
                ),
                band_rows=cur,
            ),
        )
        rec("P2 triage count", lambda: status.persist().count())
        rec(
            "P3 status write",
            lambda: (
                status.withColumn("batch_id", F.lit(int(b)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out)
            ),
        )
        new_docs = batch.join(
            status.filter(F.col("status") == "new").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        # r17 body: one cached-frame agg shared across guard + append
        st = rec(
            "P4a status stats",
            lambda: status.filter(F.col("status") == "new")
            .agg(
                F.count(F.lit(1)).alias("nd"),
                F.min("doc_id").alias("mn"),
                F.max("doc_id").alias("mx"),
            )
            .collect()[0],
        )
        stats = (
            int(st.nd),
            None if st.mn is None else int(st.mn),
            None if st.mx is None else int(st.mx),
        )
        guarded = rec(
            "P4b replay_guard",
            lambda: replay_guard(
                spark, table, new_docs, "doc_id",
                minmax=(stats[1], stats[2]),
            ),
        )
        if guarded is new_docs:
            rec(
                "P5 index_append",
                lambda: lsh_index_append(guarded, table, delta_stats=stats),
            )
        else:
            rec("P5 index_append", lambda: lsh_index_append(guarded, table))
        status.unpersist()
        total = sum(dt for _, dt, _ in marks)
        print(
            f"batch {b}: {total:.2f}s  "
            + "  ".join(f"{nm}={dt:.2f}s/{j}j" for nm, dt, j in marks),
            flush=True,
        )

    print("\nper-phase best across batches (warm constant):")
    for nm, ds in totals.items():
        print(f"  {nm:<22} best {min(ds):.3f}s  median {sorted(ds)[len(ds)//2]:.3f}s")
    print(f"loadavg end={os.getloadavg()}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
