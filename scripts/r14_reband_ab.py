"""Round-14 scale measurement — the LSH re-band actuator's economics
on the mutated document corpus (VERDICT r13 item 4).

What a re-band buys: per-probe candidate-verify work is the band-
bucket collision mass; a standing index grown far past its build size
accumulates weak-similarity collisions the 4-row banding was not sized
for. The actuator escalates to 8-row bands IN PLACE from the stored
signatures (no text re-read). Measured here, one session:

- the gauge (lsh_occupancy_frame) on the standing corpus index:
  collision mass at the build banding vs after a planted
  weak-similarity growth load (the actuator demo's 3-near-copies
  plant, scaled);
- the re-band rewrite's wall time (one signature scan + swap) vs
  rebuilding from text (the naive alternative);
- warm incremental triage (minhash_delta_status through the index)
  before vs after the re-band, plus the status drift it costs.

Usage: python scripts/r14_reband_ab.py --sf-dir /tmp/sparkgraft/sf10mut
"""

from __future__ import annotations

import argparse
import os
import re as _re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mr_py_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf10mut")
    args = ap.parse_args()

    spark = get_spark()
    sf = args.sf_dir

    from mr_py_spark.operators.bucketed import _BUCKETS
    from mr_py_spark.operators.dedup import (
        _INC_BUCKETS,
        _INC_DELTA_BUCKET,
        _INC_MULT,
        _LSH_INDEX_KEYS,
        lsh_band_entries,
        lsh_index_append,
        lsh_occupancy_frame,
        lsh_reband,
        minhash_delta_status,
        minhash_signatures,
    )
    from mr_py_spark.sources import tbl
    from mr_py_spark.sources.sinks import write_bucketed

    docs = tbl(spark, sf, "documents")
    b = (F.col("doc_id") * F.lit(_INC_MULT)) % F.lit(_INC_BUCKETS)
    corpus = docs.filter(b != _INC_DELTA_BUCKET).select("doc_id", "text")
    delta = docs.filter(b == _INC_DELTA_BUCKET).select("doc_id", "text")

    tag = _re.sub(r"[^0-9a-zA-Z]+", "_", sf.strip("/")) + f"_p{os.getpid()}"
    table = f"mrps_r14_reband_{tag}"
    root = os.path.join(tempfile.gettempdir(), "spark_graft_r14reband", tag)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        t0 = time.time()
        write_bucketed(
            lsh_band_entries(minhash_signatures(corpus)), table,
            _LSH_INDEX_KEYS, _BUCKETS, path=os.path.join(root, "idx"),
        )
        print(f"index build from text (the naive rebuild cost): "
              f"{time.time() - t0:.1f} s", flush=True)

        def gauge(label):
            r = lsh_occupancy_frame(spark.table(table)).collect()[0]
            print(
                f"gauge {label}: n_docs={r.n_docs} occ_max={r.occ_max} "
                f"occ_p99={r.occ_p99:.1f} collision/doc="
                f"{r.collision_per_doc:.2f}", flush=True,
            )
            return float(r.collision_per_doc)

        def triage(label):
            t0 = time.time()
            st = minhash_delta_status(
                None, delta, corpus_bands=spark.table(table)
            )
            counts = {
                r.status: r.c
                for r in st.groupBy("status").agg(
                    F.count(F.lit(1)).alias("c")
                ).collect()
            }
            print(f"triage {label}: {time.time() - t0:.1f} s  {counts}",
                  flush=True)
            return counts

        gauge("build banding (4 rows)")
        triage("before growth")

        # planted weak-similarity growth: the actuator demo's plant at
        # corpus scale (3 near-copies per doc, globally-unique tails)
        t0 = time.time()
        copies = corpus.select(
            "doc_id", "text",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("c"),
        ).select(
            (F.col("doc_id") * 10 + F.col("c") + 1_000_000_000).alias("doc_id"),
            F.concat_ws(
                "", F.col("text"), F.lit(" uniq"),
                F.col("doc_id").cast("string"), F.lit("c"),
                F.col("c").cast("string"),
            ).alias("text"),
        )
        lsh_index_append(copies, table)
        print(f"growth append (3x near-copies): {time.time() - t0:.1f} s",
              flush=True)
        gauge("after growth (4 rows)")
        triage("after growth, 4-row banding")

        t0 = time.time()
        stats = lsh_reband(spark, table, 8)
        print(f"re-band 4->8 from stored signatures: {time.time() - t0:.1f} s "
              f"({stats['n_docs']} docs)", flush=True)
        gauge("after re-band (8 rows)")
        triage("after re-band, 8-row banding")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
