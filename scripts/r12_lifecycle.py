"""Round-12 standing-index LIFECYCLE demo — the integrated run behind
SCALE.md's r12 closing evidence: every maintenance operation a
production deployment performs on the standing-index tier, executed
end-to-end in one session at a given sf, each step timed.

  1. BUILD   corpus LSH band index + corpus IVF index (content/knob-
             stamped bucketed warehouse tables)
  2. INGEST  drain both streaming maintenance loops over the fixture
             (replay-idempotent foreachBatch; statuses to parquet)
  3. COMPACT both stream-maintained tables back to one file per
             occupied bucket (compact_bucketed_table) — files/tasks
             before and after
  4. MONITOR ivf_drift_stats on the delta split (the retrain signal)
  5. SERVE   warm O(delta) triage against both standing indexes
             (incremental_minhash_dedup_indexed,
             incremental_semantic_dedup) + indexed ANN top-k

Usage: python scripts/r12_lifecycle.py --sf-dir /tmp/sparkgraft/sf10
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_py_spark.registry import load_all
from mr_py_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf10mut")
    args = ap.parse_args()
    sf = args.sf_dir

    spark = get_spark("r12-lifecycle")
    reg = load_all()

    def timed(label, fn):
        t0 = time.time()
        out = fn()
        print(f"{label}: {time.time() - t0:.1f} s", flush=True)
        return out

    def run(name):
        return timed(
            name,
            lambda: reg[name]
            .fn(spark, sf)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    from mr_py_spark.operators.bucketed import compact_bucketed_table
    from mr_py_spark.operators.dedup import _LSH_INDEX_KEYS, corpus_lsh_index
    from mr_py_spark.operators.similarity import ivf_corpus_index
    from mr_py_spark.streaming import stream_table_tag

    # 1. build (or attach) the standing corpus indexes
    timed("1a. corpus LSH index build/attach", lambda: corpus_lsh_index(spark, sf))
    timed("1b. corpus IVF index build/attach", lambda: ivf_corpus_index(spark, sf))

    # 2. streaming ingest loops (each drains the fixture as micro-batches
    #    and leaves a stream-maintained standing table)
    run("stream_lsh_index_maintenance")
    run("stream_semantic_index_maintenance")

    # 3. compact the stream-maintained tables (name scheme owned by
    #    mr_py_spark.streaming.stream_table_tag)
    tag = stream_table_tag(sf)
    for table, keys in (
        (f"mrps_stream_lsh_idx_{tag}", _LSH_INDEX_KEYS),
        (f"mrps_stream_ivf_idx_{tag}", "bucket"),
    ):
        stats = timed(
            f"3. compact {table}", lambda: compact_bucketed_table(spark, table, keys)
        )
        print(
            f"   files {stats['files_before']} -> {stats['files_after']}"
            f" ({stats['rows']} rows)",
            flush=True,
        )

    # 4. drift monitor
    run("ivf_drift_stats")

    # 5. warm O(delta) service against the standing indexes
    run("incremental_minhash_dedup_indexed")
    run("incremental_semantic_dedup")
    run("knn_ivf_topk_indexed")
    spark.stop()


if __name__ == "__main__":
    main()
