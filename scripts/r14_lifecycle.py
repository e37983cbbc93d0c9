"""Round-14 standing-index LIFECYCLE demo — r13's end-to-end
maintenance run plus this round's addition: the TEXT tier's
gauge→actuator loop (VERDICT r13 item 4 — band-occupancy monitoring
and the crash-atomic RE-BAND, giving the LSH index the same
drift→rebuild discipline the semantic tier has). Every maintenance
operation a production deployment performs on the tier, one session,
each step timed.

  1. BUILD    corpus LSH band index + flat IVF index + HIER two-level
              index (content/knob-stamped bucketed warehouse tables)
  2. INGEST   drain all three streaming maintenance loops over the
              fixture (replay-idempotent foreachBatch; the IVF and
              hier loops carry the in-loop drift check)
  3. COMPACT  the stream-maintained tables back to one file per
              occupied bucket (crash-atomic two-phase swap)
  4. MONITOR  ivf_drift_stats + lsh_index_occupancy (the gauges)
  5. RETRAIN  ivf_drift_retrain + lsh_reband_actuator (the actuators,
              planted-drift/growth demos: detect -> rebuild in place
              -> re-score)
  6. SERVE    warm O(delta) triage against the standing indexes
              (text, flat semantic, HIER semantic, indexed ANN flat
              and hier)

Usage: python scripts/r14_lifecycle.py --sf-dir /tmp/sparkgraft/sf10mut
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

    spark = get_spark("r14-lifecycle")
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
    from mr_py_spark.operators.hier import hier_corpus_index
    from mr_py_spark.operators.similarity import ivf_corpus_index
    from mr_py_spark.streaming import stream_table_tag

    # 1. build (or attach) the standing corpus indexes
    timed("1a. corpus LSH index build/attach", lambda: corpus_lsh_index(spark, sf))
    timed("1b. corpus IVF index build/attach", lambda: ivf_corpus_index(spark, sf))
    timed("1c. hier two-level index build/attach", lambda: hier_corpus_index(spark, sf))

    # 2. streaming ingest loops (all three: text LSH, flat IVF, hier)
    run("stream_lsh_index_maintenance")
    run("stream_semantic_index_maintenance")
    run("stream_hier_index_maintenance")

    # 3. compact the stream-maintained tables
    tag = stream_table_tag(sf)
    for table, keys in (
        (f"mrps_stream_lsh_idx_{tag}", _LSH_INDEX_KEYS),
        (f"mrps_stream_ivf_idx_{tag}", "bucket"),
        (f"mrps_stream_hier_idx_{tag}", ("bucket", "leaf")),
    ):
        stats = timed(
            f"3. compact {table}", lambda: compact_bucketed_table(spark, table, keys)
        )
        print(
            f"   files {stats['files_before']} -> {stats['files_after']}"
            f" ({stats['rows']} rows)",
            flush=True,
        )

    # 4. drift monitors (the gauges: semantic + text band occupancy)
    run("ivf_drift_stats")
    run("lsh_index_occupancy")

    # 5. drift/growth-gated rebuilds (the actuators: semantic retrain
    #    + text re-band, both crash-atomic in-place)
    run("ivf_drift_retrain")
    run("lsh_reband_actuator")

    # 6. warm O(delta) service against the standing indexes
    run("incremental_minhash_dedup_indexed")
    run("incremental_semantic_dedup")
    run("incremental_semantic_dedup_hier")
    run("knn_ivf_topk_indexed")
    run("knn_hier_topk_indexed")
    spark.stop()


if __name__ == "__main__":
    main()
