"""Round-15 scale measurement — the O(delta) LSH gauge vs the r14
full-index gauge (VERDICT r14 item 1: the in-loop check ran
lsh_occupancy_frame — a full-index groupBy plus a corpus-wide
doc_id distinct — every 8 batches; the replacement reads a 1-file
sufficient-statistic sidecar per check and bumps it O(delta) per
append inside lsh_index_append).

Measured here, one session, interleaved (CLAUDE.md noise-band rule):

- per-CHECK cost: warm ``lsh_gauge_stats`` read vs the exact
  ``lsh_occupancy_frame`` collect, at 1x and 2x index size — the
  claim is the warm check is milliseconds and FLAT in index size
  while the full gauge grows with it;
- per-APPEND bump overhead: ``lsh_index_append`` with a live gauge
  sidecar vs with none (the bump's occupancy probe is a map-only
  two-column scan + delta-bounded agg), at both index sizes;
- exactness at scale: the incrementally-maintained stats equal the
  exact recompute after the appends (integer equality).

Usage: python scripts/r15_gauge_ab.py --sf-dir /tmp/sparkgraft/sf10mut
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mr_py_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf10mut")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark()
    sf = args.sf_dir

    from mr_py_spark.operators.bucketed import _BUCKETS
    from mr_py_spark.operators.dedup import (
        _LSH_INDEX_KEYS,
        _lsh_gauge_full,
        _lsh_gauge_path,
        lsh_band_entries,
        lsh_gauge_stats,
        lsh_index_append,
        lsh_occupancy_frame,
        minhash_signatures,
    )
    from mr_py_spark.sources import tbl
    from mr_py_spark.sources.sinks import write_bucketed

    docs = tbl(spark, sf, "documents").select("doc_id", "text")
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs; loadavg={os.getloadavg()}")

    def build(table: str, frame) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        write_bucketed(
            lsh_band_entries(minhash_signatures(frame)), table,
            _LSH_INDEX_KEYS, _BUCKETS,
            path=f"/tmp/sparkgraft/r15_gauge/{table}",
        )

    # 1x = the corpus; 2x = corpus plus a disjoint-id mutated twin
    # (unique suffix per copy so no fake cross-id band structure).
    twin = docs.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat_ws(
            " ", F.col("text"), F.lit("r15twin"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    sizes = {"1x": docs, "2x": docs.unionByName(twin)}
    delta = docs.limit(2000).select(
        (F.col("doc_id") + F.lit(50_000_000)).alias("doc_id"),
        F.concat_ws(
            " ", F.col("text"), F.lit("r15delta"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )

    for tag, frame in sizes.items():
        table = f"mrps_r15_gauge_{tag}"
        t0 = time.time()
        build(table, frame)
        rows = spark.table(table).count()
        print(f"[{tag}] index built: {rows} band rows in {time.time()-t0:.1f}s")

        # per-append bump overhead: no sidecar (bump no-ops) vs live
        # sidecar (bump pays the occupancy probe). Same delta, fresh
        # disjoint ids per rep so every append is a real append.
        for rep in range(args.reps):
            d_cold = delta.select(
                (F.col("doc_id") + F.lit(rep * 2_000_000)).alias("doc_id"),
                "text",
            )
            gpath = _lsh_gauge_path(spark, table)
            if os.path.exists(gpath):
                os.remove(gpath)
            t0 = time.time()
            lsh_index_append(d_cold, table)  # no sidecar -> no bump
            t_nobump = time.time() - t0
            lsh_gauge_stats(spark, table)  # bootstrap (timed separately)
            d_warm = d_cold.select(
                (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
            )
            t0 = time.time()
            lsh_index_append(d_warm, table)  # live sidecar -> O(delta) bump
            t_bump = time.time() - t0
            print(
                f"[{tag}] rep{rep} append 2k docs: no-gauge {t_nobump:.2f}s"
                f" vs with-bump {t_bump:.2f}s (overhead"
                f" {t_bump - t_nobump:+.2f}s)"
            )

        # per-CHECK cost, interleaved: warm sidecar read vs full gauge
        for rep in range(args.reps):
            t0 = time.time()
            s = lsh_gauge_stats(spark, table)
            t_warm = time.time() - t0
            t0 = time.time()
            row = lsh_occupancy_frame(spark.table(table)).collect()[0]
            t_full = time.time() - t0
            print(
                f"[{tag}] rep{rep} check: warm stats {t_warm*1000:.1f}ms"
                f" vs full gauge {t_full:.2f}s"
                f" (mass/doc {s['mass']/max(s['n_docs'],1):.3f}"
                f" vs exact {float(row.collision_per_doc):.3f})"
            )

        # exactness after the appends
        mass, nd, _ = _lsh_gauge_full(spark.table(table))
        s = lsh_gauge_stats(spark, table)
        ok = (s["mass"], s["n_docs"]) == (mass, nd)
        print(f"[{tag}] exactness: incremental {s} vs exact ({mass}, {nd})"
              f" -> {'OK' if ok else 'MISMATCH'}")
        assert ok
        spark.sql(f"DROP TABLE IF EXISTS {table}")

    print(f"loadavg end={os.getloadavg()}")
    spark.stop()


if __name__ == "__main__":
    main()
