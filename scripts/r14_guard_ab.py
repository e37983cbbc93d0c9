"""Round-14 A/B — the watermark replay guard vs the full-index probe
it replaced (VERDICT r13 'minor, watch it': the *_index_append
idempotence guards scanned the standing table's id column per
micro-batch — O(index) per batch).

One session, one standing IVF index at fixture scale: append a stream
of FRESH batches (the normal streaming case) under (a) the old exact
guard shape (index-side semi + anti, reproduced inline) and (b) the
watermark guard (bucketed.replay_guard), interleaved; then a REPLAYED
batch under the watermark guard to show the exact path still runs and
admits nothing.

Usage: python scripts/r14_guard_ab.py --sf-dir /tmp/sparkgraft/sf100mut
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
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf100mut")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch-rows", type=int, default=10_000)
    args = ap.parse_args()

    spark = get_spark()
    sf = args.sf_dir

    from mr_py_spark.operators.bucketed import _BUCKETS, replay_guard
    from mr_py_spark.operators.similarity import (
        _emb_double,
        _ivf_centroids,
        _ordered_train_sample,
        ivf_assign_with,
    )
    from mr_py_spark.operators.kmeans import _kmeans_k
    from mr_py_spark.sources import tbl
    from mr_py_spark.sources.sinks import write_bucketed

    e = _emb_double(tbl(spark, sf, "embeddings"), "v")
    n = e.count()
    base = e.filter(F.col("vec_id") < n - args.batches * 2 * args.batch_rows)

    tag = _re.sub(r"[^0-9a-zA-Z]+", "_", sf.strip("/")) + f"_p{os.getpid()}"
    table = f"mrps_r14_guard_{tag}"
    root = os.path.join(tempfile.gettempdir(), "spark_graft_r14guard", tag)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        cents = _ivf_centroids(
            spark, base, max(2, _kmeans_k(n)),
            sample=_ordered_train_sample(base),
        )
        cent = spark.createDataFrame(
            list(enumerate(cents)), "cid long, cv array<double>"
        )
        t0 = time.time()
        write_bucketed(
            ivf_assign_with(cent, base), table, "bucket", _BUCKETS,
            path=os.path.join(root, "idx"),
        )
        print(f"index build: {time.time() - t0:.1f} s ({base.count()} rows)",
              flush=True)

        hi = n  # fresh ids start above the corpus
        for i in range(args.batches):
            fresh_a = spark.range(
                hi + (2 * i) * args.batch_rows,
                hi + (2 * i + 1) * args.batch_rows,
            ).selectExpr(
                "id as vec_id",
                "transform(sequence(1, 64), x -> rand(42) * 0.1) as v",
            )
            fresh_b = spark.range(
                hi + (2 * i + 1) * args.batch_rows,
                hi + (2 * i + 2) * args.batch_rows,
            ).selectExpr(
                "id as vec_id",
                "transform(sequence(1, 64), x -> rand(43) * 0.1) as v",
            )
            # (a) the OLD guard shape: full index-side semi + anti
            t0 = time.time()
            ids = fresh_a.select("vec_id")
            already = spark.table(table).select("vec_id").join(
                ids, "vec_id", "left_semi"
            )
            kept_a = fresh_a.join(already, "vec_id", "left_anti")
            write_bucketed(
                ivf_assign_with(cent, kept_a), table, "bucket", _BUCKETS,
                mode="append",
            )
            t_old = time.time() - t0
            # (b) the watermark guard
            t0 = time.time()
            kept_b = replay_guard(spark, table, fresh_b, "vec_id")
            write_bucketed(
                ivf_assign_with(cent, kept_b), table, "bucket", _BUCKETS,
                mode="append",
            )
            t_new = time.time() - t0
            print(f"batch {i}: old exact guard {t_old:.2f} s | "
                  f"watermark guard {t_new:.2f} s", flush=True)

        # replay: the watermark guard must take the exact path and
        # admit nothing
        t0 = time.time()
        replayed = replay_guard(spark, table, fresh_b, "vec_id")
        n_replay = replayed.count()
        print(f"replayed batch through watermark guard: {time.time() - t0:.2f} s,"
              f" admitted {n_replay} (must be 0)", flush=True)
        assert n_replay == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
