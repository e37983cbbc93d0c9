"""Round-8 scale measurements (VERDICT r7 items 4 and 5).

1. simhash A/B at sf10 (500k docs): the r7 per-row/per-bit Python
   loop vs the r8 vectorized numpy batch body, interleaved in ONE
   session (CLAUDE.md: only same-session A/Bs are evidence).
2. IVF candidate boundedness at sf100 (2M vectors): candidate-row
   counts for the single-table adaptive tier (probes = nlist/4,
   Θ(n/4) per query) vs the L-table capped tier (4 tables x 6
   probes, constant per query) — the SCALE.md ledger row for the
   multi-table knob.

Usage: python scripts/r8_scale.py [--skip-simhash] [--skip-ivf]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402


def bench_simhash(spark, sf_dir: str, pairs: int = 2) -> None:
    @pandas_udf("long")
    def simhash_old(text: pd.Series) -> pd.Series:
        """The r7 implementation, verbatim — the A/B baseline arm."""

        def one(t: str) -> int:
            acc = [0] * 64
            for w in t.lower().split(" "):
                if not w:
                    continue
                h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                for bit in range(64):
                    acc[bit] += 1 if (h >> bit) & 1 else -1
            v = 0
            for bit in range(64):
                if acc[bit] > 0:
                    v |= 1 << bit
            return v - (1 << 64) if v >= (1 << 63) else v

        return text.map(one)

    from mr_py_spark.registry import load_all
    from mr_py_spark.sources import tbl

    reg = load_all()
    docs = tbl(spark, sf_dir, "documents")

    def run_old() -> float:
        t0 = time.perf_counter()
        docs.select("doc_id", simhash_old("text").alias("simhash64")).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    def run_new() -> float:
        t0 = time.perf_counter()
        reg["dedup_simhash"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    run_new()  # warm-up (JIT, python workers)
    for i in range(pairs):
        t_old = run_old()
        t_new = run_new()
        print(
            f"simhash pair {i + 1}: old {t_old:.1f}s new {t_new:.1f}s "
            f"({t_old / t_new:.1f}x)",
            flush=True,
        )


def bench_ivf(spark, sf_dir: str, n_queries: int = 50) -> None:
    import pyarrow.parquet as pq

    from mr_py_spark.operators.similarity import (
        _ivf_candidates,
        _ivf_nlist,
        _ivf_topk_core,
    )
    from mr_py_spark.sources import tbl

    n = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    nlist = _ivf_nlist(n)
    e = (
        tbl(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    queries = (
        e.filter(F.col("vec_id") < n_queries)
        .withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("v", "qv")
    )
    print(f"ivf: n={n} nlist={nlist} queries={n_queries} single_probes={max(6, nlist // 4)}", flush=True)
    for label, kw in (
        ("single-adaptive", dict(tables=1, n_probe=None)),
        ("multi-4x6", dict(tables=4, n_probe=6)),
    ):
        t0 = time.perf_counter()
        c = _ivf_candidates(spark, e, queries, n_hint=n, **kw).count()
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ivf_topk_core(spark, e, queries, n_hint=n, **kw).write.format("noop").mode(
            "overwrite"
        ).save()
        t_q = time.perf_counter() - t0
        print(
            f"ivf {label}: candidates={c} ({c / n_queries:.0f}/query, "
            f"{c / n_queries / n * 100:.1f}% of corpus) cand_pass {t_c:.1f}s "
            f"full_topk {t_q:.1f}s",
            flush=True,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-simhash", action="store_true")
    ap.add_argument("--skip-ivf", action="store_true")
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--sf10", default="/tmp/sparkgraft/sf10")
    ap.add_argument("--sf100", default="/tmp/sparkgraft/sf100")
    args = ap.parse_args()

    from mr_py_spark.session import get_spark

    spark = get_spark("r8-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if not args.skip_simhash:
        bench_simhash(spark, args.sf10)
    if not args.skip_ivf:
        bench_ivf(spark, args.sf100, args.queries)


if __name__ == "__main__":
    main()
