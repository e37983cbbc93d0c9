"""Round-10 scale measurements — the session A/Bs behind this round's
SCALE.md entries (CLAUDE.md: only same-session interleaved A/Bs are
evidence).

1. q5 layout study at sf10: shipped shuffle form (q5_local_supplier)
   vs the bucketed warehouse (q5_bucketed, zero-exchange fact join),
   interleaved; one-time warehouse build cost reported separately.
2. sf10 ledger rows for the r9 late family that only had sf1 entries:
   dedup_containment, paragraph_dedup (interleaved Spark/DuckDB via
   the registered oracles).
3. video frame-index df-cap study at sf10: the registered
   video_dup_pairs is the uncapped exact form (the fixture has no hub
   frames by construction), so the stop-frame hazard is measured by
   INJECTING a synthetic boilerplate frame hash into a slice of the
   corpus' signature sets and A/B-ing the candidate join with and
   without the document-frequency cap (hot hashes dropped via a
   broadcast anti-join — the hot set is small by definition). Frame
   signatures are materialized to parquet once so the A/B isolates
   the join under study from the decode pass.

Usage: python scripts/r10_scale.py [--sf10 DIR] [--reps N]
Fixtures: python scripts/gen_sf.py --out /tmp/sparkgraft/sf10 --factor 100
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from mr_py_spark.registry import load_all
from mr_py_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _duck(con, sql: str) -> float:
    t0 = time.time()
    con.execute(sql).fetchall()
    return time.time() - t0


def q5_layout_study(spark, reg, sf_dir: str, reps: int) -> None:
    from mr_py_spark.operators.bucketed import _bucketed_table

    t0 = time.time()
    _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    print(f"q5 warehouse build (one-time, both tables): {time.time() - t0:.1f}s", flush=True)
    shuffle_fn = reg["q5_local_supplier"].fn
    bucket_fn = reg["q5_bucketed"].fn
    _run(shuffle_fn(spark, sf_dir)), _run(bucket_fn(spark, sf_dir))  # warm
    for rep in range(reps):
        a = _run(shuffle_fn(spark, sf_dir))
        b = _run(bucket_fn(spark, sf_dir))
        print(f"q5 rep{rep}: shuffle={a:.2f}s bucketed={b:.2f}s", flush=True)


def q3_layout_study(spark, reg, sf_dir: str, reps: int) -> None:
    from mr_py_spark.operators.bucketed import _bucketed_table

    _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    shuffle_fn = reg["q3_shipping_priority"].fn
    bucket_fn = reg["q3_bucketed"].fn
    _run(shuffle_fn(spark, sf_dir)), _run(bucket_fn(spark, sf_dir))  # warm
    for rep in range(reps):
        a = _run(shuffle_fn(spark, sf_dir))
        b = _run(bucket_fn(spark, sf_dir))
        print(f"q3 rep{rep}: shuffle={a:.2f}s bucketed={b:.2f}s", flush=True)


def late_family_rows(spark, reg, con, sf_dir: str, reps: int) -> None:
    for name in ("dedup_containment", "paragraph_dedup"):
        q = reg[name]
        _run(q.fn(spark, sf_dir))  # warm
        for rep in range(reps):
            s = _run(q.fn(spark, sf_dir))
            d = _duck(con, q.oracle)
            print(f"{name} rep{rep}: spark={s:.2f}s duckdb={d:.2f}s", flush=True)


def incremental_minhash_study(spark, reg, sf_dir: str, reps: int) -> None:
    """O(delta) claim measured: triaging the 1/10 delta against the
    corpus index vs re-banding the WHOLE corpus for all pairs
    (dedup_minhash, the naive per-snapshot alternative)."""
    inc_fn = reg["incremental_minhash_dedup"].fn
    full_fn = reg["dedup_minhash"].fn
    _run(inc_fn(spark, sf_dir)), _run(full_fn(spark, sf_dir))  # warm
    for rep in range(reps):
        a = _run(inc_fn(spark, sf_dir))
        b = _run(full_fn(spark, sf_dir))
        print(f"incmh rep{rep}: delta-triage={a:.2f}s full-corpus-minhash={b:.2f}s", flush=True)


def video_cap_study(spark, sf_dir: str, out_root: str, reps: int) -> None:
    from mr_py_spark.operators.multimodal import (
        _VID_JACCARD,
        avi_variants,
        video_sig_of,
        video_table,
    )

    sig_path = os.path.join(out_root, "video_sigs")
    if not os.path.exists(os.path.join(sig_path, "_SUCCESS")):
        corpus = video_table(spark, sf_dir).filter(F.col("doc_id") % 4 == 0).unionByName(
            avi_variants(spark, sf_dir)
        )
        t0 = time.time()
        video_sig_of(corpus).select("doc_id", "fhash").distinct().write.mode(
            "overwrite"
        ).parquet(sig_path)
        print(f"video decode+sig pass (one-time): {time.time() - t0:.1f}s", flush=True)

    base = spark.read.parquet(sig_path)
    n_docs = base.select("doc_id").distinct().count()
    hot_n = base.filter(F.col("doc_id") % 50 == 0).select("doc_id").distinct().count()
    # inject ONE boilerplate frame (a title card) into every 50th doc:
    # a single hot bucket of ~n/50 docs -> ~(n/50)^2/2 candidate rows
    stop = (
        base.select("doc_id")
        .distinct()
        .filter(F.col("doc_id") % 50 == 0)
        .withColumn("fhash", F.lit(-(2**60) - 12345))
    )
    sigs = base.unionByName(stop)
    print(f"video corpus: {n_docs} docs, hot bucket df={hot_n}", flush=True)

    def pairs(s):
        sizes = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        a, b = s.alias("a"), s.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.fhash") == F.col("b.fhash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
        nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
        return (
            inter.join(na, "doc_a")
            .join(nb, "doc_b")
            .withColumn(
                "jaccard",
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= _VID_JACCARD)
        )

    def capped(s, cap: int):
        hot = (
            s.groupBy("fhash")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > cap)
            .select("fhash")
        )
        return pairs(s.join(F.broadcast(hot), "fhash", "left_anti"))

    cap = 64
    _run(capped(sigs, cap))  # warm
    for rep in range(reps):
        c = _run(capped(sigs, cap))
        u = _run(pairs(sigs))
        print(f"video rep{rep}: capped(df<={cap})={c:.2f}s uncapped={u:.2f}s", flush=True)
    # the cap must not change the answer on the REAL (hub-free) corpus
    n_real = pairs(base).count()
    n_real_capped = capped(base, cap).count()
    print(
        f"video cap sanity on hub-free corpus: pairs uncapped={n_real} capped={n_real_capped}",
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf10", default="/tmp/sparkgraft/sf10")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--only", default="", help="comma list of studies: q5,q3,incmh,late,video (default all)"
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) - {""}
    spark = get_spark("r10-scale")
    reg = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf10}/{t}.parquet')"
        )
    if not only or "q5" in only:
        print("== q5 layout study @ sf10 ==", flush=True)
        q5_layout_study(spark, reg, args.sf10, args.reps)
    if not only or "q3" in only:
        print("== q3 layout study @ sf10 ==", flush=True)
        q3_layout_study(spark, reg, args.sf10, args.reps)
    if not only or "incmh" in only:
        print("== incremental minhash study @ sf10 ==", flush=True)
        incremental_minhash_study(spark, reg, args.sf10, args.reps)
    if not only or "late" in only:
        print("== r9 late family @ sf10 ==", flush=True)
        late_family_rows(spark, reg, con, args.sf10, args.reps)
    if not only or "video" in only:
        print("== video df-cap study @ sf10 ==", flush=True)
        video_cap_study(spark, args.sf10, "/tmp/sparkgraft/r10", args.reps)


if __name__ == "__main__":
    main()
