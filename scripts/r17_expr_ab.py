"""Round-17 interleaved A/B: triage-DataFrame CONSTRUCTION time (the
driver py4j expression chatter, VERDICT r16 item 1) — r16 Column-API
forms (loaded from a worktree at the pre-edit commit) vs the r17
JVM-parsed selectExpr/F.expr forms, alternating in ONE session.

Measures pure plan construction (no action, no analysis trigger): the
time `minhash_delta_status(None, batch, corpus_bands=..., band_rows=4)`
takes to return, which is what the streaming loop's P1 phase pays per
warm batch. Also times minhash_pairs_from_bands construction (the
dedup_minhash family's build).

Usage: python scripts/r17_expr_ab.py [--old-root /tmp/r17_old] [--reps 9]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.r17_equiv_check import load_old_dedup  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-root", default="/tmp/r17_old")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=9)
    args = ap.parse_args()

    from mr_py_spark.operators import dedup as new
    from mr_py_spark.session import get_spark
    from mr_py_spark.sources import tbl

    old = load_old_dedup(args.old_root)
    spark = get_spark("r17-expr-ab")
    docs = tbl(spark, args.sf, "documents").select("doc_id", "text")
    # a standing corpus-bands frame, shared by both sides (its own
    # construction is timed separately via lsh_band_entries)
    cband = new.lsh_band_entries(new.minhash_signatures(docs))

    def t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    cases = {
        "delta_status build": {
            "old": lambda: old.minhash_delta_status(
                None, docs, corpus_bands=cband, band_rows=4
            ),
            "new": lambda: new.minhash_delta_status(
                None, docs, corpus_bands=cband, band_rows=4
            ),
        },
        "pairs build": {
            "old": lambda: old.minhash_pairs_from_bands(
                old.lsh_band_entries(old.minhash_signatures(docs))
            ),
            "new": lambda: new.minhash_pairs_from_bands(
                new.lsh_band_entries(new.minhash_signatures(docs))
            ),
        },
    }
    for name, sides in cases.items():
        res = {"old": [], "new": []}
        sides["old"]()  # warm both code paths once
        sides["new"]()
        for _ in range(args.reps):
            for side in ("old", "new"):
                res[side].append(t(sides[side]))
        for side in ("old", "new"):
            xs = res[side]
            print(
                f"{name:<20} {side}: best {min(xs)*1e3:7.1f} ms  "
                f"median {statistics.median(xs)*1e3:7.1f} ms",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
