"""Round-17 equivalence proof for the dedup-family expression rewrite
(VERDICT r16 item 1): the selectExpr/F.expr forms must produce
BIT-IDENTICAL results to the r16 Column-API forms.

Loads the OLD implementations from a git worktree at the pre-edit
commit (--old-root) and the NEW ones from the repo, builds both over
the same fixture in ONE session, and compares collected outputs
row-for-row (sorted tuples, exact equality — these are integer hashes,
statuses and round()ed doubles, so == is bitwise here).

Usage: python scripts/r17_equiv_check.py --old-root /tmp/r17_old \
           [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_old_dedup(old_root: str):
    """Import the OLD dedup module under a private name. Its intra-
    package imports (mr_py_spark.functions etc.) resolve against the
    installed package — fine: those helpers are unchanged this round;
    only dedup.py's own functions differ."""
    import mr_py_spark.registry as reg

    path = os.path.join(old_root, "mr_py_spark", "operators", "dedup.py")
    spec = importlib.util.spec_from_file_location("old_dedup_r16", path)
    mod = importlib.util.module_from_spec(spec)
    real_register = reg.register
    # the old module's @register calls would collide with the live
    # registry; neuter them for the duration of the exec — we only
    # need the old module's FUNCTIONS, not its registrations
    reg.register = lambda *a, **k: (lambda fn: fn)
    try:
        spec.loader.exec_module(mod)
    finally:
        reg.register = real_register
    return mod


def rows(df):
    return sorted(map(tuple, df.collect()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-root", default="/tmp/r17_old")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from mr_py_spark.operators import dedup as new
    from mr_py_spark.session import get_spark
    from mr_py_spark.sources import tbl

    old = load_old_dedup(args.old_root)
    spark = get_spark("r17-equiv")
    docs = tbl(spark, args.sf, "documents")

    checks = []

    def check(name, a, b):
        ra, rb = rows(a), rows(b)
        ok = ra == rb
        checks.append((name, ok, len(ra), len(rb)))
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(ra)} vs {len(rb)} rows)", flush=True)
        if not ok:
            sa, sb = set(ra), set(rb)
            print("  only-old:", list(sa - sb)[:3])
            print("  only-new:", list(sb - sa)[:3])

    check("minhash_signatures", old.minhash_signatures(docs), new.minhash_signatures(docs))
    check(
        "lsh_band_entries(b=4)",
        old.lsh_band_entries(old.minhash_signatures(docs)),
        new.lsh_band_entries(new.minhash_signatures(docs)),
    )
    check(
        "lsh_band_entries(b=8)",
        old.lsh_band_entries(old.minhash_signatures(docs), 8),
        new.lsh_band_entries(new.minhash_signatures(docs), 8),
    )
    check(
        "minhash_pairs_from_bands",
        old.minhash_pairs_from_bands(old.lsh_band_entries(old.minhash_signatures(docs))),
        new.minhash_pairs_from_bands(new.lsh_band_entries(new.minhash_signatures(docs))),
    )
    check(
        "minhash_pairs capped",
        old.minhash_pairs_from_bands(
            old.lsh_band_entries(old.minhash_signatures(docs)), bucket_cap=64
        ),
        new.minhash_pairs_from_bands(
            new.lsh_band_entries(new.minhash_signatures(docs)), bucket_cap=64
        ),
    )

    import pyspark.sql.functions as F

    b = (F.col("doc_id") * F.lit(old._INC_MULT)) % F.lit(old._INC_BUCKETS)
    delta = docs.filter(b == old._INC_DELTA_BUCKET)
    corpus = docs.filter(b != old._INC_DELTA_BUCKET)
    check(
        "minhash_delta_status (recompute form)",
        old.minhash_delta_status(corpus, delta),
        new.minhash_delta_status(corpus, delta),
    )
    # the standing-index form: same prebuilt corpus bands frame both sides
    cband_old = old.lsh_band_entries(old.minhash_signatures(corpus))
    cband_new = new.lsh_band_entries(new.minhash_signatures(corpus))
    check(
        "minhash_delta_status (corpus_bands form)",
        old.minhash_delta_status(None, delta, corpus_bands=cband_old),
        new.minhash_delta_status(None, delta, corpus_bands=cband_new),
    )
    # non-default tau exercises the inlined double literals
    check(
        "minhash_delta_status (tau=0.75)",
        old.minhash_delta_status(corpus, delta, tau=0.75),
        new.minhash_delta_status(corpus, delta, tau=0.75),
    )

    bad = [c for c in checks if not c[1]]
    print(f"\n{len(checks) - len(bad)}/{len(checks)} equivalence checks OK")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
