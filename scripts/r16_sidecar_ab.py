#!/usr/bin/env python
"""r16 sidecar A/B: 1-row-parquet metadata sidecars vs atomic JSON files.

Every per-batch maintenance path (replay_guard, raise_watermark, the LSH
banding lookup, and every _table_location call under the gauge/drift
sidecar readers) paid one or more of three primitives. This script
interleaves the LEGACY forms (replicated verbatim from the pre-r16 code)
against the shipped forms in ONE session (the CLAUDE.md interleaving
rule) on a private standing table:

  P1  table location   : DESCRIBE FORMATTED command  vs JVM catalog lookup
  P2  sidecar read     : spark.read.parquet().collect vs json file read
  P3  sidecar write    : 1-row DataFrame parquet write vs json tmp+rename

plus the end-to-end shipped paths (lsh_table_band_rows warm,
replay_guard fresh fast path, raise_watermark no-op raise).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 7


def timed_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from mr_py_spark.operators.bucketed import (
        _BUCKETS,
        _table_location,
        replay_guard,
        raise_watermark,
        sidecar_read_json,
        sidecar_write_json,
    )
    from mr_py_spark.operators.dedup import (
        _LSH_INDEX_KEYS,
        corpus_lsh_index,
        lsh_table_band_rows,
    )
    from mr_py_spark.session import get_spark

    spark = get_spark("r16-sidecar-ab")
    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    corpus_lsh_index(spark, d)
    tag = f"b{_BUCKETS}_" + re.sub(r"[^0-9a-zA-Z]+", "_", d.strip("/"))
    table = f"mrps_bkt_lsh_bands_k2_{tag}"
    loc = _table_location(spark, table).rstrip("/")
    jside = loc + "_ab_json"
    pside = loc + "_ab_parquet"

    def legacy_location():
        return re.sub(
            r"^file:",
            "",
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .filter(F.col("col_name") == "Location")
            .head()
            .data_type,
        )

    def legacy_write():
        spark.createDataFrame([(123,)], "wm long").write.mode(
            "overwrite"
        ).parquet(pside)

    def legacy_read():
        return spark.read.parquet(pside).agg(F.max("wm")).collect()[0][0]

    legacy_write()
    sidecar_write_json(jside, {"wm": 123})

    rows = {}
    for name, legacy, new in [
        ("P1 location", legacy_location, lambda: _table_location(spark, table)),
        ("P2 read", legacy_read, lambda: sidecar_read_json(jside)),
        ("P3 write", legacy_write, lambda: sidecar_write_json(jside, {"wm": 1})),
    ]:
        legacy(); new()  # warm both
        # interleave: L,N,L,N,... so load drift hits both alike
        ls, ns = [], []
        for _ in range(REPS):
            ls.append(timed_once(legacy))
            ns.append(timed_once(new))
        rows[name] = (min(ls), min(ns))

    # end-to-end shipped paths
    lsh_table_band_rows(spark, table)
    e2e = {}
    e2e["band_rows warm"] = min(
        timed_once(lambda: lsh_table_band_rows(spark, table))
        for _ in range(REPS)
    )
    sch = "doc_id long, band_id long, band_key string, " + ", ".join(
        f"mh{i} long" for i in range(16)
    )

    def fresh(k):
        return spark.createDataFrame(
            [(10**13 + k * 10 + i, 0, "x", *[0] * 16) for i in range(3)], sch
        )

    replay_guard(spark, table, fresh(0), "doc_id").count()
    e2e["replay_guard fresh"] = min(
        timed_once(lambda k=k: replay_guard(spark, table, fresh(k), "doc_id"))
        for k in range(1, REPS + 1)
    )
    e2e["raise_watermark"] = min(
        timed_once(lambda k=k: raise_watermark(spark, table, fresh(k), "doc_id"))
        for k in range(1, REPS + 1)
    )

    print(f"{'primitive':<16}{'legacy':>10}{'shipped':>10}{'ratio':>8}")
    for name, (l, n) in rows.items():
        print(f"{name:<16}{l:>10.4f}{n:>10.4f}{l / max(n, 1e-9):>8.1f}x")
    for name, v in e2e.items():
        print(f"{name:<26}{v:>10.4f}s (shipped end-to-end)")
    import shutil

    shutil.rmtree(pside, ignore_errors=True)
    try:
        os.remove(jside)
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
