"""Round-14 A/B — does PCA whitening actually precondition the
quantizers it feeds? (VERDICT r13 item 1: emb_pca_whiten's docstring
claimed "the standard preconditioner before IVF/PQ quantization" with
no consumer and no evidence.)

Two corpora, same audit (emb_whiten_quantizer_audit's machinery —
plain-L2 IVF occupancy balance + PQ reconstruction MSE scored in RAW
space via the un-whitening matrix, so raw and whitened variants are
comparable):

- the fixture embeddings as-is — near-ISOTROPIC by construction, the
  regime where whitening has nothing to fix and only amplifies
  sampling noise;
- a spectrally-decayed variant (dimension j scaled by exp(-3j/d),
  variance condition number ~400) — the anisotropic shape real
  embedding models produce, the regime the claim is about.

Either direction is a recorded answer; the operator docstring cites
this script's numbers.

Usage: python scripts/r14_whiten_ab.py --sf-dir /tmp/sparkgraft/sf10mut
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from mr_py_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft/sf10mut")
    args = ap.parse_args()

    spark = get_spark()
    sf = args.sf_dir

    from mr_py_spark.operators.similarity import (
        _emb_double,
        _pca_moments,
        _pca_whiten_frame,
        _quantizer_stats,
    )
    from mr_py_spark.sources import tbl

    base = _emb_double(tbl(spark, sf, "embeddings"), "v")
    d = len(base.select("v").head()[0])
    scales = [math.exp(-3.0 * j / d) for j in range(d)]
    aniso = base.select(
        "vec_id",
        F.zip_with(
            "v", F.array(*[F.lit(s) for s in scales]), lambda a, b: a * b
        ).alias("v"),
    )

    for label, frame in (("isotropic-fixture", base), ("spectral-decay", aniso)):
        mom = _pca_moments(spark, frame)
        mu, w_mat, w_inv = mom
        t0 = time.time()
        raw = _quantizer_stats(spark, frame, np.eye(d))
        t_raw = time.time() - t0
        wfr = _pca_whiten_frame(spark, frame).withColumnRenamed("w", "v")
        t0 = time.time()
        white = _quantizer_stats(spark, wfr, w_inv)
        t_white = time.time() - t0
        for name, (cells, occ_max, cv, mse), t in (
            ("raw", raw, t_raw), ("whitened", white, t_white),
        ):
            print(
                f"{label:18s} {name:8s} cells={cells} occ_max={occ_max} "
                f"occ_cv={cv:.3f} pq_mse_raw={mse:.5f} ({t:.1f} s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
