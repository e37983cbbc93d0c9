"""Regression pins for the pandas-dtype false-red class (r7 skew_audit,
r9 attribution_multi_touch + kmeans_inertia): oracles whose outer
aggregate promotes to DuckDB HUGEINT / DECIMAL(38,0) materialize as
float64 through ``.df()`` while Spark emits long — value-identical
results the driver hash still flags, because the hash sees the pandas
dtype. tests/test_parity.py's comparator must see it too.

Each test re-runs the FIXED Spark query against the literal r9 oracle
form (reconstructed by string surgery on the registered oracle, with
an assertion that the surgery took) and demands the comparator flags a
dtype-class mismatch; the registered (fixed) oracle must be clean.
These run on the events/embeddings fixtures at SF_DIR, same as parity.
"""

from __future__ import annotations

from mr_py_spark.registry import load_all
from tests.conftest import SF_DIR
from tests.test_parity import compare_frames

REG = load_all()


def _check(spark, oracle, name: str, old: str, new: str):
    q = REG[name]
    assert new in q.oracle, f"{name}: fixed oracle no longer contains {new!r}"
    r9_oracle = q.oracle.replace(new, old)
    assert r9_oracle != q.oracle

    s_pd = q.fn(spark, SF_DIR).toPandas()

    # the r9 form: values identical, pandas dtype diverges -> must flag
    errs_old = compare_frames(s_pd, oracle.execute(r9_oracle).df())
    assert errs_old and any("dtype class" in e for e in errs_old), (
        f"{name}: comparator failed to flag the r9 false-red oracle form: {errs_old}"
    )
    # the fixed form: clean
    errs_new = compare_frames(s_pd, oracle.execute(q.oracle).df())
    assert not errs_new, f"{name}: fixed oracle still mismatches: {errs_new}"


def test_attribution_r9_oracle_form_flagged(spark, oracle):
    _check(
        spark,
        oracle,
        "attribution_multi_touch",
        old="sum(CAST(floor(1000000000.0 / n_path) AS BIGINT))\n"
        "                                        AS credit_ns",
        new="CAST(sum(CAST(floor(1000000000.0 / n_path) AS BIGINT))\n"
        "                    AS BIGINT)          AS credit_ns",
    )


def test_kmeans_inertia_r9_oracle_form_flagged(spark, oracle):
    _check(
        spark,
        oracle,
        "kmeans_inertia",
        old="CAST(sum(sse) AS DECIMAL(38,0)) AS sse",
        new="CAST(sum(sse) AS BIGINT) AS sse",
    )
