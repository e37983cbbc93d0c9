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


def test_compare_frames_dtype_classes_pure_pandas():
    """Comparator unit coverage without engines: the dtype-class gate
    must flag int-vs-float and decimal-vs-float columns on equal
    values, pass bitwise-equal frames (incl. arrays and NaNs), treat
    all-null columns as classless, and compare rows order-free."""
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    from tests.test_parity import compare_frames

    # equal values, diverging dtype -> flagged (the driver hash's view)
    a = pd.DataFrame({"x": np.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"x": np.array([1.0, 2.0], dtype="float64")})
    assert any("dtype class" in e for e in compare_frames(a, b))

    d = pd.DataFrame({"x": [Decimal("1"), Decimal("2")]})
    assert any("dtype class" in e for e in compare_frames(d, b))

    # bitwise-equal frames pass, row order free, NaN == NaN
    a1 = pd.DataFrame({"x": [1.5, float("nan")], "y": ["p", "q"]})
    a2 = pd.DataFrame({"x": [float("nan"), 1.5], "y": ["q", "p"]})
    assert compare_frames(a1, a2) == []

    # 1-ULP float difference -> value mismatch (bitwise policy)
    b1 = pd.DataFrame({"x": [1.0 + 2**-52]})
    b2 = pd.DataFrame({"x": [1.0]})
    assert compare_frames(b1, b2)

    # arrays compare elementwise; list vs numpy array is equal content
    c1 = pd.DataFrame({"v": [np.array([1, 2]), np.array([3])]})
    c2 = pd.DataFrame({"v": [[1, 2], [3]]})
    assert compare_frames(c1, c2) == []
    c3 = pd.DataFrame({"v": [[1, 2], [4]]})
    assert compare_frames(c1, c3)

    # int inside an array vs float inside an array -> mismatch
    c4 = pd.DataFrame({"v": [[1.0, 2.0], [3.0]]})
    assert compare_frames(c1, c4)

    # all-null column carries no dtype evidence on either side
    n1 = pd.DataFrame({"x": pd.array([None, None], dtype="object"), "k": [1, 2]})
    n2 = pd.DataFrame({"x": np.array([np.nan, np.nan]), "k": [1, 2]})
    assert compare_frames(n1, n2) == []

    # column-name and row-count gates
    assert compare_frames(pd.DataFrame({"x": [1]}), pd.DataFrame({"y": [1]}))
    assert compare_frames(pd.DataFrame({"x": [1]}), pd.DataFrame({"x": [1, 1]}))


def test_compare_frames_struct_field_order_cannot_mispair_rows():
    """Row pairing sorts on a canonical string: two engines returning
    equal structs with different field insertion order must still pair
    row-for-row (str() of a dict is order-dependent; the canonical
    form sorts keys)."""
    import pandas as pd

    from tests.test_parity import compare_frames

    a = pd.DataFrame({"s": [{"a": 1, "b": 2}, {"a": 3, "b": 4}], "k": [1, 2]})
    b = pd.DataFrame({"s": [{"b": 4, "a": 3}, {"b": 2, "a": 1}], "k": [2, 1]})
    assert compare_frames(a, b) == []
    c = pd.DataFrame({"s": [{"b": 9, "a": 3}, {"b": 2, "a": 1}], "k": [2, 1]})
    assert compare_frames(a, c)
