"""Oracle differential tests (SURVEY.md §5.1) — the local mirror of the
driver's correctness gate: run every registered query in Spark and its
oracle SQL in DuckDB, compare row count, column names, and values
(order-insensitive, BITWISE).

Both sides are materialized THROUGH PANDAS (Spark ``toPandas()``,
DuckDB ``.df()``) and each column's pandas dtype CLASS must match
before values are compared. This mirrors the driver's hash, which sees
the pandas representation: three false-red rounds (skew_audit r7,
attribution_multi_touch + kmeans_inertia r9) were value-identical
results whose pandas dtypes diverged (DuckDB HUGEINT / DECIMAL(38,0)
-> float64 vs Spark long / Decimal object) — the old ``str()`` +
float-tolerance comparator over fetchall() could not see that.
tests/test_canonicalization.py pins the r9 oracle forms as regressions.

Runs at sf0.001 by default for speed; set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to reproduce the driver's scale.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os as _os

import numpy as np
import pandas as pd
import pytest

from mr_py_spark.registry import load_all
from tests.conftest import SF_DIR

REG = load_all()
# Mirror scripts/duckdb_baseline.py's SKIP_QUERIES: at sf >= 1 a few
# ORACLES are inherently infeasible (knn_selfjoin's all-pairs,
# graph_triangles' two-hop wedge join, khop_reach's walk-enumerating
# recursive CTE) — skip by name, e.g.
#   SPARK_GRAFT_TEST_SF_DIR=/tmp/sparkgraft/sf1 \
#   SKIP_QUERIES=knn_selfjoin,graph_triangles,khop_reach \
#   pytest tests/test_parity.py -q
_SKIP = set(_os.environ.get("SKIP_QUERIES", "").split(",")) - {""}
ORACLE_QUERIES = sorted(
    name for name, q in REG.items() if q.oracle is not None and name not in _SKIP
)
ROWS_ONLY_QUERIES = sorted(
    name for name, q in REG.items() if q.oracle is None and name not in _SKIP
)


def _is_null(v) -> bool:
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        return False
    return v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v))


def dtype_class(col: pd.Series) -> str:
    """Canonical dtype class of a pandas column — the strictness that
    mirrors the driver hash. int64 vs float64 is a MISMATCH even when
    every value is numerically equal (DuckDB HUGEINT/DECIMAL columns
    materialize as float64; Spark long materializes as int64 — the
    driver hashes those differently)."""
    k = col.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    # object column: classify by the first non-null value
    nn = [v for v in col if not _is_null(v)]
    if not nn:
        return "null"
    v = nn[0]
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, str):
        return "str"
    if isinstance(v, _decimal.Decimal):
        return "decimal"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, _dt.datetime):
        return "datetime"
    if isinstance(v, _dt.date):
        return "date"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "array"
    if isinstance(v, dict):
        return "struct"
    return type(v).__name__


def _norm(v):
    """Lift a cell to a plain-Python value for sorting/compare (numpy
    scalars -> .item() keeps the exact bits; arrays -> tuples)."""
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def values_equal(a, b) -> bool:
    """BITWISE comparison, matching the driver's value hash: the float
    policy (mr_py_spark/functions) is designed so both engines emit
    identical doubles — a tolerance here would mask policy violations
    (it hid a sum-of-squares 2^53 cast divergence once)."""
    na, nb = _is_null(a), _is_null(b)
    if na or nb:
        return na and nb
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(values_equal(a[k], b[k]) for k in a)
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    # float-vs-int inside nested values is a mismatch, not a coercion
    if isinstance(a, float) != isinstance(b, float):
        return False
    return a == b


def _canon_str(v) -> str:
    """Canonical sort string: dicts serialize with SORTED keys so two
    engines' field orders cannot mispair rows (str() of a dict depends
    on insertion order); sequences recurse."""
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_str(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_str(x) for x in v) + "]"
    return str(v)


def _sort_key(row):
    return tuple((_is_null(v), _canon_str(v)) for v in row)


def canon_frame(df: pd.DataFrame):
    """(sorted column names, per-column dtype classes, rows sorted by
    string key, every cell normalized to plain Python)."""
    cols = sorted(df.columns)
    classes = {c: dtype_class(df[c]) for c in cols}
    rows = [tuple(_norm(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort(key=_sort_key)
    return cols, classes, rows


def compare_frames(s_pd: pd.DataFrame, o_pd: pd.DataFrame) -> list[str]:
    """Driver-faithful diff of a Spark result frame vs an oracle frame.
    Returns a list of human-readable mismatch strings (empty == green).
    Column-name set, row count, per-column pandas dtype CLASS, and
    bitwise values must all agree."""
    errs: list[str] = []
    if sorted(s_pd.columns) != sorted(o_pd.columns):
        return [f"column names differ: {sorted(s_pd.columns)} != {sorted(o_pd.columns)}"]
    if len(s_pd) != len(o_pd):
        return [f"row count {len(s_pd)} (spark) != {len(o_pd)} (oracle)"]
    cols, s_cls, s_rows = canon_frame(s_pd)
    _, o_cls, o_rows = canon_frame(o_pd)
    for c in cols:
        # an all-null column carries no dtype evidence on either side
        if "null" in (s_cls[c], o_cls[c]):
            continue
        if s_cls[c] != o_cls[c]:
            errs.append(f"col {c}: dtype class spark={s_cls[c]} oracle={o_cls[c]}")
    if errs:
        return errs
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for c, (sv, ov) in enumerate(zip(sr, orow)):
            if not values_equal(sv, ov):
                errs.append(f"row {i} col {cols[c]}: spark={sv!r} oracle={ov!r}")
                if len(errs) >= 10:
                    return errs
    return errs


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, oracle):
    q = REG[name]
    s_pd = q.fn(spark, SF_DIR).toPandas()
    o_pd = oracle.execute(q.oracle).df()
    errs = compare_frames(s_pd, o_pd)
    assert not errs, f"{name}: " + "; ".join(errs)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark):
    """Rows-only queries must at least run and return a stable schema."""
    q = REG[name]
    df = q.fn(spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    df.limit(5).collect()
