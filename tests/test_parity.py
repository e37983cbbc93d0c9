"""Oracle differential tests (SURVEY.md §5.1) — the local mirror of the
driver's correctness gate: run every registered query in Spark and its
oracle SQL in DuckDB, compare row count, column names, and values
(order-insensitive, tiny float tolerance).

Runs at sf0.001 by default for speed; set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to reproduce the driver's scale.
"""

from __future__ import annotations

import math

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
import os as _os

_SKIP = set(_os.environ.get("SKIP_QUERIES", "").split(",")) - {""}
ORACLE_QUERIES = sorted(
    name for name, q in REG.items() if q.oracle is not None and name not in _SKIP
)
ROWS_ONLY_QUERIES = sorted(
    name for name, q in REG.items() if q.oracle is None and name not in _SKIP
)


def canon(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def key(row):
        return tuple(
            (v is None, "" if v is None else str(v)) for v in (row[i] for i in order)
        )

    return sorted((tuple(row[i] for i in order) for row in rows), key=key), [
        colnames[i] for i in order
    ]


def values_equal(a, b) -> bool:
    """BITWISE comparison, matching the driver's value hash: the float
    policy (mr_py_spark/functions) is designed so both engines emit
    identical doubles — a tolerance here would mask policy violations
    (it hid a sum-of-squares 2^53 cast divergence once)."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, oracle):
    q = REG[name]
    sdf = q.fn(spark, SF_DIR)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns

    cur = oracle.execute(q.oracle)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(o_cols), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} (spark) != {len(o_rows)} (oracle)"
    )

    sc, cols = canon(s_rows, s_cols)
    oc, _ = canon(o_rows, o_cols)
    for i, (sr, orow) in enumerate(zip(sc, oc)):
        for c, (sv, ov) in enumerate(zip(sr, orow)):
            assert values_equal(sv, ov), (
                f"{name}: row {i} col {cols[c]}: spark={sv!r} oracle={ov!r}"
            )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark):
    """Rows-only queries must at least run and return a stable schema."""
    q = REG[name]
    df = q.fn(spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    df.limit(5).collect()
