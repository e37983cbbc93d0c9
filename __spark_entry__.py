"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``mr_py_spark`` package; this module is
the thin adapter over its query registry (mr_py_spark/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mr_py_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-shaped join+agg+top-k) on sf0.001."""
    reg = load_all()
    return reg["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query — all
    streaming queries included (a drained bounded stream's emission
    set is deterministic SQL). The ~15 absent here (seeded sampling,
    LSH-family dedup, ANN tier, sketches, shuffle) are
    nondeterministic-by-design or engine-specific and carry pytest
    property tests instead (SURVEY.md §5)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
