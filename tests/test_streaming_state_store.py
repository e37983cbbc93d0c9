"""State-store provider parity (verdict r4 item 5): every stateful
streaming query must drain to IDENTICAL results under the default
HDFS-backed (in-memory) provider and the RocksDB provider — the
backend Spark ships for state that exceeds executor memory, which is
the one remaining 100 TB scale risk in C8/C9. Provider choice is an
execution detail; any row difference means state semantics leaked into
results.
"""

from __future__ import annotations

import pytest

from mr_py_spark.registry import load_all
from mr_py_spark.streaming import _ROCKSDB_PROVIDER
from tests.conftest import SF_DIR

REG = load_all()

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

#: Every streaming query that keeps keyed state across micro-batches:
#: built-in agg (complete), windowed agg + watermark (append), session
#: windows, dropDuplicatesWithinWatermark, applyInPandasWithState, and
#: the stream-stream interval join's buffered-rows state.
STATEFUL = (
    "stream_agg_complete",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_stateful_counts",
    "stream_dedup",
    "stream_stream_join",
)


def _rows(spark, name):
    return sorted(map(tuple, REG[name].fn(spark, SF_DIR).collect()))


@pytest.mark.parametrize("name", STATEFUL)
def test_rocksdb_state_store_parity(spark, name):
    baseline = _rows(spark, name)  # default HDFSBackedStateStoreProvider
    old = spark.conf.get(_PROVIDER_KEY, None)
    try:
        spark.conf.set(_PROVIDER_KEY, _ROCKSDB_PROVIDER)
        rocks = _rows(spark, name)
    finally:
        spark.conf.unset(_PROVIDER_KEY) if old is None else spark.conf.set(
            _PROVIDER_KEY, old
        )
    assert rocks == baseline


def test_transform_with_state_capability_gated(spark):
    """`stream_stateful_counts_tws` (transformWithStateInPandas, the
    Spark 4.x successor API) registers exactly when its protobuf
    dependency is importable — the JVM-side Python driver worker
    imports google.protobuf at startup and crashes the query without
    it. Where available it must match the applyInPandasWithState
    result bitwise (shared oracle, shared scaled-long accumulation)."""
    from mr_py_spark.streaming import _tws_available

    reg = load_all()
    if not _tws_available():
        assert "stream_stateful_counts_tws" not in reg
        pytest.skip("python protobuf not installed in this container (documented)")
    got = sorted(map(tuple, reg["stream_stateful_counts_tws"].fn(spark, SF_DIR).collect()))
    base = sorted(map(tuple, reg["stream_stateful_counts"].fn(spark, SF_DIR).collect()))
    assert got == base
