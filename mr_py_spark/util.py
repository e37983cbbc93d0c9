"""Shared cross-operator helpers.

Hosts the tiny utilities several operator modules need so that no
module has to import another module's underscore-private symbols
(similarity.py originally owned ``_bc``; windows.py grew a dependency
on it — both now import from here).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class _LocalBroadcast:
    """Closure-captured fallback when no SparkContext exists (Spark
    Connect): cloudpickle ships the value inside the UDF instead of a
    torrent broadcast — same semantics, higher serialization cost."""

    def __init__(self, value):
        self.value = value


def bc(spark: SparkSession, value):
    """Broadcast ``value`` to executors, falling back to closure
    capture on Spark Connect sessions that expose no SparkContext."""
    try:
        return spark.sparkContext.broadcast(value)
    except Exception:
        return _LocalBroadcast(value)


def shuffle_width(spark: SparkSession, default: int = 32) -> int:
    """The session's declared reducer width, parse-hardened.

    ``spark.sql.shuffle.partitions`` may be unset or non-numeric
    (e.g. "auto" on platforms with AQE auto-partitioning), so every
    operator that sizes fan-out from it must go through this guard
    rather than a bare ``int(conf.get(...))``.
    """
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", str(default)))
    except (TypeError, ValueError):
        return default
