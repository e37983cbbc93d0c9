"""Custom Python Data Source (Spark 4 DataSource API) — a
deterministic, PARTITIONED synthetic integer generator.

This is the A7 surface beyond file formats: `spark.read.format(...)`
backed by user Python running ON THE EXECUTORS. The reader declares
its partitions up front (`partitions()`), so Spark schedules one task
per slice and the generation parallelizes like any scan — the same
contract a custom connector to an external system (REST cursor, KV
store, queue) would implement, demonstrated here with arithmetic so an
oracle can reproduce it exactly.

Rows: id in [0, n); val = (id * id) % 997 — exact integer arithmetic
any engine can replay. Each partition generates its contiguous slice
independently (no state, no driver materialization), so `n` can be
arbitrarily large: the driver holds only partition bounds.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class IntGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        per = max(1, -(-self.n // self.num_partitions))  # ceil-div
        return [
            _Slice(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield (i, (i * i) % 997)


class IntGenDataSource(DataSource):
    """`spark.read.format("intgen").option("n", ...).load()`."""

    @classmethod
    def name(cls) -> str:
        return "intgen"

    def schema(self) -> str:
        return "id bigint, val bigint"

    def reader(self, schema) -> IntGenReader:
        return IntGenReader(self.options)
