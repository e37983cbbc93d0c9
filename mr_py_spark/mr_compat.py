"""MapReduce compatibility veneer (SURVEY.md §2A: A1-A9).

API parity with the reference engine's programmatic entry point
(SURVEY.md §3 EP1, reconstructed: ``mapreduce(mapper, reducer, input)``
with ``mapper(record) -> iter[(k, v)]`` and
``reducer(key, values) -> iter[out]``), re-expressed on Spark:

- map phase   -> ``mapInPandas`` (Arrow-batched; the mapper runs over
  record dicts, batch-at-a-time, not via row-at-a-time pickling)
- shuffle     -> ``groupBy(key)`` (Catalyst exchange)
- reduce phase-> ``applyInPandas`` (whole group in one pandas frame)
- combiner    -> not needed as user code: for algebraic reducers use
  the native ``groupBy().agg()`` operators instead, where Catalyst
  always plans partial aggregation ([MR04 §4.3] for free)
- partitioner -> ``repartition(n, key)``; sort order -> ``sortWithinPartitions``
- chaining    -> the returned DataFrame feeds the next ``mapreduce`` call;
  unlike the reference (one materialized staging file per job,
  [MRDP ch.6]) the chain stays one lazy Catalyst plan.

This is deliberately the *slow path* — arbitrary Python per record is
what the reference sells, and what Spark charges Arrow-transfer for.
The engine's native operators cover every [MRDP] pattern without it;
this module exists for capability parity and for genuinely custom
per-group logic.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

Mapper = Callable[[dict[str, Any]], Iterable[tuple]]
Reducer = Callable[[Any, list[Any]], Iterable[Any]]


def _schema_of(schema: str | StructType, df: DataFrame) -> StructType:
    if isinstance(schema, StructType):
        return schema
    # Parse a DDL string ("k string, v long") through the active session.
    return df.sparkSession.createDataFrame([], schema).schema


def map_phase(df: DataFrame, mapper: Mapper, map_schema: str | StructType) -> DataFrame:
    """A1: apply ``mapper(record) -> iter[(k, v, ...)]`` to every record.

    Runs inside ``mapInPandas``: one Python worker per partition,
    Arrow-batched both ways, so per-record overhead is a dict build +
    the user function — no per-row serialization round trip.
    """
    schema = _schema_of(map_schema, df)
    cols = schema.fieldNames()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for rec in pdf.to_dict("records"):
                out.extend(tuple(kv) for kv in mapper(rec))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(run, schema)


def reduce_phase(
    mapped: DataFrame,
    reducer: Reducer,
    out_schema: str | StructType,
    key_cols: tuple[str, ...] = ("k",),
    sort_values_by: tuple[str, ...] = (),
) -> DataFrame:
    """A2+A3(+A6): group by key and apply ``reducer(key, values)``.

    ``values`` is the list of per-record dicts of the non-key columns
    (or the bare value when there is exactly one non-key column, to
    match the reference's ``(k, v)`` shape). ``sort_values_by`` gives
    the MR secondary-sort: values arrive ordered within the group.
    """
    schema = _schema_of(out_schema, mapped)
    cols = schema.fieldNames()
    val_cols = [c for c in mapped.columns if c not in key_cols]

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if sort_values_by:
            pdf = pdf.sort_values(list(sort_values_by), kind="mergesort")
        if len(val_cols) == 1:
            values = pdf[val_cols[0]].tolist()
        else:
            values = pdf[val_cols].to_dict("records")
        k = key[0] if len(key) == 1 else key
        rows = [tuple(r) if isinstance(r, (tuple, list)) else (r,) for r in reducer(k, values)]
        return pd.DataFrame(rows, columns=cols)

    return mapped.groupBy(*key_cols).applyInPandas(run, schema)


def mapreduce(
    df: DataFrame,
    mapper: Mapper,
    reducer: Reducer,
    map_schema: str | StructType,
    out_schema: str | StructType,
    key_cols: tuple[str, ...] = ("k",),
    sort_values_by: tuple[str, ...] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """A9: one full reference-style job: map -> shuffle -> reduce.

    ``num_partitions`` mirrors the reference's partitioner knob (A5);
    leave None to let AQE size the exchange.
    """
    mapped = map_phase(df, mapper, map_schema)
    if num_partitions is not None:
        mapped = mapped.repartition(num_partitions, *key_cols)
    return reduce_phase(mapped, reducer, out_schema, key_cols, sort_values_by)
