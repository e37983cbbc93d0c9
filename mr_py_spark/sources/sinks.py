"""Sinks (SURVEY.md §2A A8, §2B B14/B22).

The reference writes `key\\tvalue` text lines; the Spark-native sinks
are columnar parquet with layout control:

- :func:`write_partitioned` — hive-style directory partitioning
  ([MRDP ch.4] partitioning pattern): downstream readers get partition
  pruning on the routing key for free.
- :func:`write_bucketed` — bucketed + sorted table ([MRDP ch.5]
  composite join prerequisite): later equi-joins/aggs on the bucket
  key skip the shuffle entirely. This is the 100 TB answer for a fact
  table that is joined on the same key every day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, *cols: str, mode: str = "overwrite") -> None:
    """Write parquet partitioned by ``cols`` (B14)."""
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | tuple[str, ...] | list[str],
    n_buckets: int = 8,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed, per-bucket-sorted table (B22). ``key``
    may be a composite (tuple/list): a join avoids the bucketed side's
    exchange only when the bucket columns equal the FULL join key set
    (co-partitioning requires all cluster keys, r11 plan audit) — so
    bucket by exactly what you join on. With ``path`` the table is
    EXTERNAL (data at ``path``, only metadata in the catalog) —
    required on externally-owned sessions whose static
    ``spark.sql.warehouse.dir`` points somewhere unwritable."""
    keys = [key] if isinstance(key, str) else list(key)
    if mode != "append" and path is not None:
        # a (re)created table invalidates any replay-guard watermark
        # sidecar a previous generation left at this path: a stale
        # watermark BELOW the new contents' ids would let a replayed
        # append pass unchecked (bucketed.replay_guard's invariant is
        # per table generation; stale-HIGH is safe, stale-LOW is not)
        import shutil as _sh

        _sh.rmtree(path.rstrip("/") + "_rwm", ignore_errors=True)
        # same reasoning for the LSH banding sidecar: a recreated table
        # at the build-default banding under a stale 8-row sidecar
        # would band its appends wrong (mixed-banding corruption)
        _sh.rmtree(path.rstrip("/") + "_banding", ignore_errors=True)
    w = (
        df.write.mode(mode)
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
