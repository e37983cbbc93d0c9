"""Streaming file-sink test (C6/C8 production shape): stream -> parquet
with checkpointed exactly-once output, then the batch engine reads the
sink back. The memory sink in streaming/ is a harness device; this is
the durable path."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_py_spark.functions import dsum
from mr_py_spark.sources import tbl
from mr_py_spark.streaming import _events_stream
from tests.conftest import SF_DIR


def test_stream_to_parquet_sink_exactly_once(spark, tmp_path):
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    ev = _events_stream(spark, SF_DIR).select("event_id", "user_id", "value")
    q = (
        ev.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = tbl(spark, SF_DIR, "events")
    sink = spark.read.parquet(out)
    assert sink.count() == batch.count()
    assert sorted(r.event_id for r in sink.select("event_id").collect()) == sorted(
        r.event_id for r in batch.select("event_id").collect()
    )

    # restart against the same checkpoint: no new data -> no duplicates
    q2 = (
        _events_stream(spark, SF_DIR)
        .select("event_id", "user_id", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == batch.count()


def test_foreach_batch_aggregate_sink(spark, tmp_path):
    """foreachBatch: the arbitrary-sink escape hatch — run a batch
    aggregation per micro-batch and overwrite a parquet summary."""
    out = str(tmp_path / "agg_sink")
    ckpt = str(tmp_path / "ckpt_fb")

    def write_batch(df, epoch_id):
        (
            df.groupBy("event_type")
            .agg(F.count("*").alias("n"), dsum("value").alias("total"))
            .write.mode("overwrite")
            .parquet(out)
        )

    ev = _events_stream(spark, SF_DIR)
    q = (
        ev.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.event_type, r.n) for r in spark.read.parquet(out).collect()}
    want = {
        (r.event_type, r.n)
        for r in tbl(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_cdc_upsert_batch_merges_and_rewrites_only_touched_buckets(spark, tmp_path):
    """The foreachBatch LWW upsert behind stream_cdc_latest_filesink,
    driven directly through TWO batches (the bounded fixture drains in
    one, so the merge path never runs there): batch 2 must replace its
    keys' rows, keep everyone else, and leave parquet files in
    untouched buckets physically unrewritten (dynamic partition
    overwrite)."""
    import os

    from mr_py_spark.streaming import _cdc_upsert_batch

    table = str(tmp_path / "cdc_table")
    b1 = spark.createDataFrame(
        [(i, f"t{i}", "2024-01-01 00:00:00.000000", float(i)) for i in range(40)],
        "user_id long, last_event_type string, last_ts string, last_value double",
    )
    _cdc_upsert_batch(b1, table, n_buckets=8)
    first = {
        r.user_id: (r.last_event_type, r.last_value)
        for r in spark.read.parquet(table).collect()
    }
    assert len(first) == 40

    files_before = {
        os.path.join(d, f): os.path.getmtime(os.path.join(d, f))
        for d, _, fs in os.walk(table)
        for f in fs
        if f.endswith(".parquet")
    }

    b2 = spark.createDataFrame(
        [(7, "updated", "2024-01-02 00:00:00.000000", 99.0),
         (100, "new", "2024-01-02 00:00:00.000000", 1.0)],
        "user_id long, last_event_type string, last_ts string, last_value double",
    )
    _cdc_upsert_batch(b2, table, n_buckets=8)
    got = {
        r.user_id: (r.last_event_type, r.last_value)
        for r in spark.read.parquet(table).collect()
    }
    assert len(got) == 41  # 40 originals - 0 dropped + 1 new
    assert got[7] == ("updated", 99.0)
    assert got[100] == ("new", 1.0)
    for k, v in first.items():
        if k != 7:
            assert got[k] == v, k

    # buckets not containing keys 7 or 100 keep their original files
    touched = {
        r.b
        for r in spark.createDataFrame([(7,), (100,)], "user_id long")
        .select(F.pmod(F.xxhash64("user_id"), F.lit(8)).alias("b"))
        .collect()
    }
    for path, mtime in files_before.items():
        bucket = int(path.split("bucket=")[1].split("/")[0])
        if bucket not in touched:
            assert os.path.exists(path) and os.path.getmtime(path) == mtime, path
