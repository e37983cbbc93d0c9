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
