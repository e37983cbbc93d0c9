"""Checkpoint crash-recovery (verdict r5 item 2): RocksDB parity proves
the state-store BACKENDS agree on a clean drain; this proves the reason
checkpoints exist — a stateful query stopped mid-stream and restarted
from its checkpoint must end in exactly the state a single
uninterrupted run reaches.

Topology: the events fixture is split into two parquet files such that
EVERY user has rows in both halves. Run 1 sees only half 0, drains, and
stops (the "crash" between micro-batches — the granularity at which
Structured Streaming commits offsets+state). Half 1 then lands in the
source directory and run 2 restarts from the same checkpoint with a
fresh foreachBatch sink. Because each user is in half 1, every user's
state re-emits in run 2 — and each emitted (count, total) must equal
the FULL two-half batch aggregate, which is only possible if run 2
recovered run 1's per-key state from the checkpoint (half-1-only counts
differ for every user by construction). Asserted under both state-store
providers; total_value goes through the repo-wide scaled-long dec4
policy so the comparison is bitwise.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mr_py_spark.sources import tbl
from mr_py_spark.streaming import _ROCKSDB_PROVIDER, quantize4
from tests.conftest import SF_DIR

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_SCHEMA = "user_id long, value double"


def _write_halves(spark, root: str) -> tuple[str, str, dict]:
    """Split events into two single-file parquet halves, alternating
    per-user rows so every user appears in both. Returns (src_dir,
    half1_file, full per-user batch truth)."""
    ev = (
        tbl(spark, SF_DIR, "events")
        .select("user_id", "value", "ts", "event_id")
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        )
    )
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)
    halves = []
    for i in (0, 1):
        out = os.path.join(root, f"h{i}")
        ev.filter(F.col("rn") % 2 == i).select("user_id", "value").coalesce(
            1
        ).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        halves.append(os.path.join(root, f"half{i}.parquet"))
        shutil.copy(part, halves[-1])
    shutil.copy(halves[0], os.path.join(src, "half0.parquet"))

    truth = {
        r["user_id"]: (r["n"], r["scaled"])
        for r in tbl(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(10,4)") * 10000)
            .cast("long")
            .alias("scaled"),
        )
        .collect()
    }
    return src, halves[1], truth


def _run(spark, src: str, ckpt: str) -> dict:
    """Start the stateful stream over ``src`` from checkpoint ``ckpt``,
    drain everything currently available, stop. Returns the LAST
    emitted (n_events, scaled) per user collected via foreachBatch —
    the production recovery sink (memory-sink restart semantics don't
    apply)."""
    emitted: dict = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            emitted[r["user_id"]] = (r["n_events"], r["scaled"])

    def update(key, pdfs, state):
        # Same per-key running (count, scaled-long total) as
        # stream_stateful_counts — integer state, order-independent.
        # Nested (not module-level) so cloudpickle ships it by VALUE:
        # workers cannot import pytest test modules by name.
        import pandas as pd

        n, scaled = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            scaled += int(quantize4(pdf["value"].to_numpy()).sum())
        state.update((n, scaled))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "scaled": [scaled]}
        )

    stream = (
        spark.readStream.schema(_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    counts = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, scaled long",
        stateStructType="n long, scaled long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    q = (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return emitted


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_checkpoint_recovery_resumes_state(spark, tmp_path, provider):
    old = spark.conf.get(_PROVIDER_KEY, None)
    if provider == "rocksdb":
        spark.conf.set(_PROVIDER_KEY, _ROCKSDB_PROVIDER)
    try:
        root = str(tmp_path / provider)
        src, half1, truth = _write_halves(spark, root)
        ckpt = os.path.join(root, "ckpt")

        run1 = _run(spark, src, ckpt)  # sees half 0 only, then "crashes"
        assert set(run1) == set(truth)
        assert all(run1[u][0] < truth[u][0] for u in truth)  # strictly partial

        shutil.copy(half1, os.path.join(src, "half1.parquet"))
        run2 = _run(spark, src, ckpt)  # restart from the same checkpoint

        # Every user re-emits in run 2 (each has half-1 rows), and the
        # resumed state must equal the uninterrupted full aggregate.
        assert run2 == truth
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, old)
