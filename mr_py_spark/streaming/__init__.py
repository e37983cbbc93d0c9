"""Structured Streaming surface (SURVEY.md §2C: C6-C9).

The reference has no streaming at all (SURVEY.md §1.1); the driver's
events table is stream-shaped (monotone-ish ts). These queries run the
*same* windowed aggregations as operators/events_windows.py, but
through `readStream` -> watermark -> `writeStream`, driven to
completion synchronously with an availableNow-style drain into a
memory sink, then returned as a DataFrame for the harness.

Notes:
- Every query here is oracle-checked: on a fully-drained bounded
  stream the emitted set is deterministic — complete-mode aggregates
  equal the batch answer, append-mode windows/sessions emit exactly
  what the final watermark closed, inner interval joins emit every
  provable match, and dedup emits the distinct key set — each
  expressible as plain SQL over the same fixture.
- The memory sink is a test/dev harness device; production sinks are
  kafka/parquet/foreachBatch and take the identical plan.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4, dsum, fmt_ts, fmt_ts_us
from mr_py_spark.registry import register
from mr_py_spark.session import harden

_qid = itertools.count()


def stream_table_tag(sf_dir: str) -> str:
    """The per-sf_dir suffix of the streaming maintenance loops' table
    names (mrps_stream_lsh_idx_<tag> / mrps_stream_ivf_{cent,idx}_<tag>)
    — one owner for the naming scheme so external tooling (the r12
    lifecycle demo) can locate the tables without re-deriving it."""
    import re

    return re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same ns->µs
    normalization as the batch catalog (sources/catalog.py)."""
    harden(spark)
    from mr_py_spark.sources import tbl

    raw_schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet").schema
    # FileStreamSource wants a directory; glob-filter to the events file.
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir.rstrip("/"))
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        # Watermarks require TimestampType (not NTZ); the session TZ is
        # pinned to UTC by harden(), so the instant values match the
        # batch catalog's NTZ values exactly.
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Environments where the nanosAsLong legacy conf doesn't apply
        # surface TIMESTAMP(NANOS) parquet as TIMESTAMP_NTZ, which
        # withWatermark rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
        # harden() pins the session TZ to UTC, so NTZ -> TIMESTAMP is
        # the identity on the underlying instants.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


#: RocksDB-backed state store: the 100 TB answer for stateful streaming
#: (state spills to local disk + changelog instead of executor heap, so
#: per-key state survives key cardinalities far beyond memory). Opt in
#: with SPARK_GRAFT_STATE_STORE=rocksdb; results are provider-
#: independent (asserted by tests/test_streaming_state_store.py).
_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _drain(df: DataFrame, mode: str, require_rocksdb: bool = False) -> DataFrame:
    """Run a bounded streaming query to completion into a memory sink.

    The sink's temp view is dropped before returning (it pins the full
    result in driver memory; repeated invocations in a long-lived
    session would otherwise accumulate) — the materialized rows are
    re-wrapped as a local DataFrame. Streaming results here are small
    aggregates by construction; production topologies use kafka/parquet/
    foreachBatch sinks instead of memory.

    ``require_rocksdb``: transformWithState only runs on the RocksDB
    provider; the conf is read at query START, so it is set here and
    restored after the drain (never left behind on an externally-owned
    session)."""
    spark = df.sparkSession
    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    force = require_rocksdb or (
        os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb"
    )
    if force:
        spark.conf.set(_PROVIDER_KEY, _ROCKSDB_PROVIDER)
    name = f"mrps_stream_{next(_qid)}"
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        if require_rocksdb:  # env-var opt-in stays session-wide on purpose
            if prev_provider is None:
                spark.conf.unset(_PROVIDER_KEY)
            else:
                spark.conf.set(_PROVIDER_KEY, prev_provider)
    sink = spark.table(name)
    rows, schema = sink.collect(), sink.schema
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)


@register(
    "stream_agg_complete",
    tags=("C6", "C9"),
    oracle="""
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
    """,
)
def stream_agg_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming global aggregate, complete mode (C9 stateful agg).
    Draining the bounded stream must reproduce the batch answer
    exactly — the unified-model guarantee, oracle-checked."""
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"), dsum("value").alias("total_value")
    )
    return _drain(agg, "complete")


@register(
    "stream_tumbling_window",
    tags=("C6", "C8"),
    oracle="""
        WITH agg AS (
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1
        )
        SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS bucket,
               n_events, total_value
        FROM agg
        WHERE w_start + INTERVAL 1 HOUR <= (SELECT max(ts) - INTERVAL 30 MINUTE
                                            FROM events)
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows with a 30-minute watermark, append mode
    (C6+C8). On a fully-drained bounded stream the emitted set is
    EXACTLY the windows whose end <= final watermark (= max event ts
    minus the 30-minute delay): the final no-data micro-batch closes
    everything the watermark passed, and the trailing window(s) are
    withheld. That makes C8's late-data semantics oracle-checkable in
    plain SQL — the batch windowed aggregate filtered to closed
    windows (verified exact at sf0.001 and sf0.01); pytest additionally
    asserts the emitted rows are a prefix of the batch result."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(fmt_ts(F.col("w.start")).alias("bucket"), "n_events", "total_value")
    )
    return _drain(agg, "append")


@register(
    "stream_session_window",
    tags=("C7", "C8"),
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                             >= INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), numbered AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        ), sessions AS (
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE)
                       AS session_value,
                   max(ts) + INTERVAL 30 MINUTE AS session_end
            FROM numbered GROUP BY user_id, session_id
        )
        SELECT user_id, session_start, n_events, session_value
        FROM sessions
        -- Spark tracks the watermark at millisecond precision (max event
        -- time floored to ms); mirror that floor so a session ending in
        -- the sub-millisecond gap is withheld by both engines.
        WHERE session_end <= (SELECT time_bucket(INTERVAL 1 MILLISECOND, max(ts))
                                     - INTERVAL 1 HOUR
                              FROM events)
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows on the stream (C7): the identical
    `session_window` expression as the batch operator, under a 1-hour
    watermark; a session emits once the watermark passes its end
    (last event + 30-minute gap). On a drained bounded stream that is
    a deterministic set, so the oracle is the batch gaps-and-islands
    session build (same SQL as the batch `session_window` oracle)
    filtered to sessions closed by the final watermark — verified
    exact at sf0.001/sf0.01; pytest additionally asserts the emitted
    sessions are a subset of the batch result."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("s_start"),
            F.count("*").alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            fmt_ts("s_start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )
    return _drain(agg, "append")


def quantize4(v):
    """Scaled-long (4 implied decimals) quantization matching
    CAST(x AS DECIMAL(10,4)) in BOTH engines: half-AWAY-from-zero
    (np.rint is half-to-even), applied to the value's SHORTEST DECIMAL
    REPRESENTATION — Spark casts via BigDecimal.valueOf(double) and
    DuckDB equivalently, so x = 0.00015 (binary ~1.4999999999999999e-4)
    must quantize to 2 even though the float product 10000*x < 1.5.
    The vectorized floor(|y|+0.5) path is exact except within FP noise
    of a .5 tie; those few elements take the exact Decimal(repr(x))
    path (pinned adversarially vs DuckDB in tests/test_hypothesis.py).
    Ships to workers inside pandas closures — numpy imported locally."""
    import numpy as np

    y = v * 10000.0
    a = np.abs(y)
    base = np.floor(a + 0.5)
    frac = a - np.floor(a)
    near = np.abs(frac - 0.5) <= 1e-12 * np.maximum(a, 1.0)
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal

        one = Decimal(1)
        for i in np.flatnonzero(near):
            # repr(float(x)), not repr(x): numpy >= 2.0 reprs scalars as
            # 'np.float64(x)', which Decimal rejects.
            base[i] = float(
                abs(Decimal(repr(float(v[i]))) * 10000).quantize(
                    one, rounding=ROUND_HALF_UP
                )
            )
    return (base * np.sign(y)).astype("int64")


@register(
    "stream_stateful_counts",
    tags=("C9",),
    oracle="""
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY user_id
    """,
)
def stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState
    (C9): a per-user running (count, total) kept in explicit state
    across micro-batches — the building block for bespoke operators
    Spark's built-in aggs can't express (e.g. decaying counters,
    per-key ML state).

    The running total is accumulated as scaled long (4 implied
    decimals), mirroring the repo-wide dec4 policy: integer addition
    is order-independent, so the final state is bitwise-identical to
    the batch/DuckDB DECIMAL(10,4) sum no matter how rows split
    across micro-batches — which is what makes this oracle-checkable.
    Update-mode emits one row per key per touching batch; the drained
    bounded fixture fits one batch, so the sink holds exactly the
    final per-user states."""
    import pandas as pd

    ev = _events_stream(spark, sf_dir).select("user_id", "value")

    def update(key, pdfs, state) -> "Iterator[pd.DataFrame]":
        n, scaled = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            scaled += int(quantize4(pdf["value"].to_numpy()).sum())
        state.update((n, scaled))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [scaled / 10000.0],
            }
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, scaled long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    return _drain(out, "update")


def _tws_available() -> bool:
    """`transformWithState` (Spark 4.x's successor to
    `applyInPandasWithState`) drives its stateful-processor protocol
    over protobuf: the JVM spawns a long-lived Python "driver worker"
    that imports `google.protobuf` at startup and crashes the query if
    it is absent (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE,
    reproduced in this container). protobuf is not part of PySpark's
    hard dependencies and is not installed here, so the query registers
    exactly when it can run — a documented capability gate, same policy
    as the Avro source (operators/csv_source.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if _tws_available():  # pragma: no cover - protobuf absent in this container

    @register(
        "stream_stateful_counts_tws",
        tags=("C9",),
        oracle="""
            SELECT user_id, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
            FROM events
            GROUP BY user_id
        """,
    )
    def stream_stateful_counts_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The same per-user running (count, total) as
        ``stream_stateful_counts``, on Spark 4.x's `transformWithState`
        API (`transformWithStateInPandas`) — the successor to
        `applyInPandasWithState` and the 100 TB design point: state
        variables are named and typed (value/list/map states, TTL,
        timers, initial state) and the operator REQUIRES the RocksDB
        state-store provider, i.e. per-key state lives on executor disk
        + changelog rather than heap. `_drain` sets the provider for
        this query and restores the session conf afterwards.

        Both APIs stay registered deliberately where available:
        `applyInPandasWithState` is the stable/legacy surface, this is
        the migration target; the shared oracle proves they agree
        bitwise (scaled-long accumulation, same dec4 policy)."""
        import pandas as pd
        from pyspark.sql.streaming import StatefulProcessor

        ev = _events_stream(spark, sf_dir).select("user_id", "value")

        class RunningCounts(StatefulProcessor):
            # Defined inside the query fn so cloudpickle ships it by value.
            def init(self, handle) -> None:
                self._state = handle.getValueState("counts", "n long, scaled long")

            def handleInputRows(self, key, rows, timerValues):
                prev = self._state.get() if self._state.exists() else None
                n, scaled = prev if prev is not None else (0, 0)
                for pdf in rows:
                    n += len(pdf)
                    scaled += int(quantize4(pdf["value"].to_numpy()).sum())
                self._state.update((n, scaled))
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "total_value": [scaled / 10000.0],
                    }
                )

        out = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningCounts(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="update",
            timeMode="none",
        )
        return _drain(out, "update", require_rocksdb=True)


@register(
    "stream_dedup",
    tags=("C9",),
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state (C9):
    dropDuplicatesWithinWatermark on (user_id, event_type) — state for
    a key is dropped once the watermark passes it, so memory is bounded
    by key-arrival rate x watermark horizon, not stream length.

    The emitted KEY SET on a drained bounded stream is deterministic
    (one row per distinct key; the fixture fits one micro-batch so no
    key re-emits after state expiry) and oracle-checked against SQL
    DISTINCT. WHICH physical row survives per key is arrival-order-
    dependent, so the projection excludes event_id on purpose."""
    ev = _events_stream(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _drain(dedup, "append")


@register(
    "stream_dedup_filesink",
    tags=("C9",),
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_filesink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_dedup`` drained through a PARQUET FILE SINK instead of
    the memory sink (C9, the unbounded-result path): executors write
    the survivor stream directly to partitioned parquet — no
    driver-side materialization anywhere in the streaming topology, so
    the same plan drains a 100 TB survivor stream (the memory-sink
    forms exist for oracle parity on bounded fixtures; this is what
    production runs). Exactly-once comes from the sink's commit log +
    the checkpoint; the returned DataFrame is a plain batch read of
    the committed files, same oracle as stream_dedup.

    The sink/checkpoint live at a DETERMINISTIC per-sf_dir cache path
    (the csv_source _CSV_CACHE_ROOT pattern), cleared before each
    drain: repeated driver/bench invocations overwrite one location
    instead of leaking a fresh mkdtemp survivor-parquet + checkpoint
    copy per run (at sf10 that was a full 10M-event drain left in
    /tmp every invocation)."""
    import shutil
    import tempfile

    ev = _events_stream(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        sf_dir.rstrip("/").replace("/", "_"),
        "dedup_filesink",
    )
    shutil.rmtree(root, ignore_errors=True)
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(out, exist_ok=True)
    q = (
        dedup.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out)


@register(
    "stream_hypertable_rollup",
    tags=("C6", "C8"),
    oracle="""
        WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events),
        hourly AS (
            SELECT 'hour' AS grain,
                   time_bucket(INTERVAL 1 HOUR, ts) AS w_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
            FROM events GROUP BY 2
        ),
        daily AS (
            SELECT 'day' AS grain,
                   time_bucket(INTERVAL 1 DAY, ts) AS w_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
            FROM events GROUP BY 2
        )
        SELECT grain, strftime(w_start, '%Y-%m-%d %H:%M:%S') AS bucket,
               n_events, total_value
        FROM (
            SELECT * FROM hourly
            WHERE w_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
            UNION ALL
            SELECT * FROM daily
            WHERE w_start + INTERVAL 1 DAY <= (SELECT w FROM wm)
        )
    """,
)
def stream_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming multi-granularity rollup (C6+C8): hourly AND daily
    windowed aggregates of one event stream in a SINGLE streaming
    query — a union of two stateful window operators under one
    watermark (Spark's multiple-stateful-operator support), the
    continuous-aggregate topology a timeseries store maintains (the
    batch form is ``hypertable_rollup``). Append mode: each
    granularity emits exactly the windows its end has passed the
    final watermark — so the drained set is deterministic per
    granularity (the trailing hour AND the trailing day are withheld)
    and the oracle is the batch rollup filtered by the same closure
    rule per grain. State is O(open windows per grain), independent
    of stream length."""
    ev = _events_stream(spark, sf_dir)

    def grain(dur: str, label: str) -> DataFrame:
        return (
            ev.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", dur).alias("w"))
            .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
            .select(
                F.lit(label).alias("grain"),
                fmt_ts(F.col("w.start")).alias("bucket"),
                "n_events",
                "total_value",
            )
        )

    return _drain(grain("1 hour", "hour").unionByName(grain("1 day", "day")), "append")


@register(
    "stream_cdc_latest",
    tags=("C9", "B19"),
    oracle="""
        WITH r AS (
            SELECT user_id, event_type, ts,
                   CAST(value AS DECIMAL(10,4)) AS v,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT user_id,
               event_type AS last_event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
               CAST(v AS DOUBLE) AS last_value
        FROM r WHERE rn = 1
    """,
)
def stream_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keep-latest CDC state (C9): the events stream treated
    as a change feed, folded to each key's CURRENT row — the
    materialized-view half of CDC (the batch upsert/merge half is
    ``cdc_upsert``; the history half is ``scd2_dim``). One streaming
    groupBy with ``max_by`` over a (ts, event_id) ordering struct:
    state per key is ONE row (the running winner), so memory is
    O(keys) regardless of stream length — the canonical
    last-write-wins table a CDC consumer maintains. The (ts,
    event_id) struct makes the winner total-ordered, hence the
    drained complete-mode result is deterministic and equal to the
    batch argmax — oracle-checked; value rides the DECIMAL(10,4)
    policy."""
    ev = _events_stream(spark, sf_dir)
    return _drain(_cdc_latest_agg(ev), "complete")


def _cdc_latest_agg(ev: DataFrame) -> DataFrame:
    """The keep-latest streaming aggregate shared by the memory-sink
    (oracle parity) and foreachBatch-upsert (production) CDC forms."""
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    latest = ev.groupBy("user_id").agg(
        F.max_by("event_type", ordk).alias("last_event_type"),
        F.max_by(F.col("ts"), ordk).alias("_last_ts"),
        F.max_by(dec4("value"), ordk).alias("_last_v"),
    )
    return latest.select(
        "user_id",
        "last_event_type",
        fmt_ts_us(F.col("_last_ts")).alias("last_ts"),
        F.col("_last_v").cast("double").alias("last_value"),
    )


_CDC_N_BUCKETS = 16


def _cdc_upsert_batch(
    batch_df: DataFrame, table: str, n_buckets: int = _CDC_N_BUCKETS
) -> None:
    """LWW-upsert one micro-batch of (user_id, ...) rows into a
    bucket-partitioned parquet table: existing rows for the batch's
    keys are replaced, other keys kept, and ONLY the hash buckets the
    batch touches are rewritten (dynamic partition overwrite). The
    merged frame is persisted+counted before the write because the
    merge lazily READS the very path being overwritten. The
    affected-bucket collect is <= n_buckets rows — bounded metadata.
    Module-level so the two-batch merge path is directly testable
    (the bounded fixture drains in one batch)."""
    from pyspark import StorageLevel

    sess = batch_df.sparkSession
    b = batch_df.withColumn(
        "bucket", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets))
    )
    try:
        cur = sess.read.parquet(table)
        have = True
    except Exception:  # first batch: nothing committed yet
        have = False
    if have:
        affected = [
            r["bucket"] for r in b.select("bucket").distinct().collect()
        ]
        keep = cur.filter(F.col("bucket").isin(affected)).join(
            b.select("user_id"), "user_id", "left_anti"
        )
        out = keep.unionByName(b)
    else:
        out = b
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()  # cut the lazy read of the path we're about to replace
    try:
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(table)
        )
    finally:
        out.unpersist()


@register(
    "stream_cdc_latest_filesink",
    tags=("C9", "B19", "A8"),
    oracle="""
        WITH r AS (
            SELECT user_id, event_type, ts,
                   CAST(value AS DECIMAL(10,4)) AS v,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT user_id,
               event_type AS last_event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
               CAST(v AS DOUBLE) AS last_value
        FROM r WHERE rn = 1
    """,
)
def stream_cdc_latest_filesink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_cdc_latest`` materialized as a TABLE instead of a
    memory sink (C9, the production LWW path): the same keep-latest
    aggregate drained in UPDATE mode through ``foreachBatch``, which
    upserts each micro-batch's changed keys into a bucket-partitioned
    parquet table. Update mode emits only the keys whose running
    winner changed, so per-batch work is O(changed keys); the upsert
    rewrites only the hash buckets those keys land in (dynamic
    partition overwrite — untouched buckets' files are never
    rewritten), which is how a parquet table takes keyed upserts
    without a full rewrite. Nothing is ever materialized on the
    driver: the batch frame flows executor-side into the table; the
    only collect is the affected-bucket id list (<= 16 rows — bounded
    metadata, CLAUDE.md exemption class). Same oracle as
    stream_cdc_latest.

    The merged frame is persisted+counted before the overwrite: the
    merge READS the table path being overwritten, and without forcing
    materialization first the lazy self-read would race the rewrite."""
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        sf_dir.rstrip("/").replace("/", "_"),
        "cdc_filesink",
    )
    shutil.rmtree(root, ignore_errors=True)
    table = os.path.join(root, "table")
    ckpt = os.path.join(root, "ckpt")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        _cdc_upsert_batch(batch_df, table)

    ev = _events_stream(spark, sf_dir)
    q = (
        _cdc_latest_agg(ev)
        .writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(table).select(
        "user_id", "last_event_type", "last_ts", "last_value"
    )


@register(
    "stream_stream_join",
    tags=("C8", "C9", "B24"),
    oracle="""
        SELECT b.user_id, c.event_id AS click_id, b.event_id AS purchase_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
               strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') b
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON b.user_id = c.user_id
         AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (C8/C9): purchases matched to the
    same user's clicks in the preceding hour, both sides watermarked so
    the join state is bounded — the canonical attribution topology.
    Inner stream-stream joins emit every provable match (the watermark
    only bounds buffered state, it withholds nothing on a drained
    bounded stream), so the oracle is simply the batch interval join —
    exact set equality, also pytest-asserted. Scale shape: state is
    partitioned by user_id and each side retains <= 1 hour of events
    per the watermark — memory is O(rate x window), independent of
    stream length."""
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = buys.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        fmt_ts_us("c_ts").alias("click_ts"),
        fmt_ts_us("p_ts").alias("purchase_ts"),
    )
    return _drain(joined, "append")


@register(
    "stream_static_enrich",
    tags=("C6", "C8", "B21"),
    oracle="""
        WITH agg AS (
            SELECT c.c_mktsegment,
                   time_bucket(INTERVAL 1 HOUR, e.ts) AS w_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(e.value AS DECIMAL(10,4))) AS DOUBLE)
                       AS total_value
            FROM events e
            JOIN customer c ON c.c_custkey = e.user_id
            GROUP BY 1, 2
        )
        SELECT c_mktsegment,
               strftime(w_start, '%Y-%m-%d %H:%M:%S') AS bucket,
               n_events, total_value
        FROM agg
        WHERE w_start + INTERVAL 1 HOUR <= (SELECT max(ts) - INTERVAL 30 MINUTE
                                            FROM events)
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (the third Structured Streaming
    join topology, next to stream-stream and self-contained windows):
    the event stream joins the STATIC customer dimension — no state,
    no watermark on the static side; Spark broadcasts the dim into
    every micro-batch — then rolls up 1-hour tumbling windows per
    market segment under a 30-minute watermark. On a drained bounded
    stream the emitted set is exactly the closed windows of the batch
    join+aggregate (the stream_tumbling_window argument; the static
    join adds nothing time-dependent), so the oracle is plain SQL.

    Scale shape: this is the production enrich-then-aggregate
    topology — the dim is broadcast (or a map-side state store for
    dims too big to broadcast), the only shuffle is the windowed
    aggregation keyed on (segment, window), and state is
    O(segments x open windows), independent of stream length. The
    stream side never shuffles for the join itself."""
    from mr_py_spark.sources import tbl

    ev = _events_stream(spark, sf_dir)
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey, "inner"
    )
    agg = (
        joined.withWatermark("ts", "30 minutes")
        .groupBy("c_mktsegment", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "c_mktsegment",
            fmt_ts(F.col("w.start")).alias("bucket"),
            "n_events",
            "total_value",
        )
    )
    return _drain(agg, "append")


@register(
    "stream_outer_join",
    tags=("C8", "C9", "B19"),
    oracle="""
        WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
             b AS (SELECT * FROM events WHERE event_type = 'purchase'),
             wm AS (SELECT least((SELECT max(ts) FROM c),
                                 (SELECT max(ts) FROM b))
                           - INTERVAL 1 HOUR AS w)
        SELECT c.user_id, c.event_id AS click_id, b.event_id AS purchase_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
               strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
        FROM c JOIN b ON b.user_id = c.user_id
         AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 1 HOUR
        UNION ALL
        SELECT c.user_id, c.event_id, NULL,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f'), NULL
        FROM c, wm
        WHERE c.ts + INTERVAL 1 HOUR < wm.w
          AND NOT EXISTS (SELECT 1 FROM b WHERE b.user_id = c.user_id
                          AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 1 HOUR)
    """,
)
def stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join (C8): every click, with
    its same-user purchase within the following hour or NULL-extended
    if none arrived — the unconverted-traffic topology, and the join
    semantic `stream_stream_join`'s inner form cannot express.

    The outer semantics make WATERMARK WITHHOLDING observable: a
    click can only be declared unmatched once the watermark proves no
    in-window purchase can still arrive, so null-extended rows emit
    when watermark > c_ts + 1h, and clicks in the final
    (delay + interval) tail of a drained bounded stream are withheld
    FOREVER — correct streaming behavior, not data loss. The oracle
    mirrors this mechanically: Spark's global watermark is
    min(per-side max event time) - delay (each withWatermark node
    tracks its own input's max), so the NULL branch keeps exactly the
    unmatched clicks with c_ts + 1h < that watermark. The strict <
    matches Spark's eviction predicate; the fixture's microsecond-
    grained timestamps make an exact tie (the only divergence hazard)
    a measure-zero event, and the drain is single-micro-batch so the
    final watermark is deterministic.

    Scale shape: identical to the inner form — state partitioned by
    user_id, each side buffers <= (delay + interval) of events, memory
    O(rate x window) independent of stream length; the null-extension
    adds no state, only an eviction-time emit."""
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        fmt_ts_us("c_ts").alias("click_ts"),
        fmt_ts_us("p_ts").alias("purchase_ts"),
    )
    return _drain(joined, "append")


@register(
    "statestore_read",
    tags=("C9", "A7", "B7"),
    oracle="""
        SELECT event_type, count(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
)
def statestore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE STORE DATA SOURCE read (the Spark 4 ops surface for
    stateful streaming): drain a stateful counting stream to a noop
    sink, then open its CHECKPOINT as a batch table via
    ``spark.read.format("statestore")`` and emit the keyed state. On a
    fully-drained bounded stream the state content must equal the
    batch aggregate — so this oracle checks the STATE ITSELF, not a
    sink: a state-corruption bug (lost partition, double-applied
    batch, bad changelog replay) breaks parity even though no result
    was ever written.

    This is the production debugging workflow at 100 TB: state lives
    sharded across executors (RocksDB files + changelog under the
    checkpoint), and the reader exposes it as one partitioned
    DataFrame — inspect hot keys, audit counts, bootstrap a migration
    — without touching the running query. Checkpoint is per-sf cached
    and cleared before each run (the stream_dedup_filesink dir
    pattern), so repeated drains never accumulate."""
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        sf_dir.rstrip("/").replace("/", "_"),
        "statestore_read",
    )
    shutil.rmtree(root, ignore_errors=True)
    ckpt = os.path.join(root, "ckpt")
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    st = spark.read.format("statestore").load(ckpt)
    return st.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n_events"),
    )


def _lsh_maintenance_step(
    spark: SparkSession, table: str, out: str, idx_path: str,
    reband_check_every: int = 8, collision_cap: float | None = None,
    reband_log: list | None = None,
):
    """The per-micro-batch body of ``stream_lsh_index_maintenance``,
    split out so the two-batch planted test can drive it over a
    controlled file sequence. Triage the batch against the standing
    index (empty on the first batch), write the statuses to ``out``,
    and ADMIT the survivors — status 'new', which is exactly the
    min-id representative of every within-batch near-dup cluster plus
    all genuinely novel docs — into the index under the existing
    bucket spec (lsh_index_append). Everything is executor-side
    except Spark's own bounded planning; per-batch work is
    O(batch x bucket occupancy), independent of corpus size.

    REPLAY-IDEMPOTENT (VERDICT/ADVICE r11: foreachBatch is
    at-least-once — a crash between the index append and the
    checkpoint commit re-runs the batch): three guards make a replayed
    (batch, batch_id) a byte-level no-op, property-tested in
    tests/test_streaming_sink.py:

    1. triage sees the PRE-BATCH index view — the standing table is
       anti-joined against the batch's own doc_ids before use, so a
       replay whose own survivors already landed neither self-matches
       ('every doc dup_of_corpus of itself') nor flips a
       dup_within_delta to dup_of_corpus against its own admitted rep;
    2. statuses land in a batch_id=N partition under DYNAMIC partition
       overwrite — a replay rewrites ITS partition in place instead of
       appending duplicate rows;
    3. admission anti-joins the survivors against doc_ids already
       present in the index, so a replayed append admits nothing.

    All three guards are broadcast-side joins on the SMALL batch
    frame (LeftSemi/LeftAnti BuildRight over ids, or index-side
    map-only anti against the broadcast ids) — no new shuffle of
    index-sized data, so the O(batch x occupancy) claim stands.

    Every ``reband_check_every`` batches the loop runs the re-band
    gauge check and, past ``collision_cap``, escalates the banding in
    place (lsh_reband — crash-atomic; r14, closing the text tier's
    gauge-without-actuator gap, VERDICT r13 item 4). r15 (VERDICT r14
    item 1): the check reads the INCREMENTAL sufficient statistics
    (lsh_gauge_stats — a 1-file sidecar read; every append bumps them
    O(delta) inside lsh_index_append), not a full-index gauge scan —
    the r14 form paid an index-sized groupBy plus a corpus-wide
    distinct every 8 batches, the very complexity class this loop's
    docstring forbids. The same replay discipline as the semantic
    tier's retrain, now carried by the sidecar itself: the DECISION
    reads the pre-batch stats (the sidecar's atomic pre-bump snapshot,
    keyed by the bump watermark — lsh_gauge_stats(batch_max_id=...)),
    so an original run and its replay agree; band entries are a pure
    function of (signature, band_rows), so even a double-fired replay
    rewrite converges to the same rows; triage and appends band at the
    TABLE's current rows-per-band (the banding sidecar, passed through
    minhash_delta_status's band_rows — ADVICE r14: deriving it from
    the frame re-paid an O(index) agg per batch), so both generations
    answer probes correctly."""
    from pyspark.sql import functions as SF

    from mr_py_spark.operators.bucketed import _BUCKETS, replay_guard
    from mr_py_spark.operators.dedup import (
        _LSH_COLLISION_CAP,
        _LSH_INDEX_KEYS,
        _N_HASHES,
        lsh_band_entries,
        lsh_gauge_stats,
        lsh_gauge_trips,
        lsh_index_append,
        lsh_next_band_rows,
        lsh_table_band_rows,
        lsh_reband,
        minhash_delta_status,
        minhash_signatures,
    )
    from mr_py_spark.sources.sinks import write_bucketed

    cap = _LSH_COLLISION_CAP if collision_cap is None else collision_cap

    def step(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("doc_id", "text")
        ids = batch.select("doc_id")
        have_index = spark.catalog.tableExists(table)
        # guard 1: pre-batch index view (replay: a crashed run may have
        # already admitted this batch's survivors). Index-side anti
        # against the broadcast batch ids — map-only, no index shuffle.
        cb = (
            spark.table(table).join(ids, "doc_id", "left_anti")
            if have_index
            else None
        )
        cur = lsh_table_band_rows(spark, table) if have_index else None
        if (
            reband_check_every
            and have_index
            and batch_id > 0
            and batch_id % reband_check_every == 0
            and cur < _N_HASHES
        ):
            bmax = batch.agg(SF.max("doc_id")).collect()[0][0]
            stats = lsh_gauge_stats(
                spark, table,
                batch_max_id=None if bmax is None else int(bmax),
            )
            if lsh_gauge_trips(stats, cap, band_rows=cur):
                lsh_reband(spark, table, lsh_next_band_rows(cur))
                if reband_log is not None:
                    reband_log.append(int(batch_id))
                cb = spark.table(table).join(ids, "doc_id", "left_anti")
                cur = lsh_table_band_rows(spark, table)
        status = minhash_delta_status(
            batch.limit(0) if not have_index else None,
            batch,
            corpus_bands=cb,
            band_rows=cur,
        )
        # persist + count forces materialization BEFORE the admission
        # write below reads/extends the index the statuses were
        # computed against (the stream_cdc_latest_filesink race note)
        status.persist().count()
        # guard 2: statuses keyed by batch_id with dynamic partition
        # overwrite — a replayed batch rewrites its own partition.
        (
            status.withColumn("batch_id", SF.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )
        new_docs = batch.join(
            status.filter(SF.col("status") == "new").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        if have_index:
            # r17 (VERDICT r16 item 2): ONE agg over the PERSISTED
            # status frame supplies (count, min, max) of the admitted
            # ids for the whole admission path — new_docs' id set IS
            # status's 'new' id set (the semi-join filters batch to
            # exactly those ids), so the guard's fresh-path check and
            # the append's watermark/gauge stats all read this tuple
            # instead of each firing its own delta agg (3 jobs → 1,
            # and the 1 is a cached-frame scan).
            st = (
                status.filter(SF.col("status") == "new")
                .agg(
                    SF.count(SF.lit(1)).alias("nd"),
                    SF.min("doc_id").alias("mn"),
                    SF.max("doc_id").alias("mx"),
                )
                .collect()[0]
            )
            stats = (
                int(st.nd),
                None if st.mn is None else int(st.mn),
                None if st.mx is None else int(st.mx),
            )
            # guard 3: never re-admit a doc the index already holds —
            # watermark-gated (bucketed.replay_guard, r14): a fresh
            # batch costs zero index I/O, a replay pays an index semi
            # restricted to its own (at-or-below-watermark) ids.
            guarded = replay_guard(
                spark, table, new_docs, "doc_id",
                minmax=(stats[1], stats[2]),
            )
            if guarded is new_docs:
                # fast path: nothing filtered, stats still describe the
                # appended frame exactly — the append runs job-free
                # aside from its write (and the gauge's O(delta) probe)
                lsh_index_append(guarded, table, delta_stats=stats)
            else:
                # replay slow path: the guard filtered; stats computed
                # upstream of the filter no longer apply
                lsh_index_append(guarded, table)
        else:
            entries = lsh_band_entries(minhash_signatures(new_docs))
            write_bucketed(entries, table, _LSH_INDEX_KEYS, _BUCKETS, path=idx_path)
        status.unpersist()

    return step


def _ivf_maintenance_step(
    spark: SparkSession, cent_table: str, idx_table: str, out: str,
    cent_path: str, idx_path: str, drift_check_every: int = 8,
    drift_ratio: float | None = None, retrain_log: list | None = None,
):
    """The per-micro-batch body of ``stream_semantic_index_maintenance``
    — the IVF/embedding twin of ``_lsh_maintenance_step``, with the
    same three replay-idempotence guards (pre-batch triage view,
    per-batch_id dynamic partition overwrite, idempotent admit). The
    quantizer trains once on the first batch; thereafter the loop is
    SELF-HEALING (VERDICT r12 item 3 — the first-batch-only quantizer
    was the gauge-without-actuator gap): every ``drift_check_every``
    batches the incoming batch's p05 top-1 similarity is compared to
    the GENERATION-PINNED indexed-cohort reference (r15,
    ``drift_ref_stats`` — bootstrap once per quantizer generation from
    the pre-batch view, then a 1-file sidecar read plus one O(batch)
    scoring pass; the old form re-scored the full inverted file every
    scheduled check, the same O(index) gauge class the LSH loop fixed
    this round — and a moving reference also MASKED slow drift by
    absorbing post-drift admissions into the cohort it compared
    against), and on degradation past ``drift_ratio`` ``ivf_retrain``
    rebuilds centroids + inverted file in place (crash-atomic swap)
    before the batch is triaged; 0 disables it (the pure never-retrain
    policy). Replay stays byte-idempotent: the drift decision reads
    the pinned reference (written at the first check of the
    generation, so original and replay agree) and the retrain corpus
    uses the PRE-BATCH index view (``exclude_ids``), so a replayed
    batch makes the identical decision and rebuilds identical tables;
    the reference sidecar lives INSIDE the index's data directory and
    resets exactly when a retrain swaps the generation; a crash
    mid-swap is finished by the recover_compaction call at step entry.
    ``retrain_log`` (tests) collects the batch_ids that retrained."""
    from pyspark.sql import functions as SF

    from mr_py_spark.operators.bucketed import _BUCKETS, recover_compaction
    from mr_py_spark.operators.kmeans import _kmeans_k
    from mr_py_spark.operators.similarity import (
        _DRIFT_P05_RATIO,
        _ivf_centroids,
        _ordered_train_sample,
        delta_p05,
        drift_degraded_pinned,
        drift_ref_stats,
        ivf_assign_with,
        ivf_index_append,
        ivf_retrain,
        pin_drift_ref,
        semantic_delta_status,
    )
    from mr_py_spark.sources.sinks import write_bucketed

    if drift_ratio is None:
        drift_ratio = _DRIFT_P05_RATIO

    def step(batch_df: DataFrame, batch_id: int) -> None:
        # finish any crash-interrupted retrain swap before reading the
        # tables (re-attach-on-next-use; no-op without a marker)
        recover_compaction(spark, cent_path)
        recover_compaction(spark, idx_path)
        batch = batch_df.select(
            "vec_id", SF.col("embedding").cast("array<double>").alias("v")
        )
        if not spark.catalog.tableExists(cent_table):
            # one-time quantizer fit on the FIRST batch: the sample is
            # collected EXPLICITLY ORDERED (ADVICE r13 — _ivf_centroids'
            # default collection is a bare limit whose prefix/row-order
            # is not replay-stable, voiding the byte-identical-replay
            # guarantee this loop's crash-window tests rely on); sized
            # for cluster-mate candidate work like the batch corpus
            # index
            cents = _ivf_centroids(
                spark, batch, max(2, _kmeans_k(batch.count())),
                sample=_ordered_train_sample(batch),
            )
            cent_df = spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)],
                "cid long, cv array<double>",
            )
            write_bucketed(cent_df, cent_table, "cid", _BUCKETS, path=cent_path)
        cent = spark.table(cent_table)
        ids = batch.select("vec_id")
        have_idx = spark.catalog.tableExists(idx_table)
        corpus = (
            spark.table(idx_table).join(ids, "vec_id", "left_anti")
            if have_idx
            else ivf_assign_with(cent, batch.limit(0))
        )
        if (
            drift_check_every
            and have_idx
            and batch_id > 0
            and batch_id % drift_check_every == 0
            # r15: the reference cohort is GENERATION-PINNED
            # (drift_ref_stats — bootstrap once per generation from the
            # pre-batch view, then a sidecar read), and only the DELTA
            # is scored per check — the old ivf_drift_frame call
            # re-scored the whole inverted file every scheduled check,
            # the O(index) gauge class the LSH tier fixed this round
            and drift_degraded_pinned(
                drift_ref_stats(spark, cent, idx_table, corpus),
                delta_p05(cent, batch),
                drift_ratio,
            )
        ):
            ivf_retrain(
                spark, cent_table, idx_table, exclude_ids=ids,
                extra_train=batch,
            )
            if retrain_log is not None:
                retrain_log.append(int(batch_id))
            cent = spark.table(cent_table)
            corpus = spark.table(idx_table).join(ids, "vec_id", "left_anti")
        status = semantic_delta_status(cent, corpus, batch)
        status.persist().count()
        (
            status.withColumn("batch_id", SF.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )
        new_vecs = batch.join(
            status.filter(SF.col("status") == "new").select("vec_id"),
            "vec_id",
            "left_semi",
        )
        if have_idx:
            # r17 (VERDICT r16 item 2): one agg over the PERSISTED
            # status frame supplies the admitted ids' (min, max) to the
            # append's replay guard — the fresh-batch path then runs
            # zero delta aggs of its own (the LSH loop's shared-stats
            # pattern; new_vecs' id set IS status's 'new' id set).
            mm = (
                status.filter(SF.col("status") == "new")
                .agg(SF.min("vec_id").alias("mn"), SF.max("vec_id").alias("mx"))
                .collect()[0]
            )
            ivf_index_append(
                cent, new_vecs, idx_table, idempotent=True,
                minmax=(
                    None if mm.mn is None else int(mm.mn),
                    None if mm.mx is None else int(mm.mx),
                ),
            )
        else:
            write_bucketed(
                ivf_assign_with(cent, new_vecs), idx_table, "bucket",
                _BUCKETS, path=idx_path,
            )
            # first generation: pin its drift reference at creation
            # (r16, VERDICT r15 item 3 — the first scheduled check is
            # then a warm sidecar read; a crash before this pin lands
            # is repaired by drift_ref_stats' bootstrap). The cohort is
            # the quantizer's own training batch — exactly what
            # "degraded relative to training" compares against.
            pin_drift_ref(spark, cent, idx_table)
        status.unpersist()

    return step


@register("stream_semantic_index_maintenance", tags=("C9", "C2", "C3", "A8"))
def stream_semantic_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest loop for the STANDING IVF index — semantic
    near-dup triage of each micro-batch of newly-embedded documents
    against the live index, statuses to a parquet sink, survivors
    admitted via ``ivf_index_append`` (never a retrain; the r12 drift
    monitor schedules those out-of-band). Completes the standing-index
    tier's streaming surface: LSH for text (stream_lsh_index_
    maintenance), IVF for embeddings (this), both replay-idempotent
    under foreachBatch's at-least-once contract via the same three
    guards (property-tested in tests/test_streaming_sink.py).

    Rows-only (seeded quantizers are engine-specific): cross-batch
    semantics and byte-level replay idempotence are property-tested
    over a controlled two-file stream; the fixture drain is checked
    for one-status-per-vector and determinism."""
    import shutil
    import tempfile

    harden(spark)
    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        sf_dir.rstrip("/").replace("/", "_"),
        "ivf_maint",
    )
    shutil.rmtree(root, ignore_errors=True)
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(out, exist_ok=True)
    tag = stream_table_tag(sf_dir)
    cent_table = f"mrps_stream_ivf_cent_{tag}"
    idx_table = f"mrps_stream_ivf_idx_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {cent_table}")
    spark.sql(f"DROP TABLE IF EXISTS {idx_table}")

    schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir.rstrip("/"))
    )
    q = (
        stream.writeStream.foreachBatch(
            _ivf_maintenance_step(
                spark, cent_table, idx_table, out,
                os.path.join(root, "cent"), os.path.join(root, "index"),
            )
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out).select(
        "vec_id",
        "status",
        "match_id",
        F.col("batch_id").cast("long").alias("batch_id"),
    )


@register("stream_lsh_index_maintenance", tags=("C9", "C2", "C1", "A8"))
def stream_lsh_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest loop for the STANDING LSH index (C9 + C2): the
    capstone that ties the round's standing-index tier into the
    streaming surface. Each micro-batch of newly-crawled documents is
    (1) fuzzy-triaged against the index (``minhash_delta_status`` over
    the materialized band table — no corpus re-banding, the O(delta)
    path), (2) its statuses appended to a parquet result sink, and
    (3) its SURVIVORS (status 'new' = each within-batch cluster's
    min-id representative + novel docs) admitted to the index via
    ``lsh_index_append`` under the same bucket spec — so the index the
    NEXT batch sees includes this batch's survivors. foreachBatch is
    the right tool because the state is a queryable warehouse table,
    not operator state: downstream batch queries join against the
    live index between micro-batches (the continuous-aggregate
    pattern, stream_cdc_latest_filesink's argument).

    The loop is EXACTLY-ONCE in effect despite foreachBatch's
    at-least-once contract: the step body is replay-idempotent (see
    ``_lsh_maintenance_step`` — pre-batch triage view, per-batch_id
    dynamic partition overwrite for statuses, admit-anti-join for the
    index), so checkpoint recovery re-running a batch leaves both
    sinks byte-identical.

    Rows-only (MinHash statuses are engine-specific): the two-batch
    cross-batch semantics — batch-2 near-dups of batch-1 docs report
    dup_of_corpus, the index accumulates exactly the survivor set —
    are property-tested over a controlled two-file stream, as is
    byte-level replay idempotence (tests/test_streaming_sink.py); the
    fixture drain is checked for one-status-per-doc and determinism."""
    import shutil
    import tempfile

    harden(spark)
    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        sf_dir.rstrip("/").replace("/", "_"),
        "lsh_maint",
    )
    shutil.rmtree(root, ignore_errors=True)
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    idx_path = os.path.join(root, "index")
    os.makedirs(out, exist_ok=True)
    tag = stream_table_tag(sf_dir)
    table = f"mrps_stream_lsh_idx_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir.rstrip("/"))
    )
    q = (
        stream.writeStream.foreachBatch(
            _lsh_maintenance_step(spark, table, out, idx_path)
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out).select(
        "doc_id",
        "status",
        "match_id",
        # partition-inferred int -> long (stable emit width, CLAUDE.md)
        F.col("batch_id").cast("long").alias("batch_id"),
    )


def _root_gen_hash(spark: SparkSession, root_table: str) -> str:
    """Content hash of a ROOT centroid table — the identity of a hier
    index GENERATION (every retrain rewrites the roots; appends never
    do). Bounded collect: the root frame is capped at 4096 rows by the
    two-level design (the documented broadcast-bounded class)."""
    import hashlib

    import numpy as np

    rows = sorted(
        (r.cid, tuple(r.cv))
        for r in spark.table(root_table).select("cid", "cv").collect()
    )
    h = hashlib.sha1()
    for cid, cv in rows:
        h.update(np.int64(cid).tobytes())
        h.update(np.asarray(cv, dtype=np.float64).tobytes())
    return h.hexdigest()


def _codes_gen_read(codes_path: str) -> str | None:
    import json as _json

    try:
        with open(os.path.join(codes_path, "_codes_gen.json")) as f:
            return _json.load(f)["root_gen"]
    except (OSError, ValueError, KeyError):
        return None


def _codes_gen_write(codes_path: str, gen: str) -> None:
    import json as _json

    p = os.path.join(codes_path, "_codes_gen.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"root_gen": gen}, f)
    os.replace(tmp, p)


def _books_np(spark: SparkSession, books_table: str):
    """Materialize the stored PQ codebooks (mi, ki, sub) as the numpy
    (M, K, sub) tensor the encode kernel broadcasts. Bounded collect:
    M·K rows (≤ 4096 at production m=16, k=256)."""
    import numpy as np

    rows = spark.table(books_table).collect()
    m = max(r.mi for r in rows) + 1
    k = max(r.ki for r in rows) + 1
    books = np.empty((m, k, len(rows[0].sub)))
    for r in rows:
        books[r.mi, r.ki] = r.sub
    return books


def _hier_maintenance_step(
    spark: SparkSession, root_table: str, leaf_table: str, idx_table: str,
    out: str, root_path: str, leaf_path: str, idx_path: str,
    drift_check_every: int = 8, drift_ratio: float | None = None,
    retrain_log: list | None = None,
    root_rows: int | None = None, leaf_rows: int | None = None,
    codes_table: str | None = None, codes_path: str | None = None,
    books_table: str | None = None, books_path: str | None = None,
    pq_m: int = 4, pq_k: int = 16,
):
    """The per-micro-batch body of ``stream_hier_index_maintenance`` —
    the TWO-LEVEL twin of ``_ivf_maintenance_step``, for corpora past
    the flat tier's 4096-centroid broadcast cap (the hier quantizer is
    the production form there, SCALE.md r13; a streaming loop that
    quietly kept the flat quantizer would walk straight back into the
    super-linear occupancy regime the hierarchy exists to avoid).

    Same three replay-idempotence guards (pre-batch triage view,
    per-batch_id dynamic partition overwrite, idempotent admit) and
    the same self-healing schedule: the quantizer pair (roots + leaf
    table) trains on the first batch; every ``drift_check_every``
    batches the incoming batch is scored against the ROOT level (a
    hier index drifts at the root first — leaves only partition within
    roots) and compared to the generation-pinned reference
    (``drift_ref_stats``/``drift_degraded_pinned``, r15 — see the flat
    loop for why the pinned form replaces the per-check full-index
    re-score); a degraded p05 triggers ``hier_retrain`` — the
    crash-atomic three-table rebuild — before the batch is triaged. Replay discipline is unchanged: the
    drift decision and retrain corpus use the PRE-BATCH index view
    (``exclude_ids``), the tripping batch rides ``extra_train``, and a
    crash mid-swap is finished by recover_compaction at step entry.
    ``root_rows``/``leaf_rows`` are test knobs (defaults: the module
    grains, ~4096/~64).

    With ``codes_table``/``codes_path``/``books_table``/``books_path``
    set, the loop also maintains the STANDING PQ-CODE inverted file
    the ADC serve tier reads (r16, VERDICT r15 item 7 — previously the
    codes table was batch-rebuild-only, so a streaming hier index
    serving through ADC re-encoded the corpus per admitted batch):

    - Codebooks train ONCE, on the bootstrap batch's admitted cohort
      (bounded ordered sample), and persist as a small bucketed table;
      they quantize RAW subspaces, so index retrains do not invalidate
      them (only the assignment columns of code rows move) — a books
      rebuild is an operator decision, not loop maintenance.
    - Admitted vectors are encoded O(delta) per batch
      (``hier_pq_codes_append``, replay-idempotent against the codes
      table's own watermark sidecar — a crash between the index append
      and the codes append replays into an idx no-op plus the missed
      codes append, converging).
    - GENERATION COHERENCE is self-healing by construction: a
      ``_codes_gen.json`` sidecar INSIDE the codes data dir (the r15
      lives-with-the-generation pattern) records the ROOT-table
      content hash the codes were encoded under; every step entry
      compares it to the live root hash and re-encodes the codes table
      from the index (crash-atomic ``replace_bucketed_table``) on
      mismatch — so a retrain immediately re-encodes, and a crash
      BETWEEN the retrain's swap and the re-encode is repaired at the
      next entry. The root hash is the generation identity because
      every retrain rewrites the roots and no append ever does."""
    from pyspark.sql import functions as SF

    from mr_py_spark.operators.bucketed import (
        _BUCKETS,
        recover_compaction,
        replace_bucketed_table,
    )
    from mr_py_spark.operators.hier import (
        _LEAF_ROWS,
        _ROOT_ROWS,
        _hier_nroot,
        _pq_encode_frame,
        hier_assign,
        hier_index_append,
        hier_leaf_centroids,
        hier_pq_codes_append,
        hier_retrain,
        semantic_delta_status_hier,
    )
    from mr_py_spark.operators.similarity import (
        _DRIFT_P05_RATIO,
        _ivf_centroids,
        _ordered_train_sample,
        delta_p05,
        drift_degraded_pinned,
        drift_ref_stats,
        ivf_assign_with,
        pin_drift_ref,
    )
    from mr_py_spark.sources.sinks import write_bucketed

    if drift_ratio is None:
        drift_ratio = _DRIFT_P05_RATIO
    r_rows = _ROOT_ROWS if root_rows is None else int(root_rows)
    l_rows = _LEAF_ROWS if leaf_rows is None else int(leaf_rows)
    codes_on = codes_table is not None
    if codes_on and not (codes_path and books_table and books_path):
        raise ValueError(
            "_hier_maintenance_step: codes maintenance needs codes_table, "
            "codes_path, books_table AND books_path"
        )

    def rebuild_codes(gen: str) -> None:
        # one zero-shuffle re-encode of the index under the stored
        # books; crash-atomic two-phase swap, then the gen sidecar
        # (a crash between swap and sidecar re-runs this — wasteful,
        # never wrong: the rebuild is a pure function of (index, books))
        replace_bucketed_table(
            spark, codes_table,
            _pq_encode_frame(
                spark.table(idx_table).select("vec_id", "bucket", "leaf", "v"),
                _books_np(spark, books_table),
            ),
            ("bucket", "leaf"),
        )
        _codes_gen_write(codes_path, gen)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        paths = (root_path, leaf_path, idx_path) + (
            (codes_path, books_path) if codes_on else ()
        )
        for p in paths:
            recover_compaction(spark, p)
        if (
            codes_on
            and spark.catalog.tableExists(codes_table)
            and spark.catalog.tableExists(root_table)
        ):
            # generation self-heal (docstring): codes encoded under a
            # root generation that is no longer live are re-encoded
            # before anything reads or appends to them
            gen = _root_gen_hash(spark, root_table)
            if _codes_gen_read(codes_path) != gen:
                rebuild_codes(gen)
        batch = batch_df.select(
            "vec_id", SF.col("embedding").cast("array<double>").alias("v")
        )
        if not spark.catalog.tableExists(root_table):
            # one-time two-level fit on the FIRST batch: bounded-collect
            # root k-means on an EXPLICITLY ORDERED sample (ADVICE r13,
            # same replay-stability reason as the flat loop's
            # bootstrap), then the distributed per-root leaf pass
            n0 = batch.count()
            nroot = min(_hier_nroot(n0, r_rows), max(1, n0))
            cents = _ivf_centroids(
                spark, batch, nroot, sample=_ordered_train_sample(batch)
            )
            write_bucketed(
                spark.createDataFrame(
                    [(i, c) for i, c in enumerate(cents)],
                    "cid long, cv array<double>",
                ),
                root_table, "cid", _BUCKETS, path=root_path,
            )
        if not spark.catalog.tableExists(leaf_table):
            # separate guard: a crash between the two bootstrap writes
            # replays THIS batch (foreachBatch checkpoint), so the leaf
            # rebuild from the persisted roots + the same batch is
            # deterministic — the flat loop has no such window (one
            # quantizer table), the two-level bootstrap does
            write_bucketed(
                hier_leaf_centroids(
                    ivf_assign_with(spark.table(root_table), batch),
                    leaf_rows=l_rows,
                ),
                leaf_table, "bucket", _BUCKETS, path=leaf_path,
            )
        root = spark.table(root_table)
        leaf = spark.table(leaf_table)
        ids = batch.select("vec_id")
        have_idx = spark.catalog.tableExists(idx_table)
        corpus = (
            spark.table(idx_table).join(ids, "vec_id", "left_anti")
            if have_idx
            else spark.createDataFrame(
                [], "vec_id long, bucket long, leaf long, v array<double>"
            )
        )
        if (
            drift_check_every
            and have_idx
            and batch_id > 0
            and batch_id % drift_check_every == 0
            # r15: generation-pinned reference (sidecar in the idx
            # table's data dir — hier_retrain swaps that dir, so the
            # reference resets exactly with the quantizer) + O(batch)
            # delta scoring, replacing the full-inverted-file re-score
            # per check; a hier index still gauges at the ROOT level
            and drift_degraded_pinned(
                drift_ref_stats(
                    spark, root, idx_table,
                    corpus.select("vec_id", "bucket", "v"),
                ),
                delta_p05(root, batch),
                drift_ratio,
            )
        ):
            hier_retrain(
                spark, root_table, leaf_table, idx_table,
                exclude_ids=ids, extra_train=batch,
                root_rows=r_rows, leaf_rows=l_rows,
            )
            if retrain_log is not None:
                retrain_log.append(int(batch_id))
            root = spark.table(root_table)
            leaf = spark.table(leaf_table)
            corpus = spark.table(idx_table).join(ids, "vec_id", "left_anti")
            if codes_on and spark.catalog.tableExists(codes_table):
                # the retrain moved every row's (bucket, leaf): re-
                # encode now; a crash before this lands is repaired by
                # the entry self-heal (the new roots won't match the
                # codes' recorded generation)
                rebuild_codes(_root_gen_hash(spark, root_table))
        status = semantic_delta_status_hier(root, leaf, corpus, batch)
        status.persist().count()
        (
            status.withColumn("batch_id", SF.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )
        new_vecs = batch.join(
            status.filter(SF.col("status") == "new").select("vec_id"),
            "vec_id",
            "left_semi",
        )
        if have_idx:
            # r17 (VERDICT r16 item 2): one agg over the PERSISTED
            # status frame supplies the admitted ids' (min, max) to
            # BOTH appends' replay guards — fresh batches then pay no
            # per-guard delta agg (two jobs saved per warm batch).
            mm = (
                status.filter(SF.col("status") == "new")
                .agg(SF.min("vec_id").alias("mn"), SF.max("vec_id").alias("mx"))
                .collect()[0]
            )
            mmt = (
                None if mm.mn is None else int(mm.mn),
                None if mm.mx is None else int(mm.mx),
            )
            hier_index_append(
                root, leaf, new_vecs, idx_table, idempotent=True, minmax=mmt
            )
            if codes_on and spark.catalog.tableExists(codes_table):
                # O(delta) code admit, replay-idempotent against the
                # CODES table's own watermark (a crash between the two
                # appends replays into an idx no-op + this catch-up)
                hier_pq_codes_append(
                    root, leaf, _books_np(spark, books_table), new_vecs,
                    codes_table, idempotent=True, minmax=mmt,
                )
        else:
            write_bucketed(
                hier_assign(ivf_assign_with(root, new_vecs), leaf),
                idx_table, ("bucket", "leaf"), _BUCKETS, path=idx_path,
            )
            # first generation: pin the ROOT-level drift reference at
            # creation (r16, VERDICT r15 item 3 — see the flat loop)
            pin_drift_ref(
                spark, root,
                idx_table,
                spark.table(idx_table).select("vec_id", "bucket", "v"),
            )
        if (
            codes_on
            and not spark.catalog.tableExists(codes_table)
            and spark.catalog.tableExists(idx_table)
        ):
            # CODES BOOTSTRAP, deliberately keyed on "codes missing,
            # index present" rather than the index's own bootstrap
            # branch: an empty or all-dup first batch defers it to the
            # first batch that actually indexes something, and a crash
            # between the index write and this block is repaired on
            # replay by the same condition. Books train ONCE, on a
            # bounded ordered sample of the INDEXED cohort (the flat
            # loop's replay-stable sampling discipline); the first
            # code generation is then one encode pass over the index.
            import numpy as _np

            from mr_py_spark.operators.similarity import (
                _ordered_train_sample as _ots,
            )
            from mr_py_spark.operators.vectors import _pq_train

            X = _ots(spark.table(idx_table).select("vec_id", "v"))
            if len(X):
                books = _pq_train(
                    _np.asarray(X, dtype=_np.float64),
                    m=pq_m,
                    k=min(pq_k, len(X)),
                    sub=X.shape[1] // pq_m,
                )
                write_bucketed(
                    spark.createDataFrame(
                        [
                            (mi, ki, [float(x) for x in books[mi, ki]])
                            for mi in range(books.shape[0])
                            for ki in range(books.shape[1])
                        ],
                        "mi long, ki long, sub array<double>",
                    ),
                    books_table, "mi", _BUCKETS, path=books_path,
                )
                write_bucketed(
                    _pq_encode_frame(
                        spark.table(idx_table).select(
                            "vec_id", "bucket", "leaf", "v"
                        ),
                        books,
                    ),
                    codes_table, ("bucket", "leaf"), _BUCKETS,
                    path=codes_path,
                )
                _codes_gen_write(codes_path, _root_gen_hash(spark, root_table))
        status.unpersist()

    return step


@register("stream_hier_index_maintenance", tags=("C9", "C2", "C3", "A8"))
def stream_hier_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest loop for the STANDING TWO-LEVEL index — the
    production semantic-maintenance form past the flat tier's
    4096-centroid cap (SCALE.md r13: cell occupancy pinned at ~64 at
    any corpus size where the flat loop's bucket occupancy grows
    linearly): each micro-batch is triaged against the live
    (bucket, leaf) cells (``semantic_delta_status_hier``, candidate
    work ~64 rows/vector), statuses land in a parquet sink, survivors
    are admitted via ``hier_index_append`` under the same composite
    bucket spec, and root-level drift triggers the crash-atomic
    three-table ``hier_retrain``. Replay-idempotent under
    foreachBatch's at-least-once contract via the same three guards as
    the LSH and flat-IVF loops (byte-level property tests in
    tests/test_streaming_sink.py). Rows-only (seeded quantizers are
    engine-specific); the fixture drain is checked for
    one-status-per-vector and determinism."""
    import shutil
    import tempfile

    harden(spark)
    root_dir = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        sf_dir.rstrip("/").replace("/", "_"),
        "hier_maint",
    )
    shutil.rmtree(root_dir, ignore_errors=True)
    out = os.path.join(root_dir, "out")
    ckpt = os.path.join(root_dir, "ckpt")
    os.makedirs(out, exist_ok=True)
    tag = stream_table_tag(sf_dir)
    root_table = f"mrps_stream_hier_root_{tag}"
    leaf_table = f"mrps_stream_hier_leaf_{tag}"
    idx_table = f"mrps_stream_hier_idx_{tag}"
    for t in (root_table, leaf_table, idx_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir.rstrip("/"))
    )
    q = (
        stream.writeStream.foreachBatch(
            _hier_maintenance_step(
                spark, root_table, leaf_table, idx_table, out,
                os.path.join(root_dir, "root"),
                os.path.join(root_dir, "leaf"),
                os.path.join(root_dir, "index"),
            )
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out).select(
        "vec_id",
        "status",
        "match_id",
        F.col("batch_id").cast("long").alias("batch_id"),
    )


@register("stream_hier_pq_maintenance", tags=("C9", "C3", "A8", "B22"))
def stream_hier_pq_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_hier_index_maintenance`` with the ADC tier's standing
    PQ-CODE table maintained in the same loop (r16, VERDICT r15
    item 7): codebooks train once on the bootstrap cohort and persist,
    admitted vectors are encoded O(delta) per batch under the codes
    table's own replay guard, and generation coherence is the
    self-healing root-hash sidecar check (``_hier_maintenance_step``
    docstring — a retrain re-encodes; a crash between swap and
    re-encode repairs at the next step entry). Emits the audit the
    lifecycle promises instead of the triage statuses: the codes table
    is row-identical (codes included) to a one-pass encode of the
    final index under the stored books, covers exactly the indexed
    ids, and the stored generation matches the live roots. Rows-only
    (seeded quantizers + engine-specific code layout); crash-window,
    replay, and retrain-re-encode properties are byte-level-tested in
    tests/test_streaming_sink.py."""
    import shutil
    import tempfile

    from mr_py_spark.operators.bucketed import _table_location
    from mr_py_spark.operators.hier import _pq_encode_frame

    harden(spark)
    root_dir = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        sf_dir.rstrip("/").replace("/", "_"),
        "hier_pq_maint",
    )
    shutil.rmtree(root_dir, ignore_errors=True)
    out = os.path.join(root_dir, "out")
    ckpt = os.path.join(root_dir, "ckpt")
    os.makedirs(out, exist_ok=True)
    tag = stream_table_tag(sf_dir)
    root_table = f"mrps_stream_hpq_root_{tag}"
    leaf_table = f"mrps_stream_hpq_leaf_{tag}"
    idx_table = f"mrps_stream_hpq_idx_{tag}"
    codes_table = f"mrps_stream_hpq_codes_{tag}"
    books_table = f"mrps_stream_hpq_books_{tag}"
    for t in (root_table, leaf_table, idx_table, codes_table, books_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir.rstrip("/"))
    )
    codes_path = os.path.join(root_dir, "codes")
    q = (
        stream.writeStream.foreachBatch(
            _hier_maintenance_step(
                spark, root_table, leaf_table, idx_table, out,
                os.path.join(root_dir, "root"),
                os.path.join(root_dir, "leaf"),
                os.path.join(root_dir, "index"),
                codes_table=codes_table, codes_path=codes_path,
                books_table=books_table,
                books_path=os.path.join(root_dir, "books"),
            )
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # lifecycle audit (vs the statuses the sibling query already emits)
    idx = spark.table(idx_table)
    got = spark.table(codes_table).select(
        "vec_id", F.struct("bucket", "leaf", "code").alias("got")
    )
    want = _pq_encode_frame(
        idx.select("vec_id", "bucket", "leaf", "v"),
        _books_np(spark, books_table),
    ).select("vec_id", F.struct("bucket", "leaf", "code").alias("want"))
    mismatches = (
        got.join(want, "vec_id", "full_outer")
        .filter(
            F.col("got").isNull()
            | F.col("want").isNull()
            | (F.col("got") != F.col("want"))
        )
        .count()
    )
    gen_ok = _codes_gen_read(
        _table_location(spark, codes_table)
    ) == _root_gen_hash(spark, root_table)
    return spark.createDataFrame(
        [
            ("n_indexed", int(idx.count())),
            ("n_codes", int(spark.table(codes_table).count())),
            ("mismatch_vs_full_encode", int(mismatches)),
            ("generation_coherent", 1 if gen_ok else 0),
        ],
        "metric string, value long",
    )
