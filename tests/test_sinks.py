"""Sink tests (B14 partitioned write, B22 bucketed tables)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mr_py_spark.sources import tbl
from mr_py_spark.sources.sinks import write_bucketed, write_partitioned
from tests.conftest import SF_DIR


def test_partitioned_write_roundtrip(spark, tmp_path):
    docs = tbl(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_part")
    write_partitioned(docs, out, "source")
    # hive-style layout on the routing key
    assert any(d.startswith("source=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition pruning: reading one partition touches one directory
    one = back.filter(F.col("source") == "src0")
    expected = docs.filter(F.col("source") == "src0").count()
    assert one.count() == expected


def test_asof_over_bucketed_no_exchange(spark):
    """The asof_join docstring's durable-warehouse claim, proven: over
    an events table bucketed by user_id, the as-of window needs no
    exchange — the plan is scan + in-partition sort + window, so the
    repeated-join cost is scan-bound."""
    from pyspark.sql import Window as W

    from mr_py_spark.operators.sql_surface import asof_join

    ev = tbl(spark, SF_DIR, "events")
    write_bucketed(ev, "t_events_b", "user_id", 4)
    b = spark.table("t_events_b")
    tagged = b.filter(F.col("event_type").isin("purchase", "signup")).select(
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias("event_id"),
        "user_id",
        "ts",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("event_id").isNotNull().cast("int"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        tagged.withColumn("last_signup", F.last("signup_ts", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .select("event_id", "user_id", F.col("last_signup").alias("signup_ts"))
    )
    out.collect()  # execute so the AQE-final plan is inspected
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan[:2000]
    assert "Exchange" not in plan, plan[:2000]
    # same answer as the registered shuffle form
    expected = {
        (r.event_id, r.user_id, r.signup_ts)
        for r in asof_join(spark, SF_DIR)
        .select("event_id", "user_id", "signup_ts")
        .collect()
    }
    got = {
        (r.event_id, r.user_id, r.signup_ts)
        for r in out.select(
            "event_id",
            "user_id",
            F.date_format("signup_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        ).collect()
    }
    assert got == expected


def test_bucketed_join_skips_shuffle(spark):
    orders = tbl(spark, SF_DIR, "orders")
    lineitem = tbl(spark, SF_DIR, "lineitem")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "k"), "t_orders_b", "k", 4)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "k"), "t_lineitem_b", "k", 4)
    # force the sort-merge path (tiny test tables would broadcast, which
    # bypasses bucketing entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed sort-merge join: no shuffle on either side
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_warehouse_rebuilds_on_fixture_regeneration(spark, tmp_path):
    """The warehouse cache is content-stamped: regenerating the source
    fixture at the SAME path must invalidate the cached buckets (a
    stale copy would silently diverge from what every other query and
    the DuckDB oracle read)."""
    import shutil as _sh

    from mr_py_spark.operators.bucketed import _bucketed_table
    from tests.conftest import SF_DIR as _SF

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        _sh.copy(f"{_SF}/{t}.parquet", f"{sf}/{t}.parquet")
    n1 = _bucketed_table(spark, sf, "orders", "o_orderkey").count()
    # regenerate: halve the fixture in place (new size + mtime)
    half = spark.read.parquet(f"{_SF}/orders.parquet").limit(700)
    tmp_out = str(tmp_path / "half")
    half.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = next(p for p in os.listdir(tmp_out) if p.endswith(".parquet"))
    _sh.copy(os.path.join(tmp_out, part), f"{sf}/orders.parquet")
    n2 = _bucketed_table(spark, sf, "orders", "o_orderkey").count()
    assert n1 > 700 and n2 == 700, (n1, n2)


def test_bucketed_reattach_never_invokes_builder(spark, tmp_path):
    """ADVICE r11: a fresh session re-attaching VALID persisted files
    must not invoke frame_of() just to derive the DDL schema — for the
    IVF centroid table that builder runs a full driver-side k-means,
    contradicting the standing-index claim. With an explicit ``schema``
    the re-attach path must never call the builder; the build path
    calls it exactly once."""
    import shutil as _sh

    from mr_py_spark.operators.bucketed import _bucketed_table
    from tests.conftest import SF_DIR as _SF

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    _sh.copy(f"{_SF}/nation.parquet", f"{sf}/nation.parquet")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(f"{sf}/nation.parquet").select(
            F.col("n_nationkey").alias("k"), F.col("n_name").alias("s")
        )

    # n_nationkey is int32 in the fixture — the r12 write-time schema
    # validation caught the original 'k long' declaration here (exactly
    # the drift class it exists for)
    kw = dict(frame_of=build, src_name="nation", schema="k int, s string")
    n1 = _bucketed_table(spark, sf, "derived_nat", "k", **kw).count()
    assert calls["n"] == 1  # built once
    # simulate a fresh session: catalog entry gone, files + marker valid
    tag = None
    for t in spark.catalog.listTables():
        if t.name.startswith("mrps_bkt_derived_nat_"):
            tag = t.name
    assert tag is not None
    spark.sql(f"DROP TABLE {tag}")
    n2 = _bucketed_table(spark, sf, "derived_nat", "k", **kw).count()
    assert n2 == n1
    assert calls["n"] == 1  # re-attach: builder NOT re-invoked


def test_compaction_preserves_content_and_layout(spark, tmp_path):
    """``compact_bucketed_table`` (VERDICT r12 item 3): after N appends
    the standing table is N-way fragmented; compaction must (a) cut the
    file count to one per occupied bucket, (b) keep the row set
    bit-identical, and (c) preserve the bucket spec so a co-located
    join stays exchange-free — the very scan property the layout exists
    for."""
    from mr_py_spark.operators.bucketed import (
        _data_files,
        _table_location,
        compact_bucketed_table,
    )

    orders = tbl(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("k"), "o_custkey", "o_orderdate"
    )
    table = "t_compact_orders"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    path = str(tmp_path / "t_compact_orders")
    part = F.col("k") % 3
    write_bucketed(orders.filter(part == 0), table, "k", 8, path=path)
    for i in (1, 2):
        write_bucketed(orders.filter(part == i), table, "k", 8, mode="append")
    before = sorted(tuple(r) for r in spark.table(table).collect())
    files_before = len(_data_files(_table_location(spark, table)))
    assert files_before > 8  # the appends created the small-file debt
    stats = compact_bucketed_table(spark, table, "k", n_buckets=8)
    assert stats["files_before"] == files_before
    assert stats["files_after"] <= 8
    assert stats["rows"] == len(before)
    after = sorted(tuple(r) for r in spark.table(table).collect())
    assert after == before  # bit-identical content
    # the spec survived the swap: a self-join on k is exchange-free
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table(table).select("k", "o_custkey")
        b = spark.table(table).select("k", "o_orderdate")
        joined = a.join(b, "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compaction_preserves_array_columns(spark, tmp_path):
    """Compaction of an IVF-inverted-file-shaped table (array<double>
    payload — the type the lifecycle actually compacts): full-row
    bit-identity incl. every vector element, and the re-attach DDL
    round-trips the nested type."""
    from mr_py_spark.operators.bucketed import compact_bucketed_table

    rows = [(i, i % 5, [float(i), float(i) / 3.0, -1.5 * i]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, bucket long, v array<double>")
    table = "t_compact_ivf_like"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write_bucketed(
            df.filter(F.col("vec_id") < 100), table, "bucket", 8,
            path=str(tmp_path / table),
        )
        write_bucketed(
            df.filter(F.col("vec_id") >= 100), table, "bucket", 8, mode="append"
        )
        before = sorted(
            (r.vec_id, r.bucket, tuple(r.v)) for r in spark.table(table).collect()
        )
        stats = compact_bucketed_table(spark, table, "bucket", n_buckets=8)
        after = sorted(
            (r.vec_id, r.bucket, tuple(r.v)) for r in spark.table(table).collect()
        )
        assert after == before and stats["rows"] == 200
        assert stats["files_after"] <= 8 <= stats["files_before"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _crashable_compaction(spark, tmp_path, name):
    """Shared setup for the crash-injection tests: a fragmented
    external bucketed table plus its pre-crash content snapshot."""
    df = spark.createDataFrame(
        [(i, i % 5, f"s{i}") for i in range(200)],
        "vec_id long, bucket long, s string",
    )
    table = f"t_crash_{name}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    path = str(tmp_path / table)
    write_bucketed(df.filter(F.col("vec_id") < 100), table, "bucket", 8, path=path)
    write_bucketed(df.filter(F.col("vec_id") >= 100), table, "bucket", 8, mode="append")
    before = sorted(tuple(r) for r in spark.table(table).collect())
    return table, path, before


def _crash_then_recover(spark, monkeypatch, table, path, before, crash_pred):
    """Inject a crash (os.replace raising on the predicate) inside
    compact_bucketed_table's swap window, then prove
    ``recover_compaction`` restores a queryable, full-content table
    (VERDICT r12 item 6: the swap must be crash-atomic)."""
    import pytest

    from mr_py_spark.operators import bucketed as bk

    real_replace = os.replace

    def failing(src, dst):
        if crash_pred(str(src), str(dst)):
            raise RuntimeError("injected crash")
        return real_replace(src, dst)

    monkeypatch.setattr(bk.os, "replace", failing)
    with pytest.raises(RuntimeError, match="injected crash"):
        bk.compact_bucketed_table(spark, table, "bucket", n_buckets=8)
    monkeypatch.setattr(bk.os, "replace", real_replace)
    assert os.path.exists(bk._commit_marker(path))  # swap is in flight
    assert bk.recover_compaction(spark, path)
    after = sorted(tuple(r) for r in spark.table(table).collect())
    assert after == before  # full content, queryable again
    assert not os.path.exists(bk._commit_marker(path))
    assert bk.recover_compaction(spark, path) is False  # idempotent no-op
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compaction_crash_before_rename_recovers(spark, tmp_path, monkeypatch):
    """Crash at the FIRST directory rename (catalog entries already
    dropped, live dir untouched, compacted side copy complete):
    recovery rolls forward to the compacted generation."""
    table, path, before = _crashable_compaction(spark, tmp_path, "pre_rename")
    _crash_then_recover(
        spark, monkeypatch, table, path, before,
        lambda src, dst: dst.endswith("__old"),
    )


def test_compaction_crash_between_renames_recovers(spark, tmp_path, monkeypatch):
    """Crash BETWEEN the two renames (live dir already moved aside, the
    compacted copy not yet in place — the worst window: the table's
    path does not exist): recovery rolls the compacted copy in."""
    table, path, before = _crashable_compaction(spark, tmp_path, "mid_rename")
    _crash_then_recover(
        spark, monkeypatch, table, path, before,
        lambda src, dst: src.endswith("__compacting") and not dst.endswith(".json"),
    )


def test_compaction_crash_before_marker_removal_recovers(spark, tmp_path, monkeypatch):
    """Crash AFTER the re-attach but before the marker is removed:
    recovery re-runs the re-attach idempotently and clears the marker."""
    import pytest

    from mr_py_spark.operators import bucketed as bk

    table, path, before = _crashable_compaction(spark, tmp_path, "post_attach")
    marker = bk._commit_marker(path)
    real_remove = os.remove

    def failing(p):
        if str(p) == marker:
            raise RuntimeError("injected crash")
        return real_remove(p)

    monkeypatch.setattr(bk.os, "remove", failing)
    with pytest.raises(RuntimeError, match="injected crash"):
        bk.compact_bucketed_table(spark, table, "bucket", n_buckets=8)
    monkeypatch.setattr(bk.os, "remove", real_remove)
    assert os.path.exists(marker)
    assert bk.recover_compaction(spark, path)
    after = sorted(tuple(r) for r in spark.table(table).collect())
    assert after == before
    assert not os.path.exists(marker)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compaction_refuses_managed_table(spark):
    """A MANAGED bucketed table must be refused up front (ADVICE r12):
    DROP TABLE would delete its data directory mid-swap and the
    original generation would be unrecoverable."""
    import pytest

    from mr_py_spark.operators.bucketed import compact_bucketed_table

    df = spark.createDataFrame([(i, i % 3) for i in range(20)], "k long, b long")
    table = "t_compact_managed"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write_bucketed(df, table, "b", 4)  # no path -> managed
        with pytest.raises(ValueError, match="not\\s+EXTERNAL"):
            compact_bucketed_table(spark, table, "b", n_buckets=4)
        # the refusal must be non-destructive: table still queryable
        assert spark.table(table).count() == 20
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_replay_guard_fast_path_and_exactness(spark, tmp_path):
    """The O(delta) replay guard (VERDICT r13 'watch it'): a FRESH
    batch (ids above the watermark) passes through as the IDENTICAL
    DataFrame object — proof no index-side join was attached, i.e.
    zero index I/O on the normal streaming path — while a replayed or
    mixed batch drops exactly the ids the table already holds. Crash
    windows: a raise-then-crash (watermark advanced, rows never
    appended) must NOT lose the retried batch, and a vanished sidecar
    degrades to the exact bootstrap check."""
    import shutil

    from mr_py_spark.operators.bucketed import replay_guard

    table = "t_replay_guard"
    path = str(tmp_path / "idx")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        base = spark.createDataFrame(
            [(i, i * 10) for i in range(10)], "vec_id long, x long"
        )
        write_bucketed(base, table, "vec_id", 4, path=path)

        # bootstrap call: table max is scanned once, fresh ids kept
        b1 = spark.createDataFrame(
            [(i, 0) for i in range(10, 15)], "vec_id long, x long"
        )
        out1 = replay_guard(spark, table, b1, "vec_id")
        assert sorted(r.vec_id for r in out1.collect()) == list(range(10, 15))
        write_bucketed(out1, table, "vec_id", 4, mode="append")

        # fresh batch after bootstrap: the fast path returns the SAME
        # object (no plan surgery, no index scan)
        b2 = spark.createDataFrame(
            [(i, 0) for i in range(15, 18)], "vec_id long, x long"
        )
        assert replay_guard(spark, table, b2, "vec_id") is b2
        write_bucketed(b2, table, "vec_id", 4, mode="append")

        # full replay of b2: everything dropped
        assert replay_guard(spark, table, b2, "vec_id").count() == 0
        # mixed batch: only the unseen id survives
        b3 = spark.createDataFrame(
            [(16, 0), (17, 0), (99, 0)], "vec_id long, x long"
        )
        assert sorted(
            r.vec_id for r in replay_guard(spark, table, b3, "vec_id").collect()
        ) == [99]

        # crash window: the guard raised the watermark for 99 above,
        # but 99 was never appended — retrying the batch must still
        # admit it (suspects are exact-checked against the table)
        out3 = replay_guard(spark, table, b3, "vec_id")
        assert sorted(r.vec_id for r in out3.collect()) == [99]
        write_bucketed(out3, table, "vec_id", 4, mode="append")
        assert replay_guard(spark, table, b3, "vec_id").count() == 0

        # vanished sidecar: bootstrap re-derives from the table —
        # replay still admits nothing, fresh still admitted
        os.remove(path + "_rwm")  # r16: a JSON file, not a dir
        assert replay_guard(spark, table, b3, "vec_id").count() == 0
        b4 = spark.createDataFrame([(200, 0)], "vec_id long, x long")
        assert sorted(
            r.vec_id for r in replay_guard(spark, table, b4, "vec_id").collect()
        ) == [200]

        # table recreation at the same path clears the stale sidecar
        # (a stale-LOW watermark would be unsound for a new generation)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(path, ignore_errors=True)
        write_bucketed(base, table, "vec_id", 4, path=path)
        assert not os.path.exists(path + "_rwm")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
