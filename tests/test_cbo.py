"""CBO statistics demo (verdict r4 item 4): ANALYZE TABLE replaces the
q5 broadcast hint.

SCALE.md's sf10 measurement showed why the registered q5 hints its
supplier-side broadcast: without statistics the static planner
estimates a join's output size as the PRODUCT of its input sizes, so
the (tiny) region-pruned supplier dim looks enormous after two joins
and lineitem⋈supplier falls back to sort-merge. This file runs the
same A/B at sf0.01 by fixing the broadcast threshold at 1 MB — the
fixture's stand-in for "dims are MBs while facts are TBs" — so the
only variable between the two arms is the quality of the estimate:

- control (no stats, CBO off): hint-free q5 must NOT statically
  broadcast the supplier edge (the product overflows the threshold);
- ANALYZE'd catalog tables + spark.sql.cbo.enabled: the identical
  hint-free plan DOES broadcast it — the durable 100 TB answer
  (one metastore ANALYZE instead of per-query hints).

AQE is disabled in both arms so only the static planner acts.
Results must also match the registered (hinted) q5 row-for-row.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

import pytest

from mr_py_spark.registry import load_all
from mr_py_spark.stats import q5_local_supplier_nohint, register_stats_tables

REG = load_all()
SF01 = "/root/testdata/sf0.01"
THRESHOLD = str(1024 * 1024)  # 1 MB: dims-vs-facts ratio at fixture scale


@contextmanager
def confs(spark, **kv):
    keys = {k.replace("__", "."): v for k, v in kv.items()}
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def _static_plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_BHJ = re.compile(r"BroadcastHashJoin \[([^\]]*)\], \[([^\]]*)\].*Build(Left|Right)")


def _supplier_edge_broadcast(plan: str) -> bool:
    """True if lineitem's l_suppkey equi-join is a broadcast hash join
    whose BUILD side is the supplier dim (s_suppkey keys). The build
    side matters: the no-stats control at fixture scale broadcasts
    LINEITEM into the 2.9 GiB-estimated supplier tree — at 100 TB
    that's broadcasting the fact table, exactly as wrong as the SMJ
    fallback SCALE.md measured at sf10. CBO's join reorder may merge
    the suppkey and orderkey edges into one combined join (dims tree
    as a ~300-row build side); matching on key names covers both
    shapes. Any l_suppkey sort-merge join disqualifies."""
    ok = False
    for line in plan.splitlines():
        if "SortMergeJoin" in line and "l_suppkey" in line:
            return False
        m = _BHJ.search(line)
        if m and "l_suppkey" in line:
            left, right, build = m.groups()
            build_keys = left if build == "Left" else right
            if "s_suppkey" in build_keys:
                ok = True
            else:
                return False  # built the fact side
    return ok


@pytest.fixture(scope="module")
def stats_db(spark):
    return register_stats_tables(spark, SF01)


def test_without_stats_static_planner_needs_the_hint(spark):
    """Control: no stats, no hint, no AQE -> supplier edge is NOT a
    static broadcast (this is precisely why the registered q5 carries
    the hint). If this ever starts passing as broadcast, the hint can
    be dropped outright."""
    with confs(
        spark,
        **{
            "spark__sql__adaptive__enabled": "false",
            "spark__sql__cbo__enabled": "false",
            "spark__sql__autoBroadcastJoinThreshold": THRESHOLD,
        },
    ):
        p = _static_plan(
            spark, q5_local_supplier_nohint(spark, SF01, via_catalog=False)
        )
    assert not _supplier_edge_broadcast(p), p


def test_analyze_stats_replace_the_broadcast_hint(spark, stats_db):
    """ANALYZE'd catalog tables + CBO: the static planner finds the
    supplier broadcast with zero hints at the same threshold."""
    with confs(
        spark,
        **{
            "spark__sql__adaptive__enabled": "false",
            "spark__sql__cbo__enabled": "true",
            "spark__sql__cbo__joinReorder__enabled": "true",
            "spark__sql__autoBroadcastJoinThreshold": THRESHOLD,
        },
    ):
        p = _static_plan(spark, q5_local_supplier_nohint(spark, stats_db))
    assert _supplier_edge_broadcast(p), p


def test_nohint_results_match_registered_q5(spark, stats_db):
    """Same answer with hints, without hints, and through the catalog."""
    expect = sorted(map(tuple, REG["q5_local_supplier"].fn(spark, SF01).collect()))
    with confs(spark, spark__sql__cbo__enabled="true"):
        got = sorted(
            map(tuple, q5_local_supplier_nohint(spark, stats_db).collect())
        )
    assert got == expect


def test_catalog_opt_in_routes_tbl_through_stats_db(spark, stats_db, monkeypatch):
    """SPARK_GRAFT_USE_CATALOG=<db> makes tbl() serve catalog tables
    (so registered queries get ANALYZE'd stats) with two guarantees:
    identical results, and location-checked fallback — a db ANALYZE'd
    at sf0.01 must never serve another sf_dir, and events always takes
    the parquet+nanos path."""
    from mr_py_spark.sources import tbl
    from tests.conftest import SF_DIR

    expect = sorted(map(tuple, REG["q5_local_supplier"].fn(spark, SF01).collect()))
    monkeypatch.setenv("SPARK_GRAFT_USE_CATALOG", stats_db)
    spark.__dict__.pop("_mrps_tbl_cache", None)  # drop env-less cached plans
    try:
        li = tbl(spark, SF01, "lineitem")
        p = li._jdf.queryExecution().executedPlan().toString()
        assert stats_db in p, p  # catalog route actually taken
        got = sorted(map(tuple, REG["q5_local_supplier"].fn(spark, SF01).collect()))
        assert got == expect
        # wrong sf_dir -> location check falls back to the parquet path
        other = tbl(spark, SF_DIR, "lineitem")
        po = other._jdf.queryExecution().executedPlan().toString()
        assert stats_db not in po and SF_DIR in po, po
        # events is always the parquet+nanos-normalization path
        ev = tbl(spark, SF01, "events")
        assert dict(ev.dtypes)["ts"].startswith("timestamp")
    finally:
        spark.__dict__.pop("_mrps_tbl_cache", None)
