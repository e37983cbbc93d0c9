"""kmeans_embeddings / semantic_dedup unit + plan tests (the oracle
parity tests in test_parity.py are the correctness gate; these pin the
scale-shape and the exact-integer rounding kernel)."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mr_py_spark.operators.kmeans import _kmeans_k, _round_mean
from tests.test_plans import plan_of


@given(
    st.lists(st.integers(-(1 << 45), 1 << 45), min_size=1, max_size=8),
    st.integers(1, 1 << 20),
)
@settings(max_examples=200, deadline=None)
def test_round_mean_is_exact_half_away(sums, cnt):
    """_round_mean(s, cnt) must equal round-half-away-from-zero of the
    EXACT rational s/cnt — the property that makes the Spark update
    and the oracle's CASE ... // formula bit-identical at any
    magnitude (no double division anywhere)."""
    got = _round_mean(np.asarray(sums, dtype=np.int64), cnt)
    half = Fraction(1, 2)
    for s, g in zip(sums, got):
        v = Fraction(s, cnt)
        # half-away-from-zero: floor(|v| + 1/2), sign restored
        expect = (v + half).__floor__() if v >= 0 else -((-v + half).__floor__())
        assert int(g) == int(expect), (s, cnt)


def test_kmeans_k_clamps():
    assert _kmeans_k(10) == 8
    assert _kmeans_k(500) == 8
    assert _kmeans_k(64 * 100) == 100
    assert _kmeans_k(10**9) == 4096


def test_kmeans_cluster_sizes_cover_corpus(spark):
    from mr_py_spark.registry import load_all
    from tests.conftest import SF_DIR

    reg = load_all()
    rows = reg["kmeans_embeddings"].fn(spark, SF_DIR).collect()
    import duckdb

    n = duckdb.sql(
        f"select count(*) from parquet_scan('{SF_DIR}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r.n_vecs for r in rows) == n  # every vector assigned once
    assert len(rows) == _kmeans_k(n)


def test_semantic_dedup_pair_join_no_cartesian(spark):
    """SemDeDup candidate mining must be the cluster-id EQUI-join —
    never an all-pairs product (the C2 LSH-family bound: within-
    cluster pairwise is O(sum s_c^2), linear in n for n-adaptive k)."""
    p = plan_of(spark, "semantic_dedup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
