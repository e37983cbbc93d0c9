"""Hierarchical (two-level) coarse quantizer for the semantic tier
(SURVEY.md §2 C2/C3 — the scale continuation of kmeans.semantic_dedup
and similarity.incremental_semantic_dedup; VERDICT r12 item 1).

The flat quantizers cap their centroid count at 4096 so the centroid
frame stays a bounded broadcast (similarity._ivf_nlist,
kmeans._kmeans_k). Past n ≈ 262k vectors that cap makes average bucket
occupancy — and therefore cluster-mate PAIR WORK in both semantic-dedup
forms — grow linearly with the corpus (SCALE.md r12 measured occupancy
488 at 2M vectors, where the SemDeDup economics want ~64). The fix is
depth, not a bigger broadcast:

- **Root quantizer**: ≤ 4096 spherical centroids sized for ~_ROOT_ROWS
  (4096) vectors per root bucket — the SAME bounded-broadcast training
  and zero-shuffle argmax assignment the flat IVF tier uses
  (similarity._ivf_centroids / ivf_assign_with).
- **Leaf quantizers**: one small k-means PER ROOT BUCKET, trained
  DISTRIBUTED — a single applyInPandas pass grouped by root bucket, so
  the work fans out across the cluster and the driver never collects a
  centroid (the leaf table can exceed any broadcast budget: n/64 rows).
  k_leaf is sized PER GROUP from its own occupancy (ceil(occ/64)), so
  a skewed hot root automatically gets more leaves — the flat form has
  no such degree of freedom.
- **Cell = (bucket, leaf)**: effective occupancy stays ~_LEAF_ROWS (64)
  for any corpus up to ~4096 · 4096 · 64 ≈ 1e9 vectors (past that, add
  a third level — same construction, the leaf trainer is already
  group-local). Candidate generation joins on the composite cell key
  against the (bucket, leaf)-bucketed standing inverted file, so the
  corpus side stays exchange-free exactly like the flat standing index.

Assignment never broadcasts the leaf table: vectors take the root
argmax (broadcast of ≤ 4096 roots), then meet ONLY their own root's
leaves in a cogroup keyed on the root bucket — the leaf side arrives
pre-bucketed from its standing table, so only the (small) delta
exchanges. Leaf scoring uses the house fold-order kernel
(similarity._fold_order_blocks): bit-stable and row-blocked, so a hot
root never allocates an unbounded score matrix.

The flat forms stay untouched (their driver statuses are pinned);
``incremental_semantic_dedup_hier`` is the registered production form
for corpora past the flat cap, property-tested with planted statuses,
a single-leaf-degeneration bit-equality pin against the flat kernel,
and an occupancy-flatness test; the sf100 interleaved A/B vs the flat
index lives in SCALE.md r13.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mr_py_spark.registry import register
from mr_py_spark.sources import tbl
from mr_py_spark.util import table_rows as _table_rows

#: Target occupancies per level. Roots hold ~4096 vectors (the ANN
#: bucket grain — bounds the per-group leaf-training input at
#: n/nroot ≤ ~262k rows even at the root cap), leaves ~64 (the
#: SemDeDup pair-work grain, kmeans._kmeans_k's target).
_ROOT_ROWS = 4096
_LEAF_ROWS = 64
_MAX_K = 4096  # per-level centroid cap (broadcast / per-group bound)


def _hier_nroot(n: int, root_rows: int = _ROOT_ROWS) -> int:
    """Root count sized for ~root_rows vectors per root, clamped like
    _ivf_nlist so the root broadcast stays bounded."""
    return max(8, min(_MAX_K, round(n / root_rows) or 1))


def _np_spherical_kmeans(X: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic seeded spherical k-means on an in-memory (n, dim)
    float64 block — the LEAF trainer, run once per root group inside
    applyInPandas (so "distributed" means across groups; each group is
    bounded by root occupancy). Farthest-point init at small k for
    spread, seeded choice above; 8 Lloyd rounds; empty clusters are
    dropped and the result L2-normalized so dot == cosine during
    assignment. Bucketing quality is what a quantizer needs — the
    recall/status properties gate it, not cluster optimality."""
    n = len(X)
    k = max(1, min(k, n))
    rng = np.random.RandomState(seed)
    if k == 1:
        cent = X.mean(0, keepdims=True).copy()
    elif k <= 64:
        idx = [int(rng.randint(n))]
        d2 = ((X - X[idx[0]]) ** 2).sum(1)
        for _ in range(k - 1):
            nxt = int(d2.argmax())
            idx.append(nxt)
            d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(1))
        cent = X[idx].copy()
    else:
        cent = X[rng.choice(n, k, replace=False)].copy()
    for _ in range(8):
        # argmin ||x-c||^2 == argmax x.c - |c|^2/2; mean update is a
        # scatter-add (the r13-correction Lloyd rule: a per-occupied-
        # cluster mask loop is O(k·n) per round, which a hot root at
        # k≈4096 over ~262k rows turns into 1e9 ops per round)
        assign = (X @ cent.T - 0.5 * (cent**2).sum(1)).argmax(1)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=len(cent))
        occ = counts > 0
        cent[occ] = sums[occ] / counts[occ, None].astype(np.float64)
    assign = (X @ cent.T - 0.5 * (cent**2).sum(1)).argmax(1)
    cent = cent[np.unique(assign)]  # drop empties, renumber dense
    norms = np.linalg.norm(cent, axis=1)
    norms[norms == 0.0] = 1.0
    return cent / norms[:, None]


def _spread_by_bucket(root_assigned: DataFrame, spread: int | None) -> DataFrame:
    """BUILD-path skew fix (r15, VERDICT r14 item 5): the leaf-train /
    assign group exchanges default to the session's shuffle-partition
    count, so each task bundles many root groups — at 8M vectors the
    r15 profile measured max/p50 task time 3.4x on leaf training (a
    298 s straggler against an 89 s median, the stage wall pinned by
    it) where 2M showed 1.2x. An explicit repartition on the group key
    into ~nroot partitions puts ~one group per task: HashPartitioning
    (bucket, spread) satisfies the groupBy/cogroup's required
    clustering for ANY partition count, so no second exchange is
    added, and an explicit-N repartition is exempt from AQE
    coalescing. Opt-in (None = current behavior) because the SERVE
    path must keep its standing leaf table exchange-free: spreading a
    delta-side cogroup would re-shuffle the big leaf side to match."""
    if spread is None:
        return root_assigned
    return root_assigned.repartition(max(1, int(spread)), "bucket")


def hier_leaf_centroids(
    root_assigned: DataFrame,
    leaf_rows: int = _LEAF_ROWS,
    spread: int | None = None,
) -> DataFrame:
    """(bucket, leaf, lv): per-root-bucket leaf centroids, trained in
    ONE distributed pass grouped by root bucket — no driver collect at
    any k (the flat quantizers' 4096-cap exists because their centroids
    ride a broadcast; leaves never do). Deterministic: each group is
    sorted by vec_id before training and the rng is seeded on the
    bucket id, so rebuilds are bit-identical regardless of partition
    layout. k_leaf = ceil(occupancy / leaf_rows), capped at _MAX_K —
    sized per group, so hot roots get proportionally more leaves.
    ``spread`` (build paths pass nroot) unbundles groups from tasks —
    see _spread_by_bucket."""

    def train(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        X = np.asarray(list(pdf["v"]), dtype=np.float64)
        b = int(pdf["bucket"].iloc[0])
        k = max(1, min(_MAX_K, -(-len(X) // leaf_rows)))
        cent = _np_spherical_kmeans(X, k, seed=b)
        return pd.DataFrame(
            {
                "bucket": np.full(len(cent), b, dtype=np.int64),
                "leaf": np.arange(len(cent), dtype=np.int64),
                "lv": [[float(x) for x in c] for c in cent],
            }
        )

    return _spread_by_bucket(root_assigned, spread).groupBy("bucket").applyInPandas(
        train, "bucket long, leaf long, lv array<double>"
    )


def hier_assign(
    root_assigned: DataFrame,
    leaf_cent: DataFrame,
    spread: int | None = None,
) -> DataFrame:
    """(vec_id, bucket, leaf, v): leaf assignment WITHIN each root
    bucket — a cogroup on the root bucket id, so a vector only ever
    meets its own root's ≤ _MAX_K leaves and the leaf table as a whole
    is never broadcast or crossed. Scoring is the fold-order kernel
    (bit-stable, row-blocked against hot roots). When ``leaf_cent``
    comes from its (bucket)-bucketed standing table the leaf side is
    exchange-free; only ``root_assigned`` shuffles. ``spread`` is the
    BUILD-path skew fix (see _spread_by_bucket) — never set it on the
    delta/serve path, where it would re-shuffle the standing leaf
    side to match the spread partitioning."""
    from mr_py_spark.operators.similarity import _fold_order_blocks

    def assign(key, vpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(vpdf):
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                    "leaf": pd.Series([], dtype="int64"),
                    "v": pd.Series([], dtype="object"),
                }
            )
        if not len(cpdf):
            # no leaves for this root (can't happen from a standing
            # build, where every occupied root trains ≥ 1 leaf) —
            # degrade to leaf 0 rather than dropping vectors
            return pd.DataFrame(
                {
                    "vec_id": vpdf["vec_id"].to_numpy(),
                    "bucket": vpdf["bucket"].to_numpy(),
                    "leaf": np.zeros(len(vpdf), dtype=np.int64),
                    "v": vpdf["v"],
                }
            )
        cpdf = cpdf.sort_values("leaf")
        A = np.asarray(list(vpdf["v"]), dtype=np.float64)
        C = np.asarray(list(cpdf["lv"]), dtype=np.float64)
        leaf_ids = cpdf["leaf"].to_numpy()
        out = np.empty(len(A), dtype=np.int64)
        for s, sims in _fold_order_blocks(A, C):
            out[s : s + sims.shape[0]] = leaf_ids[sims.argmax(1)]
        return pd.DataFrame(
            {
                "vec_id": vpdf["vec_id"].to_numpy(),
                "bucket": vpdf["bucket"].to_numpy(),
                "leaf": out,
                "v": vpdf["v"],
            }
        )

    return (
        _spread_by_bucket(root_assigned, spread).groupBy("bucket")
        .cogroup(leaf_cent.groupBy("bucket"))
        .applyInPandas(assign, "vec_id long, bucket long, leaf long, v array<double>")
    )


def hier_corpus_index(spark: SparkSession, sf_dir: str):
    """The STANDING two-level index of the fixture's corpus split (the
    same deterministic snapshot split as ivf_corpus_index, so the flat
    and hierarchical tiers describe the same corpus): root centroids,
    per-root leaf centroids (bucketed by root bucket), and the corpus
    inverted file bucketed by the composite CELL key (bucket, leaf) —
    candidate equi-joins on the cell stay exchange-free on the corpus
    side. All three ride the content-stamped cache with a builder
    stamp over every function and knob the persisted bytes depend on
    (ADVICE r12: including the shared assignment kernel).

    Cold-build cost note (r13 review, REVERSED by the r15 profile):
    the r13 guess was that the leaf TRAINING groupBy and ASSIGNMENT
    cogroup dominate, so the duplicated root broadcast-argmax pass
    (leaf builder + inverted-file builder each re-derive it) was kept.
    The r15 per-stage profile at 8M measured the opposite — the
    O(n·nroot·d) root-assignment matmul is ~85% of build CPU (5.7k s
    task time per pass vs ~0.7k s for ALL leaf k-means training) and
    the composition paid it twice. The intermediate is therefore now
    persisted (MEMORY_AND_DISK — ~n·(d+3)·8 bytes, spills rather than
    recomputes; lazy, so the cached-table re-attach path never
    materializes it). Returns (root_cent, leaf_cent, assigned)."""
    from mr_py_spark.operators.bucketed import _bucketed_table, builder_stamp
    from mr_py_spark.operators.dedup import (
        _INC_BUCKETS,
        _INC_DELTA_BUCKET,
        _INC_MULT,
    )
    from mr_py_spark.operators.similarity import (
        _IVF_TRAIN_CAP,
        _emb_double,
        _fold_order_blocks,
        _ivf_assign_pass,
        _ivf_centroids,
        ivf_assign_with,
    )

    e = _emb_double(tbl(spark, sf_dir, "embeddings"), "v")
    corpus = e.filter(
        (F.col("vec_id") * F.lit(_INC_MULT)) % F.lit(_INC_BUCKETS)
        != _INC_DELTA_BUCKET
    )
    n = _table_rows(e, sf_dir, "embeddings")
    nroot = min(_hier_nroot(n), max(1, n))
    # stamp every function the persisted bytes depend on, including the
    # scoring kernel hier_assign delegates to (the ADVICE r12 class: a
    # 1-line wrapper in the stamp list hides edits to the body it wraps)
    stamp = builder_stamp(
        _ivf_centroids, ivf_assign_with, _ivf_assign_pass,
        _np_spherical_kmeans, hier_leaf_centroids, hier_assign,
        _fold_order_blocks,
        nroot=nroot, root_rows=_ROOT_ROWS, leaf_rows=_LEAF_ROWS,
        inc=(_INC_MULT, _INC_BUCKETS, _INC_DELTA_BUCKET),
        train_cap=_IVF_TRAIN_CAP,
    )

    def build_root() -> DataFrame:
        cents = _ivf_centroids(spark, corpus, nroot)
        return spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cid long, cv array<double>"
        )

    root_cent = _bucketed_table(
        spark, sf_dir, "hier_root_cent", "cid", frame_of=build_root,
        src_name="embeddings", schema="cid long, cv array<double>",
        stamp_extra=stamp,
    )
    # the O(n·nroot·d) matmul, computed at most ONCE per cold build
    # (r15 profile: ~85% of build CPU; both builders consume it).
    # Lazy: the re-attach path never materializes it.
    from pyspark import StorageLevel

    root_assigned = ivf_assign_with(root_cent, corpus).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        leaf_cent = _bucketed_table(
            spark, sf_dir, "hier_leaf_cent", "bucket",
            frame_of=lambda: hier_leaf_centroids(root_assigned, spread=nroot),
            src_name="embeddings",
            schema="bucket long, leaf long, lv array<double>",
            stamp_extra=stamp,
        )
        assigned = _bucketed_table(
            spark, sf_dir, "hier_corpus_assign", ("bucket", "leaf"),
            frame_of=lambda: hier_assign(root_assigned, leaf_cent, spread=nroot),
            src_name="embeddings",
            schema="vec_id long, bucket long, leaf long, v array<double>",
            stamp_extra=stamp,
        )
    finally:
        root_assigned.unpersist()
    return root_cent, leaf_cent, assigned


def semantic_delta_status_hier(
    root_cent: DataFrame,
    leaf_cent: DataFrame,
    corpus_assigned: DataFrame,
    delta: DataFrame,
    tau: float | None = None,
) -> DataFrame:
    """``similarity.semantic_delta_status`` with the candidate
    restriction tightened from the flat coarse bucket to the two-level
    CELL (bucket, leaf): one row per delta vector with status
    'dup_of_corpus' (min matching corpus cell-mate at cosine ≥ tau) /
    'dup_within_delta' (min matching LOWER-id delta cell-mate) / 'new'.
    The delta is assigned against EXISTING centroids only — root by
    broadcast argmax (zero shuffle), leaf by the root-bucket cogroup —
    never a retrain; candidate verify is the fold-order kernel per
    cell, with the corpus side arriving pre-bucketed on (bucket, leaf)
    from the standing table (exchange-free). Per-delta-vector pair work
    is the CELL occupancy (~64 at any corpus size), where the flat
    form's is the bucket occupancy (linear in n past the 4096-centroid
    cap) — the whole point of the hierarchy."""
    from mr_py_spark.operators.kmeans import _TAU
    from mr_py_spark.operators.similarity import (
        _fold_order_blocks,
        ivf_assign_with,
    )

    tau = float(_TAU if tau is None else tau)
    d_asg = hier_assign(ivf_assign_with(root_cent, delta), leaf_cent)

    def corpus_matches(key, dpdf, opdf):
        if not len(dpdf) or not len(opdf):
            return pd.DataFrame({"vec_id": [], "corpus_match": []}).astype(
                {"vec_id": "int64", "corpus_match": "int64"}
            )
        A = np.asarray(list(dpdf["v"]), dtype=np.float64)
        B = np.asarray(list(opdf["v"]), dtype=np.float64)
        did = dpdf["vec_id"].to_numpy()
        oid = opdf["vec_id"].to_numpy()
        out = []
        for s, sims in _fold_order_blocks(A, B):
            hit = sims >= tau
            for i in np.nonzero(hit.any(axis=1))[0]:
                out.append((did[s + i], oid[hit[i]].min()))
        return pd.DataFrame(out, columns=["vec_id", "corpus_match"])

    def delta_matches(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame({"vec_id": [], "delta_match": []}).astype(
                {"vec_id": "int64", "delta_match": "int64"}
            )
        A = np.asarray(list(pdf["v"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        out = []
        for s, sims in _fold_order_blocks(A, A):
            hit = sims >= tau
            hit &= ids[None, :] < ids[s : s + hit.shape[0], None]
            for i in np.nonzero(hit.any(axis=1))[0]:
                out.append((ids[s + i], ids[hit[i]].min()))
        return pd.DataFrame(out, columns=["vec_id", "delta_match"])

    cell = ["bucket", "leaf"]
    vs_corpus = (
        d_asg.groupBy(*cell)
        .cogroup(corpus_assigned.groupBy(*cell))
        .applyInPandas(corpus_matches, "vec_id long, corpus_match long")
    )
    vs_delta = d_asg.groupBy(*cell).applyInPandas(
        delta_matches, "vec_id long, delta_match long"
    )
    return (
        delta.select("vec_id")
        .join(vs_corpus, "vec_id", "left")
        .join(vs_delta, "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("corpus_match").isNotNull(), F.lit("dup_of_corpus"))
            .when(F.col("delta_match").isNotNull(), F.lit("dup_within_delta"))
            .otherwise(F.lit("new"))
            .alias("status"),
            F.coalesce("corpus_match", "delta_match").alias("match_id"),
        )
    )


@register(
    "incremental_semantic_dedup_hier", tags=("C2", "C3", "B22"), oracle=None
)
def incremental_semantic_dedup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``semantic_delta_status_hier`` bound to the fixture's
    deterministic snapshot split — the O(delta) semantic-dedup form
    whose per-vector pair work stays ~_LEAF_ROWS at ANY corpus size
    (the flat ``incremental_semantic_dedup``'s grows linearly past the
    4096-centroid broadcast cap, SCALE.md r12 — this operator is that
    ledger entry's named fix). Rows-only (seeded quantizers are
    engine-specific); planted cross-batch / within-batch / novel
    statuses, the single-leaf degeneration pin against the flat
    kernel, occupancy flatness, and determinism are property-tested
    (tests/test_properties.py); the standing-index scan and
    cartesian-freedom are plan-asserted (tests/test_plans.py)."""
    from mr_py_spark.operators.dedup import (
        _INC_BUCKETS,
        _INC_DELTA_BUCKET,
        _INC_MULT,
    )
    from mr_py_spark.operators.similarity import _emb_double

    e = _emb_double(tbl(spark, sf_dir, "embeddings"), "v")
    delta = e.filter(
        (F.col("vec_id") * F.lit(_INC_MULT)) % F.lit(_INC_BUCKETS)
        == _INC_DELTA_BUCKET
    )
    root_cent, leaf_cent, assigned = hier_corpus_index(spark, sf_dir)
    return semantic_delta_status_hier(root_cent, leaf_cent, assigned, delta)


@register("hier_index_occupancy", tags=("C3", "B7"), oracle=None)
def hier_index_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy audit of the two standing semantic indexes — the
    driver-visible witness of the hierarchy's claim: the flat index's
    average bucket occupancy grows linearly with the corpus past the
    centroid cap, the hierarchical index's CELL occupancy stays at the
    ~_LEAF_ROWS design point. One row per (index, grain): vector count,
    cell count, mean and max occupancy. Rows-only (layout metrics of
    engine-internal indexes); the flatness-under-growth property is
    tested on synthetic corpora in tests/test_properties.py."""
    from mr_py_spark.operators.similarity import ivf_corpus_index

    _, _, h_assigned = hier_corpus_index(spark, sf_dir)
    _, f_assigned = ivf_corpus_index(spark, sf_dir)

    def occ(assigned: DataFrame, keys: list[str], name: str) -> DataFrame:
        per = assigned.groupBy(*keys).agg(F.count(F.lit(1)).alias("occ"))
        return per.agg(
            F.lit(name).alias("index"),
            F.sum("occ").cast("long").alias("n_vecs"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.avg("occ").alias("mean_occ"),
            F.max("occ").cast("long").alias("max_occ"),
        )

    return occ(f_assigned, ["bucket"], "flat_bucket").unionByName(
        occ(h_assigned, ["bucket", "leaf"], "hier_cell")
    )


def hier_quantize(
    spark: SparkSession,
    vectors: DataFrame,
    n: int,
    root_rows: int = _ROOT_ROWS,
    leaf_rows: int = _LEAF_ROWS,
):
    """Train a two-level quantizer over ``vectors`` (vec_id, v) and
    assign every vector to its cell, all in one lineage — the PER-RUN
    form behind ``semantic_dedup_hier`` (the standing-index form is
    ``hier_corpus_index``). Returns (root_cent, leaf_cent, assigned)."""
    from mr_py_spark.operators.similarity import _ivf_centroids, ivf_assign_with

    nroot = min(_hier_nroot(n, root_rows), max(1, n))
    root_cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(_ivf_centroids(spark, vectors, nroot))],
        "cid long, cv array<double>",
    )
    root_assigned = ivf_assign_with(root_cent, vectors)
    leaf_cent = hier_leaf_centroids(
        root_assigned, leaf_rows=leaf_rows, spread=nroot
    )
    return root_cent, leaf_cent, hier_assign(
        root_assigned, leaf_cent, spread=nroot
    )


def hier_survivors(assigned: DataFrame, tau: float) -> DataFrame:
    """SemDeDup's star rule restricted to two-level CELLS: drop a
    vector iff some LOWER-vec_id cell-mate has cosine >= tau — the
    kmeans.semantic_dedup survivor kernel with the cluster key widened
    to (bucket, leaf). Verification is the row-blocked fold-order
    kernel, so a skewed hot cell never allocates an unbounded sim
    matrix and every compare replays Catalyst's float64 op sequence."""
    from mr_py_spark.operators.similarity import _fold_order_blocks

    def survivors(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pdf[["vec_id", "bucket", "leaf"]]
        A = np.asarray(list(pdf["v"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        keep = np.ones(len(pdf), dtype=bool)
        for s, sims in _fold_order_blocks(A, A):
            hit = sims >= tau
            hit &= ids[None, :] < ids[s : s + hit.shape[0], None]
            keep[s : s + hit.shape[0]] = ~hit.any(axis=1)
        return pdf.loc[keep, ["vec_id", "bucket", "leaf"]]

    return assigned.groupBy("bucket", "leaf").applyInPandas(
        survivors, "vec_id long, bucket long, leaf long"
    )


@register("semantic_dedup_hier", tags=("C2", "C3"), oracle=None)
def semantic_dedup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH semantic dedup through the two-level quantizer — the
    production form of ``semantic_dedup`` for corpora past the flat
    4096-centroid cap (kmeans.py's exact-integer Lloyd chain stays the
    oracle-pinned reference at driver scales; this is its scale
    continuation, the same relationship the LSH family has between its
    exact and banded forms). Per-vector pair work is the ~64-row CELL
    occupancy at ANY corpus size (SCALE.md r13: occupancy 64.4 at 8M
    vectors where the flat cap gives 1757.8). Rows-only (seeded
    quantizers are engine-specific); planted-dup recall,
    no-false-positive vs brute force, and determinism are
    property-tested (tests/test_properties.py)."""
    from mr_py_spark.operators.kmeans import _TAU
    from mr_py_spark.operators.similarity import _emb_double

    e = _emb_double(tbl(spark, sf_dir, "embeddings"), "v")
    n = _table_rows(e, sf_dir, "embeddings")
    _, _, assigned = hier_quantize(spark, e, n)
    return hier_survivors(assigned, float(_TAU))


#: Probe counts for the hier ANN serve path: per-query candidate work
#: is root_probe x leaf_probe x ~_LEAF_ROWS rows — CONSTANT in corpus
#: size (the flat IVF tier's probed-FRACTION rule is Θ(n/4) per query;
#: this is the sub-Θ(n) knob its docstring names for 10⁹ vectors).
#: Recall comes from multi-probe at BOTH levels: a neighbor straddling
#: a root boundary is reached through the next-nearest roots, one
#: straddling a leaf boundary through sibling leaves — measured on the
#: 30k two-scale clustered corpus in tests/test_properties.py. 12x12
#: from the 2M-vector sweep on the HONEST mutated fixture (SCALE.md
#: r13, post-mixer-fix): STRONG-neighbor recall (cosine >= 0.9, the
#: near-dup tier's actual target set) is 1.000 at every probe setting
#: — true near-dups co-assign; all-neighbor recall@5 rises smoothly
#: with probes (0.57 @ 12x12 / 9k cands, 0.68 @ 24x24, 0.77 @ 48x24 —
#: each still constant-in-n) because the fixture's residual top-5 are
#: cosine ~0.3-0.5 NOISE directions no bucketing co-locates; on
#: clustered corpora (the realistic shape) small probes already clear
#: 0.7. 12x12 is the default operating point; callers own the knob.
_ROOT_PROBE = 12
_LEAF_PROBE = 12


def hier_topk_with(
    root_cent: DataFrame,
    leaf_cent: DataFrame,
    assigned: DataFrame,
    queries: DataFrame,
    k: int = 5,
    root_probe: int = _ROOT_PROBE,
    leaf_probe: int = _LEAF_PROBE,
    emit_candidates: bool = False,
) -> DataFrame:
    """Approximate top-k over a standing two-level index: each query
    probes its ``root_probe`` nearest roots (broadcast argmax over the
    ≤ _MAX_K-row root frame — the exempt bounded nested loop), then its
    ``leaf_probe`` nearest leaves WITHIN each probed root (a cogroup on
    the root bucket, so the full leaf table is never broadcast and a
    query only ever scores its probed roots' leaves), and candidates
    are an equi-join on the composite CELL key against the
    (bucket, leaf)-bucketed inverted file — exchange-free on the corpus
    side, exactly like the dedup tier. Exact re-rank with the house
    Catalyst fold ``dot`` and the (desc sim, asc nn_id) tie-break all
    kNN forms share.

    Per-query candidate work is root_probe·leaf_probe·~_LEAF_ROWS rows
    at ANY corpus size — the constant-cost serve tier the flat IVF
    form's Θ(n/4) probed-fraction rule can't reach (its own docstring
    names this knob). Leaf probing uses the fold-order kernel, so probe
    sets are bit-deterministic; with probes ≥ the level widths the
    result degenerates to the exact brute-force top-k (property-pinned
    in tests/test_properties.py)."""
    from mr_py_spark.functions import dot

    cells = _hier_probe_cells(
        root_cent, leaf_cent, queries, root_probe, leaf_probe
    )
    # Prune the corpus side of the candidate join to the probed roots
    # (r16): the bounded `isin` (≤ n_q·root_probe values — probe
    # metadata, the documented bounded-collect class) pushes to the
    # parquet scan, where the bucket-key-sorted small-row-group layout
    # (sinks.write_bucketed) + the raised In-pushdown threshold
    # (session.harden) skip the unprobed buckets' row groups. A filter
    # preserves the scan's output partitioning, so the cell-key join
    # stays exchange-free on the corpus side. Before this prune the
    # candidate scan decoded ALL n rows at ANY probe selectivity
    # (SCALE.md r16: 2.03M records at 39/488 probed roots). At full
    # probes the filter selects everything — the exact-degeneration
    # property is unchanged.
    probed = sorted(
        r.bucket for r in cells.select("bucket").distinct().collect()
    )
    cand = cells.join(
        assigned.filter(F.col("bucket").isin(probed)), ["bucket", "leaf"]
    ).filter(F.col("q_id") != F.col("vec_id"))
    if emit_candidates:  # audit hook: the per-query candidate frame
        return cand.select("q_id", "vec_id", "bucket", "leaf")
    wk = W.partitionBy("q_id").orderBy(F.desc("sim_raw"), F.asc("nn_id"))
    scored = cand.select(
        "q_id", F.col("vec_id").alias("nn_id"), dot("qv", "v").alias("sim_raw")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("q_id", "nn_id", F.round("sim_raw", 6).alias("sim"), "rn")
    )


def _hier_probe_cells(
    root_cent: DataFrame,
    leaf_cent: DataFrame,
    queries: DataFrame,
    root_probe: int,
    leaf_probe: int,
) -> DataFrame:
    """The two-level probe stage shared by the exact and PQ serve
    tiers: per query, the ``root_probe`` nearest roots (broadcast
    argmax over the bounded root frame — the exempt nested loop), then
    the ``leaf_probe`` nearest leaves WITHIN each probed root via a
    cogroup on the root bucket (the leaf table is never broadcast;
    only the query side exchanges). Returns (q_id, bucket, leaf, qv)
    — one row per probed CELL."""
    from mr_py_spark.functions import dot
    from mr_py_spark.operators.similarity import _fold_order_blocks

    wq = W.partitionBy("q_id").orderBy(F.desc("csim"), F.asc("cid"))
    root_probes = (
        queries.join(F.broadcast(root_cent), how="cross")
        .select("q_id", "qv", "cid", dot("qv", "cv").alias("csim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= root_probe)
        .select("q_id", "qv", F.col("cid").alias("bucket"))
    )

    lp = int(leaf_probe)

    def probe_leaves(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        # an unoccupied root trains no leaves and indexes no vectors —
        # probing it legitimately yields no candidates
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame(
                {
                    "q_id": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                    "leaf": pd.Series([], dtype="int64"),
                    "qv": pd.Series([], dtype="object"),
                }
            )
        cpdf = cpdf.sort_values("leaf")
        A = np.asarray(list(qpdf["qv"]), dtype=np.float64)
        C = np.asarray(list(cpdf["lv"]), dtype=np.float64)
        leaf_ids = cpdf["leaf"].to_numpy()
        qids = qpdf["q_id"].to_numpy()
        qv_col = qpdf["qv"].reset_index(drop=True)
        b = int(key[0])
        out_q: list[int] = []
        out_leaf: list[int] = []
        out_qv: list = []
        for s, sims in _fold_order_blocks(A, C):
            for i in range(sims.shape[0]):
                # deterministic ties: (-sim, leaf) via stable lexsort
                order = np.lexsort((leaf_ids, -sims[i]))[:lp]
                for j in order:
                    out_q.append(int(qids[s + i]))
                    out_leaf.append(int(leaf_ids[j]))
                    out_qv.append(qv_col[s + i])
        return pd.DataFrame(
            {
                "q_id": np.asarray(out_q, dtype=np.int64),
                "bucket": np.full(len(out_q), b, dtype=np.int64),
                "leaf": np.asarray(out_leaf, dtype=np.int64),
                "qv": out_qv,
            }
        )

    return (
        root_probes.groupBy("bucket")
        .cogroup(leaf_cent.groupBy("bucket"))
        .applyInPandas(
            probe_leaves, "q_id long, bucket long, leaf long, qv array<double>"
        )
    )


#: Design ceiling of the TWO-level construction: ~4096 roots × ~4096
#: leaves/root × ~64 vectors/leaf ≈ 1.1e9 vectors. Past it, per-root
#: leaf-training groups exceed ~262k rows and cell occupancy drifts off
#: the ~_LEAF_ROWS grain — the continuation is a THIRD level (same
#: construction; the leaf trainer is already group-local), decided
#: AGAINST for now (VERDICT r14 item 8: no ≥100M-vector fixture is on
#: the measurement path), so the ceiling is pinned with a loud
#: ValueError (ADVICE r15: a bare assert is stripped under python -O)
#: instead of a silent drift.
_HIER_TWO_LEVEL_CEIL = 4096 * 4096 * 64


def _hier_index_stamp(n: int) -> str:
    """The builder stamp shared by ALL standing tables derived from the
    hier index build — the three index tables AND the PQ code table
    (ADVICE r14: hier_pq_codes' stamp omitted the assignment builder,
    so an edit to hier_assign rebuilt the index under its own stamp
    while the codes table re-attached STALE — ADC would score codes
    whose (bucket, leaf) cells no longer match the index). One source
    of truth so the two can never drift apart again."""
    from mr_py_spark.operators.bucketed import builder_stamp
    from mr_py_spark.operators.similarity import (
        _IVF_TRAIN_CAP,
        _fold_order_blocks,
        _ivf_assign_pass,
        _ivf_centroids,
        ivf_assign_with,
    )

    nroot = min(_hier_nroot(n), max(1, n))
    return builder_stamp(
        _ivf_centroids, ivf_assign_with, _ivf_assign_pass,
        _np_spherical_kmeans, hier_leaf_centroids, hier_assign,
        _fold_order_blocks,
        nroot=nroot, root_rows=_ROOT_ROWS, leaf_rows=_LEAF_ROWS,
        train_cap=_IVF_TRAIN_CAP,
    )


def hier_index(spark: SparkSession, sf_dir: str):
    """The FULL-TABLE standing two-level index — the ANN serve twin of
    similarity.ivf_index (hier_corpus_index covers only the fixture's
    corpus split, the dedup convention): root centroids, per-root leaf
    centroids bucketed by root bucket, and the inverted file bucketed
    by the composite cell key (bucket, leaf), all through the
    content-stamped cache with the full builder stamp (every function
    and knob the persisted bytes depend on, ADVICE r12). Returns
    (root_cent, leaf_cent, assigned)."""
    from mr_py_spark.operators.bucketed import _bucketed_table
    from mr_py_spark.operators.similarity import (
        _emb_double,
        _ivf_centroids,
        ivf_assign_with,
    )

    e = _emb_double(tbl(spark, sf_dir, "embeddings"), "v")
    n = _table_rows(e, sf_dir, "embeddings")
    if n > _HIER_TWO_LEVEL_CEIL:  # not `assert` — python -O strips those
        raise ValueError(
            f"hier_index: {n} vectors exceeds the two-level design "
            f"ceiling ({_HIER_TWO_LEVEL_CEIL} ≈ 4096·4096·64) — add the "
            "third quantizer level (hier.py module docstring) before "
            "indexing corpora this size"
        )
    nroot = min(_hier_nroot(n), max(1, n))
    stamp = _hier_index_stamp(n)

    def build_root() -> DataFrame:
        cents = _ivf_centroids(spark, e, nroot)
        return spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cid long, cv array<double>"
        )

    root_cent = _bucketed_table(
        spark, sf_dir, "hier_root_full", "cid", frame_of=build_root,
        src_name="embeddings", schema="cid long, cv array<double>",
        stamp_extra=stamp,
    )
    # the O(n·nroot·d) root-assignment matmul, computed at most ONCE
    # per cold build (r15 profile at 8M: ~85% of build CPU, previously
    # paid by BOTH builders); MEMORY_AND_DISK so a big corpus spills
    # rather than recomputes, lazy so re-attach never materializes it.
    from pyspark import StorageLevel

    root_assigned = ivf_assign_with(root_cent, e).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        leaf_cent = _bucketed_table(
            spark, sf_dir, "hier_leaf_full", "bucket",
            frame_of=lambda: hier_leaf_centroids(root_assigned, spread=nroot),
            src_name="embeddings",
            schema="bucket long, leaf long, lv array<double>",
            stamp_extra=stamp,
        )
        assigned = _bucketed_table(
            spark, sf_dir, "hier_assign_full", ("bucket", "leaf"),
            frame_of=lambda: hier_assign(root_assigned, leaf_cent, spread=nroot),
            src_name="embeddings",
            schema="vec_id long, bucket long, leaf long, v array<double>",
            stamp_extra=stamp,
        )
    finally:
        root_assigned.unpersist()
    return root_cent, leaf_cent, assigned


#: Serve-tier PQ geometry (the knn_ivfpq_topk sizing: 16 subspaces ×
#: 256 centroids = 16 one-byte codes per vector — coarse codes
#: collapse within-cell neighbors, see vectors._pq_train's measured
#: cliff) and the ADC tier's default operating point: the wider-probe
#: knob the r13 verdict asked for (all-neighbor recall had no
#: mitigation beyond probes, and probes paid LINEARLY in full-vector
#: candidates — 16-byte codes make 4× the cells cost ~1/8 the
#: candidate bytes of the exact 12×12 tier).
_PQ_M, _PQ_K = 16, 256
_PQ_ROOT_PROBE = 24
_PQ_LEAF_PROBE = 24


def _pq_books_stamp() -> str:
    """The builder stamp of the PERSISTED PQ codebooks — everything the
    trained book bytes depend on. Shared by _hier_pq_books (its own
    table's stamp) and hier_pq_codes (ADVICE r14: the codes are a pure
    function of the BOOKS as well as the assignment, but the codes
    table's stamp covered only the encode pass — a _pq_train or
    _PQ_TRAIN change rebuilt the books under their own stamp while the
    codes re-attached stale, so ADC would score stale codes against
    new books: silent recall collapse in the pre-rank)."""
    from mr_py_spark.operators.bucketed import builder_stamp
    from mr_py_spark.operators.similarity import _ordered_train_sample
    from mr_py_spark.operators.vectors import _PQ_TRAIN, _pq_train

    return builder_stamp(
        _pq_train, _ordered_train_sample, m=_PQ_M, k=_PQ_K, train=_PQ_TRAIN
    )


def _hier_pq_books(spark: SparkSession, sf_dir: str):
    """Standing PQ codebooks for the hier serve tier: trained once on
    the deterministic ordered bounded sample (the _PQ_TRAIN exemption
    class), persisted as a tiny content-stamped table (m·k = 4096 rows
    of sub-vectors — bounded metadata, collected whole at serve time).
    Returns the (M, K, sub) ndarray."""
    import numpy as np

    from mr_py_spark.operators.bucketed import _bucketed_table
    from mr_py_spark.operators.similarity import (
        _emb_double,
        _ordered_train_sample,
    )
    from mr_py_spark.operators.vectors import _PQ_TRAIN, _pq_train

    def build() -> DataFrame:
        e = _emb_double(tbl(spark, sf_dir, "embeddings"), "v")
        X = _ordered_train_sample(e, _PQ_TRAIN)
        books = _pq_train(
            X, m=_PQ_M, k=min(_PQ_K, len(X)), sub=X.shape[1] // _PQ_M
        )
        rows = [
            (mi, ki, [float(x) for x in books[mi, ki]])
            for mi in range(books.shape[0])
            for ki in range(books.shape[1])
        ]
        return spark.createDataFrame(rows, "mi long, ki long, sub array<double>")

    tbl_books = _bucketed_table(
        spark, sf_dir, "hier_pq_books", "mi", frame_of=build,
        src_name="embeddings", schema="mi long, ki long, sub array<double>",
        stamp_extra=_pq_books_stamp(),
    )
    rows = tbl_books.collect()
    m = max(r.mi for r in rows) + 1
    k = max(r.ki for r in rows) + 1
    sub = len(rows[0].sub)
    books = np.empty((m, k, sub))
    for r in rows:
        books[r.mi, r.ki] = r.sub
    return books


def hier_pq_codes(
    spark: SparkSession, sf_dir: str, assigned: DataFrame, books
) -> DataFrame:
    """Standing PQ-code inverted file for the hier serve tier: one
    zero-shuffle encode pass over the assigned table, persisted
    bucketed by the SAME composite cell key — so the ADC candidate
    join is exchange-free on the corpus side exactly like the exact
    tier's, but each candidate row carries 16 one-byte codes instead
    of the 512-byte double vector (~20× less through the join and the
    Python workers).

    The persisted codes are a pure function of (assignment, books,
    encode pass), so the stamp folds in ALL THREE builders (ADVICE
    r14: the encode-only stamp let a books or assignment rebuild serve
    STALE codes — the r12 stale-stamp knob class)."""
    from mr_py_spark.operators.bucketed import _bucketed_table, builder_stamp

    n = _table_rows(tbl(spark, sf_dir, "embeddings"), sf_dir, "embeddings")
    return _bucketed_table(
        spark, sf_dir, "hier_pq_codes", ("bucket", "leaf"),
        frame_of=lambda: _pq_encode_frame(assigned, books),
        src_name="embeddings",
        schema="vec_id long, bucket long, leaf long, code array<int>",
        stamp_extra=builder_stamp(
            hier_pq_codes, _pq_encode_frame, m=_PQ_M, k=_PQ_K
        )
        + _pq_books_stamp()
        + _hier_index_stamp(n),
    )


def _pq_encode_frame(assigned: DataFrame, books) -> DataFrame:
    """One zero-shuffle encode pass: (vec_id, bucket, leaf, v) →
    (vec_id, bucket, leaf, code) under the broadcast codebooks. The
    argmax is the matmul form (sub @ bookᵀ − ||book||²/2) — the
    difference-tensor form was memory-bandwidth-bound at sf100
    (the knn_ivfpq encode lesson)."""
    from mr_py_spark.util import bc as _bc

    b_books = _bc(
        assigned.sparkSession, np.asarray(books, dtype=np.float64)
    )

    def encode(batches):
        bks = b_books.value  # (M, K, sub)
        m, _, sub = bks.shape
        half = 0.5 * (bks**2).sum(-1)  # (M, K)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf["v"]), dtype=np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for mi in range(m):
                s = X[:, mi * sub : (mi + 1) * sub]
                codes[:, mi] = (s @ bks[mi].T - half[mi]).argmax(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "bucket": pdf["bucket"],
                    "leaf": pdf["leaf"],
                    "code": list(codes),
                }
            )

    return assigned.mapInPandas(
        encode, "vec_id long, bucket long, leaf long, code array<int>"
    )


def hier_topk_pq_with(
    root_cent: DataFrame,
    leaf_cent: DataFrame,
    codes: DataFrame,
    assigned: DataFrame,
    queries: DataFrame,
    books,
    k: int = 5,
    root_probe: int = _PQ_ROOT_PROBE,
    leaf_probe: int = _PQ_LEAF_PROBE,
    rerank: int = 20,
) -> DataFrame:
    """ADC-pre-ranked top-k over the standing two-level index — the
    all-neighbor recall lift (VERDICT r13 item 6; chosen over
    multi-assignment because the measured failure mode is NOISE-
    direction neighbors no bucketing co-locates, so the fix is
    affording WIDER probes, not spilling boundary vectors): probe
    root_probe×leaf_probe cells (double the exact tier's default),
    rank the candidates with 16-byte PQ codes through the broadcast
    per-query ADC lookup tables (the knn_ivfpq machinery — the
    candidate stream carries (q_id, vec_id, code), never a vector),
    then exact-re-rank only the ADC top rerank·k per query.

    Scale shape: candidate join exchange-free on the (bucket, leaf)-
    bucketed code table, PRUNED to the probed roots by a bounded
    `isin` pushed to the parquet scan (the exact tier's re-rank
    pattern — without it every serve batch read the full codes table);
    ADC is one zero-shuffle mapInArrow; the exact
    re-rank joins the BROADCAST shortlist (rerank·k·n_q rows) against
    the assigned table PRUNED to the probed buckets — an `isin` over
    the bounded probed-root set that parquet row-group stats on the
    sorted bucket column turn into O(probed) I/O, so no stage reads
    the corpus. Query LUTs are driver-built from the bounded query
    set (the knn_ivfpq bounded-collect class). With probes covering
    every cell and ``rerank·k`` ≥ the candidate count this degenerates
    to the exact tier bit-for-bit (property-pinned).

    r17 DECISION (VERDICT r16 item 5): the ~1.5× ADC task-time premium
    vs the exact tier at matched probes is decode volume by DESIGN
    (this tier exists to afford wider probes) plus a memory-bound LUT
    gather that is already one vectorized fancy-index per Arrow batch
    (LUTs L2-resident at bounded query counts) — no row-at-a-time or
    conversion overhead remains to batch wider. Exact stays the
    default serve tier on a single node (r14): PQ's win is candidate
    BYTES through a real multi-executor shuffle, which local mode
    never pays."""
    from mr_py_spark.functions import dot
    from mr_py_spark.util import bc as _bc

    books = np.asarray(books, dtype=np.float64)
    m, _, sub = books.shape

    cells = _hier_probe_cells(
        root_cent, leaf_cent, queries, root_probe, leaf_probe
    )
    # Probed-root set collected ONCE (≤ n_q·root_probe values — probe
    # metadata, bounded by contract) and used to prune BOTH candidate-
    # side scans: without the isin the candidate join read the FULL
    # codes table per serve batch (r15 stage metrics: 126.9 MB vs the
    # exact tier's 19.1 MB isin-pruned scan at 2M — VERDICT r15 item 1;
    # at 1e9 vectors that unpruned read is ~16 GB+ per batch). The
    # filter sits ON the bucketed scan, so it pushes to parquet
    # (row-group skipping on the bucket-sorted files) and preserves the
    # table's (bucket, leaf) output partitioning — the join stays
    # exchange-free on the codes side (both plan-asserted,
    # tests/test_plans.py).
    probed = sorted(
        r.bucket
        for r in cells.select("bucket").distinct().collect()
    )
    cand = (
        cells.select("q_id", "bucket", "leaf")
        .join(
            codes.filter(F.col("bucket").isin(probed)),
            ["bucket", "leaf"],
        )
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", "code")
    )

    # per-query ADC LUTs, driver-side (bounded query set by contract)
    q_rows = queries.select("q_id", "qv").collect()
    qids = np.asarray([r["q_id"] for r in q_rows], dtype=np.int64)
    order = np.argsort(qids)
    qids = qids[order]
    Q = np.asarray(
        [q_rows[i]["qv"] for i in order], dtype=np.float64
    ).reshape(len(qids), m, sub)
    b_lut = _bc(
        queries.sparkSession, (qids, np.einsum("qms,mks->qmk", Q, books))
    )

    def adc(batches):
        import pyarrow as pa

        lut_qids, luts = b_lut.value
        marange = np.arange(m)[None, :]
        for rb in batches:
            if not len(rb):
                continue
            q_id = np.asarray(rb.column(0))
            qidx = np.searchsorted(lut_qids, q_id)
            cds = np.asarray(rb.column(2).flatten()).reshape(len(rb), m)
            sim = luts[qidx[:, None], marange, cds].sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), rb.column(1), pa.array(sim, type=pa.float64())],
                ["q_id", "nn_id", "adc_sim"],
            )

    scored = cand.mapInArrow(adc, "q_id long, nn_id long, adc_sim double")
    wk = W.partitionBy("q_id").orderBy(F.desc("adc_sim"), F.asc("nn_id"))
    short = (
        scored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= rerank * k)
        .select("q_id", "nn_id")
    )

    # exact re-rank: broadcast the shortlist+query vectors, prune the
    # assigned scan to the same probed roots, map-side join on vec_id —
    # no corpus shuffle, no corpus-wide read
    corpus = assigned.filter(F.col("bucket").isin(probed)).select(
        F.col("vec_id").alias("nn_id"), F.col("v").alias("cv")
    )
    wr = W.partitionBy("q_id").orderBy(F.desc("sim_raw"), F.asc("nn_id"))
    return (
        F.broadcast(short.join(queries.select("q_id", "qv"), "q_id"))
        .join(corpus, "nn_id")
        .select("q_id", "nn_id", dot("qv", "cv").alias("sim_raw"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= k)
        .select("q_id", "nn_id", F.round("sim_raw", 6).alias("sim"), "rn")
    )



@register("knn_hier_pq_topk_indexed", tags=("C3", "B22"), oracle=None)
def knn_hier_pq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``knn_hier_topk_indexed``'s recall-lifted sibling: the same
    standing two-level index plus a standing 16-byte PQ code table —
    2× the probes of the exact tier at a fraction of its candidate
    bytes, exact re-rank of the ADC top-100. Rows-only (seeded
    quantizers + float ADC are engine-specific); the full-probe/full-
    rerank degeneration to the exact tier and the recall dominance
    over the exact tier at matched probes are property-tested
    (tests/test_properties.py); SCALE.md r14 records the 2M-fixture
    recall-vs-candidates curve against r13's probe sweep."""
    from mr_py_spark.operators.similarity import _emb_double

    e = _emb_double(tbl(spark, sf_dir, "embeddings"), "v")
    queries = (
        e.filter(F.col("vec_id") < 50)
        .withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("v", "qv")
    )
    root_cent, leaf_cent, assigned = hier_index(spark, sf_dir)
    books = _hier_pq_books(spark, sf_dir)
    codes = hier_pq_codes(spark, sf_dir, assigned, books)
    return hier_topk_pq_with(
        root_cent, leaf_cent, codes, assigned, queries, books
    )


@register("knn_hier_topk_indexed", tags=("C3", "B22"), oracle=None)
def knn_hier_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 over the standing two-level index — the
    CONSTANT-per-query-cost ANN serve tier (root_probe·leaf_probe·~64
    candidate rows per query at any corpus size; the flat
    ``knn_ivf_topk_indexed``'s probed-fraction rule is Θ(n/4)). Same
    query set and emit shape as every other kNN form. Rows-only
    (seeded quantizers are engine-specific); the full-probe
    degeneration to exact brute force and the default-probe recall on
    a two-scale clustered corpus are property-tested
    (tests/test_properties.py); the standing-index scan, the absence
    of any query-time assignment pass, and cartesian-freedom are
    plan-asserted (tests/test_plans.py)."""
    from mr_py_spark.operators.similarity import _emb_double

    e = _emb_double(tbl(spark, sf_dir, "embeddings"), "v")
    queries = (
        e.filter(F.col("vec_id") < 50)
        .withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("v", "qv")
    )
    root_cent, leaf_cent, assigned = hier_index(spark, sf_dir)
    return hier_topk_with(root_cent, leaf_cent, assigned, queries)


def hier_retrain(
    spark: SparkSession,
    root_table: str,
    leaf_table: str,
    idx_table: str,
    exclude_ids: DataFrame | None = None,
    extra_train: DataFrame | None = None,
    root_rows: int = _ROOT_ROWS,
    leaf_rows: int = _LEAF_ROWS,
) -> dict:
    """Quantizer RETRAIN for a standing two-level index triple — the
    hier twin of ``similarity.ivf_retrain`` (never-retrain is the
    default maintenance policy; this is the drift-triggered exception;
    the gauge is ``ivf_drift_frame`` pointed at the ROOT table and the
    inverted file's (vec_id, bucket, v) columns — a hier index drifts
    at the root level first, because leaves partition within roots).
    Re-fits the roots on the index's current contents, re-trains every
    root's leaves in the one distributed pass, re-assigns every indexed
    vector to its new cell, and rewrites all THREE standing tables in
    place under their existing bucket specs via the crash-atomic
    two-phase swap (bucketed.replace_bucketed_table).

    Swap order is root → leaf → inverted file, each later stage
    TRAINING/ASSIGNING FROM THE PERSISTED GENERATION it just wrote
    (spark.table, not the builder lineage) — so the leaf trainer sees
    exactly the roots a crash would leave behind, and a crash between
    swaps leaves mixed generations that are still queryable and are
    converged by the next retrain (the same documented window as the
    flat form's two-table swap).

    Deterministic given the index contents: the root training sample
    is the tripping batch first, then the index's vectors BY vec_id
    (`similarity._retrain_sample` — ADVICE r13: sorting the union
    dropped the batch past the cap on any large index), leaf training
    sorts each group by vec_id and seeds on the bucket id — a replayed
    retrain rebuilds bit-identical tables. ``exclude_ids`` and
    ``extra_train`` carry the streaming replay discipline over
    unchanged (pre-batch index view for the decision AND the corpus;
    the tripping batch rides the training sample only). Returns
    {"nroot", "n_leaves", "n_vecs"}."""
    from mr_py_spark.operators.bucketed import replace_bucketed_table
    from mr_py_spark.operators.similarity import (
        _ivf_centroids,
        _retrain_sample,
        ivf_assign_with,
    )

    idx = spark.table(idx_table).select("vec_id", "v")
    if exclude_ids is not None:
        idx = idx.join(exclude_ids.select("vec_id"), "vec_id", "left_anti")
    sample = _retrain_sample(idx, extra_train)
    n_vecs = idx.count()
    nroot = min(_hier_nroot(n_vecs, root_rows), max(1, n_vecs), len(sample))
    cents = _ivf_centroids(spark, idx, nroot, sample=sample)
    replace_bucketed_table(
        spark, root_table,
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cid long, cv array<double>"
        ),
        "cid",
    )
    # persist the O(n·nroot·d) assignment across the two rewrites it
    # feeds (the r15 profile's duplicated-matmul finding, same as the
    # builders)
    from pyspark import StorageLevel

    root_assigned = ivf_assign_with(spark.table(root_table), idx).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        replace_bucketed_table(
            spark, leaf_table,
            hier_leaf_centroids(root_assigned, leaf_rows=leaf_rows, spread=nroot),
            "bucket",
        )
        replace_bucketed_table(
            spark, idx_table,
            hier_assign(root_assigned, spark.table(leaf_table), spread=nroot),
            ("bucket", "leaf"),
        )
        # pin the new generation's ROOT-level drift reference in the
        # same pass as the swap (r16, VERDICT r15 item 3 — see
        # similarity.pin_drift_ref; a hier index gauges at the root)
        from mr_py_spark.operators.similarity import pin_drift_ref

        pin_drift_ref(
            spark, spark.table(root_table), idx_table,
            spark.table(idx_table).select("vec_id", "bucket", "v"),
        )
    finally:
        root_assigned.unpersist()
    return {
        "nroot": int(nroot),
        "n_leaves": int(spark.table(leaf_table).count()),
        "n_vecs": int(n_vecs),
    }


def hier_index_append(
    root_cent: DataFrame,
    leaf_cent: DataFrame,
    new_vectors: DataFrame,
    table: str,
    idempotent: bool = False,
    minmax: tuple[int | None, int | None] | None = None,
) -> None:
    """O(delta) maintenance for a standing two-level inverted file:
    assign ``new_vectors`` (vec_id, v) against the EXISTING root and
    leaf centroids — never a retrain at either level — and append the
    (vec_id, bucket, leaf, v) entries under the same (bucket, leaf)
    bucket spec (Spark validates it; drift fails loudly). The same
    replay guard as ivf_index_append: ``idempotent=True`` drops
    vec_ids the table already holds before the append —
    watermark-gated (bucketed.replay_guard, r14), so the normal fresh
    batch costs zero index I/O; ``idempotent=False`` appends still
    RAISE the watermark (ADVICE r14 — see ivf_index_append).
    ``minmax`` (r17): precomputed (min, max) vec_id of the delta —
    see ivf_index_append; makes the fresh-batch guard path job-free."""
    from mr_py_spark.operators.bucketed import (
        _BUCKETS,
        raise_watermark,
        replay_guard,
    )
    from mr_py_spark.operators.similarity import ivf_assign_with
    from mr_py_spark.sources.sinks import write_bucketed

    if idempotent:
        new_vectors = (
            replay_guard(new_vectors.sparkSession, table, new_vectors, "vec_id")
            if minmax is None
            else replay_guard(
                new_vectors.sparkSession, table, new_vectors, "vec_id",
                minmax=minmax,
            )
        )
    elif minmax is None:
        raise_watermark(new_vectors.sparkSession, table, new_vectors, "vec_id")
    else:
        raise_watermark(
            new_vectors.sparkSession, table, new_vectors, "vec_id",
            max_id=minmax[1],
        )
    entries = hier_assign(ivf_assign_with(root_cent, new_vectors), leaf_cent)
    write_bucketed(entries, table, ("bucket", "leaf"), _BUCKETS, mode="append")


def hier_pq_codes_append(
    root_cent: DataFrame,
    leaf_cent: DataFrame,
    books,
    new_vectors: DataFrame,
    table: str,
    idempotent: bool = False,
    minmax: tuple[int | None, int | None] | None = None,
) -> None:
    """O(delta) maintenance for a standing PQ-CODE inverted file (r16,
    VERDICT r15 item 7 — the codes table had append-by-rebuild only,
    so a streaming hier index serving through ADC would re-encode the
    whole corpus per admitted batch): assign ``new_vectors`` (vec_id,
    v) against the EXISTING root and leaf centroids, encode under the
    EXISTING codebooks (one zero-shuffle mapInPandas pass over the
    delta — never a books retrain), and append the (vec_id, bucket,
    leaf, code) rows under the same (bucket, leaf) bucket spec (Spark
    validates it; spec drift fails loudly). Same replay discipline as
    ``hier_index_append``, against the CODES table's own sidecar:
    ``idempotent=True`` drops vec_ids the table already holds via the
    watermark-gated ``bucketed.replay_guard`` (fresh monotone batches
    cost zero index I/O); ``idempotent=False`` appends still RAISE the
    watermark (ADVICE r14 — mixed-mode callers must not leave it
    stale-LOW).

    GENERATION CONTRACT: codes are a pure function of (root/leaf
    assignment, books). A ``hier_retrain`` or books rebuild
    invalidates EVERY stored code — the caller rebuilds the codes
    table from the new generation (one zero-shuffle encode pass, the
    same cost this append path avoids per batch) instead of appending
    across generations. The batch tier enforces this with the shared
    content stamp (``hier_pq_codes`` folds the books + assignment
    builders in); a streaming loop does it by dropping/rebuilding the
    codes table in the same swap as its index tables. Appends
    bit-equal a full re-encode and replay-idempotence are
    property-tested (tests/test_properties.py)."""
    from mr_py_spark.operators.bucketed import (
        _BUCKETS,
        raise_watermark,
        replay_guard,
    )
    from mr_py_spark.operators.similarity import ivf_assign_with
    from mr_py_spark.sources.sinks import write_bucketed

    if idempotent:
        new_vectors = (
            replay_guard(new_vectors.sparkSession, table, new_vectors, "vec_id")
            if minmax is None
            else replay_guard(
                new_vectors.sparkSession, table, new_vectors, "vec_id",
                minmax=minmax,
            )
        )
    elif minmax is None:
        raise_watermark(new_vectors.sparkSession, table, new_vectors, "vec_id")
    else:
        raise_watermark(
            new_vectors.sparkSession, table, new_vectors, "vec_id",
            max_id=minmax[1],
        )
    assigned = hier_assign(ivf_assign_with(root_cent, new_vectors), leaf_cent)
    write_bucketed(
        _pq_encode_frame(assigned, books), table, ("bucket", "leaf"),
        _BUCKETS, mode="append",
    )


@register("hier_pq_codes_maintenance", tags=("C3", "A8", "B22"), oracle=None)
def hier_pq_codes_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible end-to-end of the PQ-code table's O(delta)
    lifecycle (r16, VERDICT r15 item 7 — the codes table previously
    had append-by-rebuild only): build a PRIVATE standing codes table
    from the fixture's corpus split under the shared hier quantizers
    and codebooks, admit the fixture's delta split through
    ``hier_pq_codes_append`` (assign + encode the delta only — never a
    corpus re-encode), replay the same append under the idempotent
    guard, and emit the audit the maintenance contract promises:
    the appended table is row-identical (codes included) to a one-pass
    encode of the full corpus — codes are a pure function of
    (assignment, books), so the O(delta) path must be bit-equal to the
    rebuild it replaces — and the replay admits exactly zero rows.
    Rows-only (PQ codes are engine-specific layout); the same
    bit-equality and replay-idempotence are property-tested on
    synthetic corpora (tests/test_properties.py), and the generation
    contract (a retrain invalidates every stored code) is documented
    on ``hier_pq_codes_append``."""
    import os
    import re as _re
    import shutil
    import tempfile as _tf

    from mr_py_spark.operators.bucketed import _BUCKETS
    from mr_py_spark.operators.dedup import (
        _INC_BUCKETS,
        _INC_DELTA_BUCKET,
        _INC_MULT,
    )
    from mr_py_spark.operators.similarity import _emb_double, ivf_assign_with
    from mr_py_spark.sources.sinks import write_bucketed

    e = _emb_double(tbl(spark, sf_dir, "embeddings"), "v")
    split = (F.col("vec_id") * F.lit(_INC_MULT)) % F.lit(_INC_BUCKETS)
    delta = e.filter(split == _INC_DELTA_BUCKET)
    # shared standing quantizers of the SAME corpus split + the shared
    # codebooks — only the codes table itself is private to this demo
    root_cent, leaf_cent, corpus_assigned = hier_corpus_index(spark, sf_dir)
    books = _hier_pq_books(spark, sf_dir)

    tag = (
        _re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/")) + f"_p{os.getpid()}"
    )
    table = f"mrps_pq_codes_demo_{tag}"
    root = os.path.join(_tf.gettempdir(), "spark_graft_pq_codes", tag)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write_bucketed(
            _pq_encode_frame(corpus_assigned, books),
            table, ("bucket", "leaf"), _BUCKETS,
            path=os.path.join(root, "codes"),
        )
        n_corpus = spark.table(table).count()
        hier_pq_codes_append(root_cent, leaf_cent, books, delta, table)
        n_after = spark.table(table).count()
        # bit-equality vs the one-pass full encode this path replaces:
        # full outer on vec_id, any missing/extra/differing row counts
        full = _pq_encode_frame(
            hier_assign(
                ivf_assign_with(root_cent, e), leaf_cent
            ),
            books,
        ).select(
            "vec_id",
            F.struct("bucket", "leaf", "code").alias("want"),
        )
        got = spark.table(table).select(
            "vec_id", F.struct("bucket", "leaf", "code").alias("got")
        )
        mismatches = (
            got.join(full, "vec_id", "full_outer")
            .filter(
                F.col("got").isNull()
                | F.col("want").isNull()
                | (F.col("got") != F.col("want"))
            )
            .count()
        )
        # replayed append under the idempotent guard admits nothing
        hier_pq_codes_append(
            root_cent, leaf_cent, books, delta, table, idempotent=True
        )
        replay_admitted = spark.table(table).count() - n_after
        return spark.createDataFrame(
            [
                ("n_corpus_codes", int(n_corpus)),
                ("n_delta_appended", int(n_after - n_corpus)),
                ("mismatch_vs_full_encode", int(mismatches)),
                ("replay_admitted", int(replay_admitted)),
            ],
            "metric string, value long",
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(root, ignore_errors=True)
