"""Similarity search over embeddings (SURVEY.md §2C: C3).

The embeddings fixture is 64-dim float32, L2-normalized, so dot
product == cosine similarity (FIXTURES.md). Three tiers:

- brute-force top-k (oracle-checked) — correctness baseline;
- threshold pair mining (oracle-checked);
- IVF-bucketed approximate top-k (rows-only + recall property test) —
  the 100 TB path: candidate generation is an equi-join on a coarse
  centroid id, so cost is O(n * k / nlist), not O(n^2).

Float determinism: both engines cast float32 -> double BEFORE any
multiply, so products are exact and the left-to-right double
accumulation is bit-identical; round(_, 6) is then stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mr_py_spark.functions import dot
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


class _LocalBroadcast:
    """Closure-captured fallback when no SparkContext exists (Spark
    Connect): cloudpickle ships the value inside the UDF instead of a
    torrent broadcast — same semantics, higher serialization cost."""

    def __init__(self, value):
        self.value = value


def _bc(spark: SparkSession, value):
    try:
        return spark.sparkContext.broadcast(value)
    except Exception:
        return _LocalBroadcast(value)


def _emb_double(df: DataFrame, out: str) -> DataFrame:
    return df.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias(out)
    )


@register(
    "knn_cosine_topk",
    tags=("C3",),
    oracle="""
        WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 50),
             c AS (SELECT vec_id AS nn_id, CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings)
        SELECT q_id, nn_id, round(sim, 6) AS sim, rn
        FROM (
            SELECT q.q_id, c.nn_id,
                   list_dot_product(q.qv, c.cv) AS sim,
                   row_number() OVER (PARTITION BY q.q_id
                                      ORDER BY list_dot_product(q.qv, c.cv) DESC, c.nn_id) AS rn
            FROM q, c
            WHERE q.q_id <> c.nn_id
        )
        WHERE rn <= 5
    """,
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 50 query vectors (C3 baseline).

    The query side is tiny and broadcast, so the 'cross join' is a
    broadcast nested loop over the candidate scan — each candidate
    partition streams once, no shuffle of the big side. Top-k is a
    window over q_id. For all-pairs at scale use knn_ivf_topk.
    """
    e = tbl(spark, sf_dir, "embeddings")
    q = _emb_double(e.filter(F.col("vec_id") < 50), "qv").withColumnRenamed("vec_id", "q_id")
    c = _emb_double(e, "cv").withColumnRenamed("vec_id", "nn_id")
    pairs = q.join(c, q.q_id != c.nn_id).select(
        "q_id", "nn_id", dot("qv", "cv").alias("sim")
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("nn_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("q_id", "nn_id", F.round("sim", 6).alias("sim"), "rn")
    )


@register(
    "cosine_near_dup_pairs",
    tags=("C2", "C3"),
    oracle="""
        WITH t AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.v, b.v), 6) AS sim,
               CAST(a.label = b.label AS INTEGER)   AS same_label
        FROM t a, t b
        WHERE a.vec_id < b.vec_id
          AND list_dot_product(a.v, b.v) >= 0.9
    """,
)
def cosine_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate mining (C2/C3): all pairs with
    sim >= 0.9. Exact all-pairs is the oracle baseline; at scale the
    same threshold query runs over IVF buckets (see knn_ivf_topk) or
    random-projection LSH buckets."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.alias("a")
    b = e.alias("b")
    sim = dot(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("sim_raw"),
            (F.col("a.label") == F.col("b.label")).cast("int").alias("same_label"),
        )
        .filter(F.col("sim_raw") >= 0.9)
        .select("id_a", "id_b", F.round("sim_raw", 6).alias("sim"), "same_label")
    )


@register(
    "knn_selfjoin",
    tags=("C3",),
    oracle="""
        WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT q_id, nn_id, rn
        FROM (
            SELECT a.vec_id AS q_id, b.vec_id AS nn_id,
                   row_number() OVER (PARTITION BY a.vec_id
                                      ORDER BY list_dot_product(a.v, b.v) DESC, b.vec_id) AS rn
            FROM t a, t b
            WHERE a.vec_id <> b.vec_id
        )
        WHERE rn <= 5
    """,
)
def knn_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full kNN self-join, top-5 per vector (C3) — the benchmark's
    quadratic query, executed as broadcast-index + vectorized matmul
    instead of a row-pair cross join.

    Plan: the whole corpus (n x 64 float32, ~0.5 MB at sf0.1) is a
    broadcast variable; each partition of query vectors computes a
    numpy (batch x n) dot product and keeps its own top-5 — no shuffle,
    no per-pair rows, O(n*d) memory per task. At 10^8+ vectors the same
    operator runs per IVF bucket (knn_ivf_topk) instead of the full
    corpus. Similarities are not emitted: BLAS accumulation order
    differs from a sequential fold at the last ULP, so ids+rank are the
    stable contract (ranking flips would need two candidates closer
    than ~1e-13 in cosine).
    """
    import numpy as np
    import pandas as pd

    e = tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.toPandas()
    ids = np.asarray(corpus["vec_id"], dtype=np.int64)
    mat = np.asarray(list(corpus["embedding"]), dtype=np.float32).astype(np.float64)
    b_ids = _bc(spark, ids)
    b_mat = _bc(spark, mat)

    def topk(batches):
        cids, cmat = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.asarray(list(pdf["embedding"]), dtype=np.float32).astype(np.float64)
            sims = q @ cmat.T  # (batch, n)
            qids = np.asarray(pdf["vec_id"], dtype=np.int64)
            # mask self-matches, then take top-5 with (sim desc, id asc) order
            sims[qids[:, None] == cids[None, :]] = -np.inf
            n = sims.shape[1]
            k = min(5, n - 1)
            out_q, out_n, out_r = [], [], []
            for i in range(sims.shape[0]):
                row = sims[i]
                # candidates = everything tied with or above the k-th best
                # similarity, so the (sim desc, id asc) tie-break matches the
                # oracle's row_number() even under mass ties (duplicate vectors)
                kth = -np.partition(-row, k - 1)[k - 1]
                cand = np.nonzero(row >= kth)[0]
                order = np.lexsort((cids[cand], -row[cand]))[:k]
                out_q.extend([qids[i]] * len(order))
                out_n.extend(cids[cand[order]])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {
                    "q_id": np.asarray(out_q, dtype=np.int64),
                    "nn_id": np.asarray(out_n, dtype=np.int64),
                    "rn": np.asarray(out_r, dtype=np.int64),
                }
            )

    return e.mapInPandas(topk, "q_id long, nn_id long, rn long")


# 4 hyperplanes -> 16 buckets. For cos-sim s, a neighbor differs on each
# bit with prob acos(s)/pi, so at 4 bits a s=0.7 neighbor is ~1 bit away
# and 1-bit multiprobe recovers it; more planes would need multiple hash
# tables (L repetitions) to hold recall, which is the production knob.
_N_PLANES = 4


@register("knn_rplsh_topk", tags=("C3", "C2"), oracle=None)
def knn_rplsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH approximate top-5 (C3 scale path #2).
    Rows-only; pytest measures recall against the brute-force oracle.

    Signature = sign bits of fixed random projections (seeded numpy,
    broadcast) -> a bucket key. Candidates = equi-join on bucket (plus
    the single-bit-flip neighbor buckets for the query side, the
    standard multi-probe trick that recovers recall near Hamming
    boundaries). Like IVF, the join fan-out is independent of corpus
    size — this is the LSH-bucketed form of cosine_near_dup_pairs
    for 10^9-vector corpora.
    """
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    planes = rng.standard_normal((64, _N_PLANES))
    b_planes = _bc(spark, planes)

    e = tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def bucketize(batches):
        pl = b_planes.value
        for pdf in batches:
            m = np.asarray(list(pdf["embedding"]), dtype=np.float32)
            bits = (m.astype(np.float64) @ pl) > 0
            key = (bits * (1 << np.arange(_N_PLANES))).sum(axis=1).astype(np.int64)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "embedding": pdf["embedding"], "bucket": key}
            )

    schema = "vec_id long, embedding array<float>, bucket long"
    assigned = e.mapInPandas(bucketize, schema)

    # multi-probe: query probes its own bucket + all 1-bit flips
    probes = assigned.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(_N_PLANES)
                ],
            )
        ).alias("bucket"),
    ).filter(F.col("q_id") < 50)

    cand = probes.join(
        assigned.select(
            F.col("vec_id").alias("nn_id"),
            F.col("embedding").cast("array<double>").alias("cv"),
            "bucket",
        ),
        "bucket",
    ).filter(F.col("q_id") != F.col("nn_id"))
    wk = W.partitionBy("q_id").orderBy(F.desc("sim_raw"), F.asc("nn_id"))
    return (
        cand.select("q_id", "nn_id", dot("qv", "cv").alias("sim_raw"))
        .distinct()
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= 5)
        .select("q_id", "nn_id", F.round("sim_raw", 6).alias("sim"), "rn")
    )


_N_CENTROIDS_MOD = 31  # vec_id % 31 == 0 -> deterministic pseudo-centroids
_N_PROBE = 6


@register("knn_ivf_topk", tags=("C3",), oracle=None)
def knn_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-5 (C3 scale path). Rows-only; pytest
    measures recall against knn_cosine_topk.

    Index build (one pass, all joins keyed):
      centroids  = deterministic subset of vectors (vec_id % 31 == 0);
                   a production build would k-means these, the plan
                   shape is identical
      assignment = each vector -> nearest centroid id (broadcast
                   centroids x vectors, window top-1)
    Search: each query probes its _N_PROBE nearest centroids' buckets only —
    candidate generation is an equi-join on centroid_id, so the join
    fan-out is n_queries * avg_bucket * nprobe, independent of corpus
    size. This is the structure that replaces the brute-force cross
    join at 10^9 vectors.
    """
    e = _emb_double(tbl(spark, sf_dir, "embeddings"), "v")
    cent = (
        e.filter(F.col("vec_id") % _N_CENTROIDS_MOD == 0)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )

    # assignment: vector -> nearest centroid
    sim_c = dot("v", "cv")
    w1 = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    assigned = (
        e.join(F.broadcast(cent), how="cross")
        .select("vec_id", "v", "cid", sim_c.alias("csim"))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("cid").alias("bucket"))
    )

    # queries probe their top-N_PROBE centroids
    queries = e.filter(F.col("vec_id") < 50).withColumnRenamed("vec_id", "q_id").withColumnRenamed("v", "qv")
    wq = W.partitionBy("q_id").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        queries.join(F.broadcast(cent), how="cross")
        .select("q_id", "qv", "cid", dot("qv", "cv").alias("csim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _N_PROBE)
        .select("q_id", "qv", F.col("cid").alias("bucket"))
    )

    # candidate generation: equi-join on bucket
    cand = probes.join(assigned, "bucket").filter(F.col("q_id") != F.col("vec_id"))
    wk = W.partitionBy("q_id").orderBy(F.desc("sim_raw"), F.asc("nn_id"))
    return (
        cand.select("q_id", F.col("vec_id").alias("nn_id"), dot("qv", "v").alias("sim_raw"))
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= 5)
        .select("q_id", "nn_id", F.round("sim_raw", 6).alias("sim"), "rn")
    )
