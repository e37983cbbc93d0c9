"""Graph analytics over derived relational graphs (SURVEY.md §2
adjunct: the iterated-keyed-shuffle family, with connected components
(dedup.py) and BPE (bpe.py) as siblings).

PageRank is the canonical iterative MapReduce workload (Dean &
Ghemawat's motivating example; Page et al. 1999): per round, every
node sends rank/degree along its edges and re-aggregates. On
DataFrames that is one equi-join plus one keyed aggregation per
iteration — no driver-side graph, so the loop runs at 10^9 edges.

Cross-engine determinism design: a float sum over a node's neighbors
is accumulation-order-dependent, so raw-double PageRank can never be
compared bitwise. Each edge CONTRIBUTION is therefore quantized to
DECIMAL(18,9) (half-up, sub-ULP of any rank value here) BEFORE the
neighbor sum — decimal sums are exact and order-free — and the damping
update is a fixed chain of single IEEE ops. The pure-Python reference
implementation in tests/test_properties.py replays the identical
quantize/sum/update sequence and must match EXACTLY, iteration for
iteration (oracle-by-reimplementation, as bpe_learn_merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.registry import register
from mr_py_spark.sources import tbl

_DAMPING = 0.85
_N_ITER = 10
#: Per-edge contribution quantum: DECIMAL(18,9) — half-up, exact sums.
_Q = "decimal(18,9)"


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part co-purchase edges: the distinct (part_a < part_b)
    pairs that share an order — the basket_pairs_topk pair set without
    the top-k cut. Basket-keyed self-equi-join, fan-out bounded by
    basket size (<= 21 pairs per order at any corpus size)."""
    items = (
        tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    n_iter: int = _N_ITER,
    damping: float = _DAMPING,
) -> DataFrame:
    """Power-iteration PageRank on an undirected edge list (src, dst).

    Nodes are the edge endpoints (a dangling-free graph by
    construction — undirected edges give every node out-degree). Per
    round: contribution = quantize(rank / degree) per directed edge,
    one groupBy(dst) decimal sum, one damping update — two keyed
    shuffles, lineage localCheckpoint'ed every few rounds like
    connected_components. Returns (node, rank)."""
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    n = nodes.count()  # scalar graph size: needed in the update constant
    ranks = nodes.select("node", "deg", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for i in range(n_iter):
        contrib = (
            both.join(ranks, both.src == ranks.node)
            .select(
                F.col("dst"),
                (F.col("rank") / F.col("deg")).cast(_Q).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ranks.join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % 3 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


@register("pagerank_parts", tags=("B19", "B11", "A9"), oracle=None)
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (the iterative-graph
    member of the pattern catalog, joining connected components and
    BPE): 10 damped power iterations on the basket-derived edge list,
    top-20 parts by rank with a total tie-break. Per iteration the
    plan is one equi-join + one keyed decimal aggregation — the rank
    frame is O(|nodes|), the join O(|edges|), nothing driver-side but
    the scalar node count.

    Rows-only (an iterative fixpoint is not single-statement SQL; a
    recursive CTE cannot aggregate in its recursive term), pinned
    EXACTLY — every rank bit, every iteration — by a pure-Python
    reference replaying the same quantize/sum/update sequence
    (tests/test_properties.py), which the DECIMAL(18,9) contribution
    quantization makes possible: decimal sums are order-free, so
    cluster parallelism cannot perturb the result."""
    ranks = pagerank(spark, copurchase_edges(spark, sf_dir))
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
        .select(F.col("node").alias("part"), "rank")
    )


@register(
    "graph_triangles",
    tags=("B19", "B7"),
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), e AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ), deg AS (
            SELECT node, count(*) AS d FROM (
                SELECT src AS node FROM e UNION ALL SELECT dst FROM e
            ) GROUP BY 1
        ), tri AS (
            SELECT count(*) AS n_tri
            FROM e e1
            JOIN e e2 ON e2.src = e1.dst
            JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
        )
        SELECT (SELECT count(*) FROM deg)                   AS n_nodes,
               (SELECT count(*) FROM e)                     AS n_edges,
               (SELECT CAST(n_tri AS BIGINT) FROM tri)      AS n_triangles,
               -- // not /: DuckDB's / on integers yields DOUBLE, which
               -- pandas-canonicalizes as float64 against Spark's long
               -- (the skew_audit width trap); the sum is always even
               (SELECT CAST(sum(d * (d - 1)) // 2 AS BIGINT) FROM deg)
                                                            AS n_wedges,
               (SELECT CAST(3 * n_tri AS DOUBLE) FROM tri)
                 / (SELECT CAST(sum(d * (d - 1)) AS DOUBLE) / 2 FROM deg)
                                                            AS clustering
        FROM (SELECT 1)
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph (the second classic
    graph-MapReduce pattern, after PageRank): canonical a<b<c edge
    orientation makes the count one two-hop equi-join chain — e(a,b)
    ⋈ e(b,c) ⋈ e(a,c) — with every triangle counted exactly once and
    no cartesian anywhere, plus the wedge count (sum d(d-1)/2, exact
    int64) and the global clustering coefficient (one IEEE division
    of exactly-derived doubles — bitwise on both engines). The
    degree-ordered orientation is also the standard skew guard: the
    join fans out along each node's HIGHER-id neighbors only.

    Scale shape: the joins shuffle edge keys (ids, no payload), but
    triangle counting's intermediate is the WEDGE set — Σ deg(v)^2
    rows — which is quadratic in degree, not in edges: on the dense
    co-purchase graph it is tractable at the driver scale (26M wedges
    at sf0.01, 15 s) and explodes by sf1 (~1.8e10 wedges) on ANY
    engine. The production refinements are degree-based orientation
    (fan out along each node's higher-DEGREE neighbors, bounding
    per-hub wedges) and/or DOULION-style edge sampling; the raw-id
    orientation here is kept because it matches the oracle exactly,
    which is what the driver compares."""
    e = copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count("*").alias("n_tri"))
    )
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)).cast("long") / 2)
        .cast("long")
        .alias("n_wedges"),
        (F.sum(F.col("d") * (F.col("d") - 1)).cast("double") / 2).alias("_wd"),
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(n_edges))
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_tri").cast("long").alias("n_triangles"),
            "n_wedges",
            ((F.col("n_tri") * 3).cast("double") / F.col("_wd")).alias("clustering"),
        )
    )
