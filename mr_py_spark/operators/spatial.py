"""Planar spatial join via grid bucketing (SURVEY.md §2 B24 family —
the 2-D analogue of the banded-LSH candidate pattern in C2/C3).

No geo fixture exists, so point coordinates are synthesized
DETERMINISTICALLY from the keys (integer multiplicative hashing onto a
100k x 100k grid) on BOTH engines — the pii_scrub planting policy:
deterministic, identical both sides, documented. All coordinate and
distance math is exact 64-bit integer arithmetic (squared distances,
never sqrt), so every comparison is bitwise cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.registry import register
from mr_py_spark.sources import tbl

#: World is [0, _WORLD)^2; radius and grid cell size are equal, so a
#: facility's 3x3 cell neighborhood provably covers its whole radius-R
#: disk — the candidate equi-join is EXACT, not best-effort.
_WORLD = 100_000
_R = 4_000
_CELL = _R

#: Knuth-style odd multipliers for the coordinate synthesis.
_MX, _MY = 48271, 69621


def _coords_sql(key: str) -> tuple[str, str]:
    return (
        f"(({key} * {_MX}) % {_WORLD})",
        f"(({key} * {_MY}) % {_WORLD})",
    )


@register(
    "spatial_radius_join",
    tags=("B24", "B19", "B31"),
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey,
                   {_coords_sql('c_custkey')[0]} AS px,
                   {_coords_sql('c_custkey')[1]} AS py
            FROM customer
        ), fac AS (
            SELECT s_suppkey,
                   {_coords_sql('s_suppkey')[0]} AS fx,
                   {_coords_sql('s_suppkey')[1]} AS fy
            FROM supplier
        ), hits AS (
            SELECT s_suppkey,
                   CAST(count(*) AS BIGINT) AS n_within,
                   min((px - fx) * (px - fx) + (py - fy) * (py - fy))
                       AS min_dist2
            FROM fac JOIN pts
              ON (px - fx) * (px - fx) + (py - fy) * (py - fy)
                     <= {_R * _R}
            GROUP BY s_suppkey
        )
        SELECT f.s_suppkey,
               coalesce(h.n_within, 0) AS n_within,
               h.min_dist2
        FROM fac f LEFT JOIN hits h ON h.s_suppkey = f.s_suppkey
    """,
)
def spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius query per facility (the store-catchment / geofence
    count): how many customer points fall within distance R of each
    supplier point, plus the nearest squared distance. The oracle is
    the O(|fac| x |pts|) theta join; the Spark plan is the SCALE form:
    points land in R-sized grid cells, each facility explodes to its
    3x3 cell neighborhood (a fixed 9-row fan-out), candidates meet in
    a plain equi-join on the cell id, and the exact integer distance
    filter keeps true hits. Cell size = R makes the neighborhood
    provably cover the disk, so candidate generation loses NOTHING —
    the same exactness argument as image_dup_pairs' pigeonhole bands,
    in 2-D. Zero-hit facilities survive via the left join-back
    (n_within = 0, NULL min_dist2).

    At 100 TB: the candidate join shuffles on a key whose per-bucket
    population is geometry-bounded (points per cell), never all-pairs;
    both sides prune to cell granularity. Facilities fan out 9x before
    the shuffle — the bounded, shuffle-friendly side."""
    cust = tbl(spark, sf_dir, "customer")
    supp = tbl(spark, sf_dir, "supplier")
    px = (F.col("c_custkey") * _MX) % _WORLD
    py = (F.col("c_custkey") * _MY) % _WORLD
    fx = (F.col("s_suppkey") * _MX) % _WORLD
    fy = (F.col("s_suppkey") * _MY) % _WORLD
    pts = cust.select(
        "c_custkey",
        px.alias("px"),
        py.alias("py"),
        (px / _CELL).cast("long").alias("cx"),
        (py / _CELL).cast("long").alias("cy"),
    )
    fac = supp.select(
        "s_suppkey", fx.alias("fx"), fy.alias("fy")
    )
    ring = F.array(
        *[
            F.struct(
                ((F.col("fx") / _CELL).cast("long") + dx).alias("cx"),
                ((F.col("fy") / _CELL).cast("long") + dy).alias("cy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    fac_cells = fac.select(
        "s_suppkey", "fx", "fy", F.explode(ring).alias("c")
    ).select("s_suppkey", "fx", "fy", F.col("c.cx"), F.col("c.cy"))
    d2 = (F.col("px") - F.col("fx")) * (F.col("px") - F.col("fx")) + (
        F.col("py") - F.col("fy")
    ) * (F.col("py") - F.col("fy"))
    hits = (
        fac_cells.join(pts, ["cx", "cy"])
        .filter(d2 <= _R * _R)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.min(d2).alias("min_dist2"),
        )
    )
    return fac.join(hits, "s_suppkey", "left").select(
        "s_suppkey",
        F.coalesce(F.col("n_within"), F.lit(0)).alias("n_within"),
        "min_dist2",
    )
