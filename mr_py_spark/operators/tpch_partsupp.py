"""TPC-H Q2/Q11/Q20 over a DERIVED partsupp (SURVEY.md §2 B19/B36
family; closes the r8 verdict's "Missing #5": the fixtures ship no
partsupp table, so the three partsupp queries were previously only
adapted shapes).

The partsupp dimension is derived DETERMINISTICALLY from part x
supplier with pure integer arithmetic — four suppliers per part,
availqty/supplycost as modular functions of the key pair — so BOTH
engines can reconstruct the identical table inline and the queries
stay bitwise-oracle-checked:

    ps_suppkey    = (p_partkey * 4 + i) % |supplier|,  i in 0..3
    ps_availqty   = (p_partkey * 7 + ps_suppkey * 11) % 9999 + 1
    ps_cost_cents = (p_partkey * 13 + ps_suppkey * 17) % 90000 + 10000

Money stays in INTEGER CENTS through every sum and comparison (the
corr_by_group scaled-long lesson, SCALE.md r9): supplycost values and
stock-value sums are exact longs, divided by 100 exactly once at the
output edge — one IEEE division, bit-identical cross-engine. All
threshold comparisons are integer-vs-integer (value*1000 > total,
2*availqty > shipped), so no float boundary exists anywhere.

Scale shape: partsupp is 4x|part| rows built by an explode over the
part scan glued to a broadcast 1-row supplier count (the bounded
1-row-aggregate crossJoin class, CLAUDE.md) — never materialized,
re-derived per query like any dimension scan at 100 TB would be
(cheaper than shipping it: it is three arithmetic columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mr_py_spark.registry import register
from mr_py_spark.sources import tbl

#: Oracle-side partsupp derivation (inline CTE body, DuckDB syntax).
_PS_SQL = """
        scnt AS (SELECT count(*) AS s FROM supplier),
        ps AS (
            SELECT p_partkey AS ps_partkey,
                   (p_partkey * 4 + i) % s AS ps_suppkey,
                   (p_partkey * 7 + ((p_partkey * 4 + i) % s) * 11) % 9999 + 1
                       AS ps_availqty,
                   (p_partkey * 13 + ((p_partkey * 4 + i) % s) * 17) % 90000
                       + 10000 AS ps_cost_cents
            FROM part, scnt, (SELECT unnest(generate_series(0, 3)) AS i)
        )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-side twin of ``_PS_SQL``: (ps_partkey, ps_suppkey,
    ps_availqty, ps_cost_cents), four rows per part, all exact
    integers. The supplier count rides in as a broadcast 1-row
    aggregate; every operand is non-negative so Spark's
    sign-follows-dividend % equals DuckDB's."""
    part = tbl(spark, sf_dir, "part").select("p_partkey")
    scnt = tbl(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("s"))
    sk = (F.col("p_partkey") * 4 + F.col("i")) % F.col("s")
    return (
        part.select(
            "p_partkey", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
        )
        .crossJoin(F.broadcast(scnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            sk.cast("long").alias("ps_suppkey"),
            ((F.col("p_partkey") * 7 + sk * 11) % 9999 + 1)
            .cast("long")
            .alias("ps_availqty"),
            ((F.col("p_partkey") * 13 + sk * 17) % 90000 + 10000)
            .cast("long")
            .alias("ps_cost_cents"),
        )
    )


@register(
    "q2_min_cost_supplier",
    tags=("B19", "B34", "B21"),
    oracle=f"""
        WITH {_PS_SQL},
        r AS (
            SELECT ps_partkey, ps_suppkey, ps_cost_cents,
                   s_name, s_acctbal, n_name,
                   row_number() OVER (PARTITION BY ps_partkey
                                      ORDER BY ps_cost_cents, ps_suppkey)
                       AS rn
            FROM ps
            JOIN supplier ON s_suppkey = ps_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN region   ON r_regionkey = n_regionkey AND r_name = 'ASIA'
        )
        SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
               CAST(ps_cost_cents AS DOUBLE) / 100 AS supplycost
        FROM r JOIN part ON p_partkey = ps_partkey
        WHERE rn = 1 AND p_size BETWEEN 10 AND 15 AND p_type = 'ECONOMY'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each mid-size ECONOMY
    part, the cheapest ASIA supplier offering it. The region filter
    lands BEFORE the per-part argmin (as in the spec: min over
    region suppliers only); argmin is a row_number window over the
    <= 4 partsupp rows per part with a (cost, suppkey) total order —
    deterministic under cost ties, partition-bounded so no skew.

    Scale shape: partsupp is derived on the part scan; supplier/
    nation/region are broadcast dims; the window partitions by
    ps_partkey (4-row groups). supplycost surfaces as cents/100 —
    one exact division; s_acctbal is a raw scan column."""
    ps = derived_partsupp(spark, sf_dir)
    supp = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = tbl(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "ECONOMY")
    )
    w = Window.partitionBy("ps_partkey").orderBy("ps_cost_cents", "ps_suppkey")
    r = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return r.join(part, r.ps_partkey == part.p_partkey).select(
        "p_partkey",
        "p_name",
        "s_name",
        "n_name",
        "s_acctbal",
        (F.col("ps_cost_cents").cast("double") / 100).alias("supplycost"),
    )


@register(
    "q11_important_stock",
    tags=("B2", "B7", "B19"),
    oracle=f"""
        WITH {_PS_SQL},
        g AS (
            SELECT ps_partkey,
                   sum(ps_cost_cents * ps_availqty) AS value_cents
            FROM ps
            JOIN supplier ON s_suppkey = ps_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
                         AND n_name = 'NATION_3'
            GROUP BY ps_partkey
        ),
        tot AS (SELECT sum(value_cents) AS total_cents FROM g)
        SELECT ps_partkey,
               CAST(value_cents AS DOUBLE) / 100 AS stock_value
        FROM g, tot
        WHERE value_cents * 1000 > total_cents
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): parts whose stock
    value held by NATION_3 suppliers exceeds 0.1% of that nation's
    total. The HAVING-against-a-global-aggregate shape — the total is
    a 1-row broadcast (bounded crossJoin class) and the threshold
    compare is INTEGER (value_cents * 1000 > total_cents): no float
    enters the predicate, so the cut is exact at any magnitude (the
    skew_audit width lesson). Stock value emerges as cents/100, one
    exact division per output row.

    Scale: one keyed aggregation over 4x|part| derived rows filtered
    by a broadcast nation-supplier dim; total via second-stage 1-row
    reduce. value_cents <= 1e9 per row keeps the long sum exact past
    10^9 parts."""
    ps = derived_partsupp(spark, sf_dir)
    supp = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    g = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias(
                "value_cents"
            )
        )
    )
    tot = g.agg(F.sum("value_cents").alias("total_cents"))
    return (
        g.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / 100).alias("stock_value"),
        )
    )


@register(
    "q20_potential_promotion",
    tags=("B19", "B20", "B30"),
    oracle=f"""
        WITH {_PS_SQL},
        shipped AS (
            SELECT l_partkey, l_suppkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1999-01-01'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT DISTINCT s_suppkey, s_name
        FROM ps
        JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        JOIN part     ON p_partkey = ps_partkey AND p_name LIKE 'red%'
        JOIN supplier ON s_suppkey = ps_suppkey
        WHERE 2 * ps_availqty > qty
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers of red parts
    whose available stock exceeds half of what they shipped over
    1996-1998 — overstocked suppliers, promotion candidates. The
    excess-stock predicate is INTEGER (2 * availqty > qty; quantities
    are integer-valued, summed as BIGINT), so the cut never touches a
    float. Pairs that shipped nothing drop out through the inner join,
    mirroring the spec's correlated-subquery NULL semantics.

    Scale shape: the lineitem aggregation is the only big shuffle
    (keyed on (partkey, suppkey) with map-side partials and the date
    filter pushed to the scan); partsupp derives on the part scan and
    joins shipped on the same composite key; part/supplier broadcast.
    DISTINCT output is bounded by |supplier|."""
    li = tbl(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    ps = derived_partsupp(spark, sf_dir)
    part = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = tbl(spark, sf_dir, "supplier")
    return (
        ps.join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("ps_suppkey"))
        .filter(2 * F.col("ps_availqty") > F.col("qty"))
        .select("s_suppkey", "s_name")
        .distinct()
    )
