"""Data-quality audits over the warehouse (SURVEY.md §2 B7 counters /
global-stats family, sibling of summarize.table_profile_documents and
skew.skew_audit).

A referential-integrity audit is the first job any 100 TB ingest runs
after load: for every declared FK edge, how many child rows point at a
missing parent (orphans — broken ingest), and how many parents no
child references (dead dimension rows — wasted scan width). The
MapReduce formulation is one grouped count per edge joined full-outer
against the parent key set — each edge is a single keyed shuffle, the
output is one row per edge, and nothing is ever driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.registry import register
from mr_py_spark.sources import tbl

#: The star schema's declared FK edges: (child table, child key,
#: parent table, parent key).
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _edge_audit(
    child: DataFrame, ckey: str, parent: DataFrame, pkey: str, name: str
) -> DataFrame:
    """One-row audit of a single FK edge: pre-aggregate the child to
    (key, row-count) — the map-side-combinable form, so the shuffle
    carries one row per DISTINCT key, not per child row — then one
    full-outer join against the distinct parent key set classifies
    every key as matched / orphan / unreferenced in a single pass."""
    ck = child.groupBy(F.col(ckey).alias("k")).agg(F.count("*").alias("n"))
    pk = parent.select(F.col(pkey).alias("k")).distinct()
    j = ck.alias("c").join(pk.alias("p"), F.col("c.k") == F.col("p.k"), "full_outer")
    return j.agg(
        F.lit(name).alias("edge"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("child_rows"),
        F.count(F.col("c.k")).alias("child_keys"),
        F.coalesce(
            F.sum(F.when(F.col("p.k").isNull(), F.col("n"))), F.lit(0)
        )
        .cast("long")
        .alias("orphan_rows"),
        F.count(F.when(F.col("c.k").isNull(), F.lit(1))).alias(
            "unreferenced_parents"
        ),
    )


def _edge_oracle(child: str, ckey: str, parent: str, pkey: str, name: str) -> str:
    # Sums/counts cast to BIGINT on the oracle side: DuckDB's integer
    # sum returns HUGEINT (the skew_audit width trap).
    return f"""
        SELECT '{name}' AS edge,
               (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS child_rows,
               (SELECT CAST(count(DISTINCT {ckey}) AS BIGINT) FROM {child})
                   AS child_keys,
               (SELECT CAST(count(*) AS BIGINT) FROM {child} c
                 WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                    WHERE p.{pkey} = c.{ckey}))
                   AS orphan_rows,
               (SELECT CAST(count(*) AS BIGINT)
                  FROM (SELECT DISTINCT {pkey} FROM {parent}) p
                 WHERE NOT EXISTS (SELECT 1 FROM {child} c
                                    WHERE c.{ckey} = p.{pkey}))
                   AS unreferenced_parents
    """


@register(
    "fk_integrity_audit",
    tags=("B7", "B19", "B20"),
    oracle="\nUNION ALL\n".join(
        _edge_oracle(c, ck, p, pk, f"{c}.{ck}->{p}.{pk}")
        for c, ck, p, pk in _FK_EDGES
    ),
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of every declared FK edge in the
    star schema: child rows, distinct child keys, orphaned child rows
    (key missing from the parent), and unreferenced parent keys (no
    child points at them). FUSED single-pass form (r9): a child table
    carrying E edges explodes each row to its E (edge, key) pairs in
    ONE scan — lineitem, child of three edges, is read once instead
    of three times — all edges pre-aggregate in one (edge, key)
    shuffle whose width is the distinct-key count per edge (a 10^12-
    row fact ships its ~10^9 keys, not rows), and a single
    (edge, key) full-outer join against the tagged parent key sets
    classifies everything; one groupBy(edge) emits the report. Same
    values as the per-edge form (`fk_audit_per_edge`, kept for the
    SCALE.md A/B); all counts LONG on both sides."""
    # Edges travel as TINY int ids through the wide shuffles (the
    # name string would triple the exploded fact's shuffle bytes);
    # names come back via a per-edge CASE on the 7-row aggregate.
    edge_id = {e: i for i, e in enumerate(_FK_EDGES)}
    edge_name = {
        i: f"{c}.{ck}->{p}.{pk}" for (c, ck, p, pk), i in edge_id.items()
    }
    by_child: dict[str, list[tuple]] = {}
    for e in _FK_EDGES:
        by_child.setdefault(e[0], []).append(e)
    child_parts = []
    for c, edges in by_child.items():
        t = tbl(spark, sf_dir, c)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(edge_id[e]).cast("int").alias("eid"),
                    F.col(e[1]).cast("long").alias("k"),
                )
                for e in edges
            ]
        )
        child_parts.append(
            t.select(F.explode(pairs).alias("e")).select("e.eid", "e.k")
        )
    child_kv = child_parts[0]
    for f in child_parts[1:]:
        child_kv = child_kv.unionByName(f)
    ck_agg = child_kv.groupBy("eid", "k").agg(F.count(F.lit(1)).alias("n"))
    parent_parts = []
    for e in _FK_EDGES:
        parent_parts.append(
            tbl(spark, sf_dir, e[2])
            .select(
                F.lit(edge_id[e]).cast("int").alias("eid"),
                F.col(e[3]).cast("long").alias("k"),
            )
            .distinct()
        )
    pk_all = parent_parts[0]
    for f in parent_parts[1:]:
        pk_all = pk_all.unionByName(f)
    j = ck_agg.alias("c").join(
        pk_all.alias("p"),
        (F.col("c.eid") == F.col("p.eid")) & (F.col("c.k") == F.col("p.k")),
        "full_outer",
    )
    name = None
    for i, nm in edge_name.items():
        cond = F.col("eid") == i
        name = F.when(cond, nm) if name is None else name.when(cond, nm)
    agg = j.groupBy(
        F.coalesce(F.col("c.eid"), F.col("p.eid")).alias("eid")
    ).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("child_rows"),
        F.count(F.col("c.k")).alias("child_keys"),
        F.coalesce(F.sum(F.when(F.col("p.k").isNull(), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("orphan_rows"),
        F.count(F.when(F.col("c.k").isNull(), F.lit(1))).alias(
            "unreferenced_parents"
        ),
    )
    return agg.select(
        name.alias("edge"),
        "child_rows",
        "child_keys",
        "orphan_rows",
        "unreferenced_parents",
    )


def fk_audit_per_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r9 per-edge formulation (6 independent audits unioned;
    lineitem scanned three times) — unregistered, kept as the A/B
    control for the fused form's SCALE.md measurement."""
    frames = [
        _edge_audit(
            tbl(spark, sf_dir, c), ck, tbl(spark, sf_dir, p), pk,
            f"{c}.{ck}->{p}.{pk}",
        )
        for c, ck, p, pk in _FK_EDGES
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


#: Benford first-digit shares log10(1 + 1/d), materialized ONCE in
#: Python and injected as the same 17-significant-digit literal into
#: both engines' query texts — computing log10 inside each engine
#: would risk a 1-ULP cross-engine delta on a compared double.
_BENFORD = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}


@register(
    "benford_audit",
    tags=("B7", "B31", "B33"),
    oracle=f"""
        WITH d AS (
            SELECT CAST(substring(CAST(CAST(floor(
                       CAST(o_totalprice AS DECIMAL(10,4))) AS BIGINT)
                       AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM orders
        ), c AS (
            SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
        )
        SELECT digit, n,
               CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share,
               CASE digit
                   {" ".join(f"WHEN {d} THEN CAST({v!r} AS DOUBLE)"
                             for d, v in _BENFORD.items())}
               END AS benford,
               (CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE))
                   - CASE digit
                       {" ".join(f"WHEN {d} THEN CAST({v!r} AS DOUBLE)"
                                 for d, v in _BENFORD.items())}
                     END AS delta
        FROM c
    """,
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order prices — the fraud/synthetic-
    data screen auditors run on any money column: observed first-digit
    shares against Benford's law, with the signed deviation per digit.
    One grouped count (<=9 groups, map-side combinable), then the
    share/deviation math runs on the 9-row aggregate — the window
    total is over the POST-aggregation frame (bounded-metadata class,
    never a data-sized unpartitioned sort).

    Determinism: the first digit comes from exact DECIMAL floor ->
    BIGINT -> string (never log10 of a double, whose 1-ULP boundary
    cells would flip digits cross-engine), and the nine Benford
    constants are Python-materialized literals injected into BOTH
    query texts, so share - benford is the identical IEEE chain."""
    orders = tbl(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice").cast("decimal(10,4)"))
        .cast("long")
        .cast("string"),
        1,
        1,
    ).cast("long")
    c = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window as W

    total = F.sum("n").over(W.partitionBy())
    expr = None
    for d, v in _BENFORD.items():
        cond = F.when(F.col("digit") == d, F.lit(v))
        expr = cond if expr is None else expr.when(F.col("digit") == d, F.lit(v))
    share = F.col("n").cast("double") / total.cast("double")
    return c.select(
        "digit",
        "n",
        share.alias("share"),
        expr.alias("benford"),
        (share - expr).alias("delta"),
    )


@register(
    "forget_users_audit",
    tags=("B7", "B20", "B25"),
    oracle="""
        WITH f AS (SELECT c_custkey AS uid FROM customer
                   WHERE c_custkey % 97 = 0)
        SELECT 'customer' AS tbl,
               count(*) FILTER (c_custkey % 97 = 0)  AS n_deleted,
               count(*) FILTER (c_custkey % 97 <> 0) AS n_kept
        FROM customer
        UNION ALL
        SELECT 'orders',
               count(*) FILTER (o_custkey % 97 = 0),
               count(*) FILTER (o_custkey % 97 <> 0)
        FROM orders
        UNION ALL
        SELECT 'events',
               count(*) FILTER (user_id % 97 = 0),
               count(*) FILTER (user_id % 97 <> 0)
        FROM events
        UNION ALL
        SELECT 'lineitem',
               count(*) FILTER (d.o_orderkey IS NOT NULL),
               count(*) FILTER (d.o_orderkey IS NULL)
        FROM lineitem l
        LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_custkey % 97 = 0) d
               ON l.l_orderkey = d.o_orderkey
    """,
)
def forget_users_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten audit (GDPR/CCPA delete propagation): for
    a deterministic forget-set (custkey % 97 = 0, standing in for the
    request table), count the rows each warehouse table would lose —
    including the CASCADE: lineitem rows die through their parent
    order, one FK hop away from the user id they never carry.

    Scale shape per table is a single scan with a conditional
    aggregate — the forget predicate rides the scan, no join for any
    table that carries the user key directly. The cascade table is the
    real pattern: lineitem LEFT-joins the deleted-order key set (1/97
    of orders — a shuffle equi-join on the FK, AQE broadcasts it when
    small) and counts matches; the same plan with a filter instead of
    a count IS the production delete (rewrite kept rows, or a Delta/
    Iceberg MERGE DELETE). Deliberately NOT a driver-side forget list:
    the request set is data-sized, so it stays a DataFrame on the
    build side — never a collect, never an isin() literal.

    All outputs are exact longs; the four audits are independent
    scans unioned, so Spark runs them as parallel stages."""
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    events = tbl(spark, sf_dir, "events")
    li = tbl(spark, sf_dir, "lineitem")

    def scan_audit(df: DataFrame, name: str, key: str) -> DataFrame:
        gone = F.col(key) % 97 == 0
        return df.agg(
            F.lit(name).alias("tbl"),
            F.count(F.when(gone, F.lit(1))).alias("n_deleted"),
            F.count(F.when(~gone, F.lit(1))).alias("n_kept"),
        )

    dead_orders = (
        orders.filter(F.col("o_custkey") % 97 == 0)
        .select(F.col("o_orderkey").alias("d_orderkey"))
    )
    cascade = (
        li.join(dead_orders, li.l_orderkey == dead_orders.d_orderkey, "left")
        .agg(
            F.lit("lineitem").alias("tbl"),
            F.count("d_orderkey").alias("n_deleted"),
            F.count(F.when(F.col("d_orderkey").isNull(), F.lit(1))).alias(
                "n_kept"
            ),
        )
    )
    return (
        scan_audit(cust, "customer", "c_custkey")
        .unionByName(scan_audit(orders, "orders", "o_custkey"))
        .unionByName(scan_audit(events, "events", "user_id"))
        .unionByName(cascade)
    )
