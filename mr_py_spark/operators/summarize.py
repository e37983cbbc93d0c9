"""Summarization patterns (SURVEY.md §2B: B1-B7, B37; [MRDP ch.2]).

The reference expresses each of these as a hand-written mapper emitting
(group-key, partial-value) plus a reducer folding the group ([MR04 §2]);
the combiner optimization ([MR04 §4.3]) is user-supplied there. Here
each is one declarative ``groupBy().agg()`` — Catalyst always plans the
combiner (HashAggregate partial → shuffle → final), so map-side
pre-aggregation is free, and AQE right-sizes the shuffle.

Money aggregates follow the exact-DECIMAL policy (see
mr_py_spark/functions): sums are computed in DECIMAL and cast to double
once, so Spark and the DuckDB oracle produce bit-identical values with
no rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import davg, dec4, dsum, ts_ntz, words
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl
from mr_py_spark.util import scale_form_threshold, table_rows


@register(
    "q1_pricing_summary",
    tags=("B1", "B2", "B3"),
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(10,4))) AS DOUBLE)      AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(10,4))) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(10,4))
                        * (1 - CAST(l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(10,4))
                        * (1 - CAST(l_discount AS DECIMAL(10,4)))
                        * (1 + CAST(l_tax AS DECIMAL(10,4)))), 4) AS DOUBLE)      AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(10,4))) AS DOUBLE) / count(*)      AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(10,4))) AS DOUBLE) / count(*) AS avg_price,
               CAST(sum(CAST(l_discount AS DECIMAL(10,4))) AS DOUBLE) / count(*)      AS avg_disc,
               count(*)                                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan + filter + grouped aggregation.

    Scale: filter pushes to the parquet scan; the groupBy key space is
    6 rows, so partial aggregation collapses nearly all data map-side
    and the shuffle moves ~6 rows per input partition.

    Exact fixed-point aggregation: the naive form (cast each money
    column to DECIMAL per row, multiply and sum decimals) spends the
    whole query in decimal conversions and non-compact decimal
    arithmetic — measured 6.1 s vs 1.9 s for this formulation at sf10.
    Instead the 4-decimal inputs are encoded as scaled longs
    (round(x*10^4) — exact: fixture values carry <= 4 decimals), the
    products disc_price (scale 8) and charge (scale 12) are computed
    in int64, and each total is accumulated as 2-3 long sums of
    digit-range slices (lo/mid/hi), recombined into one DECIMAL per
    group at the end. Every per-row op stays in whole-stage codegen's
    primitive-long path; the decimal work is 6 rows, not 60M.

    Exactness bounds at 100 TB (~6*10^11 lineitem rows): every slice
    sum stays far under 2^63 (worst slice: disc_price hi <= 10^7/row
    -> 6*10^18 at 6*10^11 rows; charge uses a 3-way split so its
    slices are <= 10^5 and < 10^6 per row). The recombined decimal is
    bit-identical to summing DECIMAL(10,4) directly, which is what the
    oracle does.
    """
    li = tbl(spark, sf_dir, "lineitem")

    def fx4(c: str):  # exact: values have <= 4 decimal digits
        return F.round(F.col(c) * 10000).cast("long")

    lq, lx, ld, lt = (
        fx4("l_quantity"),
        fx4("l_extendedprice"),
        fx4("l_discount"),
        fx4("l_tax"),
    )
    M6 = F.lit(1000000)
    M12 = F.lit(1000000000000)

    def idiv(col, m):
        # Integer div via double division + truncation. Exact while the
        # numerator is < 2^53 (every use below is bounded <= ~2*10^13):
        # the true fractional part is >= 1/m >> a double ulp there, so
        # rounding can never cross an integer boundary.
        return (col / m).cast("long")

    p8 = lx * (F.lit(10000) - ld)  # disc_price, fixed-point scale 8, <= 10^13
    # charge = p8 * (1+tax) at scale 12 would exceed 2^53 per row, so
    # slice p8 BEFORE the tax multiply: p8 = a*10^6 + b, then
    # charge = a*t*10^6 + b*t with a*t <= 2*10^11 and b*t <= 2*10^10 —
    # every per-row intermediate stays well under 2^53.
    t = F.lit(10000) + lt
    ch_mid_part = idiv(p8, M6) * t  # units of 10^6 (scale-12 fixed point)
    ch_lo_part = (p8 % M6) * t  # units of 1

    def dec(c):  # slice-sum -> exact decimal
        return F.col(c).cast("decimal(38,0)")

    total8 = dec("dp_hi") * M6 + dec("dp_lo")
    total12 = (
        dec("ch_hh") * M12 + (dec("ch_hl") + dec("ch_lh")) * M6 + dec("ch_ll")
    )
    dbl4 = lambda c: (dec(c) / 10000).cast("double")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= ts_ntz("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(lq).alias("sq"),
            F.sum(idiv(lx, M6)).alias("bp_hi"),
            F.sum(lx % M6).alias("bp_lo"),
            F.sum(idiv(p8, M6)).alias("dp_hi"),
            F.sum(p8 % M6).alias("dp_lo"),
            F.sum(idiv(ch_mid_part, M6)).alias("ch_hh"),
            F.sum(ch_mid_part % M6).alias("ch_hl"),
            F.sum(idiv(ch_lo_part, M6)).alias("ch_lh"),
            F.sum(ch_lo_part % M6).alias("ch_ll"),
            F.sum(ld).alias("sd"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            dbl4("sq").alias("sum_qty"),
            ((dec("bp_hi") * M6 + dec("bp_lo")) / 10000)
            .cast("double")
            .alias("sum_base_price"),
            F.round(total8 / 100000000, 4).cast("double").alias("sum_disc_price"),
            F.round(total12 / M12, 4).cast("double").alias("sum_charge"),
            (dbl4("sq") / F.col("count_order")).alias("avg_qty"),
            (
                ((dec("bp_hi") * M6 + dec("bp_lo")) / 10000).cast("double")
                / F.col("count_order")
            ).alias("avg_price"),
            (dbl4("sd") / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
    )


@register(
    "global_stats",
    tags=("B7",),
    oracle="""
        SELECT count(*)                               AS n_rows,
               count(DISTINCT l_orderkey)             AS n_orders,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(10,4))) AS DOUBLE) AS total_price,
               min(l_extendedprice)                   AS min_price,
               max(l_extendedprice)                   AS max_price,
               CAST(sum(CAST(l_quantity AS DECIMAL(10,4))) AS DOUBLE) / count(*) AS avg_qty
        FROM lineitem
    """,
)
def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-dataset counters ([MRDP ch.2] counters / [MR04 §4.5]).

    No grouping: Catalyst plans a single-row partial/final aggregate;
    count(DISTINCT) is planned as expand + two-phase agg, still fully
    distributed. min/max are raw column values (bit-identical by scan).
    """
    li = tbl(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_extendedprice").alias("total_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg("l_quantity").alias("avg_qty"),
    )


@register(
    "table_profile_documents",
    tags=("B7", "B2", "C5"),
    oracle="""
        SELECT count(*)                                        AS n_rows,
               count(DISTINCT lang)                            AS n_langs,
               count(DISTINCT source)                          AS n_sources,
               CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)                                 AS null_texts,
               min(n_chars)                                    AS min_chars,
               max(n_chars)                                    AS max_chars,
               CAST(sum(n_chars) AS BIGINT)                    AS total_chars,
               CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
               CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        FROM documents
    """,
)
def table_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile of the corpus table (B7/C5): the audit a
    pipeline runs on FIRST CONTACT with a new data drop — row count,
    key-column cardinalities, null census, and the value/byte ranges
    that size downstream batch and truncation decisions. One single-
    row partial/final aggregate (distincts plan as expand + two-phase
    agg), fully distributed, no sampling — the exact profile, not an
    estimate. Integer widths pinned to BIGINT on both engines (the
    skew_audit HUGEINT lesson)."""
    docs = tbl(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min(F.octet_length("text")).cast("long").alias("min_bytes"),
        F.max(F.octet_length("text")).cast("long").alias("max_bytes"),
    )


@register(
    "group_medians",
    tags=("B4",),
    oracle="""
        SELECT l_returnflag,
               round(median(l_quantity), 2)                  AS med_qty,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               sqrt((CAST(round(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                              * CAST(l_extendedprice AS DECIMAL(19,4))), 0) AS DOUBLE)
                     - CAST(sum(CAST(l_extendedprice AS DECIMAL(10,4))) AS DOUBLE)
                       * CAST(sum(CAST(l_extendedprice AS DECIMAL(10,4))) AS DOUBLE) / count(*))
                    / (count(*) - 1))                        AS sd_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def group_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holistic aggregates (median / exact percentile / stddev) per group.

    The reference would need the full value list per key in one reducer
    ([MRDP ch.2] median pattern); Spark's `percentile` is a typed
    aggregate that still runs partial/final without materializing the
    group as a Python list. Stddev is reformulated over exact decimal
    sums (sum, sum-of-squares) so both engines evaluate the identical
    IEEE expression — engine-internal stddev accumulation orders differ.
    """
    li = tbl(spark, sf_dir, "lineitem")
    p = dec4("l_extendedprice")
    s1 = F.sum(p).cast("double")
    # sum-of-squares totals are ~1e12 even at tiny sf, so the scale-4
    # unscaled value exceeds 2^53 and the engines' decimal->double casts
    # diverge; integer-round the exact decimal first (identical op both
    # sides, error 0.5 in 1e12 -> invisible in sd)
    s2 = F.round(F.sum(p * p), 0).cast("double")
    n = F.count(F.lit(1))
    sd = F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1)))
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 2).alias("med_qty"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
        sd.alias("sd_price"),
    )


@register(
    "wordcount",
    tags=("B5", "A1", "A2", "A3"),
    oracle="""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
        ORDER BY cnt DESC, word
        LIMIT 20
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical MapReduce demo ([MR04 §2.1]) as explode + count.

    map = explode(split(...)), shuffle = groupBy, reduce = count, with
    the combiner planned automatically. Top-20 carries a (cnt desc,
    word asc) total order so the limit is deterministic on both sides.
    """
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(words(F.lower("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


@register(
    "inverted_index",
    tags=("B6",),
    oracle="""
        SELECT term,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
               count(*) AS df
        FROM (
            SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term, doc_id
            FROM documents
        )
        WHERE term <> ''
        GROUP BY term
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term -> sorted posting list ([MRDP ch.2] inverted index).

    One of the few operators where per-group materialization is the
    semantics (the posting list IS the output), so collect_set is
    justified; posting lists are rendered as comma-joined text for a
    representation-stable value hash.

    Size-adaptive: above ``scale_form_threshold()`` docs the default
    name switches to a two-level aggregation that range-shards
    doc_ids first — each stage-1 buffer holds (and SORTS) at most
    1/16th of a hot term's postings, and the final pass only
    concatenates the 16 pre-sorted shard strings in shard order
    (range shards, not hash, so the concat IS the global doc_id
    order). Output stays bitwise-identical; the inherently list-sized
    final row is the caller's own asked-for output, not an
    aggregation buffer doing O(list log list) work. The sharded
    OUTPUT contract (one row per term-shard, the Lucene/ES layout) is
    ``inverted_index_sharded``."""
    docs = tbl(spark, sf_dir, "documents")
    postings = (
        docs.select(F.explode(words(F.lower("text"))).alias("term"), "doc_id")
        .filter(F.col("term") != "")
        .distinct()
    )
    if table_rows(docs, sf_dir, "documents") <= scale_form_threshold():
        return postings.groupBy("term").agg(
            F.array_join(
                F.sort_array(F.collect_set("doc_id")).cast("array<string>"), ","
            ).alias("doc_ids"),
            F.count("*").alias("df"),
        )
    # big-n path: range-shard, aggregate per shard, merge in shard order
    hi = docs.agg(F.max("doc_id")).collect()[0][0] or 0  # 1-row metadata job
    width = max(1, (int(hi) + 16) // 16)
    shards = (
        postings.groupBy("term", F.floor(F.col("doc_id") / width).alias("shard"))
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("doc_id")).cast("array<string>"), ","
            ).alias("s"),
            F.count("*").alias("n"),
        )
    )
    return shards.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("shard", "s"))),
                lambda x: x["s"],
            ),
            ",",
        ).alias("doc_ids"),
        F.sum("n").alias("df"),
    )


@register(
    "distinct_agg",
    tags=("B37",),
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*)                AS n_events,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (B37) on the events table."""
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


@register("approx_distinct", tags=("B37",), oracle=None)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (rows-only: estimates differ across
    engines by design; the pytest suite asserts the estimate is within
    rsd of the exact count)."""
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@register(
    "inverted_index_sharded",
    tags=("B6",),
    oracle="""
        SELECT term,
               doc_id % 16 AS shard,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
               count(*) AS df_shard
        FROM (
            SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term, doc_id
            FROM documents
        )
        WHERE term <> ''
        GROUP BY term, doc_id % 16
    """,
)
def inverted_index_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded inverted index — ``inverted_index``'s 100 TB form (B6).

    The plain index materializes each term's full posting list in ONE
    aggregation buffer row; a stopword's list at web scale is billions
    of doc ids in a single buffer on a single task — the aggregation
    twin of the unsplittable window partition. Production indexes
    shard the posting space: grouping by (term, doc_id % 16) bounds
    every buffer at 1/16th of the worst list and spreads a hot term
    over 16 tasks; readers merge shards (already id-sorted) with a
    streaming k-way concat, and the shard count is the scale dial —
    at 10^9-doc corpora you size it so term-shard lists fit a buffer,
    exactly how Lucene/ES segment posting data. Same one-shuffle
    partial-agg plan shape as the plain index."""
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(words(F.lower("text"))).alias("term"), "doc_id")
        .filter(F.col("term") != "")
        .distinct()
        .groupBy("term", (F.col("doc_id") % 16).alias("shard"))
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("doc_id")).cast("array<string>"), ","
            ).alias("doc_ids"),
            F.count("*").alias("df_shard"),
        )
    )


@register(
    "ols_by_group",
    tags=("B2", "B31", "B19"),
    oracle="""
        WITH j AS (
            SELECT n.n_name,
                   CAST(l.l_quantity AS DECIMAL(10,0))      AS x,
                   CAST(l.l_extendedprice AS DECIMAL(12,2)) AS y
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
        ), a AS (
            SELECT n_name,
                   CAST(count(*) AS BIGINT)    AS n_obs,
                   CAST(count(*) AS DOUBLE)    AS nd,
                   CAST(sum(x) AS DOUBLE)      AS sx,
                   CAST(sum(y) AS DOUBLE)      AS sy,
                   CAST(sum(x * x) AS DOUBLE)  AS sxx,
                   CAST(sum(x * y) AS DOUBLE)  AS sxy
            FROM j GROUP BY n_name
        )
        SELECT n_name AS nation, n_obs,
               (nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope,
               (sy - ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)) * sx) / nd
                   AS intercept
        FROM a
    """,
)
def ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form linear regression (price-on-quantity per
    supplier nation) — the "analytics as aggregation" pattern: simple
    OLS needs only the five sufficient statistics (n, Σx, Σy, Σx²,
    Σxy), each a map-side-combinable sum, so a regression over 10^12
    rows is ONE partial-agg shuffle of five numbers per group — no
    solver, no second pass, no driver math.

    Cross-engine determinism: a double Σxy is accumulation-order-
    dependent, so the moments are summed in exact DECIMAL and cast to
    double ONCE; slope/intercept are then a fixed chain of IEEE ops
    written identically in both engines — bitwise-equal outputs, the
    pagerank/clustering-coefficient policy. The moments are carried at
    their TRUE scales (quantity is integral, price 2-decimal in every
    fixture — verified across sf0.001/0.01/0.1), not the blanket
    DECIMAL(10,4): at scale 8 the Σxy scaled integer passes 2^53 by
    sf0.01, and DuckDB's decimal→double converts via
    double(hugeint)/10^scale — TWO roundings — where Spark's
    BigDecimal.doubleValue rounds once, a 1-ULP cross-engine trap.
    True-scale sums keep every scaled integer exactly representable.
    Dims broadcast."""
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    # Moments accumulate as SCALED LONGS (the corr_by_group treatment,
    # SCALE.md r9): Spark's decimal multiply+sum path measured 4.3 s
    # vs DuckDB's 0.34 s at sf10; long sums stay in whole-stage
    # codegen (measured 1.6 s after the swap). Exactness envelope is
    # UNCHANGED: bitwise parity of either form requires the scaled
    # integer sum < 2^53 (the decimal form's hugeint/10^s cast has the
    # identical constraint), and Σ(x·100y) per nation stays under it
    # past sf50 — same bound, 3x less work.
    x = F.col("l_quantity").cast("decimal(10,0)").cast("long")
    y100 = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
    agg = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(x).alias("_sx"),
            F.sum(y100).alias("_sy100"),
            F.sum(x * x).alias("_sxx"),
            F.sum(x * y100).alias("_sxy100"),
        )
    )
    nd = F.col("n_obs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy100").cast("double") / F.lit(100.0)
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy100").cast("double") / F.lit(100.0)
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return agg.select(
        F.col("n_name").alias("nation"),
        "n_obs",
        slope.alias("slope"),
        ((sy - slope * sx) / nd).alias("intercept"),
    )


@register("hll_rollup_merge", tags=("B37", "B36"), oracle=None)
def hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (B37 at warehouse scale): per-day HLL
    sketches of distinct users per event type, UNIONED up to the
    event-type level with ``hll_union_agg`` — the pattern that makes
    100 TB distinct-counting incremental: daily partitions each
    pre-aggregate once into a few-KB Datasketches HLL blob, and any
    coarser rollup (weekly, all-time, cross-type) is a cheap sketch
    union over the tiny sketch table, never a re-scan of raw events.
    Emits the merged estimate plus the day count it folded.

    Rows-only: DuckDB's approx_count_distinct is a different HLL
    implementation (different hashing, different estimator), so no
    cross-engine oracle exists. Property-tested instead on the two
    facts that matter: (1) MERGE EXACTNESS — the estimate from the
    unioned daily sketches equals the estimate from one direct sketch
    over all rows (sketch union is lossless by construction); (2) the
    estimate lands within the published HLL error envelope of the
    exact distinct count."""
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        )
        .select("event_type", "n_days", "est_users")
    )


@register(
    "corr_by_group",
    tags=("B2", "B31", "B3"),
    oracle="""
        WITH t AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(l_quantity AS DECIMAL(10,0)) AS x,
                   CAST(l_discount AS DECIMAL(4,2))  AS y,
                   CAST(l_tax      AS DECIMAL(4,2))  AS z
            FROM lineitem
        ), a AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT)   AS n_obs,
                   CAST(count(*) AS DOUBLE)   AS nd,
                   CAST(sum(x) AS DOUBLE)     AS sx,
                   CAST(sum(y) AS DOUBLE)     AS sy,
                   CAST(sum(z) AS DOUBLE)     AS sz,
                   CAST(sum(x * x) AS DOUBLE) AS sxx,
                   CAST(sum(y * y) AS DOUBLE) AS syy,
                   CAST(sum(z * z) AS DOUBLE) AS szz,
                   CAST(sum(x * y) AS DOUBLE) AS sxy,
                   CAST(sum(x * z) AS DOUBLE) AS sxz,
                   CAST(sum(y * z) AS DOUBLE) AS syz
            FROM t GROUP BY 1, 2
        )
        SELECT l_returnflag, l_linestatus, n_obs,
               (nd * sxy - sx * sy)
                   / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))
                   AS corr_qty_disc,
               (nd * sxz - sx * sz)
                   / sqrt((nd * sxx - sx * sx) * (nd * szz - sz * sz))
                   AS corr_qty_tax,
               (nd * syz - sy * sz)
                   / sqrt((nd * syy - sy * sy) * (nd * szz - sz * sz))
                   AS corr_disc_tax
        FROM a
    """,
)
def corr_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation MATRIX (quantity / discount / tax
    by return flag + line status) from sufficient statistics: the ten
    moments (n, Σx, Σy, Σz, Σx², Σy², Σz², Σxy, Σxz, Σyz) are each a
    map-side-combinable sum, so the full 3×3 matrix over 10^12 rows is
    ONE partial-agg shuffle of ten numbers per group — never a
    per-pair pass, never `corr()` (whose one-pass update order is
    engine-specific and non-deterministic under parallel fold).

    Cross-engine determinism (the ols_by_group policy): moments are
    summed in exact DECIMAL at their TRUE fixture scales and cast to
    double ONCE, then each correlation is the identical IEEE chain
    (n·Sxy − SxSy) / sqrt((n·Sxx − Sx²)(n·Syy − Sy²)) — sqrt is
    correctly-rounded by IEEE-754, so equal inputs give bitwise-equal
    outputs. Column choice is deliberate: quantity(0)/discount(2)/
    tax(2) keep every scaled-integer sum far below 2^53 at any
    realistic scale (worst case Σxy ≈ n·5·10² — exact past sf1000),
    where an extendedprice² moment would silently pass 2^53 by sf0.01
    and hit DuckDB's double(hugeint)/10^scale two-rounding trap."""
    li = tbl(spark, sf_dir, "lineitem")
    # Moments accumulate as SCALED LONGS, not decimals: Spark's
    # decimal multiply+sum path measured 13x slower than DuckDB's
    # hugeint at sf10 (16.2 vs 1.2 s; SCALE.md r9) — long sums stay
    # in whole-stage codegen. Exactness is unchanged: every scaled
    # product sum here is < 2^53 far past sf100, so double(long)/10^s
    # equals DuckDB's double(hugeint)/10^s bit-for-bit (one exact
    # integer widening + one identical IEEE division each).
    x = F.col("l_quantity").cast("decimal(10,0)").cast("long")
    y = (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long")
    z = (F.col("l_tax").cast("decimal(4,2)") * 100).cast("long")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(z).alias("_sz"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(z * z).alias("_szz"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * z).alias("_sxz"),
        F.sum(y * z).alias("_syz"),
    )
    nd = F.col("n_obs").cast("double")
    scale = {"x": 1.0, "y": 100.0, "z": 100.0,
             "xx": 1.0, "yy": 10_000.0, "zz": 10_000.0,
             "xy": 100.0, "xz": 100.0, "yz": 10_000.0}
    s = {c: F.col(f"_s{c}").cast("double") / F.lit(scale[c])
         if scale[c] != 1.0 else F.col(f"_s{c}").cast("double")
         for c in scale}

    def corr(ab: str, a: str, b: str):
        return (nd * s[ab] - s[a] * s[b]) / F.sqrt(
            (nd * s[a + a] - s[a] * s[a]) * (nd * s[b + b] - s[b] * s[b])
        )

    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "n_obs",
        corr("xy", "x", "y").alias("corr_qty_disc"),
        corr("xz", "x", "z").alias("corr_qty_tax"),
        corr("yz", "y", "z").alias("corr_disc_tax"),
    )
