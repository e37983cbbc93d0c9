"""Scalar function surface (SURVEY.md §2B: B29-B33).

The reference does all of this as ad-hoc Python inside mappers; the
Spark-native form is built-in `pyspark.sql.functions` expressions that
stay inside whole-stage codegen — no Python boundary at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4, dsum
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


@register(
    "string_fns",
    tags=("B29",),
    oracle="""
        SELECT p_partkey,
               upper(p_name)                          AS name_upper,
               split_part(p_name, ' ', 1)             AS first_word,
               length(p_name)                         AS name_len,
               concat_ws('/', p_brand, p_type)        AS brand_type,
               substring(p_name, 1, 4)                AS name_prefix,
               regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
        FROM part
    """,
)
def string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (B29): upper/split_part/length/concat_ws/
    substring/regexp_extract, all codegen'd."""
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
    )


@register(
    "date_fns",
    tags=("B30",),
    oracle="""
        SELECT year(o_orderdate)   AS y,
               month(o_orderdate)  AS m,
               count(*)            AS n_orders,
               min(day(o_orderdate))                                        AS first_day,
               max(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)) AS max_day_offset
        FROM orders
        GROUP BY 1, 2
    """,
)
def date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions (B30): extract + diff, grouped by month."""
    o = tbl(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.min(F.dayofmonth("o_orderdate")).cast("long").alias("first_day"),
        F.max(
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
            )
        ).cast("long").alias("max_day_offset"),
    )


@register(
    "math_fns",
    tags=("B31",),
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(abs(CAST(l_extendedprice AS DECIMAL(10,4)) - 1000.0) AS DOUBLE) AS abs_delta,
               round(ln(l_extendedprice), 6)           AS log_price,
               round(sqrt(l_quantity), 6)              AS sqrt_qty,
               round(pow(l_discount, 2), 6)            AS disc_sq,
               CAST(ceil(l_quantity) AS BIGINT)        AS qty_ceil,
               CAST(floor(l_quantity) AS BIGINT)       AS qty_floor,
               l_linenumber % 3                        AS line_mod
        FROM lineitem
        WHERE l_orderkey <= 1000
    """,
)
def math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (B31)."""
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(dec4("l_extendedprice") - F.lit("1000.0").cast("decimal(10,4)")).cast("double").alias("abs_delta"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
    )


@register(
    "json_fns",
    tags=("B32",),
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               count(*)             AS n,
               CAST(sum(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1
    """,
)
def json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON access (B32): `get_json_object` path
    extraction on the events.props column, grouped."""
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("long").alias("k_val")
    ).agg(
        F.count("*").alias("n"),
        dsum("value").alias("total_value"),
    )


@register(
    "array_fns",
    tags=("B32",),
    oracle="""
        SELECT vec_id,
               len(embedding)                                        AS dim,
               round(CAST(embedding[1] AS DOUBLE), 6)                AS e1,
               round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])), 6) AS sq_norm
        FROM embeddings
    """,
)
def array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array manipulation (B32): size / element access / higher-order
    fold (the dot product is zip_with + aggregate, JVM-side). Both
    engines cast float32 -> double *before* multiplying so the
    accumulation is bit-identical."""
    from mr_py_spark.functions import dot

    e = tbl(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(emb_d, 1), 6).alias("e1"),
        F.round(dot(emb_d, emb_d), 6).alias("sq_norm"),
    )


@register(
    "conditional_fns",
    tags=("B33",),
    oracle="""
        SELECT CASE WHEN value < 50 THEN 'low'
                    WHEN value < 150 THEN 'mid'
                    ELSE 'high' END                            AS value_band,
               coalesce(nullif(event_type, 'view'), '(hidden)') AS et,
               count(*)                                        AS n
        FROM events
        GROUP BY 1, 2
    """,
)
def conditional_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions (B33): when/otherwise + nullif/coalesce."""
    ev = tbl(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
    )
    et = F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("(hidden)"))
    return ev.groupBy(band.alias("value_band"), et.alias("et")).agg(
        F.count("*").alias("n")
    )


@register(
    "variant_extract_agg",
    tags=("B32", "B1"),
    oracle="""
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               count(*)   AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS k_sum,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        FROM events
        GROUP BY 1, 2
    """,
)
def variant_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured access (B32, the Spark 4 path):
    ``parse_json`` materializes events.props as a VariantType column —
    Spark's shredded binary JSON representation — and ``variant_get``
    extracts a typed path from it; the bucketed aggregate proves the
    extracted values, not the encoding.

    Why this exists next to json_fns' ``get_json_object``: at 100 TB
    the string-path form re-parses the JSON text per access, while a
    variant column parses ONCE and every subsequent access is a binary
    field lookup — the difference compounds with each extracted path,
    and parquet can store the shredded variant natively. The oracle
    extracts the same paths with DuckDB's JSON functions; only typed
    values are compared, so the engines' internal encodings are free
    to differ."""
    ev = tbl(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


@register(
    "calendar_semantics_audit",
    tags=("B30", "B1"),
    oracle="""
        SELECT quarter(o_orderdate)                       AS q,
               isodow(o_orderdate) - 1                    AS wd,
               count(*)                                   AS n_orders,
               CAST(sum(CASE WHEN o_orderdate = last_day(o_orderdate)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_month_end,
               CAST(max(day((o_orderdate + INTERVAL 1 MONTH)::DATE))
                    AS BIGINT)                             AS max_am_day,
               CAST(count(DISTINCT week(o_orderdate)) AS BIGINT) AS n_iso_weeks
        FROM orders
        GROUP BY 1, 2
    """,
)
def calendar_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function semantics pinned cross-engine (B30): the
    date-arithmetic rules migrating SQL relies on but nothing else in
    the suite observes — (1) add_months clamps month-end overflow
    (Jan 31 + 1 month = Feb 29, Spark's add_months = DuckDB's
    + INTERVAL); (2) last_day month-end detection; (3) the weekday
    NUMBERING trap: Spark weekday() is 0 = Monday, matching DuckDB's
    isodow() - 1, while dayofweek()/dow() disagree on both the anchor
    AND the range — the classic silent off-by-one in ported reports;
    (4) ISO week numbers (weekofyear = week, incl. the year-boundary
    week-52/53 wrap); (5) quarter. Aggregated per (quarter, weekday)
    so every rule must hold on every date in the fixture, widths
    pinned LONG both sides.

    Scale shape: pure row-local date expressions riding the scan into
    one small keyed aggregate — semantics are the point."""
    o = tbl(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.select(
            F.quarter(d).cast("long").alias("q"),
            F.weekday(d).cast("long").alias("wd"),
            (d == F.last_day(d)).alias("is_me"),
            F.dayofmonth(F.add_months(d, 1)).cast("long").alias("am_day"),
            F.weekofyear(d).cast("long").alias("iso_w"),
        )
        .groupBy("q", "wd")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("is_me").cast("long")).alias("n_month_end"),
            F.max("am_day").alias("max_am_day"),
            F.countDistinct("iso_w").alias("n_iso_weeks"),
        )
    )


@register(
    "string_semantics_audit",
    tags=("B29", "B1"),
    oracle="""
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(strpos(text, 'the')) AS BIGINT)        AS sum_pos,
               CAST(sum(len(string_split(text, 'e'))) AS BIGINT) AS sum_parts,
               CAST(sum(len(list_filter(string_split(text, 'e'),
                                        p -> p = ''))) AS BIGINT) AS sum_empty,
               min(md5(substring(text, -7, 7)))                 AS tail_md5,
               min(md5(lpad(substring(text, 1, 3), 8, '*')))    AS pad_md5
        FROM documents
        GROUP BY source
    """,
)
def string_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function edge semantics pinned cross-engine (B29): the
    rules that silently differ across SQL dialects, observed on every
    document — (1) NEGATIVE substring start counts from the end
    (substring(s,-7,7) = last seven chars, Spark == DuckDB; several
    dialects error or return empty); (2) split keeps EMPTY segments
    for adjacent/trailing separators (counted explicitly — engines
    that drop empties change sum_parts AND sum_empty); (3) instr/
    strpos is 1-based with 0 on miss (an off-by-one here shifts
    sum_pos by n_docs); (4) lpad TRUNCATES when the string exceeds
    the target length. Text-valued probes travel as md5 so the hash
    compares content, not representation.

    Scale shape: row-local expressions on the scan into a
    source-cardinality aggregate — semantics are the point."""
    docs = tbl(spark, sf_dir, "documents")
    sp = F.split("text", "e")
    return (
        docs.select(
            "source",
            F.instr("text", "the").cast("long").alias("pos"),
            F.size(sp).cast("long").alias("n_parts"),
            F.size(F.filter(sp, lambda p: p == "")).cast("long").alias("n_empty"),
            F.md5(F.substring("text", -7, 7)).alias("tail_md5"),
            F.md5(F.lpad(F.substring("text", 1, 3), 8, "*")).alias("pad_md5"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pos").alias("sum_pos"),
            F.sum("n_parts").alias("sum_parts"),
            F.sum("n_empty").alias("sum_empty"),
            F.min("tail_md5").alias("tail_md5"),
            F.min("pad_md5").alias("pad_md5"),
        )
    )
