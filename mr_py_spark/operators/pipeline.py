"""End-to-end training-data pipeline (SURVEY.md §2C capstone).

The driver-mandated extension operators composed the way a pretraining
data pipeline actually uses them: exact dedup -> near-dup collapse ->
quality filtering -> per-language token accounting — one lazy Catalyst
plan, one oracle. At 100 TB each stage is the scale-shaped variant
proven elsewhere in this package (hash-keyed dedup, LSH near-dup);
the composition structure is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import words
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


@register(
    "pipeline_clean_corpus",
    tags=("C1", "C2", "C5"),
    oracle="""
        WITH exact_dedup AS (
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        ), near_dedup AS (
            SELECT min(d.doc_id) AS doc_id
            FROM documents d JOIN exact_dedup e ON d.doc_id = e.doc_id
            GROUP BY substring(d.text, 1, 80)
        ), kept AS (
            SELECT d.doc_id, d.lang, d.text,
                   len(string_split(d.text, ' ')) AS n_words
            FROM documents d JOIN near_dedup n ON d.doc_id = n.doc_id
            WHERE len(string_split(d.text, ' ')) >= 10
              AND CAST(len(list_distinct(string_split(lower(d.text), ' '))) AS DOUBLE)
                  / len(string_split(d.text, ' ')) >= 0.3
        )
        SELECT lang,
               count(*)                                           AS n_docs,
               CAST(sum(n_words) AS BIGINT)                       AS total_tokens,
               CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS bpe_est_tokens
        FROM kept
        GROUP BY lang
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning pipeline: exact dedup (keep min doc_id per text) ->
    prefix near-dedup (collapse the planted 80-char-prefix families) ->
    quality gate (>=10 words, type-token ratio >= 0.3) -> per-language
    token budget. Everything fuses into one plan: the two dedup stages
    are semi-join-shaped survivor filters, the quality gate is a scan
    predicate over array expressions, and the final rollup is one
    shuffle on `lang`."""
    docs = tbl(spark, sf_dir, "documents")

    exact_survivors = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    after_exact = docs.join(
        exact_survivors.select("doc_id"), "doc_id", "left_semi"
    )
    near_survivors = after_exact.groupBy(F.substring("text", 1, 80)).agg(
        F.min("doc_id").alias("doc_id")
    )
    after_near = docs.join(near_survivors.select("doc_id"), "doc_id", "left_semi")

    ws = words(F.col("text"))
    wl = words(F.lower("text"))
    n_words = F.size(ws)
    ttr = F.size(F.array_distinct(wl)).cast("double") / n_words
    kept = after_near.filter((n_words >= 10) & (ttr >= 0.3)).select(
        "lang",
        n_words.cast("long").alias("n_words"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("bpe_est"),
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_tokens"),
        F.sum("bpe_est").alias("bpe_est_tokens"),
    )


def multi_sink_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the shared-scan two-sink topology (B28 job merging).

    One cached `documents` scan feeds two divergent sinks — the MRDP
    "job merging" pattern (two MR jobs over the same input collapsed
    into one input pass):

    - sink A: the cleaned corpus (length gate) — the data product;
    - sink B: per-(lang, source) accounting stats — the audit product.

    Returns ``(source, clean, stats)`` so callers (and the plan test)
    can persist the source and inspect that both sink plans read the
    in-memory relation instead of re-scanning parquet. At 100 TB the
    identical topology holds: persist to MEMORY_AND_DISK (or a
    checkpoint) and every additional sink costs its own transform +
    write but zero additional input scans.
    """
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    clean = docs.filter(F.col("n_chars") >= 200)
    stats = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
    return docs, clean, stats


@register(
    "multi_sink_corpus",
    tags=("B28", "A8"),
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clean,
               CAST(sum(CASE WHEN n_chars >= 200 THEN n_chars ELSE 0 END) AS BIGINT)
                   AS clean_chars
        FROM documents
        GROUP BY lang
    """,
)
def multi_sink_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job merging demonstrated end-to-end (B28/A8): persist the scan,
    write BOTH sinks (clean corpus + accounting stats) as real parquet
    writes from the single input pass, then answer from the sinks
    alone — n_docs comes from the stats sink, n_clean/clean_chars from
    re-reading the clean-corpus sink. The oracle computes the same
    numbers straight from `documents`, so the driver's hash check
    proves the merged two-sink pipeline lost nothing.
    """
    import os
    import tempfile

    docs, clean, stats = multi_sink_plan(spark, sf_dir)
    docs = docs.persist()
    # Per-process dir, overwritten each invocation (same convention as
    # the shipped-package zip): repeated driver calls don't accumulate.
    out = os.path.join(tempfile.gettempdir(), f"mrps_multisink_{os.getpid()}")
    try:
        clean.write.mode("overwrite").parquet(f"{out}/clean")
        stats.write.mode("overwrite").parquet(f"{out}/stats")
    finally:
        docs.unpersist()
    clean_rb = spark.read.parquet(f"{out}/clean")
    stats_rb = spark.read.parquet(f"{out}/stats")
    a = clean_rb.groupBy("lang").agg(
        F.count("*").alias("n_clean"), F.sum("n_chars").alias("clean_chars")
    )
    b = stats_rb.groupBy("lang").agg(F.sum("n_docs").alias("n_docs"))
    return b.join(a, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
        F.coalesce("clean_chars", F.lit(0)).alias("clean_chars"),
    )


@register(
    "training_pipeline_summary",
    tags=("B27", "C1", "C2", "C5", "B28"),
    oracle="""
        WITH quality AS (
            SELECT doc_id, text, lang, n_chars
            FROM (
                SELECT *, string_split(text, ' ') AS w FROM documents
            )
            WHERE len(w) >= 5
              AND 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) <= 0.55
        ),
        exact AS (
            SELECT min(doc_id) AS doc_id FROM quality GROUP BY text
        ),
        near AS (
            SELECT min(q.doc_id) AS doc_id
            FROM quality q JOIN exact e ON q.doc_id = e.doc_id
            GROUP BY substring(q.text, 1, 80)
        ),
        surv AS (
            SELECT q.doc_id, q.text, q.lang, q.n_chars
            FROM quality q JOIN near n ON q.doc_id = n.doc_id
        ),
        toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        ngr AS (
            SELECT doc_id,
                   md5(array_to_string(list_slice(w, s, s + 5), ' ')) AS ng
            FROM (SELECT doc_id, w, unnest(range(1, len(w) - 4)) AS s
                  FROM toks WHERE len(w) >= 6)
        ),
        ev AS (SELECT DISTINCT ng FROM ngr WHERE doc_id % 13 = 0),
        contaminated AS (
            SELECT DISTINCT t.doc_id
            FROM ngr t JOIN ev e ON e.ng = t.ng
            WHERE t.doc_id % 13 <> 0
        ),
        clean AS (
            SELECT s.* FROM surv s
            WHERE s.doc_id % 13 <> 0
              AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)
        )
        SELECT CASE WHEN substring(sha256(text), 1, 8) < 'fae147ae' THEN 'train'
                    WHEN substring(sha256(text), 1, 8) < 'fd70a3d7' THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM clean
        GROUP BY 1, 2
    """,
)
def training_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data pipeline as ONE declarative plan
    (B27 job chaining x C1/C2/C5): quality filter (>= 5 words, word
    dup fraction <= 0.55) -> exact dedup (min doc_id per text) ->
    prefix near-dedup (min per 80-char key) -> benchmark
    decontamination (drop eval docs and anything sharing a 6-gram
    with them — decontaminate_ngrams' exact rule) -> content-hash
    train/val/test split -> per-(split, lang) corpus accounting.
    Every stage reuses a registered operator's exact semantics, so
    this is the composition a reference user would run nightly,
    oracle-checked end to end — stage-boundary bugs (a dedup that
    drops the wrong twin, a split that moves with doc_id instead of
    content) break parity even when each stage looks fine alone.

    Scale shape: the stages compose into one Catalyst plan — the
    quality predicate rides the scan; the two dedups are keyed
    aggregations + semi-join-shaped joins on doc_id; the decontam
    eval side is benchmark-sized and broadcasts; the contaminated-id
    set anti-joins; the split is a row-local sha256. No stage
    materializes to disk, no driver-side state — the lazy-DAG
    equivalent of five chained MapReduce jobs."""
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "text", "lang", "n_chars", words("text").alias("w"))
    dup_frac = F.lit(1.0) - F.size(F.array_distinct("w")).cast("double") / F.size("w")
    quality = toks.filter((F.size("w") >= 5) & (dup_frac <= 0.55)).select(
        "doc_id", "text", "lang", "n_chars"
    )
    exact = quality.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    near = (
        quality.join(exact, "doc_id")
        .groupBy(F.substring("text", 1, 80))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv = quality.join(near, "doc_id")
    # decontaminate_ngrams' exact rule, via its own kernel — one
    # definition of the contamination join, so the stage and the
    # standalone query cannot drift (corpus_prep.contamination_hits).
    from mr_py_spark.operators.corpus_prep import contamination_hits

    contaminated = contamination_hits(docs).select("doc_id").distinct()
    clean = surv.filter(F.col("doc_id") % 13 != 0).join(
        contaminated, "doc_id", "left_anti"
    )
    bucket = F.substring(F.sha2("text", 256), 1, 8)
    split = (
        F.when(bucket < "fae147ae", "train")
        .when(bucket < "fd70a3d7", "val")
        .otherwise("test")
    )
    return clean.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
