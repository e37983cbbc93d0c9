"""Training-corpus preparation operators (SURVEY.md §2C: C5 extensions).

The mechanical steps between a cleaned corpus and a training run:
window chunking, PII redaction, mixture weighting, deterministic
stratified sampling, and sequence packing. All deterministic — the
sampling and packing decisions are hash- and order-based, never RNG-
based, so the same corpus always yields the same training set on any
engine, partitioning, or cluster size (reproducibility is a hard
requirement for training-data pipelines).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mr_py_spark.functions import ngrams_arr, words
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl

# Window chunking: 64-token windows every 48 tokens (16-token overlap),
# the context-window slicing step of a pretraining tokenizer pipeline.
_CHUNK = 64
_STRIDE = 48


@register(
    "doc_chunks",
    tags=("C5",),
    oracle=f"""
        WITH ch AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        SELECT doc_id,
               s AS chunk_start,
               CAST(len(list_slice(w, s, s + {_CHUNK - 1})) AS BIGINT) AS n_tokens,
               md5(array_to_string(list_slice(w, s, s + {_CHUNK - 1}), ' ')) AS chunk_md5
        FROM (SELECT doc_id, w,
                     unnest(range(1, len(w) + 1, {_STRIDE})) AS s
              FROM ch)
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping window chunking (C5): each document becomes
    64-token windows on a 48-token stride — the slicing a tokenizer
    pipeline performs before packing. Pure scan + generate: the chunk
    starts are a per-row `sequence` exploded in place, so there is NO
    shuffle and the fan-out per row is n_tokens/stride — the plan is a
    single embarrassingly-parallel stage at any corpus size. Chunk
    text is emitted as md5 (the compare stays row-shaped; a real
    pipeline would write the tokens)."""
    docs = tbl(spark, sf_dir, "documents")
    w = words(F.col("text"))
    starts = F.sequence(F.lit(1), F.size(w), F.lit(_STRIDE))
    chunk = F.slice(F.col("w"), F.col("s"), _CHUNK)
    return (
        docs.select("doc_id", w.alias("w"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.col("s").cast("long").alias("chunk_start"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


# Java-regex == RE2 subset (no lookarounds, no \p classes) so both
# engines match identically; Spark regexp_replace is replace-all,
# DuckDB needs the explicit 'g' flag.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@register(
    "pii_scrub",
    tags=("C5", "B29"),
    oracle=f"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                        || '@example.com, tel +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
                       AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
               md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
        FROM aug
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (C5): email/phone patterns replaced with typed
    placeholders, plus per-doc redaction counts for audit. The fixture
    has no planted PII, so both sides append a deterministic synthetic
    contact line keyed on doc_id — the redaction then provably fires
    on every row. JVM-side regexp only; one scan, no shuffle."""
    docs = tbl(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com, tel +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PHONE_RE),
        F.lit("<PHONE>"),
    )
    return docs.select("doc_id", aug.alias("t")).select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "domain_mix_weights",
    tags=("C5", "B2"),
    oracle="""
        WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
             t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total, count(*) AS k FROM s)
        SELECT s.source, s.n_docs,
               s.n_docs / t.total            AS actual_frac,
               t.total / (t.k * s.n_docs)    AS mix_weight
        FROM s, t
    """,
)
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting (C5): per-source sampling weight that
    rebalances the corpus to a uniform target mix (weight = target
    share / actual share). The per-source counts aggregate in one
    shuffle; the totals frame is one row and broadcasts. No rounding:
    both weights are single IEEE divisions of exact integers, which
    every engine computes bit-identically (the float policy only bars
    order-dependent accumulations)."""
    docs = tbl(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    totals = counts.agg(
        F.sum("n_docs").cast("double").alias("total"),
        F.count("*").alias("k"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        (F.col("n_docs") / F.col("total")).alias("actual_frac"),
        (F.col("total") / (F.col("k") * F.col("n_docs"))).alias("mix_weight"),
    )


# Per-language keep thresholds on the first hex char of md5(doc_id):
# '8' keeps 8/16 of docs, '4' keeps 4/16, '2' keeps 2/16. md5 is a
# spec, so the SAME rows are kept on any engine — unlike RNG-based
# Bernoulli sampling, whose reproducibility is engine/partitioning-
# dependent (the seeded-RNG variant is `sampling` + its property test).
_LANG_KEEP = {"en": "8", "fr": "4", "es": "4"}
_DEFAULT_KEEP = "2"


@register(
    "stratified_sample_hash",
    tags=("C5", "B12"),
    oracle=f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <
              CASE lang
                  {" ".join(f"WHEN '{lang}' THEN '{th}'" for lang, th in _LANG_KEEP.items())}
                  ELSE '{_DEFAULT_KEEP}'
              END
    """,
)
def stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (C5/B12): per-language keep
    rates (en 1/2, fr+es 1/4, rest 1/8) decided by a hash of the doc
    id, not an RNG — the exact row set is reproducible across engines,
    runs, and repartitioning, which is what a training-data pipeline
    needs for corpus versioning. Pure scan predicate; 16ths granularity
    comes from one hex char (extend the prefix for finer rates)."""
    docs = tbl(spark, sf_dir, "documents")
    threshold = F.col("lang")
    expr = None
    for lang, th in _LANG_KEEP.items():
        cond = F.when(threshold == lang, F.lit(th))
        expr = cond if expr is None else expr.when(threshold == lang, F.lit(th))
    keep = expr.otherwise(F.lit(_DEFAULT_KEEP))
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.filter(h < keep).select("doc_id", "lang", "source")


# Benchmark decontamination: 6-gram overlap against the eval set
# (docs with doc_id % 13 == 0 stand in for a held-out benchmark —
# the fixture's ~4% planted near-duplicates guarantee real hits).
_DECON_N = 6
_DECON_MOD = 13


def contamination_hits(docs: DataFrame) -> DataFrame:
    """(doc_id, ng) pairs where a TRAIN document (doc_id % _DECON_MOD
    != 0) shares an md5'd 6-gram with the eval set (doc_id % _DECON_MOD
    == 0) — the shared kernel of ``decontaminate_ngrams`` and the
    decontamination stage of ``training_pipeline_summary`` (one
    definition, so the two registered queries cannot drift). The eval
    side is DISTINCT n-grams only — benchmark-sized at any corpus
    scale, so the join broadcasts and the train side never shuffles."""
    w = words(F.col("text"))
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("w")) - (_DECON_N - 1)),
        lambda s: F.md5(F.array_join(F.slice(F.col("w"), s, _DECON_N), " ")),
    )
    base = (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= _DECON_N)
        .select("doc_id", F.explode(ngrams).alias("ng"))
    )
    ev = base.filter(F.col("doc_id") % _DECON_MOD == 0).select("ng").distinct()
    tr = base.filter(F.col("doc_id") % _DECON_MOD != 0)
    return tr.join(F.broadcast(ev), "ng")


@register(
    "decontaminate_ngrams",
    tags=("C5", "C2", "B20"),
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        ngr AS (
            SELECT doc_id,
                   md5(array_to_string(list_slice(w, s, s + {_DECON_N - 1}), ' ')) AS ng
            FROM (SELECT doc_id, w, unnest(range(1, len(w) - {_DECON_N - 2})) AS s
                  FROM toks WHERE len(w) >= {_DECON_N})
        ),
        ev AS (SELECT DISTINCT ng FROM ngr WHERE doc_id % {_DECON_MOD} = 0),
        tr AS (SELECT * FROM ngr WHERE doc_id % {_DECON_MOD} <> 0)
        SELECT t.doc_id, count(DISTINCT t.ng) AS n_contaminated_ngrams
        FROM tr t JOIN ev e ON e.ng = t.ng
        GROUP BY t.doc_id
    """,
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (C5/C2): flag training documents that
    share any 6-gram with the held-out eval set — the overlap check a
    training pipeline runs against its benchmark suites before a run.
    N-grams are md5-hashed in place (32-byte join keys instead of raw
    text); candidate generation is ``contamination_hits`` (broadcast
    eval side, zero train-side shuffle), finished by one
    partial-aggregated count."""
    return (
        contamination_hits(tbl(spark, sf_dir, "documents"))
        .groupBy("doc_id")
        .agg(F.count_distinct("ng").alias("n_contaminated_ngrams"))
    )


# Sequence packing: greedy next-fit into a fixed token budget.
_PACK_BUDGET = 512
_PACK_BUCKETS = 8


@register("seq_packing", tags=("C5", "B39"), oracle=None)
def seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (C5): greedily packs documents into training
    sequences of <= 512 whitespace tokens (next-fit in doc_id order) —
    the step that turns a document corpus into fixed-length samples.

    Scale shape: packing is inherently sequential WITHIN a pack, so
    the corpus is split into (lang, hash-bucket) groups and packed
    independently per group via applyInPandas — one shuffle, then
    each group's greedy scan is a single in-memory pass. Bucket count
    scales with the cluster (here 8); determinism is preserved because
    the bucket hash and the in-group doc_id order are data-, not
    partitioning-, dependent. Rows-only by design: the greedy
    recurrence (pack boundary depends on the running fill) has no
    closed SQL form; tests/test_properties.py asserts every doc is
    packed exactly once, no pack exceeds the budget (unless a single
    oversized doc), pack ids are dense, and two runs agree row-for-row.
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq: list[int] = []
        cur, fill = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > _PACK_BUDGET:
                cur += 1
                fill = 0
            fill += t
            seq.append(cur)
        pdf["pack_seq"] = pd.Series(seq, dtype="int64")
        return pdf

    docs = tbl(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        F.pmod(F.xxhash64("doc_id"), F.lit(_PACK_BUCKETS)).cast("int").alias("bucket"),
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return base.groupBy("lang", "bucket").applyInPandas(
        pack, "doc_id long, lang string, bucket int, n_tokens long, pack_seq long"
    )


@register(
    "boilerplate_ngrams",
    tags=("C5", "C2"),
    oracle="""
        WITH grams AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(generate_series(1, len(ws) - 2),
                          i -> array_to_string(ws[i:i+2], ' '))) AS g
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
                  FROM documents)
        ), freq AS (
            SELECT g FROM grams GROUP BY g HAVING count(*) >= 5
        ), tot AS (
            SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
        ), hits AS (
            SELECT doc_id, count(*) AS n_common
            FROM grams JOIN freq USING (g) GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_grams,
               coalesce(h.n_common, 0) AS n_common,
               CAST(coalesce(h.n_common, 0) AS DOUBLE) / t.n_grams
                   AS boilerplate_frac
        FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (C5/C2, CCNet-style): for
    each document, the fraction of its distinct word trigrams that
    occur in >= 5 documents corpus-wide — headers, footers, templates,
    and licence blocks score high and get stripped or down-weighted
    before training.

    Scale shape: groupBy + join-back, NOT a gram-partitioned window.
    Document frequency is `grams.groupBy("g").count()` — partial
    aggregation folds each task's occurrences of a gram before the
    exchange, so a ubiquitous gram ("all rights reserved" in a large
    fraction of billions of docs) ships one partial row per task, never
    a single multi-billion-row partition. The >=5 survivors then
    re-annotate the gram stream via a LEFT equi-join on g: the probe
    side of a skewed key is splittable (AQE skew-join splits stream
    partitions; the build side holds exactly one row per gram), whereas
    a `count() over (partition by g)` window pins every occurrence of
    the hot gram into ONE task — WindowExec partitions cannot be split,
    the straggler/spill scale-killer verdict r5 flagged. The price is a
    second corpus scan (the gram subtree feeds both the count and the
    join); two linear scans beat one unsplittable sort at 100 TB, and
    the zipf-skew A/B in SCALE.md measures the crossover. A doc_id
    aggregate then folds total and common counts per document. The
    fraction is a ratio of identical integers, so both engines perform
    the same IEEE division before the 4 dp display rounding (plan
    pinned in tests/test_plans.py).

    Short documents: a doc with < 3 words has no trigram;
    ``ngrams_arr`` guards this (unguarded, ``F.sequence(1, size-2)``
    would produce a DESCENDING sequence and ``element_at`` would
    throw INVALID_ARRAY_INDEX) by yielding an empty array, which
    ``explode`` drops — matching the oracle, whose generate_series
    returns empty and silently drops such docs. The token array is
    materialized in its own projection (see ``ngrams_arr``'s
    O(tokens^2) warning)."""
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words(F.lower("text")).alias("w"))
    grams = toks.select(
        "doc_id", F.explode(F.array_distinct(ngrams_arr("w", 3))).alias("g")
    )
    common = (
        grams.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 5)
        .select("g", F.lit(1).alias("is_common"))
    )
    per_doc = (
        grams.join(common, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("is_common"), F.lit(0))).alias("n_common"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_common",
        (F.col("n_common").cast("double") / F.col("n_grams")).alias(
            "boilerplate_frac"
        ),
    )


# Content-hash split thresholds: 8 lowercase hex chars are uniform in
# [0, 16^8); a fixed-width lexicographic compare equals the numeric
# compare, so both engines draw the identical boundary with zero
# int-conversion (DuckDB cannot cast a hex substring to int directly).
# int(0.98 * 16**8) = 0xfae147ae, int(0.99 * 16**8) = 0xfd70a3d7.
_SPLIT_TRAIN = "fae147ae"  # < this: train (98%)
_SPLIT_VAL = "fd70a3d7"  # < this: val (1%); else test (1%)


@register(
    "corpus_split",
    tags=("C5", "B12"),
    oracle=f"""
        SELECT doc_id,
               CASE WHEN substring(sha256(text), 1, 8) < '{_SPLIT_TRAIN}'
                         THEN 'train'
                    WHEN substring(sha256(text), 1, 8) < '{_SPLIT_VAL}'
                         THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-stable train/val/test split (C5/B12):
    98/1/1 assigned by the first 8 hex chars of sha256(text) against
    fixed thresholds. Keying on CONTENT rather than doc_id makes the
    split leakage-proof by construction — byte-identical duplicates
    (and re-crawls that reassign ids) always land in the same split,
    so no test document can have a training-set twin; combine with
    near-dedup upstream for fuzzy leakage. Hash-based, never RNG: the
    assignment is reproducible across engines, runs, partitioning,
    and cluster width, which corpus versioning requires.

    Scale shape: shuffle-free scan + project — one embarrassingly
    parallel stage at any corpus size; the split column is a pure
    row-local expression, so it pushes into the same whole-stage
    codegen span as the scan and costs one sha256 per row."""
    docs = tbl(spark, sf_dir, "documents")
    bucket = F.substring(F.sha2(F.col("text"), 256), 1, 8)
    return docs.select(
        "doc_id",
        F.when(bucket < _SPLIT_TRAIN, "train")
        .when(bucket < _SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "split_leakage_audit",
    tags=("C5", "C1"),
    oracle=f"""
        WITH naive AS (
            SELECT md5(array_to_string(
                       list_slice(string_split(text, ' '), 1, 8), ' '))
                       AS prefix_md5,
                   CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             < '{_SPLIT_TRAIN}' THEN 'train'
                        WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             < '{_SPLIT_VAL}' THEN 'val'
                        ELSE 'test' END AS split_naive
            FROM documents
        )
        SELECT prefix_md5,
               count(*) AS n_copies,
               CAST(count(DISTINCT split_naive) AS BIGINT) AS n_splits
        FROM naive
        GROUP BY prefix_md5
        HAVING count(*) > 1
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit (C5/C1): under a NAIVE id-keyed split
    (hash of doc_id, the obvious-but-wrong implementation), find every
    group of near-duplicate candidates — documents sharing an 8-word
    prefix fingerprint, the same blocking key ``dedup_prefix`` uses —
    and report each group's split spread under that naive
    assignment. A group with ``n_splits > 1`` is a test document with
    a training-set near-twin — eval contamination; emitting the full
    multi-copy census (not only the leaking rows) keeps the result
    non-degenerate at small fixture scale, where a 98/1/1 split makes
    straddles rare. ``corpus_split`` keys on sha256(text) precisely so
    EXACT duplicates can never straddle a split (property-tested in
    tests/test_properties.py with planted duplicates); near-dup
    leakage additionally needs near-dedup (``dedup_minhash``) upstream
    of the split, which this audit quantifies the need for.

    Scale shape: one groupBy on a 32-char fingerprint with partial
    aggregation; the distinct-split count per group is bounded by 3
    and prefix-group sizes by the corpus near-dup rate — no skew
    hazard, no window, no join."""
    docs = tbl(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    naive = docs.select(
        F.md5(
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8))
        ).alias("prefix_md5"),
        F.when(bucket < _SPLIT_TRAIN, "train")
        .when(bucket < _SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split_naive"),
    )
    return (
        naive.groupBy("prefix_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("split_naive").alias("n_splits"),
        )
        .filter(F.col("n_copies") > 1)
    )


# Deterministic pseudo-uniform from doc_id for the weighted sampler:
# one glibc-constant LCG step. Cross-engine portable because it is
# pure int64 arithmetic (no engine hash function involved); at real
# corpus scale swap in any 64-bit mix (e.g. splitmix64) expressible in
# both engines — the sampler only needs u ~ Uniform(0, 1] per row.
# doc_id is reduced mod 2^31 BEFORE the multiply: the raw product
# overflows int64 at doc_id >~ 8.4e9, where Spark wraps silently
# (negative % -> ln(NaN)) while DuckDB raises — the engines would
# diverge instead of degrading together. (2^31-1) * _LCG_A ~ 2.4e18
# stays inside int64 on both.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31


@register(
    "weighted_sample_topk",
    tags=("C5", "B12", "B11"),
    oracle=f"""
        SELECT doc_id, source, n_chars
        FROM (
            SELECT doc_id, source, n_chars,
                   ln(((((doc_id % {_LCG_M}) * {_LCG_A} + {_LCG_C}) % {_LCG_M}) + 1)
                      / {_LCG_M + 1}.0) / n_chars AS k
            FROM documents
        )
        ORDER BY k DESC, doc_id
        LIMIT 100
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (C5/B12):
    Efraimidis-Spirakis A-ES. Each document draws a deterministic
    pseudo-uniform u from its id (LCG step, pure int64 arithmetic so
    both engines compute the identical double) and is keyed by
    ln(u)/w with weight w = n_chars; the global top-k by key IS an
    exact weighted sample without replacement (Efraimidis & Spirakis,
    IPL 2006: P(select) proportional to w, sequentially without
    replacement). Quality-weighted corpus subsampling — mixture
    reweighting, pilot-set selection — reduces to exactly this with w
    = any positive per-doc score.

    Hash-derived u, never RNG: the sample is reproducible across
    engines, runs, and cluster width (same requirement as
    ``corpus_split``; contrast ``sample_seeded``, which demonstrates
    Spark's partition-seeded native sampler and is rows-only for that
    reason — this form is the oracle-checkable one).

    Scale shape: scan -> row-local key expression ->
    TakeOrderedAndProject (plan-asserted): each task keeps its local
    top-k heap and the driver merges num_partitions * k rows — no
    global sort, no shuffle, O(k) memory at any corpus size. ln(u)/w
    (monotone transform of u^(1/w)) keeps the key finite and avoids
    pow() underflow at large w."""
    docs = tbl(spark, sf_dir, "documents")
    u = (
        (
            ((F.col("doc_id") % F.lit(_LCG_M)) * F.lit(_LCG_A) + F.lit(_LCG_C))
            % F.lit(_LCG_M)
        )
        + F.lit(1)
    ).cast("double") / F.lit(float(_LCG_M + 1))
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "source", "n_chars")
    )


# Knuth's multiplicative-hash constant: the per-doc shuffle key that
# decides WHICH documents survive a domain cap. Same portability and
# overflow-guard arguments as the LCG above (doc_id reduced mod 2^31
# first: (2^31-1) * 2654435761 ~ 5.7e18 < int64 max; the raw product
# wraps at doc_id >~ 3.5e9).
_CAP_MULT = 2654435761
_CAP_MOD = 4294967296  # 2^32
_DOMAIN_CAP = 5


@register(
    "domain_cap",
    tags=("C5", "B34", "B11"),
    oracle=f"""
        SELECT doc_id, source, rn
        FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY ((doc_id % 2147483648) * {_CAP_MULT}) % {_CAP_MOD}, doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= {_DOMAIN_CAP}
    """,
)
def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (C5): keep at most K documents per
    source, chosen by a deterministic hash order — the standard
    web-corpus guard against any single domain dominating the training
    mixture (and the building block for per-domain quotas in mixture
    balancing). Hash-ordered rather than "first K seen" so the kept
    set is a uniform-at-random-looking, reproducible sample of each
    domain, independent of ingest order and partitioning.

    Scale shape: one hash shuffle on source, and Spark's
    WindowGroupLimit (plan-asserted in tests/test_plans.py) pushes a
    partial top-K below the exchange — each map task ships at most K
    rows per domain, so the shuffle carries O(domains * K) rows, not
    the corpus, and a mega-domain costs its map tasks K rows each
    instead of one unsplittable sort task."""
    docs = tbl(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % F.lit(_LCG_M)) * F.lit(_CAP_MULT)) % F.lit(_CAP_MOD)
    w = W.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", h.alias("h"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .select("doc_id", "source", "rn")
    )


@register(
    "length_decile_mix",
    tags=("B34", "B16", "B1", "C5"),
    oracle="""
        WITH scored AS (
            SELECT source,
                   ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
            FROM documents
        )
        SELECT CAST(decile AS BIGINT) AS decile, source,
               count(*) AS n_docs
        FROM scored
        GROUP BY 1, 2
    """,
)
def length_decile_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-bin mix report (C5 curation x B34/B16): documents cut
    into GLOBAL length deciles, cross-tabulated against source — the
    table a curation pipeline reads to see which sources dominate the
    long/short tails before reweighting. The global ntile(10) is
    computed by ``global_ntile`` (two-pass range-partition rank — see
    its docstring), NOT an unpartitioned window: corpus-wide decile
    assignment at 10^9 documents cannot hinge on one sort task.
    Deciles use SQL's ceil-first-tiles rule with a doc_id tie-break,
    so assignment is total and both engines agree bitwise."""
    from mr_py_spark.operators.windows import global_ntile

    docs = tbl(spark, sf_dir, "documents")
    deciles = global_ntile(
        spark,
        docs.select("doc_id", "n_chars"),
        "doc_id",
        [F.col("n_chars").desc(), F.col("doc_id")],
        n_tiles=10,
        tile_col="decile",
    )
    return (
        docs.select("doc_id", "source")
        .join(deciles, "doc_id")
        .groupBy("decile", "source")
        .agg(F.count("*").alias("n_docs"))
    )


#: Acceptance-threshold granularity for temperature_sampling: 16^5
#: (five hex chars of md5), giving ~1e-6 rate resolution.
_TEMP_GRAN = 16**5


@register(
    "temperature_sampling",
    tags=("C5", "B12", "B2"),
    oracle=f"""
        WITH s AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        m AS (SELECT min(n_docs) AS n_min FROM s),
        r AS (SELECT s.lang, s.n_docs,
                     sqrt(CAST(m.n_min AS DOUBLE) / s.n_docs) AS keep_rate,
                     CAST(floor(sqrt(CAST(m.n_min AS DOUBLE) / s.n_docs)
                                * {_TEMP_GRAN}) AS BIGINT) AS t
              FROM s, m),
        k AS (SELECT d.lang, count(*) AS n_kept
              FROM documents d JOIN r ON d.lang = r.lang
              WHERE r.t >= {_TEMP_GRAN}
                 OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 5)
                    < printf('%05x', r.t)
              GROUP BY d.lang)
        SELECT r.lang, r.n_docs, r.keep_rate,
               coalesce(k.n_kept, 0) AS n_kept
        FROM r LEFT JOIN k ON r.lang = k.lang
    """,
)
def temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (C5/B12) — the standard
    training-data rebalancing move: sample stratum d with probability
    proportional to n_d^alpha (alpha = 0.5 here), i.e. per-doc keep
    rate sqrt(n_min / n_d), so the rarest stratum keeps everything and
    head strata are subsampled toward the tempered mix (no
    upsampling). Keyed on LANGUAGE (the fixture's source column is
    uniform by construction; lang is skewed ~3:1, so the subsampling
    branch genuinely exercises). Output is the per-stratum audit row a
    pipeline logs: (lang, n_docs, keep_rate, n_kept).

    Cross-engine exactness: alpha = 0.5 is deliberate — sqrt is
    REQUIRED to be correctly rounded by IEEE 754 (unlike pow), so
    sqrt(one exact division of exact longs) is bit-identical on both
    engines; the acceptance threshold floor(rate * 16^5) is then an
    exact integer, rendered as five lowercase hex chars
    (format_string/printf '%05x') and compared against an md5 prefix
    — the stratified_sample_hash determinism argument with continuous
    rates. rate >= 1 (the min domain) bypasses the string compare:
    its 6-char threshold would sort BELOW 5-char hex strings.

    Scale shape: per-domain counts in one partial-agg'd shuffle; the
    min is a 1-row broadcast (CLAUDE.md bounded-aggregate class); the
    rate table is |domains| rows and broadcasts into the acceptance
    scan; kept counts are a second scan + one keyed shuffle. No data-
    sized collect, no RNG (reproducible across engines, runs, and
    repartitioning — corpus versioning needs the exact row set)."""
    docs = tbl(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    m = s.agg(F.min("n_docs").alias("n_min"))
    r = s.crossJoin(F.broadcast(m)).select(
        "lang",
        "n_docs",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_docs")).alias("keep_rate"),
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_docs"))
            * F.lit(_TEMP_GRAN)
        ).cast("long").alias("t"),
    )
    accept = (F.col("t") >= F.lit(_TEMP_GRAN)) | (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5)
        < F.format_string("%05x", F.col("t"))
    )
    k = (
        docs.join(F.broadcast(r), "lang")
        .filter(accept)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        r.join(k, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "keep_rate",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )
