"""Text-analysis operators (SURVEY.md §2C: C5).

Language ID, quality scoring, token counting, fingerprinting, TF-IDF —
each as JVM-side expressions (no Python in the hot path) with an exact
DuckDB oracle. The fixture's documents are space-joined word streams
with a `lang` ground-truth column (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mr_py_spark.functions import ngrams_arr, words
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "text_quality",
    tags=("C5",),
    oracle=f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
                                            AS chars_per_word,
               CAST(len(list_filter(string_split(lower(text), ' '),
                                    w -> w IN ({_SW_SQL}))) AS DOUBLE)
                     / len(string_split(text, ' ')) AS stopword_ratio,
               CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')) AS ttr
        FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals (C5): word count, chars-per-word,
    stopword ratio, type-token ratio — the standard cheap filters a
    pretraining pipeline applies before model-based scoring. Pure
    higher-order array expressions; one scan, no shuffle."""
    docs = tbl(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    wl = words(F.lower("text"))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_words = F.size(ws)
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        (F.length("text").cast("double") / n_words).alias("chars_per_word"),
        (
            F.size(F.filter(wl, lambda w: F.array_contains(sw, w))).cast("double")
            / n_words
        ).alias("stopword_ratio"),
        (F.size(F.array_distinct(wl)).cast("double") / n_words).alias("ttr"),
    )


@register(
    "lang_stats",
    tags=("C5",),
    oracle="""
        SELECT lang,
               count(*)                        AS n_docs,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
               count(DISTINCT source)          AS n_sources
        FROM documents
        GROUP BY lang
    """,
)
def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by language (C5)."""
    docs = tbl(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "token_count",
    tags=("C5",),
    oracle="""
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)             AS ws_tokens,
               CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS bpe_est_tokens,
               CAST(sum(n_chars) AS BIGINT)                                  AS total_chars
        FROM documents
        GROUP BY source
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per source (C5): whitespace tokens plus the
    chars/4 BPE estimate — the budget arithmetic of a training-data
    pipeline. (A real BPE count is a pandas_udf over a tokenizer lib,
    which is not in this container; the plumbing is identical.)"""
    docs = tbl(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(F.size(words(F.col("text")))).alias("ws_tokens"),
        F.sum(F.ceil(F.length("text") / 4.0).cast("long")).alias("bpe_est_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


# GPT-2-style pre-tokenizer, restricted to syntax Java regex (Spark)
# and RE2 (DuckDB) evaluate identically — no lookarounds, no \p
# classes. Counting these pre-tokens tracks real BPE counts far more
# closely than chars/4 (BPE only ever splits WITHIN a pre-token).
_BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s"


@register(
    "token_count_bpe",
    tags=("C5",),
    oracle=f"""
        SELECT source,
               CAST(sum(len(regexp_extract_all(text, '{_BPE_PRETOKEN_RE.replace("'", "''")}'))) AS BIGINT)
                   AS bpe_tokens,
               count(*) AS n_docs
        FROM documents
        GROUP BY source
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-pre-tokenizer token accounting per source (C5): counts
    GPT-2-style pre-tokens with a regex both engines run bitwise-
    identically. A real vocab-merging BPE (tiktoken/transformers, not
    in this container) would slot into the same seam as a pandas_udf
    over the text column — the aggregation shape is unchanged; this
    regex count is its deterministic, engine-portable lower bound."""
    docs = tbl(spark, sf_dir, "documents")
    n = F.size(F.regexp_extract_all("text", F.lit(_BPE_PRETOKEN_RE), F.lit(0)))
    return docs.groupBy("source").agg(
        F.sum(n).alias("bpe_tokens"), F.count("*").alias("n_docs")
    )


# Tiny per-language stopword lexicons for the heuristic language ID.
_LEX = {
    "en": ("the", "and", "of", "to", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
}


def _hits_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _LEX[lang])
    return f"len(list_filter(string_split(lower(text), ' '), w -> w IN ({lst})))"


@register(
    "lang_id_heuristic",
    tags=("C5",),
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_hits_sql('en')} AS hits_en,
                   {_hits_sql('fr')} AS hits_fr,
                   {_hits_sql('es')} AS hits_es,
                   {_hits_sql('de')} AS hits_de
            FROM documents
        )
        SELECT doc_id, lang AS lang_true,
               CASE WHEN hits_en >= greatest(hits_fr, hits_es, hits_de) THEN 'en'
                    WHEN hits_fr >= greatest(hits_es, hits_de) THEN 'fr'
                    WHEN hits_es >= hits_de THEN 'es'
                    ELSE 'de' END AS lang_pred
        FROM scored
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-lexicon language ID (C5). The argmax tie-break order
    (en > fr > es > de) is explicit and identical in the oracle, so the
    prediction is deterministic. Accuracy against the `lang` ground
    truth is asserted in pytest, not here."""
    docs = tbl(spark, sf_dir, "documents")
    wl = words(F.lower("text"))

    def hits(lang: str):
        lex = F.array(*[F.lit(w) for w in _LEX[lang]])
        return F.size(F.filter(wl, lambda w: F.array_contains(lex, w)))

    scored = docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        hits("en").alias("hits_en"),
        hits("fr").alias("hits_fr"),
        hits("es").alias("hits_es"),
        hits("de").alias("hits_de"),
    )
    pred = (
        F.when(
            F.col("hits_en") >= F.greatest("hits_fr", "hits_es", "hits_de"), "en"
        )
        .when(F.col("hits_fr") >= F.greatest("hits_es", "hits_de"), "fr")
        .when(F.col("hits_es") >= F.col("hits_de"), "es")
        .otherwise("de")
    )
    return scored.select("doc_id", "lang_true", pred.alias("lang_pred"))


@register(
    "regex_tokens",
    tags=("C5", "B29"),
    oracle="""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
               len(regexp_extract_all(text, '[0-9]+')) AS n_num_tokens
        FROM documents
    """,
)
def regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenization (C5): BPE-style pretokenizers are regex
    splits; counting alpha/numeric runs per doc via regexp_extract_all
    stays JVM-side (both engines use the same extraction semantics)."""
    docs = tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).cast("long").alias("n_alpha_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("long").alias("n_num_tokens"),
    )


@register(
    "bigram_counts",
    tags=("C5", "B5"),
    oracle="""
        SELECT bigram, count(*) AS cnt
        FROM (
            SELECT unnest(list_transform(range(1, len(w)),
                                         i -> w[i] || ' ' || w[i + 1])) AS bigram
            FROM (SELECT string_split(lower(text), ' ') AS w FROM documents)
        )
        GROUP BY bigram
        ORDER BY cnt DESC, bigram
        LIMIT 30
    """,
)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word n-gram generation + counting (C5): top-30 bigrams. The
    n-gram expansion is a pure array expression (transform over an
    index sequence) — the same construct the MinHash shingler uses —
    so no Python runs per token. The token array is materialized in
    its own projection first (see ``ngrams_arr``: an inline split
    re-tokenizes per n-gram position, O(tokens^2) per row)."""
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(words(F.lower("text")).alias("w"))
    return (
        toks.select(F.explode(ngrams_arr("w", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(30)
    )


_HH_DENOM = 800  # heavy hitter = item with cnt * _HH_DENOM >= total item count
_HH_K = 2 * _HH_DENOM  # Misra-Gries counters per partition (2x safety margin)


def heavy_hitter_candidates(items: DataFrame, col: str, k: int = _HH_K) -> DataFrame:
    """Pass 1 of the two-pass exact heavy hitters: per-partition
    Misra-Gries summaries over a single-column frame. Candidate rows
    carry the item in ``col`` (cross-partition duplicates possible —
    callers ``.distinct()``); one extra NULL-keyed sentinel row per
    partition carries the partition's item count in ``part_n``, so
    the global total N = sum(part_n) comes out of the SAME scan
    instead of a second pass over the data.

    Guarantee (unconditional, any distribution): the union of
    per-partition MG candidate sets with k counters is a superset of
    every item whose GLOBAL count > N/k. Pigeonhole: count(x) > N/k
    implies count_p(x) > N_p/k in at least one partition p, and an MG
    summary with k counters under-counts any item by at most
    N_p/(k+1) [Misra-Gries 1982; the batch-merge rule and its
    additive error bound: Agarwal et al., "Mergeable Summaries",
    PODS 2012], so x survives partition p's summary.

    Vectorized via ``mapInArrow`` (not pandas): each batch is counted
    by ``pyarrow.compute.value_counts`` — C-side, no per-row Python
    object materialization, which is what makes a full-corpus sketch
    pass affordable (the pandas formulation spent its time building
    270M Python strings at sf100) — and the Python merge loop is over
    the BATCH VOCABULARY, not rows. Eviction is the PODS'12 merge
    rule — subtract the (k+1)-th largest counter, drop non-positives.
    Output is <= numPartitions * (k+1) rows (metadata-sized at any
    corpus scale) produced with zero shuffle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def mg(batches):
        d: dict = {}
        n = 0
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index(col))
            n += len(arr)
            vc = pc.value_counts(arr)
            for item, c in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist()
            ):
                d[item] = d.get(item, 0) + c
            if len(d) > k:
                vals = np.fromiter(d.values(), dtype=np.int64, count=len(d))
                t = np.partition(vals, len(d) - k - 1)[len(d) - k - 1]
                d = {i: c - t for i, c in d.items() if c > t}
        keys = list(d.keys())
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(keys + [None], type=pa.string()),
                pa.array([0] * len(keys) + [n], type=pa.int64()),
            ],
            names=[col, "part_n"],
        )

    return items.mapInArrow(mg, f"{col} string, part_n long")


@register(
    "heavy_hitters",
    tags=("C5", "B37"),
    oracle=f"""
        WITH g AS (
            SELECT unnest(list_transform(range(1, len(w)),
                                         i -> w[i] || ' ' || w[i + 1])) AS bigram
            FROM (SELECT string_split(lower(text), ' ') AS w FROM documents)
        )
        SELECT bigram, count(*) AS cnt
        FROM g
        GROUP BY bigram
        HAVING count(*) * {_HH_DENOM} >= (SELECT count(*) FROM g)
    """,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-item mining without shuffling the long tail
    (C5/B37): every bigram occurring in at least 1/800 of all bigram
    positions, with its EXACT count — the corpus-level boilerplate /
    stock-phrase census a pretraining pipeline runs before filtering.

    Exactly two scans, the classic sketch-then-verify shape:
      1. candidates + total: ONE pass of per-partition Misra-Gries
         (``heavy_hitter_candidates``) — a provable superset of the
         true heavy hitters in <= numPartitions*(k+1) rows with the
         partition totals riding along as sentinel rows, no shuffle.
         The bounded summary is persisted so its two consumers (the
         candidate broadcast and the 1-row total N) don't re-run the
         corpus scan;
      2. verify: broadcast-semi-join the candidate set against the
         exploded bigrams, exact groupBy count of CANDIDATES ONLY,
         keep cnt * 800 >= N (integer compare, no float threshold).
    Superset + exact recount + identical threshold => the result set
    EQUALS the naive global GROUP BY ... HAVING, so a plain SQL
    oracle applies even though a sketch is involved.

    100 TB shape: a full-vocabulary groupBy shuffles the entire
    exploded token stream (the long tail dominates); here the only
    wide exchange carries candidate rows alone — the tail dies at the
    map side in the semi-join. On the driver fixture (31-word vocab)
    the sketch never evicts; eviction and the superset guarantee
    under a 20k-word zipf vocabulary are property-tested in
    tests/test_properties.py."""
    from pyspark import StorageLevel

    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(words(F.lower("text")).alias("w"))
    grams = toks.select(F.explode(ngrams_arr("w", 2)).alias("bigram"))
    summary = heavy_hitter_candidates(grams, "bigram").persist(
        StorageLevel.MEMORY_AND_DISK  # <= parts*(k+1) rows: metadata
    )
    cands = summary.filter(F.col("bigram").isNotNull()).select("bigram").distinct()
    total = summary.agg(F.sum("part_n").alias("n"))
    return (
        grams.join(F.broadcast(cands), "bigram", "left_semi")
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))  # 1-row aggregate: bounded
        .filter(F.col("cnt") * _HH_DENOM >= F.col("n"))
        .select("bigram", "cnt")
    )


@register(
    "repetition_filter",
    tags=("C5",),
    oracle="""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), b AS (
            SELECT doc_id, ws,
                   CASE WHEN len(ws) > 1
                        THEN list_transform(generate_series(1, len(ws) - 1),
                                            i -> ws[i] || ' ' || ws[i + 1])
                        ELSE [] END AS bg
            FROM w
        ), m AS (
            SELECT doc_id,
                   len(ws) AS n_words,
                   1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
                       AS dup_word_frac,
                   CASE WHEN len(bg) > 0
                        THEN CAST(list_max(list_transform(list_distinct(bg),
                                   x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)
                                   / len(bg)
                   END AS top_bigram_frac
            FROM b
        )
        SELECT doc_id, n_words, dup_word_frac, top_bigram_frac,
               (dup_word_frac <= 0.55 AND top_bigram_frac <= 0.05) AS keep
        FROM m
    """,
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filtering (C5): per-document duplicate-
    word fraction and most-frequent-bigram fraction, plus the keep
    verdict — the standard heuristics for dropping boilerplate/spam
    documents from a pretraining corpus (Rae et al. 2021 apply the
    same shape to duplicate lines and top n-grams).

    Pure higher-order array expressions: one scan, zero shuffles, no
    Python — fan-out is per-document, so the plan is embarrassingly
    parallel at any corpus size. The top-bigram count is O(L·U) per
    document (U = distinct bigrams); documents are length-bounded by
    upstream chunking, so this beats the explode + groupBy(doc_id,
    bigram) formulation, which would shuffle every bigram occurrence
    just to compute a per-doc max. Fractions are ratios of identical
    integers, so both engines perform the same IEEE division (bitwise-
    equal before the 4 dp display rounding)."""
    docs = tbl(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    n_words = F.size(ws)
    bg = F.when(
        n_words > 1,
        F.zip_with(
            F.slice(ws, 1, n_words - 1),
            F.slice(ws, 2, n_words - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    arrays = docs.select("doc_id", ws.alias("ws"), bg.alias("bg"))
    n = F.size("ws")
    dup_frac = F.lit(1.0) - F.size(F.array_distinct("ws")).cast("double") / n
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(F.col("bg")),
            lambda x: F.size(F.filter(F.col("bg"), lambda y: y == x)),
        )
    )
    top_frac = F.when(F.size("bg") > 0, top_cnt.cast("double") / F.size("bg"))
    return arrays.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        dup_frac.alias("dup_word_frac"),
        top_frac.alias("top_bigram_frac"),
    ).withColumn(
        "keep",
        (F.col("dup_word_frac") <= 0.55) & (F.col("top_bigram_frac") <= 0.05),
    )


@register(
    "doc_fingerprint",
    tags=("C5",),
    oracle="""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
                   AS bag_fingerprint
        FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint (C5): md5 of the sorted
    distinct token bag — catches shuffled/reordered copies that exact
    dedup misses. Engine-independent by construction (md5 is a spec,
    unlike xxhash seeds)."""
    docs = tbl(spark, sf_dir, "documents")
    bag = F.array_join(F.sort_array(F.array_distinct(words(F.lower("text")))), " ")
    return docs.select("doc_id", F.md5(bag).alias("bag_fingerprint"))


@register(
    "tfidf_top_terms",
    tags=("C5",),
    oracle="""
        WITH tokens AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tokens WHERE term <> '' GROUP BY doc_id, term
        ), df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tokens WHERE term <> '' GROUP BY term
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term, round(tfidf, 6) AS tfidf, rn FROM (
            SELECT tf.doc_id, tf.term,
                   tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf,
                   row_number() OVER (PARTITION BY tf.doc_id
                                      ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                                               tf.term) AS rn
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        )
        WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-3 terms per document (C5).

    tf = term count in doc; idf = ln(N/df). The df table is small
    (vocabulary-sized) and broadcast; ranking ties break on the term
    string so the top-3 boundary is deterministic. At scale: tokens is
    the only large intermediate, and both groupBys share the
    (doc_id-free vs doc_id-keyed) shuffle that any MR formulation would
    also pay."""
    docs = tbl(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(words(F.lower("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = tokens.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size joins in lazily as a broadcast 1-row frame (an eager
    # .count() here would run a full scan at plan-construction time)
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    tfidf = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf_raw"), F.asc("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", tfidf.alias("tfidf_raw"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", F.round("tfidf_raw", 6).alias("tfidf"), "rn")
    )


@register(
    "lm_perplexity_score",
    tags=("C5", "B19", "B3"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        ),
        db AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(w)),
                                         i -> w[i] || ' ' || w[i + 1])) AS bg
            FROM toks
        ),
        bgc AS (SELECT bg, count(*) AS c2 FROM db GROUP BY bg),
        ctx AS (
            SELECT split_part(bg, ' ', 1) AS t1, sum(c2) AS c1
            FROM bgc GROUP BY t1
        ),
        lm AS (
            SELECT bg,
                   CAST(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))
                        AS DECIMAL(18,9)) AS lp
            FROM bgc JOIN ctx ON split_part(bg, ' ', 1) = ctx.t1
        )
        SELECT db.doc_id,
               count(*) AS n_bigrams,
               -(CAST(sum(lm.lp) AS DOUBLE) / count(*)) AS avg_nll
        FROM db JOIN lm ON db.bg = lm.bg
        GROUP BY db.doc_id
    """,
)
def lm_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring (C5): per-document average
    negative log-likelihood under a bigram LM trained on the corpus
    itself — the CCNet/CC-style perplexity filter (low avg_nll =
    fluent/common phrasing, high = boilerplate-ish or garbled), with
    the unsmoothed MLE bigram model standing in for KenLM (every
    scored bigram exists in the training counts by construction, so no
    smoothing is needed for self-scoring).

    Bitwise-oracle-able by the repo's float policy: each token log-prob
    ln(c2/c1) is a deterministic double (identical integer counts ->
    identical IEEE division and libm ln on both engines), quantized to
    DECIMAL(18,9) BEFORE the per-document sum so the aggregation is
    exact and order-insensitive — summing raw doubles would hash-differ
    by partial-aggregation order. One cast back to double at the end.
    ASSUMPTION (not IEEE-guaranteed): JVM Math.log and DuckDB's libm
    ln agree on every ratio this corpus produces — ln is not a
    correctly-rounded operation, so a platform/libm change could
    introduce a 1-ulp disagreement that lands within rounding distance
    of a DECIMAL(18,9) half-boundary and flips lp. A dense ratio sweep
    comparing the two engines' quantized ln values
    (tests/test_properties.py::test_ln_ratio_quantization_cross_engine)
    pins this locally, so a drift is caught in the repo's suite rather
    than in the driver window.

    Scale shape: two wordcount-shaped groupBys build the LM (partial
    agg before each exchange); scoring is an equi-join of the exploded
    bigram stream against the LM table — left to Catalyst/AQE, which
    broadcasts the LM while it is small and falls back to a shuffle
    hash join on the bigram key when the vocabulary outgrows the
    broadcast threshold (at web scale distinct bigrams are ~1e8+, so
    the join MUST be able to shuffle — nothing here pins a broadcast).
    Final per-doc groupBy carries (doc_id, decimal) pairs only."""
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words(F.lower("text")).alias("w"))
    db = toks.select("doc_id", F.explode(ngrams_arr("w", 2)).alias("bg"))
    bgc = db.groupBy("bg").agg(F.count("*").alias("c2"))
    ctx = (
        bgc.groupBy(F.split("bg", " ")[0].alias("t1"))
        .agg(F.sum("c2").alias("c1"))
    )
    lm = bgc.join(ctx, F.split(bgc.bg, " ")[0] == ctx.t1).select(
        "bg",
        F.log(F.col("c2").cast("double") / F.col("c1").cast("double"))
        .cast("decimal(18,9)")
        .alias("lp"),
    )
    return (
        db.join(lm, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (-(F.sum("lp").cast("double") / F.count("*"))).alias("avg_nll"),
        )
    )


#: Fixed retrieval query set for ``bm25_retrieval`` — fixture-vocabulary
#: multi-word queries, constant so both engines rank the same workload.
_BM25_QUERIES = (
    (0, "hash join merge"),
    (1, "window sort order"),
    (2, "stream batch query"),
    (3, "vector scan column"),
    (4, "customer table filter"),
)
_BM25_VALUES = ", ".join(f"({i}, '{q}')" for i, q in _BM25_QUERIES)


@register(
    "bm25_retrieval",
    tags=("C5", "B11", "B19"),
    oracle=f"""
        WITH q(query_id, qtext) AS (VALUES {_BM25_VALUES}),
        tok AS (
            SELECT doc_id, term FROM (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                FROM documents
            ) WHERE term <> ''
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
            FROM dl
        ),
        qt AS (
            SELECT DISTINCT query_id, term FROM (
                SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q
            )
        ),
        scored AS (
            SELECT qt.query_id, tf.doc_id,
                   CAST(ln(1.0e0 + (stats.n_docs - dfreq.df + 0.5e0)
                                   / (dfreq.df + 0.5e0))
                        * ((tf.tf * 2.2e0)
                           / (tf.tf + 1.2e0 * (0.25e0 + (0.75e0 * dl.dl)
                                                        / stats.avgdl)))
                        AS DECIMAL(18,9)) AS s
            FROM qt
            JOIN tf ON qt.term = tf.term
            JOIN dfreq ON qt.term = dfreq.term
            JOIN dl ON tf.doc_id = dl.doc_id, stats
        ),
        agg AS (
            SELECT query_id, doc_id, sum(s) AS ssum
            FROM scored GROUP BY query_id, doc_id
        )
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
               CAST(ssum AS DOUBLE) AS score, rn
        FROM (
            SELECT query_id, doc_id, ssum,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY ssum DESC, doc_id) AS rn
            FROM agg
        ) WHERE rn <= 10
    """,
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (C5/B11): top-10 documents per query for a
    fixed multi-word query set, Lucene-variant BM25
    (idf = ln(1 + (N-df+0.5)/(df+0.5)), k1=1.2, b=0.75) over
    whitespace tokens — the missing classic next to the inverted index
    and TF-IDF: score a QUERY against the corpus, not a doc against
    its own terms.

    Bitwise-oracle-able by the house float policy (the
    lm_perplexity_score discipline): every per-term partial score is a
    deterministic double — integer-derived inputs, both engines
    evaluating the IDENTICAL expression tree (double literals spelled
    0.5e0-style in the oracle so DuckDB doesn't parse them as
    DECIMAL), with the one libm ln pinned by the existing
    cross-engine ln sweep — quantized to DECIMAL(18,9) BEFORE the
    per-(query, doc) sum so aggregation is exact and order-insensitive;
    ranking compares the exact decimal (ties on doc_id) and the double
    cast happens once at emit.

    Scale shape: tf/dl/df are wordcount-shaped groupBys (partial agg
    before each exchange); the query-term table is bounded and
    broadcast; corpus stats ride the 1-row broadcast-crossJoin glue
    (the tfidf_top_terms precedent, exempt class); the per-query top-10
    is a window over the (query_id, doc_id) aggregate whose partitions
    are query-count-bounded. Nothing pins a broadcast on the tf join —
    at web scale AQE shuffles it on term."""
    docs = tbl(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        list(_BM25_QUERIES), "query_id long, qtext string"
    )
    tok = docs.select(
        "doc_id", F.explode(words(F.lower("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    qt = queries.select(
        "query_id", F.explode(F.split("qtext", " ")).alias("term")
    ).distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfc = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + (F.lit(0.75) * F.col("dl")) / F.col("avgdl"))
    )
    scored = (
        F.broadcast(qt)
        .join(tf, "term")
        .join(dfreq, "term")  # vocabulary-sized: AQE picks the strategy
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (idf * tfc).cast("decimal(18,9)").alias("s"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(F.sum("s").alias("ssum"))
    w = W.partitionBy("query_id").orderBy(F.desc("ssum"), F.asc("doc_id"))
    return (
        agg.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 10)
        .select(
            "query_id", "doc_id", F.col("ssum").cast("double").alias("score"),
            "rn",
        )
    )
