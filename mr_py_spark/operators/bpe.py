"""Byte-pair-encoding merge learning (SURVEY.md §2C: C5 — tokenizer
training, the step between a cleaned corpus and `token_count_bpe`-style
tokenization).

Classic Sennrich-style BPE over word types: a word is a char sequence
plus an end-of-word marker; each round counts all adjacent symbol
pairs weighted by word frequency, merges the most frequent pair
(lexical tie-break, so the result is deterministic on any engine or
partitioning), and rewrites the vocabulary. The learned merge list IS
the tokenizer.

Scale design: the corpus is touched ONCE (a wordcount); every
iteration afterwards runs over the DISTINCT-WORD vocabulary table,
which is orders of magnitude smaller than the corpus (heaps' law) and
shrinks further as merges fuse symbols. Per round: one vocab-sized
pair explode + groupBy (partial-agg'd), one 1-row
TakeOrderedAndProject collect (the argmax — bounded metadata, same
exemption class as the 1-row global-stats collect), and one JVM-side
fold that applies the merge left-to-right with a carry accumulator —
no Python in the loop, no driver materialization of the vocabulary.
localCheckpoint every few rounds truncates the growing lineage the
same way connected_components does.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from mr_py_spark.functions import words
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl

#: Number of merges to learn in the registered query.
_N_MERGES = 20
#: End-of-word marker (Sennrich 2016's `</w>`).
_EOW = "</w>"
#: Lineage-truncation cadence for the iterated vocab rewrites.
_CHECKPOINT_EVERY = 5


def word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq) over the lowered corpus — the ONE corpus-sized job."""
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(words(F.lower("text"))).alias("word"))
        .filter(F.col("word") != "")  # split artifacts carry no signal
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_vocab(freqs: DataFrame) -> DataFrame:
    """word -> symbol sequence: its characters plus the end marker."""
    return freqs.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(_EOW))
        ).alias("seq"),
    )


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """Explode each sequence's adjacent symbol pairs, freq-weighted.
    `zip_with(seq, tail(seq))` pairs position i with i+1; the final
    zipped slot (tail exhausted -> y IS NULL) is dropped by the
    filter."""
    pairs = F.zip_with(
        F.col("seq"),
        F.slice(F.col("seq"), 2, F.greatest(F.size("seq") - 1, F.lit(1))),
        lambda x, y: F.struct(x.alias("left"), y.alias("right")),
    )
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .filter(F.col("p.right").isNotNull())
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every sequence, fusing adjacent (left, right) into one
    symbol — a single JVM-side left-to-right fold with a carry slot
    (BPE applies a merge in one non-overlapping greedy pass, which is
    exactly what carry semantics give: 'a a a' under (a,a) becomes
    ['aa','a'], never ['a','aa'])."""
    merged = left + right

    def step(acc, x):
        hit = acc["carry"].eqNullSafe(F.lit(left)) & (x == F.lit(right))
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(F.lit(merged))))
            .when(
                acc["carry"].isNotNull(),
                F.concat(acc["out"], F.array(acc["carry"])),
            )
            .otherwise(acc["out"])
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(x).alias("carry"),
        )

    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )
    folded = F.aggregate(
        F.col("seq"),
        zero,
        step,
        lambda acc: F.when(
            acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
        ).otherwise(acc["out"]),
    )
    return vocab.select("freq", folded.alias("seq"))


def learn_bpe(
    spark: SparkSession, freqs: DataFrame, n_merges: int = _N_MERGES
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) frame.
    Returns [(left, right, pair_count), ...] in merge order. Stops
    early when the best remaining pair occurs only once (merging
    hapax pairs learns noise)."""
    vocab = _initial_vocab(freqs)
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            _adjacent_pairs(vocab)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].pair_count < 2:
            break
        left, right, cnt = top[0].left, top[0].right, int(top[0].pair_count)
        merges.append((left, right, cnt))
        vocab = _apply_merge(vocab, left, right)
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            # same lineage-truncation rationale as connected_components:
            # each round nests another fold expression; checkpointing
            # keeps plan size (and optimizer time) flat in n_merges
            vocab = vocab.localCheckpoint(eager=True)
    return merges


# Training is deterministic per fixture dir, so the two registered BPE
# queries share one run when invoked in the same process (the driver
# window runs both). Bounded: one short merge list per sf_dir.
_MERGE_CACHE: dict[str, list[tuple[str, str, int]]] = {}


def _merges_for(spark: SparkSession, sf_dir: str) -> list[tuple[str, str, int]]:
    if sf_dir not in _MERGE_CACHE:
        _MERGE_CACHE[sf_dir] = learn_bpe(spark, word_freqs(spark, sf_dir))
    return _MERGE_CACHE[sf_dir]


@register("bpe_learn_merges", tags=("C5", "B5"), oracle=None)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the corpus' first 20 BPE merges (C5): the tokenizer-
    TRAINING step of a pretraining data pipeline, as an iterative
    DataFrame algorithm — corpus touched once (wordcount), then every
    round runs on the bounded distinct-word vocabulary (pair explode +
    partial-agg'd groupBy + 1-row argmax collect + JVM-side fold
    rewrite). Deterministic by construction (freq-then-lexical
    tie-break), so the merge list is reproducible on any engine or
    cluster width — the same corpus-versioning requirement as the
    hash-based samplers.

    Rows-only: the iterative fixpoint is not single-statement SQL.
    Correctness is pinned by an independent pure-Python BPE
    reimplementation on the same word counts
    (tests/test_properties.py — oracle-by-reimplementation) plus a
    hand-computed micro-corpus case."""
    ms = _merges_for(spark, sf_dir)
    return spark.createDataFrame(
        [
            (i + 1, left, right, left + right, cnt)
            for i, (left, right, cnt) in enumerate(ms)
        ],
        "rank long, left string, right string, merged string, pair_count long",
    )


def apply_bpe(seq: list, merges: list) -> list:
    """Tokenize one symbol sequence by applying the learned merges in
    rank order (each as one left-to-right greedy pass — the same
    semantics training used, so training segmentations reproduce)."""
    for a, b in merges:
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


@register("bpe_token_stats", tags=("C5", "B5"), oracle=None)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-APPLY (C5): learn the corpus' BPE merges, tokenize
    under the learned vocab, and emit the top-30 tokens by corpus
    occurrence — the end-to-end tokenizer loop of a pretraining
    pipeline. The apply step tokenizes the DISTINCT-WORD table, not
    the corpus (token counts = per-word token multiset x word
    frequency), so the Python merge loop runs once per vocabulary
    type — the same Heaps'-law bound as training; the corpus is
    touched only by the shared wordcount. Per-batch memoization makes
    repeated types free. Deterministic (inherits the learner's
    tie-break + count-desc/token-asc output order), rows-only
    (iterative); pinned against the reference reimplementation's
    tokenization in tests/test_properties.py."""
    freqs = word_freqs(spark, sf_dir)
    merges = [(left, right) for left, right, _ in _merges_for(spark, sf_dir)]

    @pandas_udf("array<string>")
    def tokenize(word: pd.Series) -> pd.Series:
        memo: dict = {}

        def tok(w):
            if w not in memo:
                memo[w] = apply_bpe(list(w) + [_EOW], merges)
            return memo[w]

        return word.map(tok)

    return (
        freqs.select("freq", F.explode(tokenize("word")).alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(30)
    )
