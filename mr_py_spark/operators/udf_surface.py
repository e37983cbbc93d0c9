"""User-function surface (SURVEY.md §2: B38-B40, A1-A9 demo).

Arbitrary user Python is the whole point of the reference engine; the
Spark-native discipline is: Arrow-vectorized pandas_udf for scalar
fns, GROUPED_AGG pandas_udf for custom aggregates, applyInPandas for
whole-group transforms, mapInPandas for per-partition batch logic.
Every query here is deliberately *also* SQL-expressible so the DuckDB
oracle proves the Python path computes exactly what it claims.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from mr_py_spark import mr_compat
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


@register(
    "pandas_udf_scalar",
    tags=("B38",),
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' '))                                  AS n_words,
               CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_word
        FROM documents
    """,
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (B38): word count + chars-per-word
    computed in pandas over Arrow batches; the oracle recomputes both
    in SQL, proving the Python path exact."""

    @pandas_udf("long")
    def n_words(text: pd.Series) -> pd.Series:
        return text.str.split(" ").str.len().astype("int64")

    docs = tbl(spark, sf_dir, "documents")
    out = docs.select("doc_id", n_words("text").alias("n_words"), F.length("text").alias("n_chars"))
    return out.select(
        "doc_id",
        "n_words",
        (F.col("n_chars").cast("double") / F.col("n_words")).alias("chars_per_word"),
    )


@register(
    "grouped_agg_udf",
    tags=("B39",),
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(abs(CAST(value AS DECIMAL(10,4)) - 100) AS DECIMAL(12,4)))
                    AS DOUBLE) / count(*) AS mad_from_100
        FROM events
        GROUP BY event_type
    """,
)
def grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as GROUPED_AGG pandas_udf (B39): mean absolute
    deviation from 100, per group. The UDAF gets the group's values as
    one pandas Series (partial aggregation does not apply to opaque
    UDAFs — use native aggs when the function is algebraic).

    Bitwise-exactness inside arbitrary Python: values are exact
    4-decimal, so the UDAF accumulates |v-100| as scaled int64 cents4
    and performs the identical final division the oracle's
    decimal-sum/count does — float summation order never appears.
    """

    @pandas_udf("double")
    def mad100(v: pd.Series) -> float:
        scaled = (v * 10_000).round().astype("int64")
        total = int((scaled - 1_000_000).abs().sum())
        return (total / 10_000) / len(v)

    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(mad100("value").alias("mad_from_100"))


@register(
    "apply_in_pandas",
    tags=("B39", "A3"),
    oracle="""
        SELECT user_id,
               count(*)                            AS n,
               round(max(value) - min(value), 4)   AS value_range
        FROM events
        GROUP BY user_id
    """,
)
def apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-group transform via applyInPandas (B39/UDTF-shape): the
    reducer sees the entire group as a pandas frame — the MR reduce
    phase, Arrow-batched."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(pdf)],
                "value_range": [round(pdf["value"].max() - pdf["value"].min(), 4)],
            }
        )

    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy("user_id").applyInPandas(
        per_user, "user_id long, n long, value_range double"
    )


@register(
    "map_in_pandas",
    tags=("B40",),
    oracle="""
        SELECT event_id, round(value * 2, 4) AS doubled
        FROM events
        WHERE event_type = 'purchase'
    """,
)
def map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition batch iterator (B40): setup-once-per-partition
    semantics (the MR 'load a model in the mapper' pattern)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition setup would go here (runs once per partition)
        for pdf in batches:
            hit = pdf[pdf["event_type"] == "purchase"]
            yield pd.DataFrame(
                {"event_id": hit["event_id"], "doubled": (hit["value"] * 2).round(4)}
            )

    ev = tbl(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.mapInPandas(run, "event_id long, doubled double")


@register(
    "udtf_word_sample",
    tags=("B38", "B40"),
    oracle="""
        WITH sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        SELECT doc_id, i - 1 AS word_idx, w[i] AS word
        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1, 25)) AS i FROM sp)
    """,
)
def udtf_word_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user table function (B38/B40): a UDTF that emits every
    25th token of each document with its index — one input row, many
    output rows, applied via a LATERAL correlated call in SQL. Arrow-
    optimized (`useArrow=True`) so batches cross the Python boundary
    columnar, not row-at-a-time; the oracle recomputes the stride walk
    as a pure list expression, proving the Python path exact."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word_idx long, word string", useArrow=True)
    class WordSampler:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                if i % 25 == 0:
                    yield i, tok

    spark.udtf.register("word_sampler", WordSampler)
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.word_idx, s.word "
        "FROM _udtf_docs d, LATERAL word_sampler(d.text) s"
    )


@register(
    "mr_wordcount",
    tags=("A1", "A2", "A3", "A9", "B38", "B39"),
    oracle="""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
    """,
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical job, run through the mr_compat veneer:
    a literal ``mapper(record) -> (word, 1)`` and
    ``reducer(word, counts) -> (word, sum)`` pair (SURVEY.md §3 EP1),
    executed as mapInPandas -> groupBy -> applyInPandas. The oracle is
    plain SQL wordcount — the veneer must agree exactly with the
    declarative engine."""

    def mapper(rec):
        for w in rec["text"].lower().split(" "):
            if w:
                yield (w, 1)

    def reducer(word, counts):
        yield (word, sum(counts))

    docs = tbl(spark, sf_dir, "documents").select("text")
    return mr_compat.mapreduce(
        docs,
        mapper,
        reducer,
        map_schema="word string, one long",
        out_schema="word string, cnt long",
        key_cols=("word",),
    )
