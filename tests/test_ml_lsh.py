"""spark.ml MinHashLSH cross-validation (SURVEY.md §2 C2 lists
ml.feature.MinHashLSH as the library path): the hand-rolled LSH in
operators/dedup.py and the MLlib implementation must both recall the
fixture's planted near-duplicates. Exercises the ml Pipeline surface
(Tokenizer -> CountVectorizer -> MinHashLSH -> approxSimilarityJoin).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_py_spark.sources import tbl
from tests.conftest import SF_DIR
from tests.test_properties import _planted_pairs


def test_mllib_minhash_lsh_recalls_planted_dups(spark):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, RegexTokenizer

    docs = tbl(spark, SF_DIR, "documents").select("doc_id", "text")
    tok = RegexTokenizer(inputCol="text", outputCol="tokens", pattern=" ")
    tokens = tok.transform(docs)
    cv = CountVectorizer(inputCol="tokens", outputCol="features", binary=True).fit(tokens)
    feats = cv.transform(tokens)

    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.6, distCol="jaccard_dist")
    found = {
        (r.a, r.b)
        for r in pairs.select(
            F.col("datasetA.doc_id").alias("a"), F.col("datasetB.doc_id").alias("b")
        ).filter(F.col("a") < F.col("b")).collect()
    }

    planted = _planted_pairs(spark)
    recall = len(planted & found) / len(planted)
    assert recall >= 0.8, f"MLlib MinHashLSH recall {recall:.2f}"
