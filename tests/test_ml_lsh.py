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


def test_ivf_recall_on_zipf_cluster_corpus(spark):
    """IVF recall on a NON-DEGENERATE corpus (verdict r6: the fixture's
    replicated vectors inflate recall to 1.0 and hid the probe-fraction
    decay that round 6 fixed). 50k vectors in 200 zipf-sized clusters,
    no duplicates, fixed seeds; nprobe is the production nlist/4
    formula — this test fails if the probed fraction ever decays with
    corpus size again (recall collapses toward the cluster-mass of a
    few buckets) while passing on the current constant-fraction
    design."""
    import numpy as np
    import pandas as pd

    from mr_py_spark.operators.similarity import _ivf_topk_core

    rng = np.random.RandomState(17)
    n, dim, n_clusters = 50_000, 64, 200
    # zipf-sized clusters: a few huge, a long small tail (power law)
    w = 1.0 / np.arange(1, n_clusters + 1) ** 1.1
    sizes = np.maximum(1, (n * w / w.sum()).astype(int))
    sizes[0] += n - sizes.sum()  # exact total
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    m = np.vstack(
        [
            centers[i] + 0.25 * rng.standard_normal((s, dim))
            for i, s in enumerate(sizes)
        ]
    )
    m /= np.linalg.norm(m, axis=1, keepdims=True)

    pdf = pd.DataFrame({"vec_id": np.arange(n), "v": list(map(list, m))})
    e = spark.createDataFrame(pdf)
    n_q = 50
    q = spark.createDataFrame(
        pdf.iloc[:n_q].rename(columns={"vec_id": "q_id", "v": "qv"})
    )
    approx = {
        (r.q_id, r.nn_id)
        for r in _ivf_topk_core(spark, e, q, n_hint=n).collect()
    }

    sims = m[:n_q] @ m.T
    sims[np.arange(n_q), np.arange(n_q)] = -np.inf
    brute = {
        (qi, int(ni))
        for qi in range(n_q)
        for ni in np.argsort(-sims[qi], kind="stable")[:5]
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.8, f"zipf-corpus IVF recall@5 {recall:.3f}"


def test_ivfpq_recall_on_zipf_cluster_corpus(spark):
    """IVFPQ (bucketed candidates + ADC scoring + exact re-rank) must
    hold recall close to plain IVF on the same non-degenerate corpus:
    the PQ stage may only cost recall that the exact re-rank of the
    ADC top-20 cannot repair. Corpus/queries/seeds identical to
    test_ivf_recall_on_zipf_cluster_corpus."""
    import numpy as np
    import pandas as pd

    from mr_py_spark.operators.similarity import _ivfpq_topk_core

    rng = np.random.RandomState(17)
    n, dim, n_clusters = 50_000, 64, 200
    w = 1.0 / np.arange(1, n_clusters + 1) ** 1.1
    sizes = np.maximum(1, (n * w / w.sum()).astype(int))
    sizes[0] += n - sizes.sum()
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    m = np.vstack(
        [
            centers[i] + 0.25 * rng.standard_normal((s, dim))
            for i, s in enumerate(sizes)
        ]
    )
    m /= np.linalg.norm(m, axis=1, keepdims=True)

    pdf = pd.DataFrame({"vec_id": np.arange(n), "v": list(map(list, m))})
    e = spark.createDataFrame(pdf)
    n_q = 50
    q = spark.createDataFrame(
        pdf.iloc[:n_q].rename(columns={"vec_id": "q_id", "v": "qv"})
    )
    approx = {
        (r.q_id, r.nn_id)
        for r in _ivfpq_topk_core(spark, e, q, n_hint=n).collect()
    }

    sims = m[:n_q] @ m.T
    sims[np.arange(n_q), np.arange(n_q)] = -np.inf
    brute = {
        (qi, int(ni))
        for qi in range(n_q)
        for ni in np.argsort(-sims[qi], kind="stable")[:5]
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.75, f"zipf-corpus IVFPQ recall@5 {recall:.3f}"
