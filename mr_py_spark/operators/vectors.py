"""Embedding-column preparation operators (SURVEY.md §2 C3/C4
extensions): the vector-side counterparts of corpus_prep — storage
quantization and norm auditing over `array<float>` columns. All
JVM-side higher-order array expressions (transform / aggregate /
array_max): zero Python in the hot path, embarrassingly parallel,
no shuffle — the shapes that survive a 100 TB embedding store.

Float discipline (mr_py_spark/functions docstring): every compared
double here is either a single IEEE op on identically-derived inputs
(abs, x/scale, max) or an order-independent reduction (array_max,
integer sum), so DuckDB and Spark emit identical bits; no round()
below true precision anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.registry import register
from mr_py_spark.sources import tbl


def _scale() -> Column:
    """Symmetric int8 scale: max|x| / 127 (embeddings are L2-normalized,
    so max|x| > 0 and the division is well-defined)."""
    return F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    ) / F.lit(127.0)


@register(
    "emb_quantize_int8",
    tags=("C3", "C4"),
    oracle="""
        WITH q AS (
            SELECT vec_id,
                   list_max(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
                   embedding
            FROM embeddings
        )
        SELECT vec_id,
               scale,
               CAST(list_sum(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT))) AS BIGINT)
                   AS q_sum,
               md5(array_to_string(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)), ','))
                   AS q_md5,
               list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)
                             - round(CAST(x AS DOUBLE) / scale) * scale)))
                   AS max_abs_err
        FROM q
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (C3): the 4x storage /
    bandwidth reduction step of a large-scale vector store (scale =
    max|x|/127, q = round(x/scale)). Emitted as audit columns — the
    quantized-vector md5 fingerprint pins the exact codes, q_sum is an
    order-independent integer checksum, max_abs_err bounds the
    reconstruction error (and must be <= scale/2 by construction —
    property-asserted in tests). Row-local arithmetic only: at any
    corpus size this is one scan, no shuffle, no Python."""
    e = tbl(spark, sf_dir, "embeddings")
    x_over_s = lambda x: F.round(x.cast("double") / F.col("scale"))  # noqa: E731
    q_arr = F.transform(F.col("embedding"), lambda x: x_over_s(x).cast("long"))
    err = F.transform(
        F.col("embedding"),
        lambda x: F.abs(x.cast("double") - x_over_s(x) * F.col("scale")),
    )
    return e.withColumn("scale", _scale()).select(
        "vec_id",
        "scale",
        F.aggregate(q_arr, F.lit(0).cast("long"), lambda acc, v: acc + v).alias(
            "q_sum"
        ),
        F.md5(
            F.array_join(F.transform(q_arr, lambda v: v.cast("string")), ",")
        ).alias("q_md5"),
        F.array_max(err).alias("max_abs_err"),
    )


@register(
    "emb_norm_audit",
    tags=("C3", "B2"),
    oracle="""
        SELECT CAST(len(embedding) AS BIGINT) AS dim,
               count(*) AS n_vecs,
               min(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))))) AS min_peak,
               max(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))))) AS max_peak
        FROM embeddings
        GROUP BY len(embedding)
    """,
)
def emb_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-store audit (C3): dimension histogram plus the
    min/max per-vector peak magnitude — the sanity gate before any
    ANN index build (mixed dimensions or zero vectors poison IVF/LSH
    training silently). min/max of per-row maxes are order-independent
    reductions, so cross-engine bitwise-safe."""
    e = tbl(spark, sf_dir, "embeddings")
    peak = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    return (
        e.select(F.size("embedding").cast("long").alias("dim"), peak.alias("peak"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("peak").alias("min_peak"),
            F.max("peak").alias("max_peak"),
        )
    )
