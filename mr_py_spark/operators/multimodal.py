"""Multimodal column handling (SURVEY.md §2C: C4).

Design: media (image/audio/video) are opaque `binary` payload columns
with a typed metadata struct alongside — they join, group, filter, and
partition like any other column; only decode/feature steps touch the
bytes, via Arrow-batched `mapInPandas`. No media libs exist in this
container (TESTDATA has no binary fixture either), so the payload here
is derived deterministically from documents.text and the decode step
is an explicitly-marked deterministic stub — the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is the real,
tested part.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.registry import register
from mr_py_spark.sources import tbl

#: Schema contract for a multimodal table: payload + typed metadata.
BLOB_SCHEMA = "doc_id long, media_type string, payload binary, meta struct<n_bytes: long, lang: string>"


def blob_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the multimodal fixture: text bytes as the opaque payload."""
    docs = tbl(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("application/x-fake-media").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


@register(
    "blob_metadata",
    tags=("C4",),
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS payload_bytes,
               md5(text)                  AS payload_md5,
               lang                       AS meta_lang
        FROM documents
    """,
)
def blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload accounting (C4): byte length + content digest +
    metadata projection — all JVM-side; the payload is never decoded.
    Oracle recomputes the digest from the identical bytes."""
    blobs = blob_table(spark, sf_dir)
    return blobs.select(
        "doc_id",
        F.col("meta.n_bytes").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.lang").alias("meta_lang"),
    )


def decode_media(payload: bytes) -> dict:
    """STUB decode step. A real deployment decodes image/audio here
    (PIL / torchaudio / ffmpeg are not in this container). The stub is
    deterministic in the payload bytes so the pipeline around it is
    testable: 'width'/'height' derive from the first bytes, 'n_frames'
    from the length."""
    if not payload:
        raise NotImplementedError("empty payload; real decoder not available in this container")
    return {
        "width": 64 + payload[0] % 64,
        "height": 64 + payload[-1] % 64,
        "n_frames": 1 + len(payload) // 256,
    }


@register("media_features", tags=("C4",), oracle=None)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas
    (C4). Rows-only (the decoder is a stub); pytest pins the schema,
    determinism, and batch shape. The structure — iterator of Arrow
    batches in, narrow feature frame out, heavyweight decoder state
    initialized once per partition — is exactly how a real image/audio
    featurizer runs at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # A real decoder would be constructed here, once per partition.
        for pdf in batches:
            feats = [decode_media(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    blobs = blob_table(spark, sf_dir).select("doc_id", "payload")
    out = blobs.mapInPandas(run, "doc_id long, width long, height long, n_frames long")
    # sample frames: one row per frame index, capped — the video
    # frame-sampling shape (explode over a generated index).
    return out.withColumn(
        "frame_idx", F.explode(F.sequence(F.lit(0), F.least(F.col("n_frames") - 1, F.lit(2))))
    )
