"""Source-format coverage (SURVEY.md §2A A7): the reference reads text
lines; this engine's catalog is parquet-first but the same DataFrames
round-trip through csv/json/text with explicit schemas (inference is
allowed only at ingestion, SURVEY.md §1.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_py_spark.sources import tbl
from tests.conftest import SF_DIR


def test_csv_roundtrip_with_schema(spark, tmp_path):
    docs = tbl(spark, SF_DIR, "documents").select("doc_id", "lang", "source", "n_chars")
    out = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema("doc_id long, lang string, source string, n_chars long").option(
        "header", True
    ).csv(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_json_roundtrip_with_schema(spark, tmp_path):
    ev = tbl(spark, SF_DIR, "events").select("event_id", "user_id", "event_type", "value")
    out = str(tmp_path / "events_json")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema("event_id long, user_id long, event_type string, value double").json(
        out
    )
    assert back.count() == ev.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_text_lines_source(spark, tmp_path):
    """The reference's native format: bare lines + ad-hoc parsing (here:
    a tab-separated KV sink read back through split())."""
    docs = tbl(spark, SF_DIR, "documents")
    out = str(tmp_path / "kv_text")
    docs.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("lang")).alias("value")
    ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.split("value", "\t")[0].cast("long").alias("doc_id"),
        F.split("value", "\t")[1].alias("lang"),
    )
    assert sorted(map(tuple, parsed.collect())) == sorted(
        map(tuple, docs.select("doc_id", "lang").collect())
    )


def test_avro_roundtrip_bitwise(spark, tmp_path):
    """The pure-Python avro container source (sources/avro_py.py —
    spark-avro's jar is absent from this container, so the spec is
    implemented directly): writer -> distributed binaryFile+
    mapInPandas reader must round-trip values bitwise, across
    multiple files (one decode task each) and nullable unions."""
    from mr_py_spark.sources.avro_py import read_avro, write_avro

    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "flag", "type": "boolean"},
            {"name": "bal", "type": "double"},
            {"name": "opt", "type": ["null", "int"]},
        ],
    }
    rows = [
        {"k": i, "name": f"é-{i}\t", "flag": i % 2 == 0,
         "bal": i * 0.1 + 1e-9, "opt": None if i % 3 == 0 else i * 7}
        for i in range(211)
    ]
    out = str(tmp_path / "avro")
    write_avro(out + "/part-0.avro", schema, rows[:100])
    write_avro(out + "/part-1.avro", schema, rows[100:])
    back = read_avro(spark, out, schema)
    got = sorted(tuple(r) for r in back.collect())
    want = sorted((r["k"], r["name"], r["flag"], r["bal"], r["opt"]) for r in rows)
    assert got == want


def test_avro_deflate_codec_decode(spark, tmp_path):
    """Reader must handle deflate-codec blocks (the common producer
    default); the writer only emits null codec, so build the deflate
    container by recompressing its block."""
    import io
    import zlib

    from mr_py_spark.sources.avro_py import _MAGIC, _decode_container, write_avro

    schema = {
        "type": "record",
        "name": "t",
        "fields": [{"name": "k", "type": "long"}, {"name": "s", "type": "string"}],
    }
    rows = [{"k": i, "s": "x" * (i % 17)} for i in range(50)]
    p = str(tmp_path / "null.avro")
    write_avro(p, schema, rows)
    raw = open(p, "rb").read()
    # surgically rewrite: metadata codec null -> deflate, block recompressed
    assert raw.startswith(_MAGIC) and b"null" in raw
    import json as _json

    from mr_py_spark.sources import avro_py as A

    buf = io.BytesIO(raw[4:])
    # re-emit header with deflate codec
    n = A._zigzag_decode(buf)
    meta = {}
    for _ in range(n):
        k = buf.read(A._zigzag_decode(buf)).decode()
        meta[k] = buf.read(A._zigzag_decode(buf))
    assert A._zigzag_decode(buf) == 0
    sync = buf.read(16)
    n_rows = A._zigzag_decode(buf)
    n_bytes = A._zigzag_decode(buf)
    block = buf.read(n_bytes)
    comp = zlib.compress(block)[2:-4]  # strip zlib header+adler -> raw deflate
    out = bytearray(_MAGIC)
    meta["avro.codec"] = b"deflate"
    out += A._zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += A._zigzag_encode(len(kb)) + kb
        out += A._zigzag_encode(len(v)) + v
    out += A._zigzag_encode(0)
    out += sync
    out += A._zigzag_encode(n_rows) + A._zigzag_encode(len(comp)) + comp + sync
    got = list(_decode_container(bytes(out)))
    assert got == rows


def test_avro_source_agg_registered(spark):
    """avro_source_agg is a first-class A7 query (no capability gate):
    it must answer with the oracle's schema on the fixtures."""
    from mr_py_spark.registry import load_all

    reg = load_all()
    out = reg["avro_source_agg"].fn(spark, SF_DIR)
    assert out.columns == ["s_nationkey", "n_supp", "max_bal"]
    assert out.count() > 0
