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


def test_avro_source_capability_gated(spark):
    """Avro is an external Spark module; the query registers exactly
    when spark-avro is deployed (this container ships only avro core
    jars, so the expected state here is absent + cleanly skipped).
    When present it must round-trip with oracle-grade fidelity."""
    from mr_py_spark.operators.csv_source import _avro_available
    from mr_py_spark.registry import load_all

    reg = load_all()
    if not _avro_available():
        assert "avro_source_agg" not in reg
        import pytest

        pytest.skip("spark-avro jar not deployed in this container (documented)")
    out = reg["avro_source_agg"].fn(spark, SF_DIR)
    assert out.columns == ["s_nationkey", "n_supp", "max_bal"]
    assert out.count() > 0
