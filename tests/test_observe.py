"""Piggybacked metrics via Observation (SURVEY.md §2 B7; the Spark
analog of MapReduce counters [MR04 §4.5]): whole-dataset stats
collected as a side effect of an action the job runs anyway — no
second scan, unlike the reference's separate counting job."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mr_py_spark.sources import tbl
from tests.conftest import SF_DIR


def test_observe_counters_piggyback(spark):
    li = tbl(spark, SF_DIR, "lineitem")
    obs = Observation("li_counters")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(10,4)")).cast("double").alias("total_qty"),
        F.max("l_shipdate").alias("latest_ship"),
    )
    # the "real" job: some downstream aggregation
    out = observed.groupBy("l_returnflag").count().collect()
    assert len(out) == 3
    got = obs.get
    assert got["n_rows"] == li.count()
    assert got["total_qty"] > 0
    assert got["latest_ship"] is not None
