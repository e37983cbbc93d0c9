"""Unit tests for the mapreduce compatibility veneer (A1-A9):
reference-style mapper/reducer jobs executed on Spark."""

from __future__ import annotations

from mr_py_spark import mr_compat


def test_map_phase_one_to_many(spark):
    df = spark.createDataFrame([("a b", 1), ("c", 2)], "text string, n int")

    def mapper(rec):
        for w in rec["text"].split():
            yield (w, rec["n"])

    out = mr_compat.map_phase(df, mapper, "k string, v int")
    assert sorted(map(tuple, out.collect())) == [("a", 1), ("b", 1), ("c", 2)]


def test_mapreduce_wordcount_roundtrip(spark):
    df = spark.createDataFrame([("x y x",), ("y x",)], "text string")

    def mapper(rec):
        for w in rec["text"].split():
            yield (w, 1)

    def reducer(word, counts):
        yield (word, sum(counts))

    out = mr_compat.mapreduce(
        df, mapper, reducer, "word string, one int", "word string, cnt long", key_cols=("word",)
    )
    assert dict(map(tuple, out.collect())) == {"x": 3, "y": 2}


def test_reduce_secondary_sort(spark):
    """A6: sort_values_by delivers values in order inside the reducer."""
    df = spark.createDataFrame(
        [("u1", 3, "c"), ("u1", 1, "a"), ("u1", 2, "b"), ("u2", 9, "z")],
        "k string, seq int, val string",
    )

    def reducer(key, values):
        # values are dicts of the non-key columns, pre-sorted by seq
        yield (key, "".join(v["val"] for v in values))

    out = mr_compat.reduce_phase(
        df, reducer, "k string, joined string", key_cols=("k",), sort_values_by=("seq",)
    )
    assert dict(map(tuple, out.collect())) == {"u1": "abc", "u2": "z"}


def test_mapreduce_multi_column_values_and_partitions(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 10), ("a", 2.0, 20), ("b", 5.0, 50)], "g string, x double, y int"
    )

    def mapper(rec):
        yield (rec["g"], rec["x"], rec["y"])

    def reducer(key, values):
        yield (key, sum(v["x"] for v in values), sum(v["y"] for v in values))

    out = mr_compat.mapreduce(
        df,
        mapper,
        reducer,
        "g string, x double, y long",
        "g string, sx double, sy long",
        key_cols=("g",),
        num_partitions=2,
    )
    assert sorted(map(tuple, out.collect())) == [("a", 3.0, 30), ("b", 5.0, 50)]


def test_empty_mapper_output(spark):
    df = spark.createDataFrame([("skip",), ("skip",)], "text string")

    def mapper(rec):
        return []

    def reducer(key, values):
        yield (key, len(values))

    out = mr_compat.mapreduce(
        df, mapper, reducer, "k string, v int", "k string, n long", key_cols=("k",)
    )
    assert out.collect() == []
