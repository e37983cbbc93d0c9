"""Property-based tests (SURVEY.md §5.4) over generated inputs: the
mr_compat veneer must agree with the native declarative engine on
arbitrary data, and dedup must be idempotent."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mr_py_spark import mr_compat

KEYS = st.sampled_from(["a", "b", "c", "d"])
ROWS = st.lists(st.tuples(KEYS, st.integers(-1000, 1000)), min_size=1, max_size=50)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_mapreduce_agrees_with_groupby(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long")

    def mapper(rec):
        yield (rec["k"], rec["v"])

    def reducer(key, values):
        yield (key, sum(values), len(values))

    veneer = dict(
        (r.k, (r.s, r.n))
        for r in mr_compat.mapreduce(
            df, mapper, reducer, "k string, v long", "k string, s long, n long"
        ).collect()
    )
    native = dict(
        (r.k, (r.s, r.n))
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    assert veneer == native


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(st.integers(0, 30), st.text("ab", min_size=0, max_size=4)), min_size=1, max_size=40))
def test_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "id long, t string")
    once = df.dropDuplicates(["t"])
    twice = once.dropDuplicates(["t"])
    assert sorted((r.t) for r in once.collect()) == sorted(r.t for r in twice.collect())
    assert once.count() == df.select("t").distinct().count()

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        # 4-decimal money values as the fixtures carry them: a double
        # that is the nearest-representable of i/10000
        st.integers(-10_000_000, 10_000_000).map(lambda i: i / 10000.0),
        min_size=1,
        max_size=60,
    )
)
def test_dec4_policy_bitwise_vs_duckdb(spark, vals):
    """The repo-wide float policy (CLAUDE.md): money math through
    DECIMAL(10,4) must make Spark and DuckDB sums/averages BITWISE
    equal on arbitrary 4-decimal inputs, independent of row order —
    this is the invariant every compared oracle relies on."""
    import duckdb

    from mr_py_spark.functions import davg, dsum

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = df.agg(
        dsum("v").alias("s"), davg("v").alias("a")
    ).collect()[0]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    o_s, o_a = con.execute(
        """SELECT CAST(sum(CAST(v AS DECIMAL(10,4))) AS DOUBLE),
                  CAST(sum(CAST(v AS DECIMAL(10,4))) AS DOUBLE) / count(*)
           FROM t"""
    ).fetchone()

    assert row.s == o_s, (row.s, o_s)
    assert row.a == o_a, (row.a, o_a)


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        # adversarial mix: exact .5 ties after x10000, negatives, and
        # arbitrary 4-decimal money values
        st.one_of(
            st.integers(-2_000_000, 2_000_000).map(lambda i: (i + 0.5) / 10000.0),
            st.integers(-10_000_000, 10_000_000).map(lambda i: i / 10000.0),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_stateful_quantizer_matches_decimal_cast(vals):
    """stream_stateful_counts accumulates scaled-long state with a
    quantizer that must match CAST(x AS DECIMAL(10,4)) bitwise in both
    engines: half-AWAY-from-zero (ADVICE r4: np.rint's half-to-even
    diverges on .5 ties) applied to the shortest decimal repr (the
    engines' cast semantics — a raw float multiply rounds 0.00015 the
    wrong way). Pin the implementation to DuckDB's cast on adversarial
    tie inputs."""
    import duckdb
    import numpy as np

    from mr_py_spark.streaming import quantize4

    ours = quantize4(np.asarray(vals, dtype="float64"))

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, v DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, x) for i, x in enumerate(vals)]
    )
    oracle = [
        r[0]
        for r in con.execute(
            "SELECT CAST(CAST(v AS DECIMAL(10,4)) * 10000 AS BIGINT) "
            "FROM t ORDER BY i"
        ).fetchall()
    ]
    assert ours.tolist() == oracle


# ---------------------------------------------------------------- media codecs

MEDIA_TEXT = st.text(max_size=4000)  # arbitrary unicode incl. empty
MEDIA_ID = st.integers(0, 10_000)


@settings(max_examples=40, deadline=None)
@given(doc_id=MEDIA_ID, text=MEDIA_TEXT)
def test_media_codecs_roundtrip_arbitrary_text(doc_id, text):
    """Every byte-level codec pair must round-trip on ARBITRARY unicode
    text (multi-byte UTF-8, empty, surrogate-adjacent) — the regime
    where hand-written container parsers break: synth_media <->
    decode_media headers, WAV <-> wav_samples tensors, BMP <->
    bmp_pixels tensors, synth_video <-> avi_frames frame walk."""
    import numpy as np

    from mr_py_spark.operators.multimodal import (
        _VID_MIN_FRAMES,
        _WAV_MAX_SAMPLES,
        avi_frames,
        bmp_pixels,
        decode_media,
        synth_media,
        synth_video,
        wav_samples,
    )

    payload = synth_media(doc_id, text)
    feats = decode_media(payload)
    kind = doc_id % 3
    body = text.encode() or b"\x00"
    w, h = 4 + doc_id % 13, 4 + doc_id % 7
    if kind == 0:
        assert (feats["fmt"], feats["width"], feats["height"]) == ("bmp", w, h)
        img = bmp_pixels(payload)
        assert img.shape == (h, w, 3)
        # spot-check the generation formula at the four corners
        row = w * 3
        for r_img, c in ((0, 0), (0, w - 1), (h - 1, 0), (h - 1, w - 1)):
            r_buf = h - 1 - r_img
            assert img[r_img, c, 0] == body[(r_buf * row + c * 3) % len(body)]
    elif kind == 1:
        assert (feats["fmt"], feats["width"], feats["height"]) == ("gif", w, h)
    else:
        n = min(len(body), _WAV_MAX_SAMPLES)
        channels = 1 + doc_id % 2
        assert (feats["fmt"], feats["n_frames"]) == ("wav", n)
        rate, frames = wav_samples(payload)
        assert rate == 8000 and frames.shape == (n, channels)
        assert frames[0, 0] == body[0]

    vid = synth_video(doc_id, text)
    frames = dict(avi_frames(vid, w, h))
    assert len(frames) == _VID_MIN_FRAMES + doc_id % 4
    assert all(f.shape == (h, w, 3) for f in frames.values())
    stride = (w * 3 + 3) & ~3
    for f, img in frames.items():
        assert img[h - 1, 0, 0] == body[(f * 7) % len(body)]  # buffer row 0

    assert isinstance(np.asarray(frames[0]), np.ndarray)
