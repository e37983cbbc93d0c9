"""Reusable column-expression helpers.

Everything here is a JVM-side Column expression (whole-stage-codegen
friendly) — the engine's discipline is built-in expressions first,
Arrow-vectorized pandas_udf second, row-at-a-time Python UDFs never
(SURVEY.md §4 "Python boundary cost").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_ntz(literal: str) -> Column:
    """A TIMESTAMP_NTZ literal (oracle tables are UTC-naive)."""
    return F.lit(literal).cast("timestamp_ntz")


#: All fixture money/measure columns are exact 4-decimal values (verified in
#: FIXTURES.md / this repo's survey). Cross-engine float policy:
#:   - sums/products of money go through DECIMAL (exact in every engine),
#:     then one cast to double at the end -> bit-identical outputs;
#:   - NEVER `round()` a compared double below its true decimal precision:
#:     engines disagree at .xx5 boundaries (Spark rounds the exact binary
#:     value, DuckDB rounds after a double multiply). For RATIONAL ratios
#:     this is a REACHABLE bug, not a theoretical one: a ratio whose reduced
#:     denominator divides 2*10^(d+1) lands EXACTLY on a d-dp half-boundary
#:     (e.g. jaccard k/128 at 6 dp), where Spark HALF_UPs and DuckDB
#:     half-evens. r9 removed every round() on a compared integer ratio —
#:     emit the raw single IEEE division; identical int inputs make it
#:     bit-identical with no rounding at all.
#:   - DECIMAL->DOUBLE casts must be SINGLE-ROUNDED: round(sum, 4) in DECIMAL
#:     before the double cast whenever the sum's scaled integer can exceed
#:     2^53 (any scale-8 product sum past ~9e7) — DuckDB converts via
#:     int128->double->/10^scale, which DOUBLE-ROUNDS where Spark's
#:     BigDecimal.doubleValue is correctly rounded (measured 1-ULP q14
#:     divergence at sf1, SCALE.md r9). Decimal rounding itself is exact
#:     integer arithmetic with the same half-away rule in both engines.
#:     Scale-4 keeps conversions single-rounded through ~9e11 magnitudes.
#:   - EXEMPTION — transcendental outputs (log/pow/tfidf): libm results may
#:     differ in the last ULP between engines, so comparing raw bits is
#:     unsound and a 6-dp round is the comparison mechanism. The boundary-tie
#:     hazard above is measure-zero there (a transcendental never lands
#:     exactly on a decimal half-boundary).
#:   - raw column values are emitted unrounded (identical bits by scan).
#:   - VECTORIZED KERNELS (r12): a numpy/Arrow kernel that replaces a
#:     compared Column expression must replay the expression's float64
#:     OP SEQUENCE, not just its math — BLAS matmuls sum pairwise and
#:     can flip a threshold compare on a knife-edge pair. The sanctioned
#:     pattern is similarity._fold_order_blocks: accumulate left-to-
#:     right over dimensions (the fold order of `dot` below), vectorize
#:     across pairs, row-block for memory; pinned bitwise against a
#:     scalar fold AND across block sizes in tests/test_properties.py.
DEC = "decimal(10,4)"


def dec4(c: Column | str) -> Column:
    """Cast a 4-decimal money/measure column to exact DECIMAL(10,4)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: Column | str) -> Column:
    """Exact money sum: sum in DECIMAL, one cast to double at the end."""
    return F.sum(dec4(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Exact-numerator average: decimal sum cast double / count.
    (Both engines then perform the identical IEEE division.)"""
    return F.sum(dec4(c)).cast("double") / F.count(F.lit(1))


def fmt_ts(col: Column | str) -> Column:
    """Render a timestamp as 'yyyy-MM-dd HH:mm:ss' text.

    Compared query outputs carry timestamps as strings so the value hash
    is representation-independent (DuckDB: strftime(ts, '%Y-%m-%d %H:%M:%S')).
    """
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def fmt_ts_us(col: Column | str) -> Column:
    """Render a timestamp with microseconds, 'yyyy-MM-dd HH:mm:ss.SSSSSS'
    (DuckDB: strftime(ts, '%Y-%m-%d %H:%M:%S.%f') — also 6-digit)."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays, fully JVM-side.

    For L2-normalized vectors (the embeddings fixture) this IS cosine
    similarity. Scale note: this per-pair expression is fine for
    narrow candidate sets; for all-pairs kNN use the blocked
    numpy matmul path in operators/similarity.py instead.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )


def words(text: Column | str) -> Column:
    """Tokenize on single spaces (documents fixture is space-joined)."""
    return F.split(text, " ")


def ngrams_arr(w, n: int) -> Column:
    """Space-joined word n-grams from a BOUND token-array column.

    ``w`` MUST be a materialized column (alias the ``split(...)`` in
    its own projection first), never an inline split expression:
    Catalyst evaluates a ``transform`` lambda body per element, so an
    inlined split re-tokenizes the document once per n-gram position —
    O(tokens^2) work per row. Measured at sf10 (500k docs, 26.6M
    bigrams): inline 202 s vs bound-column 2.2 s (SCALE.md round 7).
    CollapseProject keeps the projection separate because the alias is
    referenced more than once and is non-cheap.

    Documents shorter than ``n`` words yield an empty array (explode
    drops them) — matching the DuckDB oracles' range() semantics.
    """
    col = F.col(w) if isinstance(w, str) else w
    make = F.transform(
        F.sequence(F.lit(1), F.size(col) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(col, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(col) >= n, make).otherwise(
        F.array().cast("array<string>")
    )
