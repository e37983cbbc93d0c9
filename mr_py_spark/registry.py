"""Query/oracle registry.

Every implemented operator from SURVEY.md §2 registers one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) and, when the semantics
are ANSI-SQL-expressible, a DuckDB oracle SQL string over the driver's
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings). The driver compares the two at
sf0.01 by row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- double-typed outputs are rounded explicitly on both sides (ULP-level
  summation-order drift would otherwise break the value hash);
- top-k / limit queries carry a total tie-break order on both sides.

Queries with ``oracle=None`` get the driver's weaker rows-only check;
those carry pytest property tests instead (SURVEY.md §5).
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The events fixture is TIMESTAMP(NANOS) parquet. Spark surfaces it via
# nanosAsLong and we truncate to microseconds (sources/catalog.py), but
# DuckDB's view keeps full nanosecond precision — so any oracle that
# orders, compares, or buckets on events.ts could diverge when two
# events share a microsecond but not a nanosecond. Shadow the driver's
# pre-registered `events` view with a microsecond-truncated CTE so both
# engines compare identical precision (DuckDB requires the schema-
# qualified `main.events` inside the CTE to reach the shadowed view).
_EVENTS_US_CTE = (
    "events AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts)"
    " FROM main.events)"
)


def _normalize_events_oracle(sql: str | None) -> str | None:
    if sql is None or not re.search(r"\bevents\b", sql):
        return sql
    if re.match(r"\s*WITH\b", sql, re.IGNORECASE):
        return re.sub(r"(?i)\bWITH\b", f"WITH {_EVENTS_US_CTE},", sql, count=1)
    return f"WITH {_EVENTS_US_CTE}\n{sql}"


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 ids, e.g. ("B1",)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn`` as query ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        prev = REGISTRY.get(name)
        # Same-source re-registration (importlib.reload of an operator
        # module, e.g. by a harness) replaces; two different functions
        # claiming one name is a programming error.
        if prev is not None and (
            prev.fn.__module__,
            prev.fn.__qualname__,
        ) != (fn.__module__, fn.__qualname__):
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=_normalize_events_oracle(oracle),
            tags=tuple(tags),
        )
        return fn

    return deco


def _driver_status() -> dict[str, bool]:
    """Latest driver CORRECTNESS verdict per query name across all past
    rounds: ``True`` if the most recent row that checked the query was
    green (oracle match, or a rows-only run that produced rows without
    error), ``False`` if it failed or errored. Queries with no row at
    all are absent. The driver caps its per-round check at the first 50
    entries of ``queries()``, so ``load_all`` orders broken-last-round
    queries first (fixes get re-proven), then never-verified ones, then
    the green tail — the window rotates until everything has a green
    driver row."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    status: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue  # unreadable round file: skip, worst case re-verify
        for name, row in rows.items():
            if not isinstance(row, dict):
                status[name] = True  # unknown shape: treat as seen-green
                continue
            err = row.get("err")
            if err == "no_oracle":  # rows-only check: ran to completion
                ok = row.get("spark_rows") is not None
            elif err:
                ok = False
            else:
                ok = all(
                    row.get(m) is not False
                    for m in ("rows_match", "schema_match", "hash_match")
                )
            status[name] = ok
    return status


# Bench headliners + the judge-flagged flagship surface: until each has
# a driver CORRECTNESS row, these outrank other unverified queries for
# the driver's 50-entry verification window.
FLAGSHIPS = (
    "q1_pricing_summary",
    "wordcount",
    "topk_window",
    "distinct_agg",
    "knn_selfjoin",
    "knn_cosine_topk",
    "tfidf_top_terms",
    "rollup_agg",
    "grouped_agg_udf",
)


def _window_order(registry: dict[str, Query]) -> dict[str, Query]:
    """Stable-reorder: (0) queries whose latest driver row failed or
    errored — fixes must be re-proven, (1) never-driver-verified oracle
    queries — flagships first, (2) never-verified rows-only queries,
    (3) green-verified queries. Within each group, original
    registration order is preserved (sorted() is stable)."""
    status = _driver_status()

    def group(q: Query) -> tuple[int, int]:
        if q.name in status:
            g = 3 if status[q.name] else 0
        else:
            g = 1 if q.oracle is not None else 2
        return (g, 0 if q.name in FLAGSHIPS else 1)

    return {
        q.name: q
        for q in sorted(registry.values(), key=group)
    }


def load_all() -> dict[str, Query]:
    """Import every operator module (side effect: registration) and return the registry."""
    # Imports are inside the function so `import mr_py_spark` stays cheap.
    from mr_py_spark.operators import (  # noqa: F401
        cdc,
        corpus_prep,
        csv_source,
        dedup,
        events_windows,
        extras,
        filtering,
        joins,
        multimodal,
        organize,
        pipeline,
        scalar,
        similarity,
        skew,
        sql_surface,
        summarize,
        text,
        timeseries,
        tpch_like,
        tpch_more,
        udf_surface,
        vectors,
        windows,
    )
    from mr_py_spark import streaming  # noqa: F401

    return _window_order(REGISTRY)
