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

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


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
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (side effect: registration) and return the registry."""
    # Imports are inside the function so `import mr_py_spark` stays cheap.
    from mr_py_spark.operators import (  # noqa: F401
        cdc,
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
        tpch_like,
        udf_surface,
        windows,
    )
    from mr_py_spark import streaming  # noqa: F401

    return REGISTRY
