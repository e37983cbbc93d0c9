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
import hashlib
import inspect
import json
import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import NamedTuple

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
        # RECURSIVE must stay glued to WITH (it flags the whole CTE
        # list), so the shadow CTE slots in after it.
        return re.sub(
            r"(?i)\bWITH(\s+RECURSIVE)?\b",
            lambda m: f"WITH{m.group(1) or ''} {_EVENTS_US_CTE},",
            sql,
            count=1,
        )
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


_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class DriverRow(NamedTuple):
    """The most recent driver CORRECTNESS row for one query."""

    ok: bool  # green (oracle match, or rows-only run that produced rows)
    rnd: int  # round number the row came from (CORRECTNESS_r{rnd}.json)
    rows_only: bool  # that row was a rows-only (err == "no_oracle") check


def _round_of(path: str) -> int:
    m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
    return int(m.group(1)) if m else 0


def _driver_status() -> dict[str, DriverRow]:
    """Latest driver CORRECTNESS verdict per query name across all past
    rounds. The driver caps its per-round check at the first 50 entries
    of ``queries()``, so ``load_all`` uses this (plus the fingerprint
    sidecar) to rotate the verification window — see _window_order."""
    status: dict[str, DriverRow] = {}
    # Sort by parsed round number, not lexically: zero-padded two-digit
    # names invert at r100 ("r100" < "r99" lexically), which would let
    # stale rows silently win the later-round-wins fold.
    for path in sorted(
        glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")), key=_round_of
    ):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue  # unreadable round file: skip, worst case re-verify
        if not isinstance(rows, dict):
            continue  # unexpected shape: skip, worst case re-verify
        rnd = _round_of(path)
        for name, row in rows.items():
            if not isinstance(row, dict):
                # unknown shape: treat as seen-green so it rotates normally
                status[name] = DriverRow(True, rnd, False)
                continue
            err = row.get("err")
            if err == "no_oracle":  # rows-only check: ran to completion
                ok = row.get("spark_rows") is not None
                rows_only = True
            elif err:
                ok, rows_only = False, False
            else:
                ok = all(
                    row.get(m) is not False
                    for m in ("rows_match", "schema_match", "hash_match")
                )
                rows_only = False
            status[name] = DriverRow(ok, rnd, rows_only)
    return status


_FP_PATH = os.path.join(_ROOT, ".fingerprints.json")


def _src_of(fn) -> str:
    try:
        return inspect.getsource(fn)
    except (OSError, TypeError):  # no source file (REPL-defined etc.)
        return f"{fn.__module__}.{fn.__qualname__}"


_SIMPLE_CONST = (int, float, str, bool, bytes, type(None))


def _const_repr(v, depth: int = 0) -> str | None:
    """Deterministic repr for simple module-level data (ints, strings,
    and containers thereof); None for anything whose repr could carry
    object identity (instances, classes, modules) or excessive depth."""
    if depth > 3:
        return None
    if isinstance(v, _SIMPLE_CONST) and not isinstance(v, type):
        return repr(v)
    if isinstance(v, (tuple, list)):
        items = [_const_repr(x, depth + 1) for x in v]
        if any(i is None for i in items):
            return None
        return f"{type(v).__name__}[{','.join(items)}]"
    if isinstance(v, (set, frozenset)):
        items = [_const_repr(x, depth + 1) for x in sorted(v, key=repr)]
        if any(i is None for i in items):
            return None
        return f"{type(v).__name__}[{','.join(items)}]"
    if isinstance(v, dict):
        items = []
        for k in v:
            kr = _const_repr(k, depth + 1)
            vr = _const_repr(v[k], depth + 1)
            if kr is None or vr is None:
                return None
            items.append(f"{kr}:{vr}")
        return "dict{" + ",".join(items) + "}"
    return None


def _local_imports_of(f):
    """(module name, bound name, object) for every
    ``from mr_py_spark... import x`` statement in ``f``'s source —
    fp schema v3 (r15): a function-LOCAL import puts the name in
    co_names but never in the function's MODULE globals, so the plain
    globals walk missed the dependency entirely. The streaming module
    imports almost everything function-locally, so e.g. an
    ivf_index_append edit re-stamped no streaming query — a green
    driver row kept "proving" code that had since changed underneath
    it. AST-parsed from the source (the same text the hash covers);
    unparseable or sourceless functions contribute nothing, which only
    under-adds material exactly as before this fix."""
    import ast
    import importlib
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(f)))
    except (OSError, TypeError, SyntaxError, IndentationError):
        return
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.ImportFrom)
            and node.level == 0
            and node.module
            and node.module.startswith("mr_py_spark")
        ):
            continue
        try:
            mod = importlib.import_module(node.module)
        except Exception:
            continue  # never let a broken import poison fingerprinting
        for alias in node.names:
            if alias.name == "*":
                continue
            obj = getattr(mod, alias.name, None)
            if obj is not None:
                yield node.module, alias.name, obj


def _dep_closure(fn, local_imports: bool = True) -> tuple[list[str], list[str]]:
    """(function sources, data-constant reprs) for everything in
    mr_py_spark transitively reachable from ``fn``'s code — module
    globals referenced by name, including names used inside nested
    closures/lambdas, plus (fp schema v3) names bound by
    function-LOCAL ``from mr_py_spark... import`` statements (see
    ``_local_imports_of``; ``local_imports=False`` reproduces the v2
    closure for migration re-checks). Folding function sources into
    the fingerprint means a behavior-changing edit to a SHARED helper
    (the r8 case: the IVF candidate machinery under knn_ivf_topk)
    re-stamps every registered query that uses it; folding referenced
    DATA constants (fp schema v2, r10) closes the blind spot that a
    module-level knob (_TAU, _BUCKETS, _RUNTIME_CONFS) changes
    behavior without touching any function source — the r10 harden()
    conf change escaped re-stamping exactly this way. Attribute names
    in co_names that happen to collide with unrelated module globals
    can only ADD material to the hash — a spurious re-verification at
    worst, never a missed one."""
    import types

    seen: dict[tuple[str, str], object] = {}
    consts: dict[str, str] = {}
    stack = [fn]
    while stack:
        f = stack.pop()
        code = getattr(f, "__code__", None)
        if code is None:
            continue
        mod = inspect.getmodule(f)
        mod_name = getattr(mod, "__name__", "") or ""
        g = getattr(mod, "__dict__", None) or {}
        names: set[str] = set()
        codes = [code]
        while codes:
            c = codes.pop()
            names.update(c.co_names)
            codes.extend(
                k for k in c.co_consts if isinstance(k, types.CodeType)
            )
        for name in sorted(names):
            obj = g.get(name)
            if inspect.isfunction(obj) and (
                getattr(obj, "__module__", "") or ""
            ).startswith("mr_py_spark"):
                key = (obj.__module__, obj.__qualname__)
                if key not in seen:
                    seen[key] = obj
                    stack.append(obj)
            elif mod_name.startswith("mr_py_spark") and name in g:
                r = _const_repr(obj)
                if r is not None:
                    consts[f"{mod_name}.{name}"] = r
        if local_imports:
            for src_mod, name, obj in _local_imports_of(f):
                if inspect.isfunction(obj) and (
                    getattr(obj, "__module__", "") or ""
                ).startswith("mr_py_spark"):
                    key = (obj.__module__, obj.__qualname__)
                    if key not in seen:
                        seen[key] = obj
                        stack.append(obj)
                else:
                    r = _const_repr(obj)
                    if r is not None:
                        consts[f"{src_mod}.{name}"] = r
    return (
        [_src_of(seen[k]) for k in sorted(seen)],
        [f"{k}={consts[k]}" for k in sorted(consts)],
    )


#: Fingerprint schema version. Bump when _fingerprint's INPUTS change
#: (not when code changes): _fingerprint_rounds migrates entries whose
#: recorded version differs by re-hashing while KEEPING their round —
#: trusting history like the bootstrap path — so a schema change never
#: dumps all 200+ queries back into the verification window at once.
_FP_VERSION = 3


def _fingerprint(q: Query) -> str:
    """Content hash of a query's implementation (own source + the
    source and data constants of transitively-referenced mr_py_spark
    helpers, see ``_dep_closure``) + oracle. A green driver row only
    proves the code that existed when the row was recorded; a
    fingerprint change after that round means the query is unproven
    again and must re-enter the verification window."""
    h = hashlib.sha256()
    h.update(_src_of(q.fn).encode())
    sources, consts = _dep_closure(q.fn)
    for dep in sources:
        h.update(b"\x00")
        h.update(dep.encode())
    h.update(b"\x00\x01")
    for c in consts:
        h.update(b"\x00")
        h.update(c.encode())
    h.update(b"\x00\x00")
    h.update((q.oracle or "").encode())
    return h.hexdigest()[:16]


def _fingerprint_v1(q: Query) -> str:
    """The RETIRED v1 hash (function sources + oracle, no data
    constants), kept so a schema migration can tell "only the hash
    INPUTS changed" from "the query changed in the same sync": on a
    version mismatch, _fingerprint_rounds preserves the recorded round
    only when the OLD-schema hash still matches — a real source/oracle
    edit landing alongside an _FP_VERSION bump re-enters the
    verification window instead of riding the migration (ADVICE r10)."""
    h = hashlib.sha256()
    h.update(_src_of(q.fn).encode())
    sources, _ = _dep_closure(q.fn, local_imports=False)
    for dep in sources:
        h.update(b"\x00")
        h.update(dep.encode())
    h.update(b"\x00\x00")
    h.update((q.oracle or "").encode())
    return h.hexdigest()[:16]


def _fingerprint_v2(q: Query) -> str:
    """The RETIRED v2 hash (globals-only dep closure + data constants
    — function-local imports invisible, the blind spot v3 closes),
    kept for the v2→v3 migration re-check: entries whose v2 hash still
    matches keep their recorded round (only the hash INPUTS changed);
    a real edit sharing a sync with the bump re-enters the window."""
    h = hashlib.sha256()
    h.update(_src_of(q.fn).encode())
    sources, consts = _dep_closure(q.fn, local_imports=False)
    for dep in sources:
        h.update(b"\x00")
        h.update(dep.encode())
    h.update(b"\x00\x01")
    for c in consts:
        h.update(b"\x00")
        h.update(c.encode())
    h.update(b"\x00\x00")
    h.update((q.oracle or "").encode())
    return h.hexdigest()[:16]


#: version -> that schema's hash function, for migration re-checks.
_FP_BY_VERSION = {1: _fingerprint_v1, 2: _fingerprint_v2, 3: _fingerprint}


def _fingerprint_rounds(registry: dict[str, Query]) -> dict[str, int]:
    """Per query, the round at which its CURRENT (fn source, oracle)
    fingerprint first appeared, per the ``.fingerprints.json`` sidecar.
    New/changed fingerprints are stamped with the upcoming round (max
    recorded CORRECTNESS round + 1), so a query edited after its last
    green row sorts as never-verified. Bootstrap (no sidecar yet) trusts
    prior history: everything stamps at round 0. The sidecar is
    re-written only when something changed (atomic tmp+rename); write
    failures degrade to in-memory behavior."""
    try:
        with open(_FP_PATH) as f:
            sidecar = json.load(f)
        if not isinstance(sidecar, dict):
            sidecar = {}
        bootstrap = False
    except (OSError, ValueError):
        sidecar, bootstrap = {}, True
    rounds = [_round_of(p) for p in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))]
    upcoming = max(rounds, default=0) + 1
    out: dict[str, int] = {}
    dirty: dict[str, dict] = {}
    for name, q in registry.items():
        fp = _fingerprint(q)
        prev = sidecar.get(name)
        if isinstance(prev, dict) and int(prev.get("v", 1)) != _FP_VERSION:
            # fp-schema migration. "The hash INPUTS changed, not the
            # query" must be PROVEN, not assumed: re-hash under the
            # RECORDED version's algorithm and keep the round only if
            # that still matches — a real source/oracle edit sharing a
            # sync with the _FP_VERSION bump would otherwise be stamped
            # with its old round and never re-verified (ADVICE r10).
            # Unknown recorded versions (no keeper fn) re-verify.
            old_fp_fn = _FP_BY_VERSION.get(int(prev.get("v", 1)))
            if old_fp_fn is not None and old_fp_fn(q) == prev.get("fp"):
                out[name] = int(prev.get("round", 0))
            else:
                out[name] = 0 if bootstrap else upcoming
            dirty[name] = {"fp": fp, "round": out[name], "v": _FP_VERSION}
        elif isinstance(prev, dict) and prev.get("fp") == fp:
            out[name] = int(prev.get("round", 0))
        else:
            out[name] = 0 if bootstrap else upcoming
            dirty[name] = {"fp": fp, "round": out[name], "v": _FP_VERSION}
    if dirty and "PYTEST_CURRENT_TEST" not in os.environ:
        # Never WRITE the sidecar from a pytest process (VERDICT r11):
        # tests monkeypatch module constants (e.g. km._TAU), and a sync
        # that runs while module state is patched hashes the PATCHED
        # constants — reproduced poisoning 5 entries with wrong
        # fingerprints per full test run. Direction is benign (spurious
        # re-verification) but it dirties the tree on every `pytest
        # tests/` and churns the driver window. In-memory ordering
        # still sees the dirty stamps, so tests observe correct
        # behavior; only the PERSISTED state is gated to non-test
        # processes (driver, bench, CLI), whose module dicts are clean.
        #
        # Merge into a FRESH read of the sidecar so a process holding
        # stale imports (e.g. a driver run spanning a source edit, where
        # getsource slices the new file at old line offsets) can only
        # touch the entries it thinks changed — never clobber the rest.
        # Rounds are only ever raised (post-bootstrap), so the worst
        # stale outcome is a spurious re-verification, not a missed one.
        try:
            try:
                with open(_FP_PATH) as f:
                    current = json.load(f)
                if not isinstance(current, dict):
                    current = {}
            except (OSError, ValueError):
                current = {}
            current.update(dirty)
            tmp = _FP_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(current, f, indent=1, sort_keys=True)
            os.replace(tmp, _FP_PATH)
        except OSError:
            pass  # read-only checkout: ordering still correct this process
    return out


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
    """Stable-reorder so the driver's 50-entry verification window never
    stagnates: (0) queries whose latest driver row failed or errored —
    fixes must be re-proven, (1) unproven oracle queries — never
    driver-verified, oracle-upgraded since their last (rows-only) green
    row, or edited since their last green row (fingerprint sidecar) —
    flagships first, (2) unproven rows-only queries, (3) green-verified
    queries rotated by least-recently-verified round (flagships first:
    the bench headliners re-prove every round). Ties preserve original
    registration order (sorted() is stable)."""
    status = _driver_status()
    fp_round = _fingerprint_rounds(registry)
    latest_round = max((r.rnd for r in status.values()), default=0)

    def key(q: Query) -> tuple[int, int, int]:
        unproven = 1 if q.oracle is not None else 2
        row = status.get(q.name)
        if row is None:
            g, rot = unproven, 0
        elif not row.ok:
            g, rot = 0, 0
        elif row.rows_only and q.oracle is not None:
            g, rot = 1, 0  # oracle added after the green rows-only row
        elif fp_round.get(q.name, 0) > row.rnd:
            g, rot = unproven, 0  # edited after the green row
        else:
            g, rot = 3, row.rnd  # least-recently-verified first
        # Flagship priority only while the flagship is itself stale:
        # one that went green in the LATEST recorded round would
        # otherwise re-prove every round, permanently consuming window
        # slots the least-recently-verified tail needs to rotate
        # through (r5 measured 9 such slots). Fingerprint stamping
        # still catches flagship edits (category `unproven` above), so
        # nothing proven can silently rot — it just rotates on the
        # same LRV schedule as everything else once freshly verified.
        flagship_now = q.name in FLAGSHIPS and not (g == 3 and rot >= latest_round)
        if flagship_now and g == 3:
            # A STALE green flagship outranks the unproven tail, not
            # just its own category: a heavy batch of new/edited
            # queries (r9: 39 re-stamped entries) would otherwise push
            # the bench headliners past the 50-slot window and BENCH
            # numbers would ride unverified code. Flagship count is
            # bounded (len(FLAGSHIPS)), so this costs the tail at most
            # that many slots in the worst round.
            g = 1
        return (g, 0 if flagship_now else 1, rot)

    return {q.name: q for q in sorted(registry.values(), key=key)}


def verification_ledger(registry: dict[str, Query] | None = None) -> dict[str, dict]:
    """Per-query verification staleness report (VERDICT r9 item 5):
    for every registered query, its latest driver CORRECTNESS round,
    whether that row was green/red/rows-only, the round its current
    fingerprint was stamped (edits after the last green row reset the
    proof), and the derived state:

    - ``never``    — no driver row yet (or edited since the last one)
    - ``red``      — latest driver row failed
    - ``green``    — proven, ``staleness`` = rounds since that proof

    Run ``python -m mr_py_spark.registry`` to print it, oldest first.
    tests/test_registry.py asserts the staleness budget: once the
    never-verified debt is drained, no oracle-backed query's proof may
    be older than the full rotation cycle (ceil(n/50) + margin).
    """
    if registry is None:
        registry = load_all()
    status = _driver_status()
    fp_round = _fingerprint_rounds(registry)
    latest = max((r.rnd for r in status.values()), default=0)
    out: dict[str, dict] = {}
    for name, q in registry.items():
        row = status.get(name)
        if row is None or fp_round.get(name, 0) > row.rnd:
            state, staleness = "never", None
        elif not row.ok:
            state, staleness = "red", None
        else:
            state, staleness = "green", latest - row.rnd
        out[name] = {
            "state": state,
            "last_round": None if row is None else row.rnd,
            "rows_only": bool(row and row.rows_only),
            "oracle": q.oracle is not None,
            "staleness": staleness,
        }
    return out


def load_all() -> dict[str, Query]:
    """Import every operator module (side effect: registration) and return the registry."""
    # Imports are inside the function so `import mr_py_spark` stays cheap.
    from mr_py_spark.operators import (  # noqa: F401
        bpe,
        bucketed,
        cdc,
        corpus_prep,
        csv_source,
        dedup,
        events_windows,
        extras,
        filtering,
        graph,
        hier,
        joins,
        kmeans,
        multimodal,
        organize,
        pipeline,
        quality,
        scalar,
        similarity,
        skew,
        spatial,
        sql_surface,
        summarize,
        text,
        timeseries,
        tpch_like,
        tpch_more,
        tpch_partsupp,
        udf_surface,
        vectors,
        windows,
    )
    from mr_py_spark import streaming  # noqa: F401

    return _window_order(REGISTRY)


if __name__ == "__main__":
    # staleness report, oldest proof first (never/red at the top).
    # Under `python -m` this file runs as a SECOND module object with
    # its own empty REGISTRY; route through the canonical sys.modules
    # copy the operator modules registered into.
    from mr_py_spark.registry import verification_ledger as _canonical_ledger

    led = _canonical_ledger()
    order = {"red": 0, "never": 1, "green": 2}

    def _k(item):
        st = item[1]
        return (order[st["state"]], -(st["staleness"] or 0), item[0])

    for name, st in sorted(led.items(), key=_k):
        age = "-" if st["staleness"] is None else f"{st['staleness']}r old"
        kind = "oracle" if st["oracle"] else "rows-only"
        last = "-" if st["last_round"] is None else f"r{st['last_round']}"
        print(f"{st['state']:6s} {age:8s} {last:4s} {kind:9s} {name}")
