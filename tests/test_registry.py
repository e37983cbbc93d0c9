"""Registry ordering + oracle-normalization contract.

The driver verifies only the first 50 entries of ``queries()`` per
round, so ``load_all`` must put never-driver-verified queries first
(oracle-backed before rows-only) and rotate verified ones to the back.
"""

from __future__ import annotations

import json
import os
import re

from mr_py_spark.registry import FLAGSHIPS, _normalize_events_oracle, load_all

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _verified() -> set[str]:
    seen: set[str] = set()
    for name in os.listdir(ROOT):
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", name):
            with open(os.path.join(ROOT, name)) as f:
                seen.update(json.load(f))
    return seen


def test_unverified_queries_come_first():
    names = list(load_all())
    seen = _verified()
    unverified = [n for n in names if n not in seen]
    # every unverified query precedes every verified one
    if unverified:
        last_unverified = max(names.index(n) for n in unverified)
        first_verified = min(
            (names.index(n) for n in names if n in seen), default=len(names)
        )
        assert last_unverified < first_verified or len(unverified) > 50


def test_flagships_inside_driver_window():
    names = list(load_all())
    window = set(names[:50])
    seen = _verified()
    missing = [n for n in FLAGSHIPS if n not in window and n not in seen]
    assert not missing, f"flagships outside driver window and unverified: {missing}"


def test_rows_only_after_oracle_within_unverified():
    reg = load_all()
    seen = _verified()
    groups = [
        (0 if q.oracle is not None else 1)
        for q in reg.values()
        if q.name not in seen
    ]
    assert groups == sorted(groups)


def test_events_oracles_truncated_to_micros():
    reg = load_all()
    for q in reg.values():
        if q.oracle and re.search(r"\bmain\.events\b|\bevents\b", q.oracle):
            assert "date_trunc('microseconds', ts)" in q.oracle, q.name


def test_normalize_merges_into_existing_with():
    sql = "WITH x AS (SELECT 1) SELECT * FROM events, x"
    out = _normalize_events_oracle(sql)
    assert out.count("WITH") == 1
    assert out.startswith("WITH events AS")
    assert "), x AS (SELECT 1)" in out.replace("\n", " ") or "x AS (SELECT 1)" in out


def test_normalize_leaves_non_events_alone():
    assert _normalize_events_oracle("SELECT 1 FROM lineitem") == "SELECT 1 FROM lineitem"
    assert _normalize_events_oracle(None) is None
