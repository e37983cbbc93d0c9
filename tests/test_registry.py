"""Registry ordering + oracle-normalization contract.

The driver verifies only the first 50 entries of ``queries()`` per
round, so ``load_all`` must order: (0) queries whose LATEST driver
CORRECTNESS row failed or errored — fixes must be re-proven, (1)
never-verified oracle-backed queries, (2) never-verified rows-only
queries, (3) green-verified queries rotated to the back.
"""

from __future__ import annotations

import json
import os
import re

from mr_py_spark.registry import (
    FLAGSHIPS,
    _driver_status,
    _normalize_events_oracle,
    load_all,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _group(name: str, oracle, status: dict[str, bool]) -> int:
    if name in status:
        return 3 if status[name] else 0
    return 1 if oracle is not None else 2


def test_window_groups_are_ordered():
    reg = load_all()
    status = _driver_status()
    groups = [_group(q.name, q.oracle, status) for q in reg.values()]
    assert groups == sorted(groups), groups


def test_broken_queries_re_enter_window():
    """Any query whose latest driver row was red must land inside the
    driver's 50-entry verification window."""
    names = list(load_all())
    status = _driver_status()
    broken = [n for n in names if status.get(n) is False]
    assert all(names.index(n) < 50 for n in broken), broken


def test_flagships_inside_driver_window():
    names = list(load_all())
    window = set(names[:50])
    status = _driver_status()
    missing = [
        n for n in FLAGSHIPS if n not in window and status.get(n) is not True
    ]
    assert not missing, f"flagships outside driver window and unverified: {missing}"


def test_driver_status_reads_latest_round():
    """A query red in an early round but green in a later one counts
    green (and vice versa): later round files win."""
    status = _driver_status()
    rounds = sorted(
        name
        for name in os.listdir(ROOT)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", name)
    )
    latest: dict[str, bool] = {}
    for fname in rounds:
        with open(os.path.join(ROOT, fname)) as f:
            for qname, row in json.load(f).items():
                err = row.get("err")
                if err == "no_oracle":
                    ok = row.get("spark_rows") is not None
                elif err:
                    ok = False
                else:
                    ok = all(
                        row.get(m) is not False
                        for m in ("rows_match", "schema_match", "hash_match")
                    )
                latest[qname] = ok
    assert status == latest


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
