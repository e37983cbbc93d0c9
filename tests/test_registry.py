"""Registry ordering + oracle-normalization contract.

The driver verifies only the first 50 entries of ``queries()`` per
round, so ``load_all`` must order: (0) queries whose LATEST driver
CORRECTNESS row failed or errored — fixes must be re-proven, (1)
unproven oracle-backed queries (never verified, oracle-upgraded since
their last rows-only green row, or edited since their last green row),
(2) unproven rows-only queries, (3) green-verified queries rotated by
least-recently-verified round so regressions in the tail are caught
within a few rounds instead of never (verdict r4 item 1).
"""

from __future__ import annotations

import json
import os
import re

from mr_py_spark.registry import (
    FLAGSHIPS,
    DriverRow,
    _driver_status,
    _fingerprint_rounds,
    _normalize_events_oracle,
    load_all,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _group(q, status, fp_round) -> int:
    unproven = 1 if q.oracle is not None else 2
    row = status.get(q.name)
    if row is None:
        return unproven
    if not row.ok:
        return 0
    if row.rows_only and q.oracle is not None:
        return 1
    if fp_round.get(q.name, 0) > row.rnd:
        return unproven
    latest = max((r.rnd for r in status.values()), default=0)
    if q.name in FLAGSHIPS and row.rnd < latest:
        return 1  # stale flagship outranks the unproven tail (registry key)
    return 3


def test_window_groups_are_ordered():
    reg = load_all()
    status = _driver_status()
    fp_round = _fingerprint_rounds(reg)
    groups = [_group(q, status, fp_round) for q in reg.values()]
    assert groups == sorted(groups), groups


def test_green_tail_rotates_least_recently_verified_first():
    """Within the trusted-green tail (non-flagship), a query whose last
    driver row is older must sort before one verified more recently —
    this is what keeps the 50-entry window moving over all 130+
    queries instead of freezing on registration order."""
    reg = load_all()
    status = _driver_status()
    fp_round = _fingerprint_rounds(reg)
    tail_rounds = [
        status[q.name].rnd
        for q in reg.values()
        if _group(q, status, fp_round) == 3 and q.name not in FLAGSHIPS
    ]
    assert tail_rounds == sorted(tail_rounds), tail_rounds


def test_broken_queries_re_enter_window():
    """Any query whose latest driver row was red must land inside the
    driver's 50-entry verification window."""
    names = list(load_all())
    status = _driver_status()
    broken = [n for n in names if n in status and not status[n].ok]
    assert all(names.index(n) < 50 for n in broken), broken


def test_oracle_upgraded_queries_re_enter_window():
    """A query whose latest green driver row was rows-only but which now
    carries an oracle is unproven: the driver has never run its SQL
    side. It must sort into the window (verdict r4: stream_stateful_
    counts sat at position 134 and would never have been proven)."""
    reg = load_all()
    names = list(reg)
    status = _driver_status()
    upgraded = [
        n
        for n, q in reg.items()
        if q.oracle is not None
        and n in status
        and status[n].ok
        and status[n].rows_only
    ]
    assert all(names.index(n) < 50 for n in upgraded), upgraded


def test_edited_queries_re_enter_window(tmp_path, monkeypatch):
    """A fingerprint recorded after a query's last green round marks it
    unproven (the green row proved older code)."""
    import mr_py_spark.registry as regmod

    reg = load_all()
    status = _driver_status()
    # pick any trusted-green non-flagship query
    victim = next(
        n
        for n, q in reg.items()
        if n in status
        and status[n].ok
        and not (status[n].rows_only and q.oracle is not None)
        and n not in FLAGSHIPS
    )
    fp_round = _fingerprint_rounds(reg)
    forged = dict(fp_round, **{victim: status[victim].rnd + 1})
    monkeypatch.setattr(regmod, "_fingerprint_rounds", lambda _reg: forged)
    names = list(regmod._window_order(regmod.REGISTRY))
    assert names.index(victim) < 50, (victim, names.index(victim))


def test_fingerprint_sidecar_stable_across_loads():
    """Two consecutive loads with unchanged code must agree — the
    sidecar only moves when source or oracle text changes."""
    reg = load_all()
    assert _fingerprint_rounds(reg) == _fingerprint_rounds(reg)


def test_sidecar_never_written_from_pytest(monkeypatch):
    """A pytest process must NEVER persist fingerprint stamps (VERDICT
    r11): tests monkeypatch module constants, and a sidecar sync running
    while module state is patched hashes the patched values — poisoning
    entries with wrong fingerprints and dirtying the tree on every full
    test run. Force a dirty entry (a name the sidecar has never seen)
    through _fingerprint_rounds and assert the on-disk sidecar is
    byte-identical after — while the IN-MEMORY stamp still marks the
    new entry as upcoming (ordering behavior is ungated)."""
    import mr_py_spark.registry as regmod

    assert "PYTEST_CURRENT_TEST" in os.environ  # pytest sets it; the gate keys on it
    reg = dict(load_all())
    probe = "zz_sidecar_write_probe"
    reg[probe] = regmod.Query(name=probe, fn=load_all, oracle=None)
    before = open(regmod._FP_PATH, "rb").read()
    rounds = _fingerprint_rounds(reg)
    after = open(regmod._FP_PATH, "rb").read()
    assert before == after
    assert rounds[probe] > 0  # in-memory: stamped as upcoming, not persisted


def test_flagships_inside_driver_window_unless_fresh():
    """Bench headliners outrank other entries for the window whenever
    they are stale — but one verified green in the LATEST recorded
    round rotates on the normal LRV schedule instead of consuming a
    slot every round (slots the stale tail needs; see _window_order)."""
    names = list(load_all())
    window = set(names[:50])
    status = _driver_status()
    latest = max((r.rnd for r in status.values()), default=0)
    missing = [
        n
        for n in FLAGSHIPS
        if n not in window
        and not (
            (row := status.get(n)) is not None
            and row.ok
            and row.rnd >= latest
        )
    ]
    assert not missing, f"stale flagships outside driver window: {missing}"


def test_driver_status_reads_latest_round():
    """A query red in an early round but green in a later one counts
    green (and vice versa): later round files win; the recorded round
    number is the latest file's."""
    status = _driver_status()
    rounds = sorted(
        name
        for name in os.listdir(ROOT)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", name)
    )
    latest: dict[str, DriverRow] = {}
    for fname in rounds:
        rnd = int(re.search(r"r(\d+)", fname).group(1))
        with open(os.path.join(ROOT, fname)) as f:
            for qname, row in json.load(f).items():
                err = row.get("err")
                if err == "no_oracle":
                    ok, rows_only = row.get("spark_rows") is not None, True
                elif err:
                    ok, rows_only = False, False
                else:
                    ok = all(
                        row.get(m) is not False
                        for m in ("rows_match", "schema_match", "hash_match")
                    )
                    rows_only = False
                latest[qname] = DriverRow(ok, rnd, rows_only)
    assert status == latest


def test_driver_status_survives_list_shaped_round_file(tmp_path, monkeypatch):
    """A list-shaped CORRECTNESS file must be skipped, not crash
    load_all (ADVICE r4, registry.py)."""
    import mr_py_spark.registry as regmod

    bad = tmp_path / "CORRECTNESS_r99.json"
    bad.write_text(json.dumps([{"name": "x"}]))
    good = tmp_path / "CORRECTNESS_r01.json"
    good.write_text(json.dumps({"q": {"err": None, "rows_match": True,
                                      "schema_match": True, "hash_match": True}}))
    monkeypatch.setattr(regmod, "_ROOT", str(tmp_path))
    status = regmod._driver_status()
    assert status == {"q": DriverRow(True, 1, False)}


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


def test_verification_ledger_shape_and_staleness_budget():
    """VERDICT r9 item 5: the staleness budget. With n queries and a
    50-slot driver window, a full re-verification cycle is
    ceil(n/50) rounds; allow +2 rounds of margin for inflow (new and
    edited queries outrank the rotating tail). No green proof may be
    older than that — if this fires, the window ordering has stalled
    or the query count has outgrown the rotation (time to prune or
    shard the registry)."""
    import math

    from mr_py_spark.registry import verification_ledger

    reg = load_all()
    led = verification_ledger(reg)
    assert set(led) == set(reg)
    budget = math.ceil(len(reg) / 50) + 2
    over = {
        n: st["staleness"]
        for n, st in led.items()
        if st["state"] == "green" and st["staleness"] > budget
    }
    assert not over, f"stale proofs past the {budget}-round budget: {over}"
    # reds and never-verified must be inside the upcoming driver window
    # (they ARE the debt the rotation exists to drain)
    names = list(reg)
    debt = [n for n, st in led.items() if st["state"] in ("red", "never")]
    if len(debt) <= 50:
        outside = [n for n in debt if names.index(n) >= 50]
        assert not outside, f"unproven queries outside the window: {outside}"


def test_fingerprint_sees_module_data_constants(monkeypatch):
    """fp schema v2: changing a referenced module-level data constant
    (a threshold, a bucket count, a conf dict) must change the
    fingerprint — the r10 harden() conf edit escaped re-stamping
    because only function sources were hashed."""
    import mr_py_spark.operators.kmeans as km
    from mr_py_spark.registry import _fingerprint

    reg = load_all()
    q = reg["semantic_dedup"]
    before = _fingerprint(q)
    monkeypatch.setattr(km, "_TAU", 0.99)
    after = _fingerprint(q)
    assert before != after


def test_dep_closure_sees_function_local_imports():
    """fp schema v3 (r15): a dependency bound by a function-LOCAL
    ``from mr_py_spark... import x`` must be in the closure — the
    streaming module imports almost everything this way, so the
    globals-only walk (v2) silently missed e.g. an ivf_index_append
    edit under every streaming query. The v2 reproduction path
    (local_imports=False) must keep NOT seeing it, or migration
    re-checks would re-stamp the world."""
    from mr_py_spark.registry import _dep_closure

    def probe(spark, sf_dir):
        from mr_py_spark.operators.bucketed import replay_guard

        return replay_guard

    sources, _ = _dep_closure(probe)
    assert any("def replay_guard" in s for s in sources)
    sources_v2, _ = _dep_closure(probe, local_imports=False)
    assert not any("def replay_guard" in s for s in sources_v2)
    # constants bound by local import are folded too (the v2 rule,
    # extended to the local-import channel)
    def probe2(spark, sf_dir):
        from mr_py_spark.operators.bucketed import _BUCKETS

        return _BUCKETS

    _, consts = _dep_closure(probe2)
    assert any(
        c.startswith("mr_py_spark.operators.bucketed._BUCKETS=") for c in consts
    )
    # the closure is transitive THROUGH a locally-imported function
    def probe3(spark, sf_dir):
        from mr_py_spark.operators.dedup import lsh_index_append

        return lsh_index_append

    sources3, _ = _dep_closure(probe3)
    assert any("def lsh_index_append" in s for s in sources3)
    assert any("def raise_watermark" in s for s in sources3)  # its local import


def test_fingerprint_schema_migration_keeps_rounds(tmp_path, monkeypatch):
    """Bumping _FP_VERSION re-hashes entries but KEEPS their recorded
    round — PROVIDED the old-schema hash still matches (the query
    itself is unchanged). A real edit that shares a sync with the
    version bump must NOT ride the migration: it re-enters the window
    (ADVICE r11 — the exact miss class the sidecar exists to prevent)."""
    import json as _json

    import mr_py_spark.registry as regmod

    reg = load_all()
    victim = next(iter(reg))
    q = reg[victim]
    v1_fp = regmod._fingerprint_v1(q)
    side = tmp_path / ".fingerprints.json"
    side.write_text(_json.dumps({victim: {"fp": v1_fp, "round": 3, "v": 1}}))
    monkeypatch.setattr(regmod, "_FP_PATH", str(side))
    # this test exercises the WRITE path against a private tmp sidecar,
    # so lift the pytest write gate (test_sidecar_never_written_from_pytest
    # covers the gate itself against the real sidecar)
    monkeypatch.delenv("PYTEST_CURRENT_TEST", raising=False)
    rounds = regmod._fingerprint_rounds({victim: q})
    assert rounds[victim] == 3  # unchanged query: preserved
    stored = _json.loads(side.read_text())[victim]
    assert stored["v"] == regmod._FP_VERSION
    assert stored["fp"] == regmod._fingerprint(q)
    # an entry whose OLD-schema hash does NOT match (the query was
    # edited in the same sync as the bump) is re-stamped to upcoming
    side.write_text(
        _json.dumps({victim: {"fp": "edited-alongside-bump", "round": 3, "v": 1}})
    )
    rounds_edit = regmod._fingerprint_rounds({victim: q})
    assert rounds_edit[victim] > 3
    # an UNKNOWN recorded version (no keeper hash fn) also re-verifies
    side.write_text(_json.dumps({victim: {"fp": "???", "round": 3, "v": 99}}))
    assert regmod._fingerprint_rounds({victim: q})[victim] > 3
    # and a REAL change after a completed migration is still caught
    side.write_text(
        _json.dumps(
            {victim: {"fp": "now-stale-again", "round": 3, "v": regmod._FP_VERSION}}
        )
    )
    rounds2 = regmod._fingerprint_rounds({victim: q})
    assert rounds2[victim] > 3


def test_fingerprint_sees_harden_conf_dict(monkeypatch):
    """Regression for the exact r10 escape: every query reaches
    harden() through tbl(), and harden's behavior is driven by the
    module-level _RUNTIME_CONFS dict — editing it must re-stamp (under
    fp schema v1 it did not, which is why schema v2 exists)."""
    import mr_py_spark.session as sess
    from mr_py_spark.registry import _fingerprint

    reg = load_all()
    q = reg["q1_pricing_summary"]
    before = _fingerprint(q)
    monkeypatch.setattr(
        sess, "_RUNTIME_CONFS", dict(sess._RUNTIME_CONFS, **{"x.y": "z"})
    )
    after = _fingerprint(q)
    assert before != after


def test_survey8_table_matches_registry():
    """SURVEY.md §8's coverage table is GENERATED from registry tags
    (VERDICT r10 item 4: the hand table had drifted by 32 queries) —
    this pins it byte-for-byte: every registered query appears under
    each of its tags, no ghost entries, counts in the footer match.
    On failure: python scripts/gen_survey8.py --write."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_survey8", os.path.join(root, "scripts", "gen_survey8.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(root, "SURVEY.md")) as f:
        text = f.read()
    assert mod.current_block(text) == mod.generated_table(), (
        "SURVEY.md §8 drifted from registry tags; run "
        "scripts/gen_survey8.py --write"
    )
