#!/usr/bin/env python
"""Regenerate SURVEY.md §8's id->queries coverage table from registry
tags (VERDICT r10 item 4: the hand-maintained table had drifted by 32
queries). The table lives between the BEGIN/END markers below; prose
history around it is untouched.

Usage:
  python scripts/gen_survey8.py --check   # exit 1 on drift (CI/test)
  python scripts/gen_survey8.py --write   # rewrite the block in place
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SURVEY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
BEGIN = "<!-- BEGIN GENERATED §8 TABLE (scripts/gen_survey8.py --write; tested by tests/test_registry.py) -->"
END = "<!-- END GENERATED §8 TABLE -->"

#: §2 ids with no registered query (capability proven another way).
NO_QUERY_IDS = {
    "A4": "combiner — free in every groupBy (Catalyst partial aggregation; "
          "plan-asserted in tests/test_plans.py::test_q1_filter_pushdown_and_pruning)",
}

ALL_IDS = (
    [f"A{i}" for i in range(1, 10)]
    + [f"B{i}" for i in range(1, 41)]
    + [f"C{i}" for i in range(1, 10)]
)


def generated_table() -> str:
    """The §8 table text (marker lines included). ` * ` suffix = a
    rows-only query (oracle=None, property-tested per SURVEY §5.4)."""
    from mr_py_spark.registry import load_all

    reg = load_all()
    bytag: dict[str, list[str]] = {}
    for q in reg.values():
        for t in q.tags:
            bytag.setdefault(t, []).append(q.name)
    unknown = sorted(set(bytag) - set(ALL_IDS))
    assert not unknown, f"tags outside the §2 id list: {unknown}"
    lines = [
        BEGIN,
        "",
        "| §2 id | queries (`*` = rows-only, property-tested) |",
        "|---|---|",
    ]
    for i in ALL_IDS:
        if i in NO_QUERY_IDS:
            lines.append(f"| {i} | {NO_QUERY_IDS[i]} |")
            continue
        names = sorted(bytag.get(i, []))
        cells = ", ".join(
            f"`{n}`*" if reg[n].oracle is None else f"`{n}`" for n in names
        )
        lines.append(f"| {i} | {cells} |")
    n_oracle = sum(1 for q in reg.values() if q.oracle is not None)
    lines += [
        "",
        f"({len(reg)} registered queries: {n_oracle} oracle-backed, "
        f"{len(reg) - n_oracle} rows-only with property tests.)",
        "",
        END,
    ]
    return "\n".join(lines)


def current_block(text: str) -> str | None:
    m = re.search(re.escape(BEGIN) + r".*?" + re.escape(END), text, re.DOTALL)
    return m.group(0) if m else None


def main() -> None:
    ap = argparse.ArgumentParser()
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--check", action="store_true")
    mode.add_argument("--write", action="store_true")
    args = ap.parse_args()

    want = generated_table()
    with open(SURVEY) as f:
        text = f.read()
    have = current_block(text)
    if args.check:
        if have != want:
            print("SURVEY.md §8 table drifted from registry tags; run "
                  "scripts/gen_survey8.py --write", file=sys.stderr)
            sys.exit(1)
        print("SURVEY.md §8 table matches the registry")
        return
    if have is None:
        print("no generated-table markers in SURVEY.md; insert them first",
              file=sys.stderr)
        sys.exit(1)
    with open(SURVEY, "w") as f:
        f.write(text.replace(have, want))
    print("SURVEY.md §8 table rewritten")


if __name__ == "__main__":
    main()
