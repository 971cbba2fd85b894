#!/usr/bin/env python
"""Regenerate docs/OPERATORS.md from the live registry.

One row per driver-gate query, in gate order (oracle-backed first), with
the first line of each implementation's docstring as the summary. Run
after adding/renaming/merging registry queries:

    python tools/gen_operators_doc.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entangledb_spark import registry  # noqa: E402

HEADER = """# Operator & query reference

One row per driver-gate query ({total} total: {n_oracle} oracle-backed,
{n_rows_only} rows-only — within the driver's 50-row CORRECTNESS window,
so EVERY query gets a correctness row each round). **oracle** =
value-hash-compared against DuckDB at sf0.01 (since round 10 that is ALL
of them: the seeded-hash gate queries run engine-portable md5/knuth twin
primitives — docs/TWINS.md — while production callers keep xxhash64;
quantitative gates additionally live in tests/: LSH recall vs exact
Jaccard, ANN recall vs brute force for all three index branches).
Implementations live in `entangledb_spark/operators/` and
`entangledb_spark/streaming/`.

This file is GENERATED — edit tools/gen_operators_doc.py, not this file.

| query | check | summary |
|---|---|---|
"""


def first_doc_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    line = doc.splitlines()[0].strip() if doc else ""
    return line.replace("|", "\\|")


def main() -> None:
    registry.load_all()
    ordered = registry.ordered_queries()
    n_oracle = sum(1 for n in ordered if n in registry.ORACLES)
    rows = [
        f"| {name} | {'oracle' if name in registry.ORACLES else 'rows-only'} "
        f"| {first_doc_line(fn)} |"
        for name, fn in ordered.items()
    ]
    out = HEADER.format(
        total=len(ordered), n_oracle=n_oracle, n_rows_only=len(ordered) - n_oracle
    ) + "\n".join(rows) + "\n"
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "OPERATORS.md")
    with open(dest, "w") as f:
        f.write(out)
    print(f"wrote {dest}: {len(ordered)} queries ({n_oracle} oracle-backed)")


if __name__ == "__main__":
    main()
