#!/usr/bin/env python
"""Freeze the consolidated bench baseline (BENCH_BASELINE.json).

The original 2x-gate reference (BENCH_r02.json) predates the round-3+
headline additions, so 20 of the 53 headline queries had no recorded
baseline and the regression detector had no teeth for them. This tool
merges, with provenance:

- BENCH_r02 rows verbatim where they exist (the original gate is never
  loosened by re-recording on a possibly-faster round), plus
- the earliest later bench round that covers each remaining query
  (BENCH_r05 for the round-3..5 additions).

Re-run with new round files listed in FILLS to extend coverage as the
headline list grows. bench.py prefers BENCH_BASELINE.json and falls
back to BENCH_r02.json.

Usage: python tools/freeze_baseline.py
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANCHOR = "BENCH_r02.json"
FILLS = [  # earliest-first; first file covering a query wins
    "BENCH_r05.json",
    "BENCH_r06_local.json",
    "BENCH_r06_local2.json",
    "BENCH_r06_local3.json",
    "BENCH_r06_local4.json",
    "BENCH_r06_local5.json",
]


def _queries(path: str) -> dict[str, float]:
    with open(os.path.join(ROOT, path)) as f:
        raw = json.load(f)
    return (raw.get("parsed") or raw).get("queries", {})


def main() -> None:
    queries: dict[str, float] = {}
    sources: dict[str, str] = {}
    for name, sec in _queries(ANCHOR).items():
        queries[name] = sec
        sources[name] = ANCHOR
    for fill in FILLS:
        for name, sec in _queries(fill).items():
            if name not in queries:
                queries[name] = sec
                sources[name] = fill
    out = {
        "note": (
            "Consolidated recorded bench baseline: BENCH_r02 rows verbatim "
            "(the original 2x gate), later-round rows only for queries r02 "
            "never covered. Regenerate with tools/freeze_baseline.py."
        ),
        "queries": dict(sorted(queries.items())),
        "sources": dict(sorted(sources.items())),
    }
    dest = os.path.join(ROOT, "BENCH_BASELINE.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    counts: dict[str, int] = {}
    for s in sources.values():
        counts[s] = counts.get(s, 0) + 1
    print(f"wrote {dest}: {len(queries)} queries {counts}")


if __name__ == "__main__":
    main()
