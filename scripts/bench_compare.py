#!/usr/bin/env python
"""Diff two bench outputs (bench.py JSON lines or driver BENCH_r*.json
wrappers): per-query ratios over the common headline set, worst
regressions first — the round-over-round perf triage tool.

    python scripts/bench_compare.py BENCH_r05.json /tmp/bench_now.json
"""

from __future__ import annotations

import json
import re
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    # driver wrapper: the payload is the last JSON object in "tail"
    m = re.search(r'\{"metric".*', d.get("tail", ""))
    if not m:
        raise SystemExit(f"{path}: no bench payload found")
    return json.loads(m.group(0))


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    if not common:
        raise SystemExit("no common queries")
    ta, tb = sum(qa[q] for q in common), sum(qb[q] for q in common)
    print(
        f"common {len(common)} queries: {ta:.2f}s -> {tb:.2f}s "
        f"(ratio {tb / ta:.3f})"
    )
    rows = sorted(
        ((qb[q] / max(qa[q], 1e-9), q, qa[q], qb[q]) for q in common),
        reverse=True,
    )
    print(f"{'ratio':>7}  {'before':>8}  {'after':>8}  query")
    for r, q, x, y in rows[:15]:
        print(f"{r:7.2f}  {x:8.3f}  {y:8.3f}  {q}")
    only_b = sorted(set(qb) - set(qa))
    if only_b:
        print("new (no baseline):", ", ".join(only_b))


if __name__ == "__main__":
    main()
