#!/usr/bin/env python
"""Recover the driver's per-query bench detail from a BENCH_r*.json wrapper.

The external driver runs bench.py in its own checkout, so the full
BENCH_DETAIL.json payload its run writes never lands in this tree; all
that survives is the wrapper's 2000-char ``tail`` buffer, which holds a
truncated suffix of the detail line plus the compact headline. The r9
verdict (defect #4) asked for the driver's own numbers to be committed
so round-over-round per-query comparisons use driver runs on BOTH
sides. This script extracts every intact ``"query": seconds`` pair from
the tail, keeps only names that exist in the query registry (dropping
headline fields and the leading truncated pair), and writes
``BENCH_DETAIL_driver_r{N}.json`` in the same shape bench_compare.py
reads:

    python scripts/recover_driver_detail.py BENCH_r09.json
    python scripts/bench_compare.py BENCH_DETAIL_driver_r09.json \
        BENCH_DETAIL_driver_r10.json

The output is PARTIAL by construction (the tail truncates the front of
the detail line) — ``"partial": true`` and ``"n_recovered"`` record
that, and bench_compare's common-set ratio handles the missing rows.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_flightanalysis_spark.queries.catalog import load_all  # noqa: E402


def recover(wrapper_path: str) -> dict:
    with open(wrapper_path, encoding="utf-8") as f:
        wrapper = json.load(f)
    tail = wrapper.get("tail", "")
    registry = set(load_all())
    queries: dict[str, float] = {}
    for name, val in re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', tail):
        if name in registry:
            # later occurrence wins: the sweep section re-times headline
            # queries, matching how bench.py's own detail payload reports
            queries[name] = float(val)
    headline = wrapper.get("parsed") or {}
    return {
        "metric": "driver_detail_recovered",
        "value": headline.get("value"),
        "unit": "sec",
        "sf": headline.get("sf", wrapper.get("sf")),
        "queries": dict(sorted(queries.items())),
        "partial": True,
        "n_recovered": len(queries),
        "headline": headline,
        "source": os.path.basename(wrapper_path),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wrapper", help="driver BENCH_r*.json wrapper to recover")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    m = re.search(r"r(\d+)", os.path.basename(args.wrapper))
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.wrapper)) or ".",
        f"BENCH_DETAIL_driver_r{int(m.group(1)):02d}.json" if m else "BENCH_DETAIL_driver.json",
    )
    payload = recover(args.wrapper)
    with open(out, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(
        f"{out}: recovered {payload['n_recovered']} per-query timings "
        f"(headline {payload['value']}s at sf={payload['sf']})"
    )


if __name__ == "__main__":
    main()
