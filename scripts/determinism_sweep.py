#!/usr/bin/env python
"""Determinism sweep: run every registry query TWICE in one session
and compare collected results exactly.

The driver's correctness gate hash-compares against DuckDB once per
round; a query that is nondeterministic across runs (unstable sort,
unseeded sample, time-dependent expression) can pass one round and
flake the next. This sweep catches that class before the driver does:
any query whose two runs differ is listed in the output JSON.

    python scripts/determinism_sweep.py [sf_dir]

Exit code 1 if any query is nondeterministic OR any query errored
(an erroring query proved nothing about its determinism — read the
"errors" key of the output JSON to tell the two classes apart).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_flightanalysis_spark.queries.catalog import load_all
from bigdata_flightanalysis_spark.session import get_session


def _snapshot(df):
    cols = df.columns
    rows = sorted((tuple(repr(v) for v in r) for r in df.collect()), key=repr)
    return cols, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("determinism-sweep")
    registry = load_all()
    unstable: dict[str, str] = {}
    errors: dict[str, str] = {}
    for name, q in registry.items():
        try:
            a = _snapshot(q.fn(spark, sf_dir))
            b = _snapshot(q.fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        if a != b:
            # columns first: two runs differing only in the column
            # list used to report 'row counts N vs N' with EQUAL
            # numbers — no visible difference at all (r16 review)
            if a[0] != b[0]:
                first = f"columns {a[0]} vs {b[0]}"
            else:
                first = next(
                    (str((x, y)) for x, y in zip(a[1], b[1]) if x != y),
                    f"row counts {len(a[1])} vs {len(b[1])}",
                )
            unstable[name] = first[:300]
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(registry),
        "unstable": unstable,
        "errors": errors,
    }
    print(json.dumps(out))
    spark.stop()
    if unstable or errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
