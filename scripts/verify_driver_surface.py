#!/usr/bin/env python
"""Driver-surface verification: what the driver's t2 gate does.

Vanilla SparkSession (NOT get_session — catches session-config
dependencies) → entry() returns rows → every queries() entry vs its
oracle_sql() through DuckDB, order-insensitive exact compare; rows-only
entries must at least execute.

    python scripts/verify_driver_surface.py [sf_dir] [query_name ...]

With query names given, only those registry entries are checked (fast
iteration on a new query); with none, the full registry runs.
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    e = importlib.import_module("__spark_entry__")
    assert len(e.entry(spark).collect()) > 0, "entry() returned no rows"
    qs, oracles = e.queries(), e.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        missing = only - set(qs)
        if missing:
            raise SystemExit(f"unknown query names: {sorted(missing)}")
        qs = {n: f for n, f in qs.items() if n in only}
        oracles = {n: s for n, s in oracles.items() if n in only}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name, sql in oracles.items():
        sdf = qs[name](spark, sf)
        scols = sorted(sdf.columns)
        srows = sorted(
            [tuple(r[c] for c in scols) for r in sdf.collect()], key=repr
        )
        rel = con.execute(sql)
        dcols = [d[0] for d in rel.description]
        drows = sorted(
            [tuple(r[dcols.index(c)] for c in scols) for r in rel.fetchall()],
            key=repr,
        )
        if srows != drows:
            bad.append(name)
            print(f"MISMATCH {name}")
    for name in sorted(set(qs) - set(oracles)):
        qs[name](spark, sf).limit(3).collect()
    print(f"checked {len(oracles)} oracle + {len(qs) - len(oracles)} "
          f"rows-only queries; mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
