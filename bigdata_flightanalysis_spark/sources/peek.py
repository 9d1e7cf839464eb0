"""Data peek CLI — the engine's replacement for ``Code/data_view.py``
(S5): print the head of any CSV/parquet through the same scan
operators the engine uses, instead of an eager pandas read.

    python -m bigdata_flightanalysis_spark.sources.peek path [--n 5]
"""

from __future__ import annotations

import argparse
import os


#: write_csv with any codec option appends the codec suffix AFTER
#: .csv — a .csv.gz dir used to route to the parquet reader and die
#: on a missing footer (r16 review)
_CSV_SUFFIXES = (
    ".csv", ".csv.gz", ".csv.bz2", ".csv.zst", ".csv.snappy",
    ".csv.deflate", ".csv.lz4",
)


def _is_csv(path: str) -> bool:
    """CSV detection for the peek CLI: case-insensitive suffix
    (compressed variants included), or a directory whose data files —
    at any depth, so hive-partitioned ``col=value`` CSV layouts count
    — are all CSVs (the engine's own write_csv sink layouts). A bare
    lowercase-``.csv`` check fed CSV dirs, ``.CSV`` files, ``.csv.gz``
    codecs and partitioned layouts to the parquet reader."""
    if path.lower().rstrip("/").endswith(_CSV_SUFFIXES):
        return True
    if os.path.isdir(path):
        found: list[str] = []
        for root, dirs, files in os.walk(path):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            found += [f for f in files if not f.startswith(("_", "."))]
        return bool(found) and all(
            f.lower().endswith(_CSV_SUFFIXES) for f in found
        )
    return False


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("path")
    parser.add_argument("--n", type=int, default=5)
    args = parser.parse_args(argv)

    from bigdata_flightanalysis_spark.session import get_session
    from bigdata_flightanalysis_spark.sources.readers import read_csv

    spark = get_session("peek")
    if _is_csv(args.path):
        # the engine's own compat scan (header on, all-string, no
        # inference) — not a re-implementation that could drift
        df = read_csv(spark, args.path, compat_all_string=True)
    else:
        df = spark.read.parquet(args.path)
    df.printSchema()
    df.show(args.n, truncate=False)


if __name__ == "__main__":
    main()
