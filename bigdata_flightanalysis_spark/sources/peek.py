"""Data peek CLI — the engine's replacement for ``Code/data_view.py``
(S5): print the head of any CSV/parquet through the same scan
operators the engine uses, instead of an eager pandas read.

    python -m bigdata_flightanalysis_spark.sources.peek path [--n 5]
"""

from __future__ import annotations

import argparse
import os


def _is_csv(path: str) -> bool:
    """CSV detection for the peek CLI: case-insensitive suffix, or a
    directory whose data files are CSVs (the engine's own write_csv
    sink layout) — a bare lowercase-suffix check fed CSV dirs and
    ``.CSV`` files to the parquet reader."""
    if path.lower().rstrip("/").endswith(".csv"):
        return True
    if os.path.isdir(path):
        try:
            entries = os.listdir(path)
        except OSError:
            return False
        data = [e for e in entries if not e.startswith(("_", "."))]
        return bool(data) and all(e.lower().endswith(".csv") for e in data)
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
