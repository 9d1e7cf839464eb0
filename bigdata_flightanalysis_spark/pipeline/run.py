"""Executable flight-analysis pipeline — the engine's replacement for
running ``Code/flight_analysis.py`` top-to-bottom.

    python -m bigdata_flightanalysis_spark.pipeline.run \
        --csv-2019 Data/2019.csv --csv-2023 Data/2023.csv \
        --out /tmp/flight_out [--mode idiomatic|compat] [--k 5] [--seed 42]

With no ``--csv-*`` arguments it runs on the built-in deterministic
fixtures (``--demo``), so the end-to-end path is runnable anywhere.

Outputs mirror the reference's observable behavior
(``Code/flight_analysis.py:19-26,95-120,144-152,209-216,244-246``):
head displays, silhouette scores, per-(cluster, reason) counts, top-5
airlines by cancellations, and the stringified-features sink — CSV for
compat, parquet alongside it as the scale-sane default.
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import DataFrame, SparkSession


def _display(df: DataFrame, title: str, n: int = 10) -> None:
    print(f"\n=== {title} ===")
    df.limit(n).show(truncate=False)


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--csv-2019", default=None)
    parser.add_argument("--csv-2023", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--mode", choices=["idiomatic", "compat"], default="idiomatic")
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--demo", action="store_true",
        help="run on built-in fixtures (implied when no CSVs given)",
    )
    args = parser.parse_args(argv)
    # one CSV alone silently ran the built-in fixtures and wrote
    # demo artifacts that looked like results for the user's file
    # (r16 review) — the pair is all-or-nothing, and --demo must not
    # contradict explicit CSVs
    if bool(args.csv_2019) != bool(args.csv_2023):
        parser.error("--csv-2019 and --csv-2023 must be given together")
    if args.demo and args.csv_2019:
        parser.error("--demo contradicts --csv-2019/--csv-2023")

    from bigdata_flightanalysis_spark.pipeline import (
        run_flight_pipeline,
        stringify_features,
    )
    from bigdata_flightanalysis_spark.schemas import (
        FLIGHTS_2019_RAW,
        FLIGHTS_2019_TYPED,
        FLIGHTS_2023_RAW,
        FLIGHTS_2023_TYPED,
    )
    from bigdata_flightanalysis_spark.session import get_session
    from bigdata_flightanalysis_spark.sources.readers import read_csv
    from bigdata_flightanalysis_spark.sources.writers import write_csv, write_parquet

    spark: SparkSession = get_session("flight-analysis")

    # The scan schema must match the mode: compat pins the reference's
    # all-string scan (Code/flight_analysis.py:15-16, no inference
    # pass); idiomatic REQUIRES the typed scan — its cleaning stage
    # documents fills applied after types exist, and its bare
    # .cast('boolean') on a string '0.0' would throw under Spark 4
    # ANSI the moment a consumer materialized those columns.
    if args.csv_2019 and args.csv_2023:
        if args.mode == "compat":
            raw19 = read_csv(spark, args.csv_2019, schema=FLIGHTS_2019_RAW)
            raw23 = read_csv(spark, args.csv_2023, schema=FLIGHTS_2023_RAW)
        else:
            raw19 = read_csv(spark, args.csv_2019, schema=FLIGHTS_2019_TYPED)
            raw23 = read_csv(spark, args.csv_2023, schema=FLIGHTS_2023_TYPED)
    elif args.mode == "compat":
        from tests.flight_fixtures import raw_2019, raw_2023

        raw19 = raw_2019(spark)
        raw23 = raw_2023(spark)
    else:
        from tests.flight_fixtures import typed_2019, typed_2023

        raw19 = typed_2019(spark)
        raw23 = typed_2023(spark)

    _display(raw19, "2019 raw head", 5)
    _display(raw23, "2023 raw head", 5)

    result = run_flight_pipeline(
        raw19, raw23, mode=args.mode, k=args.k, seed=args.seed
    )

    print(f"\nSilhouette 2019: {result.silhouette_2019:.4f}")
    print(f"Silhouette 2023: {result.silhouette_2023:.4f}")
    _display(result.reasons_2019, "2019 (cluster, cancellation reason) counts", 20)
    _display(result.reasons_2023, "2023 (cluster, delay reason) counts", 20)
    _display(result.top_airlines_2023, "Top-5 airlines by cancellations (2023)", 5)

    os.makedirs(args.out, exist_ok=True)
    for year, preds in (("2019", result.predictions_2019),
                        ("2023", result.predictions_2023)):
        sink_ready = stringify_features(preds, mode=args.mode)
        write_csv(sink_ready, f"{args.out}/predictions_{year}_csv")
        write_parquet(sink_ready, f"{args.out}/predictions_{year}_parquet")
    print(f"\nWrote predictions under {args.out}")

    # The reference's chart output (Code/flight_analysis.py:150-185),
    # as dependency-free SVG+JSON artifacts.
    from bigdata_flightanalysis_spark.pipeline.reports import (
        write_flight_report,
    )

    report_dir = f"{args.out}/report"
    write_flight_report(result, report_dir)
    result.unpersist()
    print(f"Wrote report (SVG+JSON charts) under {report_dir}")


if __name__ == "__main__":
    main()
