"""Deterministic flight fixtures (FIXTURES.md §A), seed 42.

Raw fixtures are ALL-STRING, exactly as the reference's schemaless CSV
scan delivers them (``Code/flight_analysis.py:15-16``); typed fixtures
model the engine's explicit-schema scan.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from bigdata_flightanalysis_spark.schemas import (
    FLIGHTS_2019_RAW,
    FLIGHTS_2019_TYPED,
    FLIGHTS_2023_RAW,
    FLIGHTS_2023_TYPED,
)

AIRLINES = ["Delta", "United", "Southwest Airlines", "American Airlines", "Frontier Airlines"]
REASONS_2023 = ["None", "Weather", "Air Traffic Control", "Maintenance"]


def rows_2019(n: int = 80) -> list[tuple]:
    rng = random.Random(42)
    rows = []
    for i in range(n):
        cancelled = rng.random() < 0.2
        rows.append(
            (
                f"2019-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
                rng.choice(AIRLINES),
                f"{rng.randint(0, 23) * 100 + rng.randint(0, 59)}.0",
                f"{rng.randint(-10, 120)}.0",
                f"{rng.randint(-20, 180)}.0",
                "1.0" if cancelled else "0.0",
                "1.0" if rng.random() < 0.02 else "0.0",
                f"{rng.randint(30, 5000)}.0",
                rng.choice(["A", "B", "C", "D"]) if cancelled else None,
            )
        )
    # Edge rows (FIXTURES.md §A): all-null fill targets, unexpected
    # code 'E', HHMM boundaries 0.0 / 2400.0.
    rows += [
        (None, None, None, None, None, None, None, None, None),
        ("2019-06-15", "Delta", "2400.0", "0.0", "9.0", "1.0", "0.0", "100.0", "E"),
        ("2019-06-16", "United", "0.0", "0.0", "-5.0", "0.0", "0.0", "200.0", None),
    ]
    return rows


def rows_2023(n: int = 80) -> list[tuple]:
    rng = random.Random(4242)
    rows = []
    for i in range(n):
        rows.append(
            (
                f"2023-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d} "
                f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:00",
                f"{rng.randint(-15, 120)}.0",
                "True" if rng.random() < 0.15 else "False",
                "True" if rng.random() < 0.02 else "False",
                f"{rng.randint(100, 3000)}.0",
                rng.choice(AIRLINES),
                rng.choice(REASONS_2023),
            )
        )
    rows += [
        (None, None, None, None, None, None, None),
        ("2023-07-01 08:11:00", "6.0", "True", "False", "500.0", "Delta", "Weather"),
    ]
    return rows


def _typed_2019(row: tuple):
    import datetime

    d, airline, dep, depd, arrd, canc, div, dist, code = row
    conv = lambda s: float(s) if s is not None else None  # noqa: E731
    return (
        datetime.date.fromisoformat(d) if d else None,
        airline,
        conv(dep),
        conv(depd),
        conv(arrd),
        conv(canc),
        conv(div),
        conv(dist),
        code,
    )


def _typed_2023(row: tuple):
    import datetime

    sched, dm, canc, div, dist, airline, reason = row
    return (
        datetime.datetime.fromisoformat(sched) if sched else None,
        float(dm) if dm is not None else None,
        canc == "True" if canc is not None else None,
        div == "True" if div is not None else None,
        float(dist) if dist is not None else None,
        airline,
        reason,
    )


def raw_2019(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(rows_2019(), FLIGHTS_2019_RAW)


def raw_2023(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(rows_2023(), FLIGHTS_2023_RAW)


def typed_2019(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [_typed_2019(r) for r in rows_2019()], FLIGHTS_2019_TYPED
    )


def typed_2023(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [_typed_2023(r) for r in rows_2023()], FLIGHTS_2023_TYPED
    )
