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


# --------------------------------------------------------------------------
# Kaggle-shaped 100k fixture (VERDICT r5 ask #5): column distributions
# matched to the public flights_sample_3m dataset the reference runs on
# (SURVEY.md §6), so the silhouette reproduction runs in the regime the
# reference reports, not on a toy planted-cluster fixture.
# --------------------------------------------------------------------------

#: Departure-hour histogram: the US domestic two-bank day — near-dead
#: 00:00-04:59, a 06:00-09:00 morning bank, a flat midday plateau and a
#: 15:00-19:00 afternoon bank tapering through the evening.
KAGGLE_HOUR_WEIGHTS = [
    1, 1, 1, 1, 2, 14, 28, 30, 28, 26, 25, 26,
    27, 26, 25, 27, 28, 27, 26, 22, 16, 10, 5, 2,
]

#: Distance ~ lognormal(mu=6.48, sigma=0.72) clipped to [31, 5095] mi:
#: median ≈ 650, mean ≈ 840, long right tail to the transcon/Hawaii
#: routes — the public flights_sample_3m DISTANCE summary shape. This
#: is the load-bearing column: the reference clusters UNSCALED
#: features, so Distance (range ~5000) dominates the other three
#: (range ≤ 23) and the silhouette is a function of this distribution.
KAGGLE_DIST_MU = 6.48
KAGGLE_DIST_SIGMA = 0.72


def kaggle_shaped_2019_pdf(n: int = 100_000):
    """All-string 2019-shaped pandas frame (compat-scan shape), n rows,
    deterministic (numpy seed 42). Columns follow FLIGHTS_2019_RAW."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    month = rng.integers(1, 13, n)
    day = rng.integers(1, 29, n)
    hour_w = np.array(KAGGLE_HOUR_WEIGHTS, dtype=float)
    hour = rng.choice(24, size=n, p=hour_w / hour_w.sum())
    minute = rng.integers(0, 60, n)
    dep = (hour * 100 + minute).astype(float)
    dist = np.clip(
        rng.lognormal(KAGGLE_DIST_MU, KAGGLE_DIST_SIGMA, n), 31, 5095
    ).round()
    # delays: mostly early/on-time (normal around -5) with an
    # exponential late tail on ~25% of flights
    delay = np.round(
        rng.normal(-5, 18, n)
        + rng.exponential(20, n) * (rng.random(n) < 0.25),
        1,
    )
    cancelled = rng.random(n) < 0.025
    codes = rng.choice(["A", "B", "C", "D"], size=n)
    return pd.DataFrame(
        {
            "FL_DATE": [
                f"2019-{m:02d}-{d:02d}" for m, d in zip(month, day)
            ],
            "AIRLINE": rng.choice(AIRLINES, size=n),
            "DEP_TIME": [f"{v:.1f}" for v in dep],
            "DEP_DELAY": [f"{v:.1f}" for v in delay],
            "ARR_DELAY": [f"{v:.1f}" for v in delay],
            "CANCELLED": np.where(cancelled, "1.0", "0.0"),
            "DIVERTED": np.where(rng.random(n) < 0.002, "1.0", "0.0"),
            "DISTANCE": [f"{v:.1f}" for v in dist],
            "CANCELLATION_CODE": np.where(cancelled, codes, None),
        }
    )
