"""Adversarial differential tests: the sf fixtures exercise the happy
path; these build tiny hand-crafted events tables targeting the edge
semantics the round-7 changes pinned — degenerate regression groups
(zero x/y variance must yield NULL on BOTH engines, not inf/NaN) and
discrete-percentile boundary ties (window form, percentile_disc
two-pass form, and the DuckDB oracle must agree exactly when the
quantile lands ON a tie run)."""

from __future__ import annotations

import math
from datetime import datetime, timezone

import duckdb
import pytest

from bigdata_flightanalysis_spark.queries.catalog import load_all

REGISTRY = load_all()

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _t(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 3, 1, 12, minute, second)


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    """events.parquet with: a single-event group, a zero-x-variance
    group (all same ts), a zero-y-variance group (constant value), a
    tie-heavy group where p05/p50/p95 land on tie runs, and one
    ordinary group."""
    rows = []
    # 'single': one event — n*sxx - sx^2 == 0 AND syy degenerate
    rows.append((1, _t(0), 1, "single", 5.0, "{}"))
    # 'xconst': x variance 0 (identical ts), y varies
    rows += [(10 + i, _t(1), 2, "xconst", float(i), "{}") for i in range(4)]
    # 'yconst': y variance 0 (constant value), x varies
    rows += [(20 + i, _t(2 + i), 3, "yconst", 7.5, "{}") for i in range(5)]
    # 'ties': 20 values, heavy tie runs: 1.0 x10, 2.0 x9, 100.0 x1
    vals = [1.0] * 10 + [2.0] * 9 + [100.0]
    rows += [
        (40 + i, _t(10 + i), 4, "ties", v, "{}") for i, v in enumerate(vals)
    ]
    # 'normal': varied
    rows += [
        (80 + i, _t(30 + i), 5, "normal", float((i * 7) % 13) + 0.25, "{}")
        for i in range(12)
    ]
    base = tmp_path_factory.mktemp("adversarial")
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        f"{base}/events.parquet"
    )
    return str(base)


@pytest.fixture(scope="module")
def adversarial_duck(adversarial_dir):
    con = duckdb.connect()
    # Spark writes a part-file DIRECTORY; DuckDB needs the glob form
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{adversarial_dir}/events.parquet/*.parquet'"
    )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _compare(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.execute(q.oracle)
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), name
    assert len(srows) == len(drows), (name, len(srows), len(drows))
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    a = sorted((tuple(_norm(r[i]) for i in sidx) for r in srows), key=repr)
    b = sorted((tuple(_norm(r[i]) for i in didx) for r in drows), key=repr)
    assert a == b, f"{name}: {[(x, y) for x, y in zip(a, b) if x != y][:3]}"
    return a


def test_trend_degenerate_groups_null_on_both(
    spark, adversarial_dir, adversarial_duck
):
    rows = _compare(
        "events_type_trend", spark, adversarial_dir, adversarial_duck
    )
    by_type = {r[0]: r for r in rows}  # sorted cols: event_type first
    cols = sorted(
        REGISTRY["events_type_trend"].fn(spark, adversarial_dir).columns
    )
    i_slope = cols.index("slope_per_day")
    i_r = cols.index("pearson_r")
    # single event / zero x-variance: slope AND r must be NULL
    for g in ("single", "xconst"):
        assert by_type[g][i_slope] is None, (g, by_type[g])
        assert by_type[g][i_r] is None, (g, by_type[g])
    # constant value: slope is defined (0), but r's denominator is 0
    assert by_type["yconst"][i_slope] == 0.0
    assert by_type["yconst"][i_r] is None
    # ordinary group: both defined
    assert by_type["normal"][i_slope] is not None
    assert by_type["normal"][i_r] is not None


@pytest.mark.parametrize(
    "name",
    [
        "events_value_winsorized",
        "events_value_winsorized_twopass",
        "events_mad_anomalies",
        "events_mad_anomalies_twopass",
    ],
)
def test_robust_stats_tie_boundaries_match_oracle(
    name, spark, adversarial_dir, adversarial_duck
):
    _compare(name, spark, adversarial_dir, adversarial_duck)


def test_twopass_equals_window_on_adversarial_data(spark, adversarial_dir):
    for a, b in (
        ("events_value_winsorized", "events_value_winsorized_twopass"),
        ("events_mad_anomalies", "events_mad_anomalies_twopass"),
    ):
        ra = sorted(map(tuple, REGISTRY[a].fn(spark, adversarial_dir).collect()))
        rb = sorted(map(tuple, REGISTRY[b].fn(spark, adversarial_dir).collect()))
        assert ra == rb, (a, b)
