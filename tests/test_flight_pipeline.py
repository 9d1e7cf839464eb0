"""Unit + equivalence tests for the flight pipeline (SURVEY.md §5.3-§5.6).

Covers the reference quirks explicitly (§2.12): no-ELSE CASE, fillna
no-ops on the all-string scan, HHMM boundary values, boolean-cast
corners, tie semantics, seed-stable clustering.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.pipeline import flights as P
from tests import flight_fixtures as fx


@pytest.fixture(scope="module")
def raw19(spark):
    return fx.raw_2019(spark)


@pytest.fixture(scope="module")
def raw23(spark):
    return fx.raw_2023(spark)


@pytest.fixture(scope="module")
def typed19(spark):
    return fx.typed_2019(spark)


@pytest.fixture(scope="module")
def typed23(spark):
    return fx.typed_2023(spark)


# --------------------------------------------------------------------------
# Cleaning
# --------------------------------------------------------------------------


def test_clean_2019_compat_quirks(raw19):
    out = P.clean_flights_2019(raw19, "compat")
    assert out.columns == [
        "FL_DATE", "DepTime", "ArrDelay", "Cancelled", "Diverted",
        "Distance", "Airline", "DelayReason", "CancellationReason",
    ]
    rows = {r["Airline"]: r for r in out.collect()}
    # all-null edge row: numeric/boolean fillna entries no-op on the
    # string scan (quirk §2.12.2) → stay NULL through the casts; the
    # string fills take effect.
    nullrow = rows["Not Listed"]
    assert nullrow["Cancelled"] is None
    assert nullrow["ArrDelay"] is None
    assert nullrow["DepTime"] is None
    # null code → filled "None" → mapped (reference :34)
    assert nullrow["CancellationReason"] == "No Cancellation"
    # unexpected code 'E' → no-ELSE CASE yields NULL (quirk §2.12.4)
    e_row = [r for r in out.collect() if r["DelayReason"] == "E"]
    assert len(e_row) == 1 and e_row[0]["CancellationReason"] is None


def test_clean_2019_idiomatic_fills_are_effective(typed19):
    out = P.clean_flights_2019(typed19, "idiomatic")
    nullrow = [r for r in out.collect() if r["Airline"] == "Not Listed"]
    assert len(nullrow) == 1
    assert nullrow[0]["Cancelled"] is False  # fill happened pre-cast
    assert nullrow[0]["ArrDelay"] == 0.0
    # unexpected code gets the explicit bucket, not NULL
    e_row = [r for r in out.collect() if r["DelayReason"] == "E"]
    assert e_row[0]["CancellationReason"] == "Unknown"


def test_clean_modes_agree_on_well_formed_rows(raw19, typed19):
    """Where the reference's semantics are well-defined (no nulls, known
    codes) compat and idiomatic must produce identical cleaned rows."""
    compat = P.clean_flights_2019(raw19, "compat").filter(
        F.col("FL_DATE").isNotNull() & (F.col("DelayReason") != "E")
    )
    idio = P.clean_flights_2019(typed19, "idiomatic").filter(
        F.col("FL_DATE").isNotNull() & (F.col("DelayReason") != "E")
    )
    a = sorted(
        [tuple(str(v) for v in r) for r in compat.collect()]
    )
    b = sorted(
        [tuple(str(v) for v in r) for r in idio.collect()]
    )
    assert a == b


def test_clean_2023(raw23):
    out = P.clean_flights_2023(raw23, "compat")
    assert out.columns == [
        "ScheduledDeparture", "DelayMinutes", "Cancelled", "Diverted",
        "Distance", "Airline", "DelayReason",
    ]
    nullrow = [r for r in out.collect() if r["Airline"] == "Not Listed"][0]
    assert nullrow["DelayReason"] == "None"  # string fill effective
    assert nullrow["DelayMinutes"] is None  # double fill no-op (compat)


# --------------------------------------------------------------------------
# Feature prep (X6-X9) — HHMM boundaries, hour() on timestamp
# --------------------------------------------------------------------------


def test_prep_2019_hhmm_boundaries(raw19):
    prepped = P.prep_features_2019(P.clean_flights_2019(raw19, "compat"), "compat")
    by_time = {r["DepTime"]: r for r in prepped.collect()}
    assert by_time[2400.0]["DepHour"] == 24  # reference keeps the wrap value
    # idiomatic mode wraps midnight into [0, 24) (r14 review: the
    # wrapped form was documented but never wired in)
    idio = P.prep_features_2019(P.clean_flights_2019(raw19, "compat"))
    assert {r["DepTime"]: r for r in idio.collect()}[2400.0]["DepHour"] == 0
    assert by_time[0.0]["DepHour"] == 0
    june15 = [r for r in prepped.collect() if r["FL_DATE"] == "2019-06-15"][0]
    assert june15["DayofWeek"] == 7  # 2019-06-15 is a Saturday (1=Sunday)
    assert june15["Month"] == 6


def test_prep_2023_hour_from_timestamp(raw23):
    prepped = P.prep_features_2023(P.clean_flights_2023(raw23, "compat"))
    r = [
        x
        for x in prepped.collect()
        if x["ScheduledDeparture"] == "2023-07-01 08:11:00"
    ][0]
    assert r["DepHour"] == 8  # "2023-07-01 08:11:00"
    assert r["Month"] == 7


def test_delay_label(raw23):
    df = P.add_delay_label(
        P.prep_features_2023(P.clean_flights_2023(raw23, "compat")), "DelayMinutes"
    )
    for r in df.collect():
        if r["DelayMinutes"] is None:
            assert r["IsDelayed"] == 0  # NULL > 5 is NULL → otherwise(0)
        else:
            assert r["IsDelayed"] == (1 if r["DelayMinutes"] > 5 else 0)


# --------------------------------------------------------------------------
# Assembly / sanitization
# --------------------------------------------------------------------------


def test_sanitize_features(spark):
    df = spark.createDataFrame(
        [(float("nan"), 1.0, 2.0, float("inf")), (1.0, 2.0, 3.0, 4.0)],
        "DayofWeek double, DepHour double, Month double, Distance double",
    )
    out = P.sanitize_features(df).collect()
    assert out[0]["DayofWeek"] == 0.0 and out[0]["Distance"] == 0.0
    assert out[1]["Distance"] == 4.0


def test_assemble_keeps_reason(typed19):
    prepped = P.prep_features_2019(P.clean_flights_2019(typed19, "idiomatic"))
    assembled = P.assemble_features(prepped, keep_cols=("CancellationReason",))
    assert assembled.columns == ["features", "CancellationReason"]
    assert assembled.count() == prepped.count()  # handleInvalid="keep"


# --------------------------------------------------------------------------
# Clustering invariants (§5.6 — non-SQL-expressible)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pipeline_result(raw19, raw23):
    return P.run_flight_pipeline(raw19, raw23, mode="compat")


def test_cluster_invariants(pipeline_result):
    res = pipeline_result
    for pred in (res.predictions_2019, res.predictions_2023):
        clusters = {r["prediction"] for r in pred.select("prediction").distinct().collect()}
        assert clusters <= set(range(5))
        assert pred.filter(F.col("prediction").isNull()).count() == 0
    assert -1.0 <= res.silhouette_2019 <= 1.0
    assert -1.0 <= res.silhouette_2023 <= 1.0


def test_kmeans_seed_determinism(raw19, raw23):
    a = P.run_flight_pipeline(raw19, raw23, mode="compat")
    b = P.run_flight_pipeline(raw19, raw23, mode="compat")
    assert a.silhouette_2019 == b.silhouette_2019
    ra = sorted((tuple(r) for r in a.reasons_2019.collect()), key=repr)
    rb = sorted((tuple(r) for r in b.reasons_2019.collect()), key=repr)
    assert ra == rb


def test_reasons_shapes(pipeline_result):
    compat = pipeline_result.reasons_2019
    assert compat.count() <= 20
    assert set(compat.columns) == {"prediction", "CancellationReason", "count"}


def test_top_airlines_modes(raw23):
    prepped = P.add_delay_label(
        P.prep_features_2023(P.clean_flights_2023(raw23, "compat")), "DelayMinutes"
    )
    compat = P.top_airlines_by_cancellations(prepped, 3, "compat")
    idio = P.top_airlines_by_cancellations(prepped, 3, "idiomatic")
    assert compat.count() <= 3 and idio.count() <= 3
    # same multiset of counts regardless of tie policy
    assert sorted(r["count"] for r in compat.collect()) == sorted(
        r["count"] for r in idio.collect()
    )


def test_score_new_flights_semi_join_equals_isin(spark, raw23, pipeline_result):
    """The reference's collect+isin filter and the engine's broadcast
    semi-join must admit exactly the same rows
    (Code/flight_analysis.py:219-224)."""
    future = spark.createDataFrame(
        [
            (1, 10, 6, 500, "Delta"),
            (5, 15, 12, 1000, "United"),
            (2, 7, 9, 750, "Southwest Airlines"),
            (7, 20, 2, 4000, "American Airlines"),
            (5, 8, 4, 175, "Frontier Airlines"),
        ],
        ["DayofWeek", "DepHour", "Month", "Distance", "Airline"],
    )
    model = P.fit_kmeans(
        P.assemble_features(
            P.add_delay_label(
                P.prep_features_2023(P.clean_flights_2023(raw23, "compat")),
                "DelayMinutes",
            ),
            keep_cols=("DelayReason",),
            mode="compat",
        )
    )
    top = pipeline_result.top_airlines_2023
    compat = P.score_new_flights(model, future, top, "compat")
    idio = P.score_new_flights(model, future, top, "idiomatic")
    a = sorted(r["Airline"] for r in compat.collect())
    b = sorted(r["Airline"] for r in idio.collect())
    assert a == b
    assert "prediction" in compat.columns


# --------------------------------------------------------------------------
# UDF-free vector stringification (§2.10 U1)
# --------------------------------------------------------------------------


def test_stringify_features_compat_format(spark, typed19):
    prepped = P.prep_features_2019(P.clean_flights_2019(typed19, "idiomatic"))
    assembled = P.assemble_features(prepped, keep_cols=("Airline",))
    out = P.stringify_features(assembled, "compat")
    assert "features" not in out.columns
    s = out.select("features_str").first()["features_str"]
    # Python str(list) spacing: "[a, b, c, d]" — what the reference UDF
    # produced (Code/flight_analysis.py:230)
    assert s.startswith("[") and s.endswith("]") and ", " in s
    vals = [float(x) for x in s[1:-1].split(", ")]
    assert len(vals) == 4
    json_out = P.stringify_features(assembled, "idiomatic")
    js = json_out.select("features_str").first()["features_str"]
    assert js.startswith("[") and ", " not in js


def test_conform_flights_union(typed19, typed23):
    from bigdata_flightanalysis_spark.pipeline.flights import (
        clean_flights_2019,
        clean_flights_2023,
        conform_flights,
    )

    # idiomatic cleaning takes the TYPED scan (the r14 guard rejects
    # an all-string frame — this test used to pass raw fixtures and
    # only survived because the actions pruned the boolean columns)
    c19 = clean_flights_2019(typed19)
    c23 = clean_flights_2023(typed23)
    both = conform_flights(c19, c23)
    assert both.count() == c19.count() + c23.count()
    years = {r["Year"] for r in both.select("Year").distinct().collect()}
    assert years == {2019, 2023}
    # 2023 rows get NULL CancellationReason via allowMissingColumns
    null_reason = both.filter(
        (both.Year == 2023) & both.CancellationReason.isNotNull()
    ).count()
    assert null_reason == 0
    assert dict(both.dtypes)["FlightDate"] == "date"


def test_idiomatic_cleaning_rejects_stringly_scan(raw19, raw23):
    """The idiomatic cleaning stages require the TYPED scan: on an
    all-string (RAW/compat) frame the numeric fills would coerce onto
    string columns and the bare boolean cast would throw
    CAST_INVALID_INPUT under Spark 4 ANSI at an arbitrary downstream
    action — fail loud at the stage instead (r14 review)."""
    import pytest

    with pytest.raises(TypeError, match="typed scan"):
        P.clean_flights_2019(raw19, "idiomatic")
    with pytest.raises(TypeError, match="typed scan"):
        P.clean_flights_2023(raw23, "idiomatic")
    # compat mode still accepts the stringly scan
    assert P.clean_flights_2019(raw19, "compat").count() > 0


def test_pipeline_releases_assembled_caches(spark, raw19, raw23):
    """run_flight_pipeline must not leak its internal assembled-frame
    caches (repeated runs on a shared session would accumulate blocks
    until LRU eviction, r15 advice); the two returned prediction
    caches are the caller's, released via result.unpersist()."""
    jsc = spark.sparkContext._jsc.sc()

    def _persisted_ids():
        # set-of-ids, not counts: the ContextCleaner may concurrently
        # drop UNRELATED earlier RDDs (e.g. old localCheckpoints),
        # which would skew a count delta
        it = jsc.getPersistentRDDs().keys().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = _persisted_ids()
    res = P.run_flight_pipeline(raw19, raw23, mode="compat")
    new = _persisted_ids() - before
    assert len(new) == 2, new  # only the two returned prediction caches
    res.unpersist()
    assert not (new & _persisted_ids())
