"""Property-based tests: the scalable temporal operators must agree
with their obvious quadratic reference implementations on arbitrary
small inputs (hypothesis-generated), including ties, duplicates, empty
sides, and boundary timestamps."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_flightanalysis_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)

_BASE = dt.datetime(2024, 1, 1)

_ts = st.integers(min_value=0, max_value=600).map(
    lambda s: _BASE + dt.timedelta(seconds=s)
)
_key = st.sampled_from(["a", "b"])

_left_rows = st.lists(
    st.tuples(st.integers(0, 10_000), _key, _ts), min_size=0, max_size=12
).map(lambda rows: [(i, k, t) for i, (x, k, t) in enumerate(rows)])
_right_rows = st.lists(
    st.tuples(st.integers(0, 10_000), _key, _ts), min_size=0, max_size=12
).map(lambda rows: [(100 + i, k, t) for i, (x, k, t) in enumerate(rows)])


def _naive_asof(left, right):
    out = {}
    for lid, lk, lt in left:
        best = None
        for rid, rk, rt in right:
            if rk == lk and rt <= lt:
                # latest ts wins; among equal ts the operator keeps the
                # last row in window order (ties broken by rid for the
                # naive model to be deterministic: max rid at max ts)
                if best is None or rt > best[1] or (rt == best[1] and rid > best[0]):
                    best = (rid, rt)
        out[lid] = best[0] if best else None
    return out


def _naive_range(left, right, w):
    out = set()
    for lid, lk, lt in left:
        for rid, rk, rt in right:
            if rk == lk and rt <= lt and (lt - rt).total_seconds() < w:
                out.add((lid, rid))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_matches_naive(spark, left, right):
    ldf = spark.createDataFrame(left, "id int, k string, ts timestamp") if left else (
        spark.createDataFrame([], "id int, k string, ts timestamp")
    )
    rdf = spark.createDataFrame(right, "rid int, k string, ts timestamp") if right else (
        spark.createDataFrame([], "rid int, k string, ts timestamp")
    )
    got = {r["id"]: r["rid"] for r in asof_join(ldf, rdf, on="k").collect()}
    naive = _naive_asof(left, right)
    # Equal-timestamp ties between DISTINCT right rows are resolved by
    # window order (rid ascending in our fixtures ⇒ last = max rid),
    # matching the naive model's max-rid rule.
    assert got == naive


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows, w=st.sampled_from([30, 90, 300]))
def test_range_join_matches_naive(spark, left, right, w):
    ldf = spark.createDataFrame(left, "id int, k string, ts timestamp") if left else (
        spark.createDataFrame([], "id int, k string, ts timestamp")
    )
    rdf = spark.createDataFrame(right, "rid int, k string, ts timestamp") if right else (
        spark.createDataFrame([], "rid int, k string, ts timestamp")
    )
    got = {
        (r["id"], r["rid"])
        for r in range_join_bucketed(ldf, rdf, on="k", window_seconds=w).collect()
    }
    assert got == _naive_range(left, right, w)


def _naive_asof_tol(left, right, tol_s):
    out = {}
    for lid, lk, lt in left:
        best = None
        for rid, rk, rt in right:
            if rk == lk and rt <= lt and (lt - rt).total_seconds() <= tol_s:
                if best is None or rt > best[1] or (rt == best[1] and rid > best[0]):
                    best = (rid, rt)
        out[lid] = best[0] if best else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows, tol=st.sampled_from([0, 60, 240]))
def test_asof_tolerance_matches_naive(spark, left, right, tol):
    ldf = spark.createDataFrame(left, "id int, k string, ts timestamp") if left else (
        spark.createDataFrame([], "id int, k string, ts timestamp")
    )
    rdf = spark.createDataFrame(right, "rid int, k string, ts timestamp") if right else (
        spark.createDataFrame([], "rid int, k string, ts timestamp")
    )
    got = {
        r["id"]: r["rid"]
        for r in asof_join(ldf, rdf, on="k", tolerance_seconds=tol).collect()
    }
    assert got == _naive_asof_tol(left, right, tol)
