"""Unit tests for operators.temporal (as-of join, bucketed range join)."""

from __future__ import annotations

import datetime as dt


from bigdata_flightanalysis_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(minute: int, second: int = 0, micro: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


def test_asof_backward_match_and_tie(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (2, "k", _ts(5)), (3, "k", _ts(1))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, "k", _ts(5)), (200, "k", _ts(8))],
        "rid int, k string, ts timestamp",
    )
    out = {
        r["id"]: r["rid"]
        for r in asof_join(left, right, on="k").collect()
    }
    # id=1 at :10 → latest right ≤ :10 is rid=200 (:08)
    # id=2 at :05 → exact tie matches (≤ convention) → rid=100
    # id=3 at :01 → no prior right → NULL
    assert out == {1: 200, 2: 100, 3: None}


def test_asof_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (3, "k", _ts(1))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, "k", _ts(5))], "rid int, k string, ts timestamp"
    )
    rows = asof_join(left, right, on="k", how="inner").collect()
    assert [(r["id"], r["rid"]) for r in rows] == [(1, 100)]


def test_asof_key_isolation(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "b", _ts(10))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, "a", _ts(9))], "rid int, k string, ts timestamp"
    )
    out = {r["id"]: r["rid"] for r in asof_join(left, right, on="k").collect()}
    assert out == {1: 100, 2: None}


def test_asof_colliding_names_suffixed(spark):
    left = spark.createDataFrame([(1, "k", _ts(10))], "id int, k string, ts timestamp")
    right = spark.createDataFrame([(9, "k", _ts(9))], "id int, k string, ts timestamp")
    row = asof_join(left, right, on="k").collect()[0]
    assert row["id"] == 1 and row["id_right"] == 9
    assert row["ts"] == _ts(10) and row["ts_right"] == _ts(9)


def test_range_join_window_edges(spark):
    # window = 60s, semantics: left_ts - 60s < right_ts <= left_ts.
    left = spark.createDataFrame(
        [(1, "k", _ts(10, 0))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (100, "k", _ts(9, 0, 1)),  # 59.999999s before → in
            (101, "k", _ts(9, 0)),  # exactly 60s before → out (strict)
            (102, "k", _ts(10, 0)),  # same instant → in
            (103, "k", _ts(10, 1)),  # after → out
        ],
        "rid int, k string, ts timestamp",
    )
    got = sorted(
        r["rid"]
        for r in range_join_bucketed(
            left, right, on="k", window_seconds=60
        ).collect()
    )
    assert got == [100, 102]


def test_range_join_crosses_bucket_boundary(spark):
    # right row in the previous epoch bucket must still be found.
    left = spark.createDataFrame(
        [(1, "k", _ts(2, 5))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, "k", _ts(1, 50))], "rid int, k string, ts timestamp"
    )
    rows = range_join_bucketed(left, right, on="k", window_seconds=60).collect()
    assert [r["rid"] for r in rows] == [100]


def test_asof_plan_has_single_shuffle(spark):
    """The as-of join must be one exchange on the key — not a join."""
    left = spark.createDataFrame([(1, "k", _ts(10))], "id int, k string, ts timestamp")
    right = spark.createDataFrame([(9, "k", _ts(9))], "rid int, k string, ts timestamp")
    plan = (
        asof_join(left, right, on="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_pit_lookup_prevents_balance_leakage(spark):
    """Orders BEFORE the 1999-06-01 correction must see the original
    (negative) balance; orders after must see the zeroed version —
    the feature-leakage case a naive dimension join gets wrong."""
    from pyspark.sql import functions as F

    from bigdata_flightanalysis_spark.queries.catalog import load_all

    sf = "/root/testdata/sf0.001"
    out = load_all()["orders_pit_customer_balance"].fn(spark, sf)
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    neg = {
        r["c_custkey"]: r["c_acctbal"]
        for r in cust.where(F.col("c_acctbal") < 0).collect()
    }
    rows = [r for r in out.collect() if r["c_custkey"] in neg]
    assert rows, "fixture should have orders from negative-balance customers"
    before = [r for r in rows if r["order_date"] < "1999-06-01"]
    after = [r for r in rows if r["order_date"] >= "1999-06-01"]
    assert before and after, "both version windows should be exercised"
    for r in before:
        assert r["pit_acctbal"] == neg[r["c_custkey"]], r
    for r in after:
        assert r["pit_acctbal"] == 0.0, r


def test_interval_overlap_join_matches_naive_quadratic(spark):
    """Random closed intervals: the bucketed equi-join must produce
    exactly the pair set of the naive all-pairs overlap check —
    including intervals spanning many buckets and exact-touch
    boundaries."""
    import random

    from bigdata_flightanalysis_spark.operators.temporal import (
        interval_overlap_join,
    )

    rng = random.Random(7)
    W = 1000
    lefts = [
        (i, s, s + rng.randint(0, 3500))
        for i, s in ((i, rng.randint(0, 20000)) for i in range(60))
    ]
    rights = [
        (j, s, s + rng.randint(0, 900))
        for j, s in ((j, rng.randint(0, 20000)) for j in range(80))
    ]
    expect = sorted(
        (li, rj)
        for li, ls, le in lefts
        for rj, rs, re_ in rights
        if ls <= re_ and rs <= le
    )
    ldf = spark.createDataFrame(lefts, "lid bigint, ls bigint, le bigint")
    rdf = spark.createDataFrame(rights, "rid bigint, rs bigint, re bigint")
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_micros=W,
        ).select("lid", "rid").collect()
    )
    assert got == expect


def test_interval_overlap_join_with_key_columns(spark):
    """Non-empty `on`: join keys must keep their names on both sides
    (the r14 review found every right column including the key was
    suffixed, so any keyed call crashed); pairs must match only within
    equal keys."""
    from bigdata_flightanalysis_spark.operators.temporal import (
        interval_overlap_join,
    )

    ldf = spark.createDataFrame(
        [("a", 1, 0, 100), ("b", 2, 0, 100)],
        "k string, lid int, ls bigint, le bigint",
    )
    rdf = spark.createDataFrame(
        [("a", 10, 50, 60), ("b", 20, 50, 60), ("a", 30, 500, 600)],
        "k string, rid int, rs bigint, re bigint",
    )
    got = sorted(
        (r["k"], r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, on="k",
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_micros=100,
        ).select("k", "lid", "rid").collect()
    )
    assert got == [("a", 1, 10), ("b", 2, 20)]  # no cross-key pairs


def test_nonpositive_window_raises(spark):
    """window_seconds/bucket_micros <= 0 must raise, not return a
    silently empty join (NULL bins under non-ANSI division)."""
    import pytest

    from bigdata_flightanalysis_spark.operators.temporal import (
        interval_overlap_join,
    )

    df = spark.createDataFrame([(1, _ts(1))], "id int, ts timestamp")
    idf = spark.createDataFrame([(1, 0, 10)], "id int, s bigint, e bigint")
    with pytest.raises(ValueError, match="window_seconds"):
        range_join_bucketed(df, df, on="id", window_seconds=0)
    with pytest.raises(ValueError, match="bucket_micros"):
        interval_overlap_join(
            idf, idf, left_start="s", left_end="e",
            right_start="s", right_end="e", bucket_micros=0,
        )


def test_asof_suffix_collision_raises(spark):
    """Suffixing a right column into a name that already exists (on
    either side) would emit duplicate output columns — must raise."""
    import pytest

    left = spark.createDataFrame([(1, "k", _ts(1))], "x int, k string, ts timestamp")
    right = spark.createDataFrame(
        [(2, 3, "k", _ts(1))], "x int, x_right int, k string, ts timestamp"
    )
    with pytest.raises(ValueError, match="duplicate output columns"):
        asof_join(left, right, on="k")


def test_asof_never_matches_null_timestamped_right_rows(spark):
    """__ts asc sorts NULLs first, so an unfiltered NULL-ts right
    payload was carried forward as the match for every left row with
    no real earlier match — DuckDB ASOF (l.ts >= r.ts) and pandas
    merge_asof never match NULL timestamps (r15 review)."""
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (2, "k", None)],
        "lid int, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, "k", None)], "rid int, key string, ts timestamp"
    )
    out = {r["lid"]: r["rid"] for r in asof_join(left, right, "key").collect()}
    assert out == {1: None, 2: None}
    # a real (non-NULL) right row still matches normally
    right2 = spark.createDataFrame(
        [(100, "k", None), (200, "k", _ts(5))],
        "rid int, key string, ts timestamp",
    )
    out2 = {r["lid"]: r["rid"] for r in asof_join(left, right2, "key").collect()}
    assert out2 == {1: 200, 2: None}


def test_asof_guard_covers_key_column_collisions(spark):
    """A suffixed right payload column landing on a KEY name slipped
    past the duplicate guard (it scanned only lpay+out_names) and
    produced two identically-named output columns (r15 review)."""
    import pytest

    left = spark.createDataFrame(
        [(1, "a", _ts(1), 1.0)], "x_right int, key string, ts timestamp, x double"
    ).select("key", "ts", "x", "x_right")
    right = spark.createDataFrame(
        [("a", _ts(0), 2.0)], "key string, ts timestamp, x double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        asof_join(left, right, "key", suffix="_right")


def test_range_and_interval_joins_reject_created_duplicates(spark):
    """range_join_bucketed / interval_overlap_join now share asof's
    fail-loud posture: a right side already carrying both x and
    x<suffix> used to return a frame with two identically-named
    columns (r15 review)."""
    import pytest

    from bigdata_flightanalysis_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("k", _ts(1), 1.0)], "key string, ts timestamp, x double"
    )
    right = spark.createDataFrame(
        [("k", _ts(0), 2.0, 3.0)],
        "key string, ts timestamp, x double, x_r double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        range_join_bucketed(left, right, "key", window_seconds=60)

    ileft = spark.createDataFrame(
        [("k", 0, 10, 1.0)], "key string, s long, e long, x double"
    )
    iright = spark.createDataFrame(
        [("k", 5, 15, 2.0, 3.0)],
        "key string, s long, e long, x double, x_r double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        interval_overlap_join(
            ileft, iright, "key",
            left_start="s", left_end="e",
            right_start="s", right_end="e",
            bucket_micros=10,
        )


def test_asof_never_matches_null_key_rows(spark):
    """Window.partitionBy groups NULL keys into ONE partition, so an
    unfiltered NULL-key right payload was carried into NULL-key left
    rows — a match DuckDB ASOF (ON l.k = r.k) never makes, since SQL
    equality never holds on NULL (r16 review). NULL-key left rows get
    NULL payload under how='left' and are dropped under how='inner';
    real keys are untouched."""
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (2, None, _ts(10))],
        "lid int, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, "k", _ts(5)), (200, None, _ts(5))],
        "rid int, key string, ts timestamp",
    )
    out = {r["lid"]: r["rid"] for r in asof_join(left, right, "key").collect()}
    assert out == {1: 100, 2: None}
    inner = asof_join(left, right, "key", how="inner")
    assert [r["lid"] for r in inner.collect()] == [1]
