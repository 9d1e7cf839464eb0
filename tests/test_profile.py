"""operators/profile.py — generic one-pass table profiler."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.operators.profile import profile_table


def _profile_dict(df, **kw):
    return {
        r["col_name"]: r.asDict() for r in profile_table(df, **kw).collect()
    }


def test_profile_exact_counts_and_stringified_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, None), (2, "b", -0.25, None), (2, None, 1.5, None)],
        "k bigint, s string, v double, z string",
    )
    got = _profile_dict(df, approx=False)
    assert set(got) == {"k", "s", "v", "z"}
    assert all(r["n_rows"] == 3 for r in got.values())
    assert got["k"]["n_nulls"] == 0 and got["k"]["n_distinct"] == 2
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["z"]["n_nulls"] == 3 and got["z"]["n_distinct"] == 0
    assert got["z"]["min_value"] is None
    # doubles render through DECIMAL(38,6) — engine-portable strings
    assert got["v"]["min_value"] == "-0.250000"
    assert got["v"]["max_value"] == "1.500000"
    assert got["k"]["min_value"] == "1" and got["k"]["max_value"] == "2"


def test_profile_approx_mode_close_to_exact_and_single_pass(spark, sf_dir):
    from bigdata_flightanalysis_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    exact = _profile_dict(orders, approx=False)
    approx = _profile_dict(orders, approx=True)
    for c, e in exact.items():
        a = approx[c]
        # HLL++ rsd default 5%; allow 10% slack
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            2, 0.1 * e["n_distinct"]
        )
        assert (a["n_rows"], a["n_nulls"], a["min_value"], a["max_value"]) == (
            e["n_rows"],
            e["n_nulls"],
            e["min_value"],
            e["max_value"],
        )
    # approx mode must be ONE aggregate pass: no Expand in the plan
    plan = profile_table(orders, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_profile_column_subset(spark):
    df = spark.createDataFrame([(1, "x")], "a bigint, b string")
    got = _profile_dict(df, columns=["b"], approx=False)
    assert set(got) == {"b"}


def test_profile_handles_awkward_column_names(spark):
    df = spark.createDataFrame([(1, "x")], ["a col", "b"])
    got = _profile_dict(df, approx=False)
    assert set(got) == {"a col", "b"}
    assert got["a col"]["n_distinct"] == 1


def test_profile_rejects_rsd_with_exact_mode(spark):
    """rsd with approx=False raises (round-7 advisory defect: silently
    ignoring it masked callers who believed they were tightening an
    approx profile while actually running the exact Expand pass)."""
    import pytest

    df = spark.createDataFrame([(1, "x")], "a bigint, b string")
    with pytest.raises(ValueError, match="approx"):
        profile_table(df, approx=False, rsd=0.01)


def test_profile_survives_nan_inf_and_huge_doubles(spark):
    """Doubles that DECIMAL(38,6) cannot hold (NaN, ±Infinity,
    |x| ≥ ~1e32) must not throw under ANSI mode nor silently vanish
    from min/max — they fall back to plain string rendering (r14
    review; the old unconditional cast crashed the profiler on legal
    double data)."""
    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, 1e33), (4, -2.5)],
        "id bigint, v double",
    )
    rows = {r["col_name"]: r for r in profile_table(df, approx=False).collect()}
    v = rows["v"]
    assert v["n_nulls"] == 0
    # Spark double ordering: NaN sorts greatest, so max=NaN, min=-2.5
    assert v["max_value"] == "NaN"
    assert v["min_value"] == "-2.500000"  # in-range values keep decimal render
    # all-huge column: min/max render as doubles, not NULL
    huge = spark.createDataFrame([(1e33,), (2e33,)], "h double")
    h = profile_table(huge, approx=False).collect()[0]
    assert h["min_value"] == "1.0E33"
    assert h["max_value"] == "2.0E33"


def test_profile_handles_dotted_backtick_backslash_names(spark):
    """Names with dots, backticks, or a trailing backslash must
    profile: bare F.col('a.b') parses the dot as struct access and
    dies in analysis, and the stack() label literal must escape
    backslashes (Spark's parser processes \\ escapes in string
    literals by default — a trailing one swallows the closing quote)
    before quote-doubling (r15 review)."""
    df = (
        spark.range(3)
        .selectExpr(
            "CAST(id AS DOUBLE) AS `a.b`",
            "CAST(id AS STRING) AS `tick``ed`",
        )
        .withColumn("back\\", (F.col("`a.b`") * 2))
    )
    got = _profile_dict(df, approx=False)
    assert set(got) == {"a.b", "tick`ed", "back\\"}
    assert got["a.b"]["n_distinct"] == 3
    assert got["a.b"]["min_value"] == "0.000000"
    assert got["back\\"]["max_value"] == "4.000000"


def test_profile_empty_table_counts_are_zero(spark):
    """SUM over a zero-row table is NULL; a schema-stable profile
    artifact needs n_nulls = 0 there (r15 review — count(when) now)."""
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [], T.StructType([T.StructField("v", T.DoubleType())])
    )
    row = profile_table(df, approx=False).collect()[0]
    assert row["n_rows"] == 0
    assert row["n_nulls"] == 0
    assert row["n_distinct"] == 0
    assert row["min_value"] is None and row["max_value"] is None


def test_profile_renders_ntz_timestamps_with_fixed_format(spark):
    """TIMESTAMP_NTZ min/max must get the same fixed-format rendering
    as TZ timestamps — the plain string cast kept fractional seconds
    and broke the engine-portable contract (r15 review)."""
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 2, 29, 23, 59, 59, 999999),),
         (dt.datetime(1969, 12, 31, 23, 59, 58, 123456),)],
        "ts timestamp_ntz",
    )
    row = profile_table(df, approx=False).collect()[0]
    assert row["min_value"] == "1969-12-31 23:59:58"
    assert row["max_value"] == "2024-02-29 23:59:59"
