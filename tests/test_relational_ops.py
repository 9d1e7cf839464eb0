"""Unit tests for operators/relational.py (previously covered only
indirectly through the flight pipeline) plus the r16 reserved-name
guards there and in operators/layout.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.operators.relational import (
    deduplicate_exact,
    per_group_top_n,
    semi_filter_topk,
)


def test_semi_filter_topk_basic(spark):
    fact = spark.createDataFrame(
        [("a", 1)] * 10 + [("b", 1)] * 5 + [("c", 1)] * 2,
        "k string, v int",
    )
    out = semi_filter_topk(fact, "k", F.count(F.lit(1)), 2)
    assert set(r["k"] for r in out.collect()) == {"a", "b"}
    assert out.count() == 15


def test_semi_filter_topk_null_keys_cannot_displace_real_groups(spark):
    """A NULL-key group can rank in the top-K aggregate but can NEVER
    match the left-semi equi-join (NULL = NULL), so unfiltered it both
    vanished from the output AND displaced the legitimate K-th group
    (r16 review)."""
    rows = [(None, 1)] * 100 + [("a", 1)] * 10 + [("b", 1)] * 5
    fact = spark.createDataFrame(rows, "k string, v int")
    out = semi_filter_topk(fact, "k", F.count(F.lit(1)), 2)
    assert set(r["k"] for r in out.collect()) == {"a", "b"}
    assert out.count() == 15


def test_deduplicate_exact_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [(1, "x", 3), (1, "y", 1), (2, "z", 5)], "k int, s string, v int"
    )
    out = deduplicate_exact(df, ["k"], keep_order=[F.col("v").asc()])
    assert sorted(tuple(r) for r in out.collect()) == [
        (1, "y", 1),
        (2, "z", 5),
    ]


def test_deduplicate_exact_rejects_reserved_rn_column(spark):
    df = spark.createDataFrame([(1, 9)], "k int, __rn int")
    with pytest.raises(ValueError, match="__rn"):
        deduplicate_exact(df, ["k"], keep_order=[F.col("__rn").asc()])


def test_per_group_top_n_rejects_existing_rank_col(spark):
    df = spark.createDataFrame([(1, 2, 3)], "k int, v int, rn int")
    with pytest.raises(ValueError, match="rank_col"):
        per_group_top_n(df, ["k"], [F.col("v").desc()], 1)
    # an explicit non-colliding rank_col works
    out = per_group_top_n(df, ["k"], [F.col("v").desc()], 1, rank_col="r2")
    assert out.columns == ["k", "v", "rn", "r2"]


def test_zorder_rejects_reserved_z_column(spark):
    from bigdata_flightanalysis_spark.operators.layout import zorder_value

    df = spark.createDataFrame([(1, 2, 7)], "a int, b int, __z int")
    with pytest.raises(ValueError, match="__z"):
        zorder_value(df, ["a", "b"])
