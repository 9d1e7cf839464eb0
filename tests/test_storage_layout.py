"""Storage-layout scale techniques: bucketed co-located joins (the
shuffle-free fact-fact join) and dynamic partition pruning (the
scan-skipping star join). Both are plan-asserted — these are the two
layout decisions that matter most at 100 TB."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tbl():
    return f"t_{uuid.uuid4().hex[:10]}"


def test_bucketed_join_has_no_shuffle(spark, tbl):
    """Both fact tables bucketed+sorted by the join key ⇒ SortMergeJoin
    with NO Exchange: at 100 TB this is the difference between a
    co-located merge and re-shuffling both tables per query."""
    orders = read_table(spark, SF, "orders")
    lineitem = read_table(spark, SF, "lineitem")
    to, tl = f"{tbl}_o", f"{tbl}_l"
    # Tiny test tables would broadcast; disable it so the plan shows
    # what a 100 TB fact-fact join would do (SMJ over buckets).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(to)
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(tl)
        )
        joined = spark.table(to).join(
            spark.table(tl),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        n = joined.count()
        assert n == lineitem.count()  # FK join: every line matches
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "BroadcastHashJoin" not in plan  # really the bucketed path
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tl}")


def test_dynamic_partition_pruning(spark, tbl, tmp_path):
    """Fact partitioned by a dim-derived key + selective dim filter ⇒
    Catalyst injects a dynamicpruning subquery so the fact scan reads
    only the partitions the filtered dim can reach."""
    orders = read_table(spark, SF, "orders")
    fact_path = str(tmp_path / "orders_by_month")
    (
        orders.withColumn("order_month", F.month("o_orderdate"))
        .write.partitionBy("order_month")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    # A real scanned dim with a selective filter — that's what the
    # PartitionPruning rule looks for before injecting the subquery.
    dim_path = str(tmp_path / "month_dim")
    spark.createDataFrame(
        [(m, "Q1" if m <= 3 else "rest") for m in range(1, 13)],
        "order_month int, quarter string",
    ).write.parquet(dim_path)
    months = [1, 2, 3]
    dim_df = spark.read.parquet(dim_path).filter(F.col("quarter") == "Q1")

    joined = fact.join(dim_df, "order_month")
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    executed = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan or "dynamicpruning" in executed, (
        "expected a dynamic partition pruning subquery in the plan"
    )
    # Semantics: only rows of the two selected months survive.
    got_months = {r["order_month"] for r in joined.select("order_month").distinct().collect()}
    assert got_months == set(months)


def _partition_range_widths(df, col):
    """Per-output-partition (min, max) width of one column, normalized
    by the global width — the proxy for parquet file min/max stats."""
    stats = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        )
        .collect()
    )
    glo = min(r["lo"] for r in stats)
    ghi = max(r["hi"] for r in stats)
    width = (ghi - glo) or 1.0
    return [(r["hi"] - r["lo"]) / width for r in stats]


def test_zorder_layout_narrows_all_dimensions(spark):
    """Z-ordering lineitem by (shipdate, partkey) must leave BOTH
    columns with narrow per-partition ranges (multi-column skipping),
    where a 1-D sort by shipdate leaves partkey ranges at ~full width.
    Also: the layout is a row-permutation (no rows lost/duplicated)."""
    from bigdata_flightanalysis_spark.operators.layout import zorder_layout

    li = read_table(spark, SF, "lineitem").select(
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_ts"),
        "l_partkey",
    )
    n_parts = 16

    zordered = zorder_layout(li, ["ship_ts", "l_partkey"], n_partitions=n_parts)
    sorted_1d = li.repartitionByRange(n_parts, "ship_ts").sortWithinPartitions(
        "ship_ts"
    )

    assert zordered.count() == li.count()

    z_ship = _partition_range_widths(zordered, "ship_ts")
    z_part = _partition_range_widths(zordered, "l_partkey")
    s_part = _partition_range_widths(sorted_1d, "l_partkey")

    avg = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # 1-D sort: partkey ranges are essentially full-width everywhere.
    assert avg(s_part) > 0.9
    # Z-order: both dimensions substantially narrower than full width.
    assert avg(z_ship) < 0.6
    assert avg(z_part) < 0.6


def test_zorder_value_accepts_date_and_timestamp_columns(spark):
    """DATE is not castable to DOUBLE in Spark, so zorder_value must
    convert temporal columns itself (unix_date / unix_micros) — the
    docstring's claimed support, previously only reachable if callers
    pre-converted. The z-keys must equal the pre-converted form's:
    unix_date is an affine (monotone, equal-width-preserving) map."""
    from bigdata_flightanalysis_spark.operators.layout import zorder_value

    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
        "l_partkey",
    )
    assert dict(li.dtypes)["l_shipdate"] == "date"
    direct = zorder_value(li, ["l_shipdate", "l_partkey"])
    pre = zorder_value(
        li.withColumn("l_shipdate", F.unix_date("l_shipdate")),
        ["l_shipdate", "l_partkey"],
    )
    key = ["l_orderkey", "l_linenumber", "l_partkey"]
    a = sorted((tuple(r[k] for k in key), r["__z"]) for r in direct.collect())
    b = sorted((tuple(r[k] for k in key), r["__z"]) for r in pre.collect())
    assert a == b

    ts = li.withColumn(
        "l_shipdate", F.col("l_shipdate").cast("timestamp")
    )
    via_ts = zorder_value(ts, ["l_shipdate", "l_partkey"])
    c = sorted((tuple(r[k] for k in key), r["__z"]) for r in via_ts.collect())
    assert a == c  # µs scaling is affine too — same buckets


def test_zorder_value_is_deterministic_and_bounded(spark):
    from bigdata_flightanalysis_spark.operators.layout import (
        ZORDER_BITS,
        zorder_value,
    )

    li = read_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    z1 = zorder_value(li, ["l_orderkey", "l_partkey"])
    hi = z1.agg(F.max("__z")).first()[0]
    lo = z1.agg(F.min("__z")).first()[0]
    assert 0 <= lo <= hi < 1 << (2 * ZORDER_BITS)
    z2 = zorder_value(li.repartition(7), ["l_orderkey", "l_partkey"])
    a = sorted(tuple(r) for r in z1.collect())
    b = sorted(tuple(r) for r in z2.collect())
    assert a == b  # partitioning-invariant


def test_zorder_survives_nan_and_inf_rows(spark):
    """One NaN (or ±Inf) row used to collapse its whole dimension:
    max() aggregates to NaN, width_bucket's [lo, NaN] range returns
    NULL for EVERY row, and the clamp sent all rows to bucket 0 — no
    clustering, no skipping, silently (r15 review). Non-finite values
    now become NULL pre-bucketing: finite rows keep full resolution,
    non-finite rows land in bucket 0."""
    from pyspark.sql import functions as F

    from bigdata_flightanalysis_spark.operators.layout import zorder_value

    df = spark.range(256).select(
        F.col("id").cast("double").alias("x"),
        (F.lit(255) - F.col("id")).cast("double").alias("y"),
    )
    poisoned = df.union(
        spark.createDataFrame(
            [(float("nan"), 1.0), (float("inf"), 2.0), (float("-inf"), 3.0)],
            "x double, y double",
        )
    )
    z = zorder_value(poisoned, ["x", "y"])
    n_distinct = z.select("__z").distinct().count()
    # the clean frame's resolution, not a collapse to a handful of keys
    clean = zorder_value(df, ["x", "y"]).select("__z").distinct().count()
    assert n_distinct >= clean
    assert z.count() == 259  # non-finite rows kept (bucket 0)


def test_zorder_handles_dotted_column_names(spark):
    """Stats aliases are index-keyed and data access backtick-quoted,
    so a column named 'a.b' z-orders instead of dying in analysis as
    struct-field access (r15 review, same class as profile_table)."""
    from bigdata_flightanalysis_spark.operators.layout import zorder_value

    df = spark.range(64).selectExpr(
        "CAST(id AS DOUBLE) AS `a.b`", "CAST(id % 8 AS DOUBLE) AS `c.d`"
    )
    z = zorder_value(df, ["a.b", "c.d"])
    assert z.columns == ["a.b", "c.d", "__z"]
    assert z.select("__z").distinct().count() > 1
