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
