"""Bloom-filter pre-join pruning queries (``operators/bloom.py``).

The 100 TB join idiom: when a selective filter on one side of a join
leaves the other (huge) side mostly non-matching, shuffling the huge
side in full is the dominant cost. A Bloom filter built from the
filtered keys — constant-size, broadcastable — drops definite
non-matches BEFORE the shuffle. Both queries here stay oracle-exact
because the bloom only routes rows; an exact join/anti-join finishes
the job (false positives culled, no false negatives possible).

Plan shape to confirm in `.explain()`: the lineitem/orders scan feeds
k broadcast hash joins against the ≤2048-row bitmap relation, then the
surviving fraction enters the real shuffle join. At test SF the prune
wins nothing (the bitmap build costs more than it saves); at 100 TB it
removes ~(1 - selectivity) of the fact-side shuffle payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.functions.scalar import dsum, dsum_sql
from bigdata_flightanalysis_spark.operators.bloom import bloom_build, bloom_prune
from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.sources.readers import read_table


@register(
    "bloom_filtered_lineitem_revenue",
    oracle=f"""
        SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               {dsum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY order_month
        ORDER BY order_month
    """,
    description="Monthly revenue of URGENT orders with Bloom pre-join "
    "pruning: the urgent order keys (selective filter) build a 16 KiB "
    "bitmap; lineitem rows that definitely match no urgent order are "
    "dropped before the join shuffle; the exact equi-join then culls "
    "bloom false positives, so the result is identical to the plain "
    "join the oracle runs. The big-table shuffle shrinks by the "
    "filter's selectivity — the expression-level form of Spark's "
    "runtime row-level bloom pruning, usable on any Spark version.",
    tags=("bloom", "join", "tpch"),
)
def bloom_filtered_lineitem_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    urgent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bitmap = bloom_build(urgent, "o_orderkey")
    pruned = bloom_prune(lineitem, "l_orderkey", bitmap)
    return (
        pruned.join(urgent, pruned["l_orderkey"] == urgent["o_orderkey"])
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
        .orderBy("order_month")
    )


@register(
    "orders_anti_bloom_check",
    oracle=f"""
        SELECT o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {dsum_sql("o.o_totalprice", "total_price")}
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
        )
        GROUP BY o.o_orderstatus
        ORDER BY o.o_orderstatus
    """,
    description="Orders with no RETURNED lineitem, per status — the "
    "anti-join split by a Bloom filter over returned-item order keys: "
    "a definite bitmap MISS proves absence (no false negatives), so "
    "those orders skip the anti-join shuffle entirely; only the "
    "maybe-fraction runs the exact left_anti join to cull false "
    "positives. Union of both routes == the oracle's NOT EXISTS. At "
    "scale the shuffled side shrinks to ~the bloom FP rate plus true "
    "matches.",
    tags=("bloom", "anti-join", "tpch"),
)
def orders_anti_bloom_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    returned = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    bitmap = bloom_build(returned, "l_orderkey")
    definite_miss = bloom_prune(orders, "o_orderkey", bitmap, mode="miss")
    maybe = bloom_prune(orders, "o_orderkey", bitmap, mode="maybe")
    confirmed_miss = maybe.join(
        returned, maybe["o_orderkey"] == returned["l_orderkey"], "left_anti"
    )
    no_return = definite_miss.unionByName(confirmed_miss)
    return (
        no_return.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
        .orderBy("o_orderstatus")
    )
