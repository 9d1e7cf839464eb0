"""Relational query suite over the star schema (SURVEY.md §2.2-§2.8).

Each query names the reference operators it generalizes (file:line into
``/root/reference``) and is written so the physical plan is the one a
100 TB run wants: broadcast joins for dims, partial aggregation,
TakeOrderedAndProject for top-K, filters authored before joins so
Catalyst pushes them into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_flightanalysis_spark.functions.scalar import (
    case_map,
    dsum,
    dsum_sql,
    exact_avg,
    exact_avg_sql,
    threshold_label,
)
from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.sources.readers import read_table

# --------------------------------------------------------------------------
# Flagship — the reference's sharpest query shape, generalized.
# Reference: filter(Cancelled) → groupBy(Airline) → count → orderBy desc
# → limit 5 (Code/flight_analysis.py:197-210). Here: finished orders per
# market segment, top 5, with a broadcast dim join and a deterministic
# tie-break.
# --------------------------------------------------------------------------


@register(
    "flagship_top_segments",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
        GROUP BY c_mktsegment
        ORDER BY n_orders DESC, c_mktsegment ASC
        LIMIT 5
    """,
    description="Top-5 market segments by finished-order count "
    "(generalizes Code/flight_analysis.py:197-210: F1+A1+O2+O4 plus a "
    "broadcast dim join).",
    tags=("relational", "flagship"),
)
def flagship_top_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("c_mktsegment").asc())
        .limit(5)
    )


# --------------------------------------------------------------------------
# Pricing summary — the canonical wide aggregation (A1-A3, X11) with
# exact-decimal sums so the value hash is engine-independent.
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql("l_quantity", "sum_qty")},
               {dsum_sql("l_extendedprice", "sum_base_price")},
               {dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
               {dsum_sql("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)", "sum_charge")},
               {exact_avg_sql("l_quantity", "avg_qty")},
               {exact_avg_sql("l_extendedprice", "avg_price")},
               {exact_avg_sql("l_discount", "avg_disc")},
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H-Q1-shaped pricing summary: scan-side filter, "
    "composite-key hash aggregate (partial+final), deterministic decimal sums.",
    tags=("relational", "aggregation"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Join chain through the dimension hierarchy (SURVEY.md §2.3: the engine
# surface the reference's isin-idiom implies). All dims broadcast.
# --------------------------------------------------------------------------


@register(
    "revenue_by_region",
    oracle=f"""
        SELECT r_name, COUNT(*) AS n_orders,
               {dsum_sql("o_totalprice", "revenue")}
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
    """,
    description="orders⋈customer⋈nation⋈region revenue rollup — "
    "broadcast-hash-join chain, one shuffle total (final aggregate).",
    tags=("relational", "join"),
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = read_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
        .orderBy("r_name")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    description="TPC-H-Q3-shaped: selective dim filter broadcast into a "
    "fact-fact join, grouped revenue, top-10 with tie-break "
    "(TakeOrderedAndProject).",
    tags=("relational", "join", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Semi / anti joins — the scalable form of the reference's
# collect-then-isin idiom (Code/flight_analysis.py:219-220, F2).
# --------------------------------------------------------------------------


@register(
    "segments_of_open_order_customers",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="LEFT SEMI join (EXISTS): customers holding an open "
    "order, counted per segment — distributed replacement for "
    "collect()+isin (Code/flight_analysis.py:219-220).",
    tags=("relational", "join", "semi"),
)
def segments_of_open_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    open_orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        customer.join(open_orders, on="c_custkey", how="left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "parts_never_ordered",
    oracle="""
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    description="LEFT ANTI join (NOT EXISTS): parts with no lineitem, per brand.",
    tags=("relational", "join", "anti"),
)
def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey")
    )
    return (
        part.join(li, on="p_partkey", how="left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Window functions — per-group top-N, the idiomatic generalization of the
# reference's global-sort-limit-20 "top reasons" view (SURVEY.md §2.5).
# --------------------------------------------------------------------------


@register(
    "top_customers_per_segment",
    oracle="""
        SELECT c_mktsegment, c_custkey, c_acctbal, rn
        FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
            FROM customer
        )
        WHERE rn <= 3
        ORDER BY c_mktsegment, rn
    """,
    description="Per-group top-N via row_number window "
    "(generalizes Code/flight_analysis.py:147-152; WindowGroupLimit "
    "prunes beyond N at scale).",
    tags=("relational", "window"),
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        read_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "supplier_running_revenue",
    oracle=f"""
        SELECT s_suppkey, month,
               CAST(SUM(month_revenue_dec) OVER (
                   PARTITION BY s_suppkey ORDER BY month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_revenue
        FROM (
            SELECT l_suppkey AS s_suppkey,
                   strftime(l_shipdate, '%Y-%m') AS month,
                   SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                       AS month_revenue_dec
            FROM lineitem
            GROUP BY l_suppkey, strftime(l_shipdate, '%Y-%m')
        )
        ORDER BY s_suppkey, month
    """,
    description="Running total window (rowsBetween unbounded/current) "
    "over pre-aggregated monthly supplier revenue.",
    tags=("relational", "window"),
)
def supplier_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_suppkey").alias("s_suppkey"),
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("month_revenue_dec")
        )
    )
    w = (
        Window.partitionBy("s_suppkey")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        monthly.withColumn(
            "running_revenue", F.sum("month_revenue_dec").over(w).cast("double")
        )
        .select("s_suppkey", "month", "running_revenue")
        .orderBy("s_suppkey", "month")
    )


# --------------------------------------------------------------------------
# Scalar surface: CASE mapping (X1), threshold label (X2/A3), date parts
# (X6-X8), arithmetic (X11).
# --------------------------------------------------------------------------

_PRIORITY_TIERS = {
    "1-URGENT": "expedite",
    "2-HIGH": "expedite",
    "3-MEDIUM": "standard",
    "4-NOT SPECIFIED": "standard",
}  # '5-LOW' intentionally unmatched → NULL (reference quirk §2.12.4: no ELSE)


@register(
    "order_priority_tiers",
    oracle="""
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'expedite'
                    WHEN o_orderpriority = '2-HIGH' THEN 'expedite'
                    WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                    WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 'standard'
               END AS tier,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY tier
        ORDER BY tier NULLS FIRST
    """,
    description="Value-map CASE with no ELSE — exact semantics of the "
    "reference's cancellation-code mapping "
    "(Code/flight_analysis.py:38-41,64): unmatched values yield NULL.",
    tags=("relational", "scalar"),
)
def order_priority_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .select(case_map("o_orderpriority", _PRIORITY_TIERS).alias("tier"))
        .groupBy("tier")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("tier").asc_nulls_first())
    )


@register(
    "orderdate_parts",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mth,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY yr, mth, dow
        ORDER BY yr, mth, dow
    """,
    description="Date-part extraction (X6 dayofweek / X7 month, "
    "Code/flight_analysis.py:101-112). Spark dayofweek is 1=Sunday; "
    "DuckDB's is 0=Sunday, hence the +1 in the oracle.",
    tags=("relational", "scalar"),
)
def orderdate_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mth"),
            F.dayofweek("o_orderdate").alias("dow"),
        )
        .groupBy("yr", "mth", "dow")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("yr", "mth", "dow")
    )


@register(
    "delayed_order_label",
    oracle=f"""
        SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS is_big,
               COUNT(*) AS n_orders,
               {dsum_sql("o_totalprice", "total")}
        FROM orders
        GROUP BY is_big
        ORDER BY is_big
    """,
    description="Threshold binary label (X2: when/otherwise, "
    "Code/flight_analysis.py:124-125) feeding an aggregate.",
    tags=("relational", "scalar"),
)
def delayed_order_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .select(
            threshold_label("o_totalprice", 150000.0).alias("is_big"),
            "o_totalprice",
        )
        .groupBy("is_big")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total"))
        .orderBy("is_big")
    )


@register(
    "returnflag_in_list",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n_items
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R')
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="IN-list filter (F2, Code/flight_analysis.py:219-220) — "
    "small literal list stays an isin predicate (pushed to scan).",
    tags=("relational", "filter"),
)
def returnflag_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_items"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Distinct / set ops / grouping sets (§2.7 extension surface).
# --------------------------------------------------------------------------


@register(
    "distinct_flag_status",
    oracle="""
        SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem
        ORDER BY l_returnflag, l_linestatus
    """,
    description="DISTINCT via hash aggregate.",
    tags=("relational", "distinct"),
)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "count_distinct_parts",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Multi count-distinct (expand + two-phase aggregate).",
    tags=("relational", "aggregation"),
)
def count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "union_priority_extremes",
    oracle=f"""
        SELECT bucket, COUNT(*) AS n_orders, {dsum_sql("o_totalprice", "total")}
        FROM (
            SELECT 'urgent' AS bucket, o_totalprice
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'low' AS bucket, o_totalprice
            FROM orders WHERE o_orderpriority = '5-LOW'
        )
        GROUP BY bucket
        ORDER BY bucket
    """,
    description="unionByName of two filtered projections (§2.7 "
    "extension; the reference keeps its two datasets separate).",
    tags=("relational", "setop"),
)
def union_priority_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("bucket"), "o_totalprice"
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.lit("low").alias("bucket"), "o_totalprice"
    )
    return (
        urgent.unionByName(low)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total"))
        .orderBy("bucket")
    )


@register(
    "cube_flag_status",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items, {dsum_sql("l_quantity", "sum_qty")}
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    description="CUBE grouping sets (§2.4 extension surface).",
    tags=("relational", "aggregation"),
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity", "sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Exact dedup with a deterministic survivor (extension; SURVEY.md §7
# phase 4 — here on the relational side: one row per (custkey, status),
# keeping the most recent order).
# --------------------------------------------------------------------------


@register(
    "latest_order_per_customer_status",
    oracle="""
        SELECT c_custkey, o_orderstatus,
               strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate,
               o_orderkey
        FROM (
            SELECT o_custkey AS c_custkey, o_orderstatus, o_orderdate, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        )
        WHERE rn = 1
        ORDER BY c_custkey, o_orderstatus
    """,
    description="Exact dedup with deterministic survivor (keep latest) "
    "— operators.relational.deduplicate_exact.",
    tags=("relational", "dedup"),
)
def latest_order_per_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.relational import deduplicate_exact

    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderstatus",
        "o_orderdate",
        "o_orderkey",
    )
    deduped = deduplicate_exact(
        orders,
        ["c_custkey", "o_orderstatus"],
        keep_order=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )
    return deduped.select(
        "c_custkey",
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_orderdate"),
        "o_orderkey",
    ).orderBy("c_custkey", "o_orderstatus")
