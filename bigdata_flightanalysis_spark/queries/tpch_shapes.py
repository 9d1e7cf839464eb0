"""Remaining classic TPC-H query shapes, adapted to the driver's star
schema (no ``partsupp`` table — the Q2/Q11/Q16/Q20 shapes are re-keyed
through ``lineitem``'s (partkey, suppkey) link, which preserves the
*plan shape* each query exists to exercise: correlated-subquery
decorrelation, scalar-aggregate thresholds, NOT-IN anti joins, nested
aggregation).

These extend the engine surface beyond the reference
(``Code/flight_analysis.py`` has only single-fact scans — SURVEY.md
§2.3 notes joins are engine surface). Each query documents the shuffle
budget it was designed to; ``tests/test_plans.py`` asserts the
load-bearing physical properties.

Determinism: decimal-exact sums (``dsum``), identical expression trees
on both engines for derived doubles (multiplication order matters for
IEEE reproducibility), explicit tie-breaks on every ORDER BY/LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_flightanalysis_spark.functions.scalar import (
    dsum,
    dsum_dec,
    dsum_dec_sql,
    dsum_sql,
    exact_avg,
)
from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.sources.readers import read_table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# Q5 — local-supplier revenue: the six-way join with the non-key
# equality (customer nation == supplier nation) that defeats naive
# join-order heuristics.
# --------------------------------------------------------------------------


@register(
    "q5_local_supplier_revenue",
    oracle=f"""
        SELECT n_name, {dsum_sql(_REV, "revenue")}
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    description="TPC-H-Q5 shape: region filter pruned down the "
    "nation→supplier dim chain (all broadcast), orders⋈customer and "
    "lineitem⋈orders shuffled on their keys, local-supplier condition "
    "(c_nationkey = s_nationkey) applied inside the broadcast join — "
    "two shuffles + final agg, never a cartesian.",
    tags=("relational", "join", "tpch"),
)
def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supplier = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
        )
        .select("o_orderkey", "o_custkey")
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    oc = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return (
        lineitem.join(oc, F.col("l_orderkey") == oc.o_orderkey)
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(_rev_col(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


# --------------------------------------------------------------------------
# Q6 — forecast revenue: pure scan+filter+agg; exists to prove the
# predicates reach the parquet scan (plan-asserted in test_plans).
# --------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle=f"""
        SELECT {dsum_sql("l_extendedprice * l_discount", "revenue")},
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24.0
    """,
    description="TPC-H-Q6 shape: single scan, every predicate pushed "
    "to the parquet reader (PushedFilters asserted), map-side partial "
    "agg — the zero-shuffle baseline query.",
    tags=("relational", "filter", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations, both directions.
# --------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               {dsum_sql("volume", "revenue")}
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   {_REV} AS volume
            FROM lineitem
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H-Q7 shape: two aliased broadcasts of the same "
    "nation dim (supplier side + customer side), disjunctive "
    "direction pair applied after both are bound, year extracted from "
    "shipdate — one fact-fact shuffle (lineitem⋈orders), dims "
    "broadcast.",
    tags=("relational", "join", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supplier = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation).withColumnsRenamed(
                {"n_nationkey": "sn_key", "n_name": "supp_nation"}
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .select("s_suppkey", "supp_nation")
    )
    customer = (
        read_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation).withColumnsRenamed(
                {"n_nationkey": "cn_key", "n_name": "cust_nation"}
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
        .select("c_custkey", "cust_nation")
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev_col().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — market share: conditional-sum / sum ratio per year.
# --------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3'
                             THEN volume ELSE 0.0 END
                        AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE)
               AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   {_REV} AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region    ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'EUROPE'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    description="TPC-H-Q8 shape: market share of one supplier nation "
    "within a customer region, per order year — conditional decimal "
    "sum over total decimal sum, divided in double with identical "
    "expression trees on both engines so the ratio is bit-stable.",
    tags=("relational", "join", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("en_key"))
    customer = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(europe_nations), F.col("c_nationkey") == F.col("en_key"))
        .select("c_custkey")
    )
    supplier = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    all_nations = (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_col().alias("volume"),
            "supp_nation",
        )
    )
    cond = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        all_nations.groupBy("o_year")
        .agg(
            (
                F.sum(cond.cast("decimal(38,6)")).cast("double")
                / F.sum(F.col("volume").cast("decimal(38,6)")).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 — product profit by supplier nation and year. No partsupp →
# supply cost modeled as 10% of the part's retail price per unit,
# which keeps the join to `part` and the multi-term profit expression.
# --------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle=f"""
        SELECT n_name, o_year, {dsum_sql("amount", "sum_profit")}
        FROM (
            SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity * 0.1 AS amount
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_type = 'ECONOMY'
        ) profit
        GROUP BY n_name, o_year
        ORDER BY n_name, o_year DESC
    """,
    description="TPC-H-Q9 shape (partsupp-free adaptation: unit "
    "supply cost = 0.1·p_retailprice): selective part filter "
    "broadcast into the fact, supplier+nation broadcast, one "
    "lineitem⋈orders shuffle; profit expression multiplied in "
    "identical order on both engines for IEEE stability.",
    tags=("relational", "join", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    amount = _rev_col() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("n_name", "o_year")
        .agg(dsum("amount", "sum_profit"))
        .orderBy(F.col("n_name").asc(), F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q10 — returned-item top customers.
# --------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name, {dsum_sql(_REV, "revenue")},
               c_acctbal, n_name
        FROM customer
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    description="TPC-H-Q10 shape: returned-lineitem revenue per "
    "customer in a date window, nation broadcast, top-20 via "
    "TakeOrderedAndProject with key tie-break.",
    tags=("relational", "join", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
        )
        .select("o_orderkey", "o_custkey")
    )
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev_col(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 — important parts: scalar-aggregate threshold (HAVING against a
# global sum). partsupp-free: part inventory value = lineitem revenue
# routed through suppliers of a nation subset.
# --------------------------------------------------------------------------


@register(
    "q11_important_parts",
    oracle=f"""
        WITH pv AS (
            SELECT l_partkey, {dsum_sql(_REV, "value")}
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE s_nationkey < 5
            GROUP BY l_partkey
        )
        SELECT l_partkey, value
        FROM pv
        WHERE value > (
            SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 0.002
            FROM pv
        )
        ORDER BY value DESC, l_partkey
    """,
    description="TPC-H-Q11 shape: per-part value filtered against a "
    "scalar fraction of the GLOBAL total — the scalar subquery is "
    "computed once from the same aggregated frame and broadcast as a "
    "one-row cross join (no second scan of the fact in Spark; the "
    "oracle's CTE is referenced twice but DuckDB materializes it).",
    tags=("relational", "scalar-subquery", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey")
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    pv = (
        lineitem.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(_rev_col(), "value"))
    )
    threshold = pv.agg(
        (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") * F.lit(0.002)
         ).alias("threshold")
    )
    return (
        pv.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), F.col("l_partkey").asc())
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join with a join-time
# predicate, then an aggregate OF an aggregate.
# --------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H-Q13 shape: LEFT OUTER join with the filter in "
    "the join condition (NOT the WHERE — order-less customers must "
    "survive as count 0), per-customer count, then a second aggregate "
    "over the counts. Two shuffles, second one tiny.",
    tags=("relational", "join", "outer", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_customer = (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q15 — top supplier: aggregate once, keep the row(s) equal to the
# global max (scalar subquery over the aggregate, not the base table).
# --------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {dsum_sql(_REV, "total_revenue")}
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    description="TPC-H-Q15 shape: quarterly per-supplier revenue, "
    "then equality against the global max — max computed from the "
    "already-aggregated frame and broadcast (one fact scan, no "
    "re-aggregation); decimal-exact revenue makes the double "
    "equality well-defined.",
    tags=("relational", "scalar-subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    revenue = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_rev_col(), "total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    supplier = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 — supplier counts per part attributes with a NOT-IN exclusion.
# --------------------------------------------------------------------------


@register(
    "q16_supplier_part_counts",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          AND l_suppkey NOT IN (
              -- s_suppkey IS NOT NULL mirrors the Spark build-side
              -- filter: it pins NOT IN to defined semantics (one NULL
              -- in the subquery would otherwise empty the result)
              -- instead of relying on the TPC-H PK assumption
              SELECT s_suppkey FROM supplier
              WHERE s_acctbal < 0.0 AND s_suppkey IS NOT NULL
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    description="TPC-H-Q16 shape (re-keyed through lineitem): "
    "negated predicates + IN-list on the broadcast part dim, NOT IN "
    "exclusion as a broadcast LEFT ANTI join (valid because "
    "s_suppkey is non-null), COUNT(DISTINCT) with full tie-broken "
    "ordering.",
    tags=("relational", "join", "anti", "tpch"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        read_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_suppliers = (
        read_table(spark, sf_dir, "supplier")
        # NOT IN semantics need the BUILD side non-null too: one NULL
        # s_suppkey makes `NOT IN (...)` return zero rows, while a
        # left_anti just ignores the NULL build row. s_suppkey is a
        # non-null PK in TPC-H so this filter is a no-op on real data;
        # it pins the semantics rather than relying on the PK
        # assumption (r15 driver ADVICE).
        .filter((F.col("s_acctbal") < 0.0) & F.col("s_suppkey").isNotNull())
        .select("s_suppkey")
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    # NOT IN semantics on the PROBE side: against a NON-empty build
    # set, a NULL l_suppkey fails `NOT IN (...)` (NULL) and the
    # oracle drops the row, but a bare left_anti KEEPS it (NULL never
    # matches) — so NULL-FK rows are split out and admitted only when
    # the build set is EMPTY, where `x NOT IN (empty)` is TRUE even
    # for NULL (the r15 unconditional filter dropped them there too,
    # r16 review). The gate is a 1-row count aggregate over the
    # already-broadcast-small build side, crossJoined like the other
    # scalar-gate patterns — bounded at any scale.
    surviving = lineitem.filter(F.col("l_suppkey").isNotNull()).join(
        F.broadcast(bad_suppliers),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    empty_gate = bad_suppliers.agg(F.count(F.lit(1)).alias("__n_bad"))
    null_fk = (
        lineitem.filter(F.col("l_suppkey").isNull())
        .crossJoin(F.broadcast(empty_gate))
        .where(F.col("__n_bad") == 0)
        .drop("__n_bad")
    )
    return (
        surviving.unionByName(null_fk)
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


# --------------------------------------------------------------------------
# Q20 — suppliers carrying an outsized share of a part's flow:
# nested aggregation (pair-level vs part-level) + semi join out.
# --------------------------------------------------------------------------


@register(
    "q20_heavy_flow_suppliers",
    oracle=f"""
        WITH flows AS (
            SELECT l_partkey, l_suppkey,
                   {dsum_dec_sql("l_quantity", "pair_qty_dec")}
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_type = 'SMALL'
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_partkey, l_suppkey
        ),
        heavy AS (
            SELECT l_suppkey
            FROM (
                SELECT l_suppkey, pair_qty_dec,
                       -- decimal-exact window sum (dsum doctrine): a
                       -- plain double SUM is merge-order dependent,
                       -- so a supplier at exactly half a part's flow
                       -- could flip across engines/runs. The pair sum
                       -- stays DECIMAL into the window (no
                       -- double→decimal recast: divergent rounding
                       -- cross-engine above ~9e9, r16 review) and the
                       -- >half comparison is pure decimal arithmetic
                       SUM(pair_qty_dec)
                            OVER (PARTITION BY l_partkey) AS part_qty_dec
                FROM flows
            )
            WHERE pair_qty_dec + pair_qty_dec > part_qty_dec
        )
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
        ORDER BY s_suppkey
    """,
    description="TPC-H-Q20 shape (partsupp-free): per-(part,supplier) "
    "quantity vs per-part total — nested aggregation expressed as "
    "groupBy + window SUM over the part partition (aggregated frame "
    "is small: one row per active pair), >50%-share filter, then a "
    "semi join back to supplier. The window reuses the groupBy "
    "output; no second fact scan.",
    tags=("relational", "window", "semi", "tpch"),
)
def q20_heavy_flow_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    # repartition by l_partkey BEFORE the pair aggregate: hash
    # partitioning on a subset key satisfies the clustered distribution
    # of BOTH the (partkey, suppkey) groupBy and the partkey window, so
    # the whole agg→window chain runs on ONE exchange (measured: 1 vs 4
    # at sf0.01, plan-asserted). Tradeoff: raw rows cross the wire
    # instead of pair-aggregated ones — the right side of the trade
    # here because pair multiplicity in a filtered year is ~1-2 rows;
    # with high multiplicity the two-shuffle partial-agg form wins.
    flows = (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        # kept AS decimal into the window and the >half comparison —
        # pure integer-scaled arithmetic, no cross-engine rounding
        # surface at any magnitude (r16 review)
        .agg(dsum_dec("l_quantity", "pair_qty_dec"))
    )
    w = Window.partitionBy("l_partkey")
    heavy = (
        flows.withColumn("part_qty_dec", F.sum("pair_qty_dec").over(w))
        .filter(
            F.col("pair_qty_dec") + F.col("pair_qty_dec")
            > F.col("part_qty_dec")
        )
        .select("l_suppkey")
    )
    supplier = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supplier.join(
            F.broadcast(heavy),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q21 — sole late supplier in multi-supplier orders. "Late" =
# shipped more than 60 days after the order date (the schema has no
# commit/receipt dates). The classic EXISTS / NOT-EXISTS pair is
# decorrelated into one per-order aggregate.
# --------------------------------------------------------------------------


@register(
    "q21_sole_late_supplier",
    oracle="""
        WITH per_order AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE
                       WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                       THEN l_suppkey END) AS n_late,
                   MAX(CASE
                       WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                       THEN l_suppkey END) AS late_supp
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
            GROUP BY l_orderkey
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM per_order
        JOIN supplier ON s_suppkey = late_supp
        WHERE n_supp > 1 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    description="TPC-H-Q21 shape: the EXISTS (another supplier in the "
    "order) + NOT EXISTS (another LATE supplier) pair decorrelated "
    "into ONE per-order aggregate (distinct-supplier and "
    "distinct-late-supplier counts + the unique late supplier via "
    "conditional MAX) — one shuffle instead of three correlated "
    "probes of the fact.",
    tags=("relational", "join", "tpch"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    late_supp = F.when(late, F.col("l_suppkey"))
    per_order = (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_supp).alias("n_late"),
            F.max(late_supp).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supplier = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(
            F.broadcast(supplier), F.col("s_suppkey") == F.col("late_supp")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 — idle rich customers: scalar average threshold + anti join.
# --------------------------------------------------------------------------


@register(
    "q22_idle_rich_customers",
    oracle=f"""
        SELECT c_nationkey, COUNT(*) AS numcust,
               {dsum_sql("c_acctbal", "totacctbal")}
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(c_acctbal)
            FROM customer
            WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    description="TPC-H-Q22 shape: scalar subquery (exact decimal "
    "average of positive balances) broadcast as a one-row cross "
    "join, NOT EXISTS as a LEFT ANTI join against orders, grouped "
    "by nation key.",
    tags=("relational", "anti", "scalar-subquery", "tpch"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        exact_avg("c_acctbal", "avg_bal")
    )
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Q2 — min-cost supplier per part: the correlated-MIN shape. No
# partsupp → a supplier's "offer" for a part is its min observed unit
# price in lineitem.
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH offers AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_price
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_size = 5
            GROUP BY l_partkey, l_suppkey
        ),
        best AS (
            SELECT l_partkey, l_suppkey, unit_price,
                   MIN(unit_price) OVER (PARTITION BY l_partkey) AS best_price
            FROM offers
        )
        SELECT p_partkey, p_brand, s_name, unit_price
        FROM best
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE unit_price = best_price
        ORDER BY p_partkey, s_name
    """,
    description="TPC-H-Q2 shape (partsupp-free): per-(part,supplier) "
    "min unit price, correlated `= (SELECT MIN ...)` decorrelated "
    "into a window MIN over the part partition on the already-"
    "aggregated offers frame, ties kept (all suppliers at the min), "
    "dims broadcast back for presentation columns. Unit price is a "
    "pure double quotient of stored values — bit-identical on both "
    "engines, so the equality is exact.",
    tags=("relational", "window", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 5)
        .select("p_partkey", "p_brand")
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    # Same single-exchange trick as q20: partkey partitioning serves
    # both the pair groupBy and the part-level window MIN.
    offers = (
        lineitem.join(
            F.broadcast(part.select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            # try_divide: a zero-quantity line is an ANSI THROW with
            # bare /, while DuckDB's double/0 quietly yields NULL
            # (which MIN skips on both engines)
            F.min(F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))).alias(
                "unit_price"
            )
        )
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("best_price", F.min("unit_price").over(w)).filter(
        F.col("unit_price") == F.col("best_price")
    )
    supplier = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_brand", "s_name", "unit_price")
        .orderBy("p_partkey", "s_name")
    )
