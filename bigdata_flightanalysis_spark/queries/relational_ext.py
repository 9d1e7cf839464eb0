"""Extended relational coverage beyond ``queries/relational.py``
(SURVEY.md §2.4 note: grouping sets / rollup / percentiles are free
Catalyst surface the reference never used — the engine exposes them as
first-class, oracle-checked operators).

Determinism conventions as in the rest of the registry: decimal-exact
double sums (``dsum``), identical expression trees on both engines for
derived doubles, stringified timestamps, explicit tie-breaks.
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
)
from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.sources.readers import read_table


@register(
    "rollup_revenue_region_nation",
    oracle=f"""
        SELECT r_name, n_name,
               COUNT(*) AS n_orders,
               {dsum_sql("o_totalprice", "revenue")}
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    description="ROLLUP over (region, nation): per-nation rows, "
    "per-region subtotals, grand total in ONE aggregate pass (Catalyst "
    "Expand + partial agg — not three scans). Dims broadcast; the only "
    "shuffle is the final aggregate.",
    tags=("relational", "rollup"),
)
def rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


@register(
    "grouping_sets_order_stats",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {dsum_sql("o_totalprice", "total_price")}
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    description="GROUPING SETS through the engine's SQL-text entry "
    "point (spark.sql over a registered temp view — SURVEY.md §3 "
    "entry point 2): two disjoint group-bys in one Expand+aggregate "
    "pass, byte-identical SQL on both engines.",
    tags=("relational", "grouping-sets", "sql-entry"),
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {dsum_sql("o_totalprice", "total_price")}
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@register(
    "quantity_percentiles_by_flag",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.50) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Exact linear-interpolation percentiles per group "
    "(Spark `percentile` == DuckDB `quantile_cont`; quantities are "
    "small integral doubles, so the interpolation arithmetic is "
    "bit-exact across engines). The approx_percentile swap-in is the "
    "single-pass sketch at 100 TB.",
    tags=("relational", "percentile"),
)
def quantity_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
            F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
            F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


# Prices are clean 2-decimal money; cast to decimal FIRST and square in
# exact decimal space. Casting the already-squared double would hit
# engine-specific double→decimal rounding in the last ulp.
_SQL_SA = "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
_SQL_SA2 = (
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))"
    " * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
)


@register(
    "price_stddev_by_status",
    oracle=f"""
        SELECT o_orderstatus, n,
               sqrt((sa2 - sa * sa / n) / (n - 1)) AS stddev_price
        FROM (
            SELECT o_orderstatus,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   {_SQL_SA} AS sa,
                   {_SQL_SA2} AS sa2
            FROM orders
            GROUP BY o_orderstatus
        )
        ORDER BY o_orderstatus
    """,
    description="Deterministic sample stddev: decimal-exact Σx and Σx² "
    "(map-side combinable — one shuffle row per group), then an "
    "IDENTICAL double expression tree on both engines, so the result "
    "is bit-reproducible — unlike built-in stddev whose merge order "
    "varies run to run at scale.",
    tags=("relational", "stats"),
)
def price_stddev_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(18,2)")
    grouped = orders.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(p).cast("double").alias("sa"),
        F.sum(p * p).cast("double").alias("sa2"),
    )
    n, sa, sa2 = F.col("n"), F.col("sa"), F.col("sa2")
    # n > 1 guard: a single-order status group divides by (n-1)=0 — an
    # ANSI THROW in Spark, while DuckDB's double/0 quietly yields NULL
    # (measured); when() → NULL matches (built-in stddev_samp is also
    # NULL at n=1)
    return grouped.select(
        "o_orderstatus",
        "n",
        F.when(n > 1, F.sqrt((sa2 - sa * sa / n) / (n - 1))).alias(
            "stddev_price"
        ),
    ).orderBy("o_orderstatus")


@register(
    "orders_above_customer_avg",
    oracle=f"""
        WITH flagged AS (
            SELECT o_custkey, o_totalprice,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                            OVER (PARTITION BY o_custkey) AS DOUBLE)
                       / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
            FROM orders
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_above_avg,
               {dsum_sql("o_totalprice", "revenue_above_avg")}
        FROM flagged
        JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > cust_avg
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="Correlated-subquery semantics (orders above their own "
    "customer's average) decorrelated into a partitioned window — one "
    "shuffle on o_custkey instead of a per-row subquery; the classic "
    "Catalyst rewrite, authored explicitly.",
    tags=("relational", "window", "subquery"),
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey")
    p = F.col("o_totalprice")
    flagged = orders.select(
        "o_custkey",
        "o_totalprice",
        (
            F.sum(p.cast("decimal(38,6)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("cust_avg"),
    ).filter(p > F.col("cust_avg"))
    return (
        flagged.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            flagged.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_above_avg"),
            dsum("o_totalprice", "revenue_above_avg"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "nation_counts_full_outer",
    oracle="""
        WITH cc AS (
            SELECT c_nationkey AS nk, COUNT(*) AS n_customers
            FROM customer GROUP BY c_nationkey
        ), sc AS (
            SELECT s_nationkey AS nk, COUNT(*) AS n_rich_suppliers
            FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
        )
        SELECT COALESCE(cc.nk, sc.nk) AS nationkey,
               n_customers, n_rich_suppliers
        FROM cc FULL OUTER JOIN sc ON cc.nk = sc.nk
        ORDER BY nationkey
    """,
    description="Full outer join of two aggregates (customer counts vs "
    "high-balance supplier counts per nation) — preserves nations "
    "present on only one side with NULLs on the other.",
    tags=("relational", "join", "outer"),
)
def nation_counts_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    cc = customer.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count("*").alias("n_customers")
    )
    sc = (
        supplier.filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count("*").alias("n_rich_suppliers"))
    )
    return (
        cc.join(sc, cc.nk_c == sc.nk_s, "full_outer")
        .select(
            F.coalesce("nk_c", "nk_s").alias("nationkey"),
            "n_customers",
            "n_rich_suppliers",
        )
        .orderBy("nationkey")
    )


@register(
    "monthly_revenue_delta",
    oracle=f"""
        WITH m AS (
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                       AS order_month,
                   {dsum_sql("o_totalprice", "revenue")}
            FROM orders
            GROUP BY order_month
        )
        SELECT order_month, revenue,
               revenue - lag(revenue) OVER (ORDER BY order_month)
                   AS revenue_delta
        FROM m
        ORDER BY order_month
    """,
    description="Month-over-month revenue delta: grouped decimal-exact "
    "revenue then lag() over the (tiny) month series — the window "
    "runs on post-aggregate data, so the single-partition window is "
    "bounded regardless of input scale.",
    tags=("relational", "window", "lag"),
)
def monthly_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "order_month"
        )
    ).agg(dsum("o_totalprice", "revenue"))
    # asc_nulls_last pins the lag order to the oracle: a NULL
    # o_orderdate yields a NULL month group, which Spark's bare asc
    # sorts FIRST (shifting the first real month's delta) while
    # DuckDB sorts it LAST (r16 review)
    w = Window.orderBy(F.col("order_month").asc_nulls_last())
    return m.select(
        "order_month",
        "revenue",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("revenue_delta"),
    ).orderBy("order_month")


@register(
    "status_intersect_except",
    oracle="""
        SELECT o_orderstatus, 'both_years' AS membership FROM (
            SELECT DISTINCT o_orderstatus FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = 1995
            INTERSECT
            SELECT DISTINCT o_orderstatus FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = 1996
        )
        UNION ALL
        SELECT o_orderstatus, 'only_1995' AS membership FROM (
            SELECT DISTINCT o_orderstatus FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = 1995
            EXCEPT
            SELECT DISTINCT o_orderstatus FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = 1996
        )
        ORDER BY membership, o_orderstatus
    """,
    description="Set operations (INTERSECT / EXCEPT) over per-year "
    "order-status sets — Catalyst plans both as aggregates + joins, so "
    "they inherit partial aggregation and AQE like any other shuffle.",
    tags=("relational", "set-ops"),
)
def status_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")

    def year_statuses(y: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == y)
            .select("o_orderstatus")
            .distinct()
        )

    both = (
        year_statuses(1995)
        .intersect(year_statuses(1996))
        .select("o_orderstatus", F.lit("both_years").alias("membership"))
    )
    only95 = (
        year_statuses(1995)
        .exceptAll(year_statuses(1996))
        .select("o_orderstatus", F.lit("only_1995").alias("membership"))
    )
    return both.unionByName(only95).orderBy("membership", "o_orderstatus")


@register(
    "events_type_pivot",
    oracle=f"""
        SELECT user_id,
               {", ".join(
                   f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
                   f" AS n_{t}"
                   for t in ["click", "error", "purchase", "signup", "view"]
               )},
               {dsum_sql("CASE WHEN event_type = 'purchase' THEN value END",
                         "purchase_value")}
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Pivot (wide per-type counts per user) via groupBy()."
    "pivot() with an EXPLICIT value list — never the implicit form, "
    "which needs an extra distinct-scan job to discover columns and is "
    "nondeterministic about column order at scale.",
    tags=("relational", "pivot", "events"),
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = ["click", "error", "purchase", "signup", "view"]
    ev = read_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("v"),
        )
    )
    out = [F.col("user_id")]
    out += [
        F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("bigint").alias(f"n_{t}")
        for t in types
    ]
    out.append(F.col("purchase_v").cast("double").alias("purchase_value"))
    return pivoted.select(*out).orderBy("user_id")


@register(
    "order_priority_count_exists",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity > 45
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="TPC-H Q4 shape: EXISTS correlated subquery → left-semi "
    "join in Spark (identical plan Catalyst derives from the SQL EXISTS "
    "form) — per-priority counts of orders with any high-quantity line.",
    tags=("relational", "semi-join", "subquery"),
)
def order_priority_count_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    hot = lineitem.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.join(hot, orders.o_orderkey == hot.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "large_orders_q18",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150
        )
        SELECT c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               {dsum_sql("o_totalprice", "totalprice")}
        FROM orders
        JOIN big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_name, o_orderkey, orderdate
        ORDER BY o_orderkey
    """,
    description="TPC-H Q18 shape (large-volume orders): grouped HAVING "
    "on the fact table feeds a semi-ish join back to orders + customer. "
    "The HAVING aggregate is partial+final; only qualifying orderkeys "
    "cross the join.",
    tags=("relational", "having", "join"),
)
def large_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    customer = read_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(dsum("o_totalprice", "totalprice"))
        .orderBy("o_orderkey")
    )


@register(
    "approx_distinct_users_by_type",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               TRUE AS approx_within_5pct
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="approx_count_distinct (HyperLogLog++) per event type — "
    "the single-pass mergeable sketch that replaces exact "
    "count-distinct at 100 TB (exact needs a full shuffle of the "
    "distinct keys; the sketch is constant-size per group). Sketch "
    "values are engine-specific, so the checkable surface is the "
    "sketch's CONTRACT: the query emits the exact count plus a "
    "Spark-computed boolean asserting the sketch landed within ±5% of "
    "it; the oracle expects exact counts and a literal TRUE, so the "
    "hash matches iff the accuracy bound holds. The same bound is "
    "asserted in tests/test_approx.py.",
    tags=("relational", "approx"),
)
def approx_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


@register(
    "salted_user_event_counts",
    oracle=f"""
        SELECT user_id, COUNT(*) AS n_events,
               {dsum_sql("value", "total_value")}
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Skew-salted two-stage aggregation (operators.skew."
    "salted_aggregate): partial aggregate on (user_id, salt) spreads "
    "hot users over many reducers, then a per-key merge. The oracle is "
    "the plain GROUP BY — identical results by construction, verified "
    "row-for-row.",
    tags=("relational", "skew", "events"),
)
def salted_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.skew import salted_aggregate

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("value").cast("decimal(38,6)").alias("v")
    )
    out = salted_aggregate(
        ev, "user_id", {"n_events": "count:*", "total_value": "sum:v"}, n_salts=8
    )
    return out.select(
        "user_id",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    ).orderBy("user_id")


@register(
    "order_value_quartiles",
    oracle="""
        SELECT o_orderstatus, quartile,
               COUNT(*) AS n_orders,
               MIN(o_totalprice) AS lo,
               MAX(o_totalprice) AS hi
        FROM (
            SELECT o_orderstatus, o_totalprice,
                   NTILE(4) OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice ASC, o_orderkey ASC)
                       AS quartile
            FROM orders
        )
        GROUP BY o_orderstatus, quartile
        ORDER BY o_orderstatus, quartile
    """,
    description="ntile(4) quartile assignment per status with a total "
    "order (price, then orderkey tie-break — ntile is ordinal, so the "
    "tie-break is what makes the oracle hash exact), summarized per "
    "bucket.",
    tags=("relational", "window", "ntile"),
)
def order_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    # asc_nulls_last: a NULL price lands in the TOP quartile on both
    # engines — Spark's bare asc put it in quartile 1 while DuckDB's
    # ASC default (NULLS LAST) put it in 4, rotating every real
    # price's bucket (r16 review)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc_nulls_last(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderstatus", "o_totalprice", F.ntile(4).over(w).alias("quartile")
        )
        .groupBy("o_orderstatus", "quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("o_orderstatus", "quartile")
    )


# --------------------------------------------------------------------------
# Q12 / Q14 / Q17 / Q19 shapes (adapted to the testdata's columns):
# conditional-agg-over-join, ratio-of-conditional-sums, decorrelated
# per-key threshold, disjunctive multi-column pushdown.
# --------------------------------------------------------------------------


@register(
    "q12_priority_by_flag",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Q12 shape: fact-fact join with the date filter pushed "
    "to the lineitem scan (prunes before the shuffle), then "
    "conditional counts by priority class. AQE picks shuffle vs "
    "broadcast by the filtered size.",
    tags=("relational", "tpch", "q12"),
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
        SELECT 100.0
               * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(38,6))) AS DOUBLE)
                   AS promo_revenue_pct,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "total_revenue")}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    description="Q14 shape: promo-revenue share — ratio of two "
    "decimal-exact conditional sums over a month of lineitem "
    "broadcast-joined to part (part is the small side; no fact "
    "shuffle at any scale).",
    tags=("relational", "tpch", "q14"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast("decimal(38,6)")).cast("double")
            / F.sum(disc.cast("decimal(38,6)")).cast("double")
        ).alias("promo_revenue_pct"),
        dsum(disc, "total_revenue"),
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        WITH joined AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#13'
        ), with_avg AS (
            SELECT l_extendedprice, l_quantity,
                   0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                               OVER (PARTITION BY l_partkey) AS DOUBLE)
                          / COUNT(l_quantity) OVER (PARTITION BY l_partkey))
                       AS threshold
            FROM joined
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               / 7.0 AS avg_yearly
        FROM with_avg
        WHERE l_quantity < threshold
    """,
    description="Q17 shape: per-part average-quantity threshold. The "
    "correlated subquery is DECORRELATED into a window over one "
    "partitioning — lineitem is scanned once and shuffled once on "
    "l_partkey, instead of the naive scan-per-part re-read. Exact "
    "decimal average so the double threshold is engine-identical.",
    tags=("relational", "tpch", "q17", "window"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    )
    w = Window.partitionBy("l_partkey")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    with_avg = joined.select(
        "l_extendedprice",
        "l_quantity",
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(38,6)"))
                .over(w)
                .cast("double")
                / F.count("l_quantity").over(w)
            )
        ).alias("threshold"),
    )
    return with_avg.filter(F.col("l_quantity") < F.col("threshold")).agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


_Q19_ARMS_SQL = """
          (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#9'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
"""


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
        SELECT COUNT(*) AS n_lines,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE {_Q19_ARMS_SQL}
    """,
    description="Q19 shape: three disjunctive multi-column predicate "
    "arms across both join sides. The single-column residues "
    "(quantity range union, size bound) are still pushed to the scans; "
    "the cross-table arms evaluate post-join on the broadcast hash "
    "join — never a cartesian.",
    tags=("relational", "tpch", "q19"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    arms = (
        ((b == "Brand#13") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#20") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#9") & s.between(1, 35) & q.between(20, 30))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(arms)
        .agg(F.count("*").alias("n_lines"), dsum(disc, "revenue"))
    )


@register(
    "max_order_per_status_argmax",
    oracle="""
        SELECT o_orderstatus,
               struct_extract(max({'v': o_totalprice, 'k': o_orderkey}), 'v')
                   AS max_price,
               struct_extract(max({'v': o_totalprice, 'k': o_orderkey}), 'k')
                   AS max_orderkey
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    description="Deterministic arg-max (max_by shape): plain "
    "max_by/arg_max leaves ties engine-defined, so the engine uses "
    "the lexicographic struct-max idiom — max(struct(value, key)) — "
    "which both Spark and DuckDB order identically, making the "
    "winning key well-defined under price ties. One partial-agg "
    "shuffle, no window.",
    tags=("relational", "aggregate", "argmax"),
)
def max_order_per_status_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    m = F.max(F.struct(F.col("o_totalprice").alias("v"), F.col("o_orderkey").alias("k")))
    return (
        orders.groupBy("o_orderstatus")
        .agg(m.alias("m"))
        .select(
            "o_orderstatus",
            F.col("m.v").alias("max_price"),
            F.col("m.k").alias("max_orderkey"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "order_price_percentile_rank",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, pr, cd
        FROM (
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   percent_rank() OVER w AS pr,
                   cume_dist() OVER w AS cd
            FROM orders
            WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
        )
        WHERE pr >= 0.999
        ORDER BY o_orderstatus, o_orderkey
    """,
    description="percent_rank + cume_dist per status partition — the "
    "relative-standing window pair. Both are pure rational functions "
    "of rank and partition size ((r−1)/(n−1), r/n), so the doubles "
    "are IEEE-identical cross-engine; ties share a rank, making the "
    "result independent of intra-tie order. Top 0.1% filter keeps "
    "the output bounded at any scale.",
    tags=("relational", "window"),
)
def order_price_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # asc_nulls_last pins percent_rank's order to the oracle: DuckDB
    # sorts a NULL price LAST (pr≈1.0, emitted by the top-0.1%
    # filter) while Spark's bare orderBy sorted it FIRST (pr=0,
    # dropped) AND shifted every real row's (r-1)/(n-1) (r16 review)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc_nulls_last()
    )
    return (
        read_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .filter(F.col("pr") >= 0.999)
        .orderBy("o_orderstatus", "o_orderkey")
    )


@register(
    "brand_number_histogram",
    oracle="""
        SELECT CAST(regexp_extract(p_brand, '(\\d+)', 1) AS INT) AS brand_no,
               COUNT(*) AS n_parts,
               COUNT(DISTINCT p_type) AS n_types
        FROM part
        GROUP BY brand_no
        ORDER BY brand_no
    """,
    description="Regexp group extraction + cast feeding an aggregate "
    "(string-function surface: the reference's string ops are "
    "casts/CASE only — SURVEY.md §2.8 notes no regex; this is the "
    "engine extension). Identical RE2-compatible pattern on both "
    "engines.",
    tags=("relational", "scalar", "string"),
)
def brand_number_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "part")
        .select(
            F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_no"),
            "p_type",
        )
        .groupBy("brand_no")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("p_type").alias("n_types"),
        )
        .orderBy("brand_no")
    )


@register(
    "lineitem_safe_math",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               COUNT(ratio) AS n_valid,
               CAST(COUNT(*) - COUNT(ratio) AS BIGINT) AS n_div_zero,
               MIN(ratio) AS min_ratio,
               MAX(ratio) AS max_ratio
        FROM (
            SELECT l_returnflag,
                   l_extendedprice / nullif(l_quantity - 24.0, 0.0) AS ratio
            FROM lineitem
        )
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="ANSI-safe arithmetic surface (Spark 4 defaults ANSI "
    "on, where bare division by zero ABORTS the job): try_divide "
    "yields NULL instead, matching SQL's x / NULLIF(y, 0). "
    "Aggregates are min/max/counts — deliberately NOT a sum of the "
    "full-precision quotients, whose decimal rounding is not "
    "bit-stable cross-engine.",
    tags=("relational", "scalar", "ansi"),
)
def lineitem_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.lit(24.0)
        ).alias("ratio"),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.count("ratio").alias("n_valid"),
            (F.count("*") - F.count("ratio")).alias("n_div_zero"),
            F.min("ratio").alias("min_ratio"),
            F.max("ratio").alias("max_ratio"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "supplier_trailing_week_quantity",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_suppkey,
               strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (
                   PARTITION BY l_suppkey ORDER BY epoch(l_shipdate)
                   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_7d_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
        ORDER BY l_suppkey, ship_day, l_orderkey, l_linenumber
    """,
    description="RANGE window frame over event time: per-supplier "
    "trailing-7-day shipped quantity — the time-window analytic the "
    "rows-frame running total can't express (peers at the same "
    "timestamp share a frame, gaps shrink it). Frame bounds are "
    "seconds on the epoch ordering key; the decimal-cast sum keeps "
    "the double deterministic. One shuffle on the partition key.",
    tags=("relational", "window", "range-frame"),
)
def supplier_trailing_week_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-03-01 00:00:00").cast("timestamp"))
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_timestamp("l_shipdate"))
        .rangeBetween(-604800, Window.currentRow)
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
            F.sum(F.col("l_quantity").cast("decimal(38,6)"))
            .over(w)
            .cast("double")
            .alias("trailing_7d_qty"),
        )
        .orderBy("l_suppkey", "ship_day", "l_orderkey", "l_linenumber")
    )


@register(
    "orders_quality_report",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS null_custkey,
               CAST(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nonpositive_price,
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
               CAST(SUM(CASE WHEN o_orderdate <  TIMESTAMP '1990-01-01 00:00:00'
                               OR o_orderdate >= TIMESTAMP '2030-01-01 00:00:00'
                             THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range_date,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                   AS duplicate_keys
        FROM orders
    """,
    description="One-pass data-quality report (expectations surface): "
    "null / range / domain / uniqueness rules evaluated as conditional "
    "sums in a SINGLE aggregate over a single scan — N rules never "
    "cost N passes, the posture that matters when the table is 100 TB. "
    "The distinct-count rule rides the same shuffle via Catalyst's "
    "expand.",
    tags=("relational", "quality"),
)
def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    bad_date = (
        F.col("o_orderdate") < F.lit("1990-01-01 00:00:00").cast("timestamp")
    ) | (F.col("o_orderdate") >= F.lit("2030-01-01 00:00:00").cast("timestamp"))
    return o.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("o_custkey")).alias("null_custkey"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0.0, 1).otherwise(0)
        ).alias("nonpositive_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(F.when(bad_date, 1).otherwise(0)).alias("out_of_range_date"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("duplicate_keys"),
    )


@register(
    "status_priority_sets",
    oracle="""
        SELECT o_orderstatus,
               array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
                   AS priorities,
               COUNT(DISTINCT o_orderpriority) AS n_priorities
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    description="Deterministic array aggregation: collect_set is "
    "unordered (partition-dependent), so the engine always sorts the "
    "collected array before emitting it — the only way an array-typed "
    "result can be reproducible, diffable, and oracle-checkable. The "
    "final array is rendered as a CSV string because the differential "
    "harness canonicalizes with a pandas sort that rejects list cells.",
    tags=("relational", "array-agg"),
)
def status_priority_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
        .orderBy("o_orderstatus")
    )


#: SCD2 version stream of the customer dimension — base snapshot
#: effective 1995-01-01, negative balances zeroed effective
#: 1999-06-01. ONE definition (Spark + oracle CTE body) shared by
#: customer_scd2_merge and orders_pit_customer_balance, so the magic
#: dates and the correction rule cannot drift between the two queries
#: the docs describe as "the same deterministic SCD2 construction".
_SQL_CUSTOMER_VERSIONS = """
            SELECT c_custkey, c_acctbal,
                   TIMESTAMP '1995-01-01 00:00:00' AS valid_from
            FROM customer
            UNION ALL
            SELECT c_custkey, 0.0 AS c_acctbal,
                   TIMESTAMP '1999-06-01 00:00:00' AS valid_from
            FROM customer WHERE c_acctbal < 0.0
"""


def _customer_versions(customer: DataFrame) -> DataFrame:
    base = customer.select(
        "c_custkey",
        "c_acctbal",
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
    )
    corrections = customer.filter(F.col("c_acctbal") < 0.0).select(
        "c_custkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("1999-06-01 00:00:00").cast("timestamp").alias("valid_from"),
    )
    return base.unionByName(corrections)


@register(
    "customer_scd2_merge",
    oracle=f"""
        WITH versions AS (
            {_SQL_CUSTOMER_VERSIONS}
        )
        SELECT c_custkey, c_acctbal,
               strftime(valid_from, '%Y-%m-%d') AS valid_from,
               strftime(lead(valid_from) OVER (
                   PARTITION BY c_custkey ORDER BY valid_from
               ), '%Y-%m-%d') AS valid_to,
               CAST(lead(valid_from) OVER (
                   PARTITION BY c_custkey ORDER BY valid_from
               ) IS NULL AS BOOLEAN) AS is_current
        FROM versions
        ORDER BY c_custkey, valid_from
    """,
    description="SCD Type-2 merge (warehouse dim maintenance): apply a "
    "correction batch (negative balances zeroed, effective 1999-06-01) "
    "to a versioned dimension — union the update versions, then ONE "
    "lead() window per key closes each version's validity interval and "
    "flags the current row. No MERGE statement needed: the windowed "
    "union is the scalable formulation (one shuffle on the business "
    "key), and it's idempotent over re-applied batches with the same "
    "effective date.",
    tags=("relational", "scd2", "window"),
)
def customer_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    versions = _customer_versions(customer)
    w = Window.partitionBy("c_custkey").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w)
    return (
        versions.select(
            "c_custkey",
            "c_acctbal",
            F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
            F.date_format(nxt, "yyyy-MM-dd").alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("c_custkey", "valid_from")
    )


@register(
    "order_metrics_unpivot",
    oracle="""
        WITH wide AS (
            SELECT o_orderstatus,
                   COUNT(*) * 1.0 AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                       AS total_price,
                   MAX(o_totalprice) AS max_price
            FROM orders GROUP BY o_orderstatus
        )
        UNPIVOT wide
        ON n_orders, total_price, max_price
        INTO NAME metric VALUE value
        ORDER BY o_orderstatus, metric
    """,
    description="Wide-to-long reshaping (unpivot/melt): a per-status "
    "metrics row fans out to (status, metric, value) triples — the "
    "reporting/metric-store export shape, inverse of the pivot query. "
    "Runs on the already-aggregated frame (Expand over 3 rows per "
    "group, not over the fact).",
    tags=("relational", "unpivot"),
)
def order_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            (F.count("*") * 1.0).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    return (
        wide.unpivot(
            "o_orderstatus",
            ["n_orders", "total_price", "max_price"],
            "metric",
            "value",
        )
        # pin the NULL contract to the oracle: DuckDB's UNPIVOT
        # EXCLUDES NULL values by default while Spark's retains them —
        # an all-NULL metric (e.g. total_price of an all-NULL-price
        # status) would otherwise emit a row the oracle never produces
        .where(F.col("value").isNotNull())
        .orderBy("o_orderstatus", "metric")
    )


@register(
    "customer_order_recency",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(MIN(date_diff('day', last_order,
                        TIMESTAMP '2001-09-01 00:00:00')) AS INT)
                   AS min_recency_days,
               CAST(MAX(date_diff('day', last_order,
                        TIMESTAMP '2001-09-01 00:00:00')) AS INT)
                   AS max_recency_days
        FROM (
            SELECT c_custkey, c_mktsegment, MAX(o_orderdate) AS last_order
            FROM customer JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey, c_mktsegment
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="Order recency (RFM's R): days since each customer's "
    "last order as of a fixed analysis date, rolled up per segment — "
    "midnight-aligned timestamps make Spark datediff and DuckDB "
    "date_diff('day') agree exactly.",
    tags=("relational", "date", "rfm"),
)
def customer_order_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    asof = F.lit("2001-09-01 00:00:00").cast("timestamp")
    last = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.max("o_orderdate").alias("last_order"))
    )
    return (
        last.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.min(F.datediff(asof, F.col("last_order")))
            .cast("int")
            .alias("min_recency_days"),
            F.max(F.datediff(asof, F.col("last_order")))
            .cast("int")
            .alias("max_recency_days"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "part_affinity_topk",
    oracle="""
        WITH op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), n_total AS (
            SELECT COUNT(DISTINCT l_orderkey) AS n FROM op
        ), per_part AS (
            SELECT l_partkey, COUNT(*) AS n_orders FROM op GROUP BY l_partkey
        ), pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS n_together
            FROM op a JOIN op b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY part_a, part_b
        )
        SELECT p.part_a, p.part_b,
               CAST(p.n_together AS BIGINT) AS n_together,
               CAST(p.n_together AS DOUBLE) * (SELECT n FROM n_total)
                   / pa.n_orders / pb.n_orders AS lift
        FROM pairs p
        JOIN per_part pa ON p.part_a = pa.l_partkey
        JOIN per_part pb ON p.part_b = pb.l_partkey
        WHERE p.n_together >= 2
        ORDER BY n_together DESC, part_a, part_b
        LIMIT 20
    """,
    description="Market-basket part affinity: top co-ordered part "
    "pairs with lift (P(ab)·N / (P(a)·P(b))). The self-join runs on "
    "the DEDUPED (order, part) set and is keyed on l_orderkey, so the "
    "pair blow-up is bounded by items-per-order choose 2 (~21 at "
    "TPC-H's ~7 lines/order), never corpus-quadratic; one shuffle for "
    "the self-join, one for the pair count. Lift derives from counts "
    "with an identical expression tree on both engines. Measured "
    "against the collect_list + array-combinatorics alternative at "
    "sf0.1: self-join 1.85s vs arrays 2.12s — the equi-join keeps "
    "whole-stage codegen where the nested transform/slice lambdas "
    "don't, and the basket arrays never materialize.",
    tags=("relational", "affinity", "self-join"),
)
def part_affinity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    op = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_total = op.select(F.countDistinct("l_orderkey").alias("n"))
    per_part = op.groupBy("l_partkey").agg(F.count("*").alias("n_orders"))
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_together"))
        .filter(F.col("n_together") >= 2)
    )
    pa = per_part.select(
        F.col("l_partkey").alias("pa_key"), F.col("n_orders").alias("pa_n")
    )
    pb = per_part.select(
        F.col("l_partkey").alias("pb_key"), F.col("n_orders").alias("pb_n")
    )
    return (
        pairs.join(pa, F.col("part_a") == F.col("pa_key"))
        .join(pb, F.col("part_b") == F.col("pb_key"))
        .join(F.broadcast(n_total))
        .select(
            "part_a",
            "part_b",
            F.col("n_together").cast("long").alias("n_together"),
            (
                F.col("n_together").cast("double")
                * F.col("n")
                / F.col("pa_n")
                / F.col("pb_n")
            ).alias("lift"),
        )
        .orderBy(F.col("n_together").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "customer_value_deciles",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                       AS spend
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT *, NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
            FROM per_cust
        )
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(n_orders) AS BIGINT) AS total_orders,
               {dsum_sql("spend", "total_spend")},
               MIN(spend) AS min_spend,
               MAX(spend) AS max_spend
        FROM ranked
        GROUP BY decile
        ORDER BY decile
    """,
    description="Customer-value decile segmentation: per-customer spend "
    "rolls up first (the shuffle is on o_custkey and the window then "
    "runs over the ALREADY-AGGREGATED frame — one row per customer, "
    "not per order), deciles via ntile with a total-order tie-break, "
    "per-decile stats after. The global ntile is a single-partition "
    "sort over customers only; at true scale use the window-free "
    "customer_value_deciles_twopass twin (percentile_disc boundary "
    "buckets), same output contract.",
    tags=("relational", "window", "segmentation"),
)
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("spend"),
    )
    w = Window.orderBy(F.col("spend").desc(), "o_custkey")
    ranked = per_cust.withColumn("decile", F.ntile(10).over(w).cast("long"))
    return (
        ranked.groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").cast("long").alias("total_orders"),
            dsum("spend", "total_spend"),
            F.min("spend").alias("min_spend"),
            F.max("spend").alias("max_spend"),
        )
        .orderBy("decile")
    )


def _bucket_bounds_sql(col: str, prefix: str, n: int) -> str:
    """percentile_disc boundary columns for an n-bucket split of
    ``col`` — ONE definition shared by the decile (n=10) and
    RFM-quintile (n=5) twopass oracles, so the boundary formulation
    (fraction repr, percentile_disc semantics) cannot drift between
    them."""
    return ",\n                   ".join(
        f"percentile_disc({i / n!r}) WITHIN GROUP (ORDER BY {col})"
        f" AS {prefix}{i}"
        for i in range(1, n)
    )


def _bucket_case_sql(col: str, prefix: str, n: int, op: str) -> str:
    """1-based bucket id: count of crossed boundaries + 1."""
    cases = " + ".join(
        f"(CASE WHEN {col} {op} {prefix}{i} THEN 1 ELSE 0 END)"
        for i in range(1, n)
    )
    return f"1 + {cases}"


@register(
    "customer_value_deciles_twopass",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                       AS spend
            FROM orders GROUP BY o_custkey
        ), bounds AS (
            SELECT {_bucket_bounds_sql("spend", "p", 10)}
            FROM per_cust
        ), assigned AS (
            SELECT n_orders, spend,
                   CAST({_bucket_case_sql("spend", "p", 10, "<")} AS BIGINT) AS decile
            FROM per_cust CROSS JOIN bounds
        )
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(n_orders) AS BIGINT) AS total_orders,
               {dsum_sql("spend", "total_spend")},
               MIN(spend) AS min_spend,
               MAX(spend) AS max_spend
        FROM assigned
        GROUP BY decile
        ORDER BY decile
    """,
    description="Window-free twin of customer_value_deciles — the "
    "documented at-scale swap, implemented (the same arc as the "
    "winsorize/MAD two-pass twins): decile BOUNDARIES come from nine "
    "percentile_disc aggregates over the per-customer spend, "
    "broadcast back as one row, and each customer's decile is 1 + "
    "the count of boundaries its spend falls below — no global NTILE "
    "sort in a single task (the window form sorts EVERY customer in "
    "one task; here the percentile merge task handles per-partition "
    "value-count sketches, O(distinct spends), and every other task "
    "is bounded). An exchange-reuse pin keeps the bounds and "
    "assignment branches canonically identical so the orders scan + "
    "per-customer shuffle run ONCE (plan-asserted). Semantics are "
    "value buckets (ties share a decile) rather than NTILE's "
    "equal-count buckets, hence the separate oracle; percentile_disc "
    "returns an actual data value, so the boundary comparisons are "
    "engine-exact with no interpolation arithmetic.",
    tags=("relational", "window", "segmentation", "scale-twin"),
)
def customer_value_deciles_twopass(
    spark: SparkSession,
    sf_dir: str,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """``approx=False`` (the registry/oracle form) takes boundaries
    from nine exact percentile_disc aggregates — engine-reproducible,
    but each buffers the full spend multiset, so the merge task holds
    O(distinct spends) state nine times over. ``approx=True`` is the
    EXTREME-scale form (the profile_table approx= pattern): ONE shared
    percentile_approx sketch yields all nine boundaries with bounded
    memory at any customer count; boundaries may be off by up to
    1/accuracy in rank, every customer still lands in exactly one
    bucket, and no SQL engine reproduces the sketch — so the smoke
    checks its invariants, not a hash."""
    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("spend"),
    )
    if approx:
        bound_cols = [
            F.percentile_approx(
                "spend", [i / 10 for i in range(1, 10)], accuracy
            ).alias("ps"),
        ]
    else:
        bound_cols = [
            F.expr(
                f"percentile_disc({i / 10!r}) WITHIN GROUP (ORDER BY spend)"
            ).alias(f"p{i}")
            for i in range(1, 10)
        ]
    bounds = per_cust.agg(
        *bound_cols,
        # EXCHANGE-REUSE PIN: the boundaries only need `spend`, so
        # column pruning would narrow this branch's per_cust subtree
        # below the main branch's (which also needs n_orders) and the
        # two per-customer shuffles would no longer canonicalize equal
        # — Spark would scan and shuffle orders TWICE. Aggregating
        # n_orders here and consuming it in the always-true filter
        # below keeps both subtrees identical, so ReuseExchange runs
        # the scan + shuffle ONCE (plan-asserted in tests/test_plans).
        F.max("n_orders").alias("_pin_n_orders"),
    )
    if approx:
        bounds = bounds.select(
            *[F.col("ps")[i - 1].alias(f"p{i}") for i in range(1, 10)],
            "_pin_n_orders",
        )
    decile = F.lit(1)
    for i in range(1, 10):
        # when/otherwise mirrors the oracle's CASE ... ELSE 0: a NULL
        # spend (all-NULL-price customer) must count ZERO crossings
        # and land in decile 1 on both engines — the bare boolean
        # cast propagated NULL into a decile the oracle never emits
        # (r16 review)
        decile = decile + F.when(
            F.col("spend") < F.col(f"p{i}"), 1
        ).otherwise(0)
    assigned = (
        per_cust.crossJoin(F.broadcast(bounds))
        # always true (per-customer counts are >= 1): exists only to
        # reference the pin so pruning can't drop it — semantic no-op,
        # absent from the oracle by design
        .where(F.col("_pin_n_orders") >= 0)
        .select("n_orders", "spend", decile.cast("long").alias("decile"))
    )
    return (
        assigned.groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").cast("long").alias("total_orders"),
            dsum("spend", "total_spend"),
            F.min("spend").alias("min_spend"),
            F.max("spend").alias("max_spend"),
        )
        .orderBy("decile")
    )


@register(
    "customer_value_deciles_sketch",
    oracle="""
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               TRUE AS all_assigned,
               TRUE AS deciles_in_range,
               TRUE AS spend_mass_matches_exact
        FROM orders
    """,
    description="CONTRACT oracle for the approx=True decile path — the "
    "bounded-memory extreme-scale form (one shared percentile_approx "
    "sketch; 2-3x faster than the NTILE window at 2M customers, "
    "README 'Scale evidence') is otherwise driver-invisible, the same "
    "gap the BM25 serve-only row closed for the index. The sketch's "
    "boundary values may jitter with partial-merge order, so the "
    "checked invariants are the ones boundary jitter CANNOT move: "
    "every customer lands in exactly one bucket (count == the exact "
    "form's == COUNT(DISTINCT o_custkey)), every bucket id is in "
    "1..10, and the total spend mass equals the exact form's. The "
    "oracle expects the literal booleans TRUE, so the hash matches "
    "iff the contract holds — the same trick as "
    "kmeans_embedding_clusters and the ANN family.",
    tags=("relational", "segmentation", "approx", "contract"),
)
def customer_value_deciles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    approx = customer_value_deciles_twopass(spark, sf_dir, approx=True)
    exact = customer_value_deciles_twopass(spark, sf_dir)
    a = approx.agg(
        F.sum("n_customers").cast("bigint").alias("n"),
        F.min("decile").alias("dmin"),
        F.max("decile").alias("dmax"),
        F.sum(F.col("total_spend").cast("decimal(38,6)")).alias("mass"),
    )
    e = exact.agg(
        F.sum("n_customers").cast("bigint").alias("ne"),
        F.sum(F.col("total_spend").cast("decimal(38,6)")).alias("masse"),
    )
    # both sides are 1-row aggregates; on empty orders every measure is
    # NULL and the coalesces assert the contract vacuously (0 customers)
    mass_diff = F.abs(
        F.col("mass").cast("double") - F.col("masse").cast("double")
    )
    return a.crossJoin(e).select(
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_customers"),
        F.coalesce(F.col("n") == F.col("ne"), F.lit(True)).alias(
            "all_assigned"
        ),
        F.coalesce(
            (F.col("dmin") >= 1) & (F.col("dmax") <= 10), F.lit(True)
        ).alias("deciles_in_range"),
        F.coalesce(
            mass_diff
            <= F.lit(1e-9) * F.abs(F.col("masse").cast("double")) + F.lit(1e-6),
            F.lit(True),
        ).alias("spend_mass_matches_exact"),
    )


@register(
    "customer_rfm_segments_sketch",
    oracle="""
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               TRUE AS all_assigned,
               TRUE AS codes_in_range,
               TRUE AS monetary_mass_matches_exact
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    description="CONTRACT oracle for the approx=True RFM path (three "
    "shared percentile_approx sketches — the bounded-memory form, "
    "2-5x faster than the triple-NTILE window at 2-10M customers). "
    "Same invariant design as customer_value_deciles_sketch: checks "
    "only what sketch jitter cannot move — total customers segmented "
    "(== COUNT DISTINCT), every 3-digit code has digits in 1..5, and "
    "the monetary mass equals the exact boundary form's.",
    tags=("relational", "rfm", "approx", "contract"),
)
def customer_rfm_segments_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    approx = customer_rfm_segments_twopass(spark, sf_dir, approx=True)
    exact = customer_rfm_segments_twopass(spark, sf_dir)
    # min/max over each code's three digits: in-range iff the smallest
    # digit anywhere is >= 1 and the largest is <= 5
    digit_ok = (F.col("dig_min") >= 1) & (F.col("dig_max") <= 5)
    a = approx.agg(
        F.sum("n_customers").cast("bigint").alias("n"),
        F.min(
            F.least(
                F.floor(F.col("rfm_code") / 100),
                F.floor(F.pmod(F.col("rfm_code"), 100) / 10),
                F.pmod(F.col("rfm_code"), 10),
            )
        ).alias("dig_min"),
        F.max(
            F.greatest(
                F.floor(F.col("rfm_code") / 100),
                F.floor(F.pmod(F.col("rfm_code"), 100) / 10),
                F.pmod(F.col("rfm_code"), 10),
            )
        ).alias("dig_max"),
        F.sum(F.col("total_monetary").cast("decimal(38,6)")).alias("mass"),
    )
    e = exact.agg(
        F.sum("n_customers").cast("bigint").alias("ne"),
        F.sum(F.col("total_monetary").cast("decimal(38,6)")).alias("masse"),
    )
    mass_diff = F.abs(
        F.col("mass").cast("double") - F.col("masse").cast("double")
    )
    return a.crossJoin(e).select(
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_customers"),
        F.coalesce(F.col("n") == F.col("ne"), F.lit(True)).alias(
            "all_assigned"
        ),
        F.coalesce(digit_ok, F.lit(True)).alias("codes_in_range"),
        F.coalesce(
            mass_diff
            <= F.lit(1e-9) * F.abs(F.col("masse").cast("double")) + F.lit(1e-6),
            F.lit(True),
        ).alias("monetary_mass_matches_exact"),
    )


@register(
    "nation_share_of_region_revenue",
    oracle=f"""
        WITH per_nation AS (
            -- the DECIMAL sum is kept AS decimal into the window:
            -- recasting the double back to DECIMAL(38,6) re-rounds
            -- through the measured Spark-vs-DuckDB double→decimal
            -- divergence once revenue outgrows 2^53/1e6 (~9e9, i.e.
            -- sf>=1); decimal end-to-end never rounds (r16 review)
            SELECT r_name, n_name,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   {dsum_dec_sql("o_totalprice", "revenue_dec")}
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        )
        SELECT r_name, n_name, n_orders,
               CAST(CAST(revenue_dec AS VARCHAR(64)) AS DOUBLE) AS revenue,
               CAST(CAST(revenue_dec AS VARCHAR(64)) AS DOUBLE)
                   / CAST(CAST(SUM(revenue_dec) OVER (PARTITION BY r_name)
                               AS VARCHAR(64)) AS DOUBLE)
                   AS region_share
        FROM per_nation
        ORDER BY r_name, n_name
    """,
    description="Ratio-to-parent reporting: each nation's share of its "
    "region's revenue — aggregate once per (region, nation), then a "
    "window SUM over the ALREADY-AGGREGATED frame (≤ nations rows "
    "enters the window, never raw orders). The share divides the "
    "decimal-exact dsum by its window total with the identical "
    "expression tree on both engines. Dims broadcast; one fact "
    "shuffle for the aggregate.",
    tags=("relational", "window", "ratio-to-parent"),
)
def nation_share_of_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    per_nation = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            # kept AS decimal into the window: see the oracle note —
            # a double→decimal recast re-rounds divergently cross-
            # engine once revenue outgrows ~9e9 (r16 review)
            dsum_dec("o_totalprice", "revenue_dec"),
        )
    )
    w = Window.partitionBy("r_name")
    # decimal-exact window total: a double SUM's merge order varies
    # with partitioning, so the share's last ulp would be unstable.
    total = F.sum("revenue_dec").over(w).cast("double")
    return per_nation.select(
        "r_name",
        "n_name",
        "n_orders",
        F.col("revenue_dec").cast("double").alias("revenue"),
        (F.col("revenue_dec").cast("double") / total).alias("region_share"),
    ).orderBy("r_name", "n_name")


@register(
    "customer_snapshot_diff",
    oracle="""
        WITH old_snap AS (
            SELECT c_custkey, c_acctbal, c_mktsegment
            FROM customer WHERE c_custkey % 10 <> 0
        ),
        new_snap AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 5 = 0
                        THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
                   c_mktsegment
            FROM customer WHERE c_custkey % 7 <> 0
        )
        SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'added'
                    WHEN n.c_custkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS change_type,
               o.c_acctbal AS old_acctbal,
               n.c_acctbal AS new_acctbal
        FROM old_snap o FULL OUTER JOIN new_snap n USING (c_custkey)
        WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
           OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
           OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
        ORDER BY c_custkey
    """,
    description="Snapshot diff (CDC derivation): classify every key of "
    "two table snapshots as added / removed / changed via ONE full "
    "outer join on the key plus null-safe column comparison, emitting "
    "only the delta. The snapshots are carved deterministically from "
    "`customer` (old: custkey%10≠0; new: custkey%7≠0 with %5==0 "
    "balances bumped) so the oracle is closed. Scale shape: a single "
    "key-partitioned shuffle join — the delta between two 100 TB "
    "snapshots costs one co-partitioned pass, no driver state.",
    tags=("relational", "cdc"),
)
def customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    old_snap = customer.filter(F.col("c_custkey") % 10 != 0).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    new_snap = customer.filter(F.col("c_custkey") % 7 != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
    )
    o = old_snap.alias("o")
    n = new_snap.alias("n")
    joined = o.join(n, on=F.col("o.c_custkey") == F.col("n.c_custkey"), how="full_outer")
    changed = (
        F.col("o.c_custkey").isNull()
        | F.col("n.c_custkey").isNull()
        | ~F.col("o.c_acctbal").eqNullSafe(F.col("n.c_acctbal"))
        | ~F.col("o.c_mktsegment").eqNullSafe(F.col("n.c_mktsegment"))
    )
    return (
        joined.where(changed)
        .select(
            F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey")).alias("c_custkey"),
            F.when(F.col("o.c_custkey").isNull(), F.lit("added"))
            .when(F.col("n.c_custkey").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("change_type"),
            F.col("o.c_acctbal").alias("old_acctbal"),
            F.col("n.c_acctbal").alias("new_acctbal"),
        )
        .orderBy("c_custkey")
    )


@register(
    "orders_pit_customer_balance",
    oracle=f"""
        WITH versions AS (
            {_SQL_CUSTOMER_VERSIONS}
        )
        SELECT o.o_orderkey,
               o.o_custkey AS c_custkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               v.c_acctbal AS pit_acctbal
        FROM orders o
        ASOF LEFT JOIN versions v
          ON o.o_custkey = v.c_custkey AND o.o_orderdate >= v.valid_from
        ORDER BY o.o_orderkey
    """,
    description="Point-in-time (PIT) dimension lookup: each order "
    "joined to the customer-balance VERSION valid at its order date — "
    "the temporally-correct join that prevents feature leakage in "
    "training pipelines (a naive join reads today's balance into a "
    "1996 order). The version stream is the same deterministic SCD2 "
    "construction as customer_scd2_merge (base 1995-01-01; negative "
    "balances zeroed effective 1999-06-01; order dates run to 2001 so "
    "both versions are exercised). Spark side reuses "
    "operators.temporal.asof_join — ONE shuffle on the business key, "
    "single window pass, no range explosion; the oracle is DuckDB's "
    "native ASOF JOIN, an independent implementation of the same "
    "semantics. Cites reference scope: the reference has no temporal "
    "join; this is engine surface (SURVEY.md §2.3).",
    tags=("relational", "temporal", "scd2", "asof"),
)
def orders_pit_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.temporal import asof_join

    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    versions = _customer_versions(customer)
    left = orders.select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_orderdate"
    )
    pit = asof_join(
        left,
        versions,
        on="c_custkey",
        left_ts="o_orderdate",
        right_ts="valid_from",
        how="left",
    )
    return pit.select(
        "o_orderkey",
        "c_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.col("c_acctbal").alias("pit_acctbal"),
    ).orderBy("o_orderkey")


#: The star schema's FK edges: (edge label, fact table, fk col, dim
#: table, pk col, dim is broadcast-small). Order defines output order.
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey", True),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey", True),
]


@register(
    "referential_integrity_report",
    oracle="""
        {}
        ORDER BY edge
    """.format(
        " UNION ALL ".join(
            f"""
            SELECT '{label}' AS edge,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN d.{pk} IS NULL AND f.{fk} IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
                   CAST(SUM(CASE WHEN f.{fk} IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_null_fk
            FROM {fact} f LEFT JOIN (SELECT DISTINCT {pk} FROM {dim}) d
              ON f.{fk} = d.{pk}
            """
            for label, fact, fk, dim, pk, _ in _FK_EDGES
        )
    ),
    description="Referential-integrity audit of the whole star schema "
    "(the Deequ-style constraint suite's FK member): for every FK edge, "
    "the fact rows whose key has no match in the dimension (orphans) "
    "and the NULL-key rows, in one report frame. Each edge is ONE "
    "anti-join counted — dims are broadcast (no fact shuffle at all "
    "for six of the seven edges); the one fact-fact edge "
    "(lineitem→orders) shuffles on the join key exactly once. The "
    "oracle recomputes each edge with an independent left-join "
    "formulation. On clean driver data all orphan counts are zero — "
    "the report's value is the shape: this is the pre-ingest gate a "
    "100 TB pipeline runs before promoting a batch, and the "
    "crafted-orphan behavioral test proves the counts fire.",
    tags=("relational", "governance", "anti-join", "audit"),
)
def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One pass PER FACT TABLE, not per edge: all of a fact's dims are
    # left-joined onto a single scan (each dim key-deduped, so joins
    # can't multiply rows) and every edge's orphan/null counts come out
    # of ONE aggregate, unpivoted with stack(). At 100 TB this is the
    # difference between scanning lineitem three times and once.
    by_fact: dict[str, list[tuple[str, str, str, str, bool]]] = {}
    for label, fact, fk, dim, pk, small in _FK_EDGES:
        by_fact.setdefault(fact, []).append((label, fk, dim, pk, small))
    frames = []
    for fact, edges in by_fact.items():
        cur = read_table(spark, sf_dir, fact).select(
            *sorted({fk for _, fk, _, _, _ in edges})
        )
        for i, (_, fk, dim, pk, small) in enumerate(edges):
            d = (
                read_table(spark, sf_dir, dim)
                .select(F.col(pk).alias(f"__pk_{i}"))
                .distinct()
            )
            if small:
                d = F.broadcast(d)
            cur = cur.join(d, F.col(fk) == F.col(f"__pk_{i}"), "left")
        aggs = [F.count(F.lit(1)).cast("bigint").alias("__n_rows")]
        for i, (_, fk, _, _, _) in enumerate(edges):
            aggs.append(
                F.sum(
                    (F.col(f"__pk_{i}").isNull() & F.col(fk).isNotNull())
                    .cast("long")
                )
                .cast("bigint")
                .alias(f"__orph_{i}")
            )
            aggs.append(
                F.sum(F.col(fk).isNull().cast("long"))
                .cast("bigint")
                .alias(f"__null_{i}")
            )
        stack_args = ", ".join(
            f"'{label}', __orph_{i}, __null_{i}"
            for i, (label, _, _, _, _) in enumerate(edges)
        )
        frames.append(
            cur.agg(*aggs)
            .select(
                F.expr(
                    f"stack({len(edges)}, {stack_args}) AS "
                    "(edge, n_orphans, n_null_fk)"
                ),
                F.col("__n_rows").alias("n_rows"),
            )
            .select("edge", "n_rows", "n_orphans", "n_null_fk")
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("edge")


#: DuckDB twin of ``operators.profile._render`` for doubles, shared by
#: the profile oracles and the differential fuzz lane
#: (tests/test_text_differential_fuzz.py). Spark's double→decimal cast
#: rounds the double's SHORTEST decimal representation HALF_UP at 6
#: fractional digits; DuckDB's native DOUBLE→DECIMAL casts the EXACT
#: binary value instead (measured divergence: 1234567.1234565 →
#: ...457 vs ...456; 1e31 → 1e31 exactly vs 9999999999999999538...),
#: so the twin routes through VARCHAR — shortest repr, then a text
#: decimal parse that rounds HALF_UP like Spark.
_SQL_RENDER_DOUBLE = (
    "CAST(TRY_CAST(CAST({x} AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR)"
)

#: DuckDB twin of the profiler's timestamp rendering (_TS_FMT).
_SQL_RENDER_TS = "strftime({x}, '%Y-%m-%d %H:%M:%S')"


@register(
    "orders_profile",
    oracle=f"""
        SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
               {_SQL_RENDER_DOUBLE.format(x="MIN(o_totalprice)")},
               {_SQL_RENDER_DOUBLE.format(x="MAX(o_totalprice)")}
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
               {_SQL_RENDER_TS.format(x="MIN(o_orderdate)")},
               {_SQL_RENDER_TS.format(x="MAX(o_orderdate)")}
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
               MIN(o_orderpriority), MAX(o_orderpriority)
        FROM orders
        ORDER BY col_name
    """,
    description="Whole-table column profile (operators/profile.py: "
    "Deequ-style data crawler): ONE aggregate pass emits per-column "
    "row/null/distinct counts and engine-portable stringified min/max "
    "(doubles via DECIMAL(38,6), timestamps via a fixed format), "
    "unpivoted to long form with stack(). This registry entry runs the "
    "exact=True mode so the DuckDB oracle matches value-for-value; the "
    "100 TB default is approx=True, where every distinct count is an "
    "HLL partial aggregate and the whole profile is one map-side-"
    "combined pass with no Expand — the trade-off is documented on the "
    "operator and the approx twin is property-tested against exact.",
    tags=("relational", "governance", "profiling", "unpivot"),
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.profile import profile_table

    return profile_table(
        read_table(spark, sf_dir, "orders"), approx=False
    ).orderBy("col_name")


def _profile_contract_oracle() -> str:
    """Oracle for the approx-profile CONTRACT row set: per orders
    column the exactly-reproducible fields (rows, nulls, stringified
    min/max with the operator's engine-portable renderings) plus
    literal TRUE for the HLL bound — the hash matches iff every
    column's approx distinct count lands within ±5 % of exact."""
    specs = {
        "o_orderkey": ("CAST(MIN({c}) AS VARCHAR)", "CAST(MAX({c}) AS VARCHAR)"),
        "o_custkey": ("CAST(MIN({c}) AS VARCHAR)", "CAST(MAX({c}) AS VARCHAR)"),
        "o_orderstatus": ("MIN({c})", "MAX({c})"),
        "o_totalprice": (
            _SQL_RENDER_DOUBLE.format(x="MIN({c})"),
            _SQL_RENDER_DOUBLE.format(x="MAX({c})"),
        ),
        "o_orderdate": (
            _SQL_RENDER_TS.format(x="MIN({c})"),
            _SQL_RENDER_TS.format(x="MAX({c})"),
        ),
        "o_orderpriority": ("MIN({c})", "MAX({c})"),
    }
    parts = [
        f"""
        SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               {mn.format(c=c)} AS min_value, {mx.format(c=c)} AS max_value,
               TRUE AS nd_within_5pct
        FROM orders
        """
        for c, (mn, mx) in specs.items()
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register(
    "orders_profile_approx",
    oracle=_profile_contract_oracle(),
    description="The 100 TB-default profile path, driver-checked: "
    "profile_table(approx=True) makes every distinct count an HLL "
    "partial aggregate, so the whole profile is ONE map-side-combined "
    "pass — no Catalyst Expand, no per-column scans (the exact mode "
    "multiplies shuffled bytes by the column count). The HLL estimate "
    "is not SQL-reproducible, so this entry emits the bounds CONTRACT "
    "(the kmeans/PageRank/IVF trick): per column the exact fields "
    "(rows, nulls, portable min/max) value-for-value plus "
    "`nd_within_5pct` — |approx − exact| ≤ 5 % of exact, with "
    "rsd=0.01 so the bound sits at 5 sigma — which the oracle expects "
    "as literal TRUE. HLL hashing is deterministic per dataset, so "
    "the row is stable, and the approx-vs-exact property is "
    "additionally fuzz-tested in tests/test_profile.py.",
    tags=("relational", "governance", "profiling", "sketch", "contract"),
)
def orders_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.profile import profile_table

    # Two single-mode passes joined on col_name — DELIBERATELY not a
    # fused aggregate: mixing exact count_distinct with rsd=0.01 HLL in
    # one agg makes Catalyst's Expand carry an initialized ~16 KB HLL
    # buffer per (gid, distinct-value) partial-aggregate group, which
    # OOMs at sf0.1 despite verifying green at sf0.01 (measured; see
    # the pitfall note in operators/profile.py).
    orders = read_table(spark, sf_dir, "orders")
    ap = profile_table(orders, approx=True, rsd=0.01).withColumnRenamed(
        "n_distinct", "nd_approx"
    )
    ex = profile_table(orders, approx=False).select(
        "col_name", F.col("n_distinct").alias("nd_exact")
    )
    return (
        ap.join(F.broadcast(ex), "col_name")
        .select(
            "col_name",
            "n_rows",
            "n_nulls",
            "min_value",
            "max_value",
            (
                F.abs(
                    F.col("nd_approx").cast("double")
                    - F.col("nd_exact").cast("double")
                )
                <= F.lit(0.05) * F.col("nd_exact").cast("double")
            ).alias("nd_within_5pct"),
        )
        .orderBy("col_name")
    )


@register(
    "customer_rfm_segments",
    oracle="""
        WITH rfm AS (
            SELECT c_custkey,
                   CAST(date_diff('day', MAX(o_orderdate),
                        TIMESTAMP '2001-09-01 00:00:00') AS INT)
                       AS recency_days,
                   COUNT(*) AS frequency,
                   SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS monetary
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey
        ), scored AS (
            SELECT NTILE(5) OVER (ORDER BY recency_days DESC, c_custkey)
                       AS r_q,
                   NTILE(5) OVER (ORDER BY frequency ASC, c_custkey)
                       AS f_q,
                   NTILE(5) OVER (ORDER BY monetary ASC, c_custkey)
                       AS m_q,
                   monetary
            FROM rfm
        )
        SELECT CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(monetary) AS DOUBLE) AS total_monetary
        FROM scored
        GROUP BY rfm_code
        ORDER BY rfm_code
    """,
    description="Full RFM segmentation (completing the family "
    "customer_order_recency started): per customer, recency / "
    "frequency / monetary reduced in ONE aggregate, then three "
    "NTILE(5) quintile scores (5 = best on every axis: most recent, "
    "most frequent, highest spend — orientation set by the sort "
    "direction, c_custkey tie-break makes every quintile boundary "
    "deterministic) composed into the classic 3-digit segment code. "
    "Monetary accumulates in DECIMAL(38,6) so quintile boundaries and "
    "totals are engine-exact. The quintile windows are global but run "
    "over the ALREADY-AGGREGATED one-row-per-customer frame — the "
    "reduce-first-then-window ordering; at extreme customer counts "
    "use the window-free customer_rfm_segments_twopass twin "
    "(percentile_disc boundary buckets).",
    tags=("relational", "rfm", "window", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    rfm = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_custkey")
        .agg(
            F.datediff(
                F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
            )
            .cast("int")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("monetary"),
        )
    )
    # NULL pins (r16 review): recency DESC already agrees (both
    # engines put NULLs last under DESC — Spark desc() ≡ DuckDB's
    # default), but monetary ASC diverged: an all-NULL-price customer
    # scored m_q=1 on Spark (NULLS FIRST) and 5 on DuckDB (NULLS
    # LAST), shifting every other quintile boundary. frequency is
    # COUNT(*), never NULL.
    r_w = Window.orderBy(F.col("recency_days").desc(), "c_custkey")
    f_w = Window.orderBy(F.col("frequency").asc(), "c_custkey")
    m_w = Window.orderBy(F.col("monetary").asc_nulls_last(), "c_custkey")
    scored = rfm.select(
        F.ntile(5).over(r_w).alias("r_q"),
        F.ntile(5).over(f_w).alias("f_q"),
        F.ntile(5).over(m_w).alias("m_q"),
        "monetary",
    )
    return (
        scored.groupBy(
            (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
            .cast("int")
            .alias("rfm_code")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("monetary").cast("double").alias("total_monetary"),
        )
        .orderBy("rfm_code")
    )


@register(
    "customer_rfm_segments_twopass",
    oracle=f"""
        WITH rfm AS (
            SELECT c_custkey,
                   CAST(date_diff('day', MAX(o_orderdate),
                        TIMESTAMP '2001-09-01 00:00:00') AS INT)
                       AS recency_days,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                        AS DOUBLE) AS monetary
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey
        ), bounds AS (
            SELECT {_bucket_bounds_sql("recency_days", "rp", 5)},
                   {_bucket_bounds_sql("frequency", "fp", 5)},
                   {_bucket_bounds_sql("monetary", "mp", 5)}
            FROM rfm
        ), scored AS (
            SELECT ({_bucket_case_sql("recency_days", "rp", 5, "<")}) * 100
                   + ({_bucket_case_sql("frequency", "fp", 5, ">")}) * 10
                   + ({_bucket_case_sql("monetary", "mp", 5, ">")})
                       AS rfm_code,
                   monetary
            FROM rfm CROSS JOIN bounds
        )
        SELECT CAST(rfm_code AS INT) AS rfm_code,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               {dsum_sql("monetary", "total_monetary")}
        FROM scored
        GROUP BY rfm_code
        ORDER BY rfm_code
    """,
    description="Window-free twin of customer_rfm_segments — the "
    "documented at-scale swap, implemented: each axis's quintile "
    "BOUNDARIES come from four percentile_disc aggregates (all twelve "
    "in ONE map-side-combinable pass over the per-customer frame, one "
    "1-row result broadcast back), and each score counts the "
    "boundaries the customer is on the good side of (recency: below "
    "= more recent = better; frequency/monetary: above = better — "
    "the same orientations as the NTILE sort directions). Semantics "
    "are value buckets (ties share a quintile) rather than NTILE's "
    "equal-count buckets, hence the separate oracle; monetary is "
    "compared as the decimal-exact sum cast once to double, "
    "identically on both engines.",
    tags=("relational", "rfm", "segmentation", "scale-twin"),
)
def customer_rfm_segments_twopass(
    spark: SparkSession,
    sf_dir: str,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """``approx=False`` (the registry/oracle form): twelve exact
    percentile_disc boundaries. ``approx=True``: ONE shared
    percentile_approx sketch per axis (three total) — the bounded-
    memory extreme-scale form; see customer_value_deciles_twopass."""
    customer = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    rfm = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_custkey")
        .agg(
            F.datediff(
                F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
            )
            .cast("int")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    axes = (("recency_days", "rp"), ("frequency", "fp"), ("monetary", "mp"))
    if approx:
        bounds = rfm.agg(
            *[
                F.percentile_approx(
                    col, [i / 5 for i in range(1, 5)], accuracy
                ).alias(f"_{prefix}s")
                for col, prefix in axes
            ]
        ).select(
            *[
                F.col(f"_{prefix}s")[i - 1].alias(f"{prefix}{i}")
                for _, prefix in axes
                for i in range(1, 5)
            ]
        )
    else:
        bounds = rfm.agg(
            *[
                F.expr(
                    f"percentile_disc({i / 5!r}) WITHIN GROUP (ORDER BY {col})"
                ).alias(f"{prefix}{i}")
                for col, prefix in axes
                for i in range(1, 5)
            ]
        )

    def _score(col: str, prefix: str, better):
        s = F.lit(1)
        for i in range(1, 5):
            # when/otherwise mirrors the oracle's CASE ... ELSE 0: a
            # NULL axis value (all-NULL prices → monetary, all-NULL
            # dates → recency) must score the floor digit 1, not
            # propagate NULL through the whole rfm_code (r16 review)
            s = s + F.when(
                better(F.col(col), F.col(f"{prefix}{i}")), 1
            ).otherwise(0)
        return s

    below = lambda x, b: x < b  # noqa: E731 — recency: smaller = better
    above = lambda x, b: x > b  # noqa: E731 — freq/monetary: bigger = better
    scored = rfm.crossJoin(F.broadcast(bounds)).select(
        (
            _score("recency_days", "rp", below) * 100
            + _score("frequency", "fp", above) * 10
            + _score("monetary", "mp", above)
        )
        .cast("int")
        .alias("rfm_code"),
        "monetary",
    )
    return (
        scored.groupBy("rfm_code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            dsum("monetary", "total_monetary"),
        )
        .orderBy("rfm_code")
    )
