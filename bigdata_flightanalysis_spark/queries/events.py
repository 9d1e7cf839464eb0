"""Event-time query suite over the ``events`` table (SURVEY.md §2.9
extension surface: JSON extraction, tumbling/sliding/session windows).

These are the batch-mode twins of the Structured Streaming operators in
``streaming/events.py`` — same window semantics, checkable by the
DuckDB oracle; the streaming tests then assert streaming == batch.

Window starts are rendered as strings (UTC) so the oracle hash is
independent of engine timestamp representation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_flightanalysis_spark.functions.scalar import dsum, dsum_sql
from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.sources.readers import read_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


#: DuckDB twin of ``get_json_object(props, '$.k')`` (fuzz-pinned, see
#: tests/test_text_differential_fuzz.py): json_extract_string returns
#: the UNQUOTED text like get_json_object (bare json_extract keeps the
#: JSON quoting), and the json_valid guard matches Spark's NULL on
#: malformed/empty input where DuckDB's extractor would ERROR.
_SQL_JSON_K = (
    "CASE WHEN props IS NOT NULL AND json_valid(props) "
    "THEN json_extract_string(props, '$.k') END"
)

#: DuckDB twin of Spark's strict ``try_cast(<text> AS BIGINT)``: the
#: integer regex gate is required because DuckDB's TRY_CAST parses and
#: ROUNDS decimal text ('5.9' → 6, '1000.0' → 1000) where Spark's
#: try_cast yields NULL (measured). Edge padding must be STRIPPED
#: before the cast, not merely gated: Spark's cast trims the exact set
#: [\x00-\x20\x7f] off both ends (measured: NUL/\x1f/\x7f/\x0b strip,
#: \x85/\x9f/NBSP/U+2000 unicode spaces do NOT), while DuckDB's
#: TRY_CAST itself cannot parse control-padded text — so the twin
#: strips that same set, then strict-gates the remainder.
_SQL_PAD_RE = r"[\x00-\x20\x7f]"


def _sql_strict_bigint(expr: str) -> str:
    stripped = (
        f"regexp_replace({expr}, "
        f"'^{_SQL_PAD_RE}+|{_SQL_PAD_RE}+$', '', 'g')"
    )
    return (
        f"TRY_CAST(CASE WHEN regexp_matches({stripped}, "
        f"'^[-+]?[0-9]+$') THEN {stripped} END AS BIGINT)"
    )


@register(
    "events_json_extract",
    oracle=f"""
        WITH extracted AS (
            SELECT event_type, value, {_SQL_JSON_K} AS k_txt
            FROM events
        )
        SELECT event_type,
               CAST(SUM({_sql_strict_bigint("k_txt")}) AS BIGINT) AS sum_k,
               COUNT(*) AS n_events,
               {dsum_sql("value", "sum_value")}
        FROM extracted
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="JSON-in-string extraction (get_json_object) feeding an "
    "aggregate — events.props per TESTDATA; extension per SURVEY.md §2.8.",
    tags=("events", "json"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            # try_cast, not cast: a single non-integer k ('5.9', '1e3')
            # would abort the whole aggregation under ANSI; the oracle
            # twin gates DuckDB's rounding TRY_CAST to the same strict
            # integer domain (fuzz-pinned)
            F.get_json_object("props", "$.k").try_cast("bigint").alias("k"),
            "value",
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("*").alias("n_events"),
            dsum("value", "sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "events_tumbling_hourly",
    oracle=f"""
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}')
                   AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {dsum_sql("value", "sum_value")}
        FROM events
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    description="Tumbling 1-hour event-time window (F.window) — batch "
    "twin of the streaming aggregation.",
    tags=("events", "window"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sliding_hourly",
    oracle=f"""
        SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                            - offs.o * INTERVAL '30 minutes',
                        '{_TS_FMT_DUCK}') AS window_start,
               COUNT(*) AS n_events,
               {dsum_sql("value", "sum_value")}
        FROM events
        CROSS JOIN (SELECT 0 AS o UNION ALL SELECT 1) offs
        GROUP BY window_start
        ORDER BY window_start
    """,
    description="Sliding window: 1-hour size, 30-minute slide — each "
    "event lands in exactly 2 windows; the oracle expands them with a "
    "2-row offset cross join.",
    tags=("events", "window"),
)
def events_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("window_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start")
    )


@register(
    "events_session_windows",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '30 minutes'
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            -- NULL-ts rows excluded like the Spark side: an event
            -- without a time cannot be sessionized
            FROM events WHERE ts IS NOT NULL
        ), numbered AS (
            -- the running sum MUST order by the same (ts, event_id)
            -- tie-break as the lag: ordering tied rows by ts alone
            -- could count a boundary row's tied sibling into the
            -- PREVIOUS session, diverging from session_window
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
               strftime(MAX(ts) + INTERVAL '30 minutes', '{_TS_FMT_DUCK}') AS session_end,
               COUNT(*) AS n_events,
               {dsum_sql("value", "sum_value")}
        FROM numbered
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    description="Session windows (30-min inactivity gap) per user — "
    "F.session_window in Spark; gaps-and-islands SQL in the oracle. "
    "Spark's session end = last event + gap, and ADJACENT windows "
    "merge — an event exactly 30:00 after its predecessor CONTINUES "
    "the session (verified against session_window on a tied-boundary "
    "fixture), so the lag test is strictly >, not >=.",
    tags=("events", "window", "session"),
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts contract, pinned on BOTH sides (r16 review): an event
    # without a time cannot be sessionized — session_window would
    # group it under a NULL window while the oracle's sort-order
    # accident folded it into the user's LAST session (Spark windows
    # sort NULL ts first, DuckDB last)
    ev = read_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("session_start"),
            F.date_format(F.col("w.end"), _TS_FMT_SPARK).alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "events_dedup_first_per_user_type",
    oracle="""
        SELECT user_id, event_type, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
        FROM (
            SELECT user_id, event_type, event_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
        )
        WHERE rn = 1
        ORDER BY user_id, event_type
    """,
    description="Event dedup keeping the earliest occurrence per "
    "(user, type) — batch twin of streaming dropDuplicatesWithinWatermark.",
    tags=("events", "dedup"),
)
def events_dedup_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.relational import deduplicate_exact

    ev = read_table(spark, sf_dir, "events")
    deduped = deduplicate_exact(
        ev,
        ["user_id", "event_type"],
        # asc_nulls_last: the survivor is the earliest KNOWN
        # occurrence — DuckDB's ROW_NUMBER ORDER BY ts ASC puts NULL
        # ts last, Spark's asc() first (r16 review)
        keep_order=[F.col("ts").asc_nulls_last(), F.col("event_id").asc()],
    )
    return deduped.select(
        "user_id",
        "event_type",
        "event_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("first_ts"),
    ).orderBy("user_id", "event_type")


@register(
    "events_sliding_distinct_users",
    oracle=f"""
        WITH firsts AS (
            -- ts IS NOT NULL after dedup, not before: the survivor
            -- pick must see the whole group (matching the Spark
            -- side), and only an all-NULL-ts group can yield a
            -- NULL-ts survivor under asc_nulls_last — a survivor
            -- with no time cannot be placed in a time window
            -- (DuckDB's time_bucket(NULL) kept a NULL bucket while
            -- Spark's F.window dropped the row; r16 review)
            SELECT user_id, ts FROM (
                SELECT user_id, ts,
                       ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts ASC, event_id ASC) AS rn
                FROM events)
            WHERE rn = 1 AND ts IS NOT NULL
        )
        SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                            - offs.o * INTERVAL '30 minutes',
                        '{_TS_FMT_DUCK}') AS window_start,
               COUNT(DISTINCT user_id) AS n_users
        FROM firsts
        CROSS JOIN (SELECT 0 AS o UNION ALL SELECT 1) offs
        GROUP BY window_start
        ORDER BY window_start
    """,
    description="Distinct users per sliding window (1-hour size, 30-min "
    "slide) counted over the first-per-(user,type) deduped events — the "
    "oracle-checkable batch twin of the chained stateful streaming "
    "pipeline (dropDuplicatesWithinWatermark → windowed distinct), "
    "asserted stream==batch in tests/test_streaming.py.",
    tags=("events", "window", "dedup", "streaming-twin"),
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.relational import deduplicate_exact

    ev = read_table(spark, sf_dir, "events")
    deduped = deduplicate_exact(
        ev,
        ["user_id", "event_type"],
        # asc_nulls_last: same survivor pin as the dedup-first query
        keep_order=[F.col("ts").asc_nulls_last(), F.col("event_id").asc()],
    )
    return (
        # NULL-ts survivors (possible only for all-NULL-ts groups)
        # carry no window position — excluded on BOTH engines
        deduped.where(F.col("ts").isNotNull())
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("window_start"),
            "n_users",
        )
        .orderBy("window_start")
    )


@register(
    "events_user_activity_ranked",
    oracle="""
        SELECT user_id, n_events, rnk
        FROM (
            SELECT user_id, COUNT(*) AS n_events,
                   RANK() OVER (ORDER BY COUNT(*) DESC, user_id ASC) AS rnk
            FROM events
            GROUP BY user_id
        )
        WHERE rnk <= 10
        ORDER BY rnk
    """,
    description="Global rank over grouped counts with deterministic "
    "tie-break — top-10 most active users. The ordering tuple is "
    "TOTAL (user_id is unique), so RANK ≡ ROW_NUMBER and 'rank ≤ 10' "
    "≡ top-10 — computed as TakeOrderedAndProject over the per-user "
    "counts instead of a global window over every user (which would "
    "sort all users in ONE task at scale); the rank column is then a "
    "window over just the 10 surviving rows.",
    tags=("events", "window", "topk"),
)
def events_user_activity_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    # rank()<=10 over ALL users == orderBy().limit(10): the order-by
    # tuple is total, so no rank ties can straddle the cut. limit
    # plans as TakeOrderedAndProject (per-partition top-10, merged) —
    # no single-task sort of the full per-user frame.
    # asc_nulls_last pins the tie-break to the oracle: DuckDB ASC puts
    # NULL user_id LAST while Spark's asc() puts it first — a NULL
    # group tying at the cut would swap top-10 membership (r16 review)
    top = counts.orderBy(
        F.col("n_events").desc(), F.col("user_id").asc_nulls_last()
    ).limit(10)
    w = Window.orderBy(
        F.col("n_events").desc(), F.col("user_id").asc_nulls_last()
    )
    return top.withColumn("rnk", F.rank().over(w)).orderBy("rnk")


# --------------------------------------------------------------------------
# Temporal joins (operators.temporal): as-of join and bucketed range
# join — the event-pipeline forms the reference's surface lacks
# entirely (SURVEY.md §2.3). Oracles: DuckDB's native ASOF JOIN and a
# plain inequality join.
# --------------------------------------------------------------------------


@register(
    "events_asof_purchase_click",
    oracle=f"""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click')
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
               c.event_id AS click_event_id,
               date_diff('microsecond', c.ts, p.ts) AS gap_us
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    description="Backward as-of join: each purchase matched to the "
    "same user's latest prior-or-equal click. Implemented as the "
    "union + partitioned-window formulation (operators.temporal."
    "asof_join): ONE shuffle on user_id, no time-range pair explosion "
    "— the shape that survives a 100 TB event table. Oracle: DuckDB's "
    "native ASOF LEFT JOIN.",
    tags=("events", "asof", "join"),
)
def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.temporal import asof_join

    ev = read_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"), "user_id", "ts"
    )
    j = asof_join(p, c, on="user_id", left_ts="ts", right_ts="ts", how="left")
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("purchase_ts"),
        "click_event_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_right"))).alias(
            "gap_us"
        ),
    ).orderBy("event_id")


@register(
    "events_range_join_error_context",
    oracle="""
        WITH e AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'error'),
             a AS (SELECT event_id, user_id, ts, event_type FROM events
                   WHERE event_type <> 'error')
        SELECT e.event_id AS error_id, a.event_id AS context_id,
               a.event_type AS context_type,
               date_diff('microsecond', a.ts, e.ts) AS lead_us
        FROM e JOIN a
          ON e.user_id = a.user_id
         AND a.ts <= e.ts
         AND date_diff('microsecond', a.ts, e.ts) < CAST(3600000000 AS BIGINT)
        ORDER BY error_id, context_id
    """,
    description="Range join: every non-error event by the same user in "
    "the hour before each error. Implemented with operators.temporal."
    "range_join_bucketed — time bucketed to the window width, each "
    "probe row explodes to 2 candidate bins, equi-join on (user, bin), "
    "exact predicate re-applied — so Catalyst plans a shuffled "
    "equi-join, never the quadratic broadcast-nested-loop a raw "
    "inequality join degenerates to.",
    tags=("events", "range-join", "join"),
)
def events_range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.temporal import range_join_bucketed

    ev = read_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    ctx = ev.filter(F.col("event_type") != "error").select(
        F.col("event_id").alias("context_id"),
        "user_id",
        "ts",
        F.col("event_type").alias("context_type"),
    )
    j = range_join_bucketed(
        errors, ctx, on="user_id", left_ts="ts", right_ts="ts", window_seconds=3600
    )
    return j.select(
        "error_id",
        "context_id",
        "context_type",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r"))).alias("lead_us"),
    ).orderBy("error_id", "context_id")


@register(
    "events_funnel",
    oracle="""
        WITH u1 AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
            FROM events GROUP BY user_id
        ), u2 AS (
            SELECT e.user_id, u1.first_view,
                   MIN(CASE WHEN e.event_type = 'click'
                             AND e.ts >= u1.first_view THEN e.ts END)
                       AS first_click
            FROM events e JOIN u1 USING (user_id)
            GROUP BY e.user_id, u1.first_view
        ), u3 AS (
            SELECT e.user_id, u2.first_view, u2.first_click,
                   MIN(CASE WHEN e.event_type = 'purchase'
                             AND e.ts >= u2.first_click THEN e.ts END)
                       AS first_purchase
            FROM events e JOIN u2 USING (user_id)
            GROUP BY e.user_id, u2.first_view, u2.first_click
        )
        SELECT COUNT(*) AS n_users,
               COUNT(first_view) AS n_viewed,
               COUNT(first_click) AS n_clicked_after_view,
               COUNT(first_purchase) AS n_purchased_after_click,
               CAST(COUNT(first_click) AS DOUBLE) / COUNT(first_view)
                   AS view_to_click_rate,
               CAST(COUNT(first_purchase) AS DOUBLE) / COUNT(first_click)
                   AS click_to_purchase_rate
        FROM u3
    """,
    description="Ordered view→click→purchase funnel: three chained "
    "conditional-min windows over ONE user_id partitioning (Spark "
    "reuses the single exchange across all three — one shuffle total, "
    "the shape that survives 100× event growth), each stage anchored "
    "at-or-after the previous stage's first timestamp.",
    tags=("events", "funnel", "window"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = funnel_stages(ev)
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count("first_click").alias("n_clicked_after_view"),
        F.count("first_purchase").alias("n_purchased_after_click"),
        # zero-denominator guards: a corpus with no view (or click)
        # events would divide by 0 — an ANSI THROW in Spark, while
        # DuckDB's double/0 quietly yields NULL; when() → NULL matches
        F.when(
            F.count("first_view") > 0,
            F.count("first_click").cast("double") / F.count("first_view"),
        ).alias("view_to_click_rate"),
        F.when(
            F.count("first_click") > 0,
            F.count("first_purchase").cast("double") / F.count("first_click"),
        ).alias("click_to_purchase_rate"),
    )


def funnel_stages(ev: DataFrame) -> DataFrame:
    """Per-user ordered funnel timestamps (first_view, then first
    click at-or-after it, then first purchase at-or-after that). All
    three conditional-min windows share one user_id partitioning, so
    the whole stage pipeline costs a single shuffle."""
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "first_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("first_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "first_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return staged.groupBy("user_id").agg(
        F.max("first_view").alias("first_view"),
        F.max("first_click").alias("first_click"),
        F.max("first_purchase").alias("first_purchase"),
    )


@register(
    "events_heavy_hitters_topk",
    oracle="""
        SELECT event_type AS item, COUNT(*) AS est_count
        FROM events
        GROUP BY event_type
        ORDER BY est_count DESC, item
        LIMIT 5
    """,
    description="Heavy hitters via the approx_top_k sketch "
    "(operators/sketches.py): bounded-memory per-partition summaries "
    "merged at the exchange — the scale path for key-frequency scans "
    "where an exact groupBy's hash table would not fit. Oracle-exact "
    "here because the cardinality (5 types) sits inside the sketch's "
    "tracked-item budget; the estimate-vs-exact error bound for the "
    "overflowing regime is unit-tested separately.",
    tags=("events", "sketch", "topk"),
)
def events_heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.sketches import approx_top_k_items

    return approx_top_k_items(
        read_table(spark, sf_dir, "events"), "event_type", 5
    )


@register(
    "events_sessionization_gaps",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > 1800000000
                        OR lag(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_start
            -- NULL-ts rows excluded like the Spark side (r16 review:
            -- Spark windows sort NULL ts FIRST and DuckDB LAST, so an
            -- unfiltered NULL-ts row split an extra session on one
            -- engine and folded into the last session on the other)
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   SUM(is_start) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_no
            FROM marked
        )
        SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
               COUNT(*) AS n_events,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
                   AS duration_us
        FROM sessions
        GROUP BY user_id, session_no
        ORDER BY user_id, session_no
    """,
    description="Gaps-and-islands sessionization (30-min inactivity "
    "gap): lag-diff marks session starts, a running sum numbers the "
    "islands, then per-session stats. The window pair AND the final "
    "aggregate all share the user_id partitioning — one shuffle total "
    "for three logical steps. The batch twin of session_window "
    "(events_session_windows) with an explicit algorithm the oracle "
    "can replay; ties broken by event_id so the lag order is total; "
    "gap/duration arithmetic in integer microseconds (second-floored "
    "unix_timestamp vs DuckDB fractional epoch() disagree).",
    tags=("events", "window", "sessionization"),
)
def events_sessionization_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        # NULL-ts contract: see events_session_windows
        .where(F.col("ts").isNotNull())
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_start",
        F.when(
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(wo))
                > 1_800_000_000
            )
            | F.lag("ts").over(wo).isNull(),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = marked.withColumn(
        "session_no",
        F.sum("is_start")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("duration_us"),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "status_first_last_orders",
    oracle="""
        SELECT DISTINCT o_orderstatus,
               first_value(o_orderkey) OVER w AS first_key,
               last_value(o_orderkey) OVER w AS last_key,
               nth_value(o_orderkey, 2) OVER w AS second_key
        FROM orders
        WINDOW w AS (
            PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
        ORDER BY o_orderstatus
    """,
    description="first_value / last_value / nth_value over an "
    "explicit UNBOUNDED frame (the default RANGE..CURRENT ROW frame "
    "makes last_value a footgun — it sees only the prefix) with a "
    "total order (date, key) so all three are deterministic.",
    tags=("relational", "window"),
)
def status_first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        read_table(spark, sf_dir, "orders")
        .select(
            "o_orderstatus",
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(w).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        )
        .distinct()
        .orderBy("o_orderstatus")
    )


@register(
    "events_key_skew_profile",
    oracle="""
        WITH per_key AS (
            SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
        )
        SELECT COUNT(*) AS n_keys,
               CAST(MIN(n) AS BIGINT) AS min_n,
               quantile_cont(n, 0.50) AS p50_n,
               quantile_cont(n, 0.99) AS p99_n,
               CAST(MAX(n) AS BIGINT) AS max_n,
               CAST(MAX(n) AS DOUBLE) / quantile_cont(n, 0.50)
                   AS skew_ratio
        FROM per_key
    """,
    description="Join-key skew profiler: per-key frequency distribution "
    "(min/median/p99/max and the max/median skew ratio) — the number "
    "that decides between a plain shuffle join, AQE skew splitting, "
    "and explicit salting (operators/skew.py). Two tiny aggregates "
    "(per-key then distribution); counts are small integral values so "
    "the interpolated quantiles are bit-exact cross-engine.",
    tags=("events", "skew", "profiling"),
)
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_key = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.min("n").alias("min_n"),
        F.percentile("n", F.lit(0.50)).alias("p50_n"),
        F.percentile("n", F.lit(0.99)).alias("p99_n"),
        F.max("n").alias("max_n"),
        (
            F.max("n").cast("double") / F.percentile("n", F.lit(0.50))
        ).alias("skew_ratio"),
    )


@register(
    "events_monthly_active_users",
    oracle="""
        SELECT CAST(year(ts) AS INT) AS yr, CAST(month(ts) AS INT) AS mth,
               COUNT(DISTINCT user_id) AS mau,
               COUNT(*) AS n_events,
               CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id)
                   AS events_per_user
        FROM events
        GROUP BY yr, mth
        ORDER BY yr, mth
    """,
    description="Monthly active users: distinct-count per calendar "
    "bucket (Catalyst expands the distinct into a two-phase "
    "aggregate — partial per (bucket, user), then final per bucket; "
    "at 100 TB the approx_count_distinct swap-in drops the expand).",
    tags=("events", "distinct", "time-bucket"),
)
def events_monthly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.year("ts").alias("yr"), F.month("ts").alias("mth")
        )
        .agg(
            F.countDistinct("user_id").alias("mau"),
            F.count("*").alias("n_events"),
            # ANSI guard: a bucket whose every user_id is NULL has
            # mau=0 — bare division aborts the query under Spark 4
            # ANSI while DuckDB's double/0 is NULL (r16 review; the
            # events_funnel pattern)
            F.when(
                F.countDistinct("user_id") > 0,
                F.count("*").cast("double") / F.countDistinct("user_id"),
            ).alias("events_per_user"),
        )
        .orderBy("yr", "mth")
    )


@register(
    "events_load_heatmap",
    oracle="""
        SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hr,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY dow, hr
        ORDER BY dow, hr
    """,
    description="Operational load heatmap (day-of-week × hour): the "
    "capacity-planning sweep; Spark dayofweek is 1=Sunday, DuckDB's "
    "0=Sunday, hence the +1 in the oracle (same convention as "
    "orderdate_parts).",
    tags=("events", "time-bucket"),
)
def events_load_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hr")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hr")
    )


@register(
    "events_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   CAST(min(year(ts) * 12 + month(ts) - 1) AS INT)
                       AS cohort_m
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   CAST(year(ts) * 12 + month(ts) - 1 AS INT) AS act_m
            FROM events
        )
        SELECT cohort_m, CAST(act_m - cohort_m AS INT) AS months_since,
               COUNT(*) AS active_users
        FROM activity JOIN firsts USING (user_id)
        GROUP BY cohort_m, months_since
        ORDER BY cohort_m, months_since
    """,
    description="Cohort retention triangle: users keyed to their "
    "first-activity month (linearized year·12+month so month "
    "arithmetic is pure integers), distinct user-months joined back "
    "to the cohort, counts per (cohort, months-since). Both "
    "aggregates and the join share the user_id key, so the shuffled "
    "join reuses the exchange (the firsts frame is one row PER USER — "
    "unbounded at scale, never force-broadcast; AQE still broadcasts "
    "it when it fits).",
    tags=("events", "cohort", "retention"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    month_lin = (F.year("ts") * 12 + F.month("ts") - 1).cast("int")
    firsts = ev.groupBy("user_id").agg(F.min(month_lin).alias("cohort_m"))
    activity = ev.select("user_id", month_lin.alias("act_m")).distinct()
    # no F.broadcast: firsts is per-USER (unbounded in the user count
    # at 100 TB — forcing a broadcast collects it all to the driver);
    # both sides are keyed and pre-aggregated on user_id, so the
    # shuffled join is exchange-reusing, and AQE broadcasts when small
    return (
        activity.join(firsts, "user_id")
        .select(
            "cohort_m",
            (F.col("act_m") - F.col("cohort_m")).cast("int").alias(
                "months_since"
            ),
        )
        .groupBy("cohort_m", "months_since")
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort_m", "months_since")
    )


@register(
    "events_hourly_anomalies",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
                   COUNT(*) AS n
            FROM events
            GROUP BY event_type, bucket
        ),
        stats AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS k,
                   CAST(SUM(CAST(n AS DECIMAL(38,6))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(n AS DECIMAL(38,6))
                            * CAST(n AS DECIMAL(38,6))) AS DOUBLE) AS s2
            FROM hourly GROUP BY event_type
        )
        SELECT h.event_type, strftime(bucket, '%Y-%m-%d %H') AS hour,
               n,
               (n - s1 / k) / sqrt((s2 - s1 * s1 / k) / (k - 1)) AS z
        FROM hourly h JOIN stats USING (event_type)
        WHERE (n - s1 / k) / sqrt((s2 - s1 * s1 / k) / (k - 1)) > 2.5
        ORDER BY event_type, hour
    """,
    description="Hourly volume anomaly detection: per-type hourly "
    "counts z-scored against that type's own mean/stddev, flagging "
    "z > 2.5. Moments are decimal-exact Σn/Σn² (counts are clean "
    "ints — safe to square in decimal) with an IDENTICAL double "
    "expression tree on both engines, the price_stddev_by_status "
    "recipe; built-in stddev would be merge-order-nondeterministic.",
    tags=("events", "anomaly", "stats"),
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count("*").alias("n"))
    nd = F.col("n").cast("decimal(38,6)")
    stats = hourly.groupBy("event_type").agg(
        F.count("*").cast("double").alias("k"),
        F.sum(nd).cast("double").alias("s1"),
        F.sum(nd * nd).cast("double").alias("s2"),
    )
    k, s1, s2 = F.col("k"), F.col("s1"), F.col("s2")
    # k=1 guard: a type with a single hourly bucket has no variance —
    # the bare expression divides by (k-1)=0, which THROWS under
    # Spark 4's default ANSI mode (DuckDB's float 0/0 quietly yields
    # NaN and the z > 2.5 filter drops the row; when() → NULL drops
    # it identically, keeping the oracle exact). Nested sd > 0 guard
    # (inside the k branch so (k-1) is never 0 when sd evaluates):
    # ZERO-variance groups — every bucket the same count — make both
    # the numerator and sd exactly 0, and 0/0 also THROWS under ANSI
    # while DuckDB yields NULL and the filter drops the row.
    sd = F.sqrt((s2 - s1 * s1 / k) / (k - 1))
    z = F.when(k > 1, F.when(sd > 0, (F.col("n") - s1 / k) / sd))
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.col("z") > 2.5)
        .select(
            "event_type",
            F.date_format("bucket", "yyyy-MM-dd HH").alias("hour"),
            "n",
            "z",
        )
        .orderBy("event_type", "hour")
    )


@register(
    "events_minutely_gapfill",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('day', MIN(ts)) AS day0 FROM events
        ), spine AS (
            SELECT unnest(generate_series(day0,
                                          day0 + INTERVAL 1439 MINUTE,
                                          INTERVAL 1 MINUTE)) AS minute
            FROM bounds
        ), counts AS (
            SELECT date_trunc('minute', ts) AS minute, COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT strftime(s.minute, '%Y-%m-%d %H:%M:%S') AS minute,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        FROM spine s LEFT JOIN counts c ON s.minute = c.minute
        ORDER BY minute
    """,
    description="Time-series gap filling: a generated minute spine for "
    "the first day of data, left-joined to per-minute counts, gaps "
    "zero-filled — the densification step feeding anomaly detection "
    "and charting (a groupBy alone silently omits empty buckets). The "
    "spine is sequence+explode from ONE aggregate row (constant size "
    "whatever the table size); the count side is already aggregated "
    "tiny, so the join never touches raw events twice.",
    tags=("events", "timeseries", "gapfill"),
)
def events_minutely_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("day", F.min("ts")).alias("day0"))
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("day0"),
                F.col("day0") + F.expr("INTERVAL 1439 MINUTES"),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("minute")
    )
    counts = ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute")).agg(
        F.count("*").alias("n")
    )
    return (
        spine.join(counts, "minute", "left")
        .select(
            F.date_format("minute", _TS_FMT_SPARK).alias("minute"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("minute")
    )


# Spark's approx_percentile (Greenwald-Khanna) guarantees rank error
# <= n/accuracy; the contract query verifies that bound against the
# exact ranks, the same shape as the ANN recall contracts.
_GK_ACCURACY = 1000


@register(
    "events_approx_quantile_contract",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               TRUE AS p50_within_bound,
               TRUE AS p95_within_bound
        FROM events
        WHERE value IS NOT NULL
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Approximate-quantile sketch with a verified error "
    f"contract: per event type, approx_percentile (Greenwald–Khanna, "
    f"accuracy={_GK_ACCURACY}) estimates p50/p95 of `value`, then the "
    "EXACT rank of each estimate is counted and checked against the "
    "sketch's published bound (rank error ≤ n/accuracy, +1 slack for "
    "the ≤-boundary). The oracle expects literal TRUE per type, so "
    "the hash matches iff the bound holds — completing the sketch "
    "family (HLL, approx_top_k, Count-Min) with the quantile member. "
    "Scale shape: the sketch is a single mergeable partial aggregate; "
    "the verification join broadcasts one row per type back over the "
    "events — production would skip the check and keep only the "
    "one-pass sketch.",
    tags=("events", "sketch", "quantile"),
)
def events_approx_quantile_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # NULL values are invisible to both percentile_approx and the
    # exact-rank sums, so the contract's expectation must count the
    # same population — count(*) over rows WITH NULLs would inflate
    # 0.5·n and falsely fail the bound on real (nullable) data
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .where(F.col("value").isNotNull())
    )
    ap = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(_GK_ACCURACY)
        ).alias("aq"),
    )
    est = ap.select(
        "event_type",
        "n_events",
        F.col("aq")[0].alias("v50"),
        F.col("aq")[1].alias("v95"),
    )
    # Tie-aware rank check: a value occupying a TIE RUN has every rank
    # in [count(< v), count(<= v)] — the sketch meets its bound iff
    # that interval intersects [p·n − tol, p·n + tol]. Checking only
    # count(<= v) falsely fails a type whose values are heavily tied
    # (an all-equal group puts count(<=v)=n against p·n).
    ranks = (
        ev.join(F.broadcast(est.select("event_type", "v50", "v95")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") < F.col("v50")).cast("long")).alias("lt50"),
            F.sum((F.col("value") <= F.col("v50")).cast("long")).alias("le50"),
            F.sum((F.col("value") < F.col("v95")).cast("long")).alias("lt95"),
            F.sum((F.col("value") <= F.col("v95")).cast("long")).alias("le95"),
        )
    )
    tol = F.col("n_events").cast("double") / _GK_ACCURACY + 1.0

    def within(lt: str, le: str, p: float):
        target = p * F.col("n_events")
        return (F.col(lt).cast("double") <= target + tol) & (
            F.col(le).cast("double") >= target - tol
        )

    return (
        est.join(ranks, "event_type")
        .select(
            "event_type",
            "n_events",
            within("lt50", "le50", 0.5).alias("p50_within_bound"),
            within("lt95", "le95", 0.95).alias("p95_within_bound"),
        )
        .orderBy("event_type")
    )


@register(
    "events_activity_incident_overlap",
    oracle="""
        WITH act AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   epoch_us(MIN(ts)) AS a_start,
                   epoch_us(MAX(ts)) AS a_end
            FROM events GROUP BY user_id, day
        ),
        inc AS (
            SELECT event_id AS incident_id,
                   epoch_us(ts) - 300000000 AS i_start,
                   epoch_us(ts) + 300000000 AS i_end
            FROM events WHERE event_type = 'error'
        )
        SELECT a.user_id, strftime(a.day, '%Y-%m-%d') AS day,
               i.incident_id
        FROM act a JOIN inc i
          ON a.a_start <= i.i_end AND i.i_start <= a.a_end
        ORDER BY user_id, day, incident_id
    """,
    description="Interval-OVERLAP join (both sides are intervals — the "
    "generalization of the point-vs-window range join): each user's "
    "daily activity span [first event, last event] matched to every "
    "incident window (±5 min around each error event) it overlaps. "
    "Implemented with operators.temporal.interval_overlap_join: both "
    "interval sets explode to the day-wide epoch bins they touch, a "
    "plain shuffled equi-join on the bin replaces the quadratic "
    "inequality join, the exact overlap predicate is re-applied, and "
    "the multi-bin duplicate is eliminated join-side (pair kept only "
    "in the bin of greatest(start, start)) — no DISTINCT pass. The "
    "oracle is DuckDB's native inequality join (IEJoin), an "
    "independent algorithm for the same semantics.",
    tags=("events", "range-join", "interval", "join"),
)
def events_activity_incident_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.temporal import (
        interval_overlap_join,
    )

    ev = read_table(spark, sf_dir, "events")
    act = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.unix_micros(F.min("ts")).alias("a_start"),
        F.unix_micros(F.max("ts")).alias("a_end"),
    )
    inc = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        (F.unix_micros("ts") - 300_000_000).alias("i_start"),
        (F.unix_micros("ts") + 300_000_000).alias("i_end"),
    )
    j = interval_overlap_join(
        act,
        inc,
        left_start="a_start",
        left_end="a_end",
        right_start="i_start",
        right_end="i_end",
        bucket_micros=86_400_000_000,
    )
    return j.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "incident_id",
    ).orderBy("user_id", "day", "incident_id")


@register(
    "events_cdc_latest_state",
    oracle=f"""
        WITH ranked AS (
            SELECT user_id, ts, event_type, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT user_id,
               strftime(ts, '{_TS_FMT_DUCK}') AS last_ts,
               event_type AS last_event_type,
               value AS last_value
        FROM ranked
        WHERE rn = 1 AND event_type <> 'error'
        ORDER BY user_id
    """,
    description="CDC changelog compaction (latest-wins upsert with "
    "tombstones): the events stream read as a change log keyed by "
    "user_id — each event upserts the user's state, 'error' events "
    "are tombstones, and the snapshot keeps only users whose LATEST "
    "change (total order: ts, then event_id) is not a delete. "
    "Implemented as ONE max_by(struct, struct) aggregate — a partial "
    "aggregate, so each map task pre-compacts its slice and only one "
    "candidate row per key crosses the shuffle; the window/row_number "
    "formulation the oracle uses would shuffle EVERY change record. "
    "This is the log→snapshot materialization every incremental "
    "ingest pipeline runs, and at 100 TB the map-side combine is the "
    "difference between shuffling the changelog and shuffling one row "
    "per key.",
    tags=("events", "cdc", "upsert", "argmax"),
)
def events_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("ts", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("s")
    )
    return (
        latest.where(F.col("s.event_type") != "error")
        .select(
            "user_id",
            F.date_format("s.ts", _TS_FMT_SPARK).alias("last_ts"),
            F.col("s.event_type").alias("last_event_type"),
            F.col("s.value").alias("last_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_rollup_cascade",
    oracle=f"""
        SELECT strftime(CAST(date_trunc('day', ts) AS TIMESTAMP),
                        '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT)
                   AS n_hours,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {dsum_sql("value", "sum_value")},
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY 1
        ORDER BY day
    """,
    description="Multi-resolution rollup cascade (the hypertable / "
    "incremental-materialized-view shape): daily aggregates derived "
    "from the HOURLY aggregate frame, never from raw events — counts "
    "sum, decimal partial sums add exactly (the double cast happens "
    "once, at the final level, so the cascade is bit-identical to a "
    "single-level aggregate — which is exactly what the oracle "
    "computes from raw rows), min/max re-min/re-max. At 100 TB this "
    "is how continuous aggregates stay cheap: the raw stream is "
    "touched once per hour partition and every coarser resolution "
    "re-aggregates the one-row-per-bucket frame above it.",
    tags=("events", "rollup", "incremental", "time-bucket"),
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_hours",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
        .orderBy("day")
    )


# HLL (datasketches, lgConfigK=12) relative standard error is
# ~1.04/sqrt(2^12) ≈ 1.6%; the contract allows ~3.7 sigma.
_HLL_REL_TOL = 0.06


@register(
    "events_distinct_rollup_sketch",
    oracle="""
        SELECT strftime(CAST(date_trunc('month', ts) AS TIMESTAMP),
                        '%Y-%m') AS month,
               CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)
                   AS n_days,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               TRUE AS within_bound
        FROM events
        GROUP BY 1
        ORDER BY month
    """,
    description="Mergeable-sketch rollup: per-day HLL sketches of "
    "distinct users (hll_sketch_agg — one partial aggregate over the "
    "raw stream) are UNIONED up to monthly estimates (hll_union_agg "
    "over the one-row-per-day frame), the pre-aggregated pattern that "
    "makes distinct-count rollups O(days) instead of O(events) at "
    "every coarser resolution — COUNT(DISTINCT) does not re-aggregate, "
    "sketches do. The contract completes like the quantile one: the "
    "exact monthly distinct count is computed alongside and the "
    f"estimate must land within {_HLL_REL_TOL:.0%} (vs the sketch's "
    "~1.6% published standard error at lgConfigK=12); the oracle "
    "expects literal TRUE, so the hash matches iff the bound holds.",
    tags=("events", "sketch", "hll", "rollup"),
)
def events_distinct_rollup_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("ts", "user_id")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    monthly = daily.groupBy(F.date_trunc("month", "day").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return (
        monthly.join(exact, "month")
        .select(
            F.date_format("month", "yyyy-MM").alias("month"),
            "n_days",
            "exact_distinct",
            (
                F.abs(
                    F.col("est").cast("double")
                    - F.col("exact_distinct").cast("double")
                )
                <= F.lit(_HLL_REL_TOL) * F.col("exact_distinct").cast("double")
            ).alias("within_bound"),
        )
        .orderBy("month")
    )


# Shared by the window form and the two-pass percentile_disc form:
# both compute the same DISCRETE thresholds (smallest value whose
# cume_dist reaches the quantile), so one oracle verifies both.
_WINSORIZED_ORACLE = f"""
        WITH cd AS (
            SELECT event_type, value,
                   cume_dist() OVER (
                       PARTITION BY event_type ORDER BY value
                   ) AS cd
            FROM events WHERE value IS NOT NULL
        ), th AS (
            SELECT event_type,
                   MIN(CASE WHEN cd >= 0.05 THEN value END) AS lo,
                   MIN(CASE WHEN cd >= 0.95 THEN value END) AS hi
            FROM cd GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN e.value < t.lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_low,
               CAST(SUM(CASE WHEN e.value > t.hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_high,
               MIN(t.lo) AS p05,
               MIN(t.hi) AS p95,
               {dsum_sql("GREATEST(t.lo, LEAST(t.hi, e.value))", "winsorized_sum")}
        FROM events e JOIN th t USING (event_type)
        WHERE e.value IS NOT NULL
        GROUP BY e.event_type
        ORDER BY event_type
    """


@register(
    "events_value_winsorized",
    oracle=_WINSORIZED_ORACLE,
    description="Per-group winsorization (robust feature cleaning: "
    "clip `value` to its type's [p05, p95] before aggregation — the "
    "outlier guard feature pipelines apply before scaling/training). "
    "Thresholds are DISCRETE percentiles — smallest value whose "
    "cume_dist reaches the quantile — computed as one conditional-min "
    "over a cume_dist window, deliberately NOT interpolated "
    "percentile: interpolation arithmetic differs across engines in "
    "the last ulp, while cume_dist is an exact rational (rank/n) and "
    "the chosen threshold is an actual data value, so the comparison "
    "and the clipped decimal sum are bit-identical by construction. "
    "Shape: one window shuffle on event_type, thresholds broadcast "
    "back (5 rows), one aggregate. Scale note: the per-key cume_dist "
    "funnels each key's rows through one task — fine at bounded "
    "per-key volumes; the 100 TB path is the REGISTERED twin "
    "`events_value_winsorized_twopass` (percentile_disc aggregates, "
    "no window, same oracle) or, beyond exactness needs, "
    "percentile_approx under the `events_approx_quantile_contract` "
    "error bound. This window form pins the semantics both "
    "approximate.",
    tags=("events", "window", "quality", "percentile"),
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .where(F.col("value").isNotNull())
    )
    w = Window.partitionBy("event_type").orderBy("value")
    tagged = ev.withColumn("cd", F.cume_dist().over(w))
    th = tagged.groupBy("event_type").agg(
        F.min(F.when(F.col("cd") >= 0.05, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("cd") >= 0.95, F.col("value"))).alias("hi"),
    )
    return _winsorize_from_thresholds(ev, th)


def _winsorize_from_thresholds(ev: DataFrame, th: DataFrame) -> DataFrame:
    """Shared clip-and-aggregate tail of both winsorization forms:
    thresholds (one row per key) broadcast back onto the events, one
    map-side-combined aggregate."""
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    return (
        ev.join(F.broadcast(th), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("value") < F.col("lo")).cast("long"))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum((F.col("value") > F.col("hi")).cast("long"))
            .cast("bigint")
            .alias("n_clipped_high"),
            F.min("lo").alias("p05"),
            F.min("hi").alias("p95"),
            dsum(clipped, "winsorized_sum"),
        )
        .orderBy("event_type")
    )


@register(
    "events_value_winsorized_twopass",
    oracle=_WINSORIZED_ORACLE,
    description="The SCALABLE twin of `events_value_winsorized` — "
    "identical discrete [p05, p95] winsorization semantics (same "
    "oracle, hash-matched), but the per-key thresholds come from "
    "percentile_disc AGGREGATES instead of a per-key cume_dist "
    "window: ANSI percentile_disc returns exactly the smallest value "
    "whose cume_dist reaches the quantile — the same total function — "
    "and Spark's implementation partial-aggregates a value→count map "
    "per task, so every task map-side-compresses its slice to the "
    "key's distinct values and no key's raw rows ever funnel through "
    "one ordered task. This removes the round-6 verdict's straggler "
    "caveat: plan has NO Window node (asserted in tests/test_plans"
    ".py), parallelism is bounded by data size, not key count. "
    "Thresholds (|keys| rows) broadcast back; one aggregate.",
    tags=("events", "aggregation", "quality", "percentile", "scale"),
)
def events_value_winsorized_twopass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .where(F.col("value").isNotNull())
    )
    th = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").alias(
            "lo"
        ),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias(
            "hi"
        ),
    )
    return _winsorize_from_thresholds(ev, th)


@register(
    "events_incremental_agg_merge",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               {dsum_sql("value", "sum_value")},
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
                   AS avg_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Incremental aggregate maintenance "
    "(operators/incremental.py: partial_aggregate / "
    "merge_aggregate_state / finalize_aggregate): the events stream "
    "lands as two batches (days 1-15, then the rest), each reduced to "
    "ONE mergeable state row per key (count, DECIMAL(38,6) exact sum, "
    "min, max) and folded together with the associative-commutative ⊕ "
    "— the history's raw rows are never rescanned, which is the whole "
    "point of a 100 TB materialized view. The oracle aggregates the "
    "raw table directly in one pass: hash-matching proves the "
    "incremental path is EXACTLY the batch answer (decimal partials "
    "make the sum independent of batch split and merge order — "
    "property-tested across random splits).",
    tags=("events", "incremental", "aggregation", "rollup"),
)
def events_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.incremental import (
        finalize_aggregate,
        merge_aggregate_state,
        partial_aggregate,
    )

    ev = read_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    # the split must PARTITION the table: a NULL ts makes dayofmonth
    # NULL, which fails BOTH bare predicates — the row would silently
    # vanish from the incremental result while the oracle's direct
    # GROUP BY counts it; route NULL-ts rows with batch 1
    day = F.dayofmonth("ts")
    b1 = ev.where((day <= 15) | day.isNull())
    b2 = ev.where(day > 15)
    state = partial_aggregate(b1, ["event_type"], "value")
    state = merge_aggregate_state(
        state, partial_aggregate(b2, ["event_type"], "value"), ["event_type"]
    )
    return finalize_aggregate(state, ["event_type"]).orderBy("event_type")


# Shared by the window form and the two-pass percentile_disc form
# (identical discrete-median semantics — see _WINSORIZED_ORACLE note).
_MAD_ORACLE = """
        WITH base AS (
            SELECT event_type, value FROM events WHERE value IS NOT NULL
        ), c1 AS (
            SELECT event_type, value,
                   cume_dist() OVER (
                       PARTITION BY event_type ORDER BY value
                   ) AS cd
            FROM base
        ), med AS (
            SELECT event_type,
                   MIN(CASE WHEN cd >= 0.5 THEN value END) AS med
            FROM c1 GROUP BY event_type
        ), dev AS (
            SELECT b.event_type, ABS(b.value - m.med) AS dev, m.med
            FROM base b JOIN med m USING (event_type)
        ), c2 AS (
            SELECT event_type, dev, med,
                   cume_dist() OVER (
                       PARTITION BY event_type ORDER BY dev
                   ) AS cd
            FROM dev
        ), mad AS (
            SELECT event_type,
                   MIN(CASE WHEN cd >= 0.5 THEN dev END) AS mad
            FROM c2 GROUP BY event_type
        )
        SELECT d.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN d.dev > 3 * a.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_anomalies,
               MIN(d.med) AS median_value,
               MIN(a.mad) AS mad
        FROM dev d JOIN mad a USING (event_type)
        GROUP BY d.event_type
        ORDER BY d.event_type
    """


def _mad_finalize(dev: DataFrame, mad: DataFrame) -> DataFrame:
    """Shared tail of the MAD pair (window form and its percentile_disc
    twopass twin): broadcast the |keys|-row MAD thresholds back and
    emit the per-type anomaly report. ONE definition — the two forms
    share one oracle and must stay hash-identical, so the predicate and
    output schema cannot be edited in one place and drift in the other
    (the _winsorize_from_thresholds pattern)."""
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("dev") > 3 * F.col("mad")).cast("long"))
            .cast("bigint")
            .alias("n_anomalies"),
            F.min("med").alias("median_value"),
            F.min("mad").alias("mad"),
        )
        .orderBy("event_type")
    )


@register(
    "events_mad_anomalies",
    oracle=_MAD_ORACLE,
    description="Robust outlier detection via median absolute "
    "deviation — the heavy-tail-safe complement to the z-score pass "
    "(`events_hourly_anomalies`): a value is anomalous when its "
    "absolute deviation from the group median exceeds 3×MAD. Both the "
    "median and the MAD are DISCRETE percentiles (smallest value whose "
    "cume_dist reaches 0.5 — exact rationals, actual data values, no "
    "interpolation), so every comparison and output is bit-identical "
    "across engines. Shape: two cume_dist windows on the SAME "
    "partitioning key (the second reuses the first's hash exchange "
    "under AQE) + two broadcast-back joins of 5-row threshold frames. "
    "Scale: per-key ordered passes bound parallelism by key count — "
    "the 100 TB path is the REGISTERED twin "
    "`events_mad_anomalies_twopass` (percentile_disc aggregates, no "
    "window, same oracle).",
    tags=("events", "anomaly", "quality", "window"),
)
def events_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .where(F.col("value").isNotNull())
    )
    w1 = Window.partitionBy("event_type").orderBy("value")
    med = (
        base.withColumn("cd", F.cume_dist().over(w1))
        .groupBy("event_type")
        .agg(F.min(F.when(F.col("cd") >= 0.5, F.col("value"))).alias("med"))
    )
    dev = base.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("dev"), "med"
    )
    w2 = Window.partitionBy("event_type").orderBy("dev")
    mad = (
        dev.withColumn("cd", F.cume_dist().over(w2))
        .groupBy("event_type")
        .agg(F.min(F.when(F.col("cd") >= 0.5, F.col("dev"))).alias("mad"))
    )
    return _mad_finalize(dev, mad)


@register(
    "events_mad_anomalies_twopass",
    oracle=_MAD_ORACLE,
    description="The SCALABLE twin of `events_mad_anomalies` — same "
    "discrete-median MAD semantics (same oracle, hash-matched), with "
    "both the median and the MAD computed as percentile_disc(0.5) "
    "AGGREGATES instead of per-key cume_dist windows: each task "
    "partial-aggregates a value→count map, so no key's rows funnel "
    "through one ordered task (the round-6 verdict's straggler "
    "caveat, removed). Shape: two map-side-combined aggregates with "
    "the |keys|-row threshold frames broadcast back between them; "
    "plan has NO Window node (asserted in tests/test_plans.py).",
    tags=("events", "anomaly", "quality", "aggregation", "scale"),
)
def events_mad_anomalies_twopass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    base = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .where(F.col("value").isNotNull())
    )
    med = base.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "med"
        )
    )
    dev = base.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("dev"), "med"
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)").alias("mad")
    )
    return _mad_finalize(dev, mad)


@register(
    "events_type_trend",
    oracle="""
        WITH x0 AS (
            SELECT event_type, MIN(epoch_us(ts) // 1000000) AS t0
            FROM events GROUP BY event_type
        ), pts AS (
            SELECT e.event_type,
                   (epoch_us(e.ts) // 1000000) - x.t0 AS x,
                   e.value AS y
            FROM events e JOIN x0 x USING (event_type)
        ), m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(CAST(x AS DOUBLE) * y AS DECIMAL(38,6)))
                        AS DOUBLE) AS sxy
            FROM pts GROUP BY event_type
        )
        SELECT event_type, n,
               (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * 86400.0
                   AS slope_per_day,
               (sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx)
                   / n AS intercept,
               (n * sxy - sx * sy)
                   / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                            0) AS pearson_r
        FROM m
        ORDER BY event_type
    """,
    description="Per-group closed-form linear trend + correlation "
    "(is each event type's `value` drifting over the month?): OLS "
    "slope/intercept and Pearson r from the five moment sums — one "
    "partial-aggregatable pass over the points, no ML library, no "
    "iteration. Exactness recipe: x is CENTERED per group (seconds "
    "since the group's first event — keeps x² inside exact integer "
    "range at any SF instead of relying on 38-digit decimal capping), "
    "every moment accumulates in DECIMAL(38,6), and the final "
    "slope/r arithmetic is the identical double expression tree on "
    "both engines — IEEE sqrt is correctly rounded, so even Pearson r "
    "is bit-exact. Shape: one tiny per-group min (broadcast back) + "
    "one map-side-combined moment aggregate.",
    tags=("events", "regression", "stats", "aggregation"),
)
def events_type_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros("ts") / F.lit(1000000)).cast("long").alias("xs"),
        F.col("value").alias("y"),
    )
    t0 = ev.groupBy("event_type").agg(F.min("xs").alias("t0"))
    pts = ev.join(F.broadcast(t0), "event_type").select(
        "event_type", (F.col("xs") - F.col("t0")).alias("x"), "y"
    )
    m = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,6)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("x").cast("double") * F.col("y")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # Degenerate-group guard: a single-event group (or zero x/y
    # variance) zeroes the denominators; Spark's non-ANSI division
    # would return NULL but DuckDB float division returns inf/NaN —
    # both sides emit NULL explicitly (F.when here, NULLIF in the
    # oracle) so degenerate groups hash identically.
    xvar = n * sxx - sx * sx
    slope = F.when(xvar != 0, (n * sxy - sx * sy) / xvar)
    r_den = F.sqrt(xvar * (n * syy - sy * sy))
    return m.select(
        "event_type",
        "n",
        (slope * 86400.0).alias("slope_per_day"),
        ((sy - slope * sx) / n).alias("intercept"),
        F.when(r_den != 0, (n * sxy - sx * sy) / r_den).alias("pearson_r"),
    ).orderBy("event_type")


@register(
    "events_type_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            -- NULL-ts rows excluded like the Spark side: an event
            -- without a time has no position in the journey
            FROM events WHERE ts IS NOT NULL
        )
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
        ORDER BY prev_type, next_type
    """,
    description="Per-user event-type transition matrix (the Markov-"
    "chain input for clickstream/journey analysis): each user's events "
    "ordered by (ts, event_id), adjacent pairs counted by (prev, next) "
    "type. ONE window shuffle on user_id produces every user's lag "
    "column, then a map-side-combined count — the matrix itself is "
    "|types|² rows regardless of corpus size.",
    tags=("events", "window", "funnel", "markov"),
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        # NULL-ts contract: see events_session_windows
        .where(F.col("ts").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


@register(
    "events_cumulative_new_users",
    oracle="""
        WITH firsts AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
            FROM events GROUP BY user_id
        ), per_day AS (
            SELECT first_day AS day, COUNT(*) AS n_new
            FROM firsts GROUP BY first_day
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(n_new AS BIGINT) AS n_new_users,
               CAST(SUM(n_new) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cumulative_users
        FROM per_day
        ORDER BY day
    """,
    description="User-growth curve: each user's FIRST activity day "
    "(one min-aggregate — map-side combined, one row per user crosses "
    "the shuffle), rolled up to new-users-per-day, then a running "
    "cumulative sum. The final unpartitioned window runs over the "
    "one-row-per-DAY frame (≤ corpus day count), not over events — "
    "the reduce-first-then-window ordering that keeps a global "
    "running total harmless at 100 TB.",
    tags=("events", "window", "retention", "growth"),
)
def events_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_new").cast("bigint").alias("n_new_users"),
        F.sum("n_new").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("day")
