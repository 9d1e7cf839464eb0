"""Query registry — the driver-contract surface.

Every operator from SURVEY.md §2 (plus the §7 phase-4 extensions) is
exposed as a named query: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` and, where SQL-expressible, an ANSI-SQL oracle string that
DuckDB runs on the same parquet for differential checking.

Determinism rules applied everywhere (SURVEY.md §5, §7 hard-parts):
- every computed column aliased identically in Spark and SQL,
- double sums via exact decimal accumulation (``functions.scalar.dsum``),
- every top-K / limit carries a total-order tie-break,
- timestamps rendered as strings so engine-side tz/precision
  representation can't skew the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class EngineQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, EngineQuery] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = EngineQuery(name, fn, oracle, description, tags)
        return fn

    return deco


# The external correctness harness verifies roughly the first 50 registry
# entries per run, in iteration order.  Rounds rotate this list so every
# query accumulates a verified run: names listed here are yielded first
# (in list order), everything else follows in registration order.
#
# Round-11 rotation (scripts/stage_rotation.py computed it). After
# r10, per-query newest-driver-row dates: 29 at r7 (the oldest — the
# exact set the r10 comment staged below its cut), 48 at r8, 48 at
# r9, 50 at r10; all 175 green at their newest row. Priority: (1)
# the 4 BM25 lifecycle queries whose code changed this round
# (index recovery now reclaims corpus_stats.staging uniformly with
# postings/doc_stats, and their remove_layout teardown gained
# flock-guarded lockfile removal + _PATH_LOCKS eviction); (2) the
# 29 r7-dated rows; (3) backfill with the ALPHABETICALLY FIRST 17
# of the 48 r8-dated rows. Window = 4 + 29 + 17 = 50. The
# remaining 31 r8-dated names are listed below the cut and lead
# the r12 window; steady state holds (after this window lands
# nothing is older than r8).
_VERIFY_FIRST: tuple[str, ...] = (
    # (1) code changed this round (round 11)
    "doc_bm25_index_topk",
    "doc_bm25_refresh_topk",
    "doc_bm25_serve_topk",
    "doc_bm25_compact_topk",
    # (2) last driver-checked in r7 — the 29 oldest rows
    "doc_simhash_near_dup",
    "doc_token_stats",
    "embed_cosine_topk",
    "embed_decontamination",
    "embed_ivf_topk",
    "embed_lsh_topk",
    "embed_near_dup_pairs",
    "embed_quantize_int8",
    "embed_standardize",
    "events_dedup_first_per_user_type",
    "events_json_extract",
    "events_mad_anomalies_twopass",
    "events_session_windows",
    "events_sliding_hourly",
    "events_tumbling_hourly",
    "events_type_pivot",
    "events_type_trend",
    "events_value_winsorized_twopass",
    "grouping_sets_order_stats",
    "kmeans_embedding_clusters",
    "large_orders_q18",
    "lineitem_safe_math",
    "max_order_per_status_argmax",
    "order_metrics_unpivot",
    "order_price_percentile_rank",
    "orders_profile_approx",
    "orders_quality_report",
    "status_priority_sets",
    "supplier_trailing_week_quantity",
    # (3) r8-dated backfill to the 50-query window (alphabetical)
    "approx_distinct_users_by_type",
    "bloom_filtered_lineitem_revenue",
    "count_distinct_parts",
    "customer_rfm_segments_sketch",
    "customer_rfm_segments_twopass",
    "customer_value_deciles",
    "customer_value_deciles_sketch",
    "customer_value_deciles_twopass",
    "delayed_order_label",
    "distinct_flag_status",
    "doc_boilerplate_density",
    "doc_chunk_windows",
    "doc_dedup_keep_best",
    "doc_length_histogram",
    "doc_minhash_estimate_vs_exact",
    "doc_ngram_topk",
    "doc_pack_sequences",
    # The 50-query window ends here (4 changed + 29 r7-stale + 17
    # r8-dated backfill). The r8-dated entries below are the oldest
    # remaining rows once this window lands — they lead the r12
    # window (backfill r12 with the remaining r8 rows, then the
    # oldest r9-dated rows).
    "doc_pii_redaction",
    "doc_quality_weighted_sample",
    "doc_repetition_scores",
    "doc_salient_terms",
    "doc_source_mixture_weights",
    "doc_stratified_sample",
    "doc_train_test_split",
    "doc_url_domains",
    "events_user_activity_ranked",
    "latest_order_per_customer_status",
    "monthly_revenue_delta",
    "nation_counts_full_outer",
    "order_priority_count_exists",
    "orders_above_customer_avg",
    "price_stddev_by_status",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q1_pricing_summary",
    "q20_heavy_flow_suppliers",
    "q21_sole_late_supplier",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "quantity_percentiles_by_flag",
    "rollup_revenue_region_nation",
    "salted_user_event_counts",
    "status_intersect_except",
)


def load_all() -> dict[str, EngineQuery]:
    """Import every query module (side effect: registration).

    Returns the registry reordered so queries still needing an external
    verification row are iterated first (see ``_VERIFY_FIRST``).
    """
    import bigdata_flightanalysis_spark.queries.bloom  # noqa: F401
    import bigdata_flightanalysis_spark.queries.events  # noqa: F401
    import bigdata_flightanalysis_spark.queries.governance  # noqa: F401
    import bigdata_flightanalysis_spark.queries.multimodal  # noqa: F401
    import bigdata_flightanalysis_spark.queries.relational  # noqa: F401
    import bigdata_flightanalysis_spark.queries.relational_ext  # noqa: F401
    import bigdata_flightanalysis_spark.queries.retrieval  # noqa: F401
    import bigdata_flightanalysis_spark.queries.sampling  # noqa: F401
    import bigdata_flightanalysis_spark.queries.similarity  # noqa: F401
    import bigdata_flightanalysis_spark.queries.text  # noqa: F401
    import bigdata_flightanalysis_spark.queries.text_ext  # noqa: F401
    import bigdata_flightanalysis_spark.queries.tpch_shapes  # noqa: F401

    # Fail fast on rotation typos: a _VERIFY_FIRST name missing from the
    # registry would otherwise silently drop out of the verification
    # window (exactly how four promised queries and four misspelled
    # backfill names went unchecked in round 4).
    missing = set(_VERIFY_FIRST) - REGISTRY.keys()
    if missing:
        # An explicit raise, not assert: assert is stripped under
        # ``python -O``, which would re-enable the silent-drop failure
        # mode this check exists to prevent.
        raise RuntimeError(
            f"_VERIFY_FIRST names not in registry: {sorted(missing)}"
        )
    if len(set(_VERIFY_FIRST)) != len(_VERIFY_FIRST):
        # A duplicate collapses in the ordered dict below, silently
        # shifting every later entry up one slot — an unstaged query
        # slides into the externally-verified window and a staged one
        # falls out, with no error anywhere.
        seen: set[str] = set()
        dups = [n for n in _VERIFY_FIRST if n in seen or seen.add(n)]
        raise RuntimeError(f"_VERIFY_FIRST has duplicates: {sorted(set(dups))}")
    ordered = {n: REGISTRY[n] for n in _VERIFY_FIRST}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
