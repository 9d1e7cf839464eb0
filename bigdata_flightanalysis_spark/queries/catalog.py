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
# Round-15 rotation (scripts/stage_rotation.py computed it; validated
# with --check after restaging). After r14, per-query newest-driver-row
# dates: 26 at r11 (the oldest), 49 at r12, 50 at r13, 50 at r14; all
# 175 green at their newest row. The round's code changes (ADVICE
# items in operators/incremental.py, operators/graph.py,
# operators/checkpointing.py, pipeline/flights.py) are output-identical
# for every registry query — error-path guards, eager-materialization
# of an already-correct frame, cache unpersists, and a rename of an
# internal join key none of the three assign_components callers can
# observe (each selects explicit columns) — so the window is pure
# staleness order: (1) the 26 r11-dated rows; (2) backfill with the 24
# alphabetically-first r12-dated rows. Window = 26 + 24 = 50 — exactly
# the set the r14 comment staged below its cut. The remaining 25 r12
# names plus the 25 oldest r13 names are listed below the cut and lead
# the r16 window; steady state holds (after this window lands nothing
# is older than r12).
_VERIFY_FIRST: tuple[str, ...] = (
    # (1) the r15 window: the 26 r11-dated rows (oldest remaining
    #     after r14) plus the 24 alphabetically-first r12-dated rows —
    #     exactly the set the r14 comment staged below its cut.
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
    "customer_rfm_segments",
    "customer_snapshot_diff",
    "doc_bigram_nll_quality",
    "doc_bm25_topk",
    "doc_clean_normalize",
    "doc_dup_canonical_pagerank",
    "doc_dup_graph_triangles",
    "doc_duplicate_spans",
    "doc_near_dup_candidates_largemode",
    "doc_pii_redaction",
    "doc_quality_weighted_sample",
    "doc_repetition_scores",
    "doc_salient_terms",
    "doc_shuffle_shards",
    "doc_source_mixture_weights",
    "doc_split_leakage_check",
    "doc_stopword_ratio",
    "doc_stratified_sample",
    "doc_temperature_mixture_sample",
    "doc_term_first_positions",
    "doc_train_test_split",
    "doc_training_manifest",
    "doc_url_domains",
    "doc_weighted_sample_es",
    # The 50-query window ends here (26 r11-stale + 24 r12-dated
    # backfill). The entries below are the oldest remaining rows once
    # this window lands — the remaining 25 r12 rows plus the 25 oldest
    # r13 rows lead the r16 window.
    "doc_winnow_fingerprints",
    "embed_label_centroids",
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
    "brand_number_histogram",
    "corpus_card",
    "cube_flag_status",
    "customer_order_recency",
    "customer_scd2_merge",
    "doc_bpe_token_stats",
    "doc_decontamination",
    "doc_dup_clusters",
    "doc_dup_graph_kcore",
    "doc_exact_dedup",
    "doc_fingerprints",
    "doc_jaccard_pairs_sample",
    "doc_langid",
    "doc_minhash_signatures",
    "doc_near_dup_candidates",
    "doc_near_dup_edit_distance",
    "doc_near_dup_incremental",
    "doc_quality_scores",
    "doc_simhash",
    "embed_near_dup_incremental",
    "embed_near_dup_pairs_largemode",
    "embed_pq_topk",
    "embed_quantized_topk",
    "events_activity_incident_overlap",
    "events_asof_purchase_click",
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
