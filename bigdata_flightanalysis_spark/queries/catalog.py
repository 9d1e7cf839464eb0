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
# Round-10 rotation (scripts/stage_rotation.py computed it). After
# r9, per-query newest-driver-row dates: 27 at r6 (the oldest — the
# exact set the r9 comment staged below its cut), 50 at r7, 48 at r8,
# 50 at r9; all 175 green at their newest row. Priority: (1) the 4
# queries whose code changed this round — the three BM25 lifecycle
# entries (refresh now detects a torn build via the postings/_SUCCESS
# completeness marker; serve/compact recovery also reclaims aborted-
# compact staging residue) and embed_near_dup_incremental (store
# ingests/rewrites now serialize on a per-store maintenance lock);
# (2) the 27 r6-dated rows; (3) backfill with the ALPHABETICALLY
# FIRST 19 of the 50 r7-dated rows. Window = 4 + 27 + 19 = 50. The
# remaining 31 r7-dated names are listed below the cut and lead the
# r11 window; steady state holds (after this window lands nothing is
# older than r7).
_VERIFY_FIRST: tuple[str, ...] = (
    # (1) code changed this round (round 10)
    "doc_bm25_refresh_topk",
    "doc_bm25_serve_topk",
    "doc_bm25_compact_topk",
    "embed_near_dup_incremental",
    # (2) last driver-checked in r6 — the 27 oldest rows
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
    # (3) r7-dated backfill to the 50-query window (alphabetical)
    "brand_number_histogram",
    "corpus_card",
    "cube_flag_status",
    "customer_order_recency",
    "customer_scd2_merge",
    "doc_bm25_index_topk",
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
    "doc_quality_scores",
    "doc_simhash",
    # The 50-query window ends here (4 changed + 27 r6-stale + 19
    # r7-dated backfill). The r7-dated entries below are the oldest
    # remaining rows once this window lands — they lead the r11
    # window (backfill r11 with the remaining r7 rows, then the
    # oldest r8-dated rows).
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
