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
# Round-5 rotation. Priority: (1) the four queries that are genuinely
# new this round (PII redaction, URL domains, bloom pre-join pruning);
# (2) the three events queries repaired from the PySpark 4.1
# TIMESTAMP_NTZ regression plus the batch twin of the chained
# streaming query — the driver, not just pytest, must prove the fix;
# (3) the four queries that silently fell out of round 4's window
# because the rotation listed them under wrong names (last row: r2);
# (4) staleness backfill: the r1-checked relational family, then
# r2-checked sampling/embedding/text-ext/multimodal families.
_VERIFY_FIRST: tuple[str, ...] = (
    # (1) new this round — never driver-checked
    "doc_pii_redaction",
    "doc_url_domains",
    "bloom_filtered_lineitem_revenue",
    "orders_anti_bloom_check",
    "doc_chunk_windows",
    "doc_dedup_keep_best",
    "part_affinity_topk",
    "events_minutely_gapfill",
    "doc_minhash_estimate_vs_exact",
    "customer_value_deciles",
    "nation_share_of_region_revenue",
    # (2) repaired from the NTZ regression + chained-streaming twin
    "events_asof_purchase_click",
    "events_range_join_error_context",
    "events_sessionization_gaps",
    "events_sliding_distinct_users",
    # (3) dropped from r4's window by bad rotation names
    "q8_market_share",
    "q11_important_parts",
    "q16_supplier_part_counts",
    "q22_idle_rich_customers",
    # (4a) stalest backfill — r1-checked relational family
    "revenue_by_region",
    "segments_of_open_order_customers",
    "parts_never_ordered",
    "top_customers_per_segment",
    "supplier_running_revenue",
    "order_priority_tiers",
    "orderdate_parts",
    "delayed_order_label",
    "returnflag_in_list",
    "distinct_flag_status",
    "count_distinct_parts",
    "union_priority_extremes",
    "approx_distinct_users_by_type",
    "order_value_quartiles",
    "q12_priority_by_flag",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    # (4b) r2-checked sampling / embedding extras
    "doc_train_test_split",
    "doc_stratified_sample",
    "doc_pack_sequences",
    "doc_quality_weighted_sample",
    "embed_label_centroids",
    "kmeans_embedding_clusters",
    "embed_quantized_topk",
    # (4c) r2-checked text-ext family
    "doc_repetition_scores",
    "doc_ngram_topk",
    "doc_source_mixture_weights",
    "doc_length_histogram",
    "doc_salient_terms",
    "doc_boilerplate_density",
    "doc_term_first_positions",
    "doc_dup_canonical_pagerank",
    # (4d) r2/r4-checked multimodal family
    "multimodal_payload_stats",
    "multimodal_feature_extract",
    "multimodal_frame_sampling",
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
    ordered = {n: REGISTRY[n] for n in _VERIFY_FIRST}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
