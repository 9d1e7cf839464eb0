#!/usr/bin/env python
"""Compute the next round's verification-window staging.

The external driver verifies roughly the FIRST 50 registry entries per
round in iteration order; `queries/catalog.py:_VERIFY_FIRST` is the
rotation that decides which 50. The staging rule (applied by hand each
round until now):

1. brand-new queries (no driver row yet) and queries passed via
   --changed (code-changed this round) enter the window outright;
2. the rest ranked by staleness — merge every CORRECTNESS_r*.json,
   take per-query max round, sort ascending (ties alphabetical);
3. the window is the first N of that ordering (order WITHIN the
   window is irrelevant: the driver checks all of it);
4. the next chunk past the cut is printed too — those lead the next
   round, and keeping them staged in the tuple documents the handoff.

This script PRINTS the suggested tuple body plus an age audit; it does
not edit catalog.py — the staging comment explaining each round's
choices is written by a person. When a restage passes --changed flags,
also update the STAGED_CHANGED constant below (flagless --check
replays it as its frame; reset it to () on a flag-free restage).

    python scripts/stage_rotation.py --changed q1 --changed q2
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_flightanalysis_spark.queries.catalog import load_all  # noqa: E402

WINDOW = 50

# The --changed flags used to stage the CURRENT catalog._VERIFY_FIRST
# window. Update this tuple with every restage that passes --changed,
# and reset it to () when a restage is flag-free — it is the committed
# record of the staging's frame of reference, so a flagless `--check`
# (CI, tests/test_stage_rotation.py's live-repo invariant) replays the
# same frame instead of misreporting a legitimately-staged window as
# WRONG. Explicit --changed flags on the command line override it.
#
# r16 restage: flag-free — staged at round open, before any query/
# oracle body change (the first r16 commits are bookkeeping: driver
# r15 detail snapshot + 74.11 s archive restore). The window is pure
# staleness order: the 25 r12-dated rows plus the 25 alphabetically-
# first r13-dated rows — exactly the set the r15 catalog comment
# staged below its cut. Any later review-batch fix that touches a
# query/oracle body will be adjudicated here (output-identical on
# driver data, all-175 parity re-run) or restaged with --changed.
# R16 adjudications so far: the five r15 driver-ADVICE closures are
# output-identical for every registry query — the MAD twopass tail
# now CALLS _mad_finalize (plan-identical refactor; both names
# re-proved by the all-175 parity run), the _USER_DIR_FOR nested-
# scope pop and bloom stamp witness are non-query lifecycle/guard
# paths (bloom_filtered_lineitem_revenue re-verified oracle-exact
# with the witnessed stamp and keeps its join shape; it is an r17
# leader staged below the cut), q16's build-side NULL filter is a
# no-op on TPC-H PK data (q16 is an r17 leader too), and the verify-
# script count() drop is tooling-only. First review batch
# (relational/governance/multimodal/codecs/introspect): three
# cross-engine NULL-contract pins, all output-identical on driver
# data (NO testdata row has NULL text/n_chars; all-175 parity re-run
# green) and each proven by a NULL-doc row added to the edge_docs
# differential fixture — corpus_card's p50 oracle now uses
# percentile_disc (the cume_dist CTE counted NULL n_tokens rows in
# its denominator), _sql_shingles now propagates NULL token lists
# (the ELSE branch fabricated a [NULL] single-shingle list, skewing
# doc_repetition_scores to 1.0 and doc_jaccard_pairs_sample to 0.0
# where Spark scores NULL — the macro feeds ~12 oracle sites across
# text/text_ext/retrieval, all re-proved), and
# multimodal_frame_sampling's oracle COALESCEs range(0, NULL, 25) to
# the Spark side's ''/0 zero-decode plan. Of the changed names,
# corpus_card / doc_jaccard_pairs_sample / doc_minhash_signatures /
# doc_near_dup_candidates / doc_decontamination are IN the r16
# window (fresh driver rows over the new oracle text); the
# remaining macro users and the multimodal pair are r14/r15-dated —
# freshest in the rotation. The batch also deduped the
# fingerprint/tokenizer SQL twins into functions/text.py
# (SQL_TOKENS/SQL_NORM_TEXT/SQL_FINGERPRINT — oracle text
# byte-identical via aliases) and fixed sniff_format's netpbm
# whitespace set (\x0B/\f — non-registry codec surface). Second
# batch (codec fuzz lane, verdict item 5): ONE new registry query,
# multimodal_decode_quarantine, restaged into the window outright
# per rule 1 (displacing events_asof_purchase_click, r13, to lead
# r17); its plumbing (decode_media_stats quarantine operator, the
# PNG allocation-cap/bounded-inflate/IHDR-length hardening, the
# decode_wav truncated-data check) touches no existing oracle —
# multimodal_image_stats/audio_stats synthesize well-formed payloads
# the hardening accepts unchanged (all-175 parity re-run green).
# Third batch (sketches/bloom-query/reports/run/similarity review):
# two cross-engine pins proven by a new edge-embeddings differential
# fixture (a zero vector and a NULL embedding) — embed_quantize_int8
# guards 127/maxabs=0 (ANSI exception vs DuckDB NULL; zero vectors
# now quantize to all-zero codes on BOTH engines) and
# embed_standardize excludes NULL embeddings symmetrically (Spark's
# posexplode dropped them while the oracle's range() unnest counted
# them in every dimension's n). Both names are r15-dated (freshest);
# both changes are output-identical on driver data (no zero/NULL
# embeddings in testdata; all-176 parity re-run green). The same
# batch deduped the int8/PQ stage-2 rerank into _exact_cosine_rerank
# and routed IVF's projection through _prepared (plan/output-
# identical — recall suites green; embed_pq_topk/embed_quantized_topk
# are IN the r16 window for fresh rows), dropped a dead c_maxabs
# column, made run.py reject a half-specified CSV pair (CLI surface),
# and corrected approx_top_k_items' documented budget (comment-only).
# Fourth batch (graph/retrieval/sampling/functions-text review): the
# BM25 rebuild now clears .new/.staging residue so a crashed
# refresh's complete corpus_stats.new can never be promoted over a
# fresh rebuild's totals (regression-tested; proven failing pre-fix);
# serves route through serve_bm25_topk (plan+materialize under the
# re-entrant maintenance lock — closes the serve-vs-swap race; the
# lazy form stays for plan tests); the three lifecycle entries share
# _with_temp_index (try/finally — temp index reclaimed on failure);
# doc_bm25_refresh_topk now appends a REAL torn-refresh replay so
# the serve path's duplicate immunity gets a driver row (its old
# 'overlap' was fully anti-joined away — same oracle, same hash,
# output-identical, re-proved by the all-176 parity run; the name is
# an r17 leader); the serve cache keys by realpath; and
# connected_components' contract text now states the self-loop-only
# exclusion. doc_bm25_index_topk / doc_bm25_compact_topk /
# doc_bm25_serve_topk are refactor-only (pin+cleanup order
# unchanged). All four BM25 names are r14-dated r17 leaders.
# Fifth batch (text/text_ext/layout/relational review):
# doc_dup_canonical_pagerank's oracle now does its teleport/init
# arithmetic in DOUBLE (DuckDB's bare (1.0-0.85) folds in DECIMAL to
# a different double than Python's — empirically verified; the
# op-identical IEEE claim now actually holds; output-identical on
# driver data, r15-dated); doc_dup_graph_triangles localCheckpoints
# its pairs (plan-only, the pagerank precedent — was re-running the
# LSH pipeline ~6x) and doc_near_dup_incremental its batch bands
# (plan-only; IN the r16 window); semi_filter_topk excludes NULL
# keys from top-K competition (flight-pipeline F2 surface — no
# registry query; NULL keys can't survive the semi join, so a
# NULL group could displace the real K-th); deduplicate_exact /
# per_group_top_n / zorder_value gained reserved-name guards
# (raise-only); doc_stopword_ratio's count expression now routes
# through the generalized functions.text.stopword_hits
# (expression-identical). All re-proved by the all-176 parity run.
#
# r15 restage: flag-free — the round's planned changes are the five
# driver-ADVICE items (operators/incremental.py replay materialization
# + glob escaping, operators/graph.py reserved join-key name,
# pipeline/flights.py cache unpersists, operators/checkpointing.py
# _USER_DIR_FOR bounding), all output-identical for every registry
# query: error-path guards, eager materialization of an
# already-correct frame, cache lifecycle, and an internal column
# rename none of assign_components' three callers can observe (each
# selects explicit columns). The window is pure staleness order
# (26 r11-dated + 24 alphabetically-first r12-dated) — exactly the
# set the r14 comment staged below its cut; any later review-batch
# fix that DOES touch a query/oracle body will be adjudicated here
# or staged with --changed. One such change so far: the dates/decimals
# differential-fuzz lane pinned the profiler's double rendering by
# routing the DuckDB twin through VARCHAR (_SQL_RENDER_DOUBLE —
# shortest-repr + HALF_UP, matching Spark's cast semantics exactly;
# the old exact-binary DECIMAL cast diverges only for |x| ≳ 9e9 or
# precision-edge doubles, never on driver data — output-identical
# there, re-proved by the all-175 parity run). The two affected names:
# orders_profile_approx is IN the r15 window (fresh driver row over
# the new oracle text); orders_profile is r14-dated — the freshest in
# the rotation, due again by r16. The r15 review batch over
# layout/profile/introspect/fsck/retrieval is likewise
# output-identical on driver data: profile_table's n_nulls
# count(when) change only differs on zero-row tables (none in the
# testdata), its dotted/backslash-name and NTZ hardening touches no
# testdata schema, the index-heal _remove_any change only alters
# behavior on file-shaped crash residue (never present in a query
# run), and zorder/plan_stats are not registry surfaces — all
# re-proved by the all-175 parity run at the changed tree. The second
# r15 review batch (util/session/bench/writers/peek) is pure
# infrastructure: sidecar-write concurrency (mkstemp), lock-exit
# exception safety, file-shaped-.old restore guard (crash-residue
# shapes no query run produces), compact_parquet partition
# preservation (no registry query compacts a partitioned layout),
# bench sf-labeling and peek CSV detection (CLI surfaces) — no
# query/oracle body touched; all-175 parity re-run green. The third
# batch (round tooling: scale_smoke, verify_driver_surface,
# bench_compare, pydatasource's stream reader) touches no registry
# query either — the synthetic sources exist only for smokes, and
# the verify-script hardening (noop-sink materialization for
# rows-only entries) only STRENGTHENS the gate; parity re-run green.
# The fourth batch (readers/bloom/skew/vector) is output-identical on
# driver data too: the nanosAsLong guard and table_bytes empty-dir
# raise are error paths (current testdata is MICROS and non-empty);
# bloom_build now stamps (k, m_bits) and bloom_prune verifies the
# stamp via assert_true — `bloom_filtered_lineitem_revenue` (r14-dated,
# freshest) re-verified oracle-exact with the stamped bitmap, and its
# plan keeps the same join shape; skew guards are raise-only; the
# removed vector helpers were dead code with zero callers. All-175
# parity re-run green at the changed tree. The fifth batch
# (scalar/temporal/sampling): the one changed query/oracle BODY is
# doc_weighted_sample_es (zero-weight guard, identical output on
# driver data where min n_chars=44) — IN the r15 window, fresh driver
# row over the new text; the dsum/exact_avg NaN guard and the asof
# NULL-ts filter change Spark-side expressions used by many queries
# but are output-identical on NaN-free/NULL-ts-free driver data
# (all-175 parity re-run green); the temporal duplicate guards and
# typed_fillna decimal row are raise-only/error-path. Sixth change:
# events_json_extract's pair pinned by the new JSON fuzz lane
# (json_valid-guarded json_extract_string twin; strict integer-gated
# TRY_CAST vs DuckDB's rounding one; Spark side try_cast so a
# non-integer k can't abort the aggregation under ANSI) —
# output-identical on driver data, and the query is IN the r15
# window for a fresh driver row over the new oracle text. Seventh
# (sixth review batch, events/streaming): zero-variance and
# zero-denominator ANSI division guards (events_hourly_anomalies,
# events_funnel — NULL both engines, output-identical on driver
# data), NULL-ts routing in events_incremental_agg_merge's split,
# events_cohort_retention's per-user frame no longer force-broadcast
# (plan-only), the MAD pair's shared tail factored (plan-identical),
# and the strict-bigint oracle macro now STRIPS Spark's measured
# [\x00-\x20\x7f] trim set. Of the changed names,
# events_json_extract and events_mad_anomalies_twopass are IN the
# r15 window (fresh driver rows over the new text); funnel / hourly
# / cohort / incremental-merge / mad-window are r14-dated (freshest,
# due r16). All re-proved by the all-175 parity run at the changed
# tree, with dedicated zero-variance / zero-denominator / NULL-ts
# regression fixtures in tests/test_events_ops.py. Eighth (seventh
# review batch, relational_ext/tpch_shapes): ANSI guards for the n=1
# stddev group and q2's zero-quantity division, q16's probe-side
# NULL-FK filter (NOT IN semantics), order_metrics_unpivot's NULL
# contract pinned to DuckDB's NULL-excluding UNPIVOT, and two
# dedup refactors (shared _customer_versions SCD2 construction and
# generalized _bucket_*_sql helpers — oracle text byte-identical).
# Of the changed names, order_metrics_unpivot is IN the r15 window;
# price_stddev_by_status / q2 / scd2 are staged r16 leaders; q16 and
# orders_pit are r13/r14-dated. All output-identical on driver data
# (all-175 parity re-run green) with a crafted edge-star
# differential fixture in tests/test_adversarial_parity.py proving
# both engines agree on the edge data itself.
#
# r14 restage: flag-free — the round's operator-adjacent changes are
# output-identical for every registry query: util.remove_layout's
# symlink unlink (no registry path is a symlink; the BM25 lifecycle
# queries that call it are in the window by staleness anyway), the
# temporal/graph validation guards (error paths only),
# assign_components' label-column hygiene (all three callers select
# explicit columns, masking the old leak), and profile_table's
# ANSI-safe min/max rendering (string-identical for in-range doubles;
# orders_profile, in the window by staleness, exercises the new
# path). The fourth review batch fixed latent EDGE semantics (blank/
# \x0B docs via the _SQL_TOKENS/_sql_shingles macros; NULL values,
# k=1 groups, tied session boundaries in events) — every affected
# oracle/query pair re-verified output-identical on the driver's own
# data by the all-175 parity run, the macro-affected names in-window
# (doc_token_stats, doc_ngram_topk, doc_chunk_windows,
# doc_boilerplate_density, doc_minhash_estimate_vs_exact, the BM25
# four, events_hourly_anomalies, events_approx_quantile_contract)
# give the driver fresh green rows over the new oracle text, the
# changed names events_session_windows / doc_repetition_scores /
# doc_stopword_ratio are already staged below the cut as r15
# leaders, and the rest (doc_quality_scores, doc_fingerprints,
# doc_bpe_token_stats, corpus_card) are r13-dated — freshest in the
# rotation, re-verified here, and due again by r16. The fifth batch
# (ANN/retrieval/tpch determinism: decimal ADC sums, zero-norm rerank
# guards, DuckDB plane-literal DOUBLE parse, q20 decimal window,
# BM25 doc_stats dedup at serve) is likewise output-identical on
# driver data, with embed_cosine_topk and the four BM25 lifecycle
# entries in-window, embed_lsh_topk / embed_near_dup_pairs /
# embed_decontamination staged as r15 leaders, and the PQ/int8
# family r13-dated. The sixth batch (exactly-once exact-dedup ingest,
# fsck heal verification, jaccard/langid edges) changes only
# in-window names (doc_jaccard_pairs_sample, doc_langid) plus
# non-registry store machinery. Verified by full 175-query
# DuckDB parity + determinism sweep at the changed tree. The window
# is pure staleness order (26 r10-dated + 24 oldest r11-dated).
STAGED_CHANGED: tuple[str, ...] = ()

# --check: a staged window within (1 - fraction) * window names of the
# just-verified set IN EACH DIRECTION still diagnoses "likely STALE"
# rather than WRONG, so a driver round that verified a slightly
# different set (a query renamed mid-round, a 49/51-row window)
# doesn't degrade a genuinely stale round-end state into a misleading
# WRONG. Substantial divergence either way still reports WRONG.
STALE_OVERLAP_FRACTION = 0.9


def _slack(window_len: int) -> int:
    """Per-direction name budget for the likely-STALE diagnosis — the
    single definition both diagnose_staging and the --check message
    use (5 at the standard 50-name window)."""
    return window_len - max(1, round(STALE_OVERLAP_FRACTION * window_len))


def compute_window(
    registry: set[str],
    newest: dict[str, int],
    changed: list[str],
    window_size: int,
) -> tuple[list[str], list[str], list[str], list[str]]:
    """Pure window computation (the staging rule from the module
    docstring), extracted so the rotation invariants are directly
    property-testable. Returns (window, never, changed_kept, by_age):
    brand-new queries lead outright, then code-changed ones, then the
    rest by staleness (per-query newest round ascending, ties
    alphabetical); the window is the first ``window_size`` of that."""
    never = sorted(registry - set(newest))
    # A --changed query that is also brand-new already leads via
    # `never`; keeping it in `changed` too would duplicate it inside
    # the window slice and silently shrink distinct coverage.
    changed_kept = list(
        dict.fromkeys(q for q in changed if q in registry and q in newest)
    )
    by_age = sorted(
        (q for q in registry if q in newest and q not in changed_kept),
        key=lambda q: (newest[q], q),
    )
    return (never + changed_kept + by_age)[:window_size], never, changed_kept, by_age


def diagnose_staging(
    staged: list[str],
    computed: list[str],
    just_verified: set[str],
) -> str:
    """Pure --check diagnosis, extracted so the STALE/likely-STALE/
    WRONG rule is directly property-testable. Returns one of:

    - "OK": staged set == the computed window for this frame;
    - "STALE": staged set == exactly the just-verified set (the
      driver verified it since it was staged — old, not wrong);
    - "LIKELY_STALE": staged is within the two-sided slack
      ((1 - STALE_OVERLAP_FRACTION) * window per direction) of the
      just-verified set — the driver verified a slightly different
      set (a rename, a 49/51-row window), still old-not-wrong;
    - "WRONG": none of the above explains the staging.
    """
    if set(staged) == set(computed):
        return "OK"
    if just_verified and set(staged) == just_verified:
        return "STALE"
    slack = _slack(len(staged))
    if (
        just_verified
        and len(set(staged) - just_verified) <= slack
        and len(just_verified - set(staged)) <= slack
    ):
        return "LIKELY_STALE"
    return "WRONG"


def newest_rounds(
    repo_root: str,
) -> tuple[dict[str, int], list[int], set[str]]:
    """Per-query newest driver round, plus the sorted list of rounds
    that fed the merge (so --check can state its frame of reference)
    and the name set of the newest round's file (so --check can tell
    stale-but-just-verified staging from wrong staging)."""
    newest: dict[str, int] = {}
    rounds: list[int] = []
    newest_names: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(f))
        if m is None:
            # a mis-named scratch file (CORRECTNESS_rerun.json) matches
            # the glob but carries no round number — skip it rather
            # than brick every staging/--check run
            continue
        rnd = int(m.group(1))
        with open(f, encoding="utf-8") as fh:
            payload = json.load(fh)
        names = set(payload)
        # Only a PASSING row advances a query's newest round: a
        # failed/errored driver row used to stamp the query "freshly
        # verified", pushing a KNOWN-FAILING query to the back of the
        # staleness queue for ~3 rounds (r16 review). A failed row
        # leaves the query at its previous age — maximally stale,
        # re-entering the window at the next restage.
        for name in names:
            row = payload[name] if isinstance(payload, dict) else None
            ok = (
                not isinstance(row, dict)  # legacy bare-list shape
                or (
                    not row.get("err")
                    and all(
                        bool(v)
                        for k, v in row.items()
                        if k.endswith("_match")
                    )
                )
            )
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
        if not rounds or rnd > max(rounds):
            # the newest FILE's full name set (incl. failures) — this
            # describes what the driver last LOOKED AT, which is what
            # the stale-vs-wrong diagnosis needs
            newest_names = names
        rounds.append(rnd)
    return newest, sorted(rounds), newest_names


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--changed",
        action="append",
        default=[],
        help="query whose code changed this round (repeatable); "
        "enters the window outright — right after brand-new queries, "
        "BEFORE the staleness-ranked rest — regardless of age",
    )
    ap.add_argument("--window", type=int, default=WINDOW)
    ap.add_argument(
        "--check",
        action="store_true",
        help="validate catalog._VERIFY_FIRST's leading window against "
        "this script's recommendation instead of printing a staging: "
        "exit 0 if the first --window names are exactly the computed "
        "set (order within the window is irrelevant — the driver "
        "checks all of it); 3 when the mismatch is (likely) STALE "
        "staging — old but healthy round-end state; 4 with a diff "
        "when the staging looks WRONG. The check is "
        "only meaningful AFTER restaging for the upcoming round and "
        "BEFORE that round's CORRECTNESS_r*.json lands. A flagless "
        "--check replays the committed STAGED_CHANGED constant (the "
        "flags used for the current staging); explicit --changed "
        "flags override it. Run at round-end state it sees the next "
        "round's inputs and reports the still-staged window as stale "
        "(diagnosed, not a bare diff)",
    )
    ap.add_argument(
        "--no-staged-changed",
        action="store_true",
        help="with --check: do NOT default to the committed "
        "STAGED_CHANGED flags when no --changed is given (replay a "
        "genuinely flag-free frame, e.g. against a synthetic "
        "--repo-root state)",
    )
    ap.add_argument(
        "--repo-root",
        default=None,
        help="directory whose CORRECTNESS_r*.json files feed the "
        "staleness merge (default: the repo this script lives in); "
        "lets tests replay past/synthetic round states",
    )
    args = ap.parse_args()
    if args.window < 1:
        ap.error("--window must be >= 1")

    # A flagless --check replays the committed staging frame so a
    # legitimately --changed-staged window is not misreported as WRONG
    # by CI or the live-repo invariant test. Explicit flags override;
    # --no-staged-changed forces a genuinely flag-free frame (synthetic
    # --repo-root replays in tests).
    changed_source = "cli"
    if args.check and not args.changed and not args.no_staged_changed:
        args.changed = list(STAGED_CHANGED)
        changed_source = "STAGED_CHANGED"

    repo_root = args.repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    registry = set(load_all())
    unknown = [q for q in args.changed if q not in registry]
    if unknown and changed_source == "STAGED_CHANGED":
        # the committed constant can reference a query that was later
        # renamed/removed — exactly the drift --check exists to survive;
        # ignore those names (compute_window would drop them anyway)
        # instead of dying with an error about flags nobody typed
        print(
            "note: committed STAGED_CHANGED names no longer in the "
            f"registry (renamed/removed) — ignored: {unknown}"
        )
        args.changed = [q for q in args.changed if q in registry]
    elif unknown:
        raise SystemExit(f"--changed names not in registry: {unknown}")
    newest, merged_rounds, just_verified = newest_rounds(repo_root)
    window, never, changed, by_age = compute_window(
        registry, newest, args.changed, args.window
    )

    if args.check:
        from bigdata_flightanalysis_spark.queries.catalog import _VERIFY_FIRST

        frame = (
            f"frame of reference: merged CORRECTNESS rounds "
            f"r{merged_rounds[0]}..r{merged_rounds[-1]} "
            f"({len(merged_rounds)} files), --changed="
            f"{args.changed or 'none'}"
            + (
                f" (replayed from committed {changed_source})"
                if args.changed and changed_source == "STAGED_CHANGED"
                else ""
            )
            if merged_rounds
            else "frame of reference: no CORRECTNESS files found "
            "(fresh clone — every query ranks as brand-new)"
        )
        # load_all() above already fail-fasted on duplicated or unknown
        # _VERIFY_FIRST names, so the tuple is duplicate-free here
        staged = list(_VERIFY_FIRST)[: args.window]
        verdict = diagnose_staging(staged, window, just_verified)
        if verdict == "OK":
            print(f"window OK: first {args.window} of _VERIFY_FIRST match")
            print(frame)
            return
        print(frame)
        if verdict == "STALE":
            # run after the staged round's own CORRECTNESS file landed
            # — the still-staged window IS the set the newest file just
            # verified: old, not wrong.
            print(
                f"staged window is exactly round {merged_rounds[-1]}'s "
                f"just-verified window — staging is STALE, not wrong: "
                f"CORRECTNESS_r{merged_rounds[-1]:02d}.json has landed "
                f"since it was staged. Restage for the next round, then "
                f"re-run --check."
            )
            raise SystemExit(3)
        if verdict == "LIKELY_STALE":
            # the driver verified a slightly different set than was
            # staged (a query renamed mid-round, a 49/51-row window) —
            # a genuinely stale round-end state must not degrade to the
            # WRONG message over a tiny divergence.
            slack = _slack(len(staged))
            sym = sorted(set(staged) ^ just_verified)
            print(
                f"staged window is within {slack} names of round "
                f"{merged_rounds[-1]}'s just-verified window — staging "
                f"is likely STALE, not wrong (symmetric difference: "
                f"{sym}). Restage for the next round, then re-run "
                f"--check."
            )
            raise SystemExit(3)
        missing = sorted(set(window) - set(staged))
        extra = sorted(set(staged) - set(window))
        if missing:
            print(f"expected in window but not staged: {missing}")
        if extra:
            print(f"staged but not expected: {extra}")
        verified_note = (
            f"round {merged_rounds[-1]}'s verified window"
            if merged_rounds
            else "any verified window"
        )
        print(
            "staged window matches neither this frame's computation nor "
            f"{verified_note} — staging looks WRONG (or --changed flags "
            "differ from the ones used to stage)"
        )
        raise SystemExit(4)

    # stage the next-next round's leaders below the cut for the handoff
    below = [q for q in by_age if q not in window]
    oldest_below = below[: args.window]

    print(f"# window ({len(window)}):")
    for q in window:
        tag = "NEW" if q in never else ("changed" if q in changed else f"r{newest[q]}")
        print(f'    "{q}",  # {tag}')
    print(f"# below the cut — next round's leaders (first {len(oldest_below)}):")
    for q in oldest_below:
        print(f'    "{q}",  # r{newest[q]}')
    aged = [newest[q] for q in registry if q in newest]
    remaining = [newest[q] for q in registry if q in newest and q not in window]
    oldest_now = f"r{min(aged)}" if aged else "none (no driver rows yet)"
    oldest_rem = f"r{min(remaining)}" if remaining else "none (all rows in window)"
    print(
        f"# age audit: oldest row now {oldest_now}; after this window "
        f"lands, oldest remaining {oldest_rem}"
    )


if __name__ == "__main__":
    main()
