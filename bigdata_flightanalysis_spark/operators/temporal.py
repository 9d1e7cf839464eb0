"""Temporal join operators the reference's Spark surface lacks:
as-of join and range join (SURVEY.md §2.3 notes the reference has no
joins at all; these are the extension-surface temporal forms a
training-data / event pipeline needs).

Both are built to the 100 TB shape:

- ``asof_join`` is the union + partitioned-window formulation — ONE
  shuffle on the key columns, no quadratic time-range explosion, no
  driver-side state. This is how you as-of-join a 100 TB event table:
  tag both sides, sort within key by (ts, side), and carry the last
  right-side row forward with ``last(..., ignorenulls=True)``.
- ``range_join_bucketed`` turns the inequality |l.ts - r.ts| ∈ [0, w)
  into an equi-join on coarse time buckets (each left row probes its
  own and the previous bucket), then re-applies the exact predicate.
  Catalyst would otherwise plan a broadcast-nested-loop join, which is
  quadratic and unusable at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
    suffix: str = "_right",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` and equal key columns (backward as-of).

    Right rows sort BEFORE left rows at equal timestamps, so an exact
    timestamp tie counts as a match (the ``<=`` convention, matching
    DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).

    ``how``: ``"left"`` keeps unmatched left rows (right payload NULL);
    ``"inner"`` drops them.

    ``tolerance_seconds``: max staleness — a match older than this is
    discarded (NULLed under ``"left"``, dropped under ``"inner"``),
    pandas ``merge_asof(tolerance=...)`` semantics. Applied AFTER the
    window pass, so it adds no shuffle.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    lpay = [c for c in left.columns if c not in keys]
    rpay = [c for c in right.columns if c not in keys]
    # Suffixing must not CREATE a collision (right has both x and
    # x_right while left has x; or left itself has x_right): the
    # output would carry two identically-named columns and every
    # select-by-name downstream becomes ambiguous — fail loud instead.
    out_names = [f"{c}{suffix}" if c in left.columns else c for c in rpay]
    # the guard must cover the KEY columns too — they are emitted as
    # well, so a suffixed right column landing on a key name is the
    # same duplicate-output corruption
    all_out = keys + lpay + out_names
    dup = {n for n in all_out if all_out.count(n) > 1}
    if dup:
        raise ValueError(
            f"asof_join suffix {suffix!r} produces duplicate output "
            f"columns {sorted(dup)} — pick a different suffix or "
            "rename the colliding columns first"
        )
    l_struct = F.struct(*[F.col(c) for c in lpay])
    r_struct = F.struct(
        *[F.col(c).alias(f"{c}{suffix}" if c in left.columns else c) for c in rpay]
    )
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType

    l2 = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    # NULL-timestamped right rows can never be "the latest row at or
    # before" anything: __ts asc sorts NULLs FIRST, so an unfiltered
    # NULL-ts payload would be carried forward as the match for every
    # left row with no real earlier match — DuckDB ASOF (p.ts >= c.ts)
    # and pandas merge_asof never match NULL timestamps.
    # NULL-KEY right rows can never match either: SQL equality never
    # holds on NULL, but Window.partitionBy groups NULL keys into one
    # partition, so an unfiltered NULL-key right payload would be
    # carried into NULL-key left rows — a match DuckDB ASOF
    # (ON l.k = r.k) never makes (r16 review). With them filtered, a
    # NULL-key left row sits in a partition with no right rows and
    # falls out naturally: NULL payload under "left", dropped under
    # "inner".
    r_not_null_key = F.lit(True)
    for k in keys:
        r_not_null_key = r_not_null_key & F.col(k).isNotNull()
    r2 = right.filter(F.col(right_ts).isNotNull() & r_not_null_key).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    u = l2.unionByName(r2)

    # Tie-breaks, in order: right rows before left at equal ts (the ≤
    # convention), then the right payload struct ascending — so among
    # several right rows sharing the match timestamp the LARGEST
    # payload struct wins deterministically (requires orderable right
    # payload types, which all engine queries satisfy).
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(), F.col("__side").asc(), F.col("__r").asc_nulls_last()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    if tolerance_seconds is not None:
        rts_field = f"{right_ts}{suffix}" if right_ts in left.columns else right_ts
        stale = F.col("__m").isNotNull() & (
            F.unix_micros(F.col("__ts"))
            - F.unix_micros(F.col("__m").getField(rts_field))
            > tolerance_seconds * 1_000_000
        )
        matched = matched.withColumn(
            "__m", F.when(stale, F.lit(None).cast(r_type)).otherwise(F.col("__m"))
        )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    out_cols: list[Column] = [F.col(k) for k in keys]
    out_cols += [F.col("__l").getField(c).alias(c) for c in lpay]
    out_cols += [
        F.col("__m")
        .getField(f"{c}{suffix}" if c in left.columns else c)
        .alias(f"{c}{suffix}" if c in left.columns else c)
        for c in rpay
    ]
    return matched.select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int,
) -> DataFrame:
    """Equi-join-shaped range join: pairs with equal keys and
    ``left_ts - window_seconds < right_ts <= left_ts``.

    Each side is bucketed to ``window_seconds``-wide epoch bins; a left
    row can only match right rows in its own or the previous bin, so
    the left side is exploded to those two probe bins and the join is a
    plain shuffled equi-join on (keys, bin) — linear in matches, never
    a nested-loop scan. The exact range predicate is re-applied after
    the join. Right-side columns that collide with left names come back
    suffixed ``_r``.
    """
    if window_seconds <= 0:
        # /0 is NULL under non-ANSI Spark: every bin would be NULL and
        # the equi-join would return silently-empty output — raise the
        # misuse instead of reporting "no matches"
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    keys = [on] if isinstance(on, str) else list(on)
    # same fail-loud posture as asof_join: suffixing must not CREATE a
    # duplicate output column (right carrying both x and x_r), and the
    # internal __bin name must be free on both sides
    out_r = [
        f"{c}_r" if c in left.columns else c
        for c in right.columns
        if c not in keys
    ]
    all_out = list(left.columns) + out_r
    dup = {n for n in all_out if all_out.count(n) > 1}
    if dup or "__bin" in all_out:
        raise ValueError(
            "range_join_bucketed would emit duplicate/reserved output "
            f"columns {sorted(dup | ({'__bin'} & set(all_out)))} — "
            "rename the colliding columns first"
        )
    bin_l = F.floor(F.unix_micros(F.col(left_ts)) / (window_seconds * 1_000_000))
    bin_r = F.floor(F.unix_micros(F.col(right_ts)) / (window_seconds * 1_000_000))

    probe = left.withColumn("__bin", F.explode(F.array(bin_l - 1, bin_l)))
    build = right.select(
        *keys,
        bin_r.alias("__bin"),
        *[
            F.col(c).alias(f"{c}_r" if c in left.columns else c)
            for c in right.columns
            if c not in keys
        ],
    )
    rts = f"{right_ts}_r" if right_ts in left.columns else right_ts
    joined = probe.join(build, [*keys, "__bin"]).filter(
        (F.col(rts) <= F.col(left_ts))
        & (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(rts))
            < window_seconds * 1_000_000
        )
    )
    return joined.drop("__bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] = (),
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_micros: int,
    suffix: str = "_r",
) -> DataFrame:
    """Equi-join-shaped INTERVAL-overlap join: pairs whose closed
    intervals ``[left_start, left_end]`` and ``[right_start,
    right_end]`` (epoch-microsecond bigint columns) overlap, plus
    equal key columns.

    The both-sides-interval generalization of
    :func:`range_join_bucketed` (point vs window): each interval
    explodes to EVERY ``bucket_micros``-wide epoch bin it touches, the
    join is a plain shuffled equi-join on (keys, bin), the exact
    overlap predicate is re-applied, and the multi-bin duplicate match
    is eliminated WITHOUT a distinct: a pair is kept only in the bin
    containing ``greatest(left_start, right_start)`` — each
    overlapping pair has exactly one such bin. Linear in
    matches + bins touched; never a nested-loop inequality join.
    Choose ``bucket_micros`` near the typical interval length: shorter
    buckets explode long intervals into more rows, longer buckets put
    more non-matches in each bin.
    """
    if bucket_micros <= 0:
        # same failure mode as range_join_bucketed: NULL bins →
        # silently empty join instead of an error
        raise ValueError(f"bucket_micros must be positive, got {bucket_micros}")
    keys = [on] if isinstance(on, str) else list(on)
    # fail-loud duplicate/reserved guard (same class as asof_join /
    # range_join_bucketed): a right side already carrying both x and
    # x<suffix> would emit two identically-named output columns
    out_r = [
        f"{c}{suffix}" if (c in left.columns and c not in keys) else c
        for c in right.columns
        if c not in keys
    ]
    all_out = list(left.columns) + out_r
    dup = {n for n in all_out if all_out.count(n) > 1}
    if dup or "__bin" in all_out:
        raise ValueError(
            "interval_overlap_join would emit duplicate/reserved output "
            f"columns {sorted(dup | ({'__bin'} & set(all_out)))} — "
            "rename the colliding columns or pick a different suffix"
        )

    def bins(s: str, e: str) -> Column:
        return F.sequence(
            F.floor(F.col(s) / bucket_micros).cast("long"),
            F.floor(F.col(e) / bucket_micros).cast("long"),
        )

    l2 = left.withColumn("__bin", F.explode(bins(left_start, left_end)))
    # Join keys must keep their names on BOTH sides (the equi-join
    # below joins by name) — only non-key collisions get the suffix,
    # same exclusion range_join_bucketed applies.
    renames = {
        c: f"{c}{suffix}" if (c in left.columns and c not in keys) else c
        for c in right.columns
    }
    r2 = right.select(
        *[F.col(c).alias(renames[c]) for c in right.columns]
    ).withColumn(
        "__bin", F.explode(bins(renames[right_start], renames[right_end]))
    )
    rs, re_ = renames[right_start], renames[right_end]
    joined = l2.join(r2, [*keys, "__bin"]).filter(
        (F.col(left_start) <= F.col(re_))
        & (F.col(rs) <= F.col(left_end))
        & (
            F.col("__bin")
            == F.floor(F.greatest(F.col(left_start), F.col(rs)) / bucket_micros)
        )
    )
    return joined.drop("__bin")
