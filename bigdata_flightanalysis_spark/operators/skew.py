"""Skew-mitigation operators (SURVEY.md §4 / 100 TB posture).

AQE's skew-join splitting handles most sort-merge skew at runtime, but
two situations still need explicit salting at 100 TB:

- a shuffled equi-join where one side has a few pathological hot keys
  AND the other side is too big to broadcast (``salted_join``),
- a high-cardinality aggregation whose key distribution is so skewed
  that single reducers spill (``salted_aggregate`` two-stage form —
  though for algebraic aggregates Spark's partial aggregation already
  absorbs most of it; the two-stage form matters for
  ``collect_list``-like holistic aggregates).

Both are deterministic: the salt is ``pmod(hash(cols...), n)`` — no
``rand()``, so plans stay replayable and testable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salts: int, exclude: Sequence[str]) -> Column:
    """Deterministic per-row salt in [0, n_salts) from the non-key
    columns.

    The salt MUST be a pure function of row content: a retried map
    task must regenerate the same shuffle output (the classic
    rand()-in-shuffle correctness bug), so rand()/row-ids are not
    options. That also means a frame with NO non-key columns cannot
    be salted — every row of a hot key is an identical tuple, so any
    content hash is per-key constant: the hot key would still land on
    one reducer while the other side pays the full n_salts
    replication. Fail loud instead of silently degenerating."""
    cols = [c for c in df.columns if c not in exclude]
    if not cols:
        raise ValueError(
            "cannot salt a frame whose every column is a join/group key: "
            "the salt must derive from non-key content (identical rows "
            "hash identically, so hot keys would not spread). Aggregate "
            "or dedup the key-only frame first, or carry a payload column."
        )
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def _guard_reserved(df: DataFrame, names: Sequence[str], op: str) -> None:
    """Fail loud when an input already carries one of the operator's
    internal column names: withColumn would silently REPLACE it, the
    name would join into the key, and the final drop would delete the
    caller's column — results change with no error."""
    clash = [c for c in df.columns if c in names]
    if clash:
        raise ValueError(
            f"{op}: input already carries reserved column(s) {clash}; "
            "rename them first"
        )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over
    ``n_salts`` reducers.

    The skewed side gets a deterministic salt; ``other`` is replicated
    ``n_salts`` ways (explode of a literal range — CHEAP relative to a
    hot reducer stalling the stage); the join key becomes
    (keys..., salt). Result rows are identical to the plain join —
    asserted by tests — only their placement changes: each hot key's
    rows land on ``n_salts`` reducers instead of one.

    Use when: ``other`` is too big to broadcast AND AQE's skew split
    can't help (e.g. the skew is in a hash-aggregate feeding the join).
    Replication multiplies ``other``'s shuffle volume by ``n_salts`` —
    pick the smaller side as ``other`` and keep ``n_salts`` modest.

    Only join modes that never emit an unmatched ``other`` row are
    accepted: because ``other`` is replicated ``n_salts`` ways, a
    right/full outer join would emit each unmatched ``other`` row once
    per salt — silently wrong. Flip the sides (the unmatched-preserved
    side must be the salted one) or use a plain join for those modes.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "side would duplicate unmatched rows n_salts times, and a "
            "keyed salted join can never be a true cross join "
            "(supported: inner/left/left_semi/left_anti)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    _guard_reserved(skewed, ["__salt"], "salted_join")
    _guard_reserved(other, ["__salt"], "salted_join")
    salted = skewed.withColumn("__salt", _salt_col(skewed, n_salts, keys))
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [*keys, "__salt"], how).drop("__salt")


def blocked_self_pairs(
    df: DataFrame,
    bucket_cols: str | Sequence[str],
    id_col: str,
    *,
    n_blocks: int = 1,
) -> DataFrame:
    """All unordered same-bucket pairs (``a.<id> < b.<id>``) as two
    struct columns ``a``/``b`` carrying every input column.

    With ``n_blocks=1`` this is the plain bucket self-join: one hot
    bucket of n rows puts its whole n²/2 pair block in ONE reducer —
    the straggler that kills a near-dup-dense corpus at scale. With
    ``n_blocks=S``, rows are deterministically split into S blocks by
    ``pmod(hash(id), S)`` and the pair space is decomposed into the
    S(S+1)/2 unordered block pairs (triangular blocking): each row is
    replicated S ways, the join key becomes (bucket..., i, j), and a
    hot bucket's pair block spreads over S(S+1)/2 reducers with
    ~(n/S)² work each. Replication multiplies shuffle volume by S —
    keep S modest (8-16) and switch it on by corpus size.

    Pair set is IDENTICAL for every S (asserted in tests): each
    unordered block pair lands in exactly one reducer, and the
    (a.s==i ∧ b.s==j) ∨ (a.s==j ∧ b.s==i) guard stops same-block
    pairs from re-forming in mixed reducers.
    """
    buckets = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    # "r"/"__sa"/"__sb" are claimed by the n_blocks>1 path's tagged/
    # a/b selects — a bucket column with one of those names would emit
    # duplicate columns and die later with an ambiguous-reference
    # error instead of this named one (r16 review)
    _guard_reserved(
        df,
        ["__s", "__t", "__i", "__j", "a", "b", "r", "__sa", "__sb"],
        "blocked_self_pairs",
    )
    row = F.struct(*[F.col(c) for c in df.columns])
    if n_blocks <= 1:
        a = df.select(*buckets, row.alias("a"))
        b = df.select(*buckets, row.alias("b"))
        return a.join(b, buckets).where(
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        ).select("a", "b")
    blk = F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).cast("int")
    tagged = df.select(*buckets, row.alias("r"), blk.alias("__s"))
    replicated = tagged.select(
        *buckets,
        "r",
        "__s",
        F.explode(F.array(*[F.lit(t) for t in range(n_blocks)])).alias("__t"),
    ).select(
        *buckets,
        "r",
        "__s",
        F.least("__s", "__t").alias("__i"),
        F.greatest("__s", "__t").alias("__j"),
    )  # each t yields a distinct (i,j) key — no dedup shuffle needed
    a = replicated.select(
        *buckets, "__i", "__j",
        F.col("r").alias("a"), F.col("__s").alias("__sa"),
    )
    b = replicated.select(
        *buckets, "__i", "__j",
        F.col("r").alias("b"), F.col("__s").alias("__sb"),
    )
    paired = a.join(b, [*buckets, "__i", "__j"]).where(
        (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (
            ((F.col("__sa") == F.col("__i")) & (F.col("__sb") == F.col("__j")))
            | ((F.col("__sa") == F.col("__j")) & (F.col("__sb") == F.col("__i")))
        )
    )
    return paired.select("a", "b")


def salted_aggregate(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: dict[str, str],
    *,
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: aggregate on
    (keys..., salt) first — hot keys fan out over ``n_salts`` partial
    reducers — then merge the partials per key.

    ``aggs`` maps output column → one of count/sum/min/max (the
    mergeable algebraic aggregates; count merges via sum). Input
    columns are named by the agg spec as ``"fn:col"``, e.g.
    ``{"n": "count:*", "total": "sum:value"}``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    first: list[Column] = []
    second: list[Column] = []
    for out, spec in aggs.items():
        fn, _, col = spec.partition(":")
        if fn == "count":
            first.append(F.count("*" if col in ("", "*") else col).alias(out))
            second.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            first.append(getattr(F, fn)(col).alias(out))
            second.append(getattr(F, fn)(out).alias(out))
        else:
            raise ValueError(f"unsupported agg {spec!r}")
    _guard_reserved(df, ["__salt"], "salted_aggregate")
    salted = df.withColumn("__salt", _salt_col(df, n_salts, keys))
    partial = salted.groupBy(*keys, "__salt").agg(*first)
    return partial.groupBy(*keys).agg(*second)
