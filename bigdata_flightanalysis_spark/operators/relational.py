"""Relational composite operators (SURVEY.md §2.2-§2.7).

Each is a thin, named composition of DataFrame primitives so Catalyst
sees the declarative plan (TakeOrderedAndProject for top-K, broadcast
semi-joins, partial aggregation) instead of driver-side control flow.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(
    df: DataFrame,
    order_by: Sequence[Column],
    k: int,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Top-K (O4): ``orderBy(...).limit(k)``.

    Catalyst plans this as TakeOrderedAndProject — per-partition heap
    + driver merge, never a full sort, which is exactly the shape that
    survives 100 TB. The reference's form
    (``Code/flight_analysis.py:206-208``) is tie-nondeterministic
    (quirk §2.12.5); ``tie_break`` columns append ascending keys so
    results are stable for the oracle hash.
    """
    keys = list(order_by) + [F.col(c).asc() for c in tie_break]
    return df.orderBy(*keys).limit(k)


def per_group_top_n(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-N via ``row_number`` window (generalizes §2.5 —
    the reference approximates this with a global sort + limit 20,
    ``Code/flight_analysis.py:147-152``).

    One shuffle on the partition keys; rows beyond N are dropped by
    the post-window filter, and Spark's WindowGroupLimit pushes the
    rank limit into the sort at scale.
    """
    if rank_col in df.columns:
        # withColumn would silently REPLACE the caller's column with
        # ranks (r16 review — reserved-name rule)
        raise ValueError(
            f"per_group_top_n rank_col {rank_col!r} already exists on "
            "the input; pass a different rank_col"
        )
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def semi_filter_topk(
    fact: DataFrame,
    key: str,
    order_metric: Column,
    k: int,
) -> DataFrame:
    """The scalable form of the reference's collect-then-isin idiom.

    Reference (``Code/flight_analysis.py:197-220``): top-K airlines are
    ``.collect()``-ed to the driver and re-applied with ``isin`` — fine
    for K=5, but the general engine form keeps the top-K list
    distributed and applies it as a broadcast LEFT SEMI join, so no
    list ever crosses the driver boundary.
    """
    # NULL keys can't survive the semi join (NULL = NULL never
    # matches), so a NULL-key group must not compete for a top-K slot
    # either — unfiltered, it could both rank in the list AND match
    # nothing, silently displacing the real K-th group (r16 review)
    keyed = fact.where(F.col(key).isNotNull())
    topk = (
        keyed.groupBy(key)
        .agg(order_metric.alias("__metric"))
        .orderBy(F.col("__metric").desc(), F.col(key).asc())
        .limit(k)
        .select(key)
    )
    return keyed.join(F.broadcast(topk), on=key, how="left_semi")


def deduplicate_exact(
    df: DataFrame,
    key_cols: Sequence[str],
    keep_order: Sequence[Column] | None = None,
) -> DataFrame:
    """Exact dedup: keep one row per key.

    With ``keep_order`` → deterministic survivor via min-by window
    (row_number == 1); without → ``dropDuplicates`` (hash-aggregate,
    cheapest, survivor arbitrary). Both are single-shuffle on the key —
    the 100 TB shape (no driver involvement, partial aggregation
    map-side).
    """
    if keep_order is None:
        return df.dropDuplicates(list(key_cols))
    if "__rn" in df.columns:
        # withColumn would silently REPLACE the caller's column and the
        # trailing drop would delete it (the assign_components /
        # zorder reserved-name rule, r16 review)
        raise ValueError("deduplicate_exact reserves the __rn column name")
    w = Window.partitionBy(*key_cols).orderBy(*keep_order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
