"""Mergeable-sketch operators (approximate aggregation surface beyond
the HLL query in ``queries/relational_ext.py``).

Sketches are the scale path for streaming/distributed cardinality and
frequency questions: each executor builds a bounded-memory summary
over its partition, partial sketches merge associatively at the
exchange, and the driver never sees raw keys. Spark ships both as
JVM-side aggregate expressions — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.util import qident


def approx_top_k_items(
    df: DataFrame, col: str, k: int, *, max_items_tracked: int | None = None
) -> DataFrame:
    """Heavy hitters via ``approx_top_k`` (space-saving style sketch):
    returns one row per item with its estimated count, sorted by
    (count DESC, item). EXACT whenever the column's cardinality is at
    most the sketch's tracked-item budget — Spark's default
    maxItemsTracked is 10000 regardless of k (verified via DESCRIBE
    FUNCTION on 4.1; raising k does NOT grow the budget, pass
    ``max_items_tracked`` explicitly to size it — r16 review: the
    docstring demanded a parameter the signature didn't expose) —
    and the estimates degrade gracefully past that, which is the
    regime a 100 TB key-frequency scan actually runs in.
    """
    budget = (
        f", {int(max_items_tracked)}" if max_items_tracked is not None else ""
    )
    pair = df.agg(
        F.expr(f"approx_top_k({qident(col)}, {int(k)}{budget})").alias("tk")
    ).select(
        F.explode("tk").alias("e")
    )
    return pair.select(
        F.col("e.item").alias("item"),
        F.col("e.count").alias("est_count"),
    ).orderBy(F.col("est_count").desc(), F.col("item").asc())


def count_min_sketch_bytes(
    df: DataFrame, col: str, *, eps: float = 0.001, confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Serialized Count-Min sketch of a column (point-frequency
    estimates with additive error ≤ eps·N at the given confidence).

    Counter updates are integer additions, so the merged sketch is
    IDENTICAL regardless of partitioning/merge order — asserted in
    tests, which is what makes it usable as a deterministic artifact
    (e.g. shipped alongside a corpus snapshot for downstream
    frequency queries).
    """
    row = df.agg(
        F.expr(
            f"count_min_sketch({qident(col)},"
            f" {float(eps)}d, {float(confidence)}d, {int(seed)})"
        ).alias("cms")
    ).first()
    return bytes(row["cms"])
