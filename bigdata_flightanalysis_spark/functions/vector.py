"""Vector math over array<float/double> columns — pure Catalyst
expressions (``zip_with`` + ``aggregate``), no UDF, no MLlib VectorUDT
at the engine boundary (SURVEY.md §1.2).

Determinism note: ``F.aggregate`` folds left-to-right sequentially, so
the double accumulation order is fixed — the same order a DuckDB
``list_`` function uses — which keeps similarity scores stable enough
to round-and-compare in the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Fails loud on a dimensionality mismatch: ``zip_with`` pads the
    shorter vector with NULLs, which poisons the fold to NULL — a
    result indistinguishable from the documented zero-norm NULL, so a
    shard embedded with a different model silently yielded zero
    matches instead of an error (r16 review). The size check is two
    O(1) length reads against the O(d) fold; NULL vectors pass
    through (NULL similarity, the documented contract)."""
    ok = (
        a.isNull()
        | b.isNull()
        | (F.size(a) == F.size(b))
    )
    guard = F.assert_true(
        ok,
        F.concat(
            F.lit("dot_product dimensionality mismatch: "),
            F.size(a).cast("string"),
            F.lit(" vs "),
            F.size(b).cast("string"),
        ),
    )
    return F.when(
        guard.isNull(),
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def cosine_from_parts(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed dot and per-side norms — hoist the
    norms to per-ROW columns before a pair join so they're computed
    once per vector instead of once per pair."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot / denom)
