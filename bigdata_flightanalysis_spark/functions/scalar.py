"""Scalar function library (SURVEY.md §2.8, X1-X11).

All pure Column expressions — JVM-side, whole-stage-codegen'd, no
Python in the hot path. The reference's only UDF (vector stringify,
``Code/flight_analysis.py:228-241``) is deliberately NOT reproduced as
a UDF; see ``pipeline.flights``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Reference scalar surface
# --------------------------------------------------------------------------


def case_map(
    col: Column | str, mapping: Mapping[str, str], default: str | None = None
) -> Column:
    """Value-map lookup (X1).

    The reference builds a SQL ``CASE WHEN`` string in Python and feeds
    it through ``expr()`` (``Code/flight_analysis.py:38-41,64``); with
    no ELSE branch, unmatched codes yield NULL (quirk §2.12.4). The
    engine expresses the same thing as a chained ``when`` with an
    explicit default (``default=None`` reproduces the reference's
    NULL-on-unmatched semantics).
    """
    col = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for key, value in mapping.items():
        cond = col == F.lit(key)
        expr = F.when(cond, F.lit(value)) if expr is None else expr.when(cond, F.lit(value))
    if expr is None:
        return F.lit(default)
    return expr if default is None else expr.otherwise(F.lit(default))


def threshold_label(col: Column | str, threshold: float = 5.0) -> Column:
    """Binary delay label (X2/A3): 1 if value > threshold else 0.

    Reference: ``IsDelayed`` at ``Code/flight_analysis.py:124-125``
    (threshold 5 minutes). NULL input → 0, matching the reference's
    ``otherwise(0)`` branch.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.when(col > F.lit(threshold), F.lit(1)).otherwise(F.lit(0))


def hhmm_to_hour(col: Column | str) -> Column:
    """HHMM-encoded numeric time → hour-of-day (X9).

    Reference: ``floor(DEP_TIME/100).cast(int)``
    (``Code/flight_analysis.py:102``). 1432.0 → 14; 2400.0 → 24 (the
    reference does not normalize the midnight-wrap value — kept as-is,
    documented; ``hhmm_to_hour_wrapped`` normalizes).
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.floor(col / 100).cast("int")


def hhmm_to_hour_wrapped(col: Column | str) -> Column:
    """Like :func:`hhmm_to_hour` but maps 2400 → 0 (idiomatic mode)."""
    return hhmm_to_hour(col) % 24


def typed_fillna(df, fills: Mapping[str, object]):
    """Type-correct null fill (X3).

    Spark's ``fillna`` silently skips columns whose type mismatches the
    fill value — in the reference that turns most of the fill dict into
    a no-op because all raw columns are strings
    (``Code/flight_analysis.py:44-53``, quirk §2.12.2). This wrapper
    raises instead of no-opping.
    """
    dtypes = dict(df.dtypes)
    for name, value in fills.items():
        if name not in dtypes:
            raise KeyError(f"fillna target {name!r} not in schema")
        spark_t = dtypes[name]
        ok = (
            isinstance(value, bool) and spark_t == "boolean"
            or isinstance(value, int) and not isinstance(value, bool)
            and spark_t in ("int", "bigint", "smallint", "tinyint", "double", "float")
            or isinstance(value, float) and spark_t in ("double", "float")
            or isinstance(value, (int, float)) and not isinstance(value, bool)
            and spark_t.startswith("decimal")
            or isinstance(value, str) and spark_t == "string"
        )
        if not ok:
            raise TypeError(
                f"fillna value {value!r} does not match column {name!r} type {spark_t}"
                " (Spark would silently no-op this fill)"
            )
    return df.fillna(dict(fills))


# --------------------------------------------------------------------------
# Oracle-deterministic aggregate helpers
# --------------------------------------------------------------------------
#
# Double-precision SUM is order-dependent, and Spark's partial/final
# aggregation order differs run-to-run and engine-to-engine — a raw
# sum(double) can hash-mismatch a DuckDB oracle in the last ulp. The
# fix: cast each addend to DECIMAL(38,6) (exact, engine-independent —
# a double is never exactly on a decimal midpoint so rounding mode
# can't diverge), sum exactly in decimal, then cast the single result
# back to double (correctly rounded, hence identical bits in any IEEE
# engine). Same trick at 100 TB also buys overflow-safe money sums.


def _nan_guarded(c: Column) -> Column:
    """Fail loud on NaN addends: casting NaN to DECIMAL yields NULL
    (even under ANSI), so SUM would silently SKIP the row and return a
    finite wrong total — while the DuckDB twin errors on the same
    cast. assert_true folds into the row expressions (codegen'd, no
    extra job); NULLs pass through untouched (SUM ignores them on both
    engines by definition)."""
    ok = F.isnull(c) | ~F.isnan(c.cast("double"))
    return F.when(
        F.isnull(
            F.assert_true(
                ok,
                F.lit(
                    "dsum/exact_avg input contains NaN — the decimal "
                    "accumulation would silently drop it; sanitize the "
                    "expression upstream (e.g. nanvl)"
                ),
            )
        ),
        c,
    )


def dsum(col: Column | str, alias: str) -> Column:
    """Deterministic double sum: exact decimal accumulation.

    NaN input raises at execution (see :func:`_nan_guarded`) — the
    decimal cast would otherwise silently drop NaN addends, diverging
    from both plain double SUM (NaN-propagating) and the DuckDB twin
    (errors).

    Cross-engine bit-exactness contract: each ADDEND must stay below
    ~4.5e9 (where a double's ulp reaches 1e-6, making the per-addend
    double→decimal(…,6) cast itself rounding-mode-dependent — Spark
    rounds the shortest repr, DuckDB the exact binary expansion;
    measured divergent at 5.4e9). The SUM is unbounded: it
    accumulates exactly in decimal, and the one final decimal→double
    cast is correctly rounded on Spark and VARCHAR-routed on the
    DuckDB side (see :func:`dec_to_double_sql`)."""
    col = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_nan_guarded(col).cast("decimal(38,6)"))
        .cast("double")
        .alias(alias)
    )


def exact_avg(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum / count, divided in
    double. NaN input raises (see :func:`dsum`) — unguarded, the sum
    would skip the NaN while COUNT still counted its row."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_nan_guarded(c).cast("decimal(38,6)")).cast("double")
        / F.count(c)
    ).alias(alias)


def dsum_dec(col: Column | str, alias: str) -> Column:
    """:func:`dsum` WITHOUT the final double cast: the exact
    DECIMAL(38,6) sum itself, for consumers that feed the total into
    FURTHER exact arithmetic (a window re-sum, a share ratio). Casting
    dsum's double back to decimal re-rounds through the measured
    Spark-vs-DuckDB double→decimal divergence (shortest-repr HALF_UP
    vs exact-binary-expansion — see the profiler's VARCHAR route)
    once the value outgrows double's 2^53 integer range at scale 6
    (~9e9); keeping the decimal end-to-end never rounds at all
    (r16 review)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(_nan_guarded(col).cast("decimal(38,6)")).alias(alias)


def dec_to_double_sql(expr: str) -> str:
    """DuckDB decimal→double rendered through VARCHAR: DuckDB's
    direct ``CAST(DECIMAL AS DOUBLE)`` divides the scaled int128 by
    10^scale in floating point, which stops being correctly rounded
    once the scaled integer exceeds 2^53 (measured:
    13048441520.911087 → ...089) — while Spark's decimal→double IS
    correctly rounded at any magnitude. The VARCHAR round-trip
    (exact digits, then a correctly-rounded strtod) restores IEEE
    agreement; per GROUP, so the cost is nil (r16 review).

    VARCHAR(64), not bare VARCHAR: some registry queries execute
    dsum_sql output as SPARK SQL too, and Spark's parser requires a
    length (64 > any DECIMAL(38,6) rendering; DuckDB ignores it).
    The round-trip is a no-op on Spark — exact digits re-parsed
    correctly rounded — so one string serves both dialects."""
    return f"CAST(CAST({expr} AS VARCHAR(64)) AS DOUBLE)"


def dsum_sql(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    sum_expr = f"SUM(CAST({expr} AS DECIMAL(38,6)))"
    return f"{dec_to_double_sql(sum_expr)} AS {alias}"


def dsum_dec_sql(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dsum_dec`."""
    return f"SUM(CAST({expr} AS DECIMAL(38,6))) AS {alias}"


def exact_avg_sql(expr: str, alias: str) -> str:
    sum_expr = f"SUM(CAST({expr} AS DECIMAL(38,6)))"
    return f"{dec_to_double_sql(sum_expr)} / COUNT({expr}) AS {alias}"
