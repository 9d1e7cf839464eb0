"""Generic single-pass table profiler (the Deequ/Glue-crawler-style
column-statistics operator): one long-format row per column with row
count, null count, distinct count, and stringified min/max.

Shape at scale: ONE aggregate over the table. With ``approx=True``
(the 100 TB default) distinct counts are HyperLogLog partial
aggregates, so the whole profile is a single map-side-combined pass —
no Expand, no per-column scans. ``approx=False`` uses exact
``count_distinct``; Catalyst rewrites N distinct aggregates into an
Expand (N rows per input row), which is exact but multiplies the
shuffled bytes by the column count — fine for dimension-sized tables,
the documented trade-off for fact tables.

Min/max are STRINGIFIED with engine-portable renderings (doubles via
DECIMAL(38,6), timestamps via a fixed format) so a profile can be
compared across engines / persisted as a schema-stable artifact no
matter the profiled column types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _render(expr: F.Column, dt: T.DataType) -> F.Column:
    """Stringify an aggregated min/max scalar. Doubles render through
    DECIMAL(38,6) via try_cast: NaN / ±Infinity / |x| ≥ 1e32 would
    THROW under Spark 4's default ANSI mode if cast unconditionally
    (and silently NULL out of min/max in non-ANSI) — such values fall
    back to their plain string rendering instead.

    Portable-rendering semantics (fuzz-pinned, see
    tests/test_text_differential_fuzz.py): Spark's double→decimal cast
    converts the double's SHORTEST decimal representation
    (Double.toString) and rounds HALF_UP at 6 fractional digits. A
    decimal cast of the EXACT binary value (DuckDB's native behavior)
    differs once ULP ≥ 1e-6 (|x| ≳ 2^53·1e-6 ≈ 9e9) or at
    precision-edge doubles like 1234567.1234565 — so the DuckDB oracle
    twins must route through VARCHAR (``TRY_CAST(CAST(x AS VARCHAR) AS
    DECIMAL(38,6))``), which reproduces the shortest-repr + HALF_UP
    semantics exactly (measured; the one exclusion is DuckDB's
    text→decimal mis-round on magnitudes below ~1e-300, e.g. '9e-308'
    → 0.000001 — far outside any renderable data domain)."""
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return F.coalesce(
            expr.try_cast("decimal(38,6)").cast("string"), expr.cast("string")
        )
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # NTZ included: a plain string cast would keep fractional
        # seconds and break the fixed-format portability contract
        return F.date_format(expr, _TS_FMT)
    return expr.cast("string")


def _qcol(c: str) -> F.Column:
    """Column ref by EXACT name (``util.qident`` quoting rule)."""
    from bigdata_flightanalysis_spark.util import qident

    return F.col(qident(c))


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = True,
    rsd: float | None = None,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one aggregate
    pass; returns (col_name, n_rows, n_nulls, n_distinct, min_value,
    max_value) with one row per profiled column.

    ``rsd`` (approx mode only) sets the HLL relative standard
    deviation — default 0.05 like Spark's; the driver-facing bounds
    contract (``orders_profile_approx``) uses 0.01 so its ±5 % check
    sits at 5 sigma. Passing ``rsd`` with ``approx=False`` raises:
    silently ignoring it would mask a caller that believes it is
    running a tightened approx profile while actually paying the
    exact Expand-based pass."""
    if rsd is not None and not approx:
        raise ValueError(
            "rsd only applies to approx=True profiles; "
            "exact count_distinct has no precision knob"
        )
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    nd_aggs = []
    # Synthetic aliases are keyed by column INDEX, not name: the label
    # string carries the (escaped) real name, so nothing is lost, and
    # a source column containing a backtick — or literally named like
    # a synthetic alias (`__min_x`) — can neither break the generated
    # expr nor silently collide with it.
    for i, c in enumerate(cols):
        dt = df.schema[c].dataType
        # data access goes through _qcol (exact-name, backtick-quoted):
        # a bare F.col('a.b') parses the dot as struct-field access and
        # dies in analysis before the hardened stack expr is built
        col = _qcol(c)
        # min/max run on the NATIVE column (doubles keep NaN/Inf
        # ordering semantics); only the resulting scalar is rendered
        mn = _render(F.min(col), dt)
        mx = _render(F.max(col), dt)
        if approx:
            nd = (
                F.approx_count_distinct(col, rsd)
                if rsd is not None
                else F.approx_count_distinct(col)
            )
        else:
            nd = F.count_distinct(col)
        nd_aggs.append(nd.cast("bigint").alias(f"__nd_{i}"))
        aggs += [
            # count(when(...)) not sum(cast): SUM over a zero-row table
            # is NULL, and a schema-stable profile artifact needs 0
            F.count(F.when(col.isNull(), 1)).cast("bigint").alias(f"__nulls_{i}"),
            mn.cast("string").alias(f"__min_{i}"),
            mx.cast("string").alias(f"__max_{i}"),
        ]
    if approx:
        # HLL partials compose with the scalar aggregates in one flat
        # map-side-combined pass — the 100 TB shape, unchanged.
        wide = df.agg(*aggs, *nd_aggs)
    else:
        # Exact mode: the N count_distincts and the scalar aggregates
        # run as TWO subtrees crossJoined (both 1-row global
        # aggregates; Spark executes their stages concurrently inside
        # the one action). Fusing them was the expensive shape: the
        # multi-distinct Expand makes the PARTIAL aggregate's groups
        # (gid, distinct-value) pairs, and every such group's buffer
        # then carries all 3N+1 scalar aggregate slots too — measured
        # at sf0.1 the split is 3.3x faster (6.5s -> 2.0s median,
        # noop-sink, guide §1.4) with identical output, because the
        # Expand side now shuffles (gid, value, count) only and the
        # scalar side never expands at all (guide §2.3: shuffle fewer
        # bytes). Same decomposition instinct as the documented
        # exact+HLL pitfall below, applied within exact mode.
        wide = df.agg(*aggs).crossJoin(df.agg(*nd_aggs))

    # labels escaped so source column names can't break the expr: the
    # Spark SQL parser processes BACKSLASH escapes inside string
    # literals by default (a trailing \ would swallow the closing
    # quote), so backslashes double first, then quotes; the generated
    # references are index-keyed (see above)
    def _lit(c: str) -> str:
        return "'" + c.replace("\\", "\\\\").replace("'", "''") + "'"

    stack_args = ", ".join(
        f"{_lit(c)}, `__nulls_{i}`, `__nd_{i}`, `__min_{i}`, `__max_{i}`"
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n_rows").cast("bigint").alias("n_rows"),
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


# MEASURED PITFALL — do NOT fuse exact count_distinct and a
# high-precision approx_count_distinct into one aggregate: Catalyst's
# Expand rewrite for multi-distinct aggregates makes the PARTIAL
# aggregate's groups (gid, distinct-value) pairs, and every group's
# buffer allocates slots for ALL aggregates — including an initialized
# dense HLL++ sketch (~16 KB at rsd=0.01) per non-distinct aggregate.
# At sf0.1 that is ~450k groups x 6 sketches ≈ tens of GB of buffers:
# a fused formulation verified green at sf0.01 and OOMed a default
# heap at sf0.1. The bounds contract (`orders_profile_approx`)
# therefore deliberately runs TWO single-mode profile passes joined on
# col_name — each pass has a sane memory profile (exact: Expand with
# scalar buffers; approx: one flat pass, no Expand).
