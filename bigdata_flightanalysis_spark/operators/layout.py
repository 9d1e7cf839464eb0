"""Multi-dimensional data layout: Z-order clustering.

A 100 TB table is usually filtered on more than one column
(ship-date AND part, user AND time). A 1-D sort makes min/max file
statistics razor-sharp for ONE column and useless for the rest;
Z-ordering interleaves the bits of several columns' bucket ranks into
a single clustering key so that EVERY participating column gets
moderately-narrow per-file ranges — the property parquet row-group /
file skipping needs to prune scans on any of them.

Everything is pure column expressions:
- per-column buckets come from ``width_bucket`` over the column's
  global min/max (one tiny aggregate, joined back via a broadcast of
  the 1-row stats frame — no driver collect);
- the z-value interleaves the bucket bits with shift/or expressions
  (codegen'd, no Python);
- the layout step is ``repartitionByRange(z)`` +
  ``sortWithinPartitions(z)`` — exactly what a writer needs for
  min/max-tight files at any scale (range exchange is one shuffle,
  AQE-coalesced).

Used by tests to demonstrate the skipping effect; at deployment the
result is written with ``write.parquet`` and the narrow per-file
ranges do the pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

#: bits per dimension (8 → 256 buckets per column; z fits in a signed
#: long for up to 7 dimensions at this width — d*bits must stay ≤ 63).
ZORDER_BITS = 8


def _qcol(c: str) -> Column:
    """Column ref by EXACT name (``util.qident`` quoting rule)."""
    from bigdata_flightanalysis_spark.util import qident

    return F.col(qident(c))


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Bit-interleave d bucket values (each < 2^bits) into one long:
    bit i of column j lands at position i*d + j."""
    d = len(bucket_cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(bucket_cols):
        for i in range(bits):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("long"), i * d + j).cast("long")
            )
    return z


def _as_double(df: DataFrame, c: str) -> Column:
    """Monotone double view of a column for bucketing. DATE is not
    castable to DOUBLE in Spark, so it goes through ``unix_date``;
    timestamps (tz and ntz) through ``unix_micros`` — only
    monotonicity matters for equi-width buckets, not the unit.

    Non-finite values (NaN, ±Infinity) become NULL: Spark's min/max
    order NaN greatest, so ONE NaN row would make the bucket range
    [lo, NaN], width_bucket would return NULL for EVERY row, and the
    whole dimension would silently collapse to bucket 0 — no
    clustering, no skipping, no error. With NULL instead, finite rows
    keep full bucket resolution and non-finite rows deterministically
    land in bucket 0."""
    dt = df.schema[c].dataType
    if isinstance(dt, DateType):
        return F.unix_date(_qcol(c)).cast("double")
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.unix_micros(_qcol(c).cast("timestamp")).cast("double")
    v = _qcol(c).cast("double")
    return F.when(~F.isnan(v) & (F.abs(v) != F.lit(float("inf"))), v)


def zorder_value(
    df: DataFrame, cols: list[str], *, bits: int = ZORDER_BITS
) -> DataFrame:
    """Append a ``__z`` column: the Z-order key over ``cols``.

    Buckets are equi-width over each column's global [min, max]
    (numeric/date/timestamp columns; converted to a monotone double
    for bucketing only — dates via ``unix_date``, timestamps via
    ``unix_micros``). The stats frame is ONE row — broadcast-joined,
    so the lineage contains a tiny extra aggregate instead of a driver
    round-trip.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError("z-value exceeds a signed long; lower bits or cols")
    if "__z" in df.columns:
        # withColumn would silently REPLACE the caller's column and
        # zorder_layout's trailing drop would delete it — same
        # reserved-name rule as the __min_*/__max_* hardening below
        # (r16 review)
        raise ValueError("zorder reserves the __z column name")
    # stats aliases are keyed by column INDEX (the profile_table
    # hardening): embedding the raw name would break on names with
    # dots/backticks and could collide with a real __min_* column
    stats = df.agg(
        *[
            m
            for i, c in enumerate(cols)
            for m in (
                F.min(_as_double(df, c)).alias(f"__min_{i}"),
                F.max(_as_double(df, c)).alias(f"__max_{i}"),
            )
        ]
    )
    with_stats = df.join(F.broadcast(stats))
    n_buckets = 1 << bits
    buckets = []
    for i, c in enumerate(cols):
        # reference the stats frame's columns by expression id, not by
        # name: a caller column that happens to be named __min_0 would
        # make the bare name ambiguous after the join
        lo, hi = stats[f"__min_{i}"], stats[f"__max_{i}"]
        # width_bucket returns 1..n+1 on [lo, hi]; clamp the hi edge and
        # degenerate (constant-column) case into the valid 0..n-1 range.
        b = F.width_bucket(_as_double(df, c), lo, hi, F.lit(n_buckets))
        buckets.append(
            F.least(F.greatest(b - 1, F.lit(0)), F.lit(n_buckets - 1))
        )
    return with_stats.withColumn("__z", _interleave(buckets, bits)).drop(
        *[stats[f"__min_{i}"] for i in range(len(cols))],
        *[stats[f"__max_{i}"] for i in range(len(cols))],
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    n_partitions: int | None = None,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Cluster ``df`` for multi-column data skipping: range-partition +
    locally sort by the Z-order key, drop the key. Writing the result
    yields files whose min/max stats are narrow on EVERY ``cols``
    member."""
    z = zorder_value(df, cols, bits=bits)
    if n_partitions:
        z = z.repartitionByRange(n_partitions, "__z")
    else:
        z = z.repartitionByRange("__z")
    return z.sortWithinPartitions("__z").drop("__z")
