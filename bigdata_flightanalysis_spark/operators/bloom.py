"""Bloom-filter pre-join pruning, expressed as pure DataFrame ops.

The 100 TB idiom: before shuffling a huge fact table into a join,
probe a compact Bloom filter built from the (filtered) key side and
drop rows that definitely cannot match. Spark applies this internally
(runtime row-level bloom pruning), but the expression aggregate
(``bloom_filter_agg`` / ``might_contain``) is not SQL-registered in
the installed PySpark 4.1, so the engine builds the same structure
declaratively:

- the filter is a BITMAP relation of at most ``m_bits / 64`` rows
  ``(word_idx: long, word: long)`` — built with one hash + one
  ``bit_or`` aggregation over the build side. Its size is CONSTANT in
  the data volume (fixed ``m_bits``), so at any scale it broadcasts.
- membership is ``k`` broadcast hash joins of the probe side against
  that bitmap (one per hash function), each checking the probed bit.
  No explode of the probe side, no Python, no collect — every step is
  codegen'd JVM expressions, and Catalyst keeps filter/pushdown
  around it.

False positives pass the filter (by design — the caller re-verifies
with the exact join); false negatives cannot happen, which is what
makes definite-miss routing (``mode='miss'``) exact.

Reference: the classic Bloom (1970) two-sided trade; sizing follows
k*n/m << 1 for a low false-positive rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default bitmap width: 2^17 bits = 16 KiB = at most 2048 bitmap rows.
DEFAULT_M_BITS = 1 << 17


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """k bit positions for a key — xxhash64 with per-hash salt, folded
    into [0, m_bits). ``pmod`` keeps positions non-negative.

    The key is canonicalized to STRING before hashing: xxhash64 is
    dtype-sensitive (int 5 and bigint 5 hash differently), so if the
    build and probe key columns ever carried different Spark types the
    hashes would silently diverge — producing false NEGATIVES, which
    breaks the exactness guarantee ``mode='miss'`` relies on. The
    string cast is exact for integral/string keys and makes the filter
    type-agnostic at the cost of a slightly slower (still codegen'd)
    hash."""
    return [
        F.pmod(F.xxhash64(key.cast("string"), F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(
    build: DataFrame, key: str, *, k: int = 2, m_bits: int = DEFAULT_M_BITS
) -> DataFrame:
    """Aggregate the build side's keys into a bitmap relation
    ``(word_idx, word)``. One shuffle of at most ``m_bits/64`` groups —
    the partial (map-side) ``bit_or`` does nearly all the work, so the
    shuffle payload is bounded by the bitmap size regardless of build
    cardinality."""
    pos = F.explode(F.array(*_positions(F.col(key), k, m_bits))).alias("pos")
    return (
        build.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # shiftleft's numBits must be a column here, so the SQL form
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        # stamp the build parameters onto the relation: probing with a
        # DIFFERENT (k, m_bits) computes bit positions the build never
        # set — false NEGATIVES, silently breaking mode='miss''s
        # exactness. bloom_prune verifies the stamp at execution time.
        .withColumn("__bloom_k", F.lit(k))
        .withColumn("__bloom_m", F.lit(m_bits))
    )


def bloom_prune(
    probe: DataFrame,
    key: str,
    bitmap: DataFrame,
    *,
    k: int = 2,
    m_bits: int = DEFAULT_M_BITS,
    mode: str = "maybe",
) -> DataFrame:
    """Route probe rows through the Bloom filter.

    ``mode='maybe'``  → rows that MIGHT match (all k bits set): the
    pruned input to an exact join; false positives are culled there.
    ``mode='miss'``   → rows that DEFINITELY don't match (some bit
    unset): exact by the no-false-negative property — the fast path of
    an anti join.

    Implemented as ``k`` broadcast LEFT joins against the bitmap (the
    bitmap is ≤ 16 KiB — always broadcastable) plus a bit test; probe
    columns pass through untouched.
    """
    if mode not in ("maybe", "miss"):
        raise ValueError(f"mode must be 'maybe' or 'miss', got {mode!r}")
    reserved = [c for c in probe.columns if c.startswith("__bloom_")]
    if reserved:
        # withColumn/drop below would silently clobber then remove them
        raise ValueError(
            f"probe carries reserved __bloom_* columns: {reserved}"
        )
    # a bloom_build bitmap carries its (k, m_bits) stamp; verify it at
    # execution time (assert_true folds into the row expressions — no
    # extra job, stays lazy) so a parameter mismatch fails loudly
    # instead of producing silent false negatives. Un-stamped legacy
    # bitmaps skip the check. The stamp is distilled to a ONE-ROW
    # aggregate cross-joined (broadcast) onto the probe so EVERY probe
    # row witnesses the parameters — carrying the stamp on the
    # first-hash word join left rows whose word_idx missed the sparse
    # bitmap un-witnessed, and exactly those rows are the definite
    # misses mode='miss' emits (r15 driver ADVICE).
    stamped = {"__bloom_k", "__bloom_m"}.issubset(set(bitmap.columns))
    out = probe
    hit = F.lit(True)
    if stamped:
        stamp = bitmap.groupBy().agg(
            F.max("__bloom_k").alias("__bloom_stamp_k"),
            F.max("__bloom_m").alias("__bloom_stamp_m"),
        )
        out = out.crossJoin(F.broadcast(stamp))
        # an EMPTY bitmap aggregates to one all-NULL stamp row: there
        # are no set bits, so no parameterization can produce a false
        # negative — NULL validates as true
        ok = F.coalesce(
            (F.col("__bloom_stamp_k") == F.lit(k))
            & (F.col("__bloom_stamp_m") == F.lit(m_bits)),
            F.lit(True),
        )
        hit = hit & F.isnull(
            F.assert_true(
                ok,
                F.lit(
                    f"bloom_prune(k={k}, m_bits={m_bits}) does not "
                    "match this bitmap's bloom_build parameters — "
                    "a mismatch produces false negatives"
                ),
            )
        )
    for i, pos in enumerate(_positions(F.col(key), k, m_bits)):
        w = f"__bloom_w{i}"
        b = bitmap.select(
            F.col("word_idx").alias(f"{w}_idx"), F.col("word").alias(w)
        )
        out = (
            out.withColumn(f"{w}_pos", pos)
            .withColumn(f"{w}_probe_idx", (F.col(f"{w}_pos") / 64).cast("long"))
            .join(
                F.broadcast(b),
                F.col(f"{w}_probe_idx") == F.col(f"{w}_idx"),
                "left",
            )
        )
        bit = F.expr(f"shiftleft(cast(1 as bigint), cast({w}_pos % 64 as int))")
        hit = hit & F.coalesce(
            F.col(w).bitwiseAND(bit) != F.lit(0), F.lit(False)
        )
    out = out.filter(hit if mode == "maybe" else ~hit)
    drop = [c for c in out.columns if c.startswith("__bloom_")]
    return out.drop(*drop)
