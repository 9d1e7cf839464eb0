"""Bloom pre-join pruning operator (operators/bloom.py).

Property checks: the maybe/miss routing is an exact partition of the
probe side, false negatives are impossible (every true match routes to
'maybe'), and the membership joins stay broadcast + codegen'd (no
Python in the plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.operators.bloom import bloom_build, bloom_prune
from bigdata_flightanalysis_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def _sides(spark):
    orders = read_table(spark, SF_DIR, "orders")
    returned = (
        read_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return orders, returned


def test_maybe_miss_partition_the_probe(spark):
    orders, returned = _sides(spark)
    bitmap = bloom_build(returned, "l_orderkey")
    n_all = orders.count()
    maybe = bloom_prune(orders, "o_orderkey", bitmap, mode="maybe")
    miss = bloom_prune(orders, "o_orderkey", bitmap, mode="miss")
    n_maybe, n_miss = maybe.count(), miss.count()
    assert n_maybe + n_miss == n_all
    assert maybe.columns == orders.columns
    assert miss.columns == orders.columns
    # The filter must actually prune at this selectivity (returned
    # keys cover ~half the orders; FP rate at k=2, m=2^17 is <1%).
    assert n_miss > 0


def test_no_false_negatives(spark):
    """Every order that truly has a returned lineitem must survive the
    'maybe' route — a bloom can false-positive, never false-negative."""
    orders, returned = _sides(spark)
    bitmap = bloom_build(returned, "l_orderkey")
    true_match = orders.join(
        returned, orders["o_orderkey"] == returned["l_orderkey"], "left_semi"
    )
    maybe = bloom_prune(orders, "o_orderkey", bitmap, mode="maybe")
    escaped = true_match.join(
        maybe.select("o_orderkey").withColumnRenamed("o_orderkey", "mk"),
        F.col("o_orderkey") == F.col("mk"),
        "left_anti",
    )
    assert escaped.count() == 0


def test_miss_rows_truly_have_no_match(spark):
    orders, returned = _sides(spark)
    bitmap = bloom_build(returned, "l_orderkey")
    miss = bloom_prune(orders, "o_orderkey", bitmap, mode="miss")
    wrong = miss.join(
        returned, miss["o_orderkey"] == returned["l_orderkey"], "left_semi"
    )
    assert wrong.count() == 0


def test_bitmap_is_bounded_and_plan_is_jvm_only(spark):
    orders, returned = _sides(spark)
    bitmap = bloom_build(returned, "l_orderkey", m_bits=1 << 17)
    assert bitmap.count() <= (1 << 17) // 64
    plan = bloom_prune(
        orders, "o_orderkey", bitmap
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_bloom_prune_rejects_mismatched_build_parameters(spark):
    """The bitmap carries its (k, m_bits) stamp; probing with different
    parameters computes bit positions the build never set — false
    NEGATIVES that silently break mode='miss' exactness (r15 review).
    The stamp check is folded into the row expressions (assert_true),
    so the mismatch fails loudly at execution."""
    import pytest

    from bigdata_flightanalysis_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    build = spark.range(100).select(F.col("id").alias("k"))
    probe = spark.range(200).select(F.col("id").alias("k"))
    bitmap = bloom_build(build, "k", k=2)
    # matching parameters: exact no-false-negative routing holds
    misses = bloom_prune(probe, "k", bitmap, k=2, mode="miss")
    assert misses.filter(F.col("k") < 100).count() == 0
    # stamp columns never leak into the output
    assert set(misses.columns) == {"k"}
    with pytest.raises(Exception, match="does not match"):
        bloom_prune(probe, "k", bitmap, k=3, mode="miss").count()


def test_bloom_prune_rejects_reserved_probe_columns(spark):
    import pytest

    from bigdata_flightanalysis_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    build = spark.range(10).select(F.col("id").alias("k"))
    probe = spark.range(10).select(
        F.col("id").alias("k"), F.lit(1).alias("__bloom_w0")
    )
    with pytest.raises(ValueError, match="reserved"):
        bloom_prune(probe, "k", bloom_build(build, "k"))


def test_bloom_prune_mismatch_caught_even_for_sparse_misses(spark):
    """With a mismatched m_bits, a probe row whose computed word_idx is
    ABSENT from the sparse bitmap used to get NULL stamps, validate as
    true, and be silently emitted as a definite miss in mode='miss' —
    exactly the rows the no-false-negative guarantee covers (r15 driver
    ADVICE). The stamp is now a one-row broadcast witnessed by EVERY
    probe row, so the mismatch raises regardless of which words join."""
    import pytest

    from bigdata_flightanalysis_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    build = spark.range(8).select(F.col("id").alias("k"))
    probe = spark.range(4096).select(F.col("id").alias("k"))
    # 8 keys over 2^17 bits → at most 16 occupied words of 2048: almost
    # every probe row's first-hash word misses the bitmap entirely
    bitmap = bloom_build(build, "k", k=2, m_bits=1 << 17)
    with pytest.raises(Exception, match="does not match"):
        bloom_prune(probe, "k", bitmap, k=2, m_bits=1 << 16, mode="miss").count()


def test_bloom_prune_empty_bitmap_is_not_a_mismatch(spark):
    """An EMPTY build side aggregates to an all-NULL stamp row; there
    are no set bits so no parameterization can yield a false negative —
    the witness must validate instead of raising, and mode='miss' must
    route every probe row as a definite miss."""
    from bigdata_flightanalysis_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    build = spark.range(10).filter("id < 0").select(F.col("id").alias("k"))
    probe = spark.range(50).select(F.col("id").alias("k"))
    bitmap = bloom_build(build, "k", k=2)
    assert bloom_prune(probe, "k", bitmap, k=3, mode="miss").count() == 50
