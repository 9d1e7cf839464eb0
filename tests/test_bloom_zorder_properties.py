"""Property-based checks (hypothesis) for the round-5 scale operators:

- Bloom filter: NO FALSE NEGATIVES for any build/probe key sets — the
  property every downstream exactness argument rests on.
- Z-order interleave: injective on bucket tuples and monotone along
  each axis with the other fixed — the properties that make the
  z-value a valid clustering key (distinct buckets never collide; a
  range predicate on one column maps to bounded z-ranges).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.operators.bloom import bloom_build, bloom_prune

keysets = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=60
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(build_keys=keysets, probe_keys=keysets)
def test_bloom_never_false_negative(spark, build_keys, probe_keys):
    build = spark.createDataFrame([(k,) for k in set(build_keys)], "k: long")
    probe = spark.createDataFrame([(k,) for k in set(probe_keys)], "k: long")
    bitmap = bloom_build(build, "k", m_bits=1 << 12)
    maybe = {
        r["k"] for r in bloom_prune(probe, "k", bitmap, m_bits=1 << 12).collect()
    }
    true_members = set(probe_keys) & set(build_keys)
    assert true_members <= maybe  # misses can only be non-members


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=2,
        max_size=40,
        unique=True,
    )
)
def test_zorder_interleave_injective_and_axis_monotone(spark, pairs):
    from bigdata_flightanalysis_spark.operators.layout import _interleave

    df = spark.createDataFrame(pairs, "a: long, b: long")
    rows = df.select(
        "a", "b", _interleave([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    zmap = {(r["a"], r["b"]): r["z"] for r in rows}
    assert len(set(zmap.values())) == len(zmap)  # injective
    by_b: dict[int, list[tuple[int, int]]] = {}
    by_a: dict[int, list[tuple[int, int]]] = {}
    for (a, b), z in zmap.items():
        by_b.setdefault(b, []).append((a, z))
        by_a.setdefault(a, []).append((b, z))
    for groups in (by_b, by_a):
        for items in groups.values():
            items.sort()
            zs = [z for _coord, z in items]
            assert zs == sorted(zs)  # monotone along the free axis
