"""salted_join / salted_aggregate must be result-identical to their
plain forms — only the shuffle placement differs."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def _skewed_df(spark):
    # 900 rows on one hot key, a few on others
    rows = [(i, "hot", float(i)) for i in range(900)]
    rows += [(1000 + i, k, float(i)) for i, k in enumerate(["a", "b", "c"] * 5)]
    return spark.createDataFrame(rows, "id int, k string, v double")


def _dim_df(spark):
    return spark.createDataFrame(
        [("hot", 1), ("a", 2), ("b", 3), ("z", 9)], "k string, attr int"
    )


def test_salted_join_equals_plain_inner(spark):
    skewed, dim = _skewed_df(spark), _dim_df(spark)
    plain = skewed.join(dim, "k").select("id", "k", "attr")
    salted = salted_join(skewed, dim, "k", n_salts=4).select("id", "k", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left(spark):
    skewed, dim = _skewed_df(spark), _dim_df(spark)
    plain = skewed.join(dim, "k", "left").select("id", "k", "attr")
    salted = salted_join(skewed, dim, "k", n_salts=4, how="left").select(
        "id", "k", "attr"
    )
    assert sorted(map(tuple, plain.collect()), key=repr) == sorted(
        map(tuple, salted.collect()), key=repr
    )


def test_salted_join_rejects_other_preserving_modes(spark):
    """right/full outer would emit each unmatched replicated `other`
    row n_salts times — the operator must refuse, not silently
    corrupt."""
    import pytest

    skewed, dim = _skewed_df(spark), _dim_df(spark)
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(skewed, dim, "k", n_salts=4, how=how)


def test_salted_aggregate_equals_plain(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("total"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    salted = salted_aggregate(
        df,
        "k",
        {"n": "count:*", "total": "sum:v", "lo": "min:v", "hi": "max:v"},
        n_salts=4,
    )
    cols = ["k", "n", "total", "lo", "hi"]
    assert sorted(tuple(r[c] for c in cols) for r in plain.collect()) == sorted(
        tuple(r[c] for c in cols) for r in salted.collect()
    )


def test_salt_spreads_hot_key(spark):
    df = _skewed_df(spark)
    from bigdata_flightanalysis_spark.operators.skew import _salt_col

    n = (
        df.withColumn("__salt", _salt_col(df, 4, ["k"]))
        .filter(F.col("k") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert n == 4  # the hot key really lands on all salt partitions


def test_blocked_self_pairs_identical_to_plain(spark):
    """Triangular blocking must produce EXACTLY the plain bucket
    self-join's pair set, for any block count — including on a
    synthetic hot bucket (500 rows in one bucket ⇒ ~125k pairs)."""
    from bigdata_flightanalysis_spark.operators.skew import blocked_self_pairs

    rows = [(i, "hot" if i < 500 else f"cold{i % 7}", float(i)) for i in range(600)]
    df = spark.createDataFrame(rows, "id bigint, bucket string, v double")

    def pairs(n_blocks):
        out = blocked_self_pairs(df, "bucket", "id", n_blocks=n_blocks)
        return sorted(
            (r["a"]["id"], r["b"]["id"]) for r in out.collect()
        )

    plain = pairs(1)
    assert len(plain) == 500 * 499 // 2 + sum(
        n * (n - 1) // 2
        for n in [len([i for i in range(500, 600) if i % 7 == k]) for k in range(7)]
    )
    assert pairs(4) == plain
    assert pairs(8) == plain


def test_blocked_self_pairs_spreads_hot_bucket(spark):
    """The point of blocking: the hot bucket's pair work lands on
    S(S+1)/2 distinct (i,j) reducer keys, not one."""
    from bigdata_flightanalysis_spark.operators.skew import blocked_self_pairs
    from pyspark.sql import functions as F2

    rows = [(i, "hot", float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, bucket string, v double")
    out = blocked_self_pairs(df, "bucket", "id", n_blocks=4)
    keys = (
        out.select(
            F2.pmod(F2.hash("a.id"), F2.lit(4)).alias("sa"),
            F2.pmod(F2.hash("b.id"), F2.lit(4)).alias("sb"),
        )
        .select(F2.least("sa", "sb").alias("i"), F2.greatest("sa", "sb").alias("j"))
        .distinct()
        .count()
    )
    assert keys == 4 * 5 // 2  # all 10 unordered block pairs carry work


def test_embed_near_dup_pairs_blocked_matches_default(spark):
    """The registry query's output must not depend on the blocking
    switch (the 100 TB path is result-identical to the test-SF path)."""
    from bigdata_flightanalysis_spark.queries.similarity import (
        embed_near_dup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    base = embed_near_dup_pairs(spark, sf).collect()
    blocked = embed_near_dup_pairs(spark, sf, n_blocks=8).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, blocked))


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's skew-join handling — the runtime complement to the manual
    salting operators: a hot key's shuffle partition is split into
    multiple tasks (right side replicated), visible in the final
    adaptive plan. This is the zero-code path we rely on at 100 TB for
    skew we did NOT predict; salting remains for skew we did."""
    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.rand(42).alias("v"),
        )
        right = spark.range(0, 5_000).select(
            F.col("id").alias("k"), F.lit(1.0).alias("w")
        )
        j = left.join(right, "k").select(F.lit(1).alias("one"))
        j.collect()  # executes THIS plan, finalizing the adaptive one
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead marks the split side
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_salting_key_only_frame_raises(spark):
    """A frame whose every column is a key cannot be salted (content
    hash is per-key constant — hot keys would NOT spread while the
    other side still pays n_salts replication). Fail loud (r14
    review), don't silently degenerate."""
    import pytest

    keys_only = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    with pytest.raises(ValueError, match="non-key content"):
        salted_join(keys_only, dim, "k")
    with pytest.raises(ValueError, match="non-key content"):
        salted_aggregate(keys_only, "k", {"n": "count:*"})


def test_reserved_column_names_fail_loud(spark):
    """Inputs already carrying the operators' internal names used to be
    silently clobbered (the __salt became part of the join key, then
    the final drop deleted the caller's column) — now a loud error
    (r15 review)."""
    import pytest

    from bigdata_flightanalysis_spark.operators.skew import (
        blocked_self_pairs,
        salted_aggregate,
        salted_join,
    )

    left = spark.range(10).select(
        F.col("id").alias("k"), F.lit(0).alias("__salt"), F.lit(1).alias("v")
    )
    right = spark.range(10).select(F.col("id").alias("k"), F.lit(2).alias("w"))
    with pytest.raises(ValueError, match="__salt"):
        salted_join(left, right, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(right, left, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_aggregate(left, "k", {"n": "count:*"})
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("bkt"), F.lit(1).alias("__s")
    )
    with pytest.raises(ValueError, match="__s"):
        blocked_self_pairs(docs, "bkt", "doc_id", n_blocks=4)


def test_blocked_self_pairs_guards_all_claimed_names(spark):
    """The n_blocks>1 path also claims 'r', '__sa' and '__sb' as
    top-level names — a bucket column named one of those produced
    duplicate columns and an ambiguous-reference AnalysisException
    downstream instead of the named rename-first error (r16 review)."""
    import pytest

    from bigdata_flightanalysis_spark.operators.skew import blocked_self_pairs

    for bad in ("r", "__sa", "__sb"):
        docs = spark.range(10).select(
            F.col("id").alias("doc_id"), F.lit(0).alias(bad)
        )
        with pytest.raises(ValueError, match="blocked_self_pairs"):
            blocked_self_pairs(docs, bad, "doc_id", n_blocks=4)
