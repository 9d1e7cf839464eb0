"""Funnel ordering semantics (crafted fixtures) and deterministic
split invariance (repartition-independence — the property random
sampling lacks)."""

from __future__ import annotations

from datetime import datetime


from bigdata_flightanalysis_spark.queries.events import funnel_stages
from bigdata_flightanalysis_spark.queries.sampling import (
    TRAIN_HEX_LT,
    hash_bucket_hex,
)

SF001 = "/root/testdata/sf0.01"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, 1, 0, 0, s)) for u, t, s in rows],
        "user_id bigint, event_type string, ts timestamp",
    )


def test_funnel_requires_stage_order(spark):
    rows = [
        # u1: full ordered funnel
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        # u2: purchase BEFORE click — must not count as converted
        (2, "view", 1), (2, "purchase", 2), (2, "click", 3),
        # u3: click before any view — click must not count
        (3, "click", 1), (3, "view", 2),
        # u4: no view at all
        (4, "purchase", 1),
    ]
    got = {
        r["user_id"]: (
            r["first_view"] is not None,
            r["first_click"] is not None,
            r["first_purchase"] is not None,
        )
        for r in funnel_stages(_ev(spark, rows)).collect()
    }
    assert got == {
        1: (True, True, True),
        2: (True, True, False),
        3: (True, False, False),
        4: (False, False, False),
    }


def test_funnel_same_timestamp_counts(spark):
    # at-or-after: click at the same second as the view qualifies
    rows = [(1, "view", 5), (1, "click", 5), (1, "purchase", 5)]
    r = funnel_stages(_ev(spark, rows)).first()
    assert r["first_click"] is not None and r["first_purchase"] is not None


def test_funnel_single_wide_shuffle(spark):
    ev = _ev(spark, [(1, "view", 1), (2, "click", 2)])
    plan = (
        funnel_stages(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all three windows + the per-user agg ride ONE hashpartitioning
    assert plan.count("Exchange hashpartitioning") == 1


def test_split_is_repartition_invariant(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet").select("doc_id")
    bucket = hash_bucket_hex("doc_id")
    a = {
        r["doc_id"]: r["b"]
        for r in docs.repartition(3).select("doc_id", bucket.alias("b")).collect()
    }
    b = {
        r["doc_id"]: r["b"]
        for r in docs.repartition(17, "doc_id")
        .select("doc_id", bucket.alias("b"))
        .collect()
    }
    assert a == b
    frac = sum(1 for v in a.values() if v < TRAIN_HEX_LT) / len(a)
    assert 0.82 < frac < 0.97  # ≈0.898 target, 500-doc sample noise


def test_temperature_mixture_flattens_lang_shares(spark):
    """α=0.5 mixing must move every language's share TOWARD uniform:
    the dominant language's share strictly drops, under-represented
    languages are kept in full (keep_p capped at 1), and no language
    disappears."""
    from bigdata_flightanalysis_spark.queries.catalog import load_all

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    before = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept = load_all()["doc_temperature_mixture_sample"].fn(spark, SF001).collect()
    after: dict[str, int] = {}
    for r in kept:
        after[r["lang"]] = after.get(r["lang"], 0) + 1
    nb, na = sum(before.values()), len(kept)
    assert set(after) == set(before)  # nothing vanishes
    dom = max(before, key=lambda k: before[k])
    small = min(before, key=lambda k: before[k])
    assert after[dom] / na < before[dom] / nb  # dominant flattened
    assert after[small] == before[small]  # minority fully kept (cap=1)


def test_split_leakage_flags_are_consistent_with_split_query(spark):
    from bigdata_flightanalysis_spark.queries.catalog import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.01"
    split = {
        r["doc_id"]: r["split"]
        for r in reg["doc_train_test_split"].fn(spark, sf).collect()
    }
    rows = reg["doc_split_leakage_check"].fn(spark, sf).collect()
    assert rows, "LSH should find candidate pairs at sf0.01"
    for r in rows:
        assert r["split_a"] == split[r["doc_a"]]
        assert r["split_b"] == split[r["doc_b"]]
        assert r["leaks"] == (r["split_a"] != r["split_b"])
    # at a ~90/10 split some pairs straddle; both flag values occur
    assert {r["leaks"] for r in rows} == {True, False}


def test_es_weighted_sample_matches_python_and_biases_to_weight(spark):
    """Third engine: recompute the Efraimidis–Spirakis selection with
    u^(1/w) keys in pure Python and compare the selected id set; then
    confirm the sample is weight-biased (mean weight above corpus
    mean — the property Bernoulli-per-row sampling shares but uniform
    reservoirs lack)."""
    import hashlib

    from bigdata_flightanalysis_spark.queries.catalog import load_all
    from bigdata_flightanalysis_spark.queries.sampling import (
        ES_SAMPLE_K,
        ES_SEED,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()

    def u_of(doc_id: int) -> float:
        h = int(hashlib.md5(f"{ES_SEED}|{doc_id}".encode()).hexdigest()[:15], 16)
        return (h + 1) / float(1 << 60)

    # paper's key u^(1/w); ranking must equal the engine's ln(u)/w
    scored = sorted(
        ((u_of(r["doc_id"]) ** (1.0 / r["n_chars"]), r["doc_id"], r["n_chars"])
         for r in docs),
        key=lambda t: (-t[0], t[1]),
    )
    expect_ids = [d for _, d, _ in scored[:ES_SAMPLE_K]]

    out = load_all()["doc_weighted_sample_es"].fn(spark, sf).collect()
    assert [r["doc_id"] for r in out] == expect_ids

    corpus_mean = sum(r["n_chars"] for r in docs) / len(docs)
    sample_mean = sum(r["weight"] for r in out) / len(out)
    assert sample_mean > corpus_mean
