"""IVF / quantized ANN invariants.

The registered queries (`embed_ivf_topk`, `embed_quantized_topk`)
emit the recall-contract summary (oracle-checkable booleans); the
detailed neighbor frames come from the `*_frame` helpers. These tests
pin the detail invariants — subset of the ranking universe, exactly k
rows per query, seed determinism, recall floors — plus that the
registered contract rows are all-true.
"""

from __future__ import annotations

from bigdata_flightanalysis_spark.queries.catalog import load_all
from bigdata_flightanalysis_spark.queries.similarity import (
    ivf_topk_frame,
    pq_topk_frame,
    quantized_topk_frame,
)

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_invariants_and_recall(spark):
    r = load_all()
    ivf = ivf_topk_frame(spark, SF)
    rows = ivf.collect()
    by_q = {}
    for row in rows:
        by_q.setdefault(row["query_id"], []).append(row)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, qrows in by_q.items():
        assert len(qrows) == 10
        assert [x["rn"] for x in sorted(qrows, key=lambda x: x["rn"])] == list(
            range(1, 11)
        )
        assert all(x["cosine"] is not None for x in qrows)

    exact = _pairs(r["embed_cosine_topk"].fn(spark, SF))
    got = _pairs(ivf)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


def test_ivf_deterministic(spark):
    a = sorted(map(tuple, ivf_topk_frame(spark, SF).collect()))
    b = sorted(map(tuple, ivf_topk_frame(spark, SF).collect()))
    assert a == b


def test_quantized_topk_recall_vs_exact(spark):
    """int8 candidate generation + float rerank must recover nearly all
    of the exact top-k (8-bit quantization on ~unit vectors loses far
    less ranking signal than the 3x candidate margin covers)."""
    reg = load_all()
    exact = reg["embed_cosine_topk"].fn(spark, SF).collect()
    quant = quantized_topk_frame(spark, SF).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    quant_sets = {}
    for r in quant:
        quant_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(quant_sets) == set(exact_sets)
    hits = sum(
        len(exact_sets[q] & quant_sets[q]) for q in exact_sets
    )
    total = sum(len(v) for v in exact_sets.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_pq_topk_invariants_and_recall(spark):
    """PQ-ADC candidates + float rerank: exactly k rows per query,
    deterministic (seeded sample codebooks + tie-broken windows), and
    recall above the registered contract floor with margin."""
    reg = load_all()
    pq = pq_topk_frame(spark, SF)
    a = sorted(map(tuple, pq.collect()))
    b = sorted(map(tuple, pq_topk_frame(spark, SF).collect()))
    assert a == b  # deterministic end to end
    by_q = {}
    for row in pq.collect():
        by_q.setdefault(row["query_id"], []).append(row)
    assert set(by_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 10 for v in by_q.values())
    exact = _pairs(reg["embed_cosine_topk"].fn(spark, SF))
    got = _pairs(pq)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"PQ recall below contract floor: {recall}"


def test_registered_ann_contract_rows_all_true(spark):
    """The driver-facing queries must emit an all-true contract at
    every test SF (the oracle side is literal TRUE)."""
    reg = load_all()
    for sf in ("/root/testdata/sf0.001", SF):
        for name, flag in (
            ("embed_ivf_topk", "recall_ge_030"),
            ("embed_quantized_topk", "recall_ge_090"),
            ("embed_pq_topk", "recall_ge_050"),
        ):
            rows = reg[name].fn(spark, sf).collect()
            assert [r["query_id"] for r in rows] == [0, 1, 2, 3, 4]
            assert all(r["n_neighbors"] == 10 for r in rows), (name, sf)
            assert all(r[flag] for r in rows), (name, sf, rows)


def test_pq_index_roundtrip_matches_inline(spark, tmp_path):
    """build_pq_index → pq_index_topk must return exactly what the
    inline pq_topk_frame computes: the persisted (codebooks, codes)
    relations carry ALL the stage-1 information, so serving from the
    stored index loses nothing."""
    from bigdata_flightanalysis_spark.queries.similarity import (
        build_pq_index,
        pq_index_topk,
    )

    idx = str(tmp_path / "pq_index")
    build_pq_index(spark, SF, idx)
    served = sorted(map(tuple, pq_index_topk(spark, SF, idx).collect()))
    inline = sorted(map(tuple, pq_topk_frame(spark, SF).collect()))
    assert served == inline


def test_kmeans_embedding_contract_all_true(spark):
    """kmeans_embedding_clusters emits its clustering contract (the
    oracle expects literal TRUE per boolean): all rows assigned, 2..k
    non-empty clusters, and two seed=42 fits size-multiset-identical."""
    reg = load_all()
    for sf in ("/root/testdata/sf0.001", SF):
        rows = reg["kmeans_embedding_clusters"].fn(spark, sf).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["k"] == 8
        assert r["n_vectors"] > 0
        assert r["all_assigned"] and r["nonempty_le_k"], (sf, r)
        assert r["nonempty_ge_2"] and r["seed_stable"], (sf, r)


def test_kmeans_clusters_frame_detail(spark):
    """The detail helper: cluster ids within [0, k), sizes positive,
    total == corpus, and deterministic across fits."""
    from bigdata_flightanalysis_spark.queries.similarity import (
        kmeans_clusters_frame,
    )
    from bigdata_flightanalysis_spark.sources.readers import read_table

    a = sorted(map(tuple, kmeans_clusters_frame(spark, SF).collect()))
    b = sorted(map(tuple, kmeans_clusters_frame(spark, SF).collect()))
    assert a == b  # seeded fit is bit-deterministic
    n_total = read_table(spark, SF, "embeddings").count()
    assert sum(n for _, n in a) == n_total
    assert all(0 <= c < 8 and n > 0 for c, n in a)


def test_dot_product_dimension_mismatch_fails_loud(spark):
    """zip_with pads the shorter vector with NULLs, poisoning the fold
    to a NULL indistinguishable from the zero-norm NULL — a shard
    embedded with a different model silently yielded zero matches
    (r16 review). Mismatch now raises; NULL vectors still pass
    through as NULL."""
    import pytest

    from pyspark.sql import functions as F

    from bigdata_flightanalysis_spark.functions.vector import dot_product

    ok = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0]), (None, [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    rows = ok.select(dot_product(F.col("a"), F.col("b")).alias("d")).collect()
    assert rows[0]["d"] == 11.0
    assert rows[1]["d"] is None

    bad = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [1.0, 1.0])], "a array<double>, b array<double>"
    )
    with pytest.raises(Exception, match="dimensionality mismatch"):
        bad.select(dot_product(F.col("a"), F.col("b")).alias("d")).collect()
