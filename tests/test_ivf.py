"""IVF ANN invariants (no SQL oracle — iterative centroid fit):
results must be a subset of the brute-force ranking universe, exactly
k rows per query, deterministic under the fixed seed, and with decent
recall against exact top-k."""

from __future__ import annotations

from bigdata_flightanalysis_spark.queries.catalog import load_all

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_invariants_and_recall(spark):
    r = load_all()
    ivf = r["embed_ivf_topk"].fn(spark, SF)
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
    r = load_all()
    a = sorted(map(tuple, r["embed_ivf_topk"].fn(spark, SF).collect()))
    b = sorted(map(tuple, r["embed_ivf_topk"].fn(spark, SF).collect()))
    assert a == b


def test_quantized_topk_recall_vs_exact(spark):
    """int8 candidate generation + float rerank must recover nearly all
    of the exact top-k (8-bit quantization on ~unit vectors loses far
    less ranking signal than the 3x candidate margin covers)."""
    reg = load_all()
    exact = reg["embed_cosine_topk"].fn(spark, SF).collect()
    quant = reg["embed_quantized_topk"].fn(spark, SF).collect()
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
