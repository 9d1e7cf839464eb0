"""Empty-input robustness: an upstream filter (or an empty
partition-date) legitimately produces zero-row tables; queries must
return empty/summary frames — not throw ANSI division errors, numpy
IndexErrors, or opaque MLlib stage failures. A full-registry sweep on
all-empty tables found exactly four crashes (fixed in round 7); this
test pins those plus a representative per-family sample. The two
driver-coordinated KMeans fits are the documented exceptions: they
RAISE a clear ValueError (clustering nothing is a caller error)."""

from __future__ import annotations

import pytest

from bigdata_flightanalysis_spark.queries.catalog import load_all
from bigdata_flightanalysis_spark.schemas import TABLE_NAMES, TESTDATA_SCHEMAS

REGISTRY = load_all()

# previously-crashing + one representative per family
MUST_RUN = [
    "doc_dup_canonical_pagerank",   # was: ZeroDivisionError
    "embed_pq_topk",                # was: numpy IndexError in training
    "corpus_card",                  # was: ANSI DIVIDE_BY_ZERO
    "flagship_top_segments",
    "q1_pricing_summary",
    "events_value_winsorized_twopass",
    "events_type_trend",
    "doc_near_dup_candidates",
    "doc_dup_clusters",
    "doc_dup_graph_kcore",
    "embed_near_dup_incremental",
    "embed_decontamination",
    "embed_standardize",
    "orders_profile_approx",
    "doc_training_manifest",
]
MUST_RAISE_CLEARLY = ["kmeans_embedding_clusters", "embed_ivf_topk"]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("empty_sf")
    for t in TABLE_NAMES:
        spark.createDataFrame([], TESTDATA_SCHEMAS[t]).write.parquet(
            f"{base}/{t}.parquet"
        )
    return str(base)


@pytest.mark.parametrize("name", MUST_RUN)
def test_runs_on_empty_tables(name, spark, empty_dir):
    n = REGISTRY[name].fn(spark, empty_dir).count()
    assert n >= 0


@pytest.mark.parametrize("name", MUST_RAISE_CLEARLY)
def test_kmeans_fits_raise_clear_error_on_empty(name, spark, empty_dir):
    with pytest.raises(ValueError, match="non-empty embeddings"):
        REGISTRY[name].fn(spark, empty_dir).count()
