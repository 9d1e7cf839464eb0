"""Incremental exact dedup against a fingerprint store."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.operators.incremental import (
    incremental_exact_dedup,
)
from bigdata_flightanalysis_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_across_batches(spark, tmp_path):
    state = str(tmp_path / "fp_store")
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    batch1 = docs.filter(F.col("doc_id") < 60)
    # batch2 overlaps batch1's texts: 30-59 re-ingested with NEW ids
    reingested = (
        batch1.filter(F.col("doc_id") >= 30)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    batch2 = docs.filter(
        (F.col("doc_id") >= 60) & (F.col("doc_id") < 90)
    ).unionByName(reingested)

    kept1 = incremental_exact_dedup(spark, batch1, state)
    n1 = kept1.count()
    assert n1 <= 60  # within-batch exact dups collapse too
    kept1_texts = {r["text"] for r in kept1.collect()}

    kept2 = incremental_exact_dedup(spark, batch2, state)
    texts2 = {r["text"] for r in kept2.collect()}
    # nothing seen in batch1 survives batch2
    assert not (texts2 & kept1_texts)
    # re-ingested copies are dropped even under new doc_ids
    assert all(r["doc_id"] < 100000 for r in kept2.collect())

    # replaying batch2 yields nothing new
    kept3 = incremental_exact_dedup(spark, batch2, state)
    assert kept3.count() == 0


def test_incremental_dedup_first_batch_equals_exact_dedup(spark, tmp_path):
    state = str(tmp_path / "fp_store2")
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    kept = incremental_exact_dedup(spark, docs, state)
    # one survivor per distinct normalized text, the lowest doc_id
    from bigdata_flightanalysis_spark.functions.text import (
        md5_long,
        normalize_text,
    )

    expected = (
        docs.select("doc_id", md5_long(normalize_text("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in expected.collect())
    assert a == b
