"""Incremental corpus operators: dedup a NEW ingest batch against the
accumulated history without rescanning the historical corpus.

The batch complement to the streaming `dropDuplicatesWithinWatermark`
path: a crawl/ingest pipeline lands batches daily; re-deduplicating
100 TB of history per batch is not viable, so history is represented
by its fingerprint store (64-bit hash per kept doc — ~10⁻⁴ of corpus
bytes), and each new batch pays one anti-join against it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_flightanalysis_spark.functions.text import md5_long, normalize_text


def fingerprint_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp): the 60-bit md5 fingerprint of normalized text — the
    same family the oracle-checked `doc_fingerprints` query uses."""
    return df.select(
        F.col(id_col).alias("id"),
        md5_long(normalize_text(text_col)).alias("fp"),
    )


def incremental_exact_dedup(
    spark: SparkSession,
    new_docs: DataFrame,
    state_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Return the subset of ``new_docs`` not seen before (exact text
    dedup), and extend the fingerprint store with the survivors.

    Steps, one shuffle each:
    1. within-batch dedup — keep the lowest id per fingerprint
       (row_number window, deterministic);
    2. cross-history dedup — LEFT ANTI join against the store on the
       fingerprint key (at scale: the store is bucketed by fp so this
       is a shuffle-free merge per bucket);
    3. append the survivors' fingerprints (append mode — the store
       only grows, and replaying a FAILED batch before its append
       committed is safe: survivors are recomputed identically).

    The survivor set is MATERIALIZED (eager ``localCheckpoint``)
    before the append: the anti-join plan reads ``state_path``, so a
    lazy return value re-evaluated after the append (file-listing
    refresh, cache eviction, checkpoint loss) would anti-join the
    batch against its own just-appended fingerprints and come back
    empty. After materialization the returned frame is pinned to the
    pre-append snapshot regardless of when the caller collects it.
    """
    fps = fingerprint_docs(new_docs, id_col, text_col)
    w = Window.partitionBy("fp").orderBy("id")
    batch_unique = (
        fps.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if os.path.exists(state_path):
        seen = spark.read.parquet(state_path)
        fresh = batch_unique.join(seen, "fp", "left_anti")
    else:
        fresh = batch_unique
    fresh = fresh.localCheckpoint(eager=True)
    fresh.select("fp").write.mode("append").parquet(state_path)
    return new_docs.join(
        fresh.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )


def incremental_near_dup_pairs(
    spark: SparkSession,
    new_docs: DataFrame,
    store_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidates of a NEW ingest batch against the
    accumulated LSH band store, extending the store with the batch.

    The MinHash twin of :func:`incremental_exact_dedup`: history is
    represented by its (doc_id, band, bucket) band store (~10⁻⁴ of
    corpus bytes, the same relation `doc_near_dup_incremental` probes),
    so each batch pays one signature pass over ITS OWN text plus a
    (band, bucket) equi-join against the store — the historical corpus
    text is never rescanned. Returns distinct (doc_a, doc_b) candidate
    pairs involving at least one batch doc (batch-vs-history and
    batch-vs-batch).

    Replay safety: the batch's bands are materialized (eager
    ``localCheckpoint``) BEFORE the append, pinning the returned pairs
    to the pre-append store snapshot; the append itself anti-joins the
    store first, so replaying a batch whose append committed neither
    duplicates store rows nor changes the emitted pair set (pairs are
    a pure function of batch bands × store bands, and self-pairs are
    excluded by id).
    """
    from bigdata_flightanalysis_spark.queries.text import (
        _band_frame,
        _signatures_of,
    )

    docs = new_docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    batch_bands = _band_frame(_signatures_of(docs)).localCheckpoint(eager=True)
    if os.path.exists(store_path):
        store = spark.read.parquet(store_path)
        probe = store.unionByName(batch_bands)
        to_append = batch_bands.join(
            store, ["doc_id", "band"], "left_anti"
        )
    else:
        probe = batch_bands
        to_append = batch_bands
    a, b = batch_bands.alias("a"), probe.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    to_append.write.mode("append").parquet(store_path)
    return pairs
