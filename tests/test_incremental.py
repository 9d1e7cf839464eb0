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


def test_incremental_dedup_result_pinned_after_append(spark, tmp_path):
    """The returned survivor frame must be materialized BEFORE the
    store append: a lazy plan re-reading state_path after the append
    (or after a file-listing refresh) would anti-join the batch
    against its own fingerprints and collapse to empty."""
    state = str(tmp_path / "fp_store3")
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    batch1 = docs.filter(F.col("doc_id") < 50)
    kept1 = incremental_exact_dedup(spark, batch1, state)
    n_first = kept1.count()
    assert n_first > 0
    # grow the store (second batch) and invalidate cached file listings
    batch2 = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 80))
    incremental_exact_dedup(spark, batch2, state)
    spark.catalog.refreshByPath(state)
    assert kept1.count() == n_first


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


def test_streaming_ingest_with_incremental_dedup(spark, tmp_path):
    """E2E ingest composition: a document stream lands in micro-batches;
    each batch is deduplicated against the accumulated fingerprint
    store inside foreachBatch and survivors appended to the clean
    corpus. Final corpus == one-shot batch dedup of everything."""
    import glob
    import shutil
    import time as _t

    from bigdata_flightanalysis_spark.streaming.events import run_foreach_batch

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    # stage 3 files with OVERLAPPING content (docs re-ingested)
    slices = [(0, 200), (150, 350), (300, 500)]
    import os as _os

    _os.makedirs(src, exist_ok=True)
    for i, (lo, hi) in enumerate(slices):
        tmp = f"{src}/.tmp{i}"
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/f{i}.parquet")
        shutil.rmtree(tmp)
        _t.sleep(1.1)

    state = str(tmp_path / "fp_store")
    corpus = str(tmp_path / "clean_corpus")

    def ingest(batch_df, batch_id):
        # foreachBatch's epoch id makes the ingest exactly-once: a
        # crash-replayed batch re-emits its recorded survivors
        kept = incremental_exact_dedup(spark, batch_df, state, batch_id=batch_id)
        kept.write.mode("append").parquet(corpus)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    run_foreach_batch(
        stream, ingest, checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
    )

    got = spark.read.parquet(corpus)
    # one survivor per distinct text, and no duplicates in the corpus
    from bigdata_flightanalysis_spark.functions.text import (
        md5_long,
        normalize_text,
    )

    n_texts = (
        docs.select(md5_long(normalize_text("text")).alias("fp"))
        .distinct()
        .count()
    )
    assert got.count() == n_texts
    assert (
        got.select(md5_long(normalize_text("text")).alias("fp"))
        .distinct()
        .count()
        == n_texts
    )


def test_streaming_ingest_with_incremental_near_dup(spark, tmp_path):
    """E2E near-dup ingest: a document stream lands in micro-batches
    (with re-ingested overlap); each batch's MinHash bands probe the
    accumulated band store inside foreachBatch, emitted pairs
    accumulate, and the batch's bands extend the store. The union of
    emitted pairs must equal the one-shot full-corpus LSH pair set —
    no pair lost by never rescanning history, none invented by the
    overlapping re-ingestion."""
    import glob
    import os as _os
    import shutil
    import time as _t

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_near_dup_pairs,
    )
    from bigdata_flightanalysis_spark.queries.catalog import load_all
    from bigdata_flightanalysis_spark.streaming.events import run_foreach_batch

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    n = docs.count()
    cut1, cut2 = n * 2 // 5, n * 3 // 5
    src = str(tmp_path / "src")
    _os.makedirs(src, exist_ok=True)
    slices = [(0, cut2), (cut1, n)]  # middle slice re-ingested
    for i, (lo, hi) in enumerate(slices):
        tmp = f"{src}/.tmp{i}"
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(
            glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/f{i}.parquet"
        )
        shutil.rmtree(tmp)
        _t.sleep(1.1)

    store = str(tmp_path / "band_store")
    out = str(tmp_path / "pairs")

    def ingest(batch_df, batch_id):
        pairs = incremental_near_dup_pairs(spark, batch_df, store)
        pairs.write.mode("append").parquet(out)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    run_foreach_batch(
        stream, ingest, checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
    )

    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(out).distinct().collect()
    }
    full = {
        (r["doc_a"], r["doc_b"])
        for r in load_all()["doc_near_dup_candidates"].fn(spark, SF).collect()
    }
    assert got == full
    # the store holds each (doc, band) exactly once despite re-ingestion
    store_df = spark.read.parquet(store)
    assert store_df.count() == store_df.select("doc_id", "band").distinct().count()


def test_incremental_near_dup_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch whose append already committed (the failure/
    retry path of any ingest pipeline) must emit the identical pair
    set and leave the band store byte-identical — the replay-safety
    contract claimed in the operator docstring."""
    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_near_dup_pairs,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    n = docs.count()
    first = docs.filter(F.col("doc_id") < n // 2)
    second = docs.filter(F.col("doc_id") >= n // 2)
    store = str(tmp_path / "band_store")

    incremental_near_dup_pairs(spark, first, store)
    p1 = sorted(map(tuple, incremental_near_dup_pairs(spark, second, store).collect()))
    rows_after = sorted(map(tuple, spark.read.parquet(store).collect()))
    # replay the second batch: same pairs, store unchanged
    p2 = sorted(map(tuple, incremental_near_dup_pairs(spark, second, store).collect()))
    assert p2 == p1
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == rows_after


def test_aggregate_state_split_and_order_invariant(spark, sf_dir):
    """Any batch split, any merge order → bit-identical finalized
    view (the decimal-partial property the 100 TB materialized-view
    path depends on)."""
    from functools import reduce

    from pyspark.sql import functions as F

    from bigdata_flightanalysis_spark.operators.incremental import (
        finalize_aggregate,
        merge_aggregate_state,
        partial_aggregate,
    )
    from bigdata_flightanalysis_spark.sources.readers import read_table

    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    keys = ["event_type"]

    def final_rows(n_parts, order):
        parts = [
            partial_aggregate(
                ev.where(F.pmod("event_id", F.lit(n_parts)) == i), keys, "value"
            )
            for i in order
        ]
        state = reduce(lambda s, b: merge_aggregate_state(s, b, keys), parts)
        return sorted(tuple(r) for r in finalize_aggregate(state, keys).collect())

    one_shot = sorted(
        tuple(r)
        for r in finalize_aggregate(
            partial_aggregate(ev, keys, "value"), keys
        ).collect()
    )
    assert final_rows(3, [0, 1, 2]) == one_shot
    assert final_rows(3, [2, 0, 1]) == one_shot
    assert final_rows(5, [4, 1, 3, 0, 2]) == one_shot


def test_streaming_ingest_with_incremental_embed_near_dup(spark, tmp_path):
    """E2E embedding-ingest: a vector stream lands in micro-batches
    (with re-ingested overlap); each batch is bucketed once inside
    foreachBatch, probed against the accumulated (vec_id, bucket,
    vector) store, emitted pairs accumulate, and the batch extends the
    store. The union of emitted pairs must equal the one-shot
    full-corpus embed_near_dup_pairs set — bit-exact cosines included
    (the fold is orientation-independent)."""
    import glob
    import os as _os
    import shutil
    import time as _t

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
    )
    from bigdata_flightanalysis_spark.queries.catalog import load_all
    from bigdata_flightanalysis_spark.streaming.events import run_foreach_batch

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    cut1, cut2 = n * 2 // 5, n * 3 // 5
    src = str(tmp_path / "src")
    _os.makedirs(src, exist_ok=True)
    for i, (lo, hi) in enumerate([(0, cut2), (cut1, n)]):  # overlap re-ingested
        tmp = f"{src}/.tmp{i}"
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(
            glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/f{i}.parquet"
        )
        shutil.rmtree(tmp)
        _t.sleep(1.1)

    store = str(tmp_path / "vec_store")
    out = str(tmp_path / "pairs")

    def ingest(batch_df, batch_id):
        incremental_embed_near_dup_pairs(spark, batch_df, store).write.mode(
            "append"
        ).parquet(out)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    run_foreach_batch(
        stream, ingest, checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
    )

    got = sorted(
        map(tuple, spark.read.parquet(out).distinct().collect())
    )
    full = sorted(
        map(
            tuple,
            load_all()["embed_near_dup_pairs"].fn(spark, SF).collect(),
        )
    )
    assert got == full
    assert got, "fixture produced no near-dup pairs"
    # the store holds each vector exactly once despite re-ingestion
    store_df = spark.read.parquet(store)
    assert store_df.count() == store_df.select("vec_id").distinct().count()
    assert store_df.count() == n


def test_embed_store_is_bucket_partitioned_on_disk(spark, tmp_path):
    """The vector store lands hive-partitioned by bucket, so the probe
    join's equi-key is the partition column and pruning (static or
    dynamic) can skip every bucket a batch doesn't touch."""
    import os as _os

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
    )

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "vec_store")
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") % 2 == 0), store
    )
    dirs = [d for d in _os.listdir(store) if d.startswith("bucket=")]
    assert len(dirs) > 1  # real partition layout
    pruned = spark.read.parquet(store).where(F.col("bucket") == int(dirs[0].split("=")[1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_embed_store_granularity_recorded_and_enforced(spark, tmp_path):
    """The store records its n_planes at creation (_store_meta.json,
    Spark-ignored sidecar); probing with a different n_planes must
    raise instead of silently missing every cross-granularity pair
    (round-7 advisory defect)."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
    )

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "vec_store")
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") % 2 == 0), store, n_planes=12
    )
    meta = _os.path.join(store, "_store_meta.json")
    assert _os.path.exists(meta)
    with open(meta, encoding="utf-8") as f:
        assert _json.load(f)["n_planes"] == 12
    # the sidecar must not break Spark's parquet read of the store
    assert spark.read.parquet(store).count() > 0

    with _pytest.raises(ValueError, match="n_planes=12"):
        incremental_embed_near_dup_pairs(
            spark, emb.where(F.col("vec_id") % 2 == 1), store, n_planes=16
        )
    # matching granularity still works after the failed probe
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") % 2 == 1), store, n_planes=12
    )


def test_rebucket_embed_store_changes_granularity_exactly(spark, tmp_path):
    """rebucket_embed_store: after rebucketing a 10-plane store to 12
    planes, probing a new batch emits EXACTLY the pairs a store built
    from scratch at 12 planes (same contents) emits, the recorded
    granularity is updated, and a 10-plane probe now raises."""
    import pytest as _pytest

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
        rebucket_embed_store,
    )

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    b1 = emb.where(F.col("vec_id") % 3 == 0)
    b2 = emb.where(F.col("vec_id") % 3 == 1)
    b3 = emb.where(F.col("vec_id") % 3 == 2)

    store = str(tmp_path / "store10")
    incremental_embed_near_dup_pairs(spark, b1, store, n_planes=10)
    incremental_embed_near_dup_pairs(spark, b2, store, n_planes=10)
    rebucket_embed_store(spark, store, 12)
    with _pytest.raises(ValueError, match="n_planes=12"):
        incremental_embed_near_dup_pairs(spark, b3, store, n_planes=10)
    got = {
        tuple(r)
        for r in incremental_embed_near_dup_pairs(
            spark, b3, store, n_planes=12
        ).collect()
    }

    fresh = str(tmp_path / "fresh12")
    incremental_embed_near_dup_pairs(spark, b1, fresh, n_planes=12)
    incremental_embed_near_dup_pairs(spark, b2, fresh, n_planes=12)
    expect = {
        tuple(r)
        for r in incremental_embed_near_dup_pairs(
            spark, b3, fresh, n_planes=12
        ).collect()
    }
    assert got == expect
    # the strong equivalence (pair sets can legitimately be empty at
    # 12 planes on the tiny fixture): every vector's recomputed bucket
    # equals the bucket a from-scratch 12-plane ingest assigns
    reb = {
        (r["vec_id"], r["bucket"])
        for r in spark.read.parquet(store).select("vec_id", "bucket").collect()
    }
    ref = {
        (r["vec_id"], r["bucket"])
        for r in spark.read.parquet(fresh).select("vec_id", "bucket").collect()
    }
    assert reb and {v for v, _ in reb} <= {v for v, _ in ref}
    ref_by_id = dict(ref)
    assert all(ref_by_id[v] == b for v, b in reb)


def test_rebucket_crash_window_recovers(spark, tmp_path):
    """A crash between rebucket's two renames (live store gone, .old
    complete) must NOT make the next ingest restart history from its
    own batch — the recovery hook renames the old store back."""
    import os as _os

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
    )

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "store")
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") % 2 == 0), store, n_planes=10
    )
    n_store = spark.read.parquet(store).count()
    _os.rename(store, store + ".old")  # the crash window
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") % 2 == 1), store, n_planes=10
    )
    assert _os.path.exists(store) and not _os.path.exists(store + ".old")
    assert spark.read.parquet(store).count() > n_store  # history kept


def test_hyperplane_bank_overflow_raises(spark):
    """Asking for more planes than the bank holds must raise, not
    silently bucket coarser than requested."""
    import pytest as _pytest

    from bigdata_flightanalysis_spark.queries.similarity import (
        HYPERPLANES,
        _spark_bucket,
    )

    with _pytest.raises(ValueError, match="hyperplane bank"):
        _spark_bucket(F.col("embedding"), len(HYPERPLANES) + 1)


def test_band_store_records_signature_scheme(spark, tmp_path):
    """The MinHash band store stamps its signature scheme; a store
    from a different (n_perm, band_size) release must be rejected
    rather than probed on incomparable buckets."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_near_dup_pairs,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    store = str(tmp_path / "band_store")
    incremental_near_dup_pairs(
        spark, docs.where(F.col("doc_id") % 2 == 0), store
    )
    meta = _os.path.join(store, "_store_meta.json")
    with open(meta, encoding="utf-8") as f:
        recorded = _json.load(f)
    assert recorded["scheme"] == "minhash" and recorded["n_perm"] == 16
    # simulate a store written by a release with a different scheme
    with open(meta, "w", encoding="utf-8") as f:
        _json.dump({"scheme": "minhash", "n_perm": 32, "band_size": 4}, f)
    with _pytest.raises(ValueError, match="n_perm=32"):
        incremental_near_dup_pairs(
            spark, docs.where(F.col("doc_id") % 2 == 1), store
        )


def test_exact_store_records_fingerprint_scheme(spark, tmp_path):
    """The fingerprint store stamps its (normalize, hash) scheme; a
    store from a release with a different scheme must be rejected —
    probing it would treat all history as unseen and re-admit dups."""
    import json as _json
    import os as _os

    import pytest as _pytest

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    store = str(tmp_path / "fp_store")
    incremental_exact_dedup(spark, docs.where(F.col("doc_id") < 40), store)
    meta = _os.path.join(store, "_store_meta.json")
    with open(meta, encoding="utf-8") as f:
        assert _json.load(f)["scheme"] == "exact"
    with open(meta, "w", encoding="utf-8") as f:
        _json.dump({"scheme": "exact", "fp": "xxhash64_raw"}, f)
    with _pytest.raises(ValueError, match="xxhash64_raw"):
        incremental_exact_dedup(
            spark, docs.where(F.col("doc_id") >= 40), store
        )


def test_recover_removes_stale_old_next_to_healthy_store(spark, tmp_path):
    """A crash after rebucket's second rename but before the final
    cleanup leaves a full-store-sized .old next to a healthy live
    store; the next ingest must remove it (nothing else ever would)."""
    import os as _os

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
    )

    emb = read_table(spark, SF, "embeddings")
    store = str(tmp_path / "store")
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") < 50), store
    )
    _os.makedirs(store + ".old")
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") >= 50), store
    )
    assert not _os.path.exists(store + ".old")


def test_legacy_unstamped_embed_store_vetted_before_stamp(spark, tmp_path):
    """An unstamped (pre-round-8) embed store is structurally vetted
    BEFORE being accepted: bucket dirs outside 2^n_planes mean it was
    built at a different granularity, and appending to it would mix
    granularities in the data and then certify the WRONG stamp on the
    next append (round-8 advisory defect). A clean legacy store is
    accepted and stamped with the vetted parameters."""
    import os as _os

    import pytest as _pytest

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
    )

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "store12")
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") % 2 == 0), store, n_planes=12
    )
    _os.remove(_os.path.join(store, "_store_meta.json"))  # legacy store
    # the fixture's 12-plane buckets exceed 2^10 — the vet must see it
    assert any(
        int(d.split("=", 1)[1]) >= 1 << 10
        for d in _os.listdir(store)
        if d.startswith("bucket=")
    )
    with _pytest.raises(ValueError, match="structural check"):
        incremental_embed_near_dup_pairs(
            spark, emb.where(F.col("vec_id") % 2 == 1), store, n_planes=10
        )
    # matching granularity passes the vet, appends, and re-stamps
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") % 2 == 1), store, n_planes=12
    )
    import json as _json

    with open(_os.path.join(store, "_store_meta.json"), encoding="utf-8") as f:
        assert _json.load(f) == {"n_planes": 12}


def test_legacy_unstamped_band_store_vetted_before_stamp(spark, tmp_path):
    """An unstamped band store whose band ids don't fit this release's
    (n_perm, band_size) scheme is rejected via parquet footer stats —
    no data scan — instead of being probed on incomparable buckets and
    then stamped as if it matched."""
    import os as _os

    import pytest as _pytest

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_near_dup_pairs,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    store = str(tmp_path / "band_store")
    incremental_near_dup_pairs(
        spark, docs.where(F.col("doc_id") % 2 == 0), store
    )
    _os.remove(_os.path.join(store, "_store_meta.json"))  # legacy store
    # clean legacy layout (bands 0..3): accepted and re-stamped
    incremental_near_dup_pairs(
        spark, docs.where(F.col("doc_id") % 3 == 1), store
    )
    assert _os.path.exists(_os.path.join(store, "_store_meta.json"))

    # foreign legacy layout: a store whose band ids exceed the scheme
    _os.remove(_os.path.join(store, "_store_meta.json"))
    spark.createDataFrame(
        [(999999, 99, 12345)], "doc_id long, band int, bucket long"
    ).write.mode("append").parquet(store)
    with _pytest.raises(ValueError, match="structural check"):
        incremental_near_dup_pairs(
            spark, docs.where(F.col("doc_id") % 3 == 2), store
        )


def test_legacy_unstamped_fp_store_vetted_before_stamp(spark, tmp_path):
    """An unstamped fingerprint store with values outside the 60-bit
    md5 range was written by a different hash scheme — probing it
    would treat all history as unseen; the vet rejects it instead of
    stamping it as md5-schemed."""
    import os as _os

    import pytest as _pytest

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    store = str(tmp_path / "fp_store")
    incremental_exact_dedup(spark, docs.where(F.col("doc_id") < 40), store)
    _os.remove(_os.path.join(store, "_store_meta.json"))  # legacy store
    spark.createDataFrame([(-5,)], "fp long").write.mode("append").parquet(
        store
    )
    with _pytest.raises(ValueError, match="structural check"):
        incremental_exact_dedup(
            spark, docs.where(F.col("doc_id") >= 40), store
        )


def _parquet_file_count(path):
    import os as _os

    return sum(
        1
        for root, _d, files in _os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def test_compact_embed_store_bounds_files_and_preserves_pairs(spark, tmp_path):
    """Each ingest appends one file per touched bucket, so a long
    refresh stream grows the store's file listing unboundedly;
    compact_embed_store rewrites every bucket to ONE file at the
    RECORDED granularity — afterwards a probe emits exactly the pairs
    an uncompacted twin store emits, and the stamp is preserved."""
    import json as _json
    import os as _os

    from bigdata_flightanalysis_spark.operators.incremental import (
        compact_embed_store,
        incremental_embed_near_dup_pairs,
    )

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    batches = [emb.where(F.col("vec_id") % 4 == i) for i in range(4)]

    store = str(tmp_path / "store")
    twin = str(tmp_path / "twin")
    for b in batches[:3]:
        incremental_embed_near_dup_pairs(spark, b, store, n_planes=10)
        incremental_embed_near_dup_pairs(spark, b, twin, n_planes=10)

    before = _parquet_file_count(store)
    compact_embed_store(spark, store)
    after = _parquet_file_count(store)
    assert after < before
    # one file per non-empty bucket dir
    buckets = [d for d in _os.listdir(store) if d.startswith("bucket=")]
    assert after == len(buckets)
    with open(_os.path.join(store, "_store_meta.json"), encoding="utf-8") as f:
        assert _json.load(f) == {"n_planes": 10}

    got = {
        tuple(r)
        for r in incremental_embed_near_dup_pairs(
            spark, batches[3], store, n_planes=10
        ).collect()
    }
    expect = {
        tuple(r)
        for r in incremental_embed_near_dup_pairs(
            spark, batches[3], twin, n_planes=10
        ).collect()
    }
    assert got == expect

    # unstamped store: no recorded granularity to compact at → loud
    import pytest as _pytest

    _os.remove(_os.path.join(store, "_store_meta.json"))
    with _pytest.raises(ValueError, match="rebucket_embed_store"):
        compact_embed_store(spark, store)


def test_compact_flat_store_bounds_files_and_preserves_probes(spark, tmp_path):
    """The band and fingerprint stores accumulate one file set per
    ingest; compact_flat_store rewrites them to a bounded file count
    (and drops racing-ingest duplicate rows) without changing any
    probe result or the scheme stamp."""
    import json as _json
    import os as _os

    from bigdata_flightanalysis_spark.operators.incremental import (
        compact_flat_store,
        incremental_near_dup_pairs,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    store = str(tmp_path / "band_store")
    twin = str(tmp_path / "band_twin")
    for i in range(3):
        incremental_near_dup_pairs(
            spark, docs.where(F.col("doc_id") % 4 == i), store
        )
        incremental_near_dup_pairs(
            spark, docs.where(F.col("doc_id") % 4 == i), twin
        )
    # racing-ingest residue: duplicate a slice of the store's rows
    dup = spark.read.parquet(store).limit(50)
    dup.write.mode("append").parquet(store)
    n_logical = spark.read.parquet(twin).count()

    before = _parquet_file_count(store)
    compact_flat_store(spark, store)
    after = _parquet_file_count(store)
    assert after < before
    assert spark.read.parquet(store).count() == n_logical  # dups dropped
    with open(_os.path.join(store, "_store_meta.json"), encoding="utf-8") as f:
        assert _json.load(f)["scheme"] == "minhash"

    last = docs.where(F.col("doc_id") % 4 == 3)
    got = {
        tuple(r)
        for r in incremental_near_dup_pairs(spark, last, store).collect()
    }
    expect = {
        tuple(r)
        for r in incremental_near_dup_pairs(spark, last, twin).collect()
    }
    assert got == expect


def test_compact_fp_store_preserves_dedup_decisions(spark, tmp_path):
    """compact_flat_store on the fingerprint store: the post-compact
    store admits exactly what an uncompacted twin admits."""
    from bigdata_flightanalysis_spark.operators.incremental import (
        compact_flat_store,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    store = str(tmp_path / "fp_store")
    twin = str(tmp_path / "fp_twin")
    for i in range(3):
        incremental_exact_dedup(
            spark, docs.where(F.col("doc_id") % 4 == i), store
        )
        incremental_exact_dedup(
            spark, docs.where(F.col("doc_id") % 4 == i), twin
        )
    before = _parquet_file_count(store)
    compact_flat_store(spark, store)
    assert _parquet_file_count(store) < before

    last = docs.where(F.col("doc_id") % 4 == 3)
    got = {r["doc_id"] for r in incremental_exact_dedup(spark, last, store).collect()}
    expect = {r["doc_id"] for r in incremental_exact_dedup(spark, last, twin).collect()}
    assert got == expect


def test_flat_store_compact_crash_window_recovers(spark, tmp_path):
    """A crash between compact_flat_store's two renames (live store
    gone, .old complete) must NOT make the next ingest restart history
    from its own batch — both flat-store ingest paths heal it first."""
    import os as _os

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_near_dup_pairs,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")

    # fingerprint store
    fp = str(tmp_path / "fp_store")
    incremental_exact_dedup(spark, docs.where(F.col("doc_id") < 60), fp)
    _os.rename(fp, fp + ".old")  # the crash window
    kept2 = incremental_exact_dedup(
        spark,
        docs.where(F.col("doc_id") < 60),  # pure replay of batch 1
        fp,
    )
    assert kept2.count() == 0  # history survived: replay admits nothing
    assert _os.path.exists(fp) and not _os.path.exists(fp + ".old")

    # band store
    band = str(tmp_path / "band_store")
    incremental_near_dup_pairs(spark, docs.where(F.col("doc_id") % 2 == 0), band)
    n_store = spark.read.parquet(band).count()
    _os.rename(band, band + ".old")
    incremental_near_dup_pairs(spark, docs.where(F.col("doc_id") % 2 == 1), band)
    assert spark.read.parquet(band).count() > n_store  # history kept


def test_store_rewrite_serializes_against_ingest(spark, tmp_path):
    """R9 verdict defect #2: a rewrite snapshot-reads the live store,
    then two-rename swaps — an ingest appending in between lands its
    rows in the dir that becomes .old, which the rewrite rmtree's:
    silent history loss. Every ingest/rewrite now holds a per-store
    lock: (a) an ingest entering while a rewrite holds the lock must
    BLOCK until release; (b) a compaction racing an ingest must lose
    zero rows regardless of which wins the lock."""
    import threading

    from bigdata_flightanalysis_spark.operators.incremental import (
        _store_lock,
        compact_flat_store,
        fingerprint_docs,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    batch1 = docs.where(F.col("doc_id") < 40)
    batch2 = docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 70))
    batch3 = docs.where(F.col("doc_id") >= 70)
    fp = str(tmp_path / "fp_store")
    incremental_exact_dedup(spark, batch1, fp)

    # (a) lock held (simulating an in-flight rewrite) => ingest blocks
    done = threading.Event()

    def ingest2():
        incremental_exact_dedup(spark, batch2, fp)
        done.set()

    t = threading.Thread(target=ingest2)
    with _store_lock(fp):
        t.start()
        assert not done.wait(3.0), "ingest ran during an in-flight rewrite"
    t.join(120)
    assert done.is_set()

    # (b) concurrent compact + ingest: serialized in SOME order, and
    # the store ends with every batch's fingerprints either way
    errs = []

    def run(fn, *args):
        try:
            fn(spark, *args)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    t_compact = threading.Thread(target=run, args=(compact_flat_store, fp))
    t_ingest = threading.Thread(
        target=run, args=(incremental_exact_dedup, batch3, fp)
    )
    t_compact.start()
    t_ingest.start()
    t_compact.join(300)
    t_ingest.join(300)
    assert not errs
    got = {r["fp"] for r in spark.read.parquet(fp).collect()}
    want = {
        r["fp"]
        for r in fingerprint_docs(docs, "doc_id", "text")
        .select("fp")
        .distinct()
        .collect()
    }
    assert got == want  # zero lost rows, zero phantom rows


def test_orphaned_staging_reclaimed_on_next_ingest(spark, tmp_path):
    """R9 verdict defect #3: a crash during a rewrite's staging write
    strands a near-full-size .staging dir that only the next rewrite
    would reclaim — never, on an ingest-only workload. The recovery
    hook every ingest runs first must remove it. (The stranded state
    is planted directly: a partial dir with no _SUCCESS is exactly
    what a mid-write crash leaves.)"""
    import os as _os

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    fp = str(tmp_path / "fp_store")
    incremental_exact_dedup(spark, docs.where(F.col("doc_id") < 60), fp)
    staging = fp + ".staging"
    _os.makedirs(staging)
    with open(_os.path.join(staging, "part-00000.parquet"), "wb") as f:
        f.write(b"torn")  # partial write, no _SUCCESS
    kept = incremental_exact_dedup(spark, docs.where(F.col("doc_id") >= 60), fp)
    assert kept.count() >= 0  # ingest itself unaffected
    assert not _os.path.exists(staging)

    # the bucket-partitioned embed store's ingest reclaims too
    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "vec_store")
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") % 2 == 0), store
    )
    v_staging = store + ".staging"
    _os.makedirs(_os.path.join(v_staging, "bucket=0"))
    with open(_os.path.join(v_staging, "bucket=0", "part-0.parquet"), "wb") as f:
        f.write(b"torn")
    incremental_embed_near_dup_pairs(
        spark, emb.where(F.col("vec_id") % 2 == 1), store
    )
    assert not _os.path.exists(v_staging)


def test_empty_first_embed_batch_does_not_brick_store(spark, tmp_path):
    """An empty FIRST batch through the embedding ingest must not
    create a store dir holding only _SUCCESS (a hive-partitioned
    empty write emits no schema-bearing data file, so every later
    read would die with UNABLE_TO_INFER_SCHEMA — reproduced before
    the guard; r13 review). Empty appends are skipped; later real
    batches see a clean slate, and empty batches against an EXISTING
    store are harmless."""
    import os as _os

    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
    )

    store = str(tmp_path / "emb_store")
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert incremental_embed_near_dup_pairs(spark, empty, store).count() == 0
    assert not _os.path.exists(store)  # no half-created dir to brick

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    pairs = incremental_embed_near_dup_pairs(spark, emb, store)
    assert _os.path.exists(store)
    n_pairs = pairs.count()
    # an empty batch against the now-populated store is also a no-op
    assert incremental_embed_near_dup_pairs(spark, empty, store).count() == 0
    assert spark.read.parquet(store).count() == emb.count()
    assert n_pairs >= 0


def test_band_store_resend_with_new_text_lands_new_buckets(spark, tmp_path):
    """Re-sending a doc_id with DIFFERENT text is out of contract
    (updates require a rebuild), but it must degrade the same way the
    embed store documents — the new text's bands land as second rows
    and later batches can still find near-dups of the NEW text — not
    by silently dropping every new band on the (doc_id, band) key
    (r13 review)."""
    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_near_dup_pairs,
    )

    store = str(tmp_path / "band_store")
    text_a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    text_b = "one two three four five six seven eight nine ten " * 4
    b1 = spark.createDataFrame([(1, text_a)], "doc_id bigint, text string")
    incremental_near_dup_pairs(spark, b1, store)
    # out-of-contract re-send: same id, entirely different text
    b2 = spark.createDataFrame([(1, text_b)], "doc_id bigint, text string")
    incremental_near_dup_pairs(spark, b2, store)
    # a NEW doc duplicating the re-sent text must be caught
    b3 = spark.createDataFrame([(2, text_b)], "doc_id bigint, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_near_dup_pairs(spark, b3, store).collect()
    }
    assert (1, 2) in pairs


def test_legacy_flat_embed_store_rejected(spark, tmp_path):
    """An unstamped legacy store laid out FLAT (bucket as a data
    column, root-level parquet files) must fail the structural vet:
    a hive-partitioned append into it would leave a mixed layout that
    breaks partition discovery on every later read (r13 review)."""
    import pytest as _pytest

    from bigdata_flightanalysis_spark.functions.vector import l2_norm
    from bigdata_flightanalysis_spark.operators.incremental import (
        incremental_embed_near_dup_pairs,
    )
    from bigdata_flightanalysis_spark.queries.similarity import _spark_bucket

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "flat_store")
    (
        emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
            l2_norm(F.col("embedding")).alias("nrm"),
            _spark_bucket(F.col("embedding"), 12).alias("bucket"),
        ).write.parquet(store)  # flat: bucket is a column, not a dir
    )
    with _pytest.raises(ValueError, match="flat layout"):
        incremental_embed_near_dup_pairs(spark, emb.limit(5), store, n_planes=12)


def test_compact_flat_store_refuses_partitioned_embed_store(spark, tmp_path):
    """compact_flat_store pointed at a bucket-partitioned embedding
    store would silently rewrite it flat (stamp intact) and the next
    partitioned append would mix layouts — it must refuse and point at
    compact_embed_store (r13 review)."""
    import pytest as _pytest

    from bigdata_flightanalysis_spark.operators.incremental import (
        compact_flat_store,
        incremental_embed_near_dup_pairs,
    )

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "emb_store")
    incremental_embed_near_dup_pairs(spark, emb, store)
    with _pytest.raises(ValueError, match="compact_embed_store"):
        compact_flat_store(spark, store)


def test_exact_dedup_batch_id_replay_reemits_survivors(spark, tmp_path):
    """Exactly-once mode (batch_id passed): a replay of the SAME batch
    id must RE-EMIT the recorded survivors even though its fps already
    landed — the bare anti-join would return empty and the documents
    would be permanently lost downstream (r14 review). Duplicate
    content under a NEW batch id still dedups to empty."""
    import os as _os

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    state = str(tmp_path / "fp_store_eo")
    b1 = docs.filter(F.col("doc_id") < 40)

    kept1 = sorted(r["doc_id"] for r in
                   incremental_exact_dedup(spark, b1, state, batch_id=0).collect())
    assert kept1
    # crash-replay of batch 0 (fps are in the store; pending retained)
    replay = sorted(r["doc_id"] for r in
                    incremental_exact_dedup(spark, b1, state, batch_id=0).collect())
    assert replay == kept1  # same survivors re-emitted, not []
    # the landing is idempotent: exactly one ingest file for batch 0
    files = [f for f in _os.listdir(state) if f.startswith("ingest-")]
    assert len(files) == 1
    # same content under a NEW batch id: dedup semantics hold
    dup = incremental_exact_dedup(spark, b1, state, batch_id=1)
    assert dup.count() == 0
    # next real batch proceeds normally
    b2 = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
    kept2 = incremental_exact_dedup(spark, b2, state, batch_id=2)
    assert kept2.count() > 0


def test_exact_dedup_torn_staging_is_discarded(spark, tmp_path):
    """A staging without its meta marker (crash between the staging
    job commit and the marker write) must be discarded: the fps never
    landed, so the replay recomputes identical survivors."""
    import shutil

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    state = str(tmp_path / "fp_store_torn")
    b1 = docs.filter(F.col("doc_id") < 30)
    kept1 = incremental_exact_dedup(spark, b1, state, batch_id=0)
    n1 = kept1.count()
    # simulate the torn state: marker missing, fps not landed
    import os as _os

    _os.remove(state + ".pending.meta.json")
    shutil.rmtree(state)
    replay = incremental_exact_dedup(spark, b1, state, batch_id=0)
    assert replay.count() == n1  # recomputed identically, not dropped


def test_exact_dedup_replay_frame_survives_next_batch(spark, tmp_path):
    """The replay path's recorded survivor frame must be MATERIALIZED
    (eager localCheckpoint) like the fresh path: the pending staging it
    reads is swept by the NEXT batch's recovery, so a lazy frame
    consumed after that batch starts would fail with FileNotFound
    (r15 advice)."""
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    state = str(tmp_path / "fp_store_replay_pin")
    b1 = docs.filter(F.col("doc_id") < 30)
    kept1 = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(spark, b1, state, batch_id=0).collect()
    )
    # crash-replay of batch 0 — hold the returned frame UNCONSUMED
    replay = incremental_exact_dedup(spark, b1, state, batch_id=0)
    # the next batch's recovery sweep rmtree's the pending staging
    b2 = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 50))
    incremental_exact_dedup(spark, b2, state, batch_id=1).collect()
    assert sorted(r["doc_id"] for r in replay.collect()) == kept1


def test_single_part_file_escapes_glob_and_fails_loudly(tmp_path):
    """The staging→landing rename must tolerate glob metacharacters in
    the store path and name the failure when no part file exists —
    the bare glob.glob(...)[0] silently matched nothing on a path with
    [ * ? and crashed with IndexError (r15 advice)."""
    import pytest as _pytest

    from bigdata_flightanalysis_spark.operators.incremental import (
        _single_part_file,
    )

    meta = tmp_path / "out [v*2]?"
    meta.mkdir()
    (meta / "part-00000-abc.snappy.parquet").write_bytes(b"")
    assert _single_part_file(str(meta)).endswith(".parquet")
    empty = tmp_path / "empty_out"
    empty.mkdir()
    with _pytest.raises(FileNotFoundError, match="no part-"):
        _single_part_file(str(empty))


def test_content_mode_sweeps_torn_pending_retains_complete(spark, tmp_path):
    """Content-dedup mode (no batch_id) must reclaim a TORN
    exactly-once staging (dir without its complete marker+meta — a
    mid-staging crash), which previously only the exactly-once
    recovery path swept, so a deployment that crashed mid-staging and
    then ran content-mode-only leaked a batch-sized dir forever (r16
    review). A COMPLETE pending+meta is the retained replay record of
    a paused stream and must SURVIVE content-mode ingests — sweeping
    it would turn a later replay of that batch into silent loss."""
    import os as _os

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    state = str(tmp_path / "fp_store_mixed")
    pending = state + ".pending"
    b1 = docs.filter(F.col("doc_id") < 30)
    kept1 = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(spark, b1, state, batch_id=0).collect()
    )
    assert _os.path.exists(pending) and _os.path.exists(
        pending + ".meta.json"
    )
    # a content-mode ingest lands in between: the COMPLETE pending is
    # retained, and the paused stream's replay of batch 0 still
    # re-emits its recorded survivors afterwards
    b2 = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 45))
    incremental_exact_dedup(spark, b2, state).collect()
    assert _os.path.exists(pending) and _os.path.exists(
        pending + ".meta.json"
    )
    replay = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(spark, b1, state, batch_id=0).collect()
    )
    assert replay == kept1
    # tear the staging (meta gone = mid-staging crash) — the next
    # content-mode ingest reclaims dir AND sidecar
    _os.remove(pending + ".meta.json")
    assert _os.path.exists(pending)
    b3 = docs.filter((F.col("doc_id") >= 45) & (F.col("doc_id") < 55))
    incremental_exact_dedup(spark, b3, state).collect()
    assert not _os.path.exists(pending)
    assert not _os.path.exists(pending + ".meta.json")


def test_compact_embed_store_flat_store_error_names_flat_compactor(
    spark, tmp_path
):
    """compact_embed_store on an UNSTAMPED store must distinguish the
    two cases structurally: a flat band/fingerprint store (no bucket=
    dirs) gets pointed at compact_flat_store — the old one-size
    message sent it to rebucket_embed_store, which dies on a missing
    'e' column — while an unstamped bucketed legacy store keeps the
    rebucket advice (r16 review)."""
    import os as _os

    import pytest as _pytest

    from bigdata_flightanalysis_spark.operators.incremental import (
        _meta_path,
        compact_embed_store,
        incremental_embed_near_dup_pairs,
    )

    # flat store: the exact-dedup fingerprint store has no bucket= dirs
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    flat = str(tmp_path / "fp_flat")
    incremental_exact_dedup(spark, docs.filter(F.col("doc_id") < 20), flat)
    with _pytest.raises(ValueError, match="compact_flat_store"):
        compact_embed_store(spark, flat)

    # unstamped BUCKETED store: strip the stamp off a real embed store
    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "embed_store")
    incremental_embed_near_dup_pairs(
        spark, emb, store, id_col="vec_id", emb_col="embedding"
    )
    _os.remove(_meta_path(store))
    with _pytest.raises(ValueError, match="rebucket_embed_store"):
        compact_embed_store(spark, store)
