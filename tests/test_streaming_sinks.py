"""Stream-static enrichment and the foreachBatch idempotent upsert
sink (exactly-once into a plain-parquet state directory)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.sources.readers import read_table
from bigdata_flightanalysis_spark.streaming.events import (
    run_foreach_batch,
    run_to_memory,
    stream_events,
    streaming_enrich_with_dim,
    upsert_foreach_batch,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_static_join_equals_batch(spark):
    dim = read_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = streaming_enrich_with_dim(
        stream_events(spark, SF_DIR), dim
    ).select("event_id", "user_id", "c_mktsegment")
    got = run_to_memory(enriched, spark, output_mode="append")

    batch = (
        read_table(spark, SF_DIR, "events")
        .join(
            F.broadcast(dim), F.col("user_id") == F.col("c_custkey"), "left"
        )
        .select("event_id", "user_id", "c_mktsegment")
    )
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert a == b


def _write_events_files(spark, base, n_files=3):
    """Stage the events table as n separate files (mod-time ordered)
    so AvailableNow + maxFilesPerTrigger=1 yields one batch per file."""
    import glob
    import shutil

    ev = read_table(spark, SF_DIR, "events").withColumn(
        "part", F.pmod(F.col("event_id"), F.lit(n_files))
    )
    os.makedirs(base, exist_ok=True)
    for i in range(n_files):
        tmp = f"{base}/.tmp{i}"
        (
            ev.filter(F.col("part") == i)
            .drop("part")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part_file = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part_file, f"{base}/f{i}.parquet")
        shutil.rmtree(tmp)
        time.sleep(1.1)  # distinct mod-times → deterministic batch order
    return base


def test_foreach_batch_upsert_latest_per_user(spark, tmp_path):
    src_dir = _write_events_files(spark, str(tmp_path / "src"))
    state = str(tmp_path / "state")

    src = (
        spark.readStream.schema(read_table(spark, SF_DIR, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    per_user = src.groupBy("user_id").agg(
        F.count("*").alias("n"), F.max("event_id").alias("max_event")
    )
    run_foreach_batch(
        per_user,
        upsert_foreach_batch(state, ["user_id"]),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="update",
    )

    got = spark.read.parquet(state)
    # Update-mode per-batch aggregates: the LAST version per user holds
    # the cumulative value (state carried across batches inside the agg)
    expected = (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("event_id").alias("max_event"))
    )
    a = sorted(
        (r["user_id"], r["n"], r["max_event"]) for r in got.collect()
    )
    b = sorted(tuple(r) for r in expected.collect())
    assert a == b


def test_foreach_batch_upsert_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    sink = upsert_foreach_batch(state, ["user_id"])
    batch = read_table(spark, SF_DIR, "events").groupBy("user_id").agg(
        F.count("*").alias("n")
    )
    sink(batch, 7)
    first = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    sink(batch, 7)  # crash-replay of the same batch id
    second = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    assert first == second


def test_streaming_parquet_sink_partitioned_by_date(spark, tmp_path):
    """Streaming file sink with partitionBy(event_date): the layout a
    100 TB event table needs so downstream readers partition-prune.
    AvailableNow drains the source; re-read must hit only the pruned
    directories."""
    out = str(tmp_path / "events_by_date")
    ev = stream_events(spark, SF_DIR).withColumn(
        "event_date", F.to_date("ts")
    )
    q = (
        ev.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .partitionBy("event_date")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    import os as _os

    dirs = [d for d in _os.listdir(out) if d.startswith("event_date=")]
    assert len(dirs) > 1  # real partition layout on disk

    back = spark.read.parquet(out)
    assert back.count() == spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    one_day = sorted(d.split("=")[1] for d in dirs)[0]
    pruned = back.filter(F.col("event_date") == one_day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan


def test_cdc_foreach_batch_stream_equals_batch_query(spark, tmp_path):
    """The CDC sink's final snapshot over a multi-batch replay of the
    events changelog must equal the batch compaction query
    (events_cdc_latest_state) — stream == batch for CDC."""
    from bigdata_flightanalysis_spark.queries.catalog import load_all
    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_snapshot,
        cdc_upsert_foreach_batch,
    )

    src_dir = _write_events_files(spark, str(tmp_path / "src"))
    state = str(tmp_path / "state")
    src = (
        spark.readStream.schema(read_table(spark, SF_DIR, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    sink = cdc_upsert_foreach_batch(
        state,
        ["user_id"],
        order_cols=["ts", "event_id"],
        tombstone_col="event_type",
        tombstone_value="error",
    )
    run_foreach_batch(src, sink, checkpoint_dir=str(tmp_path / "ckpt"))

    snap = cdc_snapshot(spark, state, "event_type", "error").select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )
    got = sorted(tuple(r) for r in snap.collect())
    want = sorted(
        tuple(r)
        for r in load_all()["events_cdc_latest_state"].fn(spark, SF_DIR).collect()
    )
    assert got == want
    assert len(got) > 0


def test_cdc_sink_tombstone_blocks_late_stale_upsert(spark, tmp_path):
    """A retained tombstone must out-win a LATE-ARRIVING older upsert
    (the resurrection bug dropping tombstones at merge time causes)."""
    from datetime import datetime

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_snapshot,
        cdc_upsert_foreach_batch,
    )

    state = str(tmp_path / "state")
    sink = cdc_upsert_foreach_batch(
        state,
        ["user_id"],
        order_cols=["ts", "event_id"],
        tombstone_col="event_type",
        tombstone_value="error",
    )
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t = datetime(2024, 1, 1, 12, 0, 0)
    # batch 0: user 1 deleted at 12:05
    sink(
        spark.createDataFrame(
            [(2, t.replace(minute=5), 1, "error", 0.0, "{}")], schema
        ),
        0,
    )
    # batch 1 (late replay of history): an OLDER upsert at 12:01
    sink(
        spark.createDataFrame(
            [(1, t.replace(minute=1), 1, "click", 1.0, "{}")], schema
        ),
        1,
    )
    live = cdc_snapshot(spark, state, "event_type", "error")
    assert live.count() == 0  # tombstone still wins; key stays deleted


def test_upsert_sink_recovers_from_crash_between_renames(spark, tmp_path):
    """The staging swap is two renames; a crash between them leaves no
    live state dir but a complete '.old'. The next micro-batch must
    rename '.old' back and merge against the FULL history — without
    recovery it would silently rebuild state from only its own rows
    (total-state loss, the round-6 advisor finding)."""
    state = str(tmp_path / "state")
    sink = upsert_foreach_batch(state, ["user_id"])
    b0 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "user_id bigint, v double"
    )
    sink(b0, 0)
    # simulate the crash window: path renamed away, staging never landed
    os.rename(state, state + ".old")
    assert not os.path.exists(state)
    b1 = spark.createDataFrame([(3, 30.0)], "user_id bigint, v double")
    sink(b1, 1)
    got = sorted(
        (r["user_id"], r["v"]) for r in spark.read.parquet(state).collect()
    )
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0)]  # history survived
    assert not os.path.exists(state + ".old")


def test_cdc_sink_recovers_from_crash_between_renames(spark, tmp_path):
    """Same crash-window recovery for the CDC sink: a tombstone written
    before the crash must still block resurrection after it."""
    from datetime import datetime

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_snapshot,
        cdc_upsert_foreach_batch,
    )

    state = str(tmp_path / "state")
    sink = cdc_upsert_foreach_batch(
        state,
        ["user_id"],
        order_cols=["ts", "event_id"],
        tombstone_col="event_type",
        tombstone_value="error",
    )
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t = datetime(2024, 1, 1, 12, 0, 0)
    sink(
        spark.createDataFrame(
            [(2, t.replace(minute=5), 1, "error", 0.0, "{}")], schema
        ),
        0,
    )
    os.rename(state, state + ".old")  # crash between the two renames
    sink(
        spark.createDataFrame(
            [(1, t.replace(minute=1), 1, "click", 1.0, "{}")], schema
        ),
        1,
    )
    # tombstone from the pre-crash history still wins over the late upsert
    assert cdc_snapshot(spark, state, "event_type", "error").count() == 0


def test_cdc_tombstone_compaction(spark, tmp_path):
    """Retention GC: tombstones older than the cutoff are finally
    dropped, the live view is unchanged, within-window tombstones
    stay (and keep blocking late stale upserts), and — the documented
    trade-off — a replayed change older than a DROPPED tombstone
    resurrects its key."""
    from datetime import datetime

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_compact_tombstones,
        cdc_snapshot,
        cdc_upsert_foreach_batch,
    )

    state = str(tmp_path / "state")
    sink = cdc_upsert_foreach_batch(
        state,
        ["user_id"],
        order_cols=["ts", "event_id"],
        tombstone_col="event_type",
        tombstone_value="error",
    )
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t = datetime(2024, 1, 1, 12, 0, 0)
    sink(
        spark.createDataFrame(
            [
                (1, t.replace(hour=1), 1, "error", 0.0, "{}"),   # old tombstone
                (2, t.replace(hour=11), 2, "error", 0.0, "{}"),  # recent tombstone
                (3, t.replace(hour=10), 3, "click", 3.0, "{}"),  # live row
            ],
            schema,
        ),
        0,
    )
    live_before = sorted(
        tuple(r)
        for r in cdc_snapshot(spark, state, "event_type", "error").collect()
    )
    cutoff = t.replace(hour=6)  # lateness horizon: drop tombstones < 06:00
    n = cdc_compact_tombstones(
        spark,
        state,
        tombstone_col="event_type",
        tombstone_value="error",
        order_col="ts",
        older_than=cutoff,
    )
    assert n == 1  # only user 1's old tombstone dropped
    live_after = sorted(
        tuple(r)
        for r in cdc_snapshot(spark, state, "event_type", "error").collect()
    )
    assert live_after == live_before  # live view unchanged by GC
    users = {r["user_id"] for r in spark.read.parquet(state).collect()}
    assert users == {2, 3}  # recent tombstone retained, old one gone

    # within-window tombstone still blocks a late stale upsert...
    sink(
        spark.createDataFrame(
            [(4, t.replace(hour=9), 2, "click", 2.0, "{}")], schema
        ),
        1,
    )
    assert (
        cdc_snapshot(spark, state, "event_type", "error")
        .where(F.col("user_id") == 2)
        .count()
        == 0
    )
    # ...while a replay OLDER than the dropped tombstone resurrects
    # (the documented GC trade-off — lateness beyond the horizon)
    sink(
        spark.createDataFrame(
            [(5, t.replace(hour=0, minute=30), 1, "click", 1.0, "{}")], schema
        ),
        2,
    )
    assert (
        cdc_snapshot(spark, state, "event_type", "error")
        .where(F.col("user_id") == 1)
        .count()
        == 1
    )


def test_state_contract_rejects_mismatched_reattach(spark, tmp_path):
    """A state dir is bound to the sink parameters that shaped it: a
    sink re-attached with different key columns must raise on its
    first micro-batch instead of silently merging on the wrong window
    partitioning. Matching re-attach keeps working; the sidecar
    survives the staging-dir swap."""
    import os

    import pytest

    from bigdata_flightanalysis_spark.streaming.events import (
        upsert_foreach_batch,
    )

    path = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k bigint, v string"
    )
    upsert_foreach_batch(path, ["k"])(batch, 0)
    assert os.path.exists(path + ".contract.json")

    with pytest.raises(ValueError, match="contract"):
        upsert_foreach_batch(path, ["v"])(batch, 1)

    # matching contract still applies batches (the swap kept the sidecar)
    upsert_foreach_batch(path, ["k"])(
        spark.createDataFrame([(2, "b2")], "k bigint, v string"), 1
    )
    rows = {
        r["k"]: r["v"] for r in spark.read.parquet(path).collect()
    }
    assert rows == {1: "a", 2: "b2"}


def test_upsert_sinks_reject_reserved_columns(spark, tmp_path):
    """The merge internals stamp ``_v``/``_rn`` via withColumn, which
    would silently REPLACE caller data of the same name and the
    post-merge drop would then delete it — both sinks must refuse the
    batch up front (r16 review; the deduplicate_exact reserved-name
    rule)."""
    import pytest

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_upsert_foreach_batch,
        upsert_foreach_batch,
    )

    batch = spark.createDataFrame(
        [(1, "a", 7)], "k bigint, _v string, _rn int"
    )
    with pytest.raises(ValueError, match="reserves"):
        upsert_foreach_batch(str(tmp_path / "s1"), ["k"])(batch, 0)
    with pytest.raises(ValueError, match="reserves"):
        cdc_upsert_foreach_batch(
            str(tmp_path / "s2"),
            ["k"],
            order_cols=["_rn"],
            tombstone_col="_v",
            tombstone_value="delete",
        )(batch, 0)


def test_anonymous_checkpoint_is_removed(spark, tmp_path, monkeypatch):
    """run_foreach_batch without a checkpoint_dir must remove its
    anonymous temp checkpoint — the caller never learns the path, so
    it can never be resumed and keeping it leaks a dir per run."""
    import tempfile

    made: list[str] = []
    real_mkdtemp = tempfile.mkdtemp

    def tracking_mkdtemp(*a, **kw):
        p = real_mkdtemp(*a, **kw)
        if kw.get("prefix", "").startswith("fb_ckpt_"):
            made.append(p)
        return p

    monkeypatch.setattr(tempfile, "mkdtemp", tracking_mkdtemp)

    src_dir = _write_events_files(spark, str(tmp_path / "src"))
    state = str(tmp_path / "state")
    src = (
        spark.readStream.schema(read_table(spark, SF_DIR, "events").schema)
        .parquet(src_dir)
    )
    per_user = src.groupBy("user_id").agg(F.count("*").alias("n"))
    run_foreach_batch(
        per_user, upsert_foreach_batch(state, ["user_id"])
    )
    assert made, "the anonymous checkpoint path was not created"
    assert not os.path.exists(made[0])


def test_state_reset_clears_orphaned_contract(spark, tmp_path):
    """rmtree(state_path) is the defined reset; the contract sidecar
    lives NEXT to the dir and survives it, so a reset + re-attach with
    different key columns must re-stamp, not raise against state that
    no longer exists. But a dir missing with .old PRESENT is a swap
    crash, not a reset — the contract must still be enforced there."""
    import shutil

    from bigdata_flightanalysis_spark.streaming.events import (
        upsert_foreach_batch,
    )

    path = str(tmp_path / "state")
    batch = spark.createDataFrame([(1, "a")], "k bigint, v string")
    upsert_foreach_batch(path, ["k"])(batch, 0)
    assert os.path.exists(path + ".contract.json")

    # full reset → re-attach with different keys succeeds and restamps
    shutil.rmtree(path)
    upsert_foreach_batch(path, ["v"])(batch, 0)
    import json

    with open(path + ".contract.json", encoding="utf-8") as f:
        assert json.load(f)["key_cols"] == ["v"]

    # crash-between-renames state (.old only): NOT a reset — enforce
    import pytest as _pytest

    os.rename(path, path + ".old")
    with _pytest.raises(ValueError, match="contract"):
        upsert_foreach_batch(path, ["k"])(batch, 1)


def test_state_contract_tolerates_tuple_and_key_order(spark, tmp_path):
    """Round-8 advisory: the contract compared JSON-round-tripped
    dicts with !=, so key_cols passed as a TUPLE (or the same keys
    permuted) spuriously failed every re-attach after the first
    stamp. key_cols now compare as a sorted list — partitioning is a
    set operation; order_cols (changelog semantics) stay
    order-sensitive."""
    import pytest

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_upsert_foreach_batch,
        upsert_foreach_batch,
    )

    path = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], "k bigint, g string, v string"
    )
    upsert_foreach_batch(path, ["k", "g"])(batch, 0)
    # tuple + permuted keys: same contract, must keep applying batches
    upsert_foreach_batch(path, ("g", "k"))(
        spark.createDataFrame([(2, "y", "b2")], "k bigint, g string, v string"),
        1,
    )
    rows = {(r["k"], r["g"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert rows == {(1, "x"): "a", (2, "y"): "b2"}
    # genuinely different keys still raise
    with pytest.raises(ValueError, match="contract"):
        upsert_foreach_batch(path, ["k"])(batch, 2)

    # order_cols ORDER is semantic: a permuted re-attach must raise
    cdc_path = str(tmp_path / "cdc_state")
    cdc = spark.createDataFrame(
        [(1, 10, 1, "a", "U")],
        "k bigint, ts bigint, seq bigint, v string, op string",
    )
    sink = cdc_upsert_foreach_batch(
        cdc_path,
        ["k"],
        order_cols=["ts", "seq"],
        tombstone_col="op",
        tombstone_value="D",
    )
    sink(cdc, 0)
    with pytest.raises(ValueError, match="contract"):
        cdc_upsert_foreach_batch(
            cdc_path,
            ["k"],
            order_cols=["seq", "ts"],
            tombstone_col="op",
            tombstone_value="D",
        )(cdc, 1)


def test_normalize_contract_key_permutations_property():
    """Property: any permutation of key_cols (list or tuple) normalizes
    to the same contract; any permutation of order_cols that actually
    changes the order does NOT."""
    import itertools

    from bigdata_flightanalysis_spark.streaming.events import (
        _normalize_contract,
    )

    keys = ["k1", "k2", "k3"]
    base = _normalize_contract(
        {"sink": "cdc", "key_cols": keys, "order_cols": ["ts", "seq"]}
    )
    for perm in itertools.permutations(keys):
        for form in (list(perm), tuple(perm)):
            assert (
                _normalize_contract(
                    {"sink": "cdc", "key_cols": form, "order_cols": ["ts", "seq"]}
                )
                == base
            )
    assert (
        _normalize_contract(
            {"sink": "cdc", "key_cols": keys, "order_cols": ["seq", "ts"]}
        )
        != base
    )
    # JSON round-trip stability: normalizing a normalized contract is a no-op
    import json

    assert _normalize_contract(json.loads(json.dumps(base))) == base


def test_cdc_snapshot_heals_swap_crash_window(spark, tmp_path):
    """A crash between the CDC sink's two renames (live state gone,
    complete .old) must not fail reads until the next micro-batch —
    cdc_snapshot heals the window first, like every other reader of a
    swapped dir."""
    import os as _os

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_snapshot,
        cdc_upsert_foreach_batch,
    )

    state = str(tmp_path / "state")
    sink = cdc_upsert_foreach_batch(
        state,
        ["user_id"],
        order_cols=["ts", "event_id"],
        tombstone_col="event_type",
        tombstone_value="error",
    )
    ev = read_table(spark, SF_DIR, "events")
    sink(ev, 0)
    before = sorted(
        tuple(r)
        for r in cdc_snapshot(spark, state, "event_type", "error").collect()
    )
    _os.rename(state, state + ".old")  # the crash window

    # heal=False is the outside-the-maintenance-domain reader: it must
    # NOT mutate the dir (restoring .old mid-swap would fail a live
    # sink's rename) — it surfaces the transient state loudly instead
    import pytest as _pytest

    with _pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist"):
        cdc_snapshot(
            spark, state, "event_type", "error", heal=False
        ).collect()
    assert _os.path.exists(state + ".old") and not _os.path.exists(state)

    got = sorted(
        tuple(r)
        for r in cdc_snapshot(spark, state, "event_type", "error").collect()
    )
    assert got == before
    assert _os.path.exists(state) and not _os.path.exists(state + ".old")

    # healthy dir: heal=False reads identically, still touching nothing
    got2 = sorted(
        tuple(r)
        for r in cdc_snapshot(
            spark, state, "event_type", "error", heal=False
        ).collect()
    )
    assert got2 == before


def test_state_maintenance_serializes_against_sink(spark, tmp_path):
    """The streaming-state twin of the store-rewrite race (r9 verdict
    defect #2 class): tombstone compaction swapping between a sink
    batch's state read and its own swap loses one side — the sink's
    committed batch, in the worst case. Both now hold the state's
    per-path maintenance lock: (a) a sink batch entering while the
    lock is held must block; (b) a compaction racing a sink batch
    must lose neither the batch's keys nor the compaction's drop."""
    import threading
    from datetime import datetime

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_compact_tombstones,
        cdc_snapshot,
        cdc_upsert_foreach_batch,
    )
    from bigdata_flightanalysis_spark.util import path_lock

    state = str(tmp_path / "state")
    sink = cdc_upsert_foreach_batch(
        state,
        ["user_id"],
        order_cols=["ts", "event_id"],
        tombstone_col="event_type",
        tombstone_value="error",
    )
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t = datetime(2024, 1, 1, 12, 0, 0)
    sink(
        spark.createDataFrame(
            [
                (1, t.replace(hour=1), 1, "error", 0.0, "{}"),
                (2, t.replace(hour=10), 2, "click", 2.0, "{}"),
            ],
            schema,
        ),
        0,
    )

    # (a) lock held (in-flight maintenance) => the next batch blocks
    done = threading.Event()

    def batch1():
        sink(
            spark.createDataFrame(
                [(3, t.replace(hour=11), 3, "click", 3.0, "{}")], schema
            ),
            1,
        )
        done.set()

    th = threading.Thread(target=batch1)
    with path_lock(state):
        th.start()
        assert not done.wait(3.0), "sink batch ran during maintenance"
    th.join(120)
    assert done.is_set()

    # (b) concurrent compaction + a new batch: serialized in SOME
    # order — afterwards the batch's key is live AND the dead
    # tombstone is gone, whichever side won the lock
    errs = []

    def run(fn):
        try:
            fn()
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    def compact():
        cdc_compact_tombstones(
            spark,
            state,
            tombstone_col="event_type",
            tombstone_value="error",
            order_col="ts",
            older_than=t.replace(hour=6),
        )

    def batch2():
        sink(
            spark.createDataFrame(
                [(4, t.replace(hour=11), 4, "click", 4.0, "{}")], schema
            ),
            2,
        )

    t_compact = threading.Thread(target=run, args=(compact,))
    t_batch = threading.Thread(target=run, args=(batch2,))
    t_compact.start()
    t_batch.start()
    t_compact.join(300)
    t_batch.join(300)
    assert not errs
    rows = spark.read.parquet(state)
    live = {r["user_id"] for r in rows.collect()}
    assert live == {2, 3, 4}, live  # batch kept, dead tombstone dropped
    snap = {
        r["user_id"]
        for r in cdc_snapshot(spark, state, "event_type", "error").collect()
    }
    assert snap == {2, 3, 4}


def test_compaction_rejects_mismatched_contract(spark, tmp_path):
    """cdc_compact_tombstones is the one operation whose parameter
    mismatch DESTROYS data (live rows classified as dead tombstones),
    so it must verify the caller's parameters against the recorded
    sink contract before the irreversible drop (r13 review)."""
    from datetime import datetime

    import pytest

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_compact_tombstones,
        cdc_upsert_foreach_batch,
    )

    state = str(tmp_path / "state")
    sink = cdc_upsert_foreach_batch(
        state,
        ["user_id"],
        order_cols=["ts", "event_id"],
        tombstone_col="event_type",
        tombstone_value="error",
    )
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t = datetime(2024, 1, 1, 12, 0, 0)
    sink(
        spark.createDataFrame(
            [(1, t.replace(hour=1), 1, "click", 1.0, "{}")], schema
        ),
        0,
    )
    # wrong tombstone_value: would drop the live 'click' row
    with pytest.raises(ValueError, match="tombstone_value"):
        cdc_compact_tombstones(
            spark,
            state,
            tombstone_col="event_type",
            tombstone_value="click",
            order_col="ts",
            older_than=t,
        )
    # wrong order column: the cutoff wouldn't trail the merge ordering
    with pytest.raises(ValueError, match="order_col"):
        cdc_compact_tombstones(
            spark,
            state,
            tombstone_col="event_type",
            tombstone_value="error",
            order_col="value",
            older_than=0.0,
        )
    # matching parameters still run (nothing to drop here)
    assert (
        cdc_compact_tombstones(
            spark,
            state,
            tombstone_col="event_type",
            tombstone_value="error",
            order_col="ts",
            older_than=t,
        )
        == 0
    )
    assert spark.read.parquet(state).count() == 1  # live row intact


def test_compaction_rejects_non_cdc_state_dir(spark, tmp_path):
    """A state dir stamped by the PLAIN upsert sink has none of the
    CDC contract keys, so the per-parameter guards all vacuously pass
    — the sink-kind check must reject it outright before the
    irreversible drop classifies live rows as tombstones (r13
    driver ADVICE)."""
    from datetime import datetime

    import pytest

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_compact_tombstones,
    )

    state = str(tmp_path / "state")
    sink = upsert_foreach_batch(state, ["user_id"])
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t = datetime(2024, 1, 1, 12, 0, 0)
    sink(
        spark.createDataFrame(
            [(1, t.replace(hour=1), 1, "error", 1.0, "{}")], schema
        ),
        0,
    )
    # Without the sink-kind check this call would have dropped the
    # live 'error' row: the plain-upsert sidecar records no
    # tombstone_col/tombstone_value/order_cols, so every .get() guard
    # returns None and the compaction proceeds.
    with pytest.raises(ValueError, match="'upsert' sink, not cdc_upsert"):
        cdc_compact_tombstones(
            spark,
            state,
            tombstone_col="event_type",
            tombstone_value="error",
            order_col="ts",
            older_than=t,
        )
    assert spark.read.parquet(state).count() == 1  # live row intact


def test_cdc_snapshot_keeps_null_tombstone_rows(spark, tmp_path):
    """A NULL tombstone column means 'not tombstoned': plain != would
    evaluate NULL and silently drop never-deleted keys from the live
    view (r13 review)."""
    from datetime import datetime

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_snapshot,
        cdc_upsert_foreach_batch,
    )

    state = str(tmp_path / "state")
    sink = cdc_upsert_foreach_batch(
        state,
        ["user_id"],
        order_cols=["ts", "event_id"],
        tombstone_col="event_type",
        tombstone_value="error",
    )
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t = datetime(2024, 1, 1, 12, 0, 0)
    sink(
        spark.createDataFrame(
            [
                (1, t, 1, None, 1.0, "{}"),      # NULL marker: live
                (2, t, 2, "error", 0.0, "{}"),   # tombstoned
                (3, t, 3, "click", 3.0, "{}"),   # live
            ],
            schema,
        ),
        0,
    )
    live = {
        r["user_id"]
        for r in cdc_snapshot(spark, state, "event_type", "error").collect()
    }
    assert live == {1, 3}


def test_run_to_memory_drops_its_sink_table(spark):
    """Each run_to_memory call must not leak a uuid-named in-memory
    table for the session's lifetime; the returned frame stays usable
    after the view is dropped (r13 review)."""
    views_before = {t.name for t in spark.catalog.listTables()}
    got = run_to_memory(
        stream_events(spark, SF_DIR).select("event_id"),
        spark,
        output_mode="append",
    )
    assert got.count() > 0  # usable after the drop
    views_after = {t.name for t in spark.catalog.listTables()}
    assert not {v for v in views_after - views_before if v.startswith("sink_")}


def test_upsert_intra_batch_ties_break_deterministically(spark, tmp_path):
    """Two rows for one key in one micro-batch share _v; the winner
    must be a pure function of the data (content-hash tie-break), not
    of partition order — two independent applies of the same batch
    must produce byte-identical state (r13 review)."""
    rows = [(7, "a", 1.0), (7, "b", 2.0), (8, "c", 3.0)]
    schema = "user_id bigint, tag string, value double"
    states = []
    for i, nparts in enumerate((1, 7)):  # different partitionings too
        state = str(tmp_path / f"state_{i}")
        sink = upsert_foreach_batch(state, ["user_id"])
        sink(spark.createDataFrame(rows, schema).repartition(nparts), 0)
        states.append(
            sorted(tuple(r) for r in spark.read.parquet(state).collect())
        )
    assert states[0] == states[1]


def test_compaction_keeps_null_tombstone_col_rows(spark, tmp_path):
    """A row whose tombstone_col is NULL is LIVE (cdc_snapshot's
    eqNullSafe convention) — compaction classified it with plain ==,
    making the predicate NULL and silently dropping the row from the
    kept set WITHOUT counting it in n_drop (r14 review: irreversible
    loss of live keys)."""
    from datetime import datetime

    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_compact_tombstones,
        cdc_snapshot,
        cdc_upsert_foreach_batch,
    )

    state = str(tmp_path / "state")
    sink = cdc_upsert_foreach_batch(
        state,
        ["user_id"],
        order_cols=["ts", "event_id"],
        tombstone_col="event_type",
        tombstone_value="error",
    )
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t = datetime(2024, 1, 1, 12, 0, 0)
    sink(
        spark.createDataFrame(
            [
                (1, t.replace(hour=1), 1, None, 1.0, "{}"),     # live, NULL type, OLD
                (2, t.replace(hour=1), 2, "error", 0.0, "{}"),  # old tombstone
                (3, t.replace(hour=11), 3, "click", 3.0, "{}"),  # live
            ],
            schema,
        ),
        0,
    )
    n = cdc_compact_tombstones(
        spark,
        state,
        tombstone_col="event_type",
        tombstone_value="error",
        order_col="ts",
        older_than=t.replace(hour=6),
    )
    assert n == 1  # only the genuine old tombstone
    kept = {r["user_id"] for r in spark.read.parquet(state).collect()}
    assert kept == {1, 3}, kept  # the NULL-typed live row SURVIVES
    snap = {
        r["user_id"]
        for r in cdc_snapshot(spark, state, "event_type", "error").collect()
    }
    assert snap == {1, 3}
