"""Streaming == batch equivalence tests (SURVEY.md §7 hard-part 5).

Each streaming operator replays the sf0.001 events parquet with
Trigger.AvailableNow into a memory sink and must produce exactly the
rows of its oracle-checked batch twin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.queries.catalog import load_all
from bigdata_flightanalysis_spark.streaming import (
    run_to_memory,
    stream_events,
    streaming_session_windows,
    streaming_tumbling_hourly,
    streaming_unique_first_events,
    streaming_user_stats_stateful,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_streaming_tumbling_equals_batch(spark, registry):
    batch = registry["events_tumbling_hourly"].fn(spark, SF_DIR)
    stream = run_to_memory(
        streaming_tumbling_hourly(stream_events(spark, SF_DIR)), spark
    )
    cols = batch.columns
    assert _rows(stream, cols) == _rows(batch, cols)


def test_streaming_sliding_equals_batch(spark, registry):
    from bigdata_flightanalysis_spark.streaming import streaming_sliding_hourly

    batch = registry["events_sliding_hourly"].fn(spark, SF_DIR)
    stream = run_to_memory(
        streaming_sliding_hourly(stream_events(spark, SF_DIR)), spark
    )
    cols = batch.columns
    assert _rows(stream, cols) == _rows(batch, cols)


def test_streaming_sessions_equal_batch(spark, registry):
    batch = registry["events_session_windows"].fn(spark, SF_DIR)
    stream = run_to_memory(
        streaming_session_windows(stream_events(spark, SF_DIR)), spark
    )
    cols = batch.columns
    assert _rows(stream, cols) == _rows(batch, cols)


def test_streaming_dedup_equals_batch(spark, registry):
    # events.parquet rows arrive in ts order (asserted below), so
    # arrival-first == event-time-first and the streaming dedup must
    # reproduce the batch min-ts dedup exactly.
    from bigdata_flightanalysis_spark.sources.readers import read_table

    ev = read_table(spark, SF_DIR, "events")
    w_ordered = ev.orderBy("event_id").select("ts").collect()
    assert all(
        w_ordered[i]["ts"] <= w_ordered[i + 1]["ts"]
        for i in range(len(w_ordered) - 1)
    )

    batch = registry["events_dedup_first_per_user_type"].fn(spark, SF_DIR)
    stream = run_to_memory(
        streaming_unique_first_events(stream_events(spark, SF_DIR)),
        spark,
        output_mode="append",
    )
    cols = batch.columns
    assert _rows(stream, cols) == _rows(batch, cols)


def test_streaming_sliding_distinct_users_equals_batch(spark, registry, tmp_path):
    """Chained stateful operators (dedup → windowed agg → agg grouped on
    the window column) replayed in APPEND mode must equal the
    oracle-checked batch twin `events_sliding_distinct_users`.

    Append-mode aggregations only emit windows the watermark has
    passed, so the replay stages a far-future sentinel event as a
    SECOND micro-batch (maxFilesPerTrigger=1, mtime-ordered): the
    sentinel advances the watermark beyond every real window and
    flushes them; the sentinel's own windows stay in state and never
    reach the sink.
    """
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_flightanalysis_spark.sources.readers import normalize_event_ts
    from bigdata_flightanalysis_spark.streaming import (
        streaming_sliding_distinct_users,
    )
    from bigdata_flightanalysis_spark.streaming.events import events_stream_schema

    stage = tmp_path / "stream"
    stage.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", stage / "a_events.parquet")
    time.sleep(1.1)  # file source orders micro-batches by mtime
    max_ns = int(
        pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts"])["ts"]
        .to_pandas()
        .max()
        .value
    )
    sentinel_ns = max_ns + 365 * 24 * 3600 * 1_000_000_000
    # The sentinel file must carry the SAME arrow ts type as the real
    # events file (int64-ns or timestamp us/ns depending on testdata
    # generation) — a declared-schema file source reads every file with
    # one schema, so a type mismatch here corrupts the second batch.
    ts_type = pq.read_schema(f"{SF_DIR}/events.parquet").field("ts").type
    if pa.types.is_timestamp(ts_type):
        divisor = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}[ts_type.unit]
        sentinel_ts = pa.array([sentinel_ns // divisor], ts_type)
    else:
        sentinel_ts = pa.array([sentinel_ns], ts_type)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([-1], pa.int64()),
                "ts": sentinel_ts,
                "user_id": pa.array([-1], pa.int64()),
                "event_type": pa.array(["__sentinel__"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        ),
        stage / "b_sentinel.parquet",
    )
    raw = (
        spark.readStream.schema(events_stream_schema(spark, SF_DIR))
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    events = normalize_event_ts(raw)
    stream = run_to_memory(
        streaming_sliding_distinct_users(events), spark, output_mode="append"
    )
    batch = registry["events_sliding_distinct_users"].fn(spark, SF_DIR)
    cols = batch.columns
    assert _rows(stream, cols) == _rows(batch, cols)


def test_streaming_stream_stream_join_equals_batch(spark):
    """Stream-stream time-range join == batch range join on the same
    bounded replay."""
    from bigdata_flightanalysis_spark.operators.temporal import range_join_bucketed
    from bigdata_flightanalysis_spark.sources.readers import read_table
    from bigdata_flightanalysis_spark.streaming import streaming_purchase_click_join

    ev_stream = stream_events(spark, SF_DIR)
    purchases = ev_stream.filter(F.col("event_type") == "purchase")
    clicks = ev_stream.filter(F.col("event_type") == "click")
    stream = run_to_memory(
        streaming_purchase_click_join(purchases, clicks),
        spark,
        output_mode="append",
    )

    ev = read_table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    batch = range_join_bucketed(
        p, c, on="user_id", left_ts="ts", right_ts="ts", window_seconds=3600
    ).select(
        "purchase_id",
        "user_id",
        "click_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r"))).alias("lead_us"),
    )
    cols = ["purchase_id", "user_id", "click_id", "lead_us"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_streaming_stateful_user_stats(spark):
    from bigdata_flightanalysis_spark.sources.readers import read_table

    stream = run_to_memory(
        streaming_user_stats_stateful(stream_events(spark, SF_DIR)),
        spark,
        output_mode="update",
    )
    # One replay = one micro-batch per source split; the LAST update row
    # per user is the final state. With a single file it's one batch.
    final = stream.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
        F.max("max_value").alias("max_value"),
    )
    ev = read_table(spark, SF_DIR, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    )
    cols = ["user_id", "n_events", "max_value"]
    assert _rows(final, cols) == _rows(batch, cols)
    # float sums: compare with tolerance (stream accumulates per-batch)
    f = {r["user_id"]: r["total_value"] for r in final.collect()}
    b = {r["user_id"]: r["total_value"] for r in batch.collect()}
    assert f.keys() == b.keys()
    for k in f:
        assert abs(f[k] - b[k]) < 1e-6


def test_transform_with_state_matches_legacy_and_batch(spark):
    """Spark 4.x transformWithStateInPandas twin: final per-user state
    must equal BOTH the applyInPandasWithState operator's and the batch
    aggregate — the migration regression gate.

    The transformWithState runtime speaks protobuf to its state
    server; skip (don't fail) where the optional ``protobuf`` package
    is absent, mirroring the operator's documented dependency gate.
    """
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState needs the optional protobuf package",
    )
    from bigdata_flightanalysis_spark.sources.readers import read_table
    from bigdata_flightanalysis_spark.streaming.events import (
        streaming_user_stats_tws,
    )

    stream = run_to_memory(
        streaming_user_stats_tws(stream_events(spark, SF_DIR)),
        spark,
        output_mode="update",
    )
    final = stream.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )
    ev = read_table(spark, SF_DIR, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.max("value").alias("max_value")
    )
    cols = ["user_id", "n_events", "max_value"]
    assert _rows(final, cols) == _rows(batch, cols)


def test_stateful_user_stats_null_values_match_batch_semantics(spark, tmp_path):
    """Users whose values are all NULL must emit NULL total/max like
    the batch F.sum/F.max (NULL-ignoring) — pandas renders NULL as
    NaN, and the unguarded .max() returned NaN (which then STICKS
    through every later max) while .sum() returned 0.0 (r15 review)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "evnull"
    d.mkdir()
    base_us = 1_700_000_000_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(
                    [base_us + i * 1_000_000 for i in range(4)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([10, 10, 20, 20], pa.int64()),
                "event_type": pa.array(["a"] * 4, pa.string()),
                # user 10: all NULL; user 20: one NULL, one real
                "value": pa.array([None, None, None, 2.5], pa.float64()),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        ),
        d / "events.parquet",
    )
    from bigdata_flightanalysis_spark.sources.readers import read_table

    stream = run_to_memory(
        streaming_user_stats_stateful(stream_events(spark, str(d))),
        spark,
        output_mode="update",
    )
    final = stream.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
        F.max("max_value").alias("max_value"),
    )
    batch = (
        read_table(spark, str(d), "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
    )
    cols = ["user_id", "n_events", "total_value", "max_value"]
    assert _rows(final, cols) == _rows(batch, cols)
    got = {r["user_id"]: r for r in final.collect()}
    assert got[10]["total_value"] is None and got[10]["max_value"] is None
    assert got[20]["max_value"] == 2.5


def test_stream_schema_probe_does_not_leak_nanos_flag(spark):
    """The schema probe must set the session-global nanosAsLong flag
    only for the NANOS footer failure, not for ANY error (r15 review —
    same gate as sources.readers._read_events)."""
    from bigdata_flightanalysis_spark.streaming.events import (
        events_stream_schema,
    )

    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    with pytest.raises(Exception):
        events_stream_schema(spark, "/nonexistent_dir_for_probe")
    assert spark.conf.get(key, None) == before
