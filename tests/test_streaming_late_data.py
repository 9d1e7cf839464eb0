"""Watermark/late-data semantics: dropDuplicatesWithinWatermark keeps
dedup state only inside the watermark horizon — a duplicate arriving
after its key's state expired is emitted again, while one inside the
horizon is suppressed. Staged as two parquet files processed as two
micro-batches (maxFilesPerTrigger=1)."""

from __future__ import annotations

import datetime as dt
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.streaming.events import EVENTS_RAW_SCHEMA

_BASE = dt.datetime(2024, 1, 1)


def _ns(minute: int) -> int:
    return int((_BASE + dt.timedelta(minutes=minute)).timestamp() * 1_000_000_000)


def _write(path, rows):
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, path)


def test_dedup_state_expires_beyond_watermark(spark, tmp_path):
    stage = tmp_path / "stream"
    stage.mkdir()
    # Batch 1: user 1 'click' at t+0; user 2 'view' at t+240; the
    # max event time (t+300) sets the watermark to t+300 - 120 = t+180.
    _write(
        stage / "batch0.parquet",
        [
            (0, _ns(0), 1, "click"),
            (1, _ns(240), 2, "view"),
            (2, _ns(300), 3, "signup"),
        ],
    )
    time.sleep(1.1)  # file source orders batches by modification time
    # Batch 2 (watermark is now t+180; state eviction runs at END of
    # this batch — Spark evicts one batch after the watermark passes):
    # - user 2 'view' again at t+250: first occurrence (t+240) inside
    #   the horizon → suppressed.
    # - user 3 'signup' again at t+100: below the watermark → dropped
    #   as late data before the operator even sees it.
    _write(
        stage / "batch1.parquet",
        [
            (4, _ns(250), 2, "view"),
            (5, _ns(100), 3, "signup"),
        ],
    )
    time.sleep(1.1)
    # Batch 3: user 1 'click' again at t+200 — above the watermark, and
    # the first occurrence's state (expiry t+0 + 2h = t+120 < t+180)
    # was evicted at the end of batch 2 → re-emitted. Dedup is only
    # guaranteed WITHIN the watermark horizon; that's what bounds the
    # state store at scale.
    _write(
        stage / "batch2.parquet",
        [
            (3, _ns(200), 1, "click"),
        ],
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    deduped = events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )

    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    out = spark.table(name).collect()
    per_key = {}
    for r in out:
        per_key.setdefault((r["user_id"], r["event_type"]), []).append(r["event_id"])
    # expired state → duplicate re-emitted (both copies present)
    assert sorted(per_key[(1, "click")]) == [0, 3]
    # in-horizon duplicate → suppressed (first occurrence only)
    assert per_key[(2, "view")] == [1]
    assert per_key[(3, "signup")] == [2]
