"""Checkpoint recovery: a restarted query must resume from the
committed offsets — already-processed files are not reprocessed, new
files are, and the file sink stays exactly-once across the restart."""

from __future__ import annotations

import datetime as dt
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.streaming.events import EVENTS_RAW_SCHEMA

_BASE = dt.datetime(2024, 1, 1)


def _write(path, ids):
    rows = [(i, int((_BASE + dt.timedelta(minutes=i)).timestamp() * 1e9), i % 3, "click")
            for i in ids]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        path,
    )


def _run_once(spark, src, out, cp):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .select("event_id", "user_id", "ts")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    _write(src / "a.parquet", range(0, 50))
    _run_once(spark, str(src), out, cp)
    first = spark.read.parquet(out)
    assert first.count() == 50

    time.sleep(1.1)
    _write(src / "b.parquet", range(50, 80))
    _run_once(spark, str(src), out, cp)  # restart with same checkpoint

    final = spark.read.parquet(out)
    ids = sorted(r["event_id"] for r in final.collect())
    # exactly-once: batch A not reprocessed, batch B appended once
    assert ids == list(range(80))
