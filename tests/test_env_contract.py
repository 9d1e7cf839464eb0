"""Environment-contract checks (SURVEY.md §5 determinism posture).

Round 4 lost its entire perf signal to silent environment drift: the
installed Spark moved to 4.x, which reads the events parquet timestamp
column as TIMESTAMP_NTZ instead of the raw-int64 fallback, and every
``unix_micros``/window path downstream broke or silently computed
1970-epoch garbage. These tests pin the contract at its root so the
same class of drift fails loudly in one cheap test instead of 13
confusing ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.sources.readers import (
    normalize_event_ts,
    read_table,
)
from tests.conftest import SF_DIR


def test_events_reader_yields_session_timestamp(spark):
    """The batch events reader must surface ``ts`` as a session-tz
    TIMESTAMP — not TIMESTAMP_NTZ, not bigint — whatever the installed
    Spark reads the parquet column as."""
    ev = read_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_events_ts_values_are_sane_epochs(spark):
    """Guard the garbage-timestamp failure mode (int64-µs read under a
    LongType schema lands every event in January 1970)."""
    ev = read_table(spark, SF_DIR, "events")
    row = ev.agg(
        F.min(F.year("ts")).alias("y_min"), F.max(F.year("ts")).alias("y_max")
    ).first()
    assert 2000 <= row["y_min"] <= row["y_max"] <= 2100, row


def test_unix_micros_works_on_events_ts(spark):
    """The exact expression that crashed round 4's bench
    (DATATYPE_MISMATCH: unix_micros requires TIMESTAMP, got
    TIMESTAMP_NTZ) must analyze and execute."""
    ev = read_table(spark, SF_DIR, "events")
    assert ev.select(F.unix_micros("ts").alias("us")).first()["us"] > 0


def test_stream_schema_matches_batch_source(spark):
    """The streaming file-source schema is probed from the same file
    the batch reader scans, and the shared normalizer brings both to
    an identical TIMESTAMP ts."""
    from bigdata_flightanalysis_spark.streaming.events import events_stream_schema

    schema = events_stream_schema(spark, SF_DIR)
    batch = read_table(spark, SF_DIR, "events")
    stream_like = normalize_event_ts(
        spark.read.schema(schema).parquet(f"{SF_DIR}/events.parquet")
    )
    assert stream_like.dtypes == batch.dtypes


def test_normalize_event_ts_bigint_branch(spark):
    """Older Sparks surface TIMESTAMP(NANOS) as int64 under
    ``nanosAsLong``; the normalizer must truncate ns→µs in integer
    space (2^53-safe) for that shape too."""
    ns = 1_700_000_000_123_456_789  # epoch ns, > 2^53
    df = spark.createDataFrame([(ns,)], "ts: bigint")
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.select(F.unix_micros("ts").alias("us")).first()["us"] == ns // 1000


def test_get_session_warns_on_dropped_static_conf(spark):
    """A same-master reuse that silently drops a requested STATIC conf
    must warn — the old check only compared masters (r16 review)."""
    import warnings

    import pytest

    from bigdata_flightanalysis_spark.session import get_session

    with pytest.warns(RuntimeWarning, match="NOT applied"):
        get_session(
            "reuse-probe",
            extra_conf={"spark.sql.extensions": "com.example.NoSuchExt"},
        )
    # a reuse whose requests all match the live session stays silent
    live_cores = int(spark.sparkContext.master.split("[")[1].rstrip("]"))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        get_session("reuse-probe-clean", cores=live_cores)
