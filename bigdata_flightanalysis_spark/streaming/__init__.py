"""Structured Streaming surface (SURVEY.md §2.9 extension).

The reference is pure batch; this package provides the streaming twins
of the batch event-time queries in ``queries/events.py`` — same window
semantics, same output schemas — plus a custom stateful operator via
``applyInPandasWithState``. Tests assert stream(availableNow) == batch
on the same parquet input.
"""

from bigdata_flightanalysis_spark.streaming.events import (  # noqa: F401
    run_to_memory,
    stream_events,
    streaming_purchase_click_join,
    streaming_session_windows,
    streaming_sliding_distinct_users,
    streaming_sliding_hourly,
    streaming_tumbling_hourly,
    streaming_unique_first_events,
    streaming_user_stats_stateful,
)
