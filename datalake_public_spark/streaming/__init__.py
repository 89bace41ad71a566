"""Structured Streaming surface of the engine.

The reference emulates streaming with a 3-hourly Airflow cron over
snapshot files (``dags/dag_bike.py:36``; SURVEY §1.1 "no streams").
This package is the upgrade path SURVEY §7.2 step 7 describes: the same
DataFrame operators (flatten, windowed aggregation, sessionization) run
unchanged over ``readStream`` sources, with ``availableNow`` triggers
reproducing batch semantics exactly — which is also how the driver
contract verifies them against a SQL oracle.
"""

from datalake_public_spark.streaming.sources import events_stream, read_json_stream
from datalake_public_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from datalake_public_spark.streaming.runner import run_available_now

__all__ = [
    "events_stream",
    "read_json_stream",
    "run_available_now",
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
