"""Arbitrary stateful streaming via ``transformWithStateInPandas``
(Spark 4's successor to ``applyInPandasWithState``).

The processor-object API adds what the function API can't express:
named state variables (value/list/map) with per-state TTL, timers
decoupled from watermarks, and schema evolution of state. This module
pins the engine's template for it: a per-key running aggregate whose
state survives across micro-batches in the RocksDB state store
(transformWithState requires the RocksDB provider — the HDFS-backed
default store doesn't implement the virtual-column-family layout the
new operator needs).

Emission contract (Update mode): every key seen in a micro-batch emits
its UPDATED running totals once per batch. Over an ``availableNow``
drain of a single-file source there is exactly one data batch, so the
emitted rows equal the batch ``groupBy`` — which is what the driver's
DuckDB oracle checks. Money is accumulated as integer cents, so the
running sum is order- and engine-independent.

Scale: state is one fixed-width row per key, hash-partitioned with the
grouping shuffle; RocksDB spills state to local disk, so keyspace is
bounded by disk not heap. Each group's batch rows arrive as Arrow
batches (no per-row Python).

Runtime dependency: Spark's TWS Python state protocol needs the
``protobuf`` runtime (``google.protobuf``) in the Python workers —
absent it, the streaming runner crashes at init
([STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE]). ``HAVE_PROTOBUF``
gates registration/tests so environments without it skip cleanly; the
operator itself is complete and runs wherever protobuf is present.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

if TYPE_CHECKING:  # timer values only used for typing
    from pyspark.sql.streaming.stateful_processor import TimerValues

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_cents", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

try:  # TWS state protocol requires the protobuf runtime (see module docstring)
    import google.protobuf  # noqa: F401

    HAVE_PROTOBUF = True
except ImportError:
    HAVE_PROTOBUF = False


class RunningUserStats(StatefulProcessor):
    """Per-user running (count, cents-sum) value state; emits the updated
    totals for every key that received rows in the micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        n, cents = self._state.get() if self._state.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            # exact: values are 2-dp money, so round(v*100) is an integer
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        self._state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value_cents": [cents]}
        )

    def close(self) -> None:
        pass


def transform_with_state_user_stats(events: DataFrame) -> DataFrame:
    """Running per-user event count + cents-sum over an event stream.

    The caller must run this on a session whose
    ``spark.sql.streaming.stateStore.providerClass`` is the RocksDB
    provider (see ``with_rocksdb_state`` / the driver query)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
