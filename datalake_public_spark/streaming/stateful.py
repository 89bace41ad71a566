"""Custom stateful streaming operator: per-key sessionization via
``applyInPandasWithState``.

``session_window_agg`` covers gap sessions declaratively; this operator
is the template for session logic Spark's built-ins can't express
(per-session event sequences, custom merge rules, enrichment of the
session record). State per user is a compact open-session tuple; output
rows are CLOSED sessions, emitted when the event-time watermark passes
``last_ts + gap`` (EventTimeTimeout), so state is bounded by watermark
eviction — the property that keeps this runnable on an unbounded stream.

Arrow moves each group's rows as pandas batches (not per-row pickling);
the grouping shuffle on the key column is the only exchange.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("sess_start", TimestampType()),
        StructField("sess_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# state: (sess_start_us, sess_end_us, n_events, sum_value)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def _us(ts: pd.Timestamp) -> int:
    return ts.value // 1_000


def _close(key: Any, start_us: int, end_us: int, n: int, sv: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key],
            "sess_start": [pd.Timestamp(start_us * 1_000)],
            "sess_end": [pd.Timestamp(end_us * 1_000)],
            "n_events": [n],
            "sum_value": [round(sv, 2)],
        }
    )


def sessionize_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the open session;
    emit sessions that close (gap exceeded mid-batch, or state timeout)."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, end_us, n, sv = state.get
        state.remove()
        yield _close(user_id, start_us, end_us, n, sv)
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    if state.exists:
        start_us, end_us, n, sv = state.get
    else:
        start_us = end_us = -1
        n, sv = 0, 0.0

    out: list[pd.DataFrame] = []
    for ts, v in zip(rows["ts"], rows["value"]):
        t = _us(ts)
        if n == 0:
            start_us, end_us, n, sv = t, t, 1, float(v)
        elif t - end_us >= GAP_US:
            out.append(_close(user_id, start_us, end_us, n, sv))
            start_us, end_us, n, sv = t, t, 1, float(v)
        else:
            end_us, n, sv = t, n + 1, sv + float(v)

    state.update((start_us, end_us, n, sv))
    # close the open session when the watermark passes its gap horizon
    state.setTimeoutTimestamp(end_us // 1_000 + GAP_US // 1_000)
    for pdf in out:
        yield pdf


def stateful_sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Closed sessions (30-min gap) per user over an event stream.

    Emission contract: a session is output only once it is PROVABLY closed
    — the watermark moved past ``sess_end + gap``. Trailing still-open
    sessions stay in state (they'd close on the next batch); with
    ``availableNow`` over a finite source this means sessions ending
    within ``gap`` of the stream's max timestamp are withheld — exactly
    the semantics the driver oracle mirrors with a
    ``sess_end + gap <= max(ts)`` filter."""
    ev = events.withWatermark(ts_col, watermark)
    return ev.groupBy(key_col).applyInPandasWithState(
        sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
