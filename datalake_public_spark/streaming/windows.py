"""Event-time windowed aggregations (tumbling / sliding / session).

Absent from the reference (SURVEY §2.7 explicit-absence list) but part of
this engine's surface. Each operator is a plain DataFrame→DataFrame
function over built-in expressions, so the SAME code path serves batch
frames (driver oracle checks) and streaming frames (micro-batch engine):
Catalyst plans ``window()``/``session_window()`` identically in both.

Watermarking: ``watermark`` is applied only when the input is streaming —
batch frames have no late-data concept. In append-mode streaming output a
window emits once the watermark passes its end; in complete mode (what
``run_available_now`` uses for oracle parity) every window is emitted.

Scale: windowed aggregation is a hash aggregate keyed on
(window, group cols) — partial aggregation map-side, one shuffle, state
store bounded by watermark eviction. A sliding window with slide s and
size w multiplies each row into w/s keys BEFORE the shuffle; keep w/s
small (2 here) or pre-aggregate to the slide granularity first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Non-overlapping fixed windows: count + sum per (window, key)."""
    ev = _maybe_watermark(events, ts_col, watermark)
    return (
        ev.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def sliding_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Overlapping windows (size ``window``, advancing every ``slide``):
    each row lands in window/slide windows."""
    ev = _maybe_watermark(events, ts_col, watermark)
    return (
        ev.groupBy(F.window(ts_col, window, slide).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "INTERVAL 30 MINUTES",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream (or batch) interval join: rows pair when keys match
    and the right event's time is within ``lookback`` before the left's.

    In streaming BOTH sides are watermarked and the time-bound predicate
    is what lets the engine evict join state — without it a stream-stream
    join buffers forever (Spark rejects it in append mode). Column names
    get ``l_``/``r_`` prefixes (a self-join of one stream would otherwise
    collide). Scale: state per key is bounded by watermark + lookback."""
    lt, rt = left, right
    if lt.isStreaming:
        lt = lt.withWatermark(left_ts, watermark)
    if rt.isStreaming:
        rt = rt.withWatermark(right_ts, watermark)
    lt = lt.select([F.col(c).alias(f"l_{c}") for c in lt.columns])
    rt = rt.select([F.col(c).alias(f"r_{c}") for c in rt.columns])
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") >= F.expr(f"l_{left_ts} - {lookback}"))
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}"))
    )
    return lt.join(rt, cond, "inner")


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: list[tuple[str, str]],
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream is
    joined against the (re-read per batch) static dimension — the
    canonical "decorate events with reference data" streaming pattern.

    ``on`` is [(stream_col, dim_col), ...]; ``dim_cols`` are the
    dimension attributes to carry. Inner join: events without a
    dimension row are dropped (use a left join variant for keep-and-null
    semantics).

    Scale: the dimension BROADCASTS (dimensions are small by
    construction), so the stream side never shuffles for the join and no
    join state accumulates — unlike a stream-stream join this is
    stateless. Works identically on a batch frame (same Catalyst plan),
    which is what gives it an exact oracle."""
    cond = None
    for s_col, d_col in on:
        c = events[s_col] == dim[d_col]
        cond = c if cond is None else (cond & c)
    return events.join(F.broadcast(dim), cond, "inner").select(
        *[events[c] for c in events.columns], *[dim[c] for c in dim_cols]
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first-seen row per key, with state
    bounded by the watermark (``dropDuplicatesWithinWatermark`` evicts a
    key's entry once the watermark passes its event time — the property
    that makes exact dedup runnable on an unbounded stream; plain
    ``dropDuplicates`` would grow state forever).

    Contract: duplicates arriving within the watermark horizon of the
    first occurrence are dropped; later-than-watermark duplicates (by
    definition out-of-contract late data) may reappear. On a batch frame
    this degrades to plain dropDuplicates."""
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def session_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Gap-based session windows per key: a session extends while
    successive events arrive within ``gap``; the window is half-open, so
    an event landing exactly at ``prev_ts + gap`` starts a NEW session.

    This is the declarative equivalent of the batch lag+running-sum
    sessionize in driver_queries.py — same boundaries, but expressed as
    ``F.session_window`` so the streaming engine maintains/merges session
    state incrementally instead of re-sorting history every run."""
    ev = _maybe_watermark(events, ts_col, watermark)
    return (
        ev.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("sess_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
