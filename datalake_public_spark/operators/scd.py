"""Slowly-changing-dimension type 2: versioned dimension history.

The reference's dimension (station_information) is overwritten per
snapshot (``transform_si_velib_with_spark.py:94``) — station moves or
capacity changes silently rewrite history. SCD2 keeps every version:
rows carry ``valid_from`` / ``valid_to`` / ``is_current``, updates CLOSE
the old version and OPEN a new one, and point-in-time joins become
``valid_from <= ts < coalesce(valid_to, 'infinity')`` range predicates.

``scd2_apply`` is a pure transform (history, changes) → new history, so
it composes with sinks/upsert.py for the write and is oracle-testable.
Change detection is null-safe per tracked column; a delta row whose
tracked attributes equal the open version is a no-op (idempotent CDC
replays).

Scale: one shuffle of the OPEN slice on the key (closed history passes
through untouched — at 100 TB keep open/closed in separate partitions
so the scan prunes); the delta side is typically small → AQE broadcasts
it. No windows, no full-history rewrite.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_tracked_differs(tracked_cols: tuple[str, ...]) -> Column:
    diffs = [~F.col(f"u.{c}").eqNullSafe(F.col(f"o.{c}")) for c in tracked_cols]
    return reduce(lambda a, b: a | b, diffs)


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    *,
    key_cols: tuple[str, ...],
    tracked_cols: tuple[str, ...],
    effective_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Fold a CDC delta into an SCD2 history table.

    ``history``: dim columns + valid_from/valid_to/is_current.
    ``changes``: dim columns only (a DELTA — absent keys mean no change).
    ``effective_ts``: SQL timestamp literal text, e.g. ``'2024-06-01'``;
    closes changed versions and opens their replacements at that instant.
    """
    eff = F.to_timestamp(F.lit(effective_ts))
    dim_cols = [c for c in history.columns if c not in (valid_from, valid_to, is_current)]

    closed_hist = history.filter(~F.col(is_current))
    open_rows = history.filter(F.col(is_current))

    # changed = delta rows whose tracked attrs differ from the open version
    changed = (
        changes.alias("u")
        .join(open_rows.alias("o"), list(key_cols))
        .filter(_any_tracked_differs(tracked_cols))
        .select([F.col(f"u.{c}") for c in changes.columns])
    )
    # brand-new keys (no open version at all)
    born = changes.join(open_rows, list(key_cols), "left_anti")
    inserts = changed.unionByName(born).select(
        *dim_cols,
        eff.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(is_current),
    )

    to_close = (
        open_rows.join(changed.select(*key_cols), list(key_cols), "left_semi")
        .withColumn(valid_to, eff)
        .withColumn(is_current, F.lit(False))
    )
    still_open = open_rows.join(changed.select(*key_cols), list(key_cols), "left_anti")

    cols = dim_cols + [valid_from, valid_to, is_current]
    return (
        closed_hist.select(cols)
        .unionByName(to_close.select(cols))
        .unionByName(still_open.select(cols))
        .unionByName(inserts.select(cols))
    )


def snapshot_open(dim: DataFrame, *, effective_ts: str) -> DataFrame:
    """Bootstrap an SCD2 history from a plain dimension snapshot: every
    row open as of ``effective_ts``."""
    return dim.select(
        "*",
        F.to_timestamp(F.lit(effective_ts)).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def as_of(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time view: the version of each key valid at ``ts``."""
    t = F.to_timestamp(F.lit(ts))
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
