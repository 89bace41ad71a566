"""SCD2 semantics: version close/open, no-op deltas, new keys, CDC
replay idempotency, and point-in-time reads."""

from __future__ import annotations

from datalake_public_spark.operators.scd import as_of, scd2_apply, snapshot_open


def _hist_rows(df):
    return {
        (r.id, r.city, str(r.valid_from)[:10], str(r.valid_to)[:10] if r.valid_to else None, r.is_current)
        for r in df.collect()
    }


def _dim(spark, rows):
    return spark.createDataFrame(rows, ["id", "city"])


def test_change_closes_and_opens_version(spark):
    hist = snapshot_open(_dim(spark, [(1, "paris"), (2, "lyon")]), effective_ts="2024-01-01")
    delta = _dim(spark, [(1, "nice")])
    out = scd2_apply(
        hist, delta, key_cols=("id",), tracked_cols=("city",), effective_ts="2024-06-01"
    )
    assert _hist_rows(out) == {
        (1, "paris", "2024-01-01", "2024-06-01", False),
        (1, "nice", "2024-06-01", None, True),
        (2, "lyon", "2024-01-01", None, True),
    }


def test_noop_delta_and_replay_are_idempotent(spark):
    hist = snapshot_open(_dim(spark, [(1, "paris")]), effective_ts="2024-01-01")
    delta = _dim(spark, [(1, "nice")])
    once = scd2_apply(
        hist, delta, key_cols=("id",), tracked_cols=("city",), effective_ts="2024-06-01"
    )
    # replaying the same CDC delta later must change nothing (no-op path)
    twice = scd2_apply(
        once, delta, key_cols=("id",), tracked_cols=("city",), effective_ts="2024-09-01"
    )
    assert _hist_rows(twice) == _hist_rows(once)


def test_new_key_inserted_open(spark):
    hist = snapshot_open(_dim(spark, [(1, "paris")]), effective_ts="2024-01-01")
    out = scd2_apply(
        hist,
        _dim(spark, [(7, "brest")]),
        key_cols=("id",),
        tracked_cols=("city",),
        effective_ts="2024-06-01",
    )
    assert (7, "brest", "2024-06-01", None, True) in _hist_rows(out)
    assert (1, "paris", "2024-01-01", None, True) in _hist_rows(out)


def test_as_of_point_in_time(spark):
    hist = snapshot_open(_dim(spark, [(1, "paris")]), effective_ts="2024-01-01")
    hist2 = scd2_apply(
        hist,
        _dim(spark, [(1, "nice")]),
        key_cols=("id",),
        tracked_cols=("city",),
        effective_ts="2024-06-01",
    )
    assert [r.city for r in as_of(hist2, "2024-03-01").collect()] == ["paris"]
    assert [r.city for r in as_of(hist2, "2024-07-01").collect()] == ["nice"]
    # exactly at the boundary the NEW version is live (valid_to exclusive)
    assert [r.city for r in as_of(hist2, "2024-06-01").collect()] == ["nice"]
