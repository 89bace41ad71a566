"""Keyed MERGE on plain parquet: partition-scoped copy-on-write
semantics, untouched-partition preservation, stale-key guard, and
emptied-partition cleanup."""

from __future__ import annotations

import os

import pytest

from datalake_public_spark.sinks.upsert import delete_by_key, upsert_partitioned


def _seed(spark, path):
    df = spark.createDataFrame(
        [
            (1, "a", "d1"),
            (2, "b", "d1"),
            (3, "c", "d2"),
            (4, "d", "d3"),
        ],
        ["id", "val", "day"],
    )
    df.write.mode("overwrite").partitionBy("day").parquet(path)


def _rows(spark, path):
    return {
        (r.id, r.val, r.day) for r in spark.read.parquet(path).collect()
    }


def test_upsert_replaces_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    upserts = spark.createDataFrame(
        [(2, "B2", "d1"), (9, "new", "d1")], ["id", "val", "day"]
    )
    n = upsert_partitioned(
        spark, path, upserts, key_cols=("id",), partition_col="day"
    )
    assert n == 1
    assert _rows(spark, path) == {
        (1, "a", "d1"),
        (2, "B2", "d1"),
        (9, "new", "d1"),
        (3, "c", "d2"),
        (4, "d", "d3"),
    }


def test_upsert_leaves_other_partition_files_untouched(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    other = os.path.join(path, "day=d3")
    before = {
        f: os.path.getmtime(os.path.join(other, f))
        for f in os.listdir(other)
        if f.endswith(".parquet")
    }
    upserts = spark.createDataFrame([(1, "A", "d1")], ["id", "val", "day"])
    upsert_partitioned(spark, path, upserts, key_cols=("id",), partition_col="day")
    after = {
        f: os.path.getmtime(os.path.join(other, f))
        for f in os.listdir(other)
        if f.endswith(".parquet")
    }
    assert before == after  # same files, same mtimes — never rewritten


def test_upsert_rejects_key_moving_out_of_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    # id=3 lives in day=d2; upserting it under 01-01 would strand
    # the old row as a duplicate
    moved = spark.createDataFrame([(3, "moved", "d1")], ["id", "val", "day"])
    with pytest.raises(ValueError, match="outside the touched partitions"):
        upsert_partitioned(spark, path, moved, key_cols=("id",), partition_col="day")


def test_delete_by_key_and_emptied_partition_cleanup(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    deletes = spark.createDataFrame(
        [(3, "d2"), (1, "d1")], ["id", "day"]
    )
    n = delete_by_key(spark, path, deletes, key_cols=("id",), partition_col="day")
    assert n == 2
    assert _rows(spark, path) == {
        (2, "b", "d1"),
        (4, "d", "d3"),
    }
    # day=d2 lost its only row — directory must be gone, not stale
    assert not os.path.exists(os.path.join(path, "day=d2"))


def test_empty_change_set_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    empty = spark.createDataFrame([], "id INT, val STRING, day STRING")
    assert upsert_partitioned(spark, path, empty, key_cols=("id",), partition_col="day") == 0
    assert delete_by_key(spark, path, empty, key_cols=("id",), partition_col="day") == 0
