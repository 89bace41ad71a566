"""Incremental rollup maintenance: ticks process only new files, the
rollup always equals the batch aggregate of everything seen, replays
are idempotent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from datalake_public_spark.streaming.incremental import incremental_rollup

SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("cents", LongType()),
    ]
)


def _agg(batch):
    return batch.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("sum_cents")
    )


def _write_chunk(spark, src, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        f"{src}/{name}"
    )


def _rollup(spark, target):
    return {
        r.event_type: (r.n_events, r.sum_cents)
        for r in spark.read.parquet(target).collect()
    }


def _tick(spark, src, target, ckpt):
    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    incremental_rollup(
        stream,
        _agg,
        target,
        key_cols=("event_type",),
        partition_col="event_type",
        sum_cols=("n_events", "sum_cents"),
        checkpoint_dir=ckpt,
    )


def test_rollup_accumulates_only_new_files(spark, tmp_path):
    src, target, ckpt = (str(tmp_path / d) for d in ("src", "rollup", "ckpt"))
    os.makedirs(src)

    _write_chunk(spark, src, [("click", 1, 100), ("view", 2, 50)], "a")
    _tick(spark, src, target, ckpt)
    assert _rollup(spark, target) == {"click": (1, 100), "view": (1, 50)}

    _write_chunk(spark, src, [("click", 3, 25), ("buy", 4, 900)], "b")
    _tick(spark, src, target, ckpt)
    assert _rollup(spark, target) == {
        "click": (2, 125),
        "view": (1, 50),
        "buy": (1, 900),
    }

    # tick with no new data: rollup unchanged
    _tick(spark, src, target, ckpt)
    assert _rollup(spark, target) == {
        "click": (2, 125),
        "view": (1, 50),
        "buy": (1, 900),
    }


def test_rollup_matches_batch_aggregate(spark, tmp_path):
    src, target, ckpt = (str(tmp_path / d) for d in ("src", "rollup", "ckpt"))
    os.makedirs(src)
    rows_a = [("click", i, i * 10) for i in range(50)]
    rows_b = [("view", i, i) for i in range(30)] + [("click", 99, 1)]
    _write_chunk(spark, src, rows_a, "a")
    _tick(spark, src, target, ckpt)
    _write_chunk(spark, src, rows_b, "b")
    _tick(spark, src, target, ckpt)

    batch = {
        r.event_type: (r.n_events, r.sum_cents)
        for r in _agg(
            spark.read.option("recursiveFileLookup", "true").schema(SCHEMA).parquet(src)
        ).collect()
    }
    assert _rollup(spark, target) == batch


def test_crash_replay_is_idempotent(spark, tmp_path):
    src, target, ckpt = (str(tmp_path / d) for d in ("src", "rollup", "ckpt"))
    os.makedirs(src)
    _write_chunk(spark, src, [("click", 1, 100)], "a")
    _tick(spark, src, target, ckpt)
    before = _rollup(spark, target)

    # the real at-least-once window: offsets for batch 0 are committed to
    # the source log but the COMMIT file is lost (crash before epoch
    # commit) — restart replays batch 0 under the SAME checkpoint; the
    # applied-batch marker must skip the duplicate merge
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _tick(spark, src, target, ckpt)
    assert _rollup(spark, target) == before


def test_fresh_checkpoint_is_a_rebuild_not_a_resume(spark, tmp_path):
    src, target = (str(tmp_path / d) for d in ("src", "rollup"))
    os.makedirs(src)
    _write_chunk(spark, src, [("click", 1, 100)], "a")
    _tick(spark, src, target, str(tmp_path / "ckpt"))

    # a NEW checkpoint restarts batch numbering — markers are scoped per
    # checkpoint lineage, so the data applies again (double-count): the
    # documented contract is wipe-checkpoint ⇒ rebuild the target too
    _tick(spark, src, target, str(tmp_path / "ckpt2"))
    assert _rollup(spark, target) == {"click": (2, 200)}


# -- rollup maintenance over ManifestTable commits -------------------------


def test_merge_table_delta_tracks_appends(spark, tmp_path):
    from datalake_public_spark.sinks.table import ManifestTable
    from datalake_public_spark.streaming.incremental import merge_table_delta

    tbl = ManifestTable(str(tmp_path / "t"))
    target = str(tmp_path / "mv")

    def agg(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
        )

    def fold(v_from, v_to):
        merge_table_delta(
            spark, tbl, v_from, v_to, target, agg,
            key_cols=("k",), partition_col="k", sum_cols=("n", "total"),
        )

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("k"), (F.col("id") % 3)).alias("k"), F.col("id").alias("v")
        )

    s0 = tbl.overwrite(batch(0, 50).coalesce(1))
    fold(None, s0.version)
    s1 = tbl.append(batch(50, 120).coalesce(1))
    fold(s0.version, s1.version)
    s2 = tbl.append(batch(120, 200).coalesce(1))
    fold(s1.version, s2.version)

    mv = {r.k: (r.n, r.total) for r in spark.read.parquet(target).collect()}
    want = {r.k: (r.n, r.total) for r in agg(tbl.read(spark)).collect()}
    assert mv == want  # MV == full re-aggregation after 3 commits


def test_merge_table_delta_refuses_non_additive_lineage(spark, tmp_path):
    from datalake_public_spark.sinks.table import ManifestTable
    from datalake_public_spark.streaming.incremental import merge_table_delta

    tbl = ManifestTable(str(tmp_path / "t"))
    df = spark.range(10).select(
        F.concat(F.lit("k"), (F.col("id") % 2)).alias("k"), F.col("id").alias("v")
    )
    s0 = tbl.overwrite(df.coalesce(1))
    s1 = tbl.delete_where(spark, "v >= 5")
    with pytest.raises(ValueError, match="non-additive"):
        merge_table_delta(
            spark, tbl, s0.version, s1.version, str(tmp_path / "mv"),
            lambda d: d.groupBy("k").agg(F.count(F.lit(1)).alias("n")),
            key_cols=("k",), partition_col="k", sum_cols=("n",),
        )
