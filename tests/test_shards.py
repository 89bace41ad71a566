"""Training-shard export: deterministic membership, one file per shard,
in-shard ordering, manifest integrity verification, jsonl twin."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from datalake_public_spark.sinks.shards import (
    read_training_shards,
    shard_of,
    write_training_shards,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_shard_roundtrip_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, n_shards=8)
    assert manifest["total_rows"] == docs.count()
    assert set(manifest["shards"]) <= {str(i) for i in range(8)}
    # exactly one data file per shard directory
    for k in manifest["shards"]:
        files = glob.glob(f"{out}/shard={k}/part-*")
        assert len(files) == 1, (k, files)
    back = read_training_shards(spark, out)  # verify=True recomputes sums
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_shard_membership_is_pure_function_of_id(spark, tmp_path):
    """Re-exporting a SUBSET keeps every surviving row in the same
    shard — upstream fixes move only changed documents."""
    docs = _docs(spark)
    full = write_training_shards(docs, str(tmp_path / "a"), n_shards=8)
    subset = docs.filter(F.col("doc_id") % 3 != 0)
    sub = write_training_shards(subset, str(tmp_path / "b"), n_shards=8)
    a = {
        (r.doc_id, r.shard)
        for r in docs.withColumn("shard", shard_of("doc_id", 8)).collect()
    }
    b = {
        (r.doc_id, r.shard)
        for r in subset.withColumn("shard", shard_of("doc_id", 8)).collect()
    }
    assert b <= a
    assert full["n_shards"] == sub["n_shards"] == 8


def test_shard_in_file_ordering_is_by_id(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)
    for k in range(4):
        files = glob.glob(f"{out}/shard={k}/part-*")
        if not files:
            continue
        ids = [r.doc_id for r in spark.read.parquet(files[0]).collect()]
        assert ids == sorted(ids)


def test_shard_verify_catches_corruption(spark, tmp_path):
    docs = _docs(spark).limit(200)
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)
    # corrupt: delete one shard's data file
    victim = glob.glob(f"{out}/shard=*/part-*")[0]
    import os

    os.remove(victim)
    with pytest.raises(ValueError, match="integrity"):
        read_training_shards(spark, out)
    # verify=False still reads the surviving shards
    assert read_training_shards(spark, out, verify=False).count() < 200


def test_shard_jsonl_roundtrip(spark, tmp_path):
    docs = _docs(spark).select("doc_id", "text", "lang", "n_chars")
    out = str(tmp_path / "jl")
    write_training_shards(docs, out, n_shards=4, fmt="jsonl")
    back = read_training_shards(spark, out)
    assert sorted(map(tuple, back.select(*docs.columns).collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_jsonl_roundtrips_all_null_column(spark, tmp_path):
    """JSON lines omit null fields — without the manifest-declared
    schema a column that is null in every row would silently vanish on
    read-back (and its checksum would mismatch)."""
    from pyspark.sql import functions as F

    docs = (
        _docs(spark)
        .limit(100)
        .select("doc_id", "text", F.lit(None).cast("string").alias("note"))
    )
    out = str(tmp_path / "jl")
    write_training_shards(docs, out, n_shards=4, fmt="jsonl")
    back = read_training_shards(spark, out)
    assert back.columns == ["doc_id", "text", "note"]
    assert back.filter("note is null").count() == 100


def test_manifest_describes_written_bytes_not_input_plan(spark, tmp_path):
    """A nondeterministic input plan (rand-derived column) evaluates to
    different values on every job; the manifest must be derived from the
    files on disk, not a re-run of the plan — otherwise verify=True
    rejects a perfectly good export (ADVICE r4)."""
    from pyspark.sql import functions as F

    docs = _docs(spark).limit(200).select(
        "doc_id", "text", (F.rand(seed=None) * 1000).alias("noise")
    )
    out = str(tmp_path / "nd")
    write_training_shards(docs, out, n_shards=4)
    back = read_training_shards(spark, out)  # verify=True must pass
    assert back.count() == 200
