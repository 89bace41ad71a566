"""Deterministic training-shard export — the hand-off sink at the end of
a training-data pipeline.

Trainers consume a corpus as a fixed list of shard files (webdataset /
Megatron / T5-style): shard membership must be a PURE FUNCTION of the
example id (re-running the export after an upstream fix must move only
the documents that changed, not reshuffle the world), shard contents
must be internally ordered (bit-reproducible files → cacheable
downstream tokenization), and the shard list needs a manifest with
per-shard row counts and content checksums so a trainer can verify
integrity before a multi-day run.

Layout::

    <root>/_manifest.json                # {shard: {rows, content_sum}}, schema
                                         # (underscore name: Spark readers
                                         # skip _-prefixed files, like _SUCCESS)
    <root>/shard=<k>/part-*.parquet      # exactly one file per shard

Scale: ONE hash-partition shuffle on the shard id (each shard lands
wholly in one task → one output file), sortWithinPartitions for the
deterministic order, and a second metadata-light aggregation for the
manifest checksums (summed 32-bit per-row hashes — map-side combined,
one row per shard to the driver).

Ref parity: beyond the reference (training-pipeline extension; public
shard formats per the WebDataset/Megatron docs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_of(id_col: str, n_shards: int):
    """Shard assignment: pmod(xxhash64(id), n) — pure function of the
    id, stable across runs/partitionings/engines."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    n_shards: int = 16,
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> dict:
    """Export ``df`` as ``n_shards`` deterministic shards + manifest.

    Returns the manifest dict. ``fmt`` is 'parquet' or 'jsonl' (trainer
    loaders commonly want either; jsonl columns are JSON-encoded per
    row). Rows within a shard are ordered by ``id_col``; shard
    membership is ``shard_of`` — re-exports are reproducible."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be 'parquet' or 'jsonl', got {fmt!r}")
    cols = df.columns
    staged = (
        df.withColumn("shard", shard_of(id_col, n_shards))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
    )
    writer = staged.write.partitionBy("shard").mode("error")
    if fmt == "parquet":
        writer.parquet(path)
    else:
        writer.json(path)

    # distributed per-shard integrity: row count + order-independent
    # content checksum (sum of 32-bit per-row md5 prefixes — associative
    # so map-side combine applies, and an ANSI long sum has ~2e9 rows of
    # headroom per shard; the per-shard file ordering is already pinned
    # by the sort above). Computed by READING THE WRITTEN FILES BACK,
    # not by re-evaluating ``df``: a nondeterministic input plan
    # (rand-derived columns, limit/sample, a source that changed between
    # the two jobs) would otherwise produce a manifest describing
    # different data than the shards on disk, and verify=True would then
    # reject a correct export (ADVICE r4).
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = df.sparkSession
    schema = StructType.fromJson(df.schema.jsonValue()).add(
        StructField("shard", IntegerType())
    )
    reader = spark.read.schema(schema)
    written = (
        reader.parquet(path) if fmt == "parquet" else reader.json(path)
    )
    per_shard = (
        written.withColumn(
            "row_h",
            F.conv(
                F.substring(F.md5(F.to_json(F.struct(*cols))), 1, 8), 16, 10
            ).cast("long"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("row_h").alias("content_sum"),
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "fmt": fmt,
        "columns": cols,
        # full schema, not just names: JSON lines OMIT null fields, so a
        # column that is null in every row of a shard would vanish from
        # the reader's inferred schema — reading under the declared
        # schema restores it as nulls (and pins types for both formats)
        "schema": df.schema.jsonValue(),
        "shards": {
            str(r.shard): {"rows": r.rows, "content_sum": r.content_sum}
            for r in per_shard
        },
        "total_rows": sum(r.rows for r in per_shard),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_training_shards(
    spark: SparkSession, path: str, *, verify: bool = True
) -> DataFrame:
    """Read a shard export back; with ``verify`` (default) recompute the
    per-shard row counts + content checksums against the manifest and
    raise on ANY drift (a truncated/corrupted/hand-edited shard must
    fail loudly before a training run, not during it)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)
    schema = StructType.fromJson(manifest["schema"]).add(
        StructField("shard", IntegerType())  # partition column
    )
    reader = spark.read.schema(schema)
    df = (
        reader.parquet(path)
        if manifest["fmt"] == "parquet"
        else reader.json(path)
    )
    cols = manifest["columns"]
    df = df.select(*cols, "shard")
    if verify:
        got = {
            str(r.shard): {"rows": r.rows, "content_sum": r.content_sum}
            for r in df.withColumn(
                "row_h",
                F.conv(
                    F.substring(F.md5(F.to_json(F.struct(*cols))), 1, 8),
                    16,
                    10,
                ).cast("long"),
            )
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("row_h").alias("content_sum"),
            )
            .collect()
        }
        if got != manifest["shards"]:
            bad = sorted(
                set(got) ^ set(manifest["shards"])
                | {
                    k
                    for k in set(got) & set(manifest["shards"])
                    if got[k] != manifest["shards"][k]
                }
            )
            raise ValueError(
                f"shard integrity check failed for shards {bad}: "
                "export corrupted or modified since manifest was written"
            )
    return df.select(*cols)
