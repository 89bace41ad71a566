"""MERGE-style upsert / delete on plain-parquet lake tables.

The reference's only mutation is whole-prefix overwrite
(``transform_ss_velib_with_spark.py:108``); a real lake needs keyed
MERGE. Without a table format (Delta/Iceberg jars are not in this
container — checked), the scalable primitive is *partition-scoped
copy-on-write*: rewrite only the partitions the changes touch, leave
every other partition's files untouched.

Plan per call:
  1. distinct partition values in the change set (tiny driver list);
  2. read the target pruned to those partitions (partition pruning —
     the scan never touches the rest of the table);
  3. anti-join out rows whose key appears in the change set, union the
     upserts;
  4. write with ``partitionOverwriteMode=dynamic`` so ONLY the touched
     partitions are replaced atomically-per-partition.

Scale: cost is O(touched partitions), not O(table). For a 100 TB table
partitioned daily, upserting one day rewrites one day. The anti-join
broadcasts when the change set is small (AQE decides). Caveats vs a
real table format, stated honestly: no snapshot isolation across
partitions, no concurrent writers to the SAME partition, no time
travel — swap in Delta/Iceberg where its jars exist; the operator
signature stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _touched_partitions(changes: DataFrame, partition_col: str) -> list:
    return [r[0] for r in changes.select(partition_col).distinct().collect()]


def upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    upserts: DataFrame,
    *,
    key_cols: tuple[str, ...],
    partition_col: str,
) -> int:
    """Insert-or-replace by key. Returns the number of partitions rewritten.

    Rows in ``upserts`` replace target rows with the same key; new keys
    are appended. A key's partition value may change ONLY within the
    touched-partition set (moving a row into an untouched partition
    would require rewriting it too — detected and rejected loudly
    rather than silently duplicating the key)."""
    parts = _touched_partitions(upserts, partition_col)
    if not parts:
        return 0

    target = spark.read.parquet(target_path).filter(F.col(partition_col).isin(parts))
    keys = upserts.select(*key_cols).distinct()
    kept = target.join(F.broadcast(keys), list(key_cols), "left_anti")
    merged = kept.unionByName(upserts.select(*target.columns))

    # rows for a key can't exist outside the touched partitions, else the
    # merge would leave stale duplicates there
    stale = (
        spark.read.parquet(target_path)
        .filter(~F.col(partition_col).isin(parts))
        .join(F.broadcast(keys), list(key_cols), "left_semi")
        .count()
    )
    if stale:
        raise ValueError(
            f"{stale} target row(s) with upserted keys live outside the "
            f"touched partitions {parts!r}; include those partitions in the "
            "change set or delete the old rows first"
        )

    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    return len(parts)


def delete_by_key(
    spark: SparkSession,
    target_path: str,
    deletes: DataFrame,
    *,
    key_cols: tuple[str, ...],
    partition_col: str,
) -> int:
    """Delete rows matching the keys in ``deletes`` (which must carry the
    partition column so the rewrite prunes). Returns partitions rewritten."""
    parts = _touched_partitions(deletes, partition_col)
    if not parts:
        return 0
    target = spark.read.parquet(target_path).filter(F.col(partition_col).isin(parts))
    keys = deletes.select(*key_cols).distinct()
    kept = target.join(F.broadcast(keys), list(key_cols), "left_anti").persist()

    # dynamic overwrite only replaces partitions PRESENT in the output —
    # a partition whose every row was deleted would silently keep its old
    # files. Find emptied partitions and drop their directories explicitly.
    remaining = {r[0] for r in kept.select(partition_col).distinct().collect()}
    emptied = [p for p in parts if p not in remaining]

    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    kept.unpersist()

    if emptied:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for p in emptied:
            path = jvm.org.apache.hadoop.fs.Path(f"{target_path}/{partition_col}={p}")
            fs = path.getFileSystem(conf)
            fs.delete(path, True)
    return len(parts)
