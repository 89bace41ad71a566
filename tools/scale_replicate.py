"""Materialize a disjoint-keyspace ×N replication of a testdata SF dir.

The scale-evidence generator (VERDICT r3 item 3): every table is
replicated N times with entity keys shifted by ``i * KEY_OFFSET`` per
replica, preserving referential integrity exactly the way TPC-H scales —
fact and entity-dim keys shift together; the fixed-size dims (region,
nation) are copied verbatim (they are constant at every official SF, and
the replicated entities keep their original nation/region foreign keys,
so every join in the suite stays valid). Non-key payloads (texts,
vectors, prices, timestamps) are copied unchanged — a replicated corpus
is exactly-duplicated content under fresh ids, which is the realistic
regime for the dedup family (the exact pre-pass owns the copies) and
preserves every oracle's semantics because Spark and DuckDB both read
the same files.

Pure pyarrow (no Spark session): reads each table once, rewrites the key
columns per replica, concatenates, writes one parquet per table with the
SOURCE schema preserved (the events ts encoding round-trips verbatim —
the engine's reader branches on the footer type).

Usage: python tools/scale_replicate.py <src_sf_dir> <dst_dir> [N=10]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# int64 key columns to shift per replica; everything else copies verbatim
SHIFT_KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# Above any key at local SFs (max observed 149,999) while keeping every
# shifted id under 2^31 at ×10 — several queries legitimately cast ids
# to INT (first attempt used 1e9 and overflowed p_row_normalize's
# conform step); matches the +10M convention the dedup tests use.
KEY_OFFSET = 10_000_000


def replicate_table(src_path: str, dst_path: str, keys: list[str], n: int) -> int:
    """Stream replicas through one ParquetWriter (round 11): the ×1000
    rung would otherwise hold the whole output table in memory (~60 GB
    for lineitem). One row group per replica — byte-identical values,
    same schema; readers don't care about row-group boundaries."""
    t = pq.read_table(src_path)
    if not keys or n <= 1:
        pq.write_table(t, dst_path)
        return t.num_rows
    rows = 0
    with pq.ParquetWriter(dst_path, t.schema) as w:
        for i in range(n):
            if i == 0:
                part = t
            else:
                cols = []
                for name in t.schema.names:
                    col = t.column(name)
                    if name in keys:
                        col = pc.add(
                            col, pa.scalar(i * KEY_OFFSET, type=pa.int64())
                        )
                    cols.append(col)
                part = pa.Table.from_arrays(cols, schema=t.schema)
            w.write_table(part)
            rows += part.num_rows
    return rows


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1.0"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for table, keys in SHIFT_KEYS.items():
        rows = replicate_table(
            os.path.join(src, f"{table}.parquet"),
            os.path.join(dst, f"{table}.parquet"),
            keys,
            n,
        )
        print(f"{table}: {rows} rows")


if __name__ == "__main__":
    main()
