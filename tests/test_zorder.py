"""Z-order layout tests: cross-engine key equality, the interleave's
bit-layout contract, and the actual data-skipping win (footer min/max
boxes prune files in BOTH dimensions, vs single-sort pruning only one).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datalake_public_spark.sinks import zorder
from tests.conftest import SF_SMOKE


def test_morton_key_matches_duckdb_sql(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    df = events.select(
        "event_id",
        (F.col("user_id") % 256).alias("x"),
        (F.abs(F.hash("event_type")) % 256).alias("y"),
    )
    got = (
        df.withColumn("z", zorder.morton_key(["x", "y"], bits=8))
        .select("event_id", "z")
        .toPandas()
        .set_index("event_id")["z"]
        .to_dict()
    )
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT event_id, {zorder.morton_sql(['x', 'y'], bits=8)} AS z FROM t"
    ).df()
    assert got == want.set_index("event_id")["z"].to_dict()


def test_morton_bit_layout():
    # x=0b11, y=0b00 → bits at even positions; y=0b11, x=0 → odd positions
    import pandas as pd

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": [3, 0, 3], "y": [0, 3, 3]}))
    z = con.execute(
        f"SELECT {zorder.morton_sql(['x', 'y'], bits=2)} AS z FROM t"
    ).df()["z"].tolist()
    assert z == [0b0101, 0b1010, 0b1111]


def test_normalize_clamps_and_scales(spark):
    df = spark.range(1).select(
        zorder.normalize_to_bits(F.lit(0.0), 0.0, 10.0, bits=4).alias("lo"),
        zorder.normalize_to_bits(F.lit(10.0), 0.0, 10.0, bits=4).alias("hi"),
        zorder.normalize_to_bits(F.lit(5.0), 0.0, 10.0, bits=4).alias("mid"),
        zorder.normalize_to_bits(F.lit(99.0), 0.0, 10.0, bits=4).alias("over"),
        zorder.normalize_to_bits(F.lit(7.0), 7.0, 7.0, bits=4).alias("degen"),
    ).first()
    assert (df.lo, df.hi, df.mid, df.over, df.degen) == (0, 15, 8, 15, 0)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    # uniform 2-d grid: single-sort on x gives files spanning ALL of y,
    # so a y-slice predicate touches every file; the z-ordered layout
    # keeps both boxes small and skips most files for either dimension.
    n, files = 64, 16
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
    )
    xsorted = str(tmp_path / "xsorted")
    zordered = str(tmp_path / "zordered")
    (
        grid.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.parquet(xsorted)
    )
    zorder.write_zordered(grid, zordered, ["x", "y"], bits=6, n_files=files)

    xs = zorder.file_minmax(xsorted, ["x", "y"])
    zs = zorder.file_minmax(zordered, ["x", "y"])
    assert len(zs) == files
    # y-slice: x-sorted layout cannot skip anything
    y_lo, y_hi = 8, 15
    assert zorder.files_matching(xs, "y", y_lo, y_hi) == len(xs)
    assert zorder.files_matching(zs, "y", y_lo, y_hi) <= files // 2
    # x-slice: z-order still prunes (worse than pure x-sort, but real)
    assert zorder.files_matching(zs, "x", 8, 15) <= files // 2
    # and the data survives the round trip
    assert spark.read.parquet(zordered).count() == n * n


def test_zordered_scan_prunes_row_groups_in_spark(spark, tmp_path):
    # end-to-end: the predicate-pushdown scan over the z-ordered layout
    # returns exactly the box contents (stats pruning is a reader detail;
    # correctness of the clustered layout is what we pin here)
    n = 32
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    path = str(tmp_path / "z")
    zorder.write_zordered(grid, path, ["x", "y"], bits=5, n_files=8)
    got = (
        spark.read.parquet(path)
        .filter((F.col("x").between(3, 5)) & (F.col("y").between(10, 11)))
        .count()
    )
    assert got == 3 * 2


def test_write_zordered_empty_frame(spark, tmp_path):
    from pyspark.sql import functions as F

    empty = spark.range(0).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    path = str(tmp_path / "empty")
    zorder.write_zordered(empty, path, ["x", "y"])
    assert spark.read.parquet(path).count() == 0


def test_morton_key_rejects_sign_bit_overflow(spark):
    """bits*len(cols) > 63 would set a long's sign bit — hot keys flip
    negative and Z-curve order corrupts at the MSB. Both engines' key
    builders raise in lockstep."""
    from datalake_public_spark.sinks.zorder import morton_key, morton_sql

    with pytest.raises(ValueError):
        morton_key(["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError):
        morton_sql(["a", "b", "c", "d"], bits=16)
    # 4 dims at 15 bits = 60 bits: fine
    morton_key(["a", "b", "c", "d"], bits=15)
    morton_sql(["a", "b", "c", "d"], bits=15)


def test_write_zordered_autoreduces_bits_for_many_dims(spark, tmp_path):
    """The convenience writer auto-reduces resolution instead of raising
    (documented): 4 dims at default bits drop to 15 bits each."""
    df = spark.range(200).select(
        F.col("id").alias("a"),
        (F.col("id") * 3 % 97).alias("b"),
        (F.col("id") * 7 % 89).alias("c"),
        (F.col("id") * 11 % 83).alias("d"),
    )
    out = str(tmp_path / "z4")
    zorder.write_zordered(df, out, ["a", "b", "c", "d"], n_files=4)
    assert spark.read.parquet(out).count() == 200


def test_bloom_canon_unifies_integral_float_forms():
    from datalake_public_spark.sinks.zorder import (
        bloom_build,
        bloom_canon,
        bloom_might_contain,
    )

    assert bloom_canon(5) == bloom_canon(5.0) == "5"
    assert bloom_canon(2.5) == "2.5"
    assert bloom_canon("x") == "x"
    b = bloom_build([5.0, 7.0, 2.5])  # the pandas float64-coerced forms
    assert bloom_might_contain(b, 5)
    assert bloom_might_contain(b, 7)
    assert bloom_might_contain(b, 2.5)
