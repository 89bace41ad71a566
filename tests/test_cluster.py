"""Clustering tests: P6 window filter, P9 clamp, P10 expansion, and the
weightCol-vs-duplication equivalence (SURVEY §7.4 #5)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from datalake_public_spark.operators import cluster

T0 = datetime(2023, 11, 14, 22, 0, 0)


@pytest.fixture()
def timed_df(spark):
    rows = [(f"id{i}", T0 - timedelta(minutes=m)) for i, m in enumerate([0, 30, 89, 90, 91, 200])]
    return spark.createDataFrame(rows, "id string, time timestamp")


def test_time_window_filter_inclusive_bounds(timed_df):
    """[end-90min, end] inclusive (k_means_with_spark.py:108-110)."""
    out = cluster.time_window_filter(timed_df, end=T0, minutes=90)
    ids = {r.id for r in out.collect()}
    assert ids == {"id0", "id1", "id2", "id3"}  # 91' and 200' excluded; 90' kept


def test_clamp_weight(spark):
    df = spark.createDataFrame([(5,), (0,), (-3,), (None,)], "num_bikes int")
    out = cluster.clamp_weight(df).select("weight").collect()
    # greatest(int, 1): 5→5, 0→1, -3→1, null→1 (greatest ignores nulls)
    assert [r.weight for r in out] == [5, 1, 1, 1]


def test_weighted_expand_row_counts(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 3), (4.0, 5.0, 1)], "lat double, lon double, weight int"
    )
    out = cluster.weighted_expand(df, "weight", ["lat", "lon"])
    assert out.count() == 4
    assert out.filter((F.col("lat") == 1.0)).count() == 3


def test_weightcol_equals_duplication(spark):
    """MLlib weightCol must reproduce the reference's explode-duplication
    formulation (k_means_with_spark.py:119-137): same cluster sizes in
    weighted mass, centers within tolerance."""
    import random

    rng = random.Random(3)
    # three tight geo blobs with integer weights
    rows = []
    for cx, cy in [(48.83, 2.30), (48.86, 2.35), (48.89, 2.40)]:
        for _ in range(40):
            rows.append(
                (cx + rng.gauss(0, 0.002), cy + rng.gauss(0, 0.002), rng.randint(1, 5))
            )
    df = spark.createDataFrame(rows, "lat double, lon double, weight int")

    weighted = cluster.fit_assign_kmeans(df, k=3, seed=1, weight_col="weight")
    dup = cluster.fit_assign_kmeans(
        cluster.weighted_expand(df, "weight", ["lat", "lon"]).withColumn(
            "weight", F.lit(1)
        ),
        k=3,
        seed=1,
        weight_col=None,
    )

    w_sizes = sorted(
        r.s for r in weighted.groupBy("prediction").agg(F.sum("weight").alias("s")).collect()
    )
    d_sizes = sorted(
        r.s for r in dup.groupBy("prediction").agg(F.count(F.lit(1)).alias("s")).collect()
    )
    assert w_sizes == d_sizes

    def centers(df_, weight_col):
        rows = (
            df_.groupBy("prediction")
            .agg(
                (F.sum(F.col("lat") * F.col(weight_col)) / F.sum(weight_col)).alias("clat"),
                (F.sum(F.col("lon") * F.col(weight_col)) / F.sum(weight_col)).alias("clon"),
            )
            .collect()
        )
        return sorted((round(r.clat, 6), round(r.clon, 6)) for r in rows)

    assert centers(weighted, "weight") == centers(dup.withColumn("one", F.lit(1)), "one")


def test_kmeans_deterministic_with_seed(spark):
    df = spark.createDataFrame(
        [(48.8 + i * 0.001, 2.3 + (i % 7) * 0.01, 1 + i % 4) for i in range(100)],
        "lat double, lon double, weight int",
    )
    a = cluster.fit_assign_kmeans(df, k=4, seed=1)
    b = cluster.fit_assign_kmeans(df, k=4, seed=1)
    assert [r.prediction for r in a.collect()] == [r.prediction for r in b.collect()]
