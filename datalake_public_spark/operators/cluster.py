"""Time-windowed weighted K-Means geo-clustering (reference analytic job).

Reproduces ``dags/lib/k_means_with_spark.py:42-175`` Spark-first:
  * P6 time-window filter (``:26-39,108-110``) with an injectable clock —
    no ``datetime.now()`` inside the operator, so tests are deterministic;
  * P9 weight clamp (``:114-116``) via ``greatest(weight, 1)``;
  * P10→M2: the reference *duplicates each point weight times* with
    ``explode(array_repeat(struct(lat,lon), weight))`` (``:119-125``) and fits
    unweighted K-Means. We use MLlib's native ``weightCol`` (Spark ≥3.0) —
    identical objective, no ×avg(weight) row inflation before the iterative
    shuffles. At 100 TB the duplication would multiply every K-Means
    iteration's I/O by the average bike count; weightCol makes it free.
    ``weighted_expand`` keeps the reference formulation available as a
    generic operator (and for the equivalence test).
  * M1 VectorAssembler (``:131-132``), M2 fit (k=12, seed=1, ``:136``),
    M3 assignment (``:140``);
  * cache-before-fan-out: the reference recomputes the whole plan for its
    second sink (``:157`` then ``:161-172``); we cache (SURVEY §4 Caching).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_public_spark.operators.serve import to_serving_shape


def time_window_filter(
    df: DataFrame,
    *,
    end: datetime,
    minutes: int = 90,
    time_col: str = "time",
) -> DataFrame:
    """P6: keep rows with ``time`` in ``[end - minutes, end]`` (inclusive,
    matching ``k_means_with_spark.py:108-110``). ``end`` is injected —
    callers pass ``datetime.utcnow()`` in production, a fixed instant in
    tests. The predicate lands on the scan (parquet row-group stats /
    partition pruning when ``time_col`` aligns with partitioning)."""
    start = end - timedelta(minutes=minutes)
    c = F.col(time_col)
    return df.filter((c >= F.lit(start)) & (c <= F.lit(end)))


def clamp_weight(df: DataFrame, weight_src: str = "num_bikes", out: str = "weight") -> DataFrame:
    """P9: integer weight, floored at 1 (``k_means_with_spark.py:114-116``)."""
    return df.withColumn(out, F.greatest(F.col(weight_src).cast("int"), F.lit(1)))


def weighted_expand(df: DataFrame, weight_col: str, payload_cols: list[str]) -> DataFrame:
    """P10 as a generic operator: emit each row ``weight`` times
    (``explode(array_repeat(struct(...), weight))``,
    ``k_means_with_spark.py:119-125``). Kept for parity/equivalence tests;
    production clustering uses ``weightCol`` instead."""
    payload = F.struct(*[F.col(c) for c in payload_cols])
    exploded = df.select(
        F.explode(F.array_repeat(payload, F.col(weight_col))).alias("p")
    )
    return exploded.select(*[F.col(f"p.{c}").alias(c) for c in payload_cols])


def fit_assign_kmeans(
    df: DataFrame,
    *,
    feature_cols: tuple[str, str] = ("lat", "lon"),
    k: int = 12,
    seed: int = 1,
    weight_col: str | None = "weight",
) -> DataFrame:
    """M1-M3: assemble features, fit weighted K-Means, assign clusters.

    Returns the input columns + ``prediction`` (int, 0..k-1). Deterministic
    given fixed seed (reference pins k=12 seed=1,
    ``k_means_with_spark.py:136``)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=list(feature_cols), outputCol="features")
    assembled = assembler.transform(df)
    kmeans = KMeans(k=k, seed=seed, featuresCol="features")
    if weight_col is not None:
        kmeans = kmeans.setWeightCol(weight_col)
    model = kmeans.fit(assembled)
    return model.transform(assembled).drop("features")


def run_kmeans_job(
    enriched: DataFrame,
    *,
    end: datetime,
    minutes: int = 90,
    k: int = 12,
    seed: int = 1,
) -> DataFrame:
    """End-to-end analytic: window filter → weight → fit/assign → serving
    shape (``k_means_with_spark.py:42-153``). Caller caches before
    multi-sink fan-out."""
    windowed = time_window_filter(enriched, end=end, minutes=minutes)
    weighted = clamp_weight(windowed)
    clustered = fit_assign_kmeans(weighted, k=k, seed=seed)
    out = to_serving_shape(clustered.drop("weight"))
    return out.select(
        "provider",
        "id_concat",
        "location",
        "time",
        "num_bikes",
        "num_docks",
        F.col("prediction").cast("int").alias("prediction"),
    )
