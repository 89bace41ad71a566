"""Robust anomaly detection over grouped numeric columns.

Flags rows whose value deviates from their group's MEDIAN by more than
``k`` robust standard deviations, where the robust sd is
MAD × 1.4826 (the normal-consistency constant). Median/MAD instead of
mean/stddev because anomalies contaminate the very statistics a
naive z-score uses — one large outlier inflates stddev enough to hide
itself (masking); the 50%-breakdown median/MAD pair does not.

Implementation: the per-group median/MAD come from the Arrow
grouped-agg UDAFs in functions/udaf.py (exact, bit-matched to DuckDB's
``median``/``mad`` — the existing cross-engine contract), broadcast
back to the rows. Groups with MAD = 0 (constant-valued) flag any
deviation at all (score = +inf convention would break the scalar
contract, so the score column is NULL there and ``is_anomaly`` is
``value != median``).

Scale: one grouped-agg shuffle (whole-group Arrow batches — the UDAF
contract) + a join of the per-group stats back to the rows (strategy
AQE-chosen by default; ``broadcast_stats=True`` forces the
shuffle-free broadcast plan when group cardinality is known-bounded —
see the parameter doc); scoring is row-local. Ref parity: beyond the reference (quality-monitoring
extension; composes the R4 gate family).

The exact path is the driver contract — but an exact median requires
the WHOLE group in one Arrow batch, so a group's memory is O(group
size): fine at the sweep rungs (×1000 events ≈ 12.5M rows/group,
~100 MB of float64 per batch), impossible at 100 TB (billions of rows
per event_type would have to land in a single Python worker). The
100 TB design is ``method="approx"``: Spark's ``percentile_approx``
(Greenwald–Khanna sketch — bounded memory, mergeable map-side, pure
JVM) for the median, then a second sketch pass over |x − median| for
the MAD. Two linear shuffles of sketches instead of one shuffle of
whole groups; rank error ≤ n/accuracy (exact element when
n < accuracy). Same output schema and decision rule, so callers swap
methods without downstream changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scale factor making MAD a consistent sigma estimate under normality
MAD_SIGMA = 1.4826


def robust_anomalies(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    k: float = 3.5,
    method: str = "exact",
    accuracy: int = 10_000,
    broadcast_stats: bool = False,
) -> DataFrame:
    """All input rows plus (grp_median, grp_mad, robust_score,
    is_anomaly). ``robust_score`` = |x - median| / (MAD * 1.4826),
    NULL when MAD = 0; ``is_anomaly`` is score > k, or any deviation
    from the median in a MAD-0 group.

    ``method="exact"`` (default) is the bit-exact DuckDB
    median()/mad() contract via the Arrow grouped-agg UDAFs — whole
    groups in memory. ``method="approx"`` is the unbounded-group-size
    scale path (module docstring): two ``percentile_approx`` sketch
    passes, rank error ≤ n/``accuracy`` each. Note the exact MAD is
    median(|x − interpolated median|) while approx interpolates
    nothing (sketches return actual elements): for odd-sized groups of
    distinct values with n < accuracy the two methods agree exactly;
    elsewhere they differ by at most the interpolation gap plus the
    rank error.

    ``broadcast_stats``: the per-group stats frame has one row per
    GROUP, so its size scales with group cardinality — a scale variable
    (per-entity anomalies over millions of entities make it a real
    table). The default (False) therefore attaches no join hint and
    lets AQE pick the strategy from the stats side's RUNTIME size —
    small stats still broadcast (AQE's SMJ→BHJ conversion), huge stats
    shuffle instead of OOMing the executors on a forced build side.
    Pass True only when the caller KNOWS group cardinality is bounded
    (e.g. grouping by a low-cardinality type column): the explicit hint
    then skips the fact side's shuffle write entirely — the plan AQE's
    conversion cannot reach, because conversion happens after the map
    stage already wrote shuffle files."""
    if method not in ("exact", "approx"):
        raise ValueError(f"method must be 'exact' or 'approx', got {method!r}")

    def _stats_side(frame: DataFrame):
        return F.broadcast(frame) if broadcast_stats else frame

    if method == "approx":
        med = df.groupBy(*group_cols).agg(
            F.percentile_approx(value_col, 0.5, accuracy).alias("grp_median")
        )
        stats = (
            df.join(_stats_side(med), group_cols)
            .withColumn(
                "_absdev", F.abs(F.col(value_col) - F.col("grp_median"))
            )
            .groupBy(*group_cols)
            .agg(
                F.first("grp_median").alias("grp_median"),
                F.percentile_approx("_absdev", 0.5, accuracy).alias("grp_mad"),
            )
        )
    else:
        from datalake_public_spark.functions.udaf import mad_udaf, median_udaf

        stats = df.groupBy(*group_cols).agg(
            median_udaf(value_col).alias("grp_median"),
            mad_udaf(value_col).alias("grp_mad"),
        )
    dev = F.abs(F.col(value_col) - F.col("grp_median"))
    score = F.when(
        F.col("grp_mad") > 0, dev / (F.col("grp_mad") * F.lit(MAD_SIGMA))
    )
    return (
        df.join(_stats_side(stats), group_cols)
        .withColumn("robust_score", F.round(score, 6))
        .withColumn(
            "is_anomaly",
            # compare the UNROUNDED score: the display rounding must not
            # flip a decision at the threshold boundary
            F.when(F.col("grp_mad") > 0, score > k).otherwise(dev > 0),
        )
    )
