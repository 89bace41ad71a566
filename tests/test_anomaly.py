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
