"""Extended-surface checks that the oracle gate can't express:
sketch accuracy bounds and as-of join edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_public_spark.driver_queries import _events
from datalake_public_spark.driver_queries_ext import (
    approx_distinct,
    approx_quantiles,
    asof_join,
)
from tests.conftest import SF_SMOKE


def test_approx_distinct_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users for r in approx_distinct(spark, SF_SMOKE).collect()
    }
    exact = {
        r.event_type: r.n
        for r in _events(spark, SF_SMOKE)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(2, 0.05 * n), (t, approx[t], n)


def test_approx_quantiles_sane(spark):
    rows = approx_quantiles(spark, SF_SMOKE).collect()
    exact = {
        r.event_type: r.q
        for r in _events(spark, SF_SMOKE)
        .groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("q"))
        .collect()
    }
    for r in rows:
        p50, p95, p99 = r.pcts
        assert p50 <= p95 <= p99
        e50, e95, e99 = exact[r.event_type]
        assert abs(p50 - e50) <= 0.05 * max(e50, 1)
        assert abs(p95 - e95) <= 0.05 * max(e95, 1)


def test_asof_join_semantics(spark):
    """A click with no prior view → null; a view at the exact click
    instant counts; later views don't."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    ev = spark.createDataFrame(
        [
            (1, 100, ts(0), "view", 0.0, "{}"),
            (2, 100, ts(10), "click", 0.0, "{}"),  # sees view@0
            (3, 100, ts(20), "view", 0.0, "{}"),
            (4, 100, ts(20), "click", 0.0, "{}"),  # same-instant view counts
            (5, 200, ts(5), "click", 0.0, "{}"),  # no view ever → null
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double, props string",
    )
    import datalake_public_spark.driver_queries_ext as ext

    orig = ext._events
    ext._events = lambda spark_, sf_: ev
    try:
        got = {r.event_id: r.asof_view_ts for r in asof_join(spark, "ignored").collect()}
    finally:
        ext._events = orig
    assert got == {2: ts(0), 4: ts(20), 5: None}


def test_salted_agg_equals_plain(spark):
    from datalake_public_spark.operators.skew import salted_agg

    ev = _events(spark, SF_SMOKE)
    got = salted_agg(
        ev,
        ["event_type"],
        {"n": ("event_id", "count"), "mx": ("value", "max")},
        n_salt=8,
        salt_cols=["event_id"],
    )
    want = ev.groupBy("event_type").agg(
        F.count("event_id").alias("n"), F.max("value").alias("mx")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_salted_join_equals_plain(spark):
    from datalake_public_spark.operators.skew import salted_join
    from datalake_public_spark.driver_queries import _t

    li = _t(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = _t(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    got = salted_join(li, o, "l_orderkey", n_salt=4)
    want = li.join(o, "l_orderkey")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_binned_range_join_equivalence_and_plan(spark):
    """binned_range_join == naive theta join on random overlapping
    ranges (boundary values, negatives, degenerate hi<=lo), and it
    plans as a hash EQUI join on the bin key — never a nested loop —
    even when broadcasting is disabled (the large-range-side regime)."""
    import random

    from pyspark.sql import functions as F

    from datalake_public_spark.operators.joins import binned_range_join

    rng = random.Random(11)
    facts = spark.createDataFrame(
        [(i, rng.uniform(-120, 320)) for i in range(500)]
        + [(1000, 0.0), (1001, 50.0), (1002, -50.0)],  # exact boundaries
        "fact_id long, value double",
    )
    ranges = spark.createDataFrame(
        [(j, rng.uniform(-100, 250), rng.uniform(10, 140)) for j in range(30)]
        + [(100, 50.0, 50.0)],  # degenerate: hi == lo matches nothing
        "range_id long, lo double, width double",
    ).select("range_id", "lo", (F.col("lo") + F.col("width") - 10).alias("hi"))

    naive = facts.join(
        ranges, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    binned = binned_range_join(facts, ranges, bin_width=37.0)
    expect = {(r.fact_id, r.range_id) for r in naive.collect()}
    got = {(r.fact_id, r.range_id) for r in binned.collect()}
    assert got == expect and len(got) > 100

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = binned_range_join(facts, ranges, bin_width=37.0)._jdf.queryExecution() \
            .explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        assert "SortMergeJoin [_bin" in p or "ShuffledHashJoin [_bin" in p, p
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
