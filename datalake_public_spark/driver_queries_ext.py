"""Driver-contract queries: relational surface beyond the reference.

SURVEY §2.7 lists the operators the reference *lacks*; a user migrating
to this engine gets them natively from Spark, and each is exposed here
as a driver-checkable query: as-of join, range join, semi/anti join,
cube, intersect/except, pivot, JSON extraction, string functions, and
approximate aggregates (HLL / quantile sketches — implementation-
specific values, so rows-only driver checks with accuracy asserted in
tests/test_ext_queries.py).

Scale notes per query; the shared theme: joins either broadcast a tiny
side or shuffle once on an equi-key — never a cross product — and the
as-of join is the union+window formulation (one shuffle, no range
explosion), which is the only formulation that survives 100 TB event
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_public_spark.driver_queries import QuerySpec, _events, _t


# --------------------------------------------------------------------------
# Time-series joins
# --------------------------------------------------------------------------


def asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for every 'click' event, the most recent 'view'
    timestamp of the same user at-or-before the click.

    Formulated as union + last(ignorenulls) over (user, time) — ONE
    shuffle on user_id, linear scan per partition. The naive range join
    (clicks × views with v_ts <= c_ts + max-per-click) explodes
    quadratically in events-per-user; this doesn't, which is why it's
    the 100 TB formulation. DuckDB's native ASOF JOIN is the oracle."""
    from pyspark.sql import Window

    ev = _events(spark, sf).select("event_id", "user_id", "ts", "event_type")
    tagged = ev.filter(F.col("event_type").isin("click", "view")).withColumn(
        "is_click", (F.col("event_type") == "click").cast("int")
    )
    # views sort before clicks at equal ts → a same-instant view is visible
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = tagged.withColumn(
        "asof_view_ts",
        F.last(F.when(F.col("is_click") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return asof.filter(F.col("is_click") == 1).select(
        "event_id", "user_id", F.col("ts").alias("click_ts"), "asof_view_ts"
    )


ASOF_SQL = """
SELECT c.event_id, c.user_id, c.ts AS click_ts, v.ts AS asof_view_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


def _range_table(spark: SparkSession) -> DataFrame:
    return spark.range(10).select(
        (F.col("id") * 50.0).alias("lo"), ((F.col("id") + 1) * 50.0).alias("hi")
    )


def range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Band/range join BOTH ways, op-tagged: 'broadcast' is the
    small-range-side plan (BroadcastNestedLoopJoin, band predicate pushed
    into the probe — no fact shuffle); 'binned' is the SCALE path for
    large range tables (operators/joins.binned_range_join: explode ranges
    to covered bins → hash EQUI-join on bin → residual re-check — what
    you run when neither side broadcasts and a nested loop would be
    quadratic). Identical results by construction; the oracle checks
    both tags against the same theta-join SQL. The value aggregate is
    integer cents (per-row half-up to cents, then exact integer sum) —
    summing doubles in two differently-planned branches and rounding
    the totals would be sum-order-dependent at a half-cent boundary
    (review finding r3; same hazard class as NOTES_r3's bucketed-q5
    float note)."""
    from datalake_public_spark.operators.joins import binned_range_join

    ev = _events(spark, sf)
    ranges = _range_table(spark)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")

    def agg(joined):
        return joined.groupBy("lo", "hi").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_cents"),
        )

    bcast = agg(
        ev.join(
            F.broadcast(ranges),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
    ).withColumn("op", F.lit("broadcast"))
    binned = agg(
        binned_range_join(ev, ranges, value_col="value", bin_width=50.0)
    ).withColumn("op", F.lit("binned"))
    return bcast.unionByName(binned)


RANGE_JOIN_SQL = """
WITH agg AS (
  SELECT lo, hi, count(*) AS n_events,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events
  JOIN (SELECT CAST(id * 50.0 AS DOUBLE) AS lo,
               CAST((id + 1) * 50.0 AS DOUBLE) AS hi
        FROM range(10) t(id)) r
    ON value >= lo AND value < hi
  GROUP BY lo, hi
)
SELECT lo, hi, n_events, sum_cents, 'broadcast' AS op FROM agg
UNION ALL
SELECT lo, hi, n_events, sum_cents, 'binned' FROM agg
"""


# --------------------------------------------------------------------------
# Semi / anti / set operators
# --------------------------------------------------------------------------


def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join: customers having ≥1 order. Semi joins shuffle only
    the distinct keys of the right side — at scale vastly cheaper than
    inner-join + dropDuplicates."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_nationkey"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_nationkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join: customers with no order since 2000 — lapsed
    customers (TPC-H Q22 shape). The date filter makes the right side
    selective (and the result non-empty at every SF: ~1.4% of
    customers), so the anti join is exercised for real."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
"""


def set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT: customers ordering in both 1995 and 1996. Plans as a
    semi-join under the hood; dedup via aggregate on the key."""
    o = _t(spark, sf, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


SET_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def set_except(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT: customers ordering in 1995 but not in 1996.

    ``subtract`` is SQL EXCEPT (set difference); ``exceptAll().distinct()``
    would be WRONG — multiset semantics keep any key whose 1995 multiplicity
    exceeds its 1996 one, even if it appears in both years."""
    o = _t(spark, sf, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)


SET_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


# --------------------------------------------------------------------------
# Multi-dimensional aggregation
# --------------------------------------------------------------------------


def cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations in
    one pass — Spark expands grouping sets BEFORE the shuffle, so partial
    aggregation still applies per set."""
    li = _t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def pivot_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: per-user event counts, event types as columns. The value
    list is declared (not discovered) so the plan is a single hash
    aggregate — discovery would need an extra distinct pass."""
    types = ["click", "error", "purchase", "signup", "view"]
    ev = _events(spark, sf)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Scalar function surface (JSON, strings)
# --------------------------------------------------------------------------


def json_extract_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured access: pull ``$.k`` out of the JSON props column,
    aggregate per event type. get_json_object evaluates without full
    parse-to-struct; at scale prefer from_json with a declared schema
    once per pipeline, then columnar access."""
    ev = _events(spark, sf)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


JSON_EXTRACT_SQL = """
SELECT event_type, count(k) AS n_k, round(avg(k), 4) AS avg_k, max(k) AS max_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
GROUP BY event_type
"""


def string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """String scalar surface over part: regexp extraction, case mapping,
    substring, length, concat — all codegen'd row-local expressions."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.substring("p_brand", 7, 10).alias("brand_num"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


STRING_FUNCS_SQL = """
SELECT p_partkey, upper(p_name) AS name_upper,
       CAST(length(p_name) AS INT) AS name_len,
       coalesce(regexp_extract(p_name, '^([a-z]+)', 1), '') AS first_word,
       substring(p_brand, 7, 10) AS brand_num,
       concat_ws('/', p_brand, p_type) AS brand_type
FROM part
"""


# --------------------------------------------------------------------------
# Approximate aggregates (sketches — values are implementation-specific,
# so the driver records rows-only; accuracy is asserted in tests)
# --------------------------------------------------------------------------


def approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type. At 100 TB this is THE
    distinct-count operator: fixed-size sketch per group, mergeable
    map-side, no key shuffle of raw values (vs exact countDistinct's
    expand+dedup)."""
    ev = _events(spark, sf)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )


def approx_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate percentiles of event value per type (KLL-style sketch;
    single pass, mergeable, bounded memory — the scale path for
    p50/p95/p99 dashboards)."""
    ev = _events(spark, sf)
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("pcts"),
    )


# --------------------------------------------------------------------------
# Skew mitigation (semantics-preserving → oracle = the plain formulation)
# --------------------------------------------------------------------------


def skew_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage salted aggregation over events. Value sums go through
    integer cents (values have 2 decimals) so partial-merge order can't
    perturb float low bits — the result is bit-identical to plain
    GROUP BY, which is exactly what the oracle asserts."""
    from datalake_public_spark.operators.skew import salted_agg

    ev = _events(spark, sf).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    return salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("event_id", "count"),
            "sum_cents": ("cents", "sum"),
            "max_cents": ("cents", "max"),
        },
        n_salt=16,
        salt_cols=["event_id"],
    )


SKEW_AGG_SQL = """
SELECT event_type, count(event_id) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       max(CAST(round(value * 100) AS BIGINT)) AS max_cents
FROM events GROUP BY event_type
"""


def skew_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Salted fact×dim join (lineitem × orders on orderkey), aggregated
    to order priority. Plan: the small side replicates ×8 and the hot
    keys of the large side spread over 8 reducers; results identical to
    the plain join — asserted by the oracle."""
    from datalake_public_spark.operators.skew import salted_join

    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", F.round(F.col("l_quantity") * 100).cast("long").alias("qty_cents")
    )
    o = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, "l_orderkey", n_salt=8, large_salt_cols=["qty_cents"])
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("qty_cents").alias("sum_qty_cents"),
    )


SKEW_JOIN_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def similarity_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF approximate nearest neighbors (no SQL oracle — approximate by
    design; recall vs brute force asserted in tests/test_similarity.py)."""
    from datalake_public_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_topk(queries, emb, k=10, n_cells=16, n_probe=4)


# --------------------------------------------------------------------------
# Window frames / statistics / time-series spine
# --------------------------------------------------------------------------


def window_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Analytic window frames over per-customer order history: running
    total (rows unbounded-preceding), 3-row moving average, and frame-wide
    first/last. One shuffle on o_custkey serves all four functions —
    Catalyst plans a single Window operator for same-partitioning frames."""
    from pyspark.sql import Window

    o = _t(spark, sf, "orders").withColumn(
        # exact integer cents: running/moving sums of raw doubles differ
        # from the oracle in the last bit and can flip a round(…,2) boundary
        "cents",
        F.round(F.col("o_totalprice") * 100).cast("long"),
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = wo.rowsBetween(-2, Window.currentRow)
    full = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("cents").over(run) / 100.0, 2).alias("running_total"),
        # round to 4dp: counts<=3 make cents-averages end in .0/.5/.33/.67,
        # so no decimal-5 sits at the 5th place — boundary-safe cross-engine
        F.round(F.avg("cents").over(mov) / 100.0, 4).alias("moving_avg3"),
        F.first("o_orderdate").over(full).alias("first_order"),
        F.last("o_orderdate").over(full).alias("last_order"),
    )


WINDOW_FRAMES_SQL = """
SELECT o_orderkey, o_custkey,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2) AS running_total,
       round(avg(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0, 4) AS moving_avg3,
       first_value(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
       last_value(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
"""


def stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates per event type: stddev, variance, and the
    value↔user correlation — all single-pass algebraic (sum of squares /
    cross products combine map-side like any sum)."""
    ev = _events(spark, sf)
    return ev.groupBy("event_type").agg(
        F.round(F.stddev("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.round(F.covar_samp("value", F.col("user_id").cast("double")), 4).alias(
            "covar_vu"
        ),
        F.round(F.corr("value", F.col("user_id").cast("double")), 4).alias("corr_vu"),
    )


STATS_AGG_SQL = """
SELECT event_type,
       round(stddev_samp(value), 4) AS sd_value,
       round(var_samp(value), 4) AS var_value,
       round(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS covar_vu,
       round(corr(value, CAST(user_id AS DOUBLE)), 4) AS corr_vu
FROM events GROUP BY event_type
"""


def time_spine_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Dense hourly time spine per event type with zero-filled gaps:
    sequence() generates the spine from the observed min/max (a scalar
    subquery — no driver round-trip), cross join with the type dim, left
    join the hourly aggregate. The standard shape for gap-free
    time-series features at any scale: the spine is |hours|×|types| rows
    — tiny next to the fact table — and the fact side aggregates BEFORE
    the join, so the expensive side shuffles once at hour granularity."""
    ev = _events(spark, sf)
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour", "event_type", F.coalesce("n_events", F.lit(0)).alias("n_events")
        )
    )


TIME_SPINE_SQL = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT s.hour, t.event_type, coalesce(h.n_events, 0) AS n_events
FROM spine s
CROSS JOIN (SELECT DISTINCT event_type FROM events) t
LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
"""


def ntile_quartiles(spark: SparkSession, sf: str) -> DataFrame:
    """NTILE window: value quartiles within each event type, summarized
    to per-(type, quartile) count + cents. The total order (value, then
    event_id) makes tile assignment engine-deterministic.

    Scale: one shuffle on event_type; NTILE is a single sorted pass per
    partition. Skewed types sort within their partition — for extreme
    skew pre-aggregate or use approx percentiles instead."""
    from pyspark.sql import Window

    ev = _events(spark, sf)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


NTILE_SQL = """
WITH q AS (
  SELECT event_type, value,
         ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
  FROM events
)
SELECT event_type, CAST(quartile AS INT) AS quartile, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM q GROUP BY event_type, quartile
"""


def profile_orders(spark: SparkSession, sf: str) -> DataFrame:
    """One-pass column profile of the orders table (row/non-null/distinct
    counts + stringified min/max per column) — the pre-ingest sanity scan.
    Scale: one aggregation over one scan for ALL columns; swap exact
    distinct for approx_count_distinct at 100 TB (same plan shape)."""
    from datalake_public_spark.operators.quality import profile_table

    return profile_table(_t(spark, sf, "orders"))


def _profile_sql() -> str:
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    parts = [
        f"""
SELECT '{c}' AS "column", count(*) AS n_rows, count({c}) AS n_nonnull,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM orders"""
        for c in cols
    ]
    return " UNION ALL ".join(parts)


# --------------------------------------------------------------------------
# Format roundtrips: CSV (ingest-only format) and ORC (columnar lake format)
# --------------------------------------------------------------------------

_ROUNDTRIP_SQL = """
SELECT s_nationkey, count(*) AS n_suppliers,
       CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM supplier
GROUP BY s_nationkey
"""


def _format_roundtrip(spark: SparkSession, sf: str, fmt: str) -> DataFrame:
    """Write supplier out in ``fmt``, read it back with the schema'd
    reader, aggregate — proves lossless type fidelity for the format
    (doubles round-trip via shortest-repr text in CSV; natively in ORC).

    Scale: format conversion is a map-only job (no shuffle) — at 100 TB
    it parallelizes per input split; the oracle aggregates the original
    parquet, so any corruption in write→read shows up as a hash miss."""
    import os
    import tempfile

    from datalake_public_spark.sources.readers import read_csv_table, read_orc_table

    sup = _t(spark, sf, "supplier")
    tag = sf.strip("/").replace("/", "_")
    dest = os.path.join(tempfile.gettempdir(), f"dlps_roundtrip_{fmt}_{tag}")
    if fmt == "csv":
        sup.write.mode("overwrite").option("header", True).csv(dest)
        back = read_csv_table(spark, dest, sup.schema)
    else:
        sup.write.mode("overwrite").orc(dest)
        back = read_orc_table(spark, dest, sup.schema)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.round(F.col("s_acctbal") * 100).cast("long")).alias("acctbal_cents"),
    )


def csv_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    return _format_roundtrip(spark, sf, "csv")


def orc_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    return _format_roundtrip(spark, sf, "orc")


EXT_REGISTRY: dict[str, QuerySpec] = {
    "asof_join": QuerySpec(asof_join, ASOF_SQL),
    "range_join": QuerySpec(range_join, RANGE_JOIN_SQL),
    "join_semi": QuerySpec(join_semi, JOIN_SEMI_SQL),
    "join_anti": QuerySpec(join_anti, JOIN_ANTI_SQL),
    "set_intersect": QuerySpec(set_intersect, SET_INTERSECT_SQL),
    "set_except": QuerySpec(set_except, SET_EXCEPT_SQL),
    "cube_agg": QuerySpec(cube_agg, CUBE_SQL),
    "pivot_agg": QuerySpec(pivot_agg, PIVOT_SQL),
    "json_extract_agg": QuerySpec(json_extract_agg, JSON_EXTRACT_SQL),
    "string_funcs": QuerySpec(string_funcs, STRING_FUNCS_SQL),
    "approx_distinct": QuerySpec(approx_distinct, None),
    "approx_quantiles": QuerySpec(approx_quantiles, None),
    "skew_salted_agg": QuerySpec(skew_salted_agg, SKEW_AGG_SQL),
    "skew_salted_join": QuerySpec(skew_salted_join, SKEW_JOIN_SQL),
    "similarity_ivf": QuerySpec(similarity_ivf, None),
    "window_frames": QuerySpec(window_frames, WINDOW_FRAMES_SQL),
    "stats_agg": QuerySpec(stats_agg, STATS_AGG_SQL),
    "time_spine_gapfill": QuerySpec(time_spine_gapfill, TIME_SPINE_SQL),
    "csv_roundtrip_agg": QuerySpec(csv_roundtrip_agg, _ROUNDTRIP_SQL),
    "profile_orders": QuerySpec(profile_orders, _profile_sql()),
    "ntile_quartiles": QuerySpec(ntile_quartiles, NTILE_SQL),
    "orc_roundtrip_agg": QuerySpec(orc_roundtrip_agg, _ROUNDTRIP_SQL),
}
