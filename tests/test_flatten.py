"""Flatten operator tests: schema contracts, normalization semantics, and
plan quality (no RDD break — the plan must stay a single Catalyst tree)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from datalake_public_spark import schemas
from datalake_public_spark.operators import flatten
from datalake_public_spark.sources.readers import read_json_snapshots
from tests.conftest import EPOCH


def _names_types(schema):
    """Nullability-insensitive schema shape (literals are non-null in Spark)."""
    return [(f.name, f.dataType) for f in schema.fields]



def _flatten(spark, path, spec):
    raw = read_json_snapshots(spark, path, spec.raw_schema)
    return flatten.flatten_feed(raw, spec)


def test_ss_schema_and_rows(spark, gbfs_paths):
    df = _flatten(spark, gbfs_paths["ss"], flatten.VELIB_STATION_STATUS_SPEC)
    assert _names_types(df.schema) == _names_types(schemas.FORMATTED_VELIB_SS)
    rows = df.collect()
    assert len(rows) == 50  # one row per station (P1 explode)
    # snapshot epoch applied to every row, UTC
    expect = datetime.fromtimestamp(EPOCH, tz=timezone.utc).replace(tzinfo=None)
    assert all(r.lastUpdatedOther_timestamp == expect for r in rows)


def test_ss_bool_normalization_null_to_false(spark, gbfs_paths):
    """Reference contract: when(col==1).otherwise(False) coerces null→False
    (transform_ss_velib_with_spark.py:98-100; SURVEY §7.4 #3)."""
    df = _flatten(spark, gbfs_paths["ss"], flatten.VELIB_STATION_STATUS_SPEC)
    # fixture nulls is_installed on stations 24 and 49
    nulled = df.filter(F.col("station_id").isin("st0024", "st0049")).collect()
    assert len(nulled) == 2
    assert all(r.is_installed is False for r in nulled)
    assert all(r.last_reported_timestamp is None for r in nulled)
    assert df.filter(F.col("is_installed").isNull()).count() == 0


def test_si_schema_and_rental_methods_array(spark, gbfs_paths):
    """rental_methods is array<string> — deliberate fix of the reference's
    StringType mis-declaration (transform_si_velib_with_spark.py:72)."""
    df = _flatten(spark, gbfs_paths["si"], flatten.VELIB_STATION_INFORMATION_SPEC)
    assert _names_types(df.schema) == _names_types(schemas.FORMATTED_VELIB_SI)
    r = df.filter(F.col("station_id") == "st0000").first()
    assert isinstance(r.rental_methods, list) and len(r.rental_methods) == 2


def test_lime_schema_and_string_bools(spark, gbfs_paths):
    df = _flatten(spark, gbfs_paths["lime"], flatten.LIME_FREE_BIKE_STATUS_SPEC)
    assert _names_types(df.schema) == _names_types(schemas.FORMATTED_LIME_BS)
    assert df.count() == 80
    # string-coded bools normalized (transform_lime_with_spark.py:99-100)
    assert df.filter(F.col("is_reserved").isNull()).count() == 0
    assert dict(df.schema["is_reserved"].jsonValue().items())["type"] == "boolean"


def test_plan_is_unbroken_single_scan(spark, gbfs_paths):
    """The flatten must be one Catalyst plan: no RDD round-trip, schema
    applied at the scan (contrast reference §1.4 plan break)."""
    df = _flatten(spark, gbfs_paths["ss"], flatten.VELIB_STATION_STATUS_SPEC)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan json" in plan
    # an RDD break would show as ExistingRDD / Scan ExistingRDD
    assert "ExistingRDD" not in plan


def test_empty_array_snapshot_yields_zero_rows(spark, tmp_path):
    from tests.conftest import write_snapshot

    p = write_snapshot(tmp_path, "empty.json", {"lastUpdatedOther": EPOCH, "data": {"stations": []}})
    df = _flatten(spark, p, flatten.VELIB_STATION_STATUS_SPEC)
    assert df.count() == 0  # explode, not explode_outer (P1)
