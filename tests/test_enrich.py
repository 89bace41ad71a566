"""Enrichment layer tests (R1 join / R2 normalize / R3 union), including
broadcast-join plan verification."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_public_spark import schemas
from datalake_public_spark.operators import enrich, flatten
from datalake_public_spark.sources.readers import read_json_snapshots


def _names_types(schema):
    """Nullability-insensitive schema shape (literals are non-null in Spark)."""
    return [(f.name, f.dataType) for f in schema.fields]



def _formatted(spark, gbfs_paths):
    out = {}
    for key, spec in (
        ("ss", flatten.VELIB_STATION_STATUS_SPEC),
        ("si", flatten.VELIB_STATION_INFORMATION_SPEC),
        ("lime", flatten.LIME_FREE_BIKE_STATUS_SPEC),
    ):
        raw = read_json_snapshots(spark, gbfs_paths[key], spec.raw_schema)
        out[key] = flatten.flatten_feed(raw, spec)
    return out


def test_join_velib_inner_semantics(spark, gbfs_paths):
    """Info-only ids (fixture adds 2) must drop out: inner join on
    station_id (SURVEY §2.4 R1)."""
    f = _formatted(spark, gbfs_paths)
    joined = enrich.enrich_join_velib(f["ss"], f["si"])
    assert joined.count() == 50  # 52 info ids ∩ 50 status ids
    row = joined.filter(F.col("id") == "st0001").first()
    assert row.provider == "velib"
    assert row.lat is not None and row.num_bikes is not None


def test_join_is_broadcast(spark, gbfs_paths):
    """The station dimension must broadcast — no shuffle of the fact side
    (SURVEY §4 join strategy)."""
    f = _formatted(spark, gbfs_paths)
    plan = (
        enrich.enrich_join_velib(f["ss"], f["si"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lime_normalization(spark, gbfs_paths):
    f = _formatted(spark, gbfs_paths)
    lime = enrich.enrich_lime(f["lime"])
    rows = lime.collect()
    assert all(r.provider == "lime" and r.num_bikes == 1 and r.num_docks is None for r in rows)
    assert len(rows) == 80


def test_union_schema_contract(spark, gbfs_paths):
    f = _formatted(spark, gbfs_paths)
    unified = enrich.build_enriched(f["ss"], f["si"], f["lime"])
    assert _names_types(unified.schema) == _names_types(schemas.ENRICHED_UNIFIED)
    assert unified.count() == 130  # 50 velib + 80 lime
    assert set(r.provider for r in unified.select("provider").distinct().collect()) == {
        "velib",
        "lime",
    }
