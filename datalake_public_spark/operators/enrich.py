"""Enrichment layer: join / normalize / union — replaces dbt-on-Athena.

The reference runs its relational core in *external* dbt models
(``dags/dag_bike.py:122-128``; model names ``enriched_join_velib``,
``enriched_lime``, ``enriched_join_velib_lime`` at ``dag_bike.py:125``);
only the consumer schema is in-repo
(``index_to_elastic_with_spark.py:115-123``). Semantics here follow
SURVEY §2.4's inference (R1 equi inner join on station_id, R2 lime
normalization with num_bikes=1, R3 union-by-name with provider
discriminator), validated by fixture tests.

Scale: station_information is a small dimension (~1.5k rows for Vélib';
dimensions stay small even at 100 TB of fact snapshots) → broadcast hash
join, zero shuffle of the fact side. The union is shuffle-free. So the whole
enrichment layer moves each fact row exactly zero times across the network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_public_spark import schemas
from datalake_public_spark.operators.flatten import conform


def enrich_join_velib(status: DataFrame, info: DataFrame) -> DataFrame:
    """R1: stations_status ⋈ station_information on ``station_id``.

    Inner join (ids present in only one feed drop out — pinned by fixture
    test with status-only/info-only ids, FIXTURES.md §1.2). The information
    side is broadcast: it is a pure dimension (name/lat/lon/capacity).
    """
    s = status.select(
        F.col("station_id"),
        F.col("num_bikes_available"),
        F.col("num_docks_available"),
        F.col("lastUpdatedOther_timestamp").alias("time"),
    )
    i = info.select("station_id", "lat", "lon")
    return (
        s.join(F.broadcast(i), on="station_id", how="inner")
        .select(
            F.lit("velib").alias("provider"),
            F.col("station_id").alias("id"),
            F.col("time"),
            F.col("lat"),
            F.col("lon"),
            F.col("num_bikes_available").alias("num_bikes"),
            F.col("num_docks_available").alias("num_docks"),
        )
    )


def enrich_lime(bikes: DataFrame) -> DataFrame:
    """R2: free-floating bikes → unified shape.

    Each row is one bike ⇒ ``num_bikes=1``; docked capacity is not a lime
    concept ⇒ ``num_docks`` null (FIXTURES.md §3)."""
    return bikes.select(
        F.lit("lime").alias("provider"),
        F.col("bike_id").alias("id"),
        F.col("last_updated_timestamp").alias("time"),
        F.col("lat"),
        F.col("lon"),
        F.lit(1).alias("num_bikes"),
        F.lit(None).cast("int").alias("num_docks"),
    )


def enrich_union(velib: DataFrame, lime: DataFrame) -> DataFrame:
    """R3: schema-unifying union-by-name, conformed to ENRICHED_UNIFIED."""
    out = velib.unionByName(lime, allowMissingColumns=True)
    return conform(out, schemas.ENRICHED_UNIFIED)


def build_enriched(status: DataFrame, info: DataFrame, bikes: DataFrame) -> DataFrame:
    """Full enrichment: R1 + R2 + R3 as one lazy plan."""
    return enrich_union(enrich_join_velib(status, info), enrich_lime(bikes))
