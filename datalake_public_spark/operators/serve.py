"""Serving-shape projections (document/geo sink preparation).

Reference operators P7 (surrogate doc-id ``id_concat``,
``index_to_elastic_with_spark.py:133``), P8 (geo-point assembly
``[lon, lat]`` + drop, ``:134,136``) — the shaping applied before the
Elasticsearch bulk write (K3, ``:139-150``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_id_concat(df: DataFrame, id_col: str = "id", time_col: str = "time") -> DataFrame:
    """P7: ``id_concat = id || '_' || cast(time as string)``."""
    return df.withColumn(
        "id_concat", F.concat(F.col(id_col), F.lit("_"), F.col(time_col).cast("string"))
    )


def with_location(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """P8: ES geo_point array, **lon-first** convention, sources dropped."""
    return df.withColumn("location", F.array(F.col(lon_col), F.col(lat_col))).drop(
        lat_col, lon_col
    )


def to_serving_shape(df: DataFrame) -> DataFrame:
    """Full serving projection over the enriched unified table
    (``index_to_elastic_with_spark.py:133-136``)."""
    return with_location(with_id_concat(df))
