"""Feed flattening: nested GBFS snapshot → flat formatted table.

One data-driven operator replaces the reference's three near-identical
scripts (``transform_ss_velib_with_spark.py``, ``transform_si_velib_with_spark.py``,
``transform_lime_with_spark.py``). Each feed is described by a ``FeedSpec``;
the flatten itself is a single unbroken Catalyst plan:

    read.schema(S).json → select(epoch→ts, explode(array)) → project/normalize

covering reference operators P1 (explode, ``transform_ss_velib_with_spark.py:63-66``),
P2 (dot-path projection, ``:85-95``), P3 (epoch→timestamp, ``:64,94`` — done
in one step via ``timestamp_seconds`` instead of the reference's
string round-trip), P4/P5 (bool normalization with null→False,
``:98-100`` / ``transform_lime_with_spark.py:99-100``), P11 (rename/drop),
and P12 (schema enforcement — name-based casts, never
``createDataFrame(df.rdd, schema)``; SURVEY §1.4).

Scale: the flatten is embarrassingly parallel (no shuffle at all — explode
and projections are narrow), so throughput is bounded by JSON scan speed.
At 100 TB the win is the declared schema (no inference pass) and
WholeStageCodegen across the whole operator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from datalake_public_spark import schemas


def epoch_to_ts(col: Column | str) -> Column:
    """Epoch-seconds → timestamp in one step (reference P3 did
    ``from_unixtime`` then ``to_timestamp`` via a string;
    ``transform_ss_velib_with_spark.py:64,101-102``). Session tz is pinned
    UTC so the semantics are machine-independent (SURVEY §7.4 #2)."""
    return F.timestamp_seconds(F.col(col) if isinstance(col, str) else col)


def int_to_bool(col: Column | str) -> Column:
    """1/0-coded boolean with the reference's null→False coercion
    (``when(col==1, True).otherwise(False)``,
    ``transform_ss_velib_with_spark.py:98-100``). The ``otherwise(False)``
    is part of the observable contract — preserve it (SURVEY §7.4 #3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == 1, F.lit(True)).otherwise(F.lit(False))


def str_to_bool(col: Column | str) -> Column:
    """"true"/"false" string boolean, null→False
    (``transform_lime_with_spark.py:99-100``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "true", F.lit(True)).otherwise(F.lit(False))


@dataclass(frozen=True)
class FeedSpec:
    """Declarative description of one GBFS feed's flatten."""

    name: str
    raw_schema: StructType
    array_path: str  # e.g. "data.stations"
    snapshot_epoch_col: str  # root epoch column, e.g. "lastUpdatedOther"
    snapshot_ts_name: str  # output name, e.g. "lastUpdatedOther_timestamp"
    # (output_name, zero-arg Column builder over the exploded alias "item").
    # Builders, not Columns: PySpark 4 requires an active session to
    # construct Column expressions, and specs are module-level.
    projections: tuple[tuple[str, Callable[[], Column]], ...] = field(default=())
    out_schema: StructType | None = None


def _item(colname: str) -> Column:
    return F.col(f"item.{colname}")


VELIB_STATION_STATUS_SPEC = FeedSpec(
    name="velib_station_status",
    raw_schema=schemas.RAW_VELIB_STATION_STATUS,
    array_path="data.stations",
    snapshot_epoch_col="lastUpdatedOther",
    snapshot_ts_name="lastUpdatedOther_timestamp",
    projections=(
        ("station_id", lambda: _item("station_id")),
        ("stationCode", lambda: _item("stationCode")),
        ("num_bikes_available", lambda: _item("num_bikes_available")),
        ("num_docks_available", lambda: _item("num_docks_available")),
        ("is_installed", lambda: int_to_bool(_item("is_installed"))),
        ("is_returning", lambda: int_to_bool(_item("is_returning"))),
        ("is_renting", lambda: int_to_bool(_item("is_renting"))),
        ("last_reported_timestamp", lambda: epoch_to_ts(_item("last_reported"))),
    ),
    out_schema=schemas.FORMATTED_VELIB_SS,
)

VELIB_STATION_INFORMATION_SPEC = FeedSpec(
    name="velib_station_information",
    raw_schema=schemas.RAW_VELIB_STATION_INFORMATION,
    array_path="data.stations",
    snapshot_epoch_col="lastUpdatedOther",
    snapshot_ts_name="lastUpdatedOther_timestamp",
    projections=(
        ("station_id", lambda: _item("station_id")),
        ("stationCode", lambda: _item("stationCode")),
        ("name", lambda: _item("name")),
        ("lat", lambda: _item("lat")),
        ("lon", lambda: _item("lon")),
        ("capacity", lambda: _item("capacity")),
        # array<string>, diverging from the reference's StringType bug
        # (transform_si_velib_with_spark.py:72; SURVEY §1.3)
        ("rental_methods", lambda: _item("rental_methods")),
    ),
    out_schema=schemas.FORMATTED_VELIB_SI,
)

LIME_FREE_BIKE_STATUS_SPEC = FeedSpec(
    name="lime_free_bike_status",
    raw_schema=schemas.RAW_LIME_FREE_BIKE_STATUS,
    array_path="data.bikes",
    snapshot_epoch_col="last_updated",
    snapshot_ts_name="last_updated_timestamp",
    projections=(
        ("bike_id", lambda: _item("bike_id")),
        ("lat", lambda: _item("lat")),
        ("lon", lambda: _item("lon")),
        ("is_reserved", lambda: str_to_bool(_item("is_reserved"))),
        ("is_disabled", lambda: str_to_bool(_item("is_disabled"))),
        ("current_range_meters", lambda: _item("current_range_meters")),
        ("vehicle_type_id", lambda: _item("vehicle_type_id")),
        ("vehicle_type", lambda: _item("vehicle_type")),
        ("last_reported_timestamp", lambda: epoch_to_ts(_item("last_reported"))),
    ),
    out_schema=schemas.FORMATTED_LIME_BS,
)

FEED_SPECS = {
    s.name: s
    for s in (VELIB_STATION_STATUS_SPEC, VELIB_STATION_INFORMATION_SPEC, LIME_FREE_BIKE_STATUS_SPEC)
}


def flatten_feed(raw: DataFrame, spec: FeedSpec) -> DataFrame:
    """Nested snapshot DataFrame → flat formatted DataFrame (one plan).

    ``explode`` (not ``explode_outer``): a snapshot with an empty station
    array contributes zero rows, matching the reference (P1).
    Output is name-based cast to ``spec.out_schema`` — the engine's
    replacement for the positional RDD round-trip (P12).
    """
    exploded = raw.select(
        epoch_to_ts(spec.snapshot_epoch_col).alias(spec.snapshot_ts_name),
        F.explode(F.col(spec.array_path)).alias("item"),
    )
    flat = exploded.select(
        F.col(spec.snapshot_ts_name),
        *[build().alias(name) for name, build in spec.projections],
    )
    if spec.out_schema is not None:
        flat = conform(flat, spec.out_schema)
    return flat


def conform(df: DataFrame, schema: StructType) -> DataFrame:
    """Name-based schema enforcement: select schema fields in order, casting
    where types differ. The declarative replacement for the reference's
    ``createDataFrame(df.rdd, schema)`` positional break (SURVEY §1.4)."""
    cols = []
    for f_ in schema.fields:
        if f_.name not in df.columns:
            raise ValueError(f"conform: missing column {f_.name!r}; have {df.columns}")
        cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
    return df.select(*cols)
