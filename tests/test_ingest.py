"""Ingestor contract: fail-fast fetch, Hive-partitioned raw layout,
round-trip through the schema'd reader with partition pruning."""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from datalake_public_spark.operators.flatten import VELIB_STATION_STATUS_SPEC
from datalake_public_spark.sources.ingest import ingest_feed, land_snapshot, snapshot_path
from datalake_public_spark.sources.readers import latest_partition, read_json_snapshots
from tests.conftest import EPOCH, make_station_status_snapshot

TS1 = datetime(2024, 3, 1, 9, 0, 5, tzinfo=timezone.utc)
TS2 = datetime(2024, 3, 1, 12, 0, 5, tzinfo=timezone.utc)


def test_snapshot_path_layout():
    p = snapshot_path("/lake/raw", "velib", "station_status", TS1)
    assert p == (
        "/lake/raw/velib/station_status/"
        "ingest_date=20240301/ingest_time=090005/snapshot.json"
    )


def test_ingest_fail_fast():
    """Fetch errors must raise (the reference returned None — SURVEY §7.4 #7)."""

    def boom(url):
        raise ConnectionError("feed down")

    with pytest.raises(ConnectionError):
        ingest_feed("http://x", "/tmp/never", "velib", "ss", fetcher=boom)


def test_ingest_roundtrip_partition_pruning(spark, tmp_path):
    """Two ingest ticks → partition columns discovered → latest_partition
    selects only the newer snapshot."""
    root = str(tmp_path / "raw")
    for ts, epoch in ((TS1, EPOCH), (TS2, EPOCH + 10800)):
        snap = make_station_status_snapshot(epoch=epoch, n_stations=5)
        ingest_feed(
            "http://feed",
            root,
            "velib",
            "station_status",
            now=lambda t=ts: t,
            fetcher=lambda url, s=snap: json.dumps(s).encode(),
        )
    raw = read_json_snapshots(
        spark,
        f"{root}/velib/station_status",
        VELIB_STATION_STATUS_SPEC.raw_schema,
    )
    assert set(raw.select("ingest_time").distinct().toPandas()["ingest_time"]) == {
        90005,
        120005,
    }
    latest = latest_partition(raw, "ingest_time")
    assert latest.count() == 1
    assert latest.select("lastUpdated" "Other").first()[0] == EPOCH + 10800


def test_land_snapshot_verbatim(tmp_path):
    raw = b'{"data": {"stations": []}, "lastUpdatedOther": 1}'
    p = land_snapshot(raw, str(tmp_path), "velib", "ss", TS1)
    assert open(p, "rb").read() == raw


def test_quarantine_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from datalake_public_spark.sources.readers import read_json_with_quarantine

    p = tmp_path / "snap.json"
    p.write_text(
        '{"station_id": "s1", "bikes": 3}\n'
        "{this is not json}\n"
        '{"station_id": "s2", "bikes": 5}\n'
        '{"station_id": "s3", "bikes": "not-a-number"}\n'
    )
    schema = StructType(
        [StructField("station_id", StringType()), StructField("bikes", LongType())]
    )
    good, bad = read_json_with_quarantine(spark, str(p), schema)
    assert {(r.station_id, r.bikes) for r in good.collect()} == {("s1", 3), ("s2", 5)}
    bad_rows = [r.raw_record for r in bad.collect()]
    assert len(bad_rows) == 2 and any("not json" in b for b in bad_rows)
    # reconciliation: nothing silently dropped
    assert good.count() + bad.count() == 4
    # caller's schema object not mutated by the corrupt-column augmentation
    assert len(schema.fields) == 2
