"""Generate the committed GBFS JSON snapshot fixtures that back the
``ingest_suite`` driver entry (VERDICT r5 item 2: the reference's own
ingest pipeline — S4 schema'd JSON read, P1 explode, P2 nested
projection, P3 epoch→timestamp, P4/P5 null→False bools, P12 conform —
had no driver-oracle row).

Deterministic (seeded PRNG, fixed epochs) so the files can live in git
and the DuckDB twin reads THE SAME bytes. Shapes follow FIXTURES.md §1 /
the reference's raw zone (``velib_data_fetcher.py:27-29``):

  * velib_station_status/  — 3 single-line snapshots 90 min apart;
    snapshot 3 has an EMPTY stations array (explode must drop it);
    sprinkled null is_* (→False) and null last_reported (→null ts);
  * velib_station_information/ — 1 snapshot; 38 ids shared with status
    + 2 info-only (status keeps 2 status-only); rental_methods arrays
    of len 0-3, some absent (→null);
  * lime_free_bike_status/ — 1 snapshot; string-coded bools with nulls;
  * quarantine/ — well-formed lines interleaved with malformed JSON
    (truncated object, bare garbage) for the PERMISSIVE-split reader.

Usage: python tools/gen_gbfs_fixtures.py   # rewrites the fixture tree
"""

from __future__ import annotations

import json
import os
import random

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datalake_public_spark",
    "fixtures",
    "gbfs",
)

BASE_EPOCH = 1704448800  # 2024-01-05 10:00:00 UTC
METHODS = ["CREDITCARD", "KEY", "PHONE"]


def _write(feed: str, name: str, obj_or_lines) -> None:
    d = os.path.join(ROOT, feed)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, name)
    with open(path, "w") as f:
        if isinstance(obj_or_lines, list):
            f.write("\n".join(obj_or_lines) + "\n")
        else:
            # one snapshot = ONE single-line JSON object (JSON-lines
            # readable, transform_ss_velib_with_spark.py:59)
            f.write(json.dumps(obj_or_lines, separators=(",", ":")) + "\n")


def _status_station(rng: random.Random, sid: str, epoch: int) -> dict:
    st = {
        "station_id": sid,
        "stationCode": f"c{sid[3:]}",
        "num_bikes_available": rng.randrange(0, 61),
        "num_docks_available": rng.randrange(0, 61),
        "is_installed": 1,
        "is_returning": rng.choice([0, 1]),
        "is_renting": rng.choice([0, 1]),
        "last_reported": epoch - rng.randrange(0, 600),
    }
    r = rng.random()
    if r < 0.08:  # null int-coded bool → False (the P4 contract)
        st["is_installed"] = None
    if r > 0.94:  # null epoch → null timestamp
        st["last_reported"] = None
    return st


def main() -> None:
    rng = random.Random(20240105)
    shared = [f"st_{i:03d}" for i in range(38)]
    status_ids = shared + ["st_900", "st_901"]  # 2 status-only
    info_ids = shared + ["st_950", "st_951"]  # 2 info-only

    for snap, minutes in enumerate((0, 90)):
        epoch = BASE_EPOCH + minutes * 60
        _write(
            "velib_station_status",
            f"snap_{snap}.json",
            {
                "lastUpdatedOther": epoch,
                "data": {
                    "stations": [
                        _status_station(rng, sid, epoch) for sid in status_ids
                    ]
                },
            },
        )
    # empty stations array: explode (not explode_outer) yields 0 rows
    _write(
        "velib_station_status",
        "snap_2.json",
        {"lastUpdatedOther": BASE_EPOCH + 10800, "data": {"stations": []}},
    )

    info_stations = []
    for i, sid in enumerate(info_ids):
        st = {
            "station_id": sid,
            "stationCode": f"c{sid[3:]}",
            "name": f"Station {sid.upper()}",
            "lat": round(48.80 + rng.random() * 0.11, 6),
            "lon": round(2.25 + rng.random() * 0.17, 6),
            "capacity": rng.randrange(10, 71),
            "rental_methods": rng.sample(METHODS, rng.randrange(0, 4)),
        }
        if i % 13 == 7:  # absent array → null (vs empty) distinction
            del st["rental_methods"]
        info_stations.append(st)
    _write(
        "velib_station_information",
        "snap_0.json",
        {
            "lastUpdatedOther": BASE_EPOCH + 30,
            "data": {"stations": info_stations},
        },
    )

    bikes = []
    for i in range(30):
        b = {
            "bike_id": f"bike_{i:03d}",
            "lat": round(48.80 + rng.random() * 0.11, 6),
            "lon": round(2.25 + rng.random() * 0.17, 6),
            "is_reserved": rng.choice(["true", "false"]),
            "is_disabled": rng.choice(["true", "false"]),
            "current_range_meters": rng.randrange(1000, 30000),
            "vehicle_type_id": rng.choice(["scooter", "ebike"]),
            "vehicle_type": rng.choice(["SCOOTER", "EBIKE"]),
            "last_reported": BASE_EPOCH + 60 + i,
        }
        if i % 9 == 4:  # null string-coded bool → False (P5 contract)
            b["is_reserved"] = None
        if i % 11 == 6:
            b["current_range_meters"] = None
        bikes.append(b)
    _write(
        "lime_free_bike_status",
        "snap_0.json",
        {"last_updated": BASE_EPOCH + 120, "data": {"bikes": bikes}},
    )

    # quarantine mix: 4 good single-line snapshots + 3 malformed lines
    good = [
        json.dumps(
            {
                "lastUpdatedOther": BASE_EPOCH + k,
                "data": {
                    "stations": [_status_station(rng, f"st_{k:03d}", BASE_EPOCH)]
                },
            },
            separators=(",", ":"),
        )
        for k in range(4)
    ]
    # each malformed line fails at a character INSIDE the line (not via
    # truncation): a truncated object makes DuckDB's newline reader
    # swallow the next line as continuation, diverging from Spark's
    # strictly line-based PERMISSIVE split
    bad = [
        '{"lastUpdatedOther": 1704448800, "data": ]}',  # unexpected ]
        "not json at all",
        '{"lastUpdatedOther": }',  # syntax error
    ]
    _write(
        "quarantine",
        "mixed_0.json",
        [good[0], bad[0], good[1], bad[1]],
    )
    _write("quarantine", "mixed_1.json", [good[2], bad[2], good[3]])
    print(f"wrote fixtures under {ROOT}")


if __name__ == "__main__":
    main()
