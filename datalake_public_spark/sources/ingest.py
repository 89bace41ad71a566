"""Raw-zone ingestors: HTTP snapshot fetch → verbatim bytes in the lake.

Reference operators S1-S3 (``velib_data_fetcher.py:18-71,74-127``,
``lime_data_fetcher.py:14-68``) and K1 (raw ``put_object`` of the
response body, ``velib_data_fetcher.py:57-62``). Differences, by design:

  * **fail-fast**: the reference swallows exceptions and returns ``None``
    (``velib_data_fetcher.py:68-71``), handing downstream a ``"None"``
    path — SURVEY §7.4 #7 calls this a bug, not a contract. Here any
    fetch/land error raises.
  * **Hive-partitioned layout** ``<root>/<provider>/<feed>/ingest_date=
    YYYYMMDD/ingest_time=HHMMSS/snapshot.json`` instead of bare
    ``YYYYMMDD/HHMMSS`` folders (``velib_data_fetcher.py:27-29``) — Spark
    partition discovery then exposes ingest_date/ingest_time as columns
    and prunes on them (readers.latest_partition), eliminating the
    reference's boto3 listing (S6).
  * **injectable clock and fetcher** — no ``datetime.now()`` or live HTTP
    inside the testable path.

The raw zone stays verbatim response bytes (row/document-oriented,
SURVEY §1.2): re-parsing history under a new schema must always be
possible, so nothing is normalized at ingest.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from datetime import datetime, timezone


def fetch_snapshot(url: str, *, timeout: float = 10.0) -> bytes:
    """HTTP GET one feed snapshot (reference S1-S3 envelope: 10 s timeout,
    ``raise_for_status``). Raises on any HTTP/transport error."""
    import requests

    r = requests.get(url, timeout=timeout)
    r.raise_for_status()
    return r.content


def snapshot_path(
    root: str, provider: str, feed: str, ts: datetime, *, filename: str = "snapshot.json"
) -> str:
    """Hive-partitioned raw-zone key for one snapshot."""
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    ts = ts.astimezone(timezone.utc)
    return (
        f"{root.rstrip('/')}/{provider}/{feed}/"
        f"ingest_date={ts:%Y%m%d}/ingest_time={ts:%H%M%S}/{filename}"
    )


def land_snapshot(raw: bytes, root: str, provider: str, feed: str, ts: datetime) -> str:
    """Write verbatim snapshot bytes to the raw zone; returns the path.

    Local/NFS filesystems here; for object stores the same layout goes
    through fsspec/boto3 — the path contract is what matters (readers and
    the streaming source both consume it)."""
    path = snapshot_path(root, provider, feed, ts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(raw)
    return path


def ingest_feed(
    url: str,
    root: str,
    provider: str,
    feed: str,
    *,
    now: Callable[[], datetime] = lambda: datetime.now(timezone.utc),
    fetcher: Callable[[str], bytes] = fetch_snapshot,
) -> str:
    """One ingest tick: fetch → land → return the landed path (the value
    the reference passed via XCom into its transform task, O2). Any
    failure raises — a scheduler retries the whole tick (O4)."""
    return land_snapshot(fetcher(url), root, provider, feed, now())
