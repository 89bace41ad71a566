"""Generate the committed late-arrival streaming fixture backing the
``streaming_windows`` op='late_*' rows (VERDICT r5 item 5: the three
streaming driver rows drained corpora where nothing was ever late — the
watermark's DROP side had no evidence).

Three JSON-lines batch files, consumed as THREE micro-batches
(maxFilesPerTrigger=1, mtime-ordered). Three, not two, because append-
mode aggregation only DROPS a row whose group was already evicted in a
PRIOR batch — a late row whose window is still in the state store
merges into it (measured: batch-1 late rows landed in live hour-1
state with numRowsDroppedByWatermark=0). The drop therefore needs the
eviction to happen a full batch before the late data arrives:

  batch_0 — 3 events in each of hours H+0 … H+9 (30 rows).
            max ts H+9:40 ⇒ watermark after batch 0 = H+7:40.
  batch_1 — 3 fresh events in hour H+12 (max ts H+12:35 ⇒ watermark
            after batch 1 = H+10:35, evicting/emitting EVERY hour-0..9
            window; the hour-12 window stays open forever).
  batch_2 — 4 LATE events back in hour H+1: its window end H+2 is
            8 h below the in-effect watermark and the state is gone ⇒
            the engine MUST drop all 4 (numRowsDroppedByWatermark).

Every boundary is deliberately >20 minutes away from any watermark
value, so the <=/< eviction edge cases cannot flip the expected sets.

Expected contract (mirrored by the DuckDB twin and the Spark-side
accounting): emitted = hours 0..9 with batch-0 counts only; dropped
late set = 4 (NON-EMPTY by construction); open = 3.

Usage: python tools/gen_streaming_late_fixture.py
"""

from __future__ import annotations

import json
import os

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datalake_public_spark",
    "fixtures",
    "streaming_late",
)

BASE = 1704448800  # 2024-01-05 10:00:00 UTC
H = 3600


def _ev(eid: int, uid: int, ts: int, value: float) -> str:
    return json.dumps(
        {
            "event_id": eid,
            "user_id": uid,
            "event_type": "view" if eid % 2 == 0 else "click",
            "ts_epoch": ts,
            "value": value,
        },
        separators=(",", ":"),
    )


def main() -> None:
    os.makedirs(ROOT, exist_ok=True)
    eid = 0
    b0 = []
    for h in range(10):
        for off in (300, 1200, 2400):  # :05 :20 :40
            b0.append(_ev(eid, 100 + eid % 7, BASE + h * H + off, 0.5 + eid % 4))
            eid += 1
    b1 = []
    for off in (1500, 1800, 2100):  # 3 fresh rows, hour H+12 (max :35)
        b1.append(_ev(950 + off, 300, BASE + 12 * H + off, 1.5))
    b2 = []
    for off in (100, 500, 900, 1300):  # 4 late rows, hour H+1
        b2.append(_ev(900 + off, 200, BASE + 1 * H + off, 2.5))
    for name, lines in (
        ("batch_0.json", b0), ("batch_1.json", b1), ("batch_2.json", b2)
    ):
        with open(os.path.join(ROOT, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {len(b0)}+{len(b1)}+{len(b2)} events under {ROOT}")


if __name__ == "__main__":
    main()
