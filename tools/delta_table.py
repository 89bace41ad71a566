"""Cross-round mover table with CANARY-NORMALIZED deltas (VERDICT r11
item 7 / NOTES_r11 open thread 3).

Every sweep/bench artifact since round 11 carries a ``canary`` block
(tools/host_canary.py: fixed codegen + shuffle probes at start/mid/end).
Raw cross-round deltas on unbanded entries conflate code movement with
host-speed movement (round 10's box drifted 10-25% with steal at 0%;
round 11's final merges hit a live ~1.5x window). This tool emits the
mover table NOTES cites, with BOTH columns:

    raw %     = new/old - 1                       (what the file says)
    norm %    = new/(old * host_ratio) - 1        (code movement after
                dividing out the measured host-speed ratio of the two
                vintages)

``host_ratio`` is the ratio of the two artifacts' median canary probe
times, per probe kind, combined by geometric mean — the shuffle probe
tracks shuffle-bound entries and the codegen probe scan-bound ones, and
the geomean is the single-number compromise the table needs (per-entry
attribution stays in prose where it matters). Banded entries compare
BAND MIN to BAND MIN (the documented headline rule) and are flagged, so
the reader knows which rows carry their own variance evidence.

Usage:
    python tools/delta_table.py OLD.json NEW.json [--min-abs 1.0]

Emits a GitHub-markdown table sorted by |norm %| descending, skipping
entries whose |delta| < --min-abs seconds in both directions (noise
floor for the sub-second rows).

CAVEAT (learned on SCALE3_r11 vs _r12): the canary probes measure
CPU/JVM speed only. A PAGE-CACHE state difference — e.g. one x1000
probe run right after data replication (cache-warm) vs one run
disk-cold (11 GB lineitem / ~115 MB/s single disk = ~96 s of pure read
on q3) — inflates scan-bound rows in a way the canary cannot divide
out; normalization then OVERSTATES the regression. When old and new
disagree on scan-bound entries but agree after subtracting the scan
(or when same-vintage A-B rows exist, like q5 vs q5_bucketed), trust
the same-vintage comparison and say so in prose.
"""

from __future__ import annotations

import json
import math
import statistics
import sys


def _canary_median(doc: dict, key: str) -> float | None:
    """Median of a probe kind across the artifact's canary positions,
    including any --only merge keys (they are the same probe on the
    same box, just a different moment)."""
    vals = [
        pos[key]
        for name, pos in doc.get("canary", {}).items()
        if isinstance(pos, dict) and key in pos
    ]
    return statistics.median(vals) if vals else None


def host_ratio(old: dict, new: dict) -> tuple[float, dict]:
    parts: dict[str, float] = {}
    for key in ("codegen_s", "shuffle_s"):
        o, n = _canary_median(old, key), _canary_median(new, key)
        if o and n:
            parts[key] = n / o
    if not parts:
        return 1.0, {}
    ratio = math.exp(sum(math.log(v) for v in parts.values()) / len(parts))
    return ratio, parts


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    min_abs = 1.0
    if "--min-abs" in sys.argv:
        min_abs = float(sys.argv[sys.argv.index("--min-abs") + 1])
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    ratio, parts = host_ratio(old, new)
    part_s = ", ".join(f"{k} {v:.2f}" for k, v in parts.items())
    print(
        f"host ratio {new_path} / {old_path}: **{ratio:.2f}** "
        f"(geomean of canary medians: {part_s})\n"
    )

    rows = []
    o_res, n_res = old.get("results", {}), new.get("results", {})
    for entry in sorted(set(o_res) & set(n_res)):
        o, n = o_res[entry], n_res[entry]
        os_, ns_ = o.get("spark_s"), n.get("spark_s")
        if not isinstance(os_, (int, float)) or not isinstance(ns_, (int, float)):
            continue
        if abs(ns_ - os_) < min_abs or os_ <= 0:
            continue
        raw = ns_ / os_ - 1
        norm = ns_ / (os_ * ratio) - 1
        band = (
            "band/band"
            if "spark_s_band" in o and "spark_s_band" in n
            else "band/-"
            if "spark_s_band" in o
            else "-/band"
            if "spark_s_band" in n
            else "-"
        )
        # shape-change flag (VERDICT r12 item 5): a row-count difference
        # means the entry's OUTPUT changed between rounds (e.g.
        # event_graph_suite growing an op tag) — its delta is a
        # different-work comparison, not a regression signal
        o_rows, n_rows = o.get("rows"), n.get("rows")
        shape = (
            f"shape-change {o_rows}→{n_rows}"
            if o_rows is not None and n_rows is not None and o_rows != n_rows
            else "-"
        )
        rows.append((entry, os_, ns_, raw, norm, band, shape))

    rows.sort(key=lambda r: -abs(r[4]))
    print(
        "| entry | old s | new s | raw Δ% | canary-norm Δ% | banded "
        "| shape |"
    )
    print("|---|---|---|---|---|---|---|")
    for entry, os_, ns_, raw, norm, band, shape in rows:
        print(
            f"| {entry} | {os_:.1f} | {ns_:.1f} | {raw:+.0%} "
            f"| {norm:+.0%} | {band} | {shape} |"
        )


if __name__ == "__main__":
    main()
