"""Merge multiple ×1000 probe artifacts into one multi-vintage rung file.

Round 12 established the two-vintage protocol for the spark-only ×1000
rung (disk-cold + cache-warm runs of tools/scale3_probe.py, headline =
min across vintages — NOTES_r12 §8); the merge there was ad hoc. This
makes it a repeatable tool (VERDICT r12 item 4: "band the
single-vintage rows" — a vintage pair per entry IS the band, with the
cache state recorded instead of argued).

Usage:
    python tools/merge_scale3_vintages.py OUT.json cold=A.json warm=B.json \
        [fresh_isolated=C.json ...]

Per entry: ``spark_s_reps`` concatenates every vintage's reps in the
order given, ``spark_s`` is the min across all (the standing band-min
headline rule), ``spark_s_by_vintage`` keeps the per-vintage reps, and
row counts are asserted identical across vintages (an entry whose rows
moved between runs is a bug, not a vintage). The FIRST vintage's
``op_spark_s``/``prepare_s`` ride along under their plain keys; later
vintages' phase maps are kept as ``op_spark_s_<vintage>``. Top-level:
one ``canary_<vintage>`` block per input (each with ``page_cache_gb``
— the field that attributes vintage differences) and
``wall_s_by_vintage``. Entries present in only SOME vintages (e.g. a
fresh-process single-entry run) merge fine — absent vintages simply
contribute no reps.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3 or any("=" not in a for a in sys.argv[2:]):
        raise SystemExit(__doc__)
    out_path = sys.argv[1]
    vintages: list[tuple[str, dict]] = []
    for arg in sys.argv[2:]:
        name, path = arg.split("=", 1)
        with open(path) as f:
            vintages.append((name, json.load(f)))

    first = vintages[0][1]
    merged: dict = {
        "sf_dir": first.get("sf_dir"),
        "role": (
            "x1000 spark-only rung — noop-sink timing + row-count "
            "sanity; no oracle (see tools/scale3_probe.py docstring); "
            "min-of-reps ACROSS VINTAGES "
            f"({', '.join(n for n, _ in vintages)}); merged by "
            "tools/merge_scale3_vintages.py"
        ),
        "reps": first.get("reps"),
        "wall_s": first.get("wall_s"),
        "wall_s_by_vintage": {
            n: d.get("wall_s") for n, d in vintages if d.get("wall_s")
        },
        "results": {},
    }
    for n, d in vintages:
        if d.get("canary"):
            merged[f"canary_{n}"] = d["canary"]

    entries = sorted({e for _, d in vintages for e in d.get("results", {})})
    for entry in entries:
        row: dict = {}
        reps: list[float] = []
        by_v: dict[str, list[float]] = {}
        for vname, d in vintages:
            r = d.get("results", {}).get(entry)
            if r is None:
                continue
            vreps = r.get("spark_s_reps") or (
                [r["spark_s"]] if isinstance(r.get("spark_s"), (int, float)) else []
            )
            if vreps:
                by_v[vname] = vreps
                reps.extend(vreps)
            if "err" in r:
                row.setdefault("err", r["err"])
            if r.get("rows") is not None:
                if row.get("rows") is not None and row["rows"] != r["rows"]:
                    raise SystemExit(
                        f"{entry}: rows differ across vintages "
                        f"({row['rows']} vs {r['rows']} in {vname}) — "
                        "shape change or bug, refuse to merge"
                    )
                row["rows"] = r["rows"]
            if "prepare_s" in r:
                row.setdefault("prepare_s", r["prepare_s"])
                row.setdefault("prepare_s_by_vintage", {})[vname] = r[
                    "prepare_s"
                ]
            if r.get("op_spark_s"):
                if "op_spark_s" not in row:
                    row["op_spark_s"] = r["op_spark_s"]
                else:
                    row[f"op_spark_s_{vname}"] = r["op_spark_s"]
            if r.get("note"):
                row.setdefault("note", r["note"])
        if reps:
            row["spark_s"] = min(reps)
            row["spark_s_reps"] = reps
            row["spark_s_by_vintage"] = by_v
        merged["results"][entry] = row

    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(
        f"merged {len(vintages)} vintages, {len(entries)} entries "
        f"-> {out_path}"
    )


if __name__ == "__main__":
    main()
