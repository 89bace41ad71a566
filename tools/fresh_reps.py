"""Fresh-process rep protocol for MEMOIZED registry entries.

`@_memoize_eager_entry` entries (similarity_ann, vocab_top_tokens,
lake_suite) cache their built plan per (session, sf): an in-sweep
`--band` rep would time the memo hit, not the build, so those entries
publish INLINE phase maps instead of bands (tools/scale_sweep.py).
That leaves their HEADLINE number a single rep from whatever host/JVM
window the sweep hit — round 11 committed similarity_ann at 25.8 s
from a window its own canary flagged ~1.5× slow, while the threaded
shape measured 19.1–22.3 s warm (VERDICT r11 item 2).

This tool is the missing protocol: time the entry in K FRESH python
processes (one timed build each — cold JVM, no memo, no sweep
position), attach the host canary per rep, and MERGE the rep list into
an existing sweep artifact's row without touching its oracle fields:

    spark_s            = min of reps (the band-min headline rule)
    spark_s_band       = [min, max]
    spark_s_reps       = all reps (chronological)
    band_protocol      = "fresh-process" (distinguishes from in-sweep
                         cleared-cache bands — fresh reps bound the
                         KERNEL cost, in-sweep bands bound the
                         sweep-position cost; see NOTES_r11 §8)
    canary_per_rep     = [{codegen_s, shuffle_s} ...]

Usage:
    python tools/fresh_reps.py <entry> <sf_dir> <artifact.json> [reps=3]

Each rep shells out `python tools/fresh_reps.py --one <entry> <sf_dir>`
which prints one JSON line; the parent collects and merges.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(entry: str, sf_dir: str) -> None:
    from datalake_public_spark import EngineConfig, get_spark
    from datalake_public_spark import driver_registry as DR
    from tools.host_canary import host_canary

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    )
    spark.sparkContext.setLogLevel("ERROR")
    can = host_canary(spark)
    DR.ENTRY_PHASES.pop(entry, None)
    t0 = time.time()
    DR.FINAL_REGISTRY[entry].spark(spark, sf_dir).toArrow()
    spark_s = round(time.time() - t0, 1)
    print(
        "FRESH_REP "
        + json.dumps(
            {
                "spark_s": spark_s,
                "canary": can,
                "op_spark_s": DR.ENTRY_PHASES.get(entry),
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    if sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3])
        return
    entry, sf_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    rep_rows: list[dict] = []
    for i in range(reps):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", entry, sf_dir],
            capture_output=True,
            text=True,
            env=os.environ,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("FRESH_REP ")]
        if not lines:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
            raise SystemExit(f"rep {i + 1} produced no FRESH_REP line")
        rep_rows.append(json.loads(lines[-1][len("FRESH_REP "):]))
        print(f"rep {i + 1}/{reps}: {rep_rows[-1]['spark_s']} s", flush=True)
    times = [r["spark_s"] for r in rep_rows]
    doc = json.load(open(artifact))
    row = doc["results"][entry]
    # the sweep's own single build (warm JVM, mid-sweep) is a legitimate
    # rep of the same kernel — keep it in the band instead of silently
    # replacing it (fresh processes additionally pay cold-JVM JIT +
    # Python-worker spin-up inside the timed build, measured ~8 s at
    # ×100 for similarity_ann: sweep 15.6 vs fresh floor 23.5)
    sweep_s = row.get("spark_s_sweep", row.get("spark_s"))
    all_reps = ([sweep_s] if isinstance(sweep_s, (int, float)) else []) + times
    row["spark_s_sweep"] = sweep_s
    row["spark_s"] = min(all_reps)
    row["spark_s_band"] = [min(all_reps), max(all_reps)]
    row["spark_s_reps"] = times
    row["band_protocol"] = (
        "sweep-rep + fresh-process (memoized entry — in-sweep banding "
        "would time the memo hit; fresh reps bound kernel + cold-start "
        "cost, the sweep rep bounds the warm-JVM build)"
    )
    row["canary_per_rep"] = [r["canary"] for r in rep_rows]
    ops = [r["op_spark_s"] for r in rep_rows if r.get("op_spark_s")]
    if ops:
        # union of phase keys across reps (ADVICE r12): a phase recorded
        # only in a later rep must not be dropped from the merged map
        keys = sorted({k for o in ops for k in o})
        row["op_spark_s"] = {
            op: min(o[op] for o in ops if op in o) for op in keys
        }
        row["op_timing"] = "inline"
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{entry}: merged reps {times} into {artifact}")


if __name__ == "__main__":
    main()
