"""Host-speed calibration canary for timing artifacts (VERDICT r10
item 1).

Round 10 measured a session-long UNIFORM 10-25% host slowdown (steal 0%
throughout): same-suite pytest 564 -> 632 s, two back-to-back x100 bench
vintages inflated on every row including a pure-scan q1 (+81%) with zero
code changes on those paths. The evidence lived in prose (NOTES r10 §8);
~20 unbanded sweep entries moved 8-148% and each needed an ad-hoc
diagnosis. This module makes the artifact carry its own calibration: a
fixed, code-stable, data-independent probe timed at sweep/bench
start / middle / end and published as ``canary`` in the JSON, so a
cross-round delta can be read AGAINST the host-speed ratio instead of
against an assumption of a stable box.

Two sub-probes, chosen to bracket the two cost classes the entries mix:

* ``codegen_s`` — a 100M-row whole-stage-codegen sum (``spark.range`` ->
  arithmetic -> one scalar). CPU / memory-bandwidth bound, no shuffle,
  no Python workers, no input data: the same probe the r10 builder ran
  by hand mid-drift (5.1 s vs ~2.6 s on a fast host).
* ``shuffle_s`` — a 20M-row groupBy over 200k keys (one real exchange +
  two-phase aggregate). Exercises the shuffle write/read + hash-agg
  path that dominates the join/agg entries.

Both probes are pure ``spark.range`` pipelines: no dependence on the SF
dir, the registry, or any repo operator — their code is frozen here and
MUST NOT change across rounds (a changed canary can't calibrate).
Per-call cost is ~1-3 s on a healthy host; three calls per sweep is
noise next to a 10-20 min artifact.

Interpretation rule (for NOTES / VERDICT): if an unbanded entry moved
round-over-round by about the canary ratio (max/min across this run's
calls vs last round's), it is host drift; a mover well beyond the
canary envelope on an unchanged code path is a real regression signal.
"""

from __future__ import annotations

import time


def host_canary(spark) -> dict[str, float]:
    """Time the two fixed probes on ``spark`` and return
    ``{"codegen_s": ..., "shuffle_s": ...}`` (seconds, 2 decimals).

    Each probe runs once UNTIMED (warm-up), then twice timed, reporting
    the MIN of the timed runs: the first executions of a probe in a
    fresh JVM pay codegen + C2 JIT compilation (measured 4.1 s cold,
    0.6 s after one rep, 0.11-0.14 s steady-state for the codegen
    probe), and the canary must measure HOST speed, not JVM warm-up
    state — otherwise the sweep-start call reads as a slow host by
    construction."""

    def _codegen():
        spark.range(100_000_000).selectExpr("sum(id * 2 + 1)").collect()

    def _shuffle():
        (
            spark.range(20_000_000)
            .selectExpr("id % 200000 AS k")
            .groupBy("k")
            .count()
            .selectExpr("sum(count) AS n", "count(*) AS g")
            .collect()
        )

    def _steady(fn) -> float:
        # adaptive warm-up: run untimed until two consecutive runs agree
        # within 15% (C2 tiered compilation keeps shaving the first few
        # runs: 4.1 → 0.6 → 0.23 → 0.12 s measured), capped at 5 runs so
        # a genuinely noisy host can't stall the sweep; then time 2 runs
        # and report the min — the steady-state number at every call
        # position, start included.
        prev = None
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            if prev is not None and abs(dt - prev) <= 0.15 * min(dt, prev):
                break
            prev = dt
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    return {"codegen_s": _steady(_codegen), "shuffle_s": _steady(_shuffle)}
