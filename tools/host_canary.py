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

    Each probe runs TWICE and reports the MIN: the first execution of a
    probe in a fresh JVM pays codegen/JIT compilation (measured 4.1 s
    vs 0.14 s steady-state for the codegen probe), and the canary must
    measure HOST speed, not JVM warm-up state — min-of-2 is the
    steady-state number at every call position."""

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

    def _min2(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    return {"codegen_s": _min2(_codegen), "shuffle_s": _min2(_shuffle)}
