"""Checkpoint lifecycle for iterative operators.

Every iterative operator here (connected components, PageRank, label
propagation, hierarchy flattening, the iterative funnel) eagerly
``localCheckpoint``s per round — fresh exprIds and O(1) lineage depth.
The cost: each checkpoint pins its partitions in executor storage, and
Spark's ContextCleaner frees them only after BOTH the Python proxy and
the JVM Dataset are garbage-collected. On a long-lived driver (a
streaming micro-batch loop calling components every batch) superseded
per-round checkpoints accumulate until GC pressure — the same leak
class ADVICE r3 flagged for explicit persists.

``release_local_checkpoint`` frees a superseded checkpoint's partitions
immediately. It must ONLY be called on frames whose data is never read
again: a localCheckpoint truncates lineage, so an unpersisted one is
unrecomputable and any later action on it fails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the cached partitions behind an eagerly-localCheckpoint'd
    frame (no-op on anything else). See module docstring for the
    never-read-again contract."""
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
    except Exception:
        pass  # non-checkpointed frame or API drift — GC stays the fallback
