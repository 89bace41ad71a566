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

import warnings

from pyspark.sql import DataFrame

# Incremented whenever the private-API release path fails to resolve —
# tests assert this stays 0 across the iterative suites, so a Spark
# upgrade that silently breaks the path trips CI instead of quietly
# reinstating the executor-storage leak.
release_failures = 0
_warned = False


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the cached partitions behind an eagerly-localCheckpoint'd
    frame. See module docstring for the never-read-again contract.

    Reaches through the JVM query execution (there is no public PySpark
    API for "unpersist the RDD behind this checkpoint"), so the failure
    mode to guard is API drift across Spark versions: a failure here is
    counted and warned once per process rather than swallowed, because
    a silent no-op reinstates the leak this module exists to fix.

    The frame need not BE the checkpoint node: callers legitimately hand
    back thin wrappers over one (``checkpointed.select(...)`` plans as a
    ``Project`` over the ``LogicalRDD``), so resolution walks down
    single-child wrapper nodes until it reaches the ``LogicalRDD``. A
    node with zero or multiple children before a ``LogicalRDD`` is found
    means the frame does not sit on exactly one checkpoint — that is
    counted as a resolution failure, same as API drift."""
    global release_failures, _warned
    try:
        rdd = _resolve_checkpoint_rdd(df._jdf.queryExecution().logical())
        if rdd is None:
            _record_failure(
                RuntimeError("no LogicalRDD under single-child wrappers")
            )
        else:
            rdd.unpersist(False)
    except (AttributeError, TypeError) as exc:
        _record_failure(exc)
    except Exception as exc:  # Py4JError and friends (no hard py4j import)
        if type(exc).__module__.startswith("py4j"):
            _record_failure(exc)
        else:
            raise


def _resolve_checkpoint_rdd(jplan):
    """Walk a JVM logical plan down single-child wrapper nodes
    (Project, SubqueryAlias, Filter, …) to the ``LogicalRDD`` a
    localCheckpoint materialized, and return its RDD — or ``None`` if
    the walk hits a leaf/multi-child node first (no unambiguous
    checkpoint to free). Depth-capped defensively; real wrapper chains
    here are 1–2 nodes."""
    node = jplan
    for _ in range(16):
        if node.getClass().getSimpleName() == "LogicalRDD":
            return node.rdd()
        children = node.children()
        if children.size() != 1:
            return None
        node = children.apply(0)
    return None


def _record_failure(exc: Exception) -> None:
    global release_failures, _warned
    release_failures += 1
    if not _warned:
        _warned = True
        warnings.warn(
            "release_local_checkpoint could not resolve the checkpoint "
            f"RDD ({type(exc).__name__}: {exc}); superseded checkpoints "
            "will only be freed by GC — check Spark private-API drift",
            RuntimeWarning,
            stacklevel=3,
        )
