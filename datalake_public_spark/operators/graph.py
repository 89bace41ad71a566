"""Iterative graph analytics on edge DataFrames: PageRank and label
propagation — the GraphFrames-basics tier, built on the same
localCheckpoint iteration discipline as operators/components.py
(lineage truncated per round so plans don't grow with iterations).

Both are deterministic given the input (no randomness; ties in label
propagation break by smallest label), so the tests pin exact values on
crafted graphs plus structural invariants (rank conservation,
convergence) on the testdata-derived graph.

Scale per round: one shuffle-join of messages against the edge list
keyed on src, one aggregation keyed on dst — the standard message-
passing shape. Degrees are computed once up front. Ref parity: beyond
the reference (graph-analytics extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_public_spark.operators.iterutils import release_local_checkpoint


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 60,
    tol: float = 1e-4,
) -> DataFrame:
    """PageRank over a DIRECTED edge list. Returns (node, rank) with
    ranks summing to the node count (the 1-per-node normalization).

    Dangling nodes (no out-edges) redistribute their rank mass
    uniformly each round — without that, total rank leaks and the
    conservation invariant (and any downstream normalization) silently
    breaks. Stops early when the max per-node delta drops under
    ``tol`` (geometric contraction at roughly the damping factor —
    1e-4 needs ~40-60 rounds on adversarial shapes, hence the default
    budget); raises if ``max_iter`` rounds pass without convergence
    (partial ranks must not masquerade as results — the components.py
    contract)."""
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:  # empty edge list: no nodes, no ranks (and no 0-division)
        return nodes.select("node", F.lit(1.0).alias("rank"))
    ranks = nodes.select("node", F.lit(1.0).alias("rank")).localCheckpoint()
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("to")).join(
        out_deg, "node"
    ).localCheckpoint()

    for _ in range(max_iter):
        contrib = (
            e.join(ranks, "node")
            .select("to", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy(F.col("to").alias("node"))
            .agg(F.sum("c").alias("in_mass"))
        )
        dangling = (
            ranks.join(out_deg, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
            .first()
            .d
        )
        base = (1.0 - damping) + damping * dangling / n
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "node")
            .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
            .first()
            .d
        )
        release_local_checkpoint(ranks)  # superseded — delta was last reader
        ranks = new_ranks
        if delta is not None and delta < tol:
            release_local_checkpoint(nodes)
            release_local_checkpoint(e)
            return ranks
    release_local_checkpoint(nodes)
    release_local_checkpoint(e)
    release_local_checkpoint(ranks)
    raise RuntimeError(
        f"pagerank did not converge in {max_iter} rounds (last delta {delta})"
    )


def label_propagation(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """Community detection by synchronous label propagation on the
    UNDIRECTED view of ``edges``: each round every node adopts the most
    frequent label among its neighbors, ties broken by the smallest
    label (which also makes the algorithm deterministic — the classic
    formulation's random tie-break is not reproducible across runs).
    Runs exactly ``max_iter`` rounds (LPA oscillates on bipartite
    structures; a fixed round budget is the standard practice).
    Returns (node, label)."""
    und = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(
            edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select("node").distinct().select("node", F.col("node").alias("label"))
    ).localCheckpoint()
    for _ in range(max_iter):
        counts = (
            und.alias("e")
            .join(labels.alias("l"), F.col("e.nbr") == F.col("l.node"))
            .groupBy(F.col("e.node").alias("node"), F.col("l.label").alias("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = counts.groupBy("node").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m")
        )
        prev = labels
        labels = best.select(
            "node", (-F.col("m.neg")).alias("label")
        ).localCheckpoint()
        release_local_checkpoint(prev)  # superseded round, never read again
    release_local_checkpoint(und)
    return labels


def hierarchy_paths(
    edges: DataFrame,
    *,
    parent: str = "parent",
    child: str = "child",
    max_depth: int = 32,
) -> DataFrame:
    """Flatten a parent→child hierarchy into per-node (root, depth,
    path) rows — the recursive-CTE query Spark SQL cannot express
    (no WITH RECURSIVE), provided as an iterative operator instead.

    Roots are nodes that appear as a parent but never as a child;
    depth 0 rows are the roots themselves; ``path`` is the
    '/'-joined node chain from the root. Expansion runs breadth-first,
    one join per level, stopping at the first empty frontier;
    exceeding ``max_depth`` raises (a cycle would otherwise loop
    forever — hierarchies are DAGs by contract, and a cycle is data
    corruption worth failing loudly on).

    Scale: level k's join is frontier⋈edges on the parent key — cost
    follows the frontier size, not the whole hierarchy; lineage is
    truncated per level (localCheckpoint) like every iterative operator
    here."""
    kids = edges.select(
        F.col(parent).alias("p"), F.col(child).alias("c")
    ).localCheckpoint()
    roots = (
        kids.select(F.col("p").alias("node"))
        .distinct()
        .join(kids.select(F.col("c").alias("node")).distinct(), "node", "left_anti")
    )
    frontier = roots.select(
        "node",
        F.col("node").alias("root"),
        F.lit(0).alias("depth"),
        F.col("node").cast("string").alias("path"),
    ).localCheckpoint()
    out = frontier
    for depth in range(1, max_depth + 2):
        nxt = (
            frontier.join(kids, frontier.node == kids.p)
            .select(
                F.col("c").alias("node"),
                "root",
                F.lit(depth).alias("depth"),
                F.concat_ws("/", "path", F.col("c").cast("string")).alias("path"),
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            # per-level frontiers stay checkpointed — they ARE the
            # result's union branches; only the edge list is private
            release_local_checkpoint(kids)
            return out
        if depth > max_depth:
            release_local_checkpoint(kids)
            raise RuntimeError(
                f"hierarchy deeper than max_depth={max_depth} — cycle or "
                "corrupted parent links"
            )
        out = out.unionByName(nxt)
        frontier = nxt
    return out
