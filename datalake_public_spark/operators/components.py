"""Connected components over a pair graph — the transitive-closure step
every near-dup pipeline needs (pair lists from dedup.py say "A~B, B~C";
keeping one doc per GROUP requires components, not pairs).

Algorithm: iterative hash-min label propagation on DataFrames. Each
round, every node adopts the minimum component label among itself and
its neighbors; convergence when no label changes. Exact — on
convergence every node holds min(id) of its component.

Scale: one shuffle-join + one aggregation per round, both keyed on node
id. Rounds = graph diameter; near-dup graphs are clique-ish (diameter
2-3), so this converges in a handful of rounds. For adversarial
long-chain graphs at 100 TB, swap the propagation step for the
large-star/small-star alternation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — O(log n) rounds with
the same join/agg building blocks. ``localCheckpoint`` per round
truncates the lineage so the plan doesn't grow with iterations (same
discipline MLlib's iterative algorithms use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    vertex_col: str = "node",
    max_iter: int = 25,
) -> DataFrame:
    """Per-node component labels (label = min node id in the component).

    ``vertices`` optionally supplies the full node set (one column,
    ``vertex_col``) so isolated nodes appear as their own singleton
    component; otherwise only nodes present in ``edges`` are labeled.
    """
    und = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint()  # edge list reused every round — compute pairs once
    )
    nodes = und.select("node").distinct()
    if vertices is not None:
        nodes = nodes.unionByName(
            vertices.select(F.col(vertex_col).alias("node"))
        ).distinct()

    # eager localCheckpoint each round: fresh exprIds (no self-join
    # ambiguity between rounds) and O(1) lineage depth
    labels = nodes.select("node", F.col("node").alias("component")).localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            und.alias("e")
            .join(labels.alias("l"), F.col("e.nbr") == F.col("l.node"))
            .groupBy(F.col("e.node").alias("node"))
            .agg(F.min(F.col("l.component")).alias("nbr_component"))
        )
        new_labels = (
            labels.alias("o")
            .join(nbr_min.alias("m"), F.col("o.node") == F.col("m.node"), "left")
            .select(
                F.col("o.node").alias("node"),
                F.least(
                    F.col("o.component"),
                    F.coalesce(F.col("m.nbr_component"), F.col("o.component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels
