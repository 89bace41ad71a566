"""PageRank + label propagation: exact values on crafted graphs,
conservation/convergence invariants, dangling-node handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_public_spark.operators.graph import label_propagation, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # a directed cycle: perfectly symmetric → every rank exactly 1.0
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ranks = {r.node: r.rank for r in pagerank(e).collect()}
    assert all(abs(v - 1.0) < 1e-9 for v in ranks.values())


def test_pagerank_conserves_total_mass_with_dangling(spark):
    # node 3 dangles (no out-edges): without redistribution the total
    # would decay below n every round
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    ranks = pagerank(e)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 3.0) < 1e-6
    r = {x.node: x.rank for x in ranks.collect()}
    assert r[3] > r[2] > r[1]  # sink collects the most mass


def test_pagerank_star_center_dominates(spark):
    e = _edges(spark, [(i, 99) for i in range(1, 6)])
    r = {x.node: x.rank for x in pagerank(e).collect()}
    assert r[99] == max(r.values())
    assert r[99] > 3.0  # hub concentrates mass in a 6-node graph


def test_pagerank_raises_without_convergence(spark):
    # asymmetric graph (NOT at its fixed point initially) with a
    # one-round budget and an unreachable tolerance
    e = _edges(spark, [(1, 2), (1, 3), (2, 1)])
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(e, max_iter=1, tol=1e-300)


def test_label_propagation_two_cliques(spark):
    # two triangles joined by one bridge edge: each keeps its own
    # min-node label
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    labels = {
        r.node: r.label
        for r in label_propagation(
            _edges(spark, tri1 + tri2 + bridge), max_iter=6
        ).collect()
    }
    assert labels[1] == labels[2] == labels[3]
    assert labels[10] == labels[11] == labels[12]
    assert labels[1] != labels[10]


def test_label_propagation_deterministic(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 5)])
    a = sorted(map(tuple, label_propagation(e, max_iter=4).collect()))
    b = sorted(map(tuple, label_propagation(e.repartition(7), max_iter=4).collect()))
    assert a == b


def test_hierarchy_paths_matches_duckdb_recursive_cte(spark):
    import duckdb
    import pandas as pd

    # two trees + a diamond-free DAG edge set
    edges = [(1, 2), (1, 3), (2, 4), (2, 5), (4, 8), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "parent long, child long")
    from datalake_public_spark.operators.graph import hierarchy_paths

    got = {
        (r.node, r.root, r.depth, r.path)
        for r in hierarchy_paths(df).collect()
    }
    con = duckdb.connect()
    con.register("e", pd.DataFrame(edges, columns=["parent", "child"]))
    want = {
        tuple(r)
        for r in con.execute("""
            WITH RECURSIVE roots AS (
              SELECT DISTINCT parent AS node FROM e
              WHERE parent NOT IN (SELECT child FROM e)
            ), walk AS (
              SELECT node, node AS root, 0 AS depth,
                     CAST(node AS VARCHAR) AS path FROM roots
              UNION ALL
              SELECT e.child, w.root, w.depth + 1,
                     w.path || '/' || CAST(e.child AS VARCHAR)
              FROM walk w JOIN e ON e.parent = w.node
            )
            SELECT node, root, depth, path FROM walk
        """).fetchall()
    }
    assert got == want


def test_hierarchy_paths_raises_on_cycle(spark):
    import pytest as _p

    from datalake_public_spark.operators.graph import hierarchy_paths

    # 1→2→3→1 cycle reachable from root 0
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 1)], "parent long, child long"
    )
    with _p.raises(RuntimeError, match="cycle"):
        hierarchy_paths(df, max_depth=10)


def test_pagerank_empty_edges(spark):
    from datalake_public_spark.operators.graph import pagerank

    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e).count() == 0
